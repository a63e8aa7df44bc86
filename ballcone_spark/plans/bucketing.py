"""Bucketed co-located joins — the write-time shuffle that pays for
itself on every subsequent join.

At 100 TB the orders⋈lineitem join is the one shuffle the star-schema
queries cannot broadcast away. Bucketing both fact tables on the join
key at write time (`bucketBy(n, key)` + `sortBy`) makes every later
equi-join on that key **exchange-free**: Spark matches the two tables'
bucket specs and plans a SortMergeJoin directly over co-located buckets
(and with `sortBy`, skips the per-task sort too). The shuffle is paid
once at ingest, not once per query — the same trade the reference makes
by batching inserts (reference ballcone/dao.py:222-234), applied to
join locality instead of transaction overhead.

Sizing rule: buckets ≈ target parallelism at the largest consumer SF;
both sides of a co-located join must use the SAME bucket count (Spark
4 can coalesce mismatched counts when one divides the other —
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["bucketize"]


def bucketize(
    df: DataFrame,
    name: str,
    keys: list[str],
    n_buckets: int,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (+ sorted) table named ``name``.
    Joining two tables bucketized on the same keys with the same count
    plans with zero Exchange (asserted in tests/test_plans.py)."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, *keys).sortBy(*keys)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(name)
