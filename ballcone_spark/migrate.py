"""Bulk migration sink — S13 of SURVEY.md §2.1, Spark-first.

The reference ships ``tools/monet2duck.py`` (reference
tools/monet2duck.py:86-130): copy a MonetDB table into DuckDB in
batches of 3072 rows, paged with ``ORDER BY datetime LIMIT/OFFSET``,
then assert source and destination row counts match. The Spark
re-architecture keeps the *semantics* — bulk copy + count-parity gate —
and replaces the mechanics with the engine's native bulk path:

- LIMIT/OFFSET paging (O(n²) re-scans server-side, and the reference
  needs the ORDER BY only to make offsets stable) becomes a
  **partitioned parallel read**: for JDBC sources, non-overlapping
  predicate ranges (one per executor task) replace offsets entirely —
  no global sort, no re-scan, restartable per partition.
- the row-count assert (monet2duck.py:125-129) is kept verbatim in
  spirit: :func:`migrate_table` counts source and destination and
  raises on mismatch — a migration that loses rows must fail loudly.
- batch size tuning (``--batch 3072``) becomes file sizing:
  ``target_file_mb`` controls output parquet file granularity.

At 100 TB the copy is scan→write with zero shuffles (no repartition
unless asked); count-parity adds one aggregate per side.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession

__all__ = ["migrate_table", "migrate_jdbc", "date_range_predicates"]


class MigrationParityError(RuntimeError):
    """Source/destination row counts diverged — the reference's assert
    (tools/monet2duck.py:125-129) as a first-class failure."""


def migrate_table(
    spark: SparkSession,
    source: DataFrame,
    dest_path: str,
    partition_cols: list[str] | None = None,
    target_file_mb: int = 128,
    expected_count: int | None = None,
) -> dict:
    """Copy ``source`` to a parquet destination with a count-parity gate.

    Returns ``{"rows": n, "dest": dest_path}``. ``expected_count`` lets
    callers that already know the source cardinality (e.g. a JDBC
    ``count(*)`` pushed to the remote engine) skip one source scan.
    Raises :class:`MigrationParityError` when the written destination
    does not read back with exactly the source's row count."""
    n_source = expected_count if expected_count is not None else source.count()
    writer = source.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(dest_path)
    n_dest = spark.read.parquet(dest_path).count()
    if n_dest != n_source:
        raise MigrationParityError(
            f"migration wrote {n_dest} rows, source has {n_source}"
        )
    return {"rows": n_dest, "dest": dest_path}


def date_range_predicates(
    start: datetime.date,
    stop: datetime.date,
    days_per_chunk: int = 7,
    col: str = "datetime",
) -> list[str]:
    """Non-overlapping WHERE clauses covering [start, stop] — the
    partitioned-JDBC replacement for the reference's LIMIT/OFFSET pages.
    Each predicate becomes one parallel, independently-restartable read
    task; together they cover every row exactly once (half-open ranges,
    final range closed by a day)."""
    preds = []
    cur = start
    while cur <= stop:
        nxt = min(cur + datetime.timedelta(days=days_per_chunk), stop + datetime.timedelta(days=1))
        preds.append(
            f"{col} >= DATE '{cur.isoformat()}' AND {col} < DATE '{nxt.isoformat()}'"
        )
        cur = nxt
    return preds


def migrate_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    dest_path: str,
    predicates: list[str] | None = None,
    properties: dict | None = None,
    **kwargs,
) -> dict:
    """S13 for real JDBC sources (MonetDB's JDBC driver included):
    ``spark.read.jdbc`` with optional predicate partitioning (use
    :func:`date_range_predicates`), then :func:`migrate_table`'s
    copy + parity gate. Untestable in this container (no JDBC endpoint);
    the generic path and predicate generator carry the tests."""
    reader = spark.read
    if predicates:
        src = reader.jdbc(
            url, table, predicates=predicates, properties=properties or {}
        )
    else:
        src = reader.jdbc(url, table, properties=properties or {})
    return migrate_table(spark, src, dest_path, **kwargs)
