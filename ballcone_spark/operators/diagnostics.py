"""Skew diagnostics — the pre-flight profile a 100 TB job runs BEFORE
picking its join/aggregation strategy (beyond-reference; operational
tooling, not analytics).

:func:`hot_keys` quantifies key skew for any prospective shuffle key:
top-k keys by row count, each with its corpus share and its skew factor
(count ÷ mean-rows-per-distinct-key). A skew factor ≫ 1 on a join key
says "salt this key or let AQE split it"; ≈ 1 says a plain hash
partition balances fine. One groupBy with map-side combine + a top-k
TakeOrderedAndProject — the profile itself stays cheap at any scale
(cost is one pass + a shuffle of one row per distinct key).

The mean-per-key denominator rides along as a 1-row broadcast scalar
(total rows, distinct keys), so the whole profile is a single plan with
no driver round-trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ballcone_spark.queries import _query, load_table

__all__ = ["hot_keys"]

_TOP_K = 10


def hot_keys(df: DataFrame, key_cols: list[str], k: int = _TOP_K) -> DataFrame:
    """Top-``k`` hottest key tuples of ``df`` under ``key_cols``:
    (key..., cnt, share, skew_factor), ordered hottest first with a
    deterministic key tie-break."""
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_total"),
        F.count("*").alias("_distinct"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            *key_cols,
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), 4).alias("share"),
            F.round(
                F.col("cnt") * F.col("_distinct") / F.col("_total"), 4
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("cnt"), *key_cols)
        .limit(k)
    )


@_query(
    "events_hot_keys",
    f"""
    WITH counts AS (
        SELECT event_type, user_id % 100 AS user_bucket, count(*) AS cnt
        FROM events GROUP BY event_type, user_id % 100
    ),
    totals AS (SELECT sum(cnt) AS t, count(*) AS d FROM counts)
    SELECT event_type, user_bucket, cnt,
           round(CAST(cnt AS DOUBLE) / t, 4) AS share,
           round(CAST(cnt AS DOUBLE) * d / t, 4) AS skew_factor
    FROM counts, totals
    ORDER BY cnt DESC, event_type, user_bucket
    LIMIT {_TOP_K}
    """,
    driver=False,  # registry at the 50 cap; oracle-checked locally
)
def events_hot_keys(spark, sf_dir):
    """Skew profile of the (event_type, user_id%100) composite — the
    shuffle key a sessionizing join over events would hash on."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 100
    )
    return hot_keys(ev, ["event_type", "user_bucket"], _TOP_K)
