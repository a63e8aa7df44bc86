"""Physical-plan inspection helpers — the iterate-on-.explain loop,
made assertable.

Usage: ``plan_str(df)`` then substring checks, or the named predicates.
These back the plan-quality test suite (tests/test_plans.py) that pins
the properties which matter at 100 TB: filters reaching the scan,
dimension joins broadcasting, per-group limits pushed below shuffles,
and **zero Python in any hot path**.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = [
    "plan_str",
    "has_pushed_filters",
    "has_partition_filters",
    "read_schema_columns",
    "uses_python",
    "broadcast_join_count",
    "sort_merge_join_count",
    "global_window_count",
]


def plan_str(df: DataFrame) -> str:
    """Physical plan text. After a DataFrame has been executed, AQE's
    ``toString`` prints BOTH "== Final Plan ==" and "== Initial Plan =="
    sections — every node twice — which breaks exact-count plan gates on
    plan-cached DataFrames (the prepared-plan cache hands the same object
    to the oracle-diff suite, which collects it, and then to the plan
    gates). Keep only the final section when present."""
    s = df._jdf.queryExecution().executedPlan().toString()
    if "== Initial Plan ==" in s:
        s = s.split("== Initial Plan ==", 1)[0]
    return s


def has_pushed_filters(df: DataFrame, fragment: str = "") -> bool:
    """True if the parquet scan received pushed data filters (optionally
    containing ``fragment``)."""
    p = plan_str(df)
    for line in p.splitlines():
        if "PushedFilters: [" in line and "PushedFilters: []" not in line:
            if fragment in line:
                return True
    return False


def has_partition_filters(df: DataFrame, fragment: str = "") -> bool:
    p = plan_str(df)
    for line in p.splitlines():
        if "PartitionFilters: [" in line and "PartitionFilters: []" not in line:
            if fragment in line:
                return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Column names in the scan's ReadSchema (column-pruning check)."""
    import re

    p = plan_str(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", p):
        for part in m.group(1).split(","):
            name = part.split(":")[0].strip()
            if name:
                cols.append(name)
    return cols


def uses_python(df: DataFrame) -> bool:
    """Any row-at-a-time or Arrow Python evaluation in the plan."""
    p = plan_str(df)
    return any(
        marker in p
        for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas", "FlatMapGroupsInPandas")
    )


def uses_rowwise_python(df: DataFrame) -> bool:
    """Per-row (non-Arrow) Python in the plan — the anti-pattern class.

    Distinguishes the two Python tiers the engine's policy draws
    (README "UDFs are the slow path"; VERDICT r6 #1):

    - ``BatchEvalPython`` (row-at-a-time ``F.udf``) and RDD scans are
      BANNED from registered queries — pickled per-row round-trips,
      ~10-100× off the JVM path, never the right hot-path tool;
    - Arrow-batched kernels (``MapInPandas`` / ``FlatMapGroupsInPandas``
      / ``ArrowEvalPython``) are ALLOWED where the math is BLAS-shaped:
      Spark higher-order functions evaluate interpreted
      (CodegenFallback, measured ~6 µs per 64-dim dot), so a columnar
      numpy matmul over Arrow batches is the faster-at-any-scale
      expression of dense vector math — the round-6 finding that took
      PQ search from 45.7 s to 1.97 s on identical semantics.

    ``Scan ExistingRDD`` alone is not flagged: ``localCheckpoint()``
    materialization (the persist barrier the dedup family uses) plans as
    an RDD scan with zero Python involved.
    """
    return "BatchEvalPython" in plan_str(df)


def broadcast_join_count(df: DataFrame) -> int:
    return plan_str(df).count("BroadcastHashJoin") + plan_str(df).count(
        "BroadcastNestedLoopJoin"
    )


def sort_merge_join_count(df: DataFrame) -> int:
    return plan_str(df).count("SortMergeJoin")


def global_window_count(df: DataFrame) -> int:
    """Number of Window nodes with an EMPTY partition spec — each one is an
    Exchange SinglePartition + full-input single-task sort, the plan shape
    that cannot scale past one executor. A partitioned Window prints three
    bracket groups (functions, partition keys, ordering); a global one only
    two — so one ``], [`` separator instead of two."""
    n = 0
    for line in plan_str(df).splitlines():
        s = line.strip().lstrip("+-:* ")
        if s.startswith("Window ") and s.count("], [") < 2:
            n += 1
    return n
