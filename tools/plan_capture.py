#!/usr/bin/env python
"""Capture ``.explain("formatted")`` for every declared driver query.

Writes ``plans/$PLAN_CAPTURE_DIR/<query>_<tag>.txt`` (default r16) (tag = before/after) so the
optimization round's plan claims are checkable without running Spark.
Also emits a one-line summary per query (Exchange count, join nodes,
Python-eval nodes, scan pushdown presence) to stdout for the checklist.

Usage: python tools/plan_capture.py <tag> [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from ballcone_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("PLAN_CAPTURE_DIR", "r16"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan_capture")
    queries = dict(entry_mod.queries())
    if os.environ.get("PLAN_CAPTURE_EXTRA"):
        from ballcone_spark.queries import EXTRA_QUERIES

        for n, spec in EXTRA_QUERIES.items():
            queries.setdefault(n, spec.fn)
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001 — capture must not abort the sweep
            print(f"{name}: ERROR {exc}")
            continue
        with open(os.path.join(out_dir, f"{name}_{tag}.txt"), "w") as fh:
            fh.write(plan)
        exchanges = len(re.findall(r"\bExchange\b", plan))
        joins = sorted(
            set(re.findall(r"(\w*Join\w*)\s*\(", plan))
            | set(re.findall(r"\b(BroadcastNestedLoopJoin|CartesianProduct)\b", plan))
        )
        py = sorted(set(re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)\b", plan)))
        pushed = "PushedFilters: [" in plan and not re.search(
            r"PushedFilters: \[\]", plan
        )
        aqe = "AdaptiveSparkPlan" in plan
        print(
            f"{name}: Exchange={exchanges} joins={joins or '-'} py={py or '-'} "
            f"pushed_filters={'yes' if pushed else 'no'} aqe={aqe}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
