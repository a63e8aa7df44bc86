#!/usr/bin/env python
"""Assemble the sf1 bench composite dir (r16, VERDICT r15 #2).

The driver benches at sf0.1, where all 21 headline queries sit at the
box's 60-130 ms per-job scheduler floor — optimization wins (and
regressions) in the corpus family are invisible there. This builds
``<repo>/.scale_data/bench_sf1/``: the deterministic sf1
documents/embeddings/events from ``gen_scale_data`` (50 k docs / 20 k
vectors / 1 M events — 10x the driver's sf0.1) plus symlinks to the
driver's sf0.1 TPC-H tables (customer/orders/lineitem/nation/region/
supplier/part — the corpus/events queries never read them; the TPC-H
rows keep those queries runnable at their sf0.1 cost).

Usage:
    python tools/make_bench_sf1.py            # build (idempotent)
    make bench-sf1                            # build + run bench.py

The bench contract is untouched: ``bench.py`` reads the dir from
``$SPARK_GRAFT_SF_DIR`` exactly as the driver does; the composite dir
name ends in ``sf1`` so the contract JSON reports ``"sf": 1.0``.
Record the resulting line in BASELINE.md §"sf1 bench arm" each round.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TPCH_TABLES = [
    "customer", "orders", "lineitem", "nation", "region", "supplier", "part",
]


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sf01 = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
    out = os.path.join(repo, ".scale_data", "bench_sf1")
    os.makedirs(out, exist_ok=True)

    src = os.path.join(repo, ".scale_data", "sf1")
    if not all(
        os.path.exists(os.path.join(src, f"{t}.parquet"))
        for t in ("documents", "embeddings", "events")
    ):
        from tools.gen_scale_data import generate

        generate(1, os.path.join(repo, ".scale_data"))

    for t in ("documents", "embeddings", "events"):
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(src, f"{t}.parquet"), dst)
    for t in TPCH_TABLES:
        dst = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(sf01, f"{t}.parquet"), dst)
    print(out)


if __name__ == "__main__":
    main()
