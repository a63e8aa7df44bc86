#!/usr/bin/env python
"""Streaming alias-map per-batch cost curve (r11).

The 100 TB question for ``streaming/alias_stream.py`` is how per-batch
cost grows as the RESIDENT state (chunk index, gram postings, alias
table) grows. This tool splits a documents corpus into N equal
arrival batches by doc_id, drives :func:`process_alias_batch` directly
(the stream's foreachBatch body — no trigger wait, so wall clock is
pure work), and prints per-batch wall seconds alongside the state the
batch saw and what it emitted. Flat-ish per-batch wall with growing
history = the probe plan holds (batch side broadcast, index never
shuffles); growth proportional to history = a §6g-class regression.

Usage:
  python tools/alias_stream_bench.py --sf-dir .scale_data/sf1 --batches 10
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from ballcone_spark.session import get_spark  # noqa: E402
from ballcone_spark.streaming.alias_stream import (  # noqa: E402
    process_alias_batch,
    read_alias_map,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.path.join(ROOT, ".scale_data/sf1"))
    ap.add_argument("--batches", type=int, default=10)
    args = ap.parse_args()
    sf_dir = (
        args.sf_dir
        if os.path.isabs(args.sf_dir)
        else os.path.join(ROOT, args.sf_dir)
    )

    spark = get_spark(app_name="alias_stream_bench")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    work = tempfile.mkdtemp(prefix="alias_bench_")
    dirs = [os.path.join(work, d) for d in ("chunks", "grams", "alias")]

    per_batch = []
    for b in range(args.batches):
        lo = n_docs * b // args.batches
        hi = n_docs * (b + 1) // args.batches
        batch = docs.where(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        )
        t0 = time.perf_counter()
        process_alias_batch(spark, batch, *dirs, batch_id=b)
        wall = time.perf_counter() - t0
        hist_chunks = (
            spark.read.parquet(os.path.join(dirs[0], "batch_id=*")).count()
            if os.path.isdir(dirs[0])
            else 0
        )
        updates = spark.read.parquet(
            os.path.join(dirs[2], f"batch_id={b}")
        ).count()
        per_batch.append(
            {
                "batch": b,
                "docs": hi - lo,
                "wall_sec": round(wall, 2),
                "resident_chunks_after": hist_chunks,
                "alias_updates": updates,
                "loadavg_1m": round(os.getloadavg()[0], 2),
            }
        )
        print(json.dumps(per_batch[-1]), file=sys.stderr, flush=True)

    m = read_alias_map(spark, dirs[2])
    alias_rows = m.count() if m is not None else 0
    shutil.rmtree(work, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "alias_stream_batch_curve",
                "sf_dir": sf_dir,
                "n_docs": n_docs,
                "batches": per_batch,
                "final_alias_rows": alias_rows,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
