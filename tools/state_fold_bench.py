#!/usr/bin/env python
"""Per-batch wall vs batch count for the dedup stream's state folds
(BASELINE §6ae follow-through).

§6aa measured per-batch cost flat in RESIDENT STATE SIZE over tens of
batches; this measures the orthogonal axis the r12 inline folds close:
per-batch cost vs BATCH COUNT. Without folding, every trigger's
history read plans over one more ``batch_id=`` dir (parquet footer
reads grow linearly with dirs); with ``compact_every`` the live dir
count is bounded, so the read plans over ~constant files.

Protocol: pre-write N one-doc spool files, drain them as N sequential
micro-batches in ONE streaming query (``maxFilesPerTrigger=1`` +
availableNow — the shipped loop end to end), polling
``recentProgress`` for per-batch ``triggerExecution`` while the drain
runs. Two arms: ``compact_every=64`` (the shipped default) vs ``None``
(the pre-r12 behavior). The headline is the growth ratio — median wall
of the last quarter of batches over the first quarter — per arm.

Usage:
  python tools/state_fold_bench.py --batches 400
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from ballcone_spark.session import get_spark  # noqa: E402
from ballcone_spark.streaming.dedup_stream import (  # noqa: E402
    start_dedup_stream,
)

BASE = ("the quick brown fox jumps over the lazy dog while seven "
        "wizards mix a potion of sparkling zinc and amber resin")


def write_spool(spool: str, n: int) -> None:
    os.makedirs(spool, exist_ok=True)
    for b in range(n):
        with open(os.path.join(spool, f"docs-{b:06d}.jsonl"), "w") as f:
            f.write(json.dumps(
                {"doc_id": b, "text": f"{BASE} batch {b}"}
            ) + "\n")


def run_arm(spark, work: str, tag: str, n: int, compact_every):
    spool = os.path.join(work, f"spool_{tag}")
    write_spool(spool, n)
    walls: dict[int, int] = {}
    done = threading.Event()

    def poll() -> None:
        # recentProgress keeps only the last ~100 entries; poll fast
        # enough that no batch scrolls out unseen
        while not done.is_set():
            for p in (q.recentProgress or []):
                if p["numInputRows"] > 0:
                    walls[p["batchId"]] = int(
                        p["durationMs"]["triggerExecution"]
                    )
            time.sleep(0.25)

    q = start_dedup_stream(
        spark,
        spool,
        os.path.join(work, f"index_{tag}"),
        os.path.join(work, f"dec_{tag}"),
        os.path.join(work, f"ckpt_{tag}"),
        available_now=True,
        compact_every=compact_every,
        max_files_per_trigger=1,  # one spool file per micro-batch
    )
    th = threading.Thread(target=poll, daemon=True)
    th.start()
    t0 = time.perf_counter()
    q.awaitTermination(3600)
    done.set()
    th.join(timeout=5)
    for p in (q.recentProgress or []):  # final sweep
        if p["numInputRows"] > 0:
            walls[p["batchId"]] = int(p["durationMs"]["triggerExecution"])
    total = time.perf_counter() - t0
    ids = sorted(walls)[10:]  # drop JVM/codegen warm-up batches: the
    # first arm would otherwise understate its own growth ratio
    quarter = max(1, len(ids) // 4)

    def med(xs):
        xs = sorted(xs)
        return xs[len(xs) // 2]

    first = med([walls[i] for i in ids[:quarter]])
    last = med([walls[i] for i in ids[-quarter:]])
    return {
        "arm": tag,
        "compact_every": compact_every,
        "batches_seen": len(ids),
        "first_quarter_ms": first,
        "last_quarter_ms": last,
        "growth": round(last / first, 2) if first else None,
        "total_sec": round(total, 1),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=400)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="fold_bench_")
    spark = get_spark(app_name="state_fold_bench")

    results = []
    for tag, every in (("fold", 64), ("nofold", None)):
        results.append(run_arm(spark, work, tag, args.batches, every))
        print(json.dumps(results[-1]), file=sys.stderr, flush=True)
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps({
        "metric": "state_fold_batch_curve",
        "batches": args.batches,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "arms": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
