"""Vector-store product loop, live: spool → semantic stream → top-k
serving, measuring INDEX FRESHNESS — how long after a vector lands in
the spool until `semantic_index_topk` can return it.

The events analog is §6z/§6ai (UDP → ingest → dashboard); this is the
RAG-side loop: a feeder appends JSON-lines vector files at a target
rate, the semantic dedup stream ingests/decides/folds continuously,
and a prober writes marker vectors (each its own distinct direction),
then polls the SERVE path until the marker comes back as its own
nearest neighbor. Freshness = t_servable − t_spooled, through the
full read path (manifest-snapshot index read + routed serve).

  python tools/vector_live_demo.py --seconds 60 --rows-per-sec 500
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 16


def _unit(theta: float, phi: int) -> list[float]:
    """Distinct unit vectors: rotation in the (2·phi, 2·phi+1) plane —
    markers get their own plane so nothing else is ever similar."""
    v = [0.0] * DIM
    v[(2 * phi) % DIM] = math.cos(theta)
    v[(2 * phi + 1) % DIM] = math.sin(theta)
    return v


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--rows-per-sec", type=int, default=500)
    ap.add_argument("--trigger-seconds", type=int, default=2)
    ap.add_argument("--roll-seconds", type=float, default=2.0)
    ap.add_argument("--marker-every", type=float, default=3.0)
    ap.add_argument("--compact-every", type=int, default=8)
    ap.add_argument("--cells", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import functions as F  # noqa: F401

    from ballcone_spark.session import get_spark
    from ballcone_spark.streaming.semantic_stream import (
        semantic_index_topk,
        start_semantic_dedup_stream,
    )

    spark = get_spark("vector_live_demo")
    work = tempfile.mkdtemp(prefix="vec_demo_")
    spool = os.path.join(work, "spool")
    os.makedirs(spool)
    idx, dec = os.path.join(work, "idx"), os.path.join(work, "dec")

    # distinct centroids: plane c mod DIM/2, angle stepped by cell —
    # more cells = smaller resident clusters = cheaper decision grams
    # (the documented O(b*(h+b)) per-cluster growth knob)
    centroids = [(c, _unit(0.2 * c, c)) for c in range(args.cells)]
    q = start_semantic_dedup_stream(
        spark, spool, idx, dec, os.path.join(work, "ckpt"),
        centroids, tau=0.99, available_now=False,
        trigger_seconds=args.trigger_seconds,
        compact_every=args.compact_every,
    )

    stop = threading.Event()
    sent = {"rows": 0}

    def feeder():
        k, seq = 0, 0
        buf = []
        last_roll = time.monotonic()
        deadline = time.monotonic() + args.seconds
        per_tick = max(1, args.rows_per_sec // 10)
        while not stop.is_set() and time.monotonic() < deadline:
            t0 = time.monotonic()
            for _ in range(per_tick):
                vid = 1_000_000 + k
                buf.append(json.dumps(
                    {"vec_id": vid,
                     "e": _unit(0.2 * (k % args.cells)
                                + (k % 50) * 0.002, k % args.cells)}
                ))
                k += 1
            if time.monotonic() - last_roll >= args.roll_seconds and buf:
                seq += 1
                tmp = os.path.join(spool, f".load-{seq:06d}.jsonl")
                with open(tmp, "w") as f:
                    f.write("\n".join(buf) + "\n")
                os.rename(tmp, tmp.replace("/.", "/"))
                sent["rows"] += len(buf)
                buf = []
                last_roll = time.monotonic()
            time.sleep(max(0.0, 0.1 - (time.monotonic() - t0)))
        if buf:
            seq += 1
            tmp = os.path.join(spool, f".load-{seq:06d}.jsonl")
            with open(tmp, "w") as f:
                f.write("\n".join(buf) + "\n")
            os.rename(tmp, tmp.replace("/.", "/"))
            sent["rows"] += len(buf)

    fd = threading.Thread(target=feeder, daemon=True)
    fd.start()

    freshness = []
    serve_ms = []
    t_end = time.monotonic() + args.seconds
    mk = 0
    while time.monotonic() < t_end:
        mk += 1
        # marker: its own plane-angle, far from all load vectors
        mvid = 2_000_000 + mk
        mvec = _unit(0.2 * (mk % args.cells) + 0.09 + mk * 0.0003,
                     mk % args.cells)
        with open(os.path.join(spool, f".mk-{mk:06d}.jsonl"), "w") as f:
            f.write(json.dumps({"vec_id": mvid, "e": mvec}) + "\n")
        os.rename(os.path.join(spool, f".mk-{mk:06d}.jsonl"),
                  os.path.join(spool, f"mk-{mk:06d}.jsonl"))
        t_send = time.monotonic()
        qdf = spark.createDataFrame(
            [(mk, mvec)], "query_id long, e array<double>"
        )
        deadline_mk = t_send + 60
        while time.monotonic() < deadline_mk:
            t0 = time.monotonic()
            res = semantic_index_topk(
                spark, idx, qdf, centroids, k=1, nprobe=1
            )
            rows = res.collect() if res is not None else []
            serve_ms.append((time.monotonic() - t0) * 1000)
            if rows and rows[0]["neighbor_id"] == mvid:
                freshness.append(time.monotonic() - t_send)
                break
            time.sleep(0.2)
        else:
            freshness.append(float("nan"))
        time.sleep(max(0.0, args.marker_every
                       - (time.monotonic() - t_send)))

    fd.join(timeout=10)
    time.sleep(2 * args.trigger_seconds + 2)
    prog = [p for p in (q.recentProgress or []) if p["numInputRows"] > 0]
    q.stop()

    from ballcone_spark.streaming.semantic_stream import (
        read_semantic_index,
    )
    n_idx = read_semantic_index(spark, idx)
    n_idx = n_idx.count() if n_idx is not None else 0

    def pct(xs, p):
        xs = sorted(x for x in xs if x == x)
        return round(xs[min(len(xs) - 1, int(p * len(xs)))], 2) if xs else None

    durs = [p.get("batchDuration") for p in prog if p.get("batchDuration")]
    print(json.dumps({
        "metric": "vector_freshness_p50",
        "value": pct(freshness, 0.5),
        "unit": "sec",
        "rows_sent": sent["rows"] + mk,
        "rows_indexed": n_idx,
        "offered_rows_per_sec": args.rows_per_sec,
        "markers": len([x for x in freshness if x == x]),
        "markers_lost": len([x for x in freshness if x != x]),
        "freshness_p50": pct(freshness, 0.5),
        "freshness_p90": pct(freshness, 0.9),
        "serve_ms_median": pct(serve_ms, 0.5),
        "n_batches": len(prog),
        "batch_ms_median": sorted(durs)[len(durs) // 2] if durs else None,
        "cells": args.cells,
        "trigger_seconds": args.trigger_seconds,
        "compact_every": args.compact_every,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
