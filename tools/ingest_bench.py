#!/usr/bin/env python
"""Streaming-ingest throughput bench (VERDICT r9 #3).

The reference IS an ingest system (syslog UDP → parse → enrich →
buffered 5 s flush, reference ballcone/core.py:39-51 +
syslog_protocol.py:32-90), and ingest was the one surface here with e2e
correctness tests but no published throughput number. This tool
measures the shipped path — spool text files → parse_datagrams →
enrich → foreachBatch parquet append partitioned by (service, date) —
in two modes:

  drain : all datagrams spooled up front, one availableNow run.
          End-to-end wall clock → sustained rows/s (parse + enrich +
          partitioned parquet write + checkpoint commit).
  live  : 5 s processingTime trigger with a feeder thread appending
          spool files at a target rate; per-micro-batch duration and
          input rows come from query.recentProgress — the latency-vs-
          trigger story (a healthy stream keeps batchDuration below
          the trigger period).

Also reports the small-file story: parquet file count after ingest,
after compact_warehouse, and row-count conservation across the
compaction.

Usage:
  python tools/ingest_bench.py --rows 200000              # drain mode
  python tools/ingest_bench.py --rows 200000 --live-seconds 30

Prints ONE JSON line (same convention as bench.py).
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
from ballcone_spark.streaming.ingest import (  # noqa: E402
    compact_warehouse,
    start_file_ingest,
)

#: Real-shaped UA pool — exercises the regex mini-parser's browser and
#: robot branches like production traffic would.
UAS = [
    "Mozilla/5.0 (X11; Linux x86_64; rv:75.0) Gecko/20100101 Firefox/75.0",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.0 Safari/605.1.15",
    "Mozilla/5.0 (compatible; Googlebot/2.1; +http://www.google.com/bot.html)",
    "curl/8.5.0",
]
#: overridable via --services N (the writer stage parallelizes by
#: (service, date) key count — N probes whether the throughput ceiling
#: is writer-partition-bound)
SERVICES = ["example", "blog", "api", "shop"]
PATHS = ["/", "/index.html", "/api/v1/items", "/posts/42", "/robots.txt"]


def write_spool(
    spool_dir: str,
    rows: int,
    lines_per_file: int,
    seq_start: int = 0,
    skew_pct: float = 0.0,
) -> int:
    """Write ``rows`` synthetic datagrams as spool text files; returns
    the number of files written. Line shape matches the reference's
    nginx→syslog frame (<PRI>header: {json}); fields rotate through
    small pools so (service, date) partitioning, UA parsing, and the
    GeoIP miss path all run on realistic variety.

    ``skew_pct`` > 0 routes that fraction of rows onto ONE
    (service, date) key — the hot-partition fixture for the
    escape-hatch A/B (BASELINE §6w)."""
    os.makedirs(spool_dir, exist_ok=True)
    n_files = 0
    i = 0
    fi = seq_start
    skew_mod = int(skew_pct * 1000)
    while i < rows:
        chunk = min(lines_per_file, rows - i)
        lines = []
        for k in range(i, i + chunk):
            hot = (k % 1000) < skew_mod
            svc = SERVICES[0] if hot else SERVICES[k % len(SERVICES)]
            ua = UAS[k % len(UAS)].replace('"', "")
            path = PATHS[k % len(PATHS)]
            day = 1 if hot else 1 + (k % 3)
            sec = k % 86400
            hh, rem = divmod(sec, 3600)
            mm, ss = divmod(rem, 60)
            ip = f"10.{(k >> 16) & 255}.{(k >> 8) & 255}.{k & 255}"
            lines.append(
                f'<190>Jan  {day} 12:00:00 host nginx: '
                f'{{"service": "{svc}", "ip": "{ip}", '
                f'"host": "{svc}.example.com", "path": "{path}", '
                f'"status": "200", "referrer": "", '
                f'"user_agent": "{ua}", "length": {100 + k % 900}, '
                f'"generation_time_milli": 0.{k % 100:02d}, '
                f'"date": "2024-01-0{day}T{hh:02d}:{mm:02d}:{ss:02d}+00:00"}}'
            )
        tmp = os.path.join(spool_dir, f".datagrams-{fi:06d}.log.part")
        with open(tmp, "w") as fh:
            fh.write("\n".join(lines) + "\n")
        # rename-into-place: the file source must never see a half file
        os.rename(tmp, os.path.join(spool_dir, f"datagrams-{fi:06d}.log"))
        n_files += 1
        fi += 1
        i += chunk
    return n_files


def count_parquet(root: str) -> int:
    n = 0
    for dirpath, _dirs, files in os.walk(root):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--lines-per-file", type=int, default=20_000)
    ap.add_argument(
        "--live-seconds",
        type=int,
        default=0,
        help="if > 0, run live mode for this long instead of drain",
    )
    ap.add_argument(
        "--live-files-per-sec",
        type=float,
        default=1.0,
        help="live mode: spool files appended per second",
    )
    ap.add_argument("--trigger-seconds", type=int, default=5)
    ap.add_argument(
        "--max-files-per-trigger",
        type=int,
        default=None,
        help="backpressure bound passed to start_file_ingest",
    )
    ap.add_argument("--keep", action="store_true", help="keep work dir")
    ap.add_argument(
        "--skew-pct",
        type=float,
        default=0.0,
        help="fraction of rows routed to ONE (service, date) key",
    )
    ap.add_argument(
        "--hot-partition-rows",
        type=lambda v: v if v == "auto" else int(v),
        default=None,
        help="escape-hatch threshold passed to start_file_ingest "
        "(an int, or 'auto' to derive it from each batch)",
    )
    ap.add_argument(
        "--services",
        type=int,
        default=len(SERVICES),
        help="number of distinct services in the synthetic stream",
    )
    args = ap.parse_args()
    if args.services != len(SERVICES):
        SERVICES[:] = [f"svc{i:03d}" for i in range(args.services)]

    work = tempfile.mkdtemp(prefix="ingest_bench_")
    spool = os.path.join(work, "spool")
    warehouse = os.path.join(work, "warehouse")
    ckpt = os.path.join(work, "ckpt")
    spark = get_spark(app_name="ingest_bench")

    payload: dict = {
        "metric": "ingest_rows_per_sec",
        "unit": "rows/sec",
        "rows": args.rows,
        "mode": "live" if args.live_seconds else "drain",
        "trigger_seconds": args.trigger_seconds,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "skew_pct": args.skew_pct,
        "hot_partition_rows": args.hot_partition_rows,
    }

    if args.live_seconds:
        # live mode: feeder thread appends files while the 5 s-trigger
        # stream runs; recentProgress gives per-batch duration/rows
        per_file = max(
            1, int(args.rows / (args.live_seconds * args.live_files_per_sec))
        )
        stop = threading.Event()
        written = {"rows": 0, "files": 0}

        def feeder() -> None:
            seq = 0
            interval = 1.0 / args.live_files_per_sec
            deadline = time.monotonic() + args.live_seconds
            while not stop.is_set() and time.monotonic() < deadline:
                t0 = time.monotonic()
                write_spool(spool, per_file, per_file, seq_start=seq,
                            skew_pct=args.skew_pct)
                written["rows"] += per_file
                written["files"] += 1
                seq += 1
                time.sleep(max(0.0, interval - (time.monotonic() - t0)))

        os.makedirs(spool, exist_ok=True)
        q = start_file_ingest(
            spark, spool, warehouse, ckpt,
            trigger_seconds=args.trigger_seconds,
            max_files_per_trigger=args.max_files_per_trigger,
            hot_partition_rows=args.hot_partition_rows,
        )
        th = threading.Thread(target=feeder, daemon=True)
        t0 = time.perf_counter()
        th.start()
        th.join()
        # let the stream drain the tail: wait until total input rows
        # reach what the feeder wrote (or a generous timeout)
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            done = sum(
                p["numInputRows"] for p in (q.recentProgress or [])
            )
            if done >= written["rows"]:
                break
            time.sleep(0.5)
        wall = time.perf_counter() - t0
        prog = [
            {
                "batchId": p["batchId"],
                "numInputRows": p["numInputRows"],
                "batchDuration_ms": p.get("batchDuration"),
            }
            for p in (q.recentProgress or [])
            if p["numInputRows"] > 0
        ]
        q.stop()
        durs = [p["batchDuration_ms"] for p in prog if p["batchDuration_ms"]]
        payload.update(
            rows=written["rows"],
            spool_files=written["files"],
            value=round(written["rows"] / wall, 1),
            wall_sec=round(wall, 2),
            n_batches=len(prog),
            batch_ms_max=max(durs) if durs else None,
            batch_ms_median=sorted(durs)[len(durs) // 2] if durs else None,
            batches_over_trigger=sum(
                1 for d in durs if d > args.trigger_seconds * 1000
            ),
        )
    else:
        t_gen0 = time.perf_counter()
        n_files = write_spool(
            spool, args.rows, args.lines_per_file, skew_pct=args.skew_pct
        )
        gen_sec = time.perf_counter() - t_gen0
        t0 = time.perf_counter()
        q = start_file_ingest(
            spark, spool, warehouse, ckpt, available_now=True,
            max_files_per_trigger=args.max_files_per_trigger,
            hot_partition_rows=args.hot_partition_rows,
        )
        q.awaitTermination()
        wall = time.perf_counter() - t0
        payload.update(
            spool_files=n_files,
            gen_sec=round(gen_sec, 2),
            value=round(args.rows / wall, 1),
            wall_sec=round(wall, 2),
        )

    # small-file story + conservation across compaction
    files_before = count_parquet(warehouse)
    rows_before = spark.read.parquet(warehouse).count()
    t0 = time.perf_counter()
    compact_warehouse(spark, warehouse, target_file_mb=128)
    compact_sec = time.perf_counter() - t0
    files_after = count_parquet(warehouse)
    rows_after = spark.read.parquet(warehouse).count()
    payload.update(
        ingested_rows=rows_before,
        parquet_files_before_compact=files_before,
        parquet_files_after_compact=files_after,
        compact_sec=round(compact_sec, 2),
        rows_conserved=rows_before == rows_after,
    )

    print(json.dumps(payload))
    spark.stop()
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
