#!/usr/bin/env python
"""End-to-end live demo measurement (VERDICT r10 #7): the reference's
actual product loop — nginx→syslog-UDP → bridge → spool → 5 s-trigger
streaming ingest → partitioned warehouse → HTTP dashboard/SQL routes —
run as ONE system under live load, measuring FRESHNESS: how long after
a datagram leaves the UDP socket until a dashboard query can see it.

Chain (all shipped components, product-default knobs):

  feeder thread ──UDP──▶ UdpSpool bridge thread (roll 5 s)
                              │ spool files
                              ▼
  start_file_ingest (processingTime 5 s) ──▶ warehouse parquet
                              ▲                     │
  BallconeHTTPServer ◀── Ballcone(SparkDAO) ◀───────┘
        ▲
  prober thread: marker datagrams + /sql polls + route timings

Freshness per marker k: send one datagram with the unique path
``/probe/<k>`` (recording t_send), then poll the web ``/sql`` route —
``SELECT count(*) FROM <service> WHERE path = '/probe/<k>'`` — until it
returns 1; freshness = t_visible − t_send. The poll goes through the
FULL read path (HTTP → DAO → Spark SQL over the live warehouse), so the
number includes every real contribution: bridge roll latency, trigger
wait, micro-batch duration, and query time. Background load runs
concurrently so batches are never empty. Dashboard (``/``) and service
overview (``/services/<svc>``) latencies are sampled mid-ingest.

Prints ONE JSON line (bench.py convention).

Usage:
  python tools/live_demo.py --seconds 60 --rows-per-sec 20000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import socket
import sys
import tempfile
import threading
import time
import urllib.request

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from ballcone_spark.app import Ballcone  # noqa: E402
from ballcone_spark.dao import SparkDAO  # noqa: E402
from ballcone_spark.session import get_spark  # noqa: E402
from ballcone_spark.sources.udp_bridge import (  # noqa: E402
    UdpSpool,
    open_udp_socket,
)
from ballcone_spark.streaming.ingest import (  # noqa: E402
    compact_warehouse,
    start_file_ingest,
)
from ballcone_spark.web import BallconeHTTPServer  # noqa: E402

SERVICE = "example"
UA = (
    "Mozilla/5.0 (X11; Linux x86_64; rv:75.0) Gecko/20100101 Firefox/75.0"
)


def datagram(path: str, k: int) -> bytes:
    return (
        f'<190>Jan  1 12:00:00 host nginx: {{"service": "{SERVICE}", '
        f'"ip": "10.0.{(k >> 8) & 255}.{k & 255}", '
        f'"host": "example.com", "path": "{path}", "status": "200", '
        f'"referrer": "", "user_agent": "{UA}", "length": {100 + k % 900}, '
        f'"generation_time_milli": 0.{k % 100:02d}, '
        f'"date": "2024-01-01T12:00:00+00:00"}}'
    ).encode()


def run_bridge(
    spool_dir: str,
    port_box: dict,
    stop: threading.Event,
    roll_seconds: float = 5.0,
):
    """In-process copy of udp_bridge.main's loop (the module-level main
    blocks on signals; the demo needs a joinable thread)."""
    spool = UdpSpool(spool_dir, roll_seconds=roll_seconds)
    sock = open_udp_socket("127.0.0.1", 0)
    port_box["port"] = sock.getsockname()[1]
    sock.settimeout(0.25)
    try:
        while not stop.is_set():
            try:
                data, _ = sock.recvfrom(65536)
            except socket.timeout:
                spool.maybe_roll()
                continue
            spool.write(data)
    finally:
        spool.close()
        sock.close()


def http_json(url: str) -> tuple[dict, float]:
    t0 = time.perf_counter()
    with urllib.request.urlopen(url, timeout=30) as r:
        payload = json.loads(r.read())
    return payload, time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=int, default=60)
    ap.add_argument("--rows-per-sec", type=int, default=20_000)
    ap.add_argument("--marker-every", type=float, default=3.0)
    ap.add_argument(
        "--roll-seconds", type=float, default=5.0,
        help="bridge spool-file roll period (product default 5 s)",
    )
    ap.add_argument(
        "--trigger-seconds", type=int, default=5,
        help="ingest micro-batch trigger period (product default 5 s)",
    )
    ap.add_argument(
        "--warmup-markers",
        type=int,
        default=2,
        help="exclude the first N markers from the freshness stats — "
        "they absorb the one-off codegen/stream warm-up a resident "
        "daemon (the reference's deployment shape) doesn't pay per "
        "event; recorded separately as warmup_freshness",
    )
    ap.add_argument(
        "--bridge-workers", type=int, default=1,
        help="run the REAL bridge subprocess with N SO_REUSEPORT "
        "shards (§6ag) instead of the in-process thread — lifts the "
        "~50k rows/s single-loop transport ceiling so the demo can "
        "probe where the loop binds beyond it",
    )
    ap.add_argument(
        "--feeder-procs", type=int, default=1,
        help="split the offered rate over N sender SUBPROCESSES, each "
        "with its own socket pool (one socket = one kernel flow = one "
        "bridge shard). Processes, not threads: the driver's GIL "
        "(py4j + HTTP server) capped an in-process feeder near "
        "~35 k rows/s aggregate regardless of thread count",
    )
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    work = tempfile.mkdtemp(prefix="live_demo_")
    spool = os.path.join(work, "spool")
    warehouse = os.path.join(work, "warehouse")
    os.makedirs(os.path.join(warehouse, "data"), exist_ok=True)

    spark = get_spark(app_name="live_demo")
    dao = SparkDAO(spark, warehouse)
    dao.create_table(SERVICE)
    server = BallconeHTTPServer(Ballcone(dao)).start()
    base = f"http://127.0.0.1:{server.port}"

    stop = threading.Event()
    bridge_proc = None
    if args.bridge_workers > 1:
        import subprocess

        probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        probe.bind(("127.0.0.1", 0))
        udp_port = probe.getsockname()[1]
        probe.close()
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        bridge_proc = subprocess.Popen(
            [sys.executable, "-m", "ballcone_spark.sources.udp_bridge",
             "--port", str(udp_port), "--spool", spool,
             "--roll-seconds", str(args.roll_seconds),
             "--workers", str(args.bridge_workers)],
            env=dict(os.environ, PYTHONPATH=repo),
        )
        # readiness = the port is actually BOUND (a plain bind attempt
        # fails with EADDRINUSE once a shard holds it via SO_REUSEPORT).
        # A fixed sleep converted slow shard startup into measured
        # "UDP loss" — the exact metric this tool exists for.
        deadline_b = time.monotonic() + 15
        while True:
            if bridge_proc.poll() is not None:
                raise RuntimeError(
                    f"bridge exited rc={bridge_proc.returncode} at startup"
                )
            probe2 = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            try:
                probe2.bind(("127.0.0.1", udp_port))
                probe2.close()  # still free — shards not bound yet
            except OSError:
                probe2.close()
                break  # EADDRINUSE: a shard owns the port
            if time.monotonic() >= deadline_b:
                raise RuntimeError("bridge never bound its port")
            time.sleep(0.2)
        bridge = None
    else:
        port_box: dict = {}
        bridge = threading.Thread(
            target=run_bridge,
            args=(spool, port_box, stop, args.roll_seconds),
            daemon=True,
        )
        bridge.start()
        while "port" not in port_box:
            time.sleep(0.01)
        udp_port = port_box["port"]

    q = start_file_ingest(
        spark, spool, os.path.join(warehouse, "data"),
        os.path.join(work, "ckpt"),
        trigger_seconds=args.trigger_seconds,
    )

    send = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sent = {"rows": 0}

    # background load in SUBPROCESSES: the sender builds the same
    # datagram shape as datagram() but with a pre-encoded %-template —
    # in-process feeders shared the driver's GIL with py4j and the HTTP
    # server and capped near ~35 k rows/s aggregate
    feeder_src = """
import socket, time
socks = [socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
         for _ in range(8)]
tmpl = ({tmpl!r})
rate, seconds, port = {rate}, {seconds}, {port}
sent = 0
t0 = time.monotonic()
while True:
    el = time.monotonic() - t0
    if el >= seconds:
        break
    if sent >= min(rate * el, rate * seconds):
        time.sleep(0.002)
        continue
    for _ in range(200):
        k = sent
        socks[k % 8].sendto(
            tmpl % ((k >> 8) & 255, k & 255, k % 512, 100 + k % 900,
                    k % 100),
            ("127.0.0.1", port))
        sent += 1
print(sent)
"""
    tmpl = (
        f'<190>Jan  1 12:00:00 host nginx: {{"service": "{SERVICE}", '
        f'"ip": "10.0.%d.%d", '
        f'"host": "example.com", "path": "/load/%d", "status": "200", '
        f'"referrer": "", "user_agent": "{UA}", "length": %d, '
        f'"generation_time_milli": 0.%02d, '
        f'"date": "2024-01-01T12:00:00+00:00"}}'
    ).encode()
    import subprocess as _subprocess

    per = args.rows_per_sec // args.feeder_procs
    offered = per * args.feeder_procs  # honest: the remainder is not sent
    feeders = [
        _subprocess.Popen(
            [sys.executable, "-c",
             feeder_src.format(tmpl=tmpl, rate=per,
                               seconds=args.seconds, port=udp_port)],
            stdout=_subprocess.PIPE,  # stderr inherits → diagnosable
        )
        for _ in range(args.feeder_procs)
    ]

    # prober: marker datagrams + /sql visibility polls + route timings
    freshness: list[float] = []
    markers_lost = 0  # poll timed out — the marker datagram was dropped
    route_ms: dict[str, list[float]] = {"dashboard": [], "overview": []}
    t_end = time.monotonic() + args.seconds
    k = 0
    while time.monotonic() < t_end:
        k += 1
        path = f"/probe/{k}"
        send.sendto(datagram(path, k), ("127.0.0.1", udp_port))
        t_send = time.monotonic()
        sql = (
            f"SELECT count(*) AS c FROM {SERVICE} "
            f"WHERE path = '{path}'"
        )
        url = f"{base}/sql?sql=" + urllib.request.quote(sql)
        deadline_mk = t_send + 45
        while True:
            if time.monotonic() >= deadline_mk:
                markers_lost += 1  # lossy UDP ate the marker itself
                break
            payload, _ = http_json(url)
            rows = payload.get("rows") or []
            if rows and rows[0] and int(rows[0][0]) >= 1:
                freshness.append(time.monotonic() - t_send)
                break
            time.sleep(0.15)
        # mid-ingest route latencies (the reference's dashboard loop)
        _, dt = http_json(f"{base}/?day=2024-01-01")
        route_ms["dashboard"].append(dt * 1000)
        _, dt = http_json(
            f"{base}/services/{SERVICE}?start=2024-01-01&stop=2024-01-01"
        )
        route_ms["overview"].append(dt * 1000)
        time.sleep(max(0.0, args.marker_every - (time.monotonic() - t_send)))

    feeder_failures = 0
    for f in feeders:
        try:
            out_b, _ = f.communicate(timeout=60)
            sent["rows"] += int(out_b)
        except Exception:
            # a dead feeder must not discard the run's measurements;
            # its stderr already went to the console
            feeder_failures += 1
            f.kill()
    # drain the tail before stopping: markers are already all visible
    time.sleep(6)
    prog = [
        {
            "batchId": p["batchId"],
            "numInputRows": p["numInputRows"],
            "batchDuration_ms": p.get("batchDuration"),
            "durationMs": p.get("durationMs") or {},
        }
        for p in (q.recentProgress or [])
        if p["numInputRows"] > 0
    ]
    q.stop()
    stop.set()
    if bridge_proc is not None:
        import signal as _signal

        bridge_proc.send_signal(_signal.SIGTERM)
        bridge_proc.wait(timeout=20)
    else:
        bridge.join(timeout=10)

    # small-file story under live load + row conservation
    data_dir = os.path.join(warehouse, "data")
    files_before = sum(
        1 for _, _, fs in os.walk(data_dir) for f in fs
        if f.endswith(".parquet")
    )
    rows_before = spark.read.parquet(data_dir).count()
    compact_warehouse(spark, data_dir)
    rows_after = spark.read.parquet(data_dir).count()

    def pct(xs: list[float], p: float) -> float:
        xs = sorted(xs)
        return xs[min(len(xs) - 1, int(p * len(xs)))]

    warmup = freshness[: args.warmup_markers]
    freshness = freshness[args.warmup_markers:]
    durs = [p["batchDuration_ms"] for p in prog if p["batchDuration_ms"]]
    # micro-batch floor decomposition (r12): median of each durationMs
    # phase over non-empty batches — shows WHERE the fixed per-batch
    # cost lives (addBatch = plan+execute+sink commit; latestOffset/
    # getBatch = source listing; walCommit/commitOffsets = checkpoint
    # fsyncs), so a floor regression points at its phase
    phase_keys = sorted({k for p in prog for k in p["durationMs"]})
    phase_ms_median = {
        k: sorted(int(p["durationMs"].get(k, 0)) for p in prog)[
            len(prog) // 2
        ]
        for k in phase_keys
    } if prog else {}
    payload = {
        "metric": "live_freshness_p50",
        "value": round(pct(freshness, 0.5), 2) if freshness else None,
        "unit": "sec",
        "rows_sent": sent["rows"] + k,
        "offered_rows_per_sec": offered,
        "feeder_failures": feeder_failures,
        "run_seconds": args.seconds,
        "roll_seconds": args.roll_seconds,
        "trigger_seconds": args.trigger_seconds,
        "bridge_workers": args.bridge_workers,
        "feeder_procs": args.feeder_procs,
        "markers": len(freshness),
        "markers_lost": markers_lost,
        "udp_loss_pct": round(
            100.0 * (1 - rows_before / max(1, sent["rows"] + k)), 2
        ),
        "freshness_p50": round(pct(freshness, 0.5), 2) if freshness else None,
        "freshness_p90": round(pct(freshness, 0.9), 2) if freshness else None,
        "freshness_max": round(max(freshness), 2) if freshness else None,
        "warmup_freshness": [round(x, 2) for x in warmup],
        "route_ms_median": {
            r: round(pct(v, 0.5), 1) for r, v in route_ms.items() if v
        },
        "n_batches": len(prog),
        "batch_ms_median": sorted(durs)[len(durs) // 2] if durs else None,
        "batch_phase_ms_median": phase_ms_median,
        "batch_ms_max": max(durs) if durs else None,
        "rows_ingested": rows_before,
        "rows_after_compact": rows_after,
        "files_before_compact": files_before,
        "files_after_compact": sum(
            1 for _, _, fs in os.walk(data_dir) for f in fs
            if f.endswith(".parquet")
        ),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }
    server.shutdown()
    if not args.keep:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
