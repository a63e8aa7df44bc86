"""Measure the UDP bridge's loss curve: 1 worker vs SO_REUSEPORT shards.

BASELINE §6ad measured the single-loop bridge at 0 % loss up to
~50 k rows/s and 6.3 % at 100 k offered — the Python ``recvfrom``
ceiling. This bench drives the REAL bridge process
(``python -m ballcone_spark.sources.udp_bridge``) at a target offered
rate from many sender sockets (the nginx-worker shape — the kernel
shards SO_REUSEPORT by source-socket flow hash), then counts published
spool lines against the exact send count.

  python tools/udp_shard_bench.py --rates 50000,100000,200000 --workers 1,4

Prints one JSON line per (workers, rate) arm.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import signal
import socket
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_LINE = (
    b'<190>Jan  1 00:00:00 host ballcone: {"service": "bench", '
    b'"path": "/load/%d", "status": 200, "length": 512, '
    b'"generation_time": 0.01, "ip": "192.0.2.7", '
    b'"datetime": "2026-01-01T00:00:00Z"}'
)


def _free_port() -> int:
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _sender_proc(port: int, rate: int, seconds: float, sockets: int) -> str:
    """Source for a sender subprocess: paced bursts over N source
    sockets, prints the exact count sent."""
    return f"""
import socket, time, sys
socks = [socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
         for _ in range({sockets})]
line = {_LINE!r}
rate, seconds = {rate}, {seconds}
burst = 200
sent = 0
t0 = time.monotonic()
while True:
    el = time.monotonic() - t0
    if el >= seconds:
        break
    target = min(rate * el, rate * seconds)
    if sent >= target:
        time.sleep(0.002)
        continue
    for _ in range(burst):
        socks[sent % {sockets}].sendto(line % (sent % 512,),
                                       ("127.0.0.1", {port}))
        sent += 1
print(sent)
"""


def run_arm(workers: int, rate: int, seconds: float, senders: int,
            sockets_per_sender: int) -> dict:
    port = _free_port()
    spool = tempfile.mkdtemp(prefix=f"udpshard-w{workers}-")
    env = dict(os.environ, PYTHONPATH=REPO)
    bridge = subprocess.Popen(
        [sys.executable, "-m", "ballcone_spark.sources.udp_bridge",
         "--port", str(port), "--spool", spool,
         "--roll-seconds", "1", "--workers", str(workers)],
        env=env, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
    )
    time.sleep(2.0 if workers > 1 else 0.8)  # spawn-context startup
    per = rate // senders
    procs = [
        subprocess.Popen(
            [sys.executable, "-c",
             _sender_proc(port, per, seconds, sockets_per_sender)],
            stdout=subprocess.PIPE, env=env,
        )
        for _ in range(senders)
    ]
    sent = sum(int(p.communicate()[0]) for p in procs)
    time.sleep(2.5)  # let the last roll publish
    bridge.send_signal(signal.SIGTERM)
    bridge.wait(timeout=20)

    received = 0
    per_worker: dict[str, int] = {}
    for name in os.listdir(spool):
        if name.startswith("."):
            continue
        with open(os.path.join(spool, name), "rb") as f:
            n = sum(1 for _ in f)
        received += n
        key = name.split("-")[1] if name.startswith("datagrams-w") else "w0"
        per_worker[key] = per_worker.get(key, 0) + n
    shutil.rmtree(spool, ignore_errors=True)
    return {
        "workers": workers,
        "offered_rate": rate,
        "seconds": seconds,
        "sent": sent,
        "received": received,
        "loss_pct": round(100.0 * (sent - received) / max(sent, 1), 2),
        "achieved_send_rate": round(sent / seconds),
        "per_worker_lines": dict(sorted(per_worker.items())),
        "loadavg1": round(os.getloadavg()[0], 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rates", default="50000,100000,200000")
    ap.add_argument("--workers", default="1,4")
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--senders", type=int, default=4)
    ap.add_argument("--sockets-per-sender", type=int, default=8)
    args = ap.parse_args()
    for w in [int(x) for x in args.workers.split(",")]:
        for r in [int(x) for x in args.rates.split(",")]:
            res = run_arm(w, r, args.seconds, args.senders,
                          args.sockets_per_sender)
            print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
