"""UDP → spool-file bridge (S1 transport).

Spark has no UDP socket source; the reference's transport is nginx →
syslog-UDP (reference ballcone/syslog_protocol.py:32, port 65140,
README.md:122-123). This stdlib-only bridge keeps that lossy boundary
outside the engine: it listens on UDP, appends each datagram as one line
to a rolling spool file, and the Structured Streaming file source tails
the spool directory (:func:`ballcone_spark.streaming.ingest.start_file_ingest`).

Run standalone:  python -m ballcone_spark.sources.udp_bridge --port 65140 --spool /var/spool/ballcone

Rolling policy: a new file every ``roll_seconds`` or ``roll_bytes``,
written with a dot-prefix (hidden from the file source) and renamed into
place on roll — the file source only ever sees complete files.
"""

from __future__ import annotations

import argparse
import os
import signal
import socket
import time

__all__ = ["UdpSpool", "open_udp_socket", "run_bridge", "main"]

#: Default receive-buffer request (r12): the Linux default rcvbuf
#: (~212 KB) holds ~6 ms of traffic at 100 k rows/s × 330 B — any
#: stall in the single-threaded drain loop (a roll's close+rename, a
#: GC pause) overflows it and the kernel silently drops datagrams
#: (measured: 36 % loss at 100 k rows/s offered). 8 MB holds ~240 ms.
#: The kernel clamps the grant to ``net.core.rmem_max``; deployments
#: that need the full window raise that sysctl.
RCVBUF_BYTES = 8 * 1024 * 1024


def open_udp_socket(
    host: str,
    port: int,
    rcvbuf_bytes: int = RCVBUF_BYTES,
    reuse_port: bool = False,
) -> socket.socket:
    """Bound UDP socket with an enlarged receive buffer — shared by the
    standalone bridge and the in-process test/demo harnesses so every
    measurement exercises the shipped socket configuration.

    ``reuse_port`` sets ``SO_REUSEPORT`` before bind: N sockets bound to
    the same port shard incoming datagrams by a kernel flow hash
    (source ip:port), which is how the bridge scales past one drain
    loop (:func:`run_bridge` with ``workers > 1``)."""
    sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    sock.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, rcvbuf_bytes)
    if reuse_port:
        sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEPORT, 1)
    sock.bind((host, port))
    return sock


class UdpSpool:
    def __init__(
        self,
        spool_dir: str,
        roll_seconds: float = 5.0,
        roll_bytes: int = 4 * 1024 * 1024,
        name_prefix: str = "datagrams",
    ):
        self.spool_dir = spool_dir
        self.roll_seconds = roll_seconds
        self.roll_bytes = roll_bytes
        # per-worker prefix keeps sharded writers collision-free in one
        # spool dir; the file source reads every published file, so the
        # name is layout, not semantics
        self.name_prefix = name_prefix
        os.makedirs(spool_dir, exist_ok=True)
        self._f = None
        self._path = None
        self._opened = 0.0
        self._written = 0
        self._seq = 0

    def _publish(self) -> None:
        """Close the in-progress file and rename it visible (atomic)."""
        if self._f is not None:
            self._f.close()
            final = os.path.join(self.spool_dir, os.path.basename(self._path)[1:])
            os.rename(self._path, final)
            self._f = None

    def _open_new(self) -> None:
        self._seq += 1
        self._path = os.path.join(
            self.spool_dir,
            f".{self.name_prefix}-{int(time.time())}-{self._seq:06d}.log",
        )
        self._f = open(self._path, "ab")
        self._opened = time.monotonic()
        self._written = 0

    def _roll_due(self) -> bool:
        return self._f is not None and (
            time.monotonic() - self._opened >= self.roll_seconds
            or self._written >= self.roll_bytes
        )

    def maybe_roll(self) -> None:
        """Publish the current file if it aged out — called on idle ticks
        too, so data never sits hidden while traffic is quiet."""
        if self._roll_due():
            self._publish()

    def write(self, datagram: bytes) -> None:
        if self._roll_due():
            self._publish()
        if self._f is None:
            self._open_new()
        # one datagram per line; strip embedded newlines (a datagram is a
        # single syslog frame — the reference decodes it as one message)
        line = datagram.replace(b"\n", b" ").rstrip() + b"\n"
        # buffered, NOT flushed per line (r12): the in-progress file is
        # dot-hidden until the roll's close+rename publishes it, so the
        # file source never reads unflushed bytes — and a bridge crash
        # loses the whole in-progress file whether or not it was
        # flushed (same at-most-once transport as the reference's UDP).
        # Per-line flush was a write syscall per datagram — pure drain-
        # loop cost, and every drain-loop stall is kernel-buffer drops.
        self._f.write(line)
        self._written += len(line)

    def close(self) -> None:
        self._publish()


def _drain_loop(
    host: str,
    port: int,
    spool_dir: str,
    roll_seconds: float,
    name_prefix: str,
    reuse_port: bool,
) -> None:
    """One receiver: bound socket → rolling spool. The entire bridge
    when ``workers=1``; one shard of it otherwise."""
    spool = UdpSpool(
        spool_dir, roll_seconds=roll_seconds, name_prefix=name_prefix
    )
    sock = open_udp_socket(host, port, reuse_port=reuse_port)
    sock.settimeout(1.0)

    stop = {"flag": False}

    def _term(_sig, _frm):  # graceful shutdown publishes the open file
        stop["flag"] = True

    signal.signal(signal.SIGTERM, _term)
    signal.signal(signal.SIGINT, _term)
    try:
        while not stop["flag"]:
            try:
                data, _addr = sock.recvfrom(65536)
            except socket.timeout:
                spool.maybe_roll()
                continue
            spool.write(data)
    finally:
        spool.close()
        sock.close()


def run_bridge(
    host: str,
    port: int,
    spool_dir: str,
    roll_seconds: float = 5.0,
    workers: int = 1,
) -> None:
    """Run the bridge, optionally sharded across ``workers`` processes.

    The single-threaded drain loop tops out around ~50 k datagrams/s
    (Python ``recvfrom`` — same shape as the reference's one asyncio
    loop, reference ballcone/syslog_protocol.py:29-41). ``workers > 1``
    binds N ``SO_REUSEPORT`` sockets on the same port in N processes:
    the kernel shards datagrams by a flow hash of (source ip, source
    port), so each nginx worker / service emitter (its own sender
    socket) pins to one bridge worker and the aggregate ceiling scales
    ~linearly in workers. Honest boundary: ONE sender socket is ONE
    flow — sharding does not help a single-socket firehose; that
    producer must spread its own sends over several sockets.

    Each worker writes its own ``datagrams-wK-*`` spool files (no
    cross-process coordination; the Structured Streaming file source
    reads the union). Blocks until SIGTERM/SIGINT, which is forwarded
    to the workers; each publishes its in-progress file on the way out.
    """
    if workers <= 1:
        _drain_loop(host, port, spool_dir, roll_seconds, "datagrams",
                    reuse_port=False)
        return

    import multiprocessing as mp

    ctx = mp.get_context("spawn")  # no inherited JVM/socket state
    procs = [
        ctx.Process(
            target=_drain_loop,
            args=(host, port, spool_dir, roll_seconds, f"datagrams-w{i}",
                  True),
            daemon=False,
        )
        for i in range(workers)
    ]
    for p in procs:
        p.start()

    stop = {"flag": False}

    def _term(_sig, _frm):
        stop["flag"] = True

    signal.signal(signal.SIGTERM, _term)
    signal.signal(signal.SIGINT, _term)
    try:
        while not stop["flag"] and any(p.is_alive() for p in procs):
            time.sleep(0.2)
    finally:
        for p in procs:
            if p.is_alive():
                p.terminate()  # SIGTERM → graceful publish in the child
        for p in procs:
            p.join(timeout=10)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="UDP → spool-file bridge")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=65140)
    ap.add_argument("--spool", required=True)
    ap.add_argument("--roll-seconds", type=float, default=5.0)
    ap.add_argument("--workers", type=int, default=1,
                    help="SO_REUSEPORT receiver processes (scale past "
                         "the ~50k rows/s single-loop ceiling)")
    args = ap.parse_args(argv)
    run_bridge(args.host, args.port, args.spool,
               roll_seconds=args.roll_seconds, workers=args.workers)


if __name__ == "__main__":
    main()
