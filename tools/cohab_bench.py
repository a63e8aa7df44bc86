"""Multi-stream cohabitation envelope (r14, VERDICT r13 #4): every
stream has a SOLO envelope; a deployment runs several on one driver.
This bench runs the semantic dedup stream (vector spool + serving
client) and the decon stream (doc/bench spools) in three arms —
semantic solo, decon solo, both together — with identical feeders and
durations, and reports trigger-loop medians, serving latency, and
index freshness per arm, so the cohabitation deltas are like-for-like
within one session.

Binder diagnostics: a scheduler probe thread times a 1-task no-op job
(`spark.range(0,1,1,1).count()`) once a second in every arm. Local
mode shares one scheduler and 32 cores between all streams, so:
probe latency inflating while loadavg stays well under the core count
points at DRIVER-SIDE serialization (foreachBatch Python + job
scheduling); loadavg pinned at/over the core count points at executor
CPU, the §6av serving ceiling.

  python tools/cohab_bench.py --seconds 75
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
    v = [0.0] * DIM
    v[(2 * phi) % DIM] = math.cos(theta)
    v[(2 * phi + 1) % DIM] = math.sin(theta)
    return v


def _pct(xs, p):
    xs = sorted(x for x in xs if x == x)
    return round(xs[min(len(xs) - 1, int(p * len(xs)))], 3) if xs else None


def _atomic_write(spool, name, lines):
    tmp = os.path.join(spool, f".{name}.jsonl")
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(tmp, os.path.join(spool, f"{name}.jsonl"))


def _set_pool(spark, pool):
    """Scheduler-pool local property for the CURRENT thread (inherited
    by threads it creates). No-op under the default FIFO scheduler."""
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)


class SemanticLoad:
    """Vector spool feeder + semantic stream + serving/freshness
    prober — the §6an live-demo loop, reusable per arm."""

    def __init__(self, spark, work, seconds, rows_per_sec=500,
                 trigger_seconds=2, cells=4, compact_every=8, pool=None):
        self.spark, self.seconds = spark, seconds
        self.rows_per_sec, self.cells = rows_per_sec, cells
        self.trigger_seconds, self.pool = trigger_seconds, pool
        self.spool = os.path.join(work, "vspool")
        os.makedirs(self.spool)
        self.idx = os.path.join(work, "vidx")
        self.dec = os.path.join(work, "vdec")
        self.centroids = [(c, _unit(0.2 * c, c)) for c in range(cells)]
        from ballcone_spark.streaming.semantic_stream import (
            ResidentIndexCache,
            start_semantic_dedup_stream,
        )

        self.cache = ResidentIndexCache(spark, self.idx)
        self.q = start_semantic_dedup_stream(
            spark, self.spool, self.idx, self.dec,
            os.path.join(work, "vckpt"), self.centroids, tau=0.99,
            available_now=False, trigger_seconds=trigger_seconds,
            compact_every=compact_every, scheduler_pool=pool,
        )
        self.freshness: list[float] = []
        self.serve_s: list[float] = []
        self._stop = threading.Event()
        self._feeder = threading.Thread(target=self._feed, daemon=True)
        self._prober = threading.Thread(target=self._probe, daemon=True)
        self._feeder.start()
        self._prober.start()

    def _feed(self):
        k, seq, buf = 0, 0, []
        last_roll = time.monotonic()
        deadline = time.monotonic() + self.seconds
        per_tick = max(1, self.rows_per_sec // 10)
        while not self._stop.is_set() and time.monotonic() < deadline:
            t0 = time.monotonic()
            for _ in range(per_tick):
                buf.append(json.dumps(
                    {"vec_id": 1_000_000 + k,
                     "e": _unit(0.2 * (k % self.cells) + (k % 50) * 0.002,
                                k % self.cells)}
                ))
                k += 1
            if time.monotonic() - last_roll >= 2.0 and buf:
                seq += 1
                _atomic_write(self.spool, f"load-{seq:06d}", buf)
                buf, last_roll = [], time.monotonic()
            time.sleep(max(0.0, 0.1 - (time.monotonic() - t0)))

    def _probe(self):
        from ballcone_spark.streaming.semantic_stream import (
            semantic_index_topk,
        )

        if self.pool:
            _set_pool(self.spark, f"{self.pool}-serve")
        mk = 0
        deadline = time.monotonic() + self.seconds
        while not self._stop.is_set() and time.monotonic() < deadline:
            mk += 1
            mvid = 2_000_000 + mk
            mvec = _unit(0.2 * (mk % self.cells) + 0.09 + mk * 0.0003,
                         mk % self.cells)
            _atomic_write(self.spool, f"mk-{mk:06d}",
                          [json.dumps({"vec_id": mvid, "e": mvec})])
            t_send = time.monotonic()
            mk_deadline = t_send + 45
            found = False
            while not self._stop.is_set() and time.monotonic() < mk_deadline:
                t0 = time.monotonic()
                res = semantic_index_topk(
                    self.spark, self.idx, [(mk, mvec)], self.centroids,
                    k=1, nprobe=1, index_cache=self.cache,
                )
                rows = res.collect() if res is not None else []
                self.serve_s.append(time.monotonic() - t0)
                if rows and rows[0]["neighbor_id"] == mvid:
                    self.freshness.append(time.monotonic() - t_send)
                    found = True
                    break
                time.sleep(0.2)
            if not found:
                self.freshness.append(float("nan"))
            time.sleep(max(0.0, 3.0 - (time.monotonic() - t_send)))

    def finish(self) -> dict:
        self._feeder.join(timeout=self.seconds + 30)
        self._prober.join(timeout=self.seconds + 60)
        self._stop.set()
        time.sleep(2 * self.trigger_seconds + 2)
        prog = [p for p in (self.q.recentProgress or [])
                if p["numInputRows"] > 0]
        self.q.stop()
        durs = [p["batchDuration"] for p in prog if p.get("batchDuration")]
        return {
            "n_batches": len(prog),
            "batch_ms_p50": _pct(durs, 0.5),
            "batch_ms_p90": _pct(durs, 0.9),
            "trigger_slippage_p50": (
                round(_pct(durs, 0.5) / (self.trigger_seconds * 1000), 2)
                if durs else None
            ),
            "freshness_p50_s": _pct(self.freshness, 0.5),
            "freshness_p90_s": _pct(self.freshness, 0.9),
            "markers_lost": len([x for x in self.freshness if x != x]),
            "serve_p50_s": _pct(self.serve_s, 0.5),
            "serve_p90_s": _pct(self.serve_s, 0.9),
            "serve_requests": len(self.serve_s),
        }


class IngestLoad:
    """Datagram spool feeder + the reference-parity file-ingest stream
    (r15, VERDICT r14 #5): parse → enrich → (service, date) parquet
    append, driven at a steady file rate like the ingest_bench live
    mode, as a third co-resident beside the semantic serving loop and
    the decon stream."""

    def __init__(self, spark, work, seconds, rows_per_sec=2000,
                 trigger_seconds=2, pool=None):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ingest_bench",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "ingest_bench.py"),
        )
        ib = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ib)
        self._write_spool = ib.write_spool

        from ballcone_spark.streaming.ingest import start_file_ingest

        self.spark, self.seconds = spark, seconds
        self.rows_per_sec = rows_per_sec
        self.trigger_seconds = trigger_seconds
        self.spool = os.path.join(work, "ispool")
        self.wh = os.path.join(work, "iwh")
        os.makedirs(self.spool)
        self.q = start_file_ingest(
            spark, self.spool, self.wh, os.path.join(work, "ickpt"),
            trigger_seconds=trigger_seconds, max_files_per_trigger=64,
            scheduler_pool=pool,
        )
        self._stop = threading.Event()
        self._rows_fed = 0
        self._feeder = threading.Thread(target=self._feed, daemon=True)
        self._feeder.start()

    def _feed(self):
        # one spool file per second at the target rate — the bridge's
        # 5 s roll compressed to match the other loads' cadence
        seq = 0
        deadline = time.monotonic() + self.seconds
        while not self._stop.is_set() and time.monotonic() < deadline:
            t0 = time.monotonic()
            self._write_spool(
                self.spool, self.rows_per_sec, self.rows_per_sec,
                seq_start=seq,
            )
            seq += 1
            self._rows_fed += self.rows_per_sec
            time.sleep(max(0.0, 1.0 - (time.monotonic() - t0)))

    def finish(self) -> dict:
        self._feeder.join(timeout=self.seconds + 30)
        self._stop.set()
        # drain the spool tail, then count what landed
        idle, seen = 0, -1
        deadline = time.monotonic() + 120
        while idle < 2 and time.monotonic() < deadline:
            time.sleep(2 * self.trigger_seconds)
            total = sum(p["numInputRows"]
                        for p in (self.q.recentProgress or []))
            idle = idle + 1 if total == seen else 0
            seen = total
        prog = [p for p in (self.q.recentProgress or [])
                if p["numInputRows"] > 0]
        self.q.stop()
        landed = 0
        if os.path.isdir(self.wh):
            try:
                landed = self.spark.read.parquet(self.wh).count()
            except Exception:
                landed = -1
        durs = [p["batchDuration"] for p in prog if p.get("batchDuration")]
        return {
            "n_batches": len(prog),
            "batch_ms_p50": _pct(durs, 0.5),
            "batch_ms_p90": _pct(durs, 0.9),
            "trigger_slippage_p50": (
                round(_pct(durs, 0.5) / (self.trigger_seconds * 1000), 2)
                if durs else None
            ),
            "rows_fed": self._rows_fed,
            "rows_landed": landed,
        }


class DeconLoad:
    """Doc-wave feeder + decon stream, paced on batch completion (the
    §6ax protocol), benchmark arriving mid-run."""

    def __init__(self, spark, work, sf_dir, waves=7, bench_after=4,
                 trigger_seconds=2, compact_every=3, pool=None):
        from pyspark.sql import functions as F

        from ballcone_spark.streaming import decon_stream as dcs

        self.spark, self.trigger_seconds = spark, trigger_seconds
        self.dcs = dcs
        self.dspool = os.path.join(work, "dsp")
        self.bspool = os.path.join(work, "bsp")
        os.makedirs(self.dspool), os.makedirs(self.bspool)
        self.dirs = [os.path.join(work, d) for d in ("dg", "bg", "fl")]
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).select("doc_id", "source", "text")
        self.corpus = [
            (r["doc_id"], r["text"])
            for r in docs.where(F.col("source") != "src0").collect()
        ]
        self.bench = [
            (r["doc_id"], r["text"])
            for r in docs.where(F.col("source") == "src0").collect()
        ]
        self.waves, self.bench_after = waves, bench_after
        self.q = dcs.start_decon_stream(
            spark, self.dspool, self.bspool, *self.dirs,
            os.path.join(work, "dckpt"), available_now=False,
            trigger_seconds=trigger_seconds, compact_every=compact_every,
            scheduler_pool=pool,
        )
        self._fed_all = threading.Event()
        self._feeder = threading.Thread(target=self._feed, daemon=True)
        self._feeder.start()

    def _n_done(self):
        return len([p for p in (self.q.recentProgress or [])
                    if p["numInputRows"] > 0])

    def _feed(self):
        waves: list[list] = [[] for _ in range(self.waves)]
        for i, row in enumerate(self.corpus):
            waves[i % self.waves].append(row)
        done = 0
        for w in range(self.waves):
            _atomic_write(
                self.dspool, f"wave-{w:03d}",
                [json.dumps({"doc_id": i, "text": t}) for i, t in waves[w]],
            )
            done += 1
            deadline = time.monotonic() + 120
            while self._n_done() < done and time.monotonic() < deadline:
                time.sleep(0.5)
            if w + 1 == self.bench_after:
                _atomic_write(
                    self.bspool, "bench-000",
                    [json.dumps({"bench_id": i, "text": t})
                     for i, t in self.bench],
                )
                done += 1
                deadline = time.monotonic() + 120
                while self._n_done() < done and time.monotonic() < deadline:
                    time.sleep(0.5)
        self._fed_all.set()

    def finish(self) -> dict:
        self._feeder.join(timeout=600)
        # drain whatever is still queued
        idle, seen = 0, -1
        deadline = time.monotonic() + 120
        while idle < 2 and time.monotonic() < deadline:
            time.sleep(2 * self.trigger_seconds)
            total = sum(p["numInputRows"]
                        for p in (self.q.recentProgress or []))
            idle = idle + 1 if total == seen else 0
            seen = total
        prog = [p for p in (self.q.recentProgress or [])
                if p["numInputRows"] > 0]
        self.q.stop()
        got = {
            r["doc_id"]
            for r in self.dcs.read_contaminated(
                self.spark, self.dirs[2]
            ).collect()
        }
        durs = [p["batchDuration"] for p in prog if p.get("batchDuration")]
        return {
            "n_batches": len(prog),
            "batch_ms_p50": _pct(durs, 0.5),
            "batch_ms_p90": _pct(durs, 0.9),
            "trigger_slippage_p50": (
                round(_pct(durs, 0.5) / (self.trigger_seconds * 1000), 2)
                if durs else None
            ),
            "flagged": sorted(got),
            "fed_all_waves": self._fed_all.is_set(),
        }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--seconds", type=int, default=75,
                    help="semantic feeder/prober duration per arm")
    ap.add_argument("--rows-per-sec", type=int, default=500)
    ap.add_argument("--arms", default="semantic_solo,decon_solo,cohab",
                    help="comma-separated subset of: semantic_solo, "
                         "decon_solo, ingest_solo, cohab, cohab3")
    ap.add_argument("--fair", action="store_true",
                    help="FAIR scheduler + one pool per query (the §6ay "
                         "mitigation candidate)")
    ap.add_argument("--stagger", action="store_true",
                    help="co-prime trigger phases in the cohab arms "
                         "(decon 3 s vs semantic 2 s, so the trigger "
                         "edges align only every 6 s) — the §6ay "
                         "mitigation candidate FAIR pools were measured "
                         "against (r15, VERDICT r14 #4)")
    ap.add_argument("--ingest-rows-per-sec", type=int, default=2000)
    args = ap.parse_args()
    wanted = set(args.arms.split(","))

    from ballcone_spark.session import get_spark

    spark = get_spark(
        "cohab_bench",
        extra_conf={"spark.scheduler.mode": "FAIR"} if args.fair else None,
    )
    pools = (lambda n: n) if args.fair else (lambda n: None)
    results: dict = {}

    def sched_probe(stop, out):
        if args.fair:
            _set_pool(spark, "probe")
        while not stop.is_set():
            t0 = time.monotonic()
            spark.range(0, 1, 1, 1).count()
            out.append(time.monotonic() - t0)
            time.sleep(1.0)

    def arm(name, make_loads):
        work = tempfile.mkdtemp(prefix=f"cohab_{name}_")
        stop = threading.Event()
        sched: list[float] = []
        st = threading.Thread(
            target=sched_probe, args=(stop, sched), daemon=True
        )
        st.start()
        la0 = os.getloadavg()[0]
        loads = make_loads(work)
        metrics = {k: v.finish() for k, v in loads.items()}
        la1 = os.getloadavg()[0]
        stop.set()
        st.join(timeout=10)
        results[name] = {
            **metrics,
            "sched_probe_p50_s": _pct(sched, 0.5),
            "sched_probe_p90_s": _pct(sched, 0.9),
            "loadavg_start_end": [round(la0, 1), round(la1, 1)],
        }
        import shutil

        shutil.rmtree(work, ignore_errors=True)
        spark.catalog.clearCache()
        time.sleep(3)

    if "semantic_solo" in wanted:
        arm("semantic_solo", lambda work: {
            "semantic": SemanticLoad(
                spark, work, args.seconds, rows_per_sec=args.rows_per_sec,
                pool=pools("semantic"),
            ),
        })
    if "decon_solo" in wanted:
        arm("decon_solo", lambda work: {
            "decon": DeconLoad(spark, work, args.sf_dir,
                               pool=pools("decon")),
        })
    if "ingest_solo" in wanted:
        arm("ingest_solo", lambda work: {
            "ingest": IngestLoad(
                spark, work, args.seconds,
                rows_per_sec=args.ingest_rows_per_sec,
                pool=pools("ingest"),
            ),
        })
    # staggered cohab: decon on a 3 s trigger vs semantic/ingest on
    # 2 s — processingTime triggers fire on wall-clock multiples of
    # the interval, so equal intervals collide on EVERY edge and
    # co-prime ones only every 6 s
    decon_trigger = 3 if args.stagger else 2
    if "cohab" in wanted:
        arm("cohab", lambda work: {
            "semantic": SemanticLoad(
                spark, work, args.seconds, rows_per_sec=args.rows_per_sec,
                pool=pools("semantic"),
            ),
            "decon": DeconLoad(spark, work, args.sf_dir,
                               trigger_seconds=decon_trigger,
                               pool=pools("decon")),
        })
    if "cohab3" in wanted:
        arm("cohab3", lambda work: {
            "semantic": SemanticLoad(
                spark, work, args.seconds, rows_per_sec=args.rows_per_sec,
                pool=pools("semantic"),
            ),
            "decon": DeconLoad(spark, work, args.sf_dir,
                               trigger_seconds=decon_trigger,
                               pool=pools("decon")),
            "ingest": IngestLoad(
                spark, work, args.seconds,
                rows_per_sec=args.ingest_rows_per_sec,
                pool=pools("ingest"),
            ),
        })

    head = results.get("cohab3") or results.get("cohab") \
        or next(iter(results.values()))

    print(json.dumps({
        "metric": "cohab_envelope",
        "value": (head.get("semantic") or {}).get("freshness_p50_s"),
        "unit": "sec",
        "sf_dir": args.sf_dir,
        "rows_per_sec": args.rows_per_sec,
        "scheduler": "FAIR-pools" if args.fair else "FIFO",
        "stagger": bool(args.stagger),
        "arms": results,
        "cores": os.cpu_count(),
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
