"""Bucketed decontamination stream, live (r14, VERDICT r13 #3): spool →
`start_decon_stream` → late benchmark arrival, under the REAL trigger
loop — geometry freeze + inline folds + bucket-pruned retro probe
exercised together, the way the §6an vector live demo exposed a race
class the unit tests missed.

Timeline: the sf0.001 corpus (source != src0) is fed in waves through
the doc spool while the stream runs a processingTime trigger; after
enough doc batches have landed AND folded (compact_every crosses
mid-run), the benchmark set (src0) arrives in the bench spool — its
retro probe must scan fold + live history bucket-pruned, and the final
flag set must equal the static batch operator
(`decontamination_flags`) over the same corpora.

Instrumentation: `_pruned_doc_history` is wrapped in-process to record,
per retro probe the STREAM ITSELF runs, whether the history scan's
executed plan carries the `hb` PartitionFilter and how many buckets it
pruned to — the plan gate observed live, not replayed.

  python tools/decon_live_demo.py --waves 5 --trigger-seconds 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--waves", type=int, default=5,
                    help="doc waves before the benchmark arrives")
    ap.add_argument("--post-waves", type=int, default=2,
                    help="doc waves after the benchmark (forward flags)")
    ap.add_argument("--trigger-seconds", type=int, default=2)
    ap.add_argument("--compact-every", type=int, default=3)
    ap.add_argument("--hash-buckets", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from ballcone_spark.operators.dedup import decontamination_flags
    from ballcone_spark.session import get_spark
    from ballcone_spark.streaming import decon_stream as dcs

    spark = get_spark("decon_live_demo")
    work = tempfile.mkdtemp(prefix="decon_live_")
    dspool, bspool = os.path.join(work, "dsp"), os.path.join(work, "bsp")
    os.makedirs(dspool), os.makedirs(bspool)
    dg, bg, fl = (os.path.join(work, d) for d in ("dg", "bg", "fl"))

    docs = spark.read.parquet(
        os.path.join(args.sf_dir, "documents.parquet")
    ).select("doc_id", "source", "text")
    corpus_rows = [
        (r["doc_id"], r["text"])
        for r in docs.where(F.col("source") != "src0").collect()
    ]
    bench_rows = [
        (r["doc_id"], r["text"])
        for r in docs.where(F.col("source") == "src0").collect()
    ]
    n_waves = args.waves + args.post_waves
    waves: list[list[tuple[int, str]]] = [[] for _ in range(n_waves)]
    for i, row in enumerate(corpus_rows):
        waves[i % n_waves].append(row)

    # in-process probe observer: records, for every retro probe the
    # LIVE stream runs, whether the history plan partition-prunes on hb
    probes: list[dict] = []
    orig_pruned = dcs._pruned_doc_history

    def observed(spark_, doc_grams_dir, batch_id, bench_g, **kw):
        hist = orig_pruned(spark_, doc_grams_dir, batch_id, bench_g, **kw)
        if hist is not None:
            plan = hist._jdf.queryExecution().executedPlan().toString()
            seg = (
                plan.split("PartitionFilters", 1)[1][:300]
                if "PartitionFilters" in plan else ""
            )
            probes.append({
                "batch_id": batch_id,
                "hb_partition_filter": "hb" in seg,
                "n_buckets_scanned": (
                    hist.select("hb").distinct().count()
                    if "hb" in hist.columns else None
                ),
            })
        return hist

    dcs._pruned_doc_history = observed

    q = dcs.start_decon_stream(
        spark, dspool, bspool, dg, bg, fl, os.path.join(work, "ckpt"),
        available_now=False, trigger_seconds=args.trigger_seconds,
        compact_every=args.compact_every, hash_buckets=args.hash_buckets,
    )

    def write_spool(spool, name, rows, key):
        tmp = os.path.join(spool, f".{name}.jsonl")
        with open(tmp, "w") as f:
            for i, t in rows:
                f.write(json.dumps({key: i, "text": t}) + "\n")
        os.rename(tmp, os.path.join(spool, f"{name}.jsonl"))

    def fold_committed():
        try:
            with open(os.path.join(dg, "_manifest.json")) as f:
                return json.load(f)["fold_dir"] is not None
        except (FileNotFoundError, KeyError):
            return False

    def n_done_batches():
        return len(
            [p for p in (q.recentProgress or []) if p["numInputRows"] > 0]
        )

    def wait_batches(n, timeout=120):
        deadline = time.monotonic() + timeout
        while n_done_batches() < n and time.monotonic() < deadline:
            time.sleep(0.5)
        return n_done_batches() >= n

    # pace each wave on batch COMPLETION (a 2 s trigger with a slower
    # batch would coalesce every wave into one micro-batch and the
    # fold-crossing timeline this demo exists for would never form)
    t0 = time.monotonic()
    done = 0
    for w in range(args.waves):
        write_spool(dspool, f"wave-{w:03d}", waves[w], "doc_id")
        done += 1
        wait_batches(done)
    # the doc-gram history must have FOLDED before the benchmark lands,
    # so its retro probe crosses fold + live dirs
    deadline = time.monotonic() + 120
    while not fold_committed() and time.monotonic() < deadline:
        time.sleep(1)
    fold_before_bench = fold_committed()
    write_spool(bspool, "bench-000", bench_rows, "bench_id")
    done += 1
    wait_batches(done)
    # late SINGLE-GRAM benchmark arrival: the steady-state shape the
    # bucket pruning exists for — its grams are a subset of bench item
    # 0's (first 8 words), so the flag set is unchanged while the probe
    # must prune to exactly that gram's bucket(s)
    tiny = " ".join(bench_rows[0][1].split()[:8])
    write_spool(bspool, "bench-tiny", [(999_999, tiny)], "bench_id")
    done += 1
    wait_batches(done)
    for w in range(args.waves, n_waves):
        write_spool(dspool, f"wave-{w:03d}", waves[w], "doc_id")
        done += 1
        wait_batches(done)

    # drain: progress until two consecutive idle polls
    idle = 0
    deadline = time.monotonic() + 180
    seen_rows = 0
    while idle < 2 and time.monotonic() < deadline:
        time.sleep(2 * args.trigger_seconds)
        total = sum(
            p["numInputRows"] for p in (q.recentProgress or [])
        )
        idle = idle + 1 if total == seen_rows else 0
        seen_rows = total
    prog = [p for p in (q.recentProgress or []) if p["numInputRows"] > 0]
    q.stop()
    wall = time.monotonic() - t0
    dcs._pruned_doc_history = orig_pruned

    got = {
        r["doc_id"]
        for r in dcs.read_contaminated(spark, fl).collect()
    }
    corpus_df = docs.where(F.col("source") != "src0").select(
        "doc_id", "text"
    )
    bench_df = docs.where(F.col("source") == "src0").select(
        "doc_id", "text"
    )
    want = {
        r["doc_id"]
        for r in decontamination_flags(corpus_df, bench_df).collect()
    }
    geometry = dcs._read_geometry(spark, dg)
    durs = [p.get("batchDuration") for p in prog if p.get("batchDuration")]
    pruned_probes = [p for p in probes if p["hb_partition_filter"]]
    print(json.dumps({
        "metric": "decon_live_flags_match_batch_operator",
        "value": bool(got == want and len(got) > 0),
        "flagged_live": sorted(got),
        "flagged_batch_operator": sorted(want),
        "fold_committed_before_bench_arrival": fold_before_bench,
        "geometry_hash_buckets": geometry,
        "retro_probes_observed": probes,
        "retro_probes_hb_pruned": len(pruned_probes),
        "tiny_arrival_buckets_scanned": (
            probes[-1]["n_buckets_scanned"] if len(probes) >= 2 else None
        ),
        "n_batches": len(prog),
        "batch_ms_median": sorted(durs)[len(durs) // 2] if durs else None,
        "wall_sec": round(wall, 1),
        "corpus_docs": len(corpus_rows),
        "bench_items": len(bench_rows),
        "trigger_seconds": args.trigger_seconds,
        "compact_every": args.compact_every,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    import shutil

    shutil.rmtree(work, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
