#!/usr/bin/env python
"""Band-geometry plateau-edge probe (VERDICT r10 #4).

The plateau-quadratic class (BASELINE §6s): between two steps of
:func:`ballcone_spark.operators.dedup.adaptive_band_rows` the geometry
is FIXED, so candidate mass grows quadratically with corpus size until
the next step fires — every unmeasured plateau edge is a latent cliff.
This tool measures a geometry step the way §6s did: for each corpus,
count band candidates and verified pairs at the adaptive rows setting
(and optionally at forced settings on either side of the step), timing
each stage, and bucketing verified pairs by Jaccard so a step's recall
envelope is explicit.

Stage metrics stream to stderr as they finish (a blown-up candidate
count is visible BEFORE a possibly-hour-long verify); one JSON line on
stdout at the end. Probe-session conf sets
``autoBroadcastJoinThreshold=-1`` (§6s gotcha: checkpointed candidate
frames carry bogus-small estimates that bait corpus-scale broadcast
builds in probe plans; the shipped path doesn't checkpoint there).

Usage:
  python tools/band_probe.py --sf-dirs .scale_data/sf62,.scale_data/sf66
  python tools/band_probe.py --sf-dirs .scale_data/sf66 --force-rows 10
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from ballcone_spark.operators.dedup import (  # noqa: E402
    N_BANDS,
    _JACCARD_THRESHOLD,
    _NGRAM,
    adaptive_band_rows,
    band_pairs,
    exact_jaccard_on_pairs,
    minhash_signatures_np,
    shingle_rows,
)
from ballcone_spark.session import get_spark  # noqa: E402


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def probe(
    spark,
    sf_dir: str,
    rows: int,
    skip_verify: bool,
    hashed_ok: bool,
    bucket_cap: int | None = None,
    candidates_out: str | None = None,
    candidates_in: str | None = None,
) -> dict:
    """``candidates_out``/``candidates_in`` (r12): split candidate
    generation and verify into SEPARATE sessions. A single-session probe
    retains the candidate stages' shuffle files for the whole app
    lifetime — at 52 M docs that held ~35 GB of disk through the verify
    join, which then hit the disk wall this box otherwise has room for.
    A production job checkpoints between phases for exactly this
    reason; the two-phase probe measures the same plan a deployment
    would run."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    out: dict = {"sf_dir": sf_dir, "n_docs": n_docs, "rows": rows,
                 "bucket_cap": bucket_cap}
    if candidates_in is not None:
        cand = spark.read.parquet(candidates_in)
        out["candidates"] = cand.count()
        log(f"{sf_dir} rows={rows}: {out['candidates']:,} candidates "
            f"read from {candidates_in}")
    else:
        t0 = time.perf_counter()
        sig = minhash_signatures_np(docs, n_hashes=N_BANDS * rows)
        cand = band_pairs(
            sig, n_bands=N_BANDS, rows=rows, bucket_cap=bucket_cap
        )
        if candidates_out is not None:
            cand.write.mode("overwrite").parquet(candidates_out)
            cand = spark.read.parquet(candidates_out)
            out["candidates"] = cand.count()
        else:
            out["candidates"] = cand.count()
        out["cand_sec"] = round(time.perf_counter() - t0, 1)
        log(f"{sf_dir} rows={rows}: {out['candidates']:,} candidates "
            f"in {out['cand_sec']}s")
    if skip_verify:
        return out
    # mirror the shipped scale-zone verify: license the 8-byte hashed
    # payload when xxhash64 is injective on this corpus's shingles
    hashed = False
    if hashed_ok:
        hashed = bool(
            shingle_rows(docs, n=_NGRAM)
            .agg(
                (
                    F.countDistinct("s") == F.countDistinct(F.xxhash64("s"))
                ).alias("ok")
            )
            .first()["ok"]
        )
    out["hashed_verify"] = hashed
    t0 = time.perf_counter()
    verified = (
        exact_jaccard_on_pairs(docs, cand, vectorized=True, hashed=hashed)
        .where(F.col("jaccard") >= _JACCARD_THRESHOLD)
    )
    # J histogram in the same action: bucket = floor(j * 20) / 20
    hist = (
        verified.groupBy(
            (F.floor(F.col("jaccard") * 20) / 20).alias("j_bucket")
        )
        .count()
        .orderBy("j_bucket")
        .collect()
    )
    out["verify_sec"] = round(time.perf_counter() - t0, 1)
    out["verified"] = sum(r["count"] for r in hist)
    out["j_hist"] = {str(r["j_bucket"]): r["count"] for r in hist}
    log(f"{sf_dir} rows={rows}: {out['verified']:,} verified "
        f"in {out['verify_sec']}s")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dirs", required=True,
                    help="comma-separated corpus dirs (documents.parquet)")
    ap.add_argument("--force-rows", type=int, default=None,
                    help="ALSO probe this rows setting (step comparison)")
    ap.add_argument("--force-only", action="store_true",
                    help="probe ONLY --force-rows (skip the adaptive "
                    "setting — for step A/Bs split across sessions)")
    ap.add_argument("--skip-verify", action="store_true")
    ap.add_argument(
        "--no-hashed", action="store_true",
        help="force the string verify (pre-r11 path) for A/B",
    )
    ap.add_argument(
        "--bucket-cap", type=int, default=None,
        help="mega-bucket guard passed to band_pairs (§6ab)",
    )
    ap.add_argument(
        "--candidates-out", default=None,
        help="write candidates parquet here and stop after counting "
        "(phase 1 of the two-session disk-bounded protocol)",
    )
    ap.add_argument(
        "--candidates-in", default=None,
        help="skip candidate generation; verify these pairs (phase 2)",
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name="band_probe",
        # zstd shuffle blocks (vs lz4 default): ~30-40% smaller spill
        # footprint — the probe's binding resource at 50M+ docs is
        # DISK, not CPU (static conf, must be set at session build)
        extra_conf={"spark.io.compression.codec": "zstd"},
    )
    # §6s probe gotcha: no broadcast decisions off checkpoint estimates
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    results = []
    for sf_dir in args.sf_dirs.split(","):
        sf_dir = sf_dir if os.path.isabs(sf_dir) else os.path.join(ROOT, sf_dir)
        n_docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).count()
        settings = [adaptive_band_rows(n_docs)]
        if args.force_rows and args.force_rows not in settings:
            settings.append(args.force_rows)
        if args.force_only:
            if not args.force_rows:
                raise SystemExit("--force-only requires --force-rows")
            settings = [args.force_rows]
        for rows in settings:
            results.append(
                probe(spark, sf_dir, rows,
                      args.skip_verify or args.candidates_out is not None,
                      hashed_ok=not args.no_hashed,
                      bucket_cap=args.bucket_cap,
                      candidates_out=args.candidates_out,
                      candidates_in=args.candidates_in)
            )
    print(json.dumps({
        "metric": "band_step_probe",
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "probes": results,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
