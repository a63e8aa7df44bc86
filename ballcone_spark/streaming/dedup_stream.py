"""Streaming incremental MinHash dedup against a persistent signature
index — the continuous form of :func:`ballcone_spark.operators.dedup
.dedup_minhash_lsh` (VERDICT r3 #1; extends the reference's S6 sink,
reference ballcone/core.py:43-51, into a training-data ingest pipeline).

A training-data pipeline ingests documents continuously; each micro-batch
must be deduplicated against *everything seen so far*, not just itself.
The design:

- **Signature index** (persistent): stored in BANDED form — one row per
  (document, LSH band): ``(doc_id, band_idx, band_key, sig
  array<bigint>, batch_id)`` — written as parquet under
  ``index_dir/batch_id=<n>/``. Banded storage costs 4× the minimal
  (doc_id, sig) layout but makes ``band_key`` a *physical* column, so
  the per-batch probe's key filter pushes into the parquet scan
  (row-group min/max pruning) instead of evaluating a derived
  expression over every index row. A MinHash signature is 16 longs
  (~150 B, ×4 bands ≈ 600 B) per document regardless of document size,
  so at 100 TB of text the index is still ~3 orders of magnitude
  smaller than the corpus. Every seen doc is indexed (duplicates too):
  the membership rule below then never depends on earlier *admission*
  results, which keeps decisions non-recursive, replay-stable, and
  oracle-expressible in one SQL statement.
- **Exactly-once decisions under replay**: Structured Streaming may
  re-run a micro-batch after a crash. Each batch writes its signatures
  and its decisions to ``<dir>/batch_id=<n>`` with per-partition
  overwrite, and probes only index rows with ``batch_id <
  current_batch``: a replayed batch sees byte-identical history and
  overwrites its own partial output — idempotent end to end, with no
  read-side dedup needed.
- **Decision rule** (deterministic, order-free): doc *b* is a duplicate
  iff some doc *a* arrived strictly earlier (earlier batch, or same
  batch with ``a.doc_id < b.doc_id``) such that *a* and *b* collide in
  ≥1 LSH band AND their signatures agree on ≥ ``SIG_AGREE_MIN`` of the
  16 positions (the MinHash estimate of Jaccard ≥ 0.8). Estimated — not
  exact — Jaccard is the deliberate trade: verifying exactly would
  require keeping every historical document's shingle set, defeating
  the constant-size index; at 16 hashes the estimator's σ ≈ 0.1.
- **Probe plan** (the 100 TB question): the batch side of the probe is
  a micro-batch — small by construction — so the batch bands are
  BROADCAST and the index side never shuffles (gated:
  ``tests/test_streaming_windows.py::test_probe_plan_index_side``).
  Additionally the batch's band keys (bounded: rows × 4 bands) are
  collected and pushed as an ``IN`` filter on the physical ``band_key``
  column, so parquet row-group stats skip index chunks with no
  candidate keys. A band-key-BUCKETED table layout was considered and
  rejected: broadcast already makes the probe exchange-free on the big
  side, bucket pruning cannot beat the pushed key filter + min/max
  stats, and a bucketBy table cannot do idempotent per-batch partition
  overwrite (saveAsTable append is at-least-once under replay). A
  sort-by-band_key option in :func:`compact_index` tightens row-group
  pruning further as the index grows.
- :func:`compact_index` folds the per-batch partition dirs into few
  files once their count grows (same small-files maintenance as the
  warehouse's :func:`~ballcone_spark.streaming.ingest.compact_warehouse`).
"""

from __future__ import annotations

import json
import math
import os
import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ballcone_spark.operators.dedup import (
    N_BANDS,
    N_HASHES,
    minhash_signatures,
)
from ballcone_spark.queries import _query, load_table

__all__ = [
    "SIG_AGREE_MIN",
    "batch_signatures",
    "incremental_dedup_batch",
    "start_dedup_stream",
    "read_index",
    "read_decisions",
    "compact_index",
]

#: minimum matching signature positions (of 16) to call a pair duplicate
#: — the integer form of estimated-Jaccard ≥ 0.8 (13/16 = 0.8125; 12/16
#: would be 0.75 < 0.8). Integer compare, never float, so the DuckDB
#: oracle agrees bit-for-bit.
SIG_AGREE_MIN = math.ceil(0.8 * N_HASHES)

_ROWS_PER_BAND = N_HASHES // N_BANDS

#: scratch dirs created by plan builds, removed when the process exits.
_SCRATCH_DIRS: set[str] = set()


def _track_scratch_dir(path: str) -> None:
    if not _SCRATCH_DIRS:
        import atexit

        atexit.register(
            lambda: [shutil.rmtree(d, ignore_errors=True) for d in _SCRATCH_DIRS]
        )
    _SCRATCH_DIRS.add(path)


def batch_signatures(docs: DataFrame, vectorized: bool = True) -> DataFrame:
    """``(doc_id, sig array<bigint>)`` — the per-row MinHash signature
    folded into one array column (the index's storage shape).

    ``vectorized=True`` (default, r7) signs with the Arrow kernel
    (:func:`~ballcone_spark.operators.dedup.minhash_signatures_np` —
    BIT-identical to the HOF twin, ~3× at corpus scale), always at the
    index's FIXED 16-hash geometry: an index dir must stay
    signature-compatible for its lifetime, so the batch family's
    adaptive geometry does not apply here (per-batch probe cost is
    bounded by batch size, not corpus size). The JVM signer stays
    available for cross-checks."""
    from ballcone_spark.operators.dedup import minhash_signatures_np

    sig = (
        # wide=True also here: backfill micro-batches are corpus-scale
        # thirds (a 1-partition scan each — signing one serialized cost
        # dedup_incremental_minhash 103.6 s at sf10), while for small
        # live batches the round-robin exchange is sub-ms — the widen
        # cost scales with the batch, the win doesn't invert
        minhash_signatures_np(docs)
        if vectorized
        else minhash_signatures(docs)
    )
    return sig.select(
        "doc_id",
        F.array(*[F.col(f"sig_{i}") for i in range(N_HASHES)]).alias("sig"),
    )


def _bands(sigs: DataFrame, extra: list[str] | None = None) -> DataFrame:
    """Explode a signature frame into (doc_id, sig, band_idx, band_key)
    [+ ``extra`` passthrough columns] — band_key concatenates the band's
    4 signature values. The sig array rides along so verification never
    has to re-join the source frame (for the index probe that would mean
    a second full index scan). Docs too short to shingle (null
    signature) are excluded — they can never verify, and their empty
    band_key would otherwise form one giant all-colliding bucket."""
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_idx"),
                F.concat_ws(
                    "_",
                    *[
                        F.col("sig").getItem(j * _ROWS_PER_BAND + i)
                        for i in range(_ROWS_PER_BAND)
                    ],
                ).alias("band_key"),
            )
            for j in range(N_BANDS)
        ]
    )
    extra = extra or []
    return (
        sigs.where(F.col("sig").getItem(0).isNotNull())
        .select("doc_id", "sig", *extra, F.explode(bands).alias("b"))
        .select("doc_id", "sig", *extra, "b.band_idx", "b.band_key")
    )


def _sig_agree(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    )


#: above this many distinct band keys the probe skips the IN-list
#: pushdown. The pushdown is a scan optimization, never a correctness
#: requirement (the broadcast band join already restricts candidates):
#: an ``availableNow`` backfill batch of millions of docs would
#: otherwise collect a multi-million-literal IN predicate on the driver
#: (VERDICT r4 #5).
MAX_PUSHDOWN_KEYS = 100_000


def incremental_dedup_batch(
    batch_sigs: DataFrame,
    index_bands: DataFrame | None,
) -> DataFrame:
    """Decide each batch doc against history + earlier batch docs.

    ``batch_sigs``: (doc_id, sig) for the current micro-batch;
    ``index_bands``: BANDED rows (doc_id, band_idx, band_key, sig) for
    ALL strictly-earlier docs (None → first batch). Returns ``(doc_id,
    is_dup, n_matches)`` where a match is a band collision with
    signature agreement ≥ :data:`SIG_AGREE_MIN` against an earlier doc
    (history, or same batch with lower doc_id).

    Plan shape: batch side is broadcast into the index probe (index
    never shuffles); the within-batch pairing is batch-local. The index
    scan is additionally filtered to the batch's band keys (collected —
    bounded by :data:`MAX_PUSHDOWN_KEYS`), a pushable predicate on the
    physical band_key column; the stored sig array rides through the
    band join so the index is scanned exactly once per batch.

    **Backfill degradation** (VERDICT r4 #5): a trigger-interval batch
    is small by construction, but an ``availableNow`` backfill can
    deliver the whole backlog as ONE batch. The distinct-band-key
    collect is capped at MAX_PUSHDOWN_KEYS+1 rows; on overflow the
    probe (a) skips the IN pushdown and (b) drops every batch-side
    broadcast hint, letting AQE pick shuffle joins — same decisions,
    no driver-side blowup."""
    b_bands = _bands(batch_sigs)
    keys = [
        r["band_key"]
        for r in b_bands.select("band_key")
        .distinct()
        .limit(MAX_PUSHDOWN_KEYS + 1)
        .collect()
    ]
    small_batch = len(keys) <= MAX_PUSHDOWN_KEYS
    maybe_bcast = F.broadcast if small_batch else (lambda df: df)
    a_of = lambda df: df.select(  # noqa: E731
        F.col("doc_id").alias("a_id"),
        F.col("sig").alias("a_sig"),
        F.col("band_idx").alias("a_band_idx"),
        F.col("band_key").alias("a_band_key"),
    )
    collide = (F.col("a_band_idx") == F.col("band_idx")) & (
        F.col("a_band_key") == F.col("band_key")
    )
    # within-batch: earlier = lower doc_id, candidates from band buckets
    pairs = b_bands.join(maybe_bcast(a_of(b_bands)), collide).where(
        F.col("a_id") < F.col("doc_id")
    )
    if index_bands is not None:
        hist_a = a_of(index_bands)
        if small_batch:
            hist_a = hist_a.where(F.col("a_band_key").isin(keys))
        against_hist = hist_a.join(maybe_bcast(b_bands), collide)
        pairs = pairs.unionByName(against_hist.select(*pairs.columns))
    verified = (
        pairs.select("doc_id", "a_id", "sig", "a_sig")
        .distinct()  # one vote per (batch doc, earlier doc) pair
        .where(_sig_agree(F.col("a_sig"), F.col("sig")) >= SIG_AGREE_MIN)
        .groupBy(F.col("doc_id").alias("dup_id"))
        .agg(F.count("*").alias("n_matches"))
    )
    return (
        batch_sigs.select("doc_id")
        .join(
            maybe_bcast(verified),
            batch_sigs["doc_id"] == verified["dup_id"],
            "left",
        )
        .select(
            "doc_id",
            F.col("dup_id").isNotNull().alias("is_dup"),
            F.coalesce("n_matches", F.lit(0)).alias("n_matches"),
        )
    )


def incremental_dedup_simulation(sigs_with_batch: DataFrame) -> DataFrame:
    """The N-batch incremental decision set as ONE declarative plan:
    doc *b* is a duplicate iff some doc *a* with
    ``(a.batch_id, a.doc_id) < (b.batch_id, b.doc_id)`` collides in a
    band and agrees on ≥ :data:`SIG_AGREE_MIN` signature positions.

    This is exactly the rule the streaming loop applies batch by batch
    (``tests/test_streaming_windows.py`` asserts the two produce
    identical decisions on the same batch split), but as a single SQL-
    expressible statement — which is what makes the streaming semantics
    driver-oracle-checkable. Input: ``(doc_id, sig, batch_id)``.

    Plan note: the signature frame is persist()-ed before banding.
    Without a materialization barrier the optimizer inlines the 16-hash
    signature expressions into every downstream reference (band keys,
    the self-join's two sides, the decisions join), recomputing the
    whole MinHash pipeline ~3× per row; a repartition barrier was tried
    first but the self-join clones the logical subtree with fresh
    exprIds and the two physical exchanges failed to canonicalize to one
    reusable stage. CacheManager matching is by logical sameResult, so
    one persist covers every reference. Measured at sf0.1: first-run
    20.5 s → ~6 s, steady unchanged. Memory pinned: (doc_id, sig,
    batch_id) rows ≈ 150 B/doc regardless of document size — at 5 B docs
    that is ~750 GB cluster-wide, spill-to-disk storage level, never the
    corpus itself."""
    dups = _simulation_dup_ids(sigs_with_batch)
    return sigs_with_batch.join(
        dups, sigs_with_batch["doc_id"] == dups["dup_id"], "left"
    ).select(
        "doc_id",
        "batch_id",
        F.col("dup_id").isNotNull().alias("is_dup"),
    )


def _simulation_dup_ids(sigs_with_batch: DataFrame) -> DataFrame:
    """``(dup_id)`` — the documents flagged duplicate by the simulation
    rule. See :func:`incremental_dedup_simulation` for the rule and the
    materialization-barrier plan note.

    The barrier is a LAZY ``localCheckpoint`` rather than ``persist``:
    every downstream reference (band keys, both self-join sides) shares
    the one LogicalRDD node, so the optimizer cannot inline the 16-hash
    pipeline past it — same effect, but without registering in the
    CacheManager, whose pinned blocks outlived every invocation (ADVICE
    r4: bench's 3× steady runs accumulated them for the session
    lifetime). Checkpoint blocks are freed by the ContextCleaner when
    the frame is garbage-collected."""
    sigs_m = sigs_with_batch.localCheckpoint(eager=False)
    b = _bands(sigs_m, extra=["batch_id"])
    a = b.select(
        F.col("doc_id").alias("a_id"),
        F.col("sig").alias("a_sig"),
        F.col("batch_id").alias("a_batch_id"),
        F.col("band_idx").alias("a_band_idx"),
        F.col("band_key").alias("a_band_key"),
    )
    earlier = (F.col("a_batch_id") < F.col("batch_id")) | (
        (F.col("a_batch_id") == F.col("batch_id"))
        & (F.col("a_id") < F.col("doc_id"))
    )
    collide = (F.col("a_band_idx") == F.col("band_idx")) & (
        F.col("a_band_key") == F.col("band_key")
    )
    return (
        b.join(a, collide & earlier)
        .select("doc_id", "a_id", "sig", "a_sig")
        .distinct()
        .where(_sig_agree(F.col("a_sig"), F.col("sig")) >= SIG_AGREE_MIN)
        .select(F.col("doc_id").alias("dup_id"))
        .distinct()
    )


#: target rows per output file for per-batch writes; a 5 s micro-batch
#: coalesces to 1 file, an availableNow backfill batch scales its writer
#: parallelism instead of funnelling millions of rows through one task.
ROWS_PER_FILE = 500_000

#: writer-parallelism ceiling for a single batch partition dir.
MAX_FILES_PER_BATCH = 64


def _overwrite_batch_partition(
    df: DataFrame,
    root: str,
    batch_id: int,
    n_rows: int | None = None,
    partition_col: str | None = None,
) -> None:
    """Idempotent per-batch write: replayed batches overwrite their own
    ``batch_id=<n>`` dir and only that dir. ``n_rows`` (when the caller
    already knows it) scales the file count so backfill-sized batches
    are not single-writer-bottlenecked (VERDICT r4 #5).

    ``partition_col`` (r13): hash-bucket sub-partitioning below the
    batch dir (``batch_id=<n>/<col>=<v>/``), so probes that know their
    key buckets prune the scan (the decon retro-scan's history bound —
    VERDICT r12 #3). An EMPTY partitioned write emits no data files at
    all (only ``_SUCCESS``); readers must tolerate file-less committed
    dirs (see ``semantic_stream._read_folded_dir``)."""
    n_files = (
        1
        if n_rows is None
        else max(1, min(MAX_FILES_PER_BATCH, n_rows // ROWS_PER_FILE + 1))
    )
    # coalesce can only narrow; widening a backfill batch (which often
    # arrives as few input partitions) needs a real repartition
    shaped = df.coalesce(1) if n_files == 1 else df.repartition(n_files)
    writer = shaped.write.mode("overwrite")
    if partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.parquet(os.path.join(root, f"batch_id={batch_id}"))


#: manifest file name — the leading underscore keeps Spark's file index
#: from ever treating it as data (same convention as _SUCCESS).
_MANIFEST = "_manifest.json"


def _read_manifest(index_dir: str) -> dict:
    """The index's snapshot pointer. ``folded_hi`` = highest batch id
    absorbed into ``fold_dir`` (−1 / None before the first fold);
    ``garbage`` = dirs superseded by the last fold, still on disk so
    in-flight readers keep their files — deleted at the START of the
    next :func:`compact_index` run, never during the fold that retired
    them."""
    try:
        with open(os.path.join(index_dir, _MANIFEST)) as f:
            return json.load(f)
    except FileNotFoundError:
        return {"folded_hi": -1, "fold_dir": None, "garbage": []}


def _write_manifest(index_dir: str, manifest: dict) -> None:
    """Atomic swap: write sibling tmp, fsync, rename. The rename is the
    commit point of a fold — readers see either the old snapshot or the
    new one, never a half state."""
    path = os.path.join(index_dir, _MANIFEST)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, path)


def _live_batch_parts(index_dir: str, folded_hi: int) -> list[str]:
    """Per-batch partition dirs NOT yet absorbed by a fold, in batch-id
    order (numeric — lexicographic would put batch_id=10 before 9).

    Committed dirs only (r12): a dir the stream is MID-WRITING has no
    parquet footers yet, so listing it kills an external reader with
    UNABLE_TO_INFER_SCHEMA (found live by the vector demo's serve
    polls, §6an) — and a fold must never absorb one either. Spark's
    ``_SUCCESS`` job-commit marker is the gate; the streams' own
    ``batch_id < current`` reads only ever see committed dirs, so
    internal behavior is unchanged."""
    return sorted(
        (
            e.name
            for e in os.scandir(index_dir)
            if e.name.startswith("batch_id=")
            and int(e.name.split("=", 1)[1]) > folded_hi
            and os.path.exists(os.path.join(e.path, "_SUCCESS"))
        ),
        key=lambda p: int(p.split("=", 1)[1]),
    )


def _dir_has_data(d: str) -> bool:
    """True if the dir tree holds at least one data file (not _SUCCESS /
    dot-temp). Empty PARTITIONED batch writes commit no data files at
    all (r13), and parquet schema inference dies on a file-less path —
    readers and folds skip such dirs instead."""
    for _root, _dirs, files in os.walk(d):
        for f in files:
            if not f.startswith(("_", ".")):
                return True
    return False


def read_index(spark: SparkSession, index_dir: str) -> DataFrame | None:
    """Banded index rows (doc_id, band_idx, band_key, sig, batch_id) for
    every indexed batch, or None if the index doesn't exist yet.

    Snapshot rule (manifest-pointer consistency): read the manifest's
    fold dir (original batch_id preserved as a physical column) plus the
    per-batch dirs with ``batch_id > folded_hi`` (batch_id from the dir
    name). Superseded dirs — listed as manifest garbage — are *excluded
    by this rule* even though they are still on disk, so a probe racing
    a fold can never double-count; and because a fold only deletes the
    PREVIOUS fold's garbage, the dirs a just-read manifest references
    outlive the probe (contract: a probe completes within one compaction
    interval — vs the old design's total quiet-period requirement)."""
    if not os.path.isdir(index_dir):
        return None
    m = _read_manifest(index_dir)
    parts = _live_batch_parts(index_dir, m["folded_hi"])
    frames = []
    if m["fold_dir"]:
        frames.append(
            spark.read.parquet(os.path.join(index_dir, m["fold_dir"]))
        )
    if parts:
        frames.append(
            spark.read.option("basePath", index_dir).parquet(
                *[os.path.join(index_dir, p) for p in parts]
            )
        )
    if not frames:
        return None
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def read_decisions(spark: SparkSession, decisions_dir: str) -> DataFrame:
    # committed dirs only — the same mid-write exposure as read_index
    parts = _live_batch_parts(decisions_dir, -1)
    return spark.read.option("basePath", decisions_dir).parquet(
        *[os.path.join(decisions_dir, p) for p in parts]
    )


def _spool_reader(spark, clean_source, archive_dir):
    """Text file-source reader with the optional committed-file cleanup
    (r12, the ingest ``clean_source`` contract). Default None: these
    spools may be the ONLY copy of the raw documents — the stream
    persists signatures/chunks, not text — so deletion is opt-in,
    unlike the warehouse-backed ingest spool."""
    if clean_source not in (None, "delete", "archive"):
        raise ValueError(
            f"clean_source must be None, 'delete', or 'archive' "
            f"(got {clean_source!r})"
        )
    if clean_source == "archive" and archive_dir is None:
        raise ValueError("clean_source='archive' requires archive_dir")
    reader = spark.readStream.format("text")
    if clean_source is not None:
        reader = reader.option("cleanSource", clean_source)
        if archive_dir is not None:
            reader = reader.option("sourceArchiveDir", archive_dir)
    return reader


def _scheduler_pool(spark: SparkSession, pool: str | None):
    """Context manager scoping Spark's FAIR-scheduler pool local
    property to a stream's ``start()`` call: the stream-execution
    thread is created inside start() and inherits the caller thread's
    local properties, so every job the query ever runs (foreachBatch
    driver jobs included) lands in ``pool``. The caller's own property
    is restored afterward. Measured in BASELINE §6ay-addendum: under
    FAIR mode, pooling the queries restores latency-sensitive
    co-residents (serving, small control streams) to their solo
    numbers on a shared driver; under the default FIFO scheduler the
    property is inert and this is a no-op wrapper."""
    from contextlib import contextmanager

    @contextmanager
    def _scope():
        if pool is None:
            yield
            return
        sc = spark.sparkContext
        prev = sc.getLocalProperty("spark.scheduler.pool")
        sc.setLocalProperty("spark.scheduler.pool", pool)
        try:
            yield
        finally:
            sc.setLocalProperty("spark.scheduler.pool", prev)

    return _scope()


#: default spool-backpressure bound for every spool stream (r14,
#: VERDICT r13 #1 follow-through): the streams' probe plans broadcast
#: batch-derived frames under a "trigger-bounded" invariant that an
#: unbounded cold-start backlog violates — one giant first micro-batch
#: is exactly the batch the invariant can't survive. 64 files keeps
#: cold-start batches the same order as steady-state ones (availableNow
#: honors the option too, draining in bounded bites); pass None
#: explicitly to opt out. decon_stream's DECON_MAX_FILES_PER_TRIGGER
#: is the same bound under its own (test-pinned) name.
SPOOL_MAX_FILES_PER_TRIGGER = 64


def start_dedup_stream(
    spark: SparkSession,
    spool_dir: str,
    index_dir: str,
    decisions_dir: str,
    checkpoint_dir: str,
    trigger_seconds: int = 5,
    available_now: bool = False,
    compact_every: int | None = 64,
    clean_source: str | None = None,
    archive_dir: str | None = None,
    max_files_per_trigger: int | None = SPOOL_MAX_FILES_PER_TRIGGER,
    scheduler_pool: str | None = None,
):
    """Micro-batch incremental dedup over a spool of JSON-lines document
    files (``{"doc_id": ..., "text": ...}`` per line). Each batch:

    1. compute signatures;
    2. decide vs the index restricted to ``batch_id < current`` (replay
       safety: a re-run batch sees the same history) and vs earlier docs
       within the batch;
    3. overwrite ``decisions_dir/batch_id=<n>`` with (doc_id, is_dup,
       n_matches) and ``index_dir/batch_id=<n>`` with the batch's banded
       signature rows.

    ``compact_every`` (r12): fold the INDEX's per-batch dirs through
    :func:`compact_index` whenever the live dir count reaches this many
    — wired into the batch loop because a 5 s-trigger deployment mints
    ~17 k dirs/day and the probe's file-listing cost would otherwise
    grow without bound (the fold was previously manual-only; reads are
    bit-identical before/after, crash points covered by the kill-point
    suite). ``None`` disables. The decisions dir is NOT folded here:
    external consumers read it as plain ``batch_id=`` parquet, so its
    lifecycle belongs to them (the warehouse-compaction convention).

    Returns the StreamingQuery."""
    reader = _spool_reader(spark, clean_source, archive_dir)
    if max_files_per_trigger is not None:
        # the ingest stream's backpressure knob (catch-up drains in
        # trigger-sized bites); availableNow respects it too
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(spool_dir)
    docs = raw.select(
        F.get_json_object("value", "$.doc_id").cast("long").alias("doc_id"),
        F.get_json_object("value", "$.text").alias("text"),
    ).where(F.col("doc_id").isNotNull() & F.col("text").isNotNull())

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        sigs = batch_signatures(batch_df).localCheckpoint(eager=True)
        n_rows = sigs.count()  # cheap: counts the checkpointed blocks
        hist = read_index(spark, index_dir)
        if hist is not None:
            hist = hist.where(F.col("batch_id") < F.lit(batch_id)).select(
                "doc_id", "band_idx", "band_key", "sig"
            )
        decisions = incremental_dedup_batch(sigs, hist)
        _overwrite_batch_partition(decisions, decisions_dir, batch_id, n_rows)
        _overwrite_batch_partition(
            _bands(sigs), index_dir, batch_id, n_rows * N_BANDS
        )
        if compact_every is not None:
            # per-trigger cadence: sweep only at fold time so retired
            # dirs keep a full compaction interval of reader grace
            compact_index(spark, index_dir, every=compact_every,
                          sweep_when="fold")

    writer = (
        docs.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("ballcone_dedup_stream")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    with _scheduler_pool(spark, scheduler_pool):
        return writer.start()


# --------------------------------------------------------------------- #
# driver-checked query: the incremental decision rule vs a DuckDB oracle #
# --------------------------------------------------------------------- #


def _duck_agree_expr(a: str, b: str) -> str:
    return " + ".join(
        f"CASE WHEN {a}.sig_{i} = {b}.sig_{i} THEN 1 ELSE 0 END"
        for i in range(N_HASHES)
    )


def _incremental_oracle() -> str:
    from ballcone_spark.operators.dedup import (
        _band_exprs_duck,
        _duck_minhash_cte,
        _DUCK_SHINGLES,
    )

    return f"""
    WITH {_DUCK_SHINGLES}, {_duck_minhash_cte()},
    bands AS ({_band_exprs_duck()}),
    cand AS (
      SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.band_key = b.band_key
       AND (a.doc_id % 3 < b.doc_id % 3
            OR (a.doc_id % 3 = b.doc_id % 3 AND a.doc_id < b.doc_id))),
    dups AS (
      SELECT DISTINCT c.b_id
      FROM cand c
      JOIN sig sa ON sa.doc_id = c.a_id
      JOIN sig sb2 ON sb2.doc_id = c.b_id
      WHERE ({_duck_agree_expr('sa', 'sb2')}) >= {SIG_AGREE_MIN})
    SELECT CAST(d.doc_id % 3 AS INTEGER) AS batch_id,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN dup.b_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_dups,
           CAST(sum(CASE WHEN dup.b_id IS NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_admitted
    FROM documents d LEFT JOIN dups dup ON d.doc_id = dup.b_id
    GROUP BY 1 ORDER BY 1
    """


@_query("dedup_incremental_minhash", _incremental_oracle())
def dedup_incremental_minhash(spark, sf_dir):
    """Streaming incremental dedup's decision rule, driver-checked: the
    corpus is split into 3 arrival batches (``doc_id % 3``) and each doc
    is deduplicated against strictly-earlier docs — earlier batch, or
    same batch with lower doc_id — via MinHash band collision + ≥13/16
    signature agreement. Output: per-batch admitted/duplicate counts.
    The streaming loop applies the identical rule batch-by-batch against
    the persistent index (asserted equal in
    tests/test_streaming_windows.py); this declarative form is what
    makes those semantics hash-checkable against DuckDB."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = batch_signatures(docs).withColumn(
        "batch_id", (F.col("doc_id") % 3).cast("int")
    )
    # per-batch totals come straight from the documents scan and the dup
    # set's batch is re-derived from doc_id % 3 — so the expensive
    # signature pipeline appears in exactly one plan subtree (see
    # incremental_dedup_simulation's plan note) instead of a third copy
    # for a per-doc decisions join
    dups = (
        _simulation_dup_ids(sigs)
        .select((F.col("dup_id") % 3).cast("int").alias("batch_id"))
        .groupBy("batch_id")
        .agg(F.count("*").alias("n_dups"))
    )
    totals = (
        docs.groupBy((F.col("doc_id") % 3).cast("int").alias("batch_id"))
        .agg(F.count("*").alias("n_docs"))
    )
    return (
        totals.join(F.broadcast(dups), "batch_id", "left")
        .select(
            "batch_id",
            "n_docs",
            F.coalesce("n_dups", F.lit(0)).cast("bigint").alias("n_dups"),
            (F.col("n_docs") - F.coalesce("n_dups", F.lit(0)))
            .cast("bigint")
            .alias("n_admitted"),
        )
        .orderBy("batch_id")
    )


def _index_stats_oracle() -> str:
    from ballcone_spark.operators.dedup import (
        _band_exprs_duck,
        _duck_minhash_cte,
        _DUCK_SHINGLES,
    )

    return f"""
    WITH {_DUCK_SHINGLES}, {_duck_minhash_cte()},
    bands AS ({_band_exprs_duck()})
    SELECT CAST(doc_id % 3 AS INTEGER) AS batch_id,
           count(*) AS n_rows,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT band_idx || '#' || band_key) AS BIGINT)
               AS n_keys
    FROM bands GROUP BY 1 ORDER BY 1
    """


@_query(
    "dedup_stream_index_stats",
    _index_stats_oracle(),
    driver=False,
    cacheable=False,  # writes a fresh temp index at plan build
)
def dedup_stream_index_stats(spark, sf_dir):
    """Index round-trip stats (VERDICT r3 #1's 'EXTRA query exposing
    index stats'): build a REAL on-disk signature index from the
    documents table through the streaming write path (3 batches by
    ``doc_id % 3``, banded rows via ``_overwrite_batch_partition``),
    read it back through ``read_index``, and report per-batch row/doc/
    band-key counts. The oracle recomputes the same banding in DuckDB —
    so partition-dir layout, batch_id recovery from dir names, and
    band-key formation are all checked against an independent engine,
    not just against our own writer.

    Scratch hygiene (ADVICE r4): the index lands in ONE deterministic
    per-process, per-sf_dir dir — repeated invocations overwrite the
    same batch partitions instead of accumulating fresh mkdtemp dirs —
    and an atexit hook removes it when the process ends."""
    import hashlib
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    tmp = os.path.join(
        tempfile.gettempdir(),
        "dedup_index_stats_"
        f"{os.getpid()}_{hashlib.md5(sf_dir.encode()).hexdigest()[:12]}",
    )
    _track_scratch_dir(tmp)
    for b in range(3):
        batch = docs.where((F.col("doc_id") % 3) == b)
        _overwrite_batch_partition(_bands(batch_signatures(batch)), tmp, b)
    idx = read_index(spark, tmp)
    return (
        idx.groupBy(F.col("batch_id").cast("int").alias("batch_id"))
        .agg(
            F.count("*").alias("n_rows"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.count_distinct(
                F.concat_ws("#", "band_idx", "band_key")
            ).alias("n_keys"),
        )
        .orderBy("batch_id")
    )


def _sweep_garbage(index_dir: str, manifest: dict) -> dict:
    """Delete what the last fold retired (manifest garbage) plus any
    fold dir or fold tmp a crashed run left unreferenced. Idempotent:
    a crash mid-sweep leaves entries listed, and they are re-deleted
    (ignore_errors) on the next run. Returns the manifest with garbage
    cleared (rewritten on disk only if there was any)."""
    for p in manifest["garbage"]:
        shutil.rmtree(os.path.join(index_dir, p), ignore_errors=True)
    for e in os.scandir(index_dir):
        if (
            e.name.startswith("fold-") or e.name.startswith(".fold-")
        ) and e.name != (manifest["fold_dir"] or ""):
            shutil.rmtree(e.path, ignore_errors=True)
    if manifest["garbage"]:
        manifest = dict(manifest, garbage=[])
        _write_manifest(index_dir, manifest)
    return manifest


def compact_index(
    spark: SparkSession,
    index_dir: str,
    every: int = 64,
    sort_col: str | None = "band_key",
    latest_wins_key: str | None = None,
    merge_schema: bool = False,
    sweep_when: str = "always",
    partition_col: str | None = None,
) -> bool:
    """Fold per-batch partition dirs into one ``fold-<hi>`` dir when the
    live dir count reaches ``every`` — the signature-index version of
    warehouse compaction. Original ``batch_id`` values are PRESERVED as
    a physical column in the fold (probe semantics bit-identical before
    and after), and fold rows are sorted by ``sort_col`` (default
    band_key) so parquet row-group min/max stats prune the probe's key
    filter tightly. Returns True if it compacted.

    Schema-agnostic apart from ``batch_id`` (r11: the alias stream's
    three state dirs fold through this same protocol via
    ``alias_stream.compact_alias_state``). ``latest_wins_key``: keep
    only the max-batch_id row per key among the folded batches —
    read-equivalent for latest-batch-wins consumers (superseded rows
    are unreadable anyway, and the never-folded newest batch keeps
    replay views unchanged); used by the alias updates dir.

    Two invariants close the crash-replay and concurrent-probe holes of
    a delete-then-rename design:

    1. **The newest live batch is never folded.** Structured Streaming
       can replay the most recent batch N after a crash (index written,
       checkpoint not committed). The replayed batch probes
       ``batch_id < N`` and overwrites ``batch_id=N`` — both only safe
       if N's own dir is still a plain per-batch dir and all folded ids
       are < N. Folding strictly-older batches guarantees both.

    ``merge_schema`` (r12, for the semantic DECISIONS dir): read the
    foldable dirs with parquet mergeSchema and union schemas across
    fold generations — a deployment upgraded mid-stream has pre-alias
    partitions without the ``canonical`` column, and a single-footer
    schema pick would silently DROP that column from the fold (the
    review r11 #3 class, now at fold time). Off for the index dirs,
    whose schema is fixed for an index's lifetime.
    2. **The manifest rename is the only commit point, and a fold never
       deletes the dirs it retires.** The fold is written to a hidden
       tmp, renamed to ``fold-<hi>``, and then the manifest atomically
       swaps to reference it, listing the previous fold + absorbed
       per-batch dirs as garbage. Garbage is deleted at the start of the
       NEXT sweep — so any reader holding either manifest version still
       finds every dir its snapshot references (no quiet period needed;
       a probe just has to finish within one sweep interval). A
       crash before the manifest swap leaves an unreferenced fold dir
       that the next sweep discards; sources are untouched.

    ``partition_col`` (r13, VERDICT r12 #3): carry a hash-bucket
    partition column through the fold (``fold-<hi>/<col>=<v>/``), so
    bucket-pruned probes keep their pruning across folds — the decon
    doc-gram history's retro-scan bound. Applied only when the column
    is actually present in the folded schema (a dir written before the
    bucketing shipped folds unpartitioned, no read breaks).

    ``sweep_when`` (r12, review #2) picks the sweep cadence to match
    the CALL cadence, so the reader grace window is one compaction
    interval either way: ``"always"`` (default) sweeps at the start of
    every call — right for interval-spaced manual/cron compaction
    (the original contract); ``"fold"`` sweeps only in a call that
    actually folds — required for per-trigger callers like the stream
    loops, where an every-call sweep would delete a fold's retired
    dirs ONE TRIGGER (~5 s) after the fold committed, yanking them
    from under any external reader mid-scan."""
    if not os.path.isdir(index_dir):
        return False
    if sweep_when not in ("always", "fold"):
        raise ValueError(f"sweep_when must be 'always' or 'fold', "
                         f"got {sweep_when!r}")
    m = _read_manifest(index_dir)
    if sweep_when == "always":
        m = _sweep_garbage(index_dir, m)
    live = _live_batch_parts(index_dir, m["folded_hi"])
    if len(live) < every:
        return False
    foldable = live[:-1]  # invariant 1: never the newest
    if not foldable:
        return False
    if sweep_when == "fold":
        # per-trigger callers (the stream loops) sweep only when a fold
        # actually happens, so retired dirs keep a FULL compaction
        # interval of grace — sweeping on every call would shrink an
        # external reader's window to one trigger (~5 s; review r12 #2)
        m = _sweep_garbage(index_dir, m)
    hi = int(foldable[-1].split("=", 1)[1])
    # empty partitioned batch writes commit no data files at all (just
    # _SUCCESS); reading a file-less dir dies on schema inference, so
    # fold only the file-bearing dirs — the empty ones carry nothing
    # and are still absorbed (recorded as garbage) below
    readable = [p for p in foldable if _dir_has_data(os.path.join(index_dir, p))]
    if not readable and not m["fold_dir"]:
        # nothing to materialize: commit a fold-less manifest that
        # still advances folded_hi, so the empty dirs retire normally
        _write_manifest(
            index_dir,
            {"folded_hi": hi, "fold_dir": None, "garbage": foldable},
        )
        return True
    reader = spark.read.option("basePath", index_dir)
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    if readable:
        folded = (
            reader.parquet(*[os.path.join(index_dir, p) for p in readable])
            # partition-column inference types batch_id INT; pin the
            # fold's physical column to the same so fold ∪ live unions
            # cleanly
            .withColumn("batch_id", F.col("batch_id").cast("int"))
        )
    else:
        folded = None
    if m["fold_dir"]:
        prev = spark.read.parquet(os.path.join(index_dir, m["fold_dir"]))
        folded = (
            prev
            if folded is None
            else prev.unionByName(folded, allowMissingColumns=merge_schema)
        )
    if latest_wins_key is not None:
        w = Window.partitionBy(latest_wins_key).orderBy(
            F.col("batch_id").desc()
        )
        folded = (
            folded.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .drop("_rn")
        )
    part_col = (
        partition_col
        if partition_col is not None and partition_col in folded.columns
        else None
    )
    if sort_col is not None:
        # with a partitioned fold, cluster by bucket first so each
        # writer task emits contiguous runs per bucket dir, keeping the
        # sort_col row-group min/max stats tight within every bucket
        folded = folded.sortWithinPartitions(
            *([part_col, sort_col] if part_col else [sort_col])
        )
    fold_name = f"fold-{hi}"
    tmp = os.path.join(index_dir, f".{fold_name}.tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    writer = (
        folded.coalesce(max(1, len(foldable) // 16))
        .write.mode("overwrite")
    )
    if part_col:
        writer = writer.partitionBy(part_col)
    writer.parquet(tmp)
    os.rename(tmp, os.path.join(index_dir, fold_name))
    _write_manifest(
        index_dir,
        {
            "folded_hi": hi,
            "fold_dir": fold_name,
            "garbage": ([m["fold_dir"]] if m["fold_dir"] else []) + foldable,
        },
    )
    return True
