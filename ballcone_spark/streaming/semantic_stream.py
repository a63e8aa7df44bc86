"""Incremental (streaming) semantic dedup — the SemDeDup decision rule
applied per micro-batch against a persistent routed-vector index; the
embedding twin of :mod:`ballcone_spark.streaming.dedup_stream`'s
MinHash pipeline (beyond-reference).

Semantics: a new vector is a duplicate when ANY earlier vector in its
cluster — from a previous batch, or earlier (lower vec_id) within the
same batch — sits at cosine >= tau. "Earlier" counts BOTH kept and
removed vectors, which makes the streamed decision sequence EXACTLY the
batch keep-lowest-id rule replayed in arrival order (greedy-vs-kept
would diverge on chains A~B, B~C, A≁C); the equivalence is pinned by
``test_semantic_stream_matches_batch_rule``.

ARRIVAL-ORDER CAVEAT (ADVICE r6): "earlier" for cross-batch pairs means
ARRIVAL order — every history row counts as earlier than every row of
the current batch, regardless of vec_id. The streamed sequence is
therefore the batch keep-lowest-id rule ONLY when vec_ids arrive
nondecreasing across batches (within a batch the kernel sorts by
vec_id, so intra-batch order never matters). A lower-vec_id vector
arriving AFTER a similar higher-vec_id one is removed where a global
batch run would instead keep it and remove the other — the standard
first-seen-wins semantics of every streaming dedup index (the MinHash
stream behaves identically). Pinned by
``test_semantic_stream_out_of_order_arrival_is_first_seen_wins``.

Alias emission (r11, VERDICT r10 #5): every decision row also carries
``canonical`` — the redirect target a vector store keeps for this
vector: itself when kept, else the canonical of its FIRST earlier match
(lowest-vec_id matching history row, else lowest-vec_id earlier
in-batch row), propagated transitively through chains
(``test_semantic_stream_alias_chain_transitive``). First-seen-wins and
FROZEN: unlike the chunk alias stream (alias_stream.py) there are no
merge rewrites, because this stream's decision contract freezes each
vector's verdict at arrival — the two streams document the two
coherent streaming-alias semantics. The compressed path elects
identically (``cross_first`` = min matching history vec_id = the exact
kernel's positional first; pinned by
``test_semantic_stream_compressed_matches_exact``).

Durability contract (inherited from dedup_stream): per-batch decisions
and index rows land in ``batch_id=<n>`` partition dirs via overwrite —
a replayed batch rewrites its own partition idempotently and reads only
``batch_id < current`` history, so crash/replay cannot double-count or
see its own output.

Scale shape: routing is the Arrow matmul kernel (one b×64 @ 64×k per
batch); the decision pass is one ``applyInPandas`` per touched cluster
over history∪batch (history filtered by the batch's cluster set before
the shuffle). The per-cluster gram is RECTANGULAR — new rows × all
rows, O(b·(h+b)) FLOPs for history h and batch contribution b — not the
full (h+b)² (VERDICT r6 #2: history×history similarities are already
decided and would be computed only to be discarded; at the b≪h steady
state that waste is a factor of ~h/b, growing with corpus age).
Per-batch cost still grows linearly with resident cluster size — a
real deployment bounds THAT with IVF-PQ compressed-domain scoring;
documented trade-off, same class as the MinHash index's band-probe
growth.
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ballcone_spark.operators.semantic_dedup import TAU, _route_np
from ballcone_spark.streaming.dedup_stream import (
    SPOOL_MAX_FILES_PER_TRIGGER,
)

__all__ = [
    "start_semantic_dedup_stream",
    "read_semantic_index",
    "read_semantic_decisions",
    "semantic_index_topk",
    "ResidentIndexCache",
]

#: ``codes`` is the PQ encoding of the NORMALIZED vector — populated in
#: compressed mode, null otherwise (an exact-mode index reads back with
#: null codes and still serves the exact path). The reader enforces
#: this shape after the manifest-aware union (r12): vec_id long,
#: cluster_id long, e array<double>, nrm double, codes array<int>,
#: batch_id long.


def _read_manifest_fs(spark: SparkSession, index_dir: str) -> dict:
    """dedup_stream's fold manifest, read through the Hadoop FS API so
    the reader stays FS-agnostic (ADVICE r6 class). Absent manifest =
    the no-fold default — which is also the permanent state on object
    stores, where :func:`~ballcone_spark.streaming.dedup_stream
    .compact_index` is a posix-only no-op."""
    import json as _json

    from ballcone_spark.streaming.dedup_stream import _MANIFEST

    jvm = spark._jvm
    mpath = jvm.org.apache.hadoop.fs.Path(index_dir + "/" + _MANIFEST)
    fs = mpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(mpath):
        return {"folded_hi": -1, "fold_dir": None, "garbage": []}
    stream = fs.open(mpath)
    try:
        out = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, out, 4096, False)
        return _json.loads(out.toString("UTF-8"))
    finally:
        stream.close()


def _fs_dir_has_data(fs, jvm, path_str: str) -> bool:
    """Hadoop-FS twin of ``dedup_stream._dir_has_data``: True when the
    dir tree holds at least one data file. Empty partitioned batch
    writes (r13, the decon doc-gram placeholder on bench-only batches)
    commit only ``_SUCCESS``; parquet schema inference dies on a
    file-less path, so readers skip such dirs. ``listFiles`` iterates
    lazily — the common (file-bearing) case stops at the first entry."""
    it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(path_str), True)
    while it.hasNext():
        name = it.next().getPath().getName()
        if not name.startswith("_") and not name.startswith("."):
            return True
    return False


#: unique-sentinel counter for dirs that vanish mid-listing (see
#: :func:`_dir_signature`); a module counter, not a timestamp, so the
#: sentinel is deterministic and never collides with a real signature
_VANISHED = itertools.count()


def _dir_signature(fs, jvm, path_str: str) -> tuple:
    """Data-file content listing ``(path, mtime, length)`` of a state
    dir — the content half of the resident cache's snapshot key (r14,
    ADVICE r13 #3): a replayed batch OVERWRITES its own
    ``batch_id=<n>`` dir under the same NAME (the 5484fde convention),
    so a name-only key keeps serving the pre-replay frame — and once
    Spark lazily re-scans it, FileNotFound on the deleted part files.
    Part-file names embed a fresh UUID per write, so any rewrite
    changes the signature even within mtime granularity.

    A dir VANISHING between the snapshot's listStatus and this per-dir
    listing (a racing fold commit + sweep — ADVICE r14 #1: the fold
    grace window protects data reads, not arbitrary-latency key
    checks) returns a process-unique sentinel instead of raising: the
    key then can never equal any cached key, so the caller re-reads
    from a FRESH snapshot rather than crashing the serving request.
    Other FS failures (permissions, transient IO) still propagate —
    the ADVICE r7 rule: only the one race whose safe meaning is
    "snapshot changed under me" is absorbed."""
    sig = []
    try:
        it = fs.listFiles(jvm.org.apache.hadoop.fs.Path(path_str), True)
        while it.hasNext():
            st = it.next()
            name = st.getPath().getName()
            if name.startswith("_") or name.startswith("."):
                continue
            sig.append(
                (st.getPath().toString(), st.getModificationTime(),
                 st.getLen())
            )
    except Exception as e:  # Py4JJavaError wrapping the JVM exception
        if "FileNotFoundException" not in str(e):
            raise
        return ("__vanished__", path_str, next(_VANISHED))
    return tuple(sorted(sig))


def _snapshot_names(
    spark: SparkSession, root: str, with_signature: bool = False,
    commit_cache: dict | None = None,
):
    """The manifest-snapshot listing shared by the readers and the
    resident cache's invalidation key: ``(fold_name_or_None, parts)``
    where ``parts`` are the committed, file-bearing per-batch dirs with
    ``batch_id > folded_hi`` in batch order — or None when the dir
    doesn't exist yet. With ``with_signature`` a third element is
    appended: the data-file listing of the fold + live dirs, so
    IN-PLACE rewrites (batch replay under an unchanged dir name)
    change the key too — readers don't need it (they re-scan every
    call), only the cache does. In signature mode each dir is listed
    ONCE and the signature doubles as the has-data check (r15 — the
    r14 shape listed every dir twice, once lazily for has-data and
    once fully for the signature).

    ``commit_cache`` (r15, VERDICT r14 #1): a caller-owned dict
    memoizing dir names whose ``_SUCCESS`` + has-data checks already
    passed. A committed batch dir is IMMUTABLE for any reader allowed
    to see it (replay only ever rewrites the CURRENT batch, which
    ``batch_id < current`` readers never select; fold dirs are
    write-once under fresh ``fold-<hi>`` names), so the two py4j
    round-trips per dir need only be paid once per stream, not once
    per trigger — without the cache the per-trigger FS cost grows
    linearly with the live-dir count until a fold. Only positive
    results are cached. Internal stream readers pass a per-stream
    dict; EXTERNAL/serving callers (and signature mode, which must
    re-list content every time by definition) must not."""
    jvm = spark._jvm
    jsc = spark._jsc
    path = jvm.org.apache.hadoop.fs.Path(root)
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    # no try/except: fs.exists covers 'nothing yet'; a transient FS or
    # permission failure must PROPAGATE so the batch retries, not be
    # mis-read as empty history (ADVICE r7)
    if not fs.exists(path):
        return None
    m = _read_manifest_fs(spark, root)
    names = [s.getPath().getName() for s in fs.listStatus(path)]
    sigs: dict[str, tuple] = {}

    def _committed_with_data(n: str, check_success: bool) -> bool:
        if (
            commit_cache is not None
            and not with_signature
            and commit_cache.get(n)
        ):
            return True
        # commit gate (r12): a LIVE stream may be mid-write in the
        # newest dir — no parquet footers yet, and a raw read dies
        # with UNABLE_TO_INFER_SCHEMA (hit by the vector live demo
        # serving mid-trigger). Spark's own _SUCCESS marker is the
        # job-commit signal; an uncommitted dir is invisible, read
        # on the next poll. The streams' internal batch_id<current
        # reads only ever see committed dirs, so this gates
        # EXTERNAL readers only. (Fold dirs skip it — the manifest
        # rename is their commit point.)
        if check_success and not fs.exists(
            jvm.org.apache.hadoop.fs.Path(root + "/" + n + "/_SUCCESS")
        ):
            return False
        # committed-but-file-less dirs (empty partitioned writes, r13)
        # contribute nothing and break schema inference
        if with_signature:
            # one listing serves both the has-data check and the key;
            # a vanished dir stays keyed (sentinel forces a mismatch)
            # but carries no data for the dropped-parts purpose
            sig = _dir_signature(fs, jvm, root + "/" + n)
            sigs[n] = sig
            ok = bool(sig)
        else:
            ok = _fs_dir_has_data(fs, jvm, root + "/" + n)
        if ok and commit_cache is not None and not with_signature:
            commit_cache[n] = True
        return ok

    parts = sorted(
        (
            n for n in names
            if n.startswith("batch_id=")
            and int(n.split("=", 1)[1]) > m["folded_hi"]
            and _committed_with_data(n, True)
        ),
        key=lambda n: int(n.split("=", 1)[1]),
    )
    fold = (
        m["fold_dir"]
        if (
            m["fold_dir"]
            and m["fold_dir"] in names
            and _committed_with_data(m["fold_dir"], False)
        )
        else None
    )
    if not with_signature:
        return fold, parts
    sig = tuple(
        sigs[d] for d in ([fold] if fold else []) + parts
    )
    return fold, parts, sig


def _read_folded_dir(
    spark: SparkSession, root: str, merge_schema: bool = False,
    commit_cache: dict | None = None, schema: str | None = None,
):
    """Manifest-snapshot read of a folded state dir through the Hadoop
    FS API: the manifest's fold dir plus per-batch dirs with
    ``batch_id > folded_hi`` (the dedup_stream rule, so a read racing a
    fold never double-counts). Returns the raw union or None when the
    dir is absent/empty. One copy of the listStatus/filter/union logic
    for both the index and decisions readers (review r12 #6);
    ``merge_schema`` is the decisions dir's cross-generation schema
    union (pre-alias partitions must surface canonical=null, not drop
    the column).

    ``schema`` (r16 driver-job diet): an explicit DDL read schema.
    Schema inference and mergeSchema each cost ONE SPARK JOB per
    ``read.parquet`` call — per-trigger overhead in the streaming
    loops; a user-specified schema costs zero (measured). Missing
    columns in older generations read as null — the same result the
    mergeSchema union produced — so ``schema`` supersedes
    ``merge_schema``. Declare ``batch_id int`` (the partition-inferred
    physical type a fold bakes into its concat file); readers cast up
    to long after, as before."""
    snap = _snapshot_names(spark, root, commit_cache=commit_cache)
    if snap is None:
        return None
    fold, parts = snap

    def _reader():
        r = spark.read
        if schema is not None:
            r = r.schema(schema)
        elif merge_schema:
            r = r.option("mergeSchema", "true")
        return r

    frames = []
    if fold:
        frames.append(_reader().parquet(root + "/" + fold))
    if parts:
        frames.append(
            _reader().option("basePath", root).parquet(
                *[root + "/" + p for p in parts]
            )
        )
    if not frames:
        return None
    df = frames[0]
    if len(frames) == 2:
        df = df.unionByName(frames[1], allowMissingColumns=True)
    return df


#: explicit read schemas for the streaming loop's per-trigger state
#: reads (r16): schema inference / mergeSchema cost one Spark job per
#: read.parquet call; these cost zero. batch_id is declared int (the
#: partition-inferred physical type folds bake in) and cast to long by
#: the readers, exactly as the inferred path did. Exact-mode index
#: generations carry no ``codes`` column and read as null through the
#: explicit schema — the same shape the readers already enforce.
_IDX_READ_SCHEMA = (
    "vec_id long, cluster_id long, e array<double>, nrm double, "
    "codes array<int>, batch_id int"
)
_DEC_READ_SCHEMA = (
    "vec_id long, cluster_id long, is_dup boolean, n_matches long, "
    "canonical long, batch_id int"
)


def read_semantic_index(
    spark: SparkSession, index_dir: str,
    commit_cache: dict | None = None,
    schema: str | None = None,
):
    """The resident index as a DataFrame, or None before the first batch
    lands. Probed through the Hadoop FS API (ADVICE r6: an os.listdir
    probe silently restricted the index to the local filesystem, unlike
    the DAO/ingest sinks which take any s3a/hdfs URI Spark can read).

    Manifest-aware since r12 (the stream now folds its own per-batch
    dirs inline — see ``compact_every``): reads the manifest's fold dir
    plus per-batch dirs with ``batch_id > folded_hi``, the dedup_stream
    snapshot rule, so a read racing a fold never double-counts. With no
    manifest (never folded, or an object store where the fold no-ops)
    this degrades to exactly the old whole-dir read."""
    df = _read_folded_dir(
        spark, index_dir, commit_cache=commit_cache, schema=schema
    )
    if df is None:
        return None
    # enforce the _IDX_SCHEMA shape the old schema-pinned read gave:
    # exact-mode files carry no codes column at all
    if "codes" not in df.columns:
        df = df.withColumn("codes", F.lit(None).cast("array<int>"))
    return df.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "e",
        "nrm",
        "codes",
        F.col("batch_id").cast("long").alias("batch_id"),
    )


class ResidentIndexCache:
    """Keep the semantic index RESIDENT in executor memory across
    serving requests (r13, §6av-addendum-2's lesson made a feature):
    every ``semantic_index_topk`` call otherwise re-reads the index
    from parquet — at 1 M × 64-dim that is most of the ~7 s warm
    request, and after a cache eviction the cold re-read is the
    dominant cost. This wrapper ``.cache()``s the index DataFrame and
    serves the SAME frame to every request until the state dir's
    manifest snapshot changes.

    Invalidation is the readers' snapshot listing PLUS a content
    signature: ``(fold_dir, committed file-bearing live dirs,
    per-dir data-file (path, mtime, len) listings)`` from
    :func:`_snapshot_names` with ``with_signature`` (r14, ADVICE r13
    #3 — a replayed batch overwrites its own dir under the same name,
    so dir names alone miss it and the cache would serve the
    pre-replay frame until some other snapshot change). A new batch
    landing, a fold committing, a retired dir being swept, or an
    in-place rewrite all change the key; the old cached frame is
    unpersisted (non-blocking) and the new snapshot cached. The
    per-request overhead is one manifest read + one listStatus + one
    recursive file listing per snapshot dir — the same FS round-trips
    the uncached read path already pays for planning, minus the
    parquet footers and data.

    Freshness contract: identical to the uncached reader for any
    request that finds no check already in flight — it sees every
    batch the stream has COMMITTED at the moment of its ``get()``
    (pinned by ``test_resident_index_cache_serves_fresh``; always the
    case for sequential callers). Concurrent requests SINGLE-FLIGHT
    the check (r15): a request arriving while a check is in flight
    serves that check's result — at most one check-duration (~0.25 s)
    older than its own arrival. Thread-safe for concurrent serving
    threads; Spark's cache layer handles concurrent job access.

    ``min_check_interval_s`` (r14): an explicit staleness bound for
    high-QPS daemons. The key check costs real driver time — measured
    ~135 ms for the name listing plus ~110 ms for the content
    signature at a 9-dir/12-file snapshot (py4j FS round-trips
    dominate; they scale with dir/file count, not data size) — which
    is pure overhead on every request whose state did NOT change. With
    a non-zero interval, requests inside the window serve the cached
    frame with ZERO FS round-trips; freshness degrades from "as of
    this get()" to "at most interval stale" — the standard serving
    trade, opt-in, default 0.0 (exact). ``invalidate()`` resets the
    clock, so a daemon notified out-of-band can force an immediate
    re-check."""

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        min_check_interval_s: float = 0.0,
    ):
        import threading

        self._spark = spark
        self._dir = index_dir
        self._interval = float(min_check_interval_s)
        self._lock = threading.Lock()
        self._cv = threading.Condition(self._lock)
        self._key = None
        self._df = None
        self._checked_at = None
        #: single-flight state (r15): whether a snapshot check is in
        #: flight, and a generation counter bumped on each SUCCESSFUL
        #: check so piggybacking waiters can tell completion from abort
        self._in_flight = False
        self._gen = 0

    def get(self):
        """The current index frame (cached), or None before the first
        committed batch.

        Concurrent ``get()``s SINGLE-FLIGHT the snapshot check (r15,
        VERDICT r14 #2): the listing costs ~245 ms of driver-side py4j
        round-trips, and without coalescing N concurrent requests each
        paid their own while contending for the same driver — the §6az
        route-phase serialization (route p50 0.601 s at conc-4, and an
        exploratory fresh-rounds variant that serialized per-arrival
        checks measured 1.5 s — worse than no coalescing). One thread
        lists; requests arriving while it is in flight wait and serve
        its result. Freshness for a piggybacking waiter is the state
        as of the in-flight check's start — at most ONE CHECK DURATION
        (~0.25 s) before its own arrival, a bounded race-window, not
        the unbounded-window trade of ``min_check_interval_s``. A
        request with no check in flight (every sequential caller)
        always runs a fresh check, so the single-threaded contract is
        byte-identical to r14's: a get() sees every batch committed
        before it was called (pinned by
        ``test_resident_index_cache_serves_fresh``)."""
        import time

        if self._interval > 0.0:
            with self._lock:
                if (
                    self._df is not None
                    and self._checked_at is not None
                    and time.monotonic() - self._checked_at
                    < self._interval
                ):
                    return self._df
        with self._cv:
            while self._in_flight:
                gen = self._gen
                self._cv.wait()
                if self._gen != gen:
                    # the flight we piggybacked on completed — its
                    # result is bounded-fresh relative to our arrival
                    return self._df
                # the flight aborted without a result (its caller sees
                # the exception); loop — we may claim our own
            self._in_flight = True
        try:
            snap = _snapshot_names(
                self._spark, self._dir, with_signature=True
            )
            key = (
                None if snap is None
                else (snap[0], tuple(snap[1]), snap[2])
            )
        except BaseException:
            # a failed check must not wedge the flight: release it so
            # a waiter can run its own, and let THIS caller's error
            # propagate (the ADVICE r7 rule — never mis-read a
            # transient FS failure as state)
            with self._cv:
                self._in_flight = False
                self._cv.notify_all()
            raise
        with self._cv:
            try:
                if key != self._key:
                    old = self._df
                    self._df = (
                        read_semantic_index(self._spark, self._dir).cache()
                        if key is not None and (key[0] or key[1])
                        else None
                    )
                    self._key = key
                    if old is not None:
                        old.unpersist(blocking=False)
                # bump the generation only on full success, so a
                # failed re-read never lets waiters treat unrefreshed
                # state as a completed check — they run their own
                self._gen += 1
                self._checked_at = time.monotonic()
                return self._df
            finally:
                self._in_flight = False
                self._cv.notify_all()

    def invalidate(self) -> None:
        """Drop the cached frame; the next ``get()`` re-reads (and
        re-checks immediately, regardless of the staleness window)."""
        with self._lock:
            if self._df is not None:
                self._df.unpersist(blocking=False)
            self._df = None
            self._key = None
            self._checked_at = None


def _decide_kernel(e, nrm, is_new, tau: float):
    """Per-cluster decision math, factored out for direct testing.

    ``e`` is the (h+b, d) matrix of history∪batch vectors ALREADY in
    decision order (history first, then new rows by vec_id), ``nrm``
    their norms, ``is_new`` the boolean batch mask. Returns
    ``(matches, first)`` — for each NEW row, how many strictly-earlier
    rows sit at cosine >= tau, and the POSITION (into the sorted input)
    of the first such row (-1 if none). "First" in decision order means
    the lowest-vec_id matching HISTORY row when any history row
    matches, else the lowest-vec_id earlier in-batch row — the
    deterministic first-seen tie-break the alias emission (r11) keys
    canonical election on.

    The gram is rectangular: new rows × ALL rows — O(b·(h+b)) FLOPs,
    never the full (h+b)² (VERDICT r6 #2). The earlier-than mask on the
    rectangle reproduces exactly the rows the old full-gram tril kept:
    for the new row at sorted position p, columns 0..p-1.
    """
    import numpy as np

    n = e / nrm[:, None]
    pos = np.arange(len(e))
    new_pos = pos[is_new]
    sim = n[is_new] @ n.T  # (b, h+b)
    earlier = (sim >= tau) & (pos[None, :] < new_pos[:, None])
    matches = earlier.sum(axis=1)
    first = np.where(matches > 0, earlier.argmax(axis=1), -1)
    return matches, first


def _pq_encode_norm(nmat, B):
    """(n, d) normalized vectors → (n, m) PQ codes against (m, k, d_sub)
    codebooks; np.argmin first-minimal tie rule (the engine-wide
    convention, see quantization.pq_encode_np)."""
    import numpy as np

    m, _, d_sub = B.shape
    return np.stack(
        [
            np.argmin(
                ((nmat[:, i * d_sub : (i + 1) * d_sub, None] - B[i].T[None]) ** 2).sum(
                    axis=1
                ),
                axis=1,
            )
            for i in range(m)
        ],
        axis=1,
    ).astype("int32")


def _adc_sims(q, codes, B):
    """Approximate cosine of exact normalized query rows ``q`` (b, d)
    against PQ-coded history rows ``codes`` (h, m): the FAISS ADC
    formulation — per-query dot LUT + codebook-norm LUT, m lookups and
    one divide per pair, the reconstruction never materialized."""
    import numpy as np

    m, _, d_sub = B.shape
    dots = np.zeros((q.shape[0], codes.shape[0]))
    rn2 = np.zeros(codes.shape[0])
    for i in range(m):
        dlut = q[:, i * d_sub : (i + 1) * d_sub] @ B[i].T  # (b, k)
        dots += dlut[:, codes[:, i]]  # (b, h)
        rn2 += (B[i] * B[i]).sum(axis=1)[codes[:, i]]
    return dots / np.sqrt(rn2)[None, :]  # |q| = 1 by construction


def read_state_before(
    spark: SparkSession, root: str, batch_id: int,
    commit_cache: dict | None = None,
    schema: str | None = None,
):
    """History rows with ``batch_id < current`` through the manifest
    snapshot (None before the first batch) — THE shared
    replay-safe state reader (review r12-c #3: decon/alias each grew a
    private copy of the same contract). ``commit_cache``: the
    per-stream committed-dir memo (see :func:`_snapshot_names`) — safe
    exactly here because this reader only ever selects dirs a replay
    can no longer rewrite. ``schema``: explicit read schema (r16 —
    skips the per-call schema-inference job; see
    :func:`_read_folded_dir`)."""
    df = _read_folded_dir(
        spark, root, commit_cache=commit_cache, schema=schema
    )
    if df is None:
        return None
    return df.where(F.col("batch_id") < F.lit(batch_id))


def read_semantic_decisions(
    spark: SparkSession, decisions_dir: str,
    commit_cache: dict | None = None,
    schema: str | None = None,
):
    """Every decision row ``(vec_id, cluster_id, is_dup, n_matches
    [, canonical], batch_id)``, or None before the first batch — THE
    reader for the stream's decisions dir (r12: the dir now folds
    through the manifest protocol like the index, so a plain
    ``spark.read.parquet(dir)`` would double-count rows retired by a
    fold that the next run hasn't swept yet). Manifest-aware through
    the Hadoop FS API; both the fold and the live dirs read with
    parquet mergeSchema, so pre-alias partitions (no ``canonical``
    column — review r11 #3) surface as canonical=null rather than
    nondeterministically dropping the column."""
    df = _read_folded_dir(
        spark, decisions_dir, merge_schema=True,
        commit_cache=commit_cache, schema=schema,
    )
    if df is None:
        return None
    return df.withColumn("batch_id", F.col("batch_id").cast("long"))


def semantic_index_topk(
    spark: SparkSession,
    index_dir: str,
    queries: "DataFrame | list[tuple[int, list[float]]]",
    centroids: list,
    k: int = 5,
    nprobe: int = 1,
    decisions_dir: str | None = None,
    books=None,
    eps: float = 0.1,
    screen_factor: int = 4,
    index_cache: "ResidentIndexCache | None" = None,
):
    """Top-k cosine serving over the stream's OWN state — the read side
    that makes the semantic stream a vector store: route each query to
    its ``nprobe`` nearest centroids (the same codebook the stream
    ingests with), score ONLY those clusters' resident vectors, and
    redirect every hit through the alias map so results name CANONICAL
    vectors (one row per distinct canonical, best similarity kept).

    ``queries``: ``(query_id long, e array<double>)`` — a DataFrame,
    or (r13) a plain list of ``(query_id, embedding)`` tuples. Routing
    happens driver-side over a bounded collect — a serving request is
    small by contract (the kmeans-contract class); the CORPUS side
    never collects, never shuffles: one cluster_id-keyed
    ``applyInPandas`` over the manifest-snapshot index read, where the
    fold's ``cluster_id`` sort (§6ae) prunes row groups to the probed
    clusters. Scoring is one numpy matmul per cluster batch — the
    BLAS-shaped math class where Arrow kernels beat interpreted HOF
    folds ~20× (semantic_dedup's measurement).

    The list form exists because the concurrent-serve bench (§6au)
    showed the DRIVER phase is what grows with concurrency while
    executor scoring stays flat — and for a serving daemon whose
    queries already live in Python memory, forcing them through
    ``createDataFrame`` + ``collect`` spends two driver round-trips per
    request on pure ceremony. Same results either way (pinned inside
    ``test_semantic_index_topk_serves_the_stream_state``).

    ``index_cache`` (r13): pass a :class:`ResidentIndexCache` built on
    the SAME ``index_dir`` and repeat requests score the in-memory
    cached frame instead of re-reading parquet — manifest-snapshot
    freshness is identical (the cache invalidates on any committed
    state change). ``index_dir`` is not consulted for the read when a
    cache is given.

    ``decisions_dir``: when given, neighbors that were judged
    duplicates redirect to their canonical (transitively resolved at
    decision time) and results dedupe on the canonical — exactly what
    serving against a store that kept only canonicals would return,
    without rewriting the index. The canonical map joins onto the
    index rows BEFORE the per-cluster top-k (review r12-b #1: truncate
    first and a cluster whose top-k is all one chain starves the
    result below k — duplicates are common by construction here);
    chains never span clusters (decisions are within-cluster), so
    per-cluster canonical-dedup composes into a correct global top-k.
    ``neighbor_id`` is the argmax vector of its canonical group — the
    row whose ``sim`` is reported (review r12-b #3). Returns
    ``(query_id, neighbor_id, canonical, sim, rank)``; None if the
    index is empty.

    ``books`` (r12): COMPRESSED-DOMAIN serving against an index the
    stream wrote in compressed mode — the petabyte path. The probed
    clusters are scanned reading ONLY ``(vec_id, cluster_id, codes)``
    (the 64–128× I/O cut PQ exists for; ``e``/``nrm`` never enter the
    scan or shuffle), candidates screen per cluster by ADC (the
    stream's `_adc_sims` LUT kernel), and only the O(candidates) rows
    surviving ``adc ≥ (screen_factor·k)-th best − eps`` pull their
    exact vectors back through a vec_id join for the exact rerank —
    the `_decide_compressed` shape, serving-side. Exact-equal to the
    uncompressed path whenever ADC error stays within ``eps`` and the
    per-cluster candidate pool (``screen_factor·k``) covers the true
    top-k after canonical dedup (chain-heavy cells may need a larger
    ``screen_factor`` — same bound class as IVF's nprobe recall)."""
    import numpy as np
    import pandas as pd

    # index_cache (r13): a serving daemon passes a ResidentIndexCache
    # so repeat requests score the in-memory frame instead of
    # re-reading parquet — same manifest-snapshot freshness either way
    hist = (
        index_cache.get()
        if index_cache is not None
        else read_semantic_index(spark, index_dir)
    )
    if hist is None:
        return None
    if isinstance(queries, DataFrame):
        # bounded: one request
        qpairs = [
            (int(r["query_id"]), list(r["e"]))
            for r in queries.select("query_id", "e").collect()
        ]
    else:
        qpairs = [(int(q), list(e)) for q, e in queries]
    if not qpairs:
        return None
    C = np.array([list(c[1]) for c in centroids], dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1), 1e-12)[:, None]
    cids = np.array([int(c[0]) for c in centroids], dtype=np.int64)
    nprobe = min(nprobe, len(cids))
    Q = np.array([e for _, e in qpairs], dtype=np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1), 1e-12)[:, None]
    route = Qn @ C.T  # (q, cells)
    # per-cluster query lists: {cluster_id: ([query_ids], matrix)}
    per: dict = {}
    for i in range(len(qpairs)):
        order = np.argsort(-route[i])[:nprobe]
        for j in order:
            per.setdefault(int(cids[j]), []).append(i)
    qids = np.array([q for q, _ in qpairs], dtype=np.int64)
    qmap = {
        cid: (qids[idx], Qn[idx]) for cid, idx in
        ((cid, np.array(ix)) for cid, ix in per.items())
    }
    probed = sorted(qmap)

    def score(key, pdf):
        entry = qmap.get(int(key[0]))
        if entry is None or not len(pdf):
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "canonical": [],
                 "sim": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64",
                      "canonical": "int64", "sim": "float64"})
        q_id, qn = entry
        X = np.array(pdf["e"].tolist(), dtype=np.float64)
        X = X / np.maximum(pdf["nrm"].values, 1e-12)[:, None]
        sims = qn @ X.T  # (q_in_cell, rows)
        nid = pdf["vec_id"].values
        can = pdf["canonical"].values
        out_q, out_n, out_c, out_s = [], [], [], []
        for qi in range(sims.shape[0]):
            # canonical-dedup FIRST (argmax row per canonical), THEN
            # top-k over the surviving canonicals — truncating before
            # the dedup starves results when a chain dominates a cell
            best: dict = {}
            row = sims[qi]
            for j in range(len(nid)):
                c = can[j]
                b = best.get(c)
                if b is None or row[j] > row[b] or (
                    row[j] == row[b] and nid[j] < nid[b]
                ):
                    best[c] = j
            js = sorted(
                best.values(), key=lambda j: (-row[j], can[j])
            )[:k]
            out_q.extend([q_id[qi]] * len(js))
            out_n.extend(int(nid[j]) for j in js)
            out_c.extend(int(can[j]) for j in js)
            out_s.extend(float(row[j]) for j in js)
        return pd.DataFrame(
            {"query_id": np.array(out_q, dtype=np.int64),
             "neighbor_id": np.array(out_n, dtype=np.int64),
             "canonical": np.array(out_c, dtype=np.int64),
             "sim": np.array(out_s, dtype=np.float64)}
        )

    def _with_canonical(df, id_col):
        if decisions_dir is not None:
            dec = read_semantic_decisions(spark, decisions_dir)
            if dec is not None and "canonical" in dec.columns:
                canon = dec.select(
                    F.col("vec_id").alias(id_col),
                    F.col("canonical").alias("_c"),
                )
                return (
                    df.join(canon, id_col, "left")
                    .withColumn("canonical", F.coalesce("_c", id_col))
                    .drop("_c")
                )
        return df.withColumn("canonical", F.col(id_col))

    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("canonical").asc()
    )

    if books is not None:
        # compressed-domain: scan codes only, ADC-screen per cluster,
        # exact-rerank the surviving candidates via a narrow vec_id
        # join (the _decide_compressed shape, serving-side)
        B = np.array(books, dtype=np.float64)
        pool = max(k * screen_factor, k + 8)
        # rows without codes (written before a compression upgrade, or
        # an exact-mode index served with books= by mistake) are
        # excluded HERE, relationally — a kernel-side first-row guess
        # would crash on mixed groups and silently drop clusters whose
        # first row happened to be exact-mode (review r12-c #1).
        # Pre-upgrade rows are therefore not screened: re-encode
        # history (fold-time) to serve them compressed.
        cside = (
            hist.where(F.col("cluster_id").isin(probed))
            .where(F.col("codes").isNotNull())
            .select("cluster_id", "vec_id", "codes")
        )

        def screen(key, pdf):
            entry = qmap.get(int(key[0]))
            empty = pd.DataFrame(
                {"query_id": [], "neighbor_id": []}
            ).astype({"query_id": "int64", "neighbor_id": "int64"})
            if entry is None or not len(pdf):
                return empty
            q_id, qn = entry
            codes = np.array(pdf["codes"].tolist(), dtype=np.int64)
            adc = _adc_sims(qn, codes, B)
            nid = pdf["vec_id"].values
            oq, on = [], []
            for qi in range(adc.shape[0]):
                row = adc[qi]
                p = min(pool, len(row))
                kth = np.sort(row)[::-1][p - 1]
                keep = np.flatnonzero(row >= kth - eps)
                oq.extend([q_id[qi]] * len(keep))
                on.extend(int(x) for x in nid[keep])
            return pd.DataFrame(
                {"query_id": np.array(oq, dtype=np.int64),
                 "neighbor_id": np.array(on, dtype=np.int64)}
            )

        cand = cside.groupBy("cluster_id").applyInPandas(
            screen, "query_id long, neighbor_id long"
        )
        qlit = spark.createDataFrame(
            pd.DataFrame({"query_id": qids, "qe": list(Qn)})
        )
        # candidates can only reference probed clusters, so the
        # full-vector pull scans ONLY them (review r12-c #2: without
        # this filter the rerank read e/nrm across the whole index —
        # undoing the codes-only scan cut on the unprobed majority)
        vecs = hist.where(F.col("cluster_id").isin(probed)).select(
            F.col("vec_id").alias("neighbor_id"), "e", "nrm"
        )
        dot = F.aggregate(
            F.zip_with("e", "qe", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        # candidates are O(queries·pool) — broadcast them onto the
        # index scan so the full-vector pull is exchange-free on the
        # big side; the interpreted HOF dot is fine at candidate scale
        exact = (
            vecs.join(F.broadcast(cand), "neighbor_id")
            .join(F.broadcast(qlit), "query_id")
            .select(
                "query_id", "neighbor_id",
                (dot / F.col("nrm")).alias("sim"),
            )
        )
        exact = _with_canonical(exact, "neighbor_id")
        best = exact.groupBy("query_id", "canonical").agg(
            F.max("sim").alias("sim"),
            F.max_by(
                "neighbor_id",
                F.struct(F.col("sim"), (-F.col("neighbor_id")).alias("_n")),
            ).alias("neighbor_id"),
        )
        return (
            best.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "canonical", "sim", "rank")
        )

    # scan only the probed clusters and only the columns scoring
    # reads: the IN filter pushes into the parquet scan (fold's
    # cluster_id sort makes it row-group tight), the projection keeps
    # codes/batch_id out of the shuffle into the kernel
    side = hist.where(F.col("cluster_id").isin(probed)).select(
        "cluster_id", "vec_id", "e", "nrm"
    )
    side = _with_canonical(side, "vec_id")
    scored = side.groupBy("cluster_id").applyInPandas(
        score,
        "query_id long, neighbor_id long, canonical long, sim double",
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "canonical", "sim", "rank")
    )


def _read_decision_canon(
    spark: SparkSession, decisions_dir: str, batch_id: int,
    commit_cache: dict | None = None,
    schema: str | None = None,
):
    """vec_id → canonical from prior decisions (``batch_id <
    current``), or None when no decisions exist yet. Delegates to the
    manifest-aware :func:`read_semantic_decisions`; pre-alias rows read
    canonical=null and the decide paths' coalesce falls back to
    self."""
    df = read_semantic_decisions(spark, decisions_dir, commit_cache, schema)
    if df is None or "canonical" not in df.columns:
        return None
    return df.where(F.col("batch_id") < F.lit(batch_id)).select(
        "vec_id", "canonical"
    )


#: batch-cluster isin ceiling (r16 driver-job diet): the per-trigger
#: probe hands the decide passes the batch's distinct cluster ids
#: driver-side (bounded by the frozen centroid count), so history can
#: be pruned with an ``isin`` predicate that PUSHES into the history
#: parquet scan (the fold is cluster_id-sorted — row groups prune) and
#: costs no broadcast job. Past this many clusters the literal list
#: stops being a sane expression tree and the prune falls back to the
#: r15 broadcast semi-join — same rows either way.
BATCH_CLUSTER_ISIN_MAX = 1024


def _prune_hist_clusters(
    hist: DataFrame, new: DataFrame, batch_clusters: list | None
) -> DataFrame:
    """History rows belonging to the batch's clusters — isin pushdown
    when the driver already knows the (bounded) cluster list, broadcast
    semi-join otherwise."""
    if (
        batch_clusters is not None
        and len(batch_clusters) <= BATCH_CLUSTER_ISIN_MAX
    ):
        return hist.where(F.col("cluster_id").isin(batch_clusters))
    return hist.join(
        F.broadcast(new.select("cluster_id").distinct()),
        "cluster_id",
        "left_semi",
    )


def _decide_compressed(
    batch_routed: DataFrame,
    hist: DataFrame | None,
    tau: float,
    books,
    eps: float,
    hist_canon: DataFrame | None = None,
    batch_clusters: list | None = None,
):
    """Compressed-domain decision pass (VERDICT r6 #3): the per-cluster
    kernel ships history PQ CODES (m bytes/row) instead of full vectors
    (8·d bytes/row — 64× smaller at d=64, m=8), ADC-scores new×history,
    and only candidates inside the ``tau - eps`` safety band are
    exact-reranked against their full vectors via a narrow vec_id join.
    Intra-batch pairs (both sides exact in the batch) use the same
    rectangular kernel as the exact path.

    Decisions equal the exact path whenever the ADC error on true pairs
    is below ``eps`` — extra candidates are harmless (the rerank is
    exact), only a true match whose approx sim falls below the band is
    missed; ``test_semantic_stream_compressed_matches_exact`` pins
    equality on the test corpus and measures the actual ADC error
    margin. Bounds per-batch memory AND flops as history grows: the
    O(h) term carries m-byte codes and m-lookup sims, full vectors are
    touched only for the O(candidates) rerank."""
    import numpy as np
    import pandas as pd

    B = np.array(books, dtype=np.float64)

    new = batch_routed.select(
        "vec_id", "cluster_id", "e", "nrm", F.lit(True).alias("_new")
    )
    if hist is not None:
        old = (
            _prune_hist_clusters(hist, new, batch_clusters)
            .select(
                "vec_id",
                "cluster_id",
                F.lit(None).cast("array<double>").alias("e"),  # codes only
                "nrm",
                "codes",
                F.lit(False).alias("_new"),
            )
        )
        pool = old.unionByName(
            new.withColumn("codes", F.lit(None).cast("array<int>"))
        )
    else:
        pool = new.withColumn("codes", F.lit(None).cast("array<int>"))

    def screen(key, pdf):
        pdf = pdf.sort_values(["_new", "vec_id"]).reset_index(drop=True)
        is_new = pdf["_new"].values
        new_pdf = pdf[is_new]
        q = np.array(new_pdf["e"].tolist(), dtype=np.float64)
        q = q / new_pdf["nrm"].values[:, None]
        # intra-batch: exact rectangular among the new rows only
        simb = q @ q.T
        bpos = np.arange(len(q))
        imask = (simb >= tau) & (bpos[None, :] < bpos[:, None])
        intra = imask.sum(axis=1)
        nvid = new_pdf["vec_id"].values
        ifirst = np.where(intra > 0, imask.argmax(axis=1), -1)
        # -1 sentinel, not None: nulls would make the long column
        # float64 downstream (vec_ids > 2^53 round — ADVICE r11)
        intra_first = [
            int(nvid[i]) if i >= 0 else -1 for i in ifirst
        ]
        hist_pdf = pdf[~is_new]
        if len(hist_pdf):
            codes = np.array(hist_pdf["codes"].tolist(), dtype=np.int64)
            approx = _adc_sims(q, codes, B)  # (b, h)
            hid = hist_pdf["vec_id"].values
            cand = [hid[approx[i] >= tau - eps].tolist() for i in range(len(q))]
        else:
            cand = [[] for _ in range(len(q))]
        return pd.DataFrame(
            {
                "vec_id": nvid,
                "cluster_id": key[0],
                "intra": intra.astype("int64"),
                "intra_first": intra_first,
                "cand": cand,
            }
        )

    screened = pool.groupBy("cluster_id").applyInPandas(
        screen,
        "vec_id long, cluster_id long, intra long, intra_first long, "
        "cand array<long>",
    ).localCheckpoint()

    if hist is not None:
        # exact rerank of the banded candidates only: narrow vec_id
        # joins pull full vectors for O(candidates) rows, never the
        # whole history. cross_first = min matching h_id — identical to
        # the exact path's positional first (its kernel sorts history
        # by vec_id), so the alias election matches bit-for-bit.
        pairs = screened.select("vec_id", F.explode("cand").alias("h_id"))
        hvec = hist.select(
            F.col("vec_id").alias("h_id"),
            F.col("e").alias("h_e"),
            F.col("nrm").alias("h_nrm"),
        )
        nvec = batch_routed.select("vec_id", "e", "nrm")
        dot = F.aggregate(
            F.zip_with("e", "h_e", lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        exact = (
            pairs.join(hvec, "h_id")
            .join(nvec, "vec_id")
            .where(dot / (F.col("nrm") * F.col("h_nrm")) >= tau)
            .groupBy("vec_id")
            .agg(
                F.count("*").alias("cross"),
                F.min("h_id").alias("cross_first"),
            )
        )
        base = screened.join(exact, "vec_id", "left")
        if hist_canon is not None:
            hc = hist_canon.select(
                F.col("vec_id").alias("cross_first"),
                F.col("canonical").alias("_hc"),
            )
            base = base.join(hc.hint("merge"), "cross_first", "left")
            base = base.withColumn(
                "cross_canon", F.coalesce("_hc", "cross_first")
            ).drop("_hc")
        else:
            base = base.withColumn("cross_canon", F.col("cross_first"))
        # left-join misses become -1 sentinels so the long columns
        # cross the Arrow boundary null-free (exact int64, no float64
        # rounding of >2^53 vec_ids)
        base = base.withColumn(
            "cross", F.coalesce("cross", F.lit(-1)).cast("long")
        ).withColumn(
            "cross_canon", F.coalesce("cross_canon", F.lit(-1)).cast("long")
        )
    else:
        base = screened.withColumn(
            "cross", F.lit(-1).cast("long")
        ).withColumn("cross_canon", F.lit(-1).cast("long"))

    def resolve(key, pdf):
        # per-cluster chain resolution in arrival order: a history match
        # wins (its canonical is frozen in cross_canon); else the first
        # earlier in-batch match, whose canonical was resolved earlier
        # in this very loop (vec_id ascending); else self
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        canon: dict = {}
        out = []
        for r in pdf.itertuples():
            vid = int(r.vec_id)
            # all columns arrive null-free (the -1 sentinel), hence
            # exact int64 — no pd.isna branch, no float rounding.
            # Hit tests read the COUNT columns (domain: non-negative,
            # -1 only as the join-miss sentinel) — NEVER the sign of
            # an id column: vec_ids are arbitrary signed 64-bit, so a
            # legitimate negative id would read as "no match" there
            # (review r12 #4).
            if int(r.cross) > 0:
                c = int(r.cross_canon)
            elif int(r.intra) > 0:
                c = canon[int(r.intra_first)]
            else:
                c = vid
            canon[vid] = c
            n_matches = int(r.intra) + max(int(r.cross), 0)
            out.append((vid, int(r.cluster_id), n_matches > 0, n_matches, c))
        return pd.DataFrame(
            out,
            columns=[
                "vec_id", "cluster_id", "is_dup", "n_matches", "canonical",
            ],
        )

    return base.groupBy("cluster_id").applyInPandas(
        resolve,
        "vec_id long, cluster_id long, is_dup boolean, n_matches long, "
        "canonical long",
    )


def _decide(
    batch_routed: DataFrame,
    hist: DataFrame | None,
    tau: float,
    hist_canon: DataFrame | None = None,
    batch_clusters: list | None = None,
):
    """(vec_id, cluster_id, is_dup, n_matches, canonical) for the batch
    rows. ``canonical`` (r11 alias emission) is the redirect target a
    vector store keeps for this vector: itself when kept, else the
    canonical of its FIRST earlier match (lowest-vec_id matching
    history row, else lowest-vec_id earlier in-batch row) — canonicals
    propagate transitively through chains, and a decision is never
    revisited (first-seen-wins, the dedup_stream convention; unlike the
    chunk alias stream there are no merge rewrites, because the
    decision contract here freezes each vector's verdict at arrival).
    ``hist_canon`` maps history vec_id → canonical (from prior
    decisions); absent entries default to self."""
    import numpy as np
    import pandas as pd

    new = batch_routed.select(
        "vec_id",
        "cluster_id",
        "e",
        "nrm",
        F.lit(True).alias("_new"),
        # -1 sentinel, NOT null: an Arrow long column with any null
        # reaches pandas as float64, silently rounding vec_ids above
        # 2^53 (snowflake-scale 64-bit ids) before the int() casts
        # below. With no nulls the column arrives as exact int64.
        F.lit(-1).cast("long").alias("_canon"),
    )
    if hist is not None:
        old = _prune_hist_clusters(hist, new, batch_clusters)
        if hist_canon is not None:
            old = old.join(hist_canon.hint("merge"), "vec_id", "left")
            canon_col = F.coalesce("canonical", "vec_id")
        else:
            canon_col = F.col("vec_id")
        old = old.select(
            "vec_id",
            "cluster_id",
            "e",
            "nrm",
            F.lit(False).alias("_new"),
            canon_col.alias("_canon"),
        )
        pool = old.unionByName(new)
    else:
        pool = new

    def decide(key, pdf):
        # history first (already decided, any order), then new by vec_id —
        # the arrival order the batch rule replays
        pdf = pdf.sort_values(["_new", "vec_id"]).reset_index(drop=True)
        e = np.array(pdf["e"].tolist(), dtype=np.float64)
        is_new = pdf["_new"].values
        matches, first = _decide_kernel(e, pdf["nrm"].values, is_new, tau)
        vids = pdf["vec_id"].values
        # hist rows carry real canonicals; new rows the -1 sentinel
        # (never read: every f points at an already-resolved position).
        # astype int64 is exact — and raises if a NaN ever sneaks in.
        canon = pdf["_canon"].astype("int64").tolist()
        new_positions = np.flatnonzero(is_new)
        for p, f in zip(new_positions, first):
            # f < p positionally → canon[f] already resolved (history
            # rows carry their stored canonical; earlier in-batch rows
            # were assigned in this loop) — chains collapse in one pass
            canon[p] = int(canon[f]) if f >= 0 else int(vids[p])
        return pd.DataFrame(
            {
                "vec_id": vids[is_new],
                "cluster_id": key[0],
                "is_dup": matches > 0,
                "n_matches": matches.astype("int64"),
                "canonical": np.array(
                    [canon[p] for p in new_positions], dtype="int64"
                ),
            }
        )

    return pool.groupBy("cluster_id").applyInPandas(
        decide,
        "vec_id long, cluster_id long, is_dup boolean, n_matches long, "
        "canonical long",
    )


def _overwrite_partition(df: DataFrame, base: str, batch_id: int) -> None:
    df.write.mode("overwrite").parquet(f"{base}/batch_id={batch_id}")


def _with_codes(routed: DataFrame, books) -> DataFrame:
    """Attach PQ codes of the normalized vector to routed batch rows —
    the compressed index representation (one Arrow encode pass)."""
    import numpy as np

    B = np.array(books, dtype=np.float64)

    def enc(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            e = np.array(pdf["e"].tolist(), dtype=np.float64)
            n = e / pdf["nrm"].values[:, None]
            pdf = pdf.copy()
            pdf["codes"] = list(_pq_encode_norm(n, B))
            yield pdf[["vec_id", "cluster_id", "e", "nrm", "codes"]]

    return routed.mapInPandas(
        enc,
        "vec_id long, cluster_id long, e array<double>, nrm double, "
        "codes array<int>",
    )


def start_semantic_dedup_stream(
    spark: SparkSession,
    spool_dir: str,
    index_dir: str,
    decisions_dir: str,
    checkpoint_dir: str,
    centroids: list[tuple[int, list[float]]],
    tau: float = TAU,
    available_now: bool = True,
    trigger_seconds: int = 5,
    compressed: bool = False,
    books=None,
    eps: float = 0.15,
    compact_every: int | None = 64,
    clean_source: str | None = None,
    archive_dir: str | None = None,
    max_files_per_trigger: int | None = SPOOL_MAX_FILES_PER_TRIGGER,
    scheduler_pool: str | None = None,
):
    """Stream JSON-lines ``{"vec_id": ..., "e": [...]}`` files through
    the incremental SemDeDup rule against a frozen centroid set.

    ``max_files_per_trigger`` (r14): spool backpressure — defaults to
    :data:`~ballcone_spark.streaming.dedup_stream
    .SPOOL_MAX_FILES_PER_TRIGGER`, bounding cold-start backlogs to
    steady-state-sized micro-batches; the decision gram is
    O(b·(h+b)) in the BATCH size b, so one backlog-sized batch is
    exactly the memory spike the rectangular kernel exists to avoid.
    ``None`` opts out.

    Per batch: route (Arrow matmul) → decide vs ``batch_id < current``
    history plus earlier-in-batch (both kept AND removed rows — exact
    batch-rule equivalence) → overwrite ``decisions_dir/batch_id=<n>``
    and ``index_dir/batch_id=<n>``. Returns the StreamingQuery.

    ``compressed=True`` (VERDICT r6 #3) stores PQ codes in the index
    alongside the vectors and runs the decision screen in the
    compressed domain (:func:`_decide_compressed`): history enters the
    per-cluster kernel as m-byte codes, ADC-scored against the batch,
    and only candidates within ``eps`` of ``tau`` are exact-reranked
    against full vectors — per-batch memory and flops stay bounded by
    codes + candidates as history grows. Requires ``books`` (PQ
    codebooks, e.g. :func:`~ballcone_spark.operators.quantization
    .train_pq_codebooks` output); an index dir must stay in ONE mode
    for its lifetime (exact-mode batches have null codes the
    compressed screen cannot score).

    ``compact_every`` (r12): fold the INDEX's per-batch dirs through
    dedup_stream's :func:`~ballcone_spark.streaming.dedup_stream
    .compact_index` when the live dir count reaches this many —
    previously nothing in the loop folded, so a long-running stream
    paid an ever-growing dir listing per trigger. Fold rows are sorted
    by ``cluster_id`` so the per-cluster history probe prunes row
    groups. The DECISIONS dir folds too (each vec_id is decided exactly
    once — first-seen, never revisited — so a plain concat fold is
    read-equivalent; ``merge_schema`` keeps pre-alias partitions from
    dropping the ``canonical`` column at fold time): external consumers
    must read it via :func:`read_semantic_decisions`, the
    manifest-aware reader. On object stores the fold is a posix-only
    no-op and reads are unchanged. ``None`` disables."""
    import numpy as np

    if compressed and books is None:
        raise ValueError("compressed=True requires PQ codebooks (books=)")

    cents = sorted(centroids)
    ids = np.array([int(c) for c, _ in cents])
    cmat = np.array([v for _, v in cents], dtype=np.float64)
    cmat = (cmat / np.sqrt((cmat * cmat).sum(axis=1))[:, None]).T

    from ballcone_spark.streaming.dedup_stream import _spool_reader

    reader = _spool_reader(spark, clean_source, archive_dir)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.load(spool_dir)
    vecs = raw.select(
        F.get_json_object("value", "$.vec_id").cast("long").alias("vec_id"),
        F.from_json(
            F.get_json_object("value", "$.e"), "array<double>"
        ).alias("e"),
    ).where(F.col("vec_id").isNotNull() & F.col("e").isNotNull())

    # per-stream committed-dir memo (r15, VERDICT r14 #1): the history
    # reads re-verified _SUCCESS + has-data for every live dir on every
    # trigger — two py4j round-trips per dir, growing linearly until a
    # fold. Committed dirs are immutable for batch_id<current readers,
    # so one positive check per dir per stream suffices.
    idx_cache: dict = {}
    dec_cache: dict = {}

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        routed = _route_np(batch_df, ids, cmat)
        if compressed:
            routed = _with_codes(routed, books)
        # r16 driver-job diet (VERDICT r15 #3): ONE probe job replaces
        # three — the lazy checkpoint materializes under a shuffle-free
        # collect of the (batch-bounded, backpressured) cluster_id
        # projection, which answers emptiness (previously a separate
        # take(1)) AND hands the decide pass the batch's distinct
        # cluster ids (previously a broadcast-exchange job per
        # decisions write). A groupBy probe would pay AQE's two-job
        # split for the shuffle; the plain collect is one job.
        routed = routed.localCheckpoint(eager=False)
        rows = routed.select("cluster_id").collect()
        if not rows:
            return
        batch_clusters = sorted({r[0] for r in rows})
        # explicit read schemas: inference/mergeSchema cost one Spark
        # job per read.parquet — two more jobs per trigger, gone
        hist = read_semantic_index(
            spark, index_dir, commit_cache=idx_cache,
            schema=_IDX_READ_SCHEMA,
        )
        hist_canon = None
        if hist is not None:
            hist = hist.where(F.col("batch_id") < F.lit(batch_id)).drop(
                "batch_id"
            )
            hist_canon = _read_decision_canon(
                spark, decisions_dir, batch_id, commit_cache=dec_cache,
                schema=_DEC_READ_SCHEMA,
            )
        if compressed:
            decisions = _decide_compressed(
                routed, hist, tau, books, eps, hist_canon=hist_canon,
                batch_clusters=batch_clusters,
            )
        else:
            decisions = _decide(
                routed, hist, tau, hist_canon=hist_canon,
                batch_clusters=batch_clusters,
            )
        _overwrite_partition(decisions, decisions_dir, batch_id)
        _overwrite_partition(routed, index_dir, batch_id)
        if compact_every is not None:
            from ballcone_spark.streaming.dedup_stream import compact_index

            compact_index(
                spark, index_dir, every=compact_every,
                sort_col="cluster_id", sweep_when="fold",
            )
            # decisions fold (r12): each vec_id is decided exactly once
            # (first-seen, never revisited), so a plain concat fold is
            # read-equivalent; merge_schema keeps pre-alias partitions
            # from dropping the canonical column at fold time. External
            # consumers read via read_semantic_decisions.
            compact_index(
                spark, decisions_dir, every=compact_every, sort_col=None,
                merge_schema=True, sweep_when="fold",
            )

    writer = vecs.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        # continuous deployment mode (the vector live demo's shape) —
        # previously the non-availableNow path ran with the default
        # unthrottled trigger
        writer = writer.trigger(
            processingTime=f"{trigger_seconds} seconds"
        )
    from ballcone_spark.streaming.dedup_stream import _scheduler_pool

    with _scheduler_pool(spark, scheduler_pool):
        return writer.start()
