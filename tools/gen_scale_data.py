#!/usr/bin/env python
"""Generate sf1+ `documents` / `embeddings` tables for scale-curve
measurement (VERDICT r4 #1).

The driver's testdata stops at sf0.1 (5 000 docs / 2 000 vectors) —
too small to distinguish a linear dedup/ANN operator from a
superlinear one. This generator extends the SAME seeded shape observed
in ``/root/testdata`` (measured, see inline constants) to sf1/sf3:

documents (sf0.1 reference: 5 000 rows, 31-word vocab, uniform
10–100-word docs, 20 sources, ~5% planted near-dup copies carrying a
``dup dup`` suffix with J ≥ 0.9 vs their base, ~0.16% exact copies,
background Jaccard ≪ 0.1):
    doc_id long, text string, lang string, source string, n_chars long

embeddings (sf0.1 reference: 2 000 rows, dim-64 UNIT-NORM vectors,
10 balanced Gaussian cluster labels):
    vec_id long, embedding array<float>, label int

Row counts scale linearly from the observed sf0.1 sizes:
n_docs = 50 000 × sf, n_vecs = 20 000 × sf. Deterministic (numpy
PCG64, seed 42 ⊕ sf) — re-running overwrites byte-identical files.

Output: ``<repo>/.scale_data/sf<sf>/{documents,embeddings}.parquet``
(gitignored; ~25 MB at sf1). Usage:

    python tools/gen_scale_data.py 1 3
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = [
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch",
]
N_SOURCES = 20
NEAR_DUP_FRAC = 0.05
EXACT_DUP_FRAC = 0.0016
DIM = 64
N_LABELS = 10


def gen_documents(
    n: int, rng: np.random.Generator, skew: float | None = None
) -> pa.Table:
    """``skew``: if set (e.g. 0.92), that fraction of docs lands in the
    single dominant source ``src0`` and the rest spread uniformly over
    the other 19 — the first-class skew fixture (VERDICT r9 #6) so
    every per-source operator (rank, quota sample, temperature mix,
    percentile filter) gets measured on a dominant-source mix by
    default instead of only when a verdict asks."""
    lengths = rng.integers(10, 101, size=n)
    texts: list[str] = []
    for i in range(n):
        words = [VOCAB[w] for w in rng.integers(0, len(VOCAB), lengths[i])]
        r = rng.random()
        if i > 10 and r < EXACT_DUP_FRAC:
            texts.append(texts[int(rng.integers(0, i))])
            continue
        if i > 10 and r < EXACT_DUP_FRAC + NEAR_DUP_FRAC:
            # near-dup: copy an earlier doc (long enough that the two
            # appended marker words keep J >= 0.9), maybe flip one word
            base = texts[int(rng.integers(0, i))].split()
            while len(base) < 40:
                base = texts[int(rng.integers(0, i))].split()
            if rng.random() < 0.5:
                base[int(rng.integers(0, len(base)))] = VOCAB[
                    int(rng.integers(0, len(VOCAB)))
                ]
            texts.append(" ".join(base + ["dup", "dup"]))
            continue
        texts.append(" ".join(words))
    if skew is None:
        sources = [f"src{i % N_SOURCES}" for i in range(n)]
    else:
        dom = rng.random(n) < skew
        rest = rng.integers(1, N_SOURCES, size=n)
        sources = [
            "src0" if dom[i] else f"src{rest[i]}" for i in range(n)
        ]
    return pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(sources, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )


#: Cluster-signal scale, calibrated against the driver's sf0.1 corpus
#: (measured 2026-08-14: mean cos-to-centroid ≈ 0.07, within-cluster
#: pair cos mean ≈ 0.0 / max ≈ 0.51, overall max pair 0.60, frac ≥0.45
#: = 7e-5): the real embeddings are NOISE-dominated — near-uniform on
#: the sphere with a whisper of label signal — not center-dominated.
#: cos-to-centroid ≈ a/sqrt(a² + DIM) → a ≈ 0.56 for 0.07. The previous
#: center-dominated replica (unit-variance centers + 0.35 noise) made
#: 2.7% of ALL pairs ≥ 0.9-cosine at sf1 — an output-quadratic corpus
#: the real data never was, which made every near-dup measurement on it
#: a stress test rather than a replica.
CENTER_SCALE = 0.56


def gen_embeddings(n: int, rng: np.random.Generator) -> pa.Table:
    centers = rng.normal(0.0, 1.0, (N_LABELS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, N_LABELS, size=n)
    vecs = CENTER_SCALE * centers[labels] + rng.normal(0.0, 1.0, (n, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs],
                pa.list_(pa.float32()),
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )


N_EVENT_TYPES = ["view", "click", "purchase", "error", "signup"]


def gen_events(n: int, n_users: int, rng: np.random.Generator) -> pa.Table:
    """Same shape as the driver's events table (observed at sf0.1:
    100 k rows over 2024-01-01..01-30, 1 500 users, 5 event types,
    uniform double value, tiny JSON props; ts stored timestamp[us]
    WITHOUT timezone — the driver's current physical encoding)."""
    start = np.datetime64("2024-01-01T00:00:00", "us")
    span_us = 30 * 24 * 3600 * 1_000_000
    ts = start + rng.integers(0, span_us, size=n).astype("timedelta64[us]")
    ts = np.sort(ts)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(
                rng.integers(0, n_users, size=n), pa.int64()
            ),
            "event_type": pa.array(
                [N_EVENT_TYPES[i] for i in rng.integers(0, 5, size=n)],
                pa.string(),
            ),
            "value": pa.array(
                np.round(rng.uniform(0, 150, size=n), 2), pa.float64()
            ),
            "props": pa.array(
                [f'{{"k": {k}}}' for k in rng.integers(0, 100, size=n)],
                pa.string(),
            ),
        }
    )


def generate(
    sf: float,
    out_root: str,
    skew: float | None = None,
    docs_only: bool = False,
) -> str:
    """``docs_only`` skips embeddings/events — the multi-million-doc
    band-geometry probes (BASELINE §6y) only read documents, and at
    sf60+ the events table alone would be 60 M rows of dead weight."""
    suffix = f"_skew{int(skew * 100)}" if skew is not None else ""
    out = os.path.join(out_root, f"sf{sf:g}{suffix}")
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(np.random.PCG64(42 + int(sf * 1000)))
    n_docs = int(50_000 * sf)
    n_vecs = int(20_000 * sf)
    n_events = int(1_000_000 * sf)
    pq.write_table(
        gen_documents(n_docs, rng, skew=skew),
        os.path.join(out, "documents.parquet"),
    )
    if docs_only:
        print(f"sf{sf:g}: {n_docs} docs (docs only) -> {out}")
        return out
    pq.write_table(
        gen_embeddings(n_vecs, rng), os.path.join(out, "embeddings.parquet")
    )
    pq.write_table(
        gen_events(n_events, int(15_000 * sf), rng),
        os.path.join(out, "events.parquet"),
    )
    print(
        f"sf{sf:g}: {n_docs} docs, {n_vecs} vectors, {n_events} events -> {out}"
    )
    return out


if __name__ == "__main__":
    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scale_data",
    )
    args = sys.argv[1:]
    skew: float | None = None
    if "--skew" in args:
        i = args.index("--skew")
        skew = float(args[i + 1])
        args = args[:i] + args[i + 2 :]
    docs_only = "--docs-only" in args
    if docs_only:
        args.remove("--docs-only")
    for arg in args or ["1"]:
        generate(float(arg), root, skew=skew, docs_only=docs_only)
