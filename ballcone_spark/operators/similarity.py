"""Embedding similarity search over the ``embeddings`` table
(``vec_id bigint, embedding array<float>, label int``).

- :func:`knn_bruteforce` — exact cosine top-k: broadcast the (small) query
  set against the corpus, JVM-side dot products via ``zip_with`` +
  ``aggregate`` (no Python in the loop), per-query top-k via the
  row_number window (WindowGroupLimit pushes k below the shuffle).
  At 100 TB corpus this is one scan: queries broadcast, no corpus shuffle
  except the final per-query k-row reduction.
- :func:`ann_lsh` — the scale path: random-hyperplane LSH. Hyperplane
  weights are derived deterministically from md5 (portable, seedless), so
  bucketing is reproducible. Candidates = same-bucket vectors (multi-probe
  over all planes-1 Hamming neighbors would extend recall); exact rerank
  inside buckets only.
- label centroids — groupBy + elementwise array mean, the building block
  for IVF-style coarse quantization (route queries to nearest centroid,
  search that partition only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window

from ballcone_spark.queries import _query, load_table

__all__ = ["cosine", "knn_bruteforce", "ann_lsh"]

_K = 5
_N_QUERIES = 5  # vec_id < 5
_N_PLANES = 8
_DIM = 64


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays, all in codegen."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def knn_bruteforce(emb: DataFrame, queries: DataFrame, k: int) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    ``queries`` is broadcast — the corpus never shuffles for the join; the
    only shuffle is the final top-k window on query_id (k rows per query
    survive the map side thanks to WindowGroupLimit)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = emb.alias("e").join(
        F.broadcast(q), F.col("query_id") != F.col("vec_id")
    )
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qe"), F.col("embedding")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
        .orderBy("query_id", "rank")
    )


@_query(
    "embeddings_knn_bruteforce",
    f"""
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
               FROM embeddings WHERE vec_id < {_N_QUERIES}),
    corpus AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
    scored AS (SELECT q.query_id, c.vec_id AS neighbor_id,
                      list_cosine_similarity(q.qe, c.e) AS sim
               FROM q, corpus c WHERE c.vec_id != q.query_id),
    ranked AS (SELECT *, row_number() OVER (
                   PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
               FROM scored)
    SELECT query_id, neighbor_id, round(sim, 4) AS sim, rank
    FROM ranked WHERE rank <= {_K} ORDER BY query_id, rank
    """,
)
def embeddings_knn_bruteforce(spark, sf_dir):
    """Exact cosine top-5 for query vectors vec_id<5 — the ANN baseline."""
    emb = _emb(spark, sf_dir)
    return knn_bruteforce(emb, emb.where(F.col("vec_id") < _N_QUERIES), _K)


@_query(
    "embeddings_label_centroids",
    """
    SELECT label, count(*) AS n,
           round(avg(CAST(embedding[1] AS DOUBLE)), 4) AS c0,
           round(avg(CAST(embedding[2] AS DOUBLE)), 4) AS c1,
           round(avg(CAST(embedding[3] AS DOUBLE)), 4) AS c2,
           round(avg(CAST(embedding[4] AS DOUBLE)), 4) AS c3
    FROM embeddings GROUP BY label ORDER BY label
    """,
)
def embeddings_label_centroids(spark, sf_dir):
    """Per-label centroid head (first 4 dims) — the IVF coarse-quantizer
    building block: one partial-aggregated groupBy, shuffle is
    O(labels × dims)."""
    e = _emb(spark, sf_dir)
    return (
        e.groupBy("label")
        .agg(
            F.count("*").alias("n"),
            *[
                F.round(F.avg(F.element_at("embedding", i + 1)), 4).alias(f"c{i}")
                for i in range(4)
            ],
        )
        .orderBy("label")
    )


def _plane_weight(p: int, d: int) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-1, 1): derived
    from md5 so any engine reproduces the same planes."""
    h = F.conv(F.substring(F.md5(F.lit(f"plane_{p}_dim_{d}")), 1, 8), 16, 10).cast(
        "long"
    )
    return (h % 2001 - 1000) / 1000.0


def ann_lsh(
    emb: DataFrame, queries: DataFrame, k: int, n_planes: int = _N_PLANES
) -> DataFrame:
    """Approximate top-k: random-hyperplane LSH bucketing + exact rerank
    within the query's bucket. Recall < 1 by design; the oracle check for
    this query is rows-only (approximation is engine-specific semantics,
    SURVEY.md §2 note on non-SQL-expressible ops)."""
    planes = [
        F.array(*[_plane_weight(p, d) for d in range(_DIM)]) for p in range(n_planes)
    ]

    def bucket(col: Column) -> Column:
        bits = [
            F.when(_dot(col, planes[p]) >= 0, F.lit(1 << p)).otherwise(F.lit(0))
            for p in range(n_planes)
        ]
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out

    corpus = emb.withColumn("bucket", bucket(F.col("embedding")))
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        bucket(F.col("embedding")).alias("bucket"),
    )
    cand = corpus.join(F.broadcast(q), "bucket").where(
        F.col("query_id") != F.col("vec_id")
    )
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        cosine(F.col("qe"), F.col("embedding")).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("sim"), "rank")
        .orderBy("query_id", "rank")
    )


@_query("embeddings_ann_lsh", None)  # rows-only: approximate by design
def embeddings_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate top-5 for vec_id<5 (same output shape as
    the brute-force baseline; compare recall offline)."""
    emb = _emb(spark, sf_dir)
    return ann_lsh(emb, emb.where(F.col("vec_id") < _N_QUERIES), _K)
