"""SemDeDup — semantic deduplication via cluster-then-pair (Abbas et
al. 2023, "SemDeDup: Data-efficient learning at web-scale through
semantic deduplication"; beyond-reference: the reference has no
embedding operators).

The web-scale trick is the clustering: all-pairs cosine over n vectors
is O(n²) and dead at 100 TB, but k-means-style clustering first makes
the pairing within-cluster only — O(Σ cᵢ²), which with k sized so that
cᵢ ≈ n/k is n²/k, and in practice (k ~ √n or larger) near-linear.
Spark shape:

1. route every vector to its nearest seed centroid — a broadcast of
   the K centroid rows against one corpus scan, map-side argmax (the
   same IVF routing the ANN family uses; zero shuffle beyond the tiny
   broadcast);
2. self-join ON the cluster key (hash-partitioned equi-join; each
   shuffle partition holds whole clusters, so skew is bounded by the
   largest cluster — exactly the knob k controls);
3. greedy keep-lowest-id: a vector is removed when any same-cluster
   neighbor with a LOWER vec_id sits at cosine >= TAU (the standard
   greedy approximation of SemDeDup's keep-one-per-group).

The oracle-able variant uses deterministic seed centroids (the K
lowest vec_ids, the same iters=0 derivation trick as the PQ recall
gate) so DuckDB replays the identical route→pair→remove pipeline;
the trained path swaps in :mod:`kmeans` codebooks unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ballcone_spark.operators.similarity import cosine
from ballcone_spark.queries import _query, load_table

__all__ = ["semantic_dedup_report"]

#: floor on the number of deterministic seed centroids (vec_id < K)
K_SEEDS = 8
#: target mean cluster size the adaptive K aims for — within-cluster
#: pairing costs O(Σ cᵢ²) ≈ n·TARGET, so pinning TARGET keeps the pair
#: stage LINEAR in n instead of n²/K_fixed
TARGET_CLUSTER = 256
#: within-cluster cosine at-or-above which a pair is a semantic dup —
#: 0.45 matches the non-vacuous threshold the embedding-cosine recall
#: gate already uses on this corpus (pairs exist at every SF)
TAU = 0.45


def adaptive_k(n_rows: int) -> int:
    """Seed count that pins mean cluster size ≈ TARGET_CLUSTER, so the
    within-cluster pair stage stays linear in corpus size (fixed K would
    make it n²/K — the same trap the hyperplane-LSH family fixed with
    its adaptive plane count). Floor K_SEEDS keeps small corpora — and
    with them every oracle-checked SF (500 vecs at sf0.01, 2 000 at
    sf0.1) — on the static oracle's exact K=8 replica; above
    K_SEEDS·TARGET_CLUSTER = 2 048 vectors K grows and the static
    oracle becomes an approximation of the same exact semantics (the
    dedup_embedding_cosine validity-domain class)."""
    return max(K_SEEDS, -(-n_rows // TARGET_CLUSTER))


def _assign(emb: DataFrame, k: int = K_SEEDS) -> DataFrame:
    """(vec_id, cluster_id, e): nearest-seed routing, ties broken on
    the lowest cluster_id so the argmax is deterministic per engine."""
    seeds = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cluster_id"), F.col("e").alias("c")
    )
    scored = emb.crossJoin(F.broadcast(seeds)).withColumn(
        "cos", cosine(F.col("e"), F.col("c"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.desc("cos"), F.asc("cluster_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "cluster_id", "e")
    )


def semantic_dedup_report(emb: DataFrame, k: int = K_SEEDS) -> DataFrame:
    """Per-cluster SemDeDup report: (cluster_id, n_vecs, n_removed,
    n_kept, removed_checksum). ``emb`` needs (vec_id, e: array<double>).

    removed_checksum = Σ removed vec_id — a value-level witness that the
    *same* vectors (not merely the same count) were removed."""
    assign = _assign(emb, k)
    a = assign.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("a_id"),
        F.col("e").alias("a_e"),
    )
    b = assign.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("b_id"),
        F.col("e").alias("b_e"),
    )
    removed = (
        a.join(b, "cluster_id")
        .where(F.col("a_id") < F.col("b_id"))
        .where(cosine(F.col("a_e"), F.col("b_e")) >= TAU)
        .select("cluster_id", F.col("b_id").alias("vec_id"))
        .distinct()
        .groupBy("cluster_id")
        .agg(
            F.count("*").alias("n_removed"),
            F.sum("vec_id").alias("removed_sum"),
        )
    )
    sizes = assign.groupBy("cluster_id").agg(F.count("*").alias("n_vecs"))
    return sizes.join(removed, "cluster_id", "left").select(
        "cluster_id",
        "n_vecs",
        F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
        (F.col("n_vecs") - F.coalesce("n_removed", F.lit(0))).alias("n_kept"),
        F.coalesce("removed_sum", F.lit(0)).alias("removed_checksum"),
    )


_SEM_ORACLE = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
seeds AS (SELECT vec_id AS cluster_id, e AS c FROM v WHERE vec_id < {K_SEEDS}),
scored AS (SELECT v.vec_id, s.cluster_id,
                  list_cosine_similarity(v.e, s.c) AS cos
           FROM v CROSS JOIN seeds s),
assign AS (
    SELECT vec_id, cluster_id FROM (
        SELECT vec_id, cluster_id,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cluster_id) AS rn
        FROM scored) WHERE rn = 1
),
av AS (SELECT a.vec_id, a.cluster_id, v.e FROM assign a JOIN v USING (vec_id)),
rem AS (
    SELECT cluster_id, count(*) AS n_removed, sum(vec_id) AS removed_sum
    FROM (SELECT DISTINCT a.cluster_id, b.vec_id
          FROM av a JOIN av b
            ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
          WHERE list_cosine_similarity(a.e, b.e) >= {TAU})
    GROUP BY cluster_id
)
SELECT n.cluster_id, n.n_vecs,
       COALESCE(r.n_removed, 0) AS n_removed,
       n.n_vecs - COALESCE(r.n_removed, 0) AS n_kept,
       COALESCE(r.removed_sum, 0) AS removed_checksum
FROM (SELECT cluster_id, count(*) AS n_vecs FROM assign GROUP BY cluster_id) n
LEFT JOIN rem r USING (cluster_id)
ORDER BY n.cluster_id
"""


@_query(
    "docs_semantic_dedup",
    _SEM_ORACLE,
    driver=False,  # registry at the 50 cap; oracle-checked locally
    cacheable=False,  # adaptive_k runs a count() at plan build
)
def docs_semantic_dedup(spark, sf_dir):
    """SemDeDup over the embeddings table with deterministic seed
    centroids: route → within-cluster cosine pairs → greedy
    keep-lowest-id, reported per cluster with a removed-id checksum.
    DuckDB replays the identical pipeline (exact for corpora ≤ 2 048
    vectors, where adaptive_k == the oracle's K=8 — all oracle-checked
    SFs; see :func:`adaptive_k`)."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    return semantic_dedup_report(emb, adaptive_k(emb.count())).orderBy(
        "cluster_id"
    )
