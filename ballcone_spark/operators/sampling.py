"""Dataset-mixing samplers — the quota / token-budget primitives a
training-data pipeline applies after dedup and before tokenization
(beyond-reference, SURVEY.md §2.4 family; the reference has no corpus
operators at all — its closest surface is the LIMIT-ed scan at
reference ballcone/dao.py:236-249).

Both samplers are **deterministic**: rows are ordered per source by
``md5(salt || doc_id)`` — a seeded pseudo-random permutation both Spark
and DuckDB compute identically, so the sample is reproducible across
engines, runs, and cluster sizes (no ``rand()``, whose per-partition
streams change with the physical plan).

Scale design:

- **Quota sample** (top-N per source in hash order) plans as a
  rank-limit window — Spark 4's ``WindowGroupLimit`` pushes the limit
  below the shuffle, so each map task forwards at most N rows per
  source and the post-shuffle sort touches ≤ N·n_sources rows, however
  large the hot source is (plan-gated in tests/test_plans.py).
- **Token-budget sample** needs an exact per-source running sum — a
  window that would otherwise sort the WHOLE hot source in one
  partition at 100 TB. A provably lossless prune bounds it: token
  counts are ≥ 1, so the cumulative sum at hash-rank r is ≥ r, and any
  row with rank > budget can never fit — a ``row_number() <= budget``
  group-limit (WindowGroupLimit again) runs first, capping the exact
  cumsum window at ``budget`` rows per source regardless of source
  size. Two windows over the same (source, hash) ordering → one
  shuffle: the partial rank prune and the exact sum share partitioning.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ballcone_spark.queries import _query, load_table

__all__ = ["source_quota_sample", "token_budget_sample"]

_SALT = "mix-v1-"


def _mix_hash(doc_id: Column) -> Column:
    """Seeded deterministic permutation key; identical hex in DuckDB:
    ``md5(concat('<salt>', CAST(doc_id AS VARCHAR)))``."""
    return F.md5(F.concat(F.lit(_SALT), doc_id.cast("string")))


def source_quota_sample(docs: DataFrame, cap: int) -> DataFrame:
    """At most ``cap`` docs per source, chosen by the deterministic
    hash order: (source, doc_id) rows of the sample."""
    w = Window.partitionBy("source").orderBy(_mix_hash(F.col("doc_id")), "doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .select("source", "doc_id")
    )


def token_budget_sample(
    docs: DataFrame, budget: int, text_col: str = "text"
) -> DataFrame:
    """Greedy per-source fill to a token budget: walk docs in the
    deterministic hash order, keep each doc whose tokens still fit
    entirely (inclusive running sum ≤ budget). Whitespace tokens —
    the same counting rule both engines split identically."""
    n_tokens = F.size(F.split(F.col(text_col), " "))
    w = Window.partitionBy("source").orderBy(_mix_hash(F.col("doc_id")), "doc_id")
    pruned = (
        docs.withColumn("_tok", n_tokens)
        # lossless pre-prune: _tok >= 1 ⇒ cumsum at rank r is >= r, so
        # rank > budget can never satisfy cumsum <= budget. This is the
        # WindowGroupLimit-eligible window that bounds the exact one.
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= budget)
    )
    cum = F.sum("_tok").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        pruned.withColumn("_cum", cum)
        .where(F.col("_cum") <= budget)
        .select("source", "doc_id", F.col("_tok").alias("n_tokens"))
    )


_QUOTA_CAP = 13

_QUOTA_ORACLE = f"""
SELECT source, doc_id FROM (
    SELECT source, doc_id,
           row_number() OVER (
               PARTITION BY source
               ORDER BY md5(concat('{_SALT}', CAST(doc_id AS VARCHAR))), doc_id
           ) AS rn
    FROM documents
) WHERE rn <= {_QUOTA_CAP}
ORDER BY source, doc_id
"""


@_query(
    "docs_source_quota_sample",
    _QUOTA_ORACLE,
    driver=False,  # registry capped at 50; oracle-checked locally
)
def docs_source_quota_sample(spark, sf_dir):
    """Per-source quota sample (dataset mixing step 1: cap every
    domain's contribution). Deterministic hash order makes the sampled
    ids — not just the counts — engine-independent, so the oracle
    hash-checks the actual sample membership."""
    docs = load_table(spark, sf_dir, "documents")
    return source_quota_sample(docs, _QUOTA_CAP).orderBy("source", "doc_id")


_BUDGET = 600

_BUDGET_ORACLE = f"""
SELECT source, doc_id, n_tokens FROM (
    SELECT source, doc_id, n_tokens,
           sum(n_tokens) OVER (
               PARTITION BY source
               ORDER BY md5(concat('{_SALT}', CAST(doc_id AS VARCHAR))), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum
    FROM (
        SELECT source, doc_id,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
) WHERE cum <= {_BUDGET}
ORDER BY source, doc_id
"""


@_query(
    "docs_token_budget_mix",
    _BUDGET_ORACLE,
    driver=False,  # registry capped at 50; oracle-checked locally
)
def docs_token_budget_mix(spark, sf_dir):
    """Token-budget greedy fill per source (dataset mixing step 2:
    every domain gets the same token allowance). The oracle recomputes
    the identical greedy walk in DuckDB; note the oracle omits the
    rank<=budget pre-prune because DuckDB doesn't need it — its
    EQUIVALENCE to the unpruned query is the semantics the docstring
    proof establishes, and the hash-match is the check."""
    docs = load_table(spark, sf_dir, "documents")
    return token_budget_sample(docs, _BUDGET).orderBy("source", "doc_id")


# ------------------------------------------------------------------ #
# Temperature-based source resampling (mixing step 3)                #
# ------------------------------------------------------------------ #

#: fixed-point scale for the temperature weights — see
#: temperature_sample's determinism note.
_W_SCALE = 1_000_000


def temperature_sample(docs: DataFrame, total: int) -> DataFrame:
    """Temperature-weighted source mix at α = 0.5 (the up-weight-the-
    tail rule the multilingual/multi-source training literature uses:
    sample source s with probability ∝ count_s^α instead of raw
    proportions): per-source targets n_s = ⌊total · w_s⌋ (≥ 1, ≤ the
    source's size), filled deterministically in hash order.

    Determinism across engines is the subtle part: w_s = √c_s / Σ√c_s
    summed as doubles is ORDER-DEPENDENT (floating addition isn't
    associative, and neither engine guarantees an aggregation order),
    so a doc on the ⌊·⌋ boundary could flip between Spark and the
    oracle. The weights are therefore fixed-point: numerator
    ⌊√c_s · 1e6⌋ as BIGINT (IEEE sqrt and one multiply are exactly
    rounded — bit-identical everywhere), denominator an INTEGER sum
    (exact, order-independent), and the target one correctly-rounded
    double division of exact integers. Every step is reproducible
    bit-for-bit on any engine and any cluster size.

    Scale: one tiny aggregation (rows = n_sources), broadcast back;
    the per-source fill is the same WindowGroupLimit-eligible
    rank window as ``source_quota_sample``.
    """
    num = F.floor(F.sqrt(F.col("c").cast("double")) * _W_SCALE).cast("long")
    weights = (
        docs.groupBy("source")
        .agg(F.count("*").alias("c"))
        .withColumn("_num", num)
    )
    denom = weights.agg(F.sum("_num").alias("_denom"))
    targets = weights.crossJoin(F.broadcast(denom)).select(
        "source",
        F.least(
            F.col("c"),
            F.greatest(
                F.lit(1),
                F.floor(
                    (F.lit(int(total)) * F.col("_num")) / F.col("_denom")
                ),
            ),
        ).alias("_target"),
    )
    w = Window.partitionBy("source").orderBy(_mix_hash(F.col("doc_id")), "doc_id")
    return (
        docs.withColumn("_rn", F.row_number().over(w))
        # lossless literal pre-prune: every target is ≤ total, so the
        # rank window is WindowGroupLimit-eligible — each map task
        # forwards at most `total` rows per source before the exact
        # data-dependent target filter runs (a column comparison, which
        # the group-limit rewrite can't use directly).
        .where(F.col("_rn") <= F.lit(int(total)))
        .join(F.broadcast(targets), "source")
        .where(F.col("_rn") <= F.col("_target"))
        .select("source", "doc_id")
    )


_TEMP_TOTAL = 250

_TEMP_ORACLE = f"""
WITH weights AS (
    SELECT source, count(*) AS c,
           CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * {_W_SCALE})
                AS BIGINT) AS num
    FROM documents GROUP BY source
),
targets AS (
    SELECT source,
           least(c, greatest(1, CAST(floor(
               ({_TEMP_TOTAL} * num) / (SELECT sum(num) FROM weights)
           ) AS BIGINT))) AS target
    FROM weights
),
ranked AS (
    SELECT source, doc_id,
           row_number() OVER (
               PARTITION BY source
               ORDER BY md5(concat('{_SALT}', CAST(doc_id AS VARCHAR))),
                        doc_id
           ) AS rn
    FROM documents
)
SELECT source, doc_id
FROM ranked JOIN targets USING (source)
WHERE rn <= target
ORDER BY source, doc_id
"""


@_query(
    "docs_temperature_mix",
    _TEMP_ORACLE,
    driver=False,  # registry capped at 50; oracle-checked locally
)
def docs_temperature_mix(spark, sf_dir):
    """α=0.5 temperature resampling to a 250-doc mix — the oracle
    recomputes the fixed-point weights and the deterministic fill, and
    the hash-match checks the sampled membership, not just counts."""
    docs = load_table(spark, sf_dir, "documents")
    return temperature_sample(docs, _TEMP_TOTAL).orderBy("source", "doc_id")
