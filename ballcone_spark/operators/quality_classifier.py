"""In-Spark trained quality classifier — logistic regression fit by
batch gradient descent over aggregates, the FineWeb-style *learned*
quality filter (their educational-quality classifier distills labels
into a smooth scorer; here the hand-written curation gate is the label
source being distilled). Beyond-reference (the reference has no corpus
operators).

Why distill a rule the pipeline already has: a hard gate is brittle at
its thresholds and unrankable inside the kept set; the distilled scorer
gives a calibrated, SMOOTH score that (a) ranks docs for budgeted
selection (compose with `docs_token_budget_mix`) and (b) generalizes
when the label source is upgraded (human labels, LLM judgments) with
zero pipeline changes — swap the label column, retrain.

Scale contract (the kmeans/BPE iterative pattern):

- the ONLY corpus-scale work per iteration is one aggregate producing
  d+1 partial sums (map-side combined — the shuffle is d+1 doubles per
  partition, not rows);
- the feature frame is ``localCheckpoint``-ed ONCE and every round
  reads the checkpoint (`tests/test_plans.py::
  test_iterative_loops_read_checkpointed_input` pattern) — without the
  barrier each round re-runs the upstream feature projection;
- weights live on the driver: d+1 floats, bounded by construction —
  the k×d kmeans-centroid collect license.

Determinism: with fixed iterations/learning rate and Spark's stable
partition order the training is reproducible; the pytest replica
re-runs the identical GD in numpy from the collected (X, y) and the
weights must agree to float tolerance (summation order is the only
difference).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ballcone_spark.queries import _query, load_table

__all__ = [
    "quality_features",
    "train_quality_classifier",
    "score_quality",
]

#: GD rounds × learning rate — picked empirically on the real corpus
#: (unstandardized feature norms ~8 put the stable step near 0.2; at
#: lr 1.0 the descent oscillates and the loss RISES): lr 0.2 × 200
#: rounds takes the log-loss 0.693 → 0.255 with clean class separation
N_ITERS = 200
#: learning rate for the (1/n)-scaled batch gradient
LR = 0.2
#: feature column names in training order (bias is implicit w[0])
FEATURES = ["f_log_tok", "f_uniq_ratio", "f_log_chars"]


def quality_features(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, source, lang, f_log_tok, f_uniq_ratio, f_log_chars,
    label) — JVM-expression features plus the weak label being
    distilled: 1 iff the doc passes the curation pipeline's quality
    gate (n_chars ≥ 100, n_tokens ≥ 20, uniq_ratio ≥ 0.3). One scan,
    no shuffle.

    NULL convention (ADVICE r9): rows with NULL ``n_chars`` are
    filtered alongside NULL text — otherwise f_log_chars is NULL,
    ``F.sum`` silently skips the row in every GD gradient while
    ``n = d.count()`` still includes it (scaling bias), and the NULL
    score lands in a NULL decile group in the report."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_tok = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    uniq_ratio = n_uniq / n_tok
    return docs.where(
        F.col(text_col).isNotNull() & F.col("n_chars").isNotNull()
    ).select(
        "doc_id",
        "source",
        "lang",
        F.log1p(n_tok.cast("double")).alias("f_log_tok"),
        uniq_ratio.alias("f_uniq_ratio"),
        F.log1p(F.col("n_chars").cast("double")).alias("f_log_chars"),
        F.when(
            (F.col("n_chars") >= 100)
            & (n_tok >= 20)
            & (uniq_ratio >= 0.3),
            1.0,
        )
        .otherwise(0.0)
        .alias("label"),
    )


def _z(w: list[float]):
    """w·x as a codegen expression (bias + FEATURES dot)."""
    z = F.lit(w[0])
    for j, c in enumerate(FEATURES):
        z = z + F.lit(w[j + 1]) * F.col(c)
    return z


def _round_input(d: DataFrame) -> DataFrame:
    """Seam for the iterative-loop plan gate (the kmeans spy pattern):
    tests patch this to assert each GD round reads the CHECKPOINTED
    feature frame, never the caller's upstream lineage."""
    return d


def train_quality_classifier(
    feats: DataFrame, iters: int = N_ITERS, lr: float = LR
) -> list[float]:
    """Fit [bias, w_f1, ...] by full-batch GD: per round ONE aggregate
    of the per-row gradient components (map-side combined), a bounded
    (d+1)-float collect, a driver-side weight update. ``feats`` is
    checkpointed once up front; every round's aggregate reads the
    checkpoint, never the upstream projection."""
    d = feats.select("label", *FEATURES).localCheckpoint(eager=True)
    n = d.count()
    if n == 0:
        raise ValueError("empty feature frame")
    w = [0.0] * (len(FEATURES) + 1)
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w)))
        err = p - F.col("label")
        row = _round_input(d).agg(
            F.sum(err).alias("g0"),
            *[
                F.sum(err * F.col(c)).alias(f"g{j + 1}")
                for j, c in enumerate(FEATURES)
            ],
        ).first()
        w = [w[j] - lr * row[f"g{j}"] / n for j in range(len(w))]
    return w


def score_quality(
    docs: DataFrame, w: list[float], text_col: str = "text"
) -> DataFrame:
    """The APPLY half: per-doc sigmoid score under trained weights —
    a pure projection (scan → codegen math), no shuffle, composable
    with any downstream rank/sample/mix stage."""
    feats = quality_features(docs, text_col)
    return feats.select(
        "doc_id",
        "source",
        "lang",
        "label",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(w)))).alias("score"),
    )


def quality_classifier_report(
    docs: DataFrame, train_sample_pct: int = 100
) -> DataFrame:
    """(score_decile, n_docs, n_gate_pass) — train on the corpus, score
    the corpus, bucket scores into deciles against the gate label: the
    calibration view that shows the distilled scorer separates (pass
    mass concentrates in high deciles). Integer outputs only — stable
    under float scoring as long as no doc's score sits ON a decile
    boundary, which the margin assertions in the pytest pin.

    ``train_sample_pct`` is the production-scale knob: at 100 TB you
    train the 4-weight model on a deterministic hash sample (GD cost is
    iters × sample passes, and a distillation this small saturates far
    below the corpus size) and still SCORE the full corpus — scoring is
    the one-pass projection. The registered query keeps 100 so the
    pytest replica sees the exact training set."""
    feats = quality_features(docs)
    train = feats
    if train_sample_pct < 100:
        bucket = (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("long")
            % 100
        )
        train = feats.where(bucket < train_sample_pct)
    w = train_quality_classifier(train)
    scored = score_quality(docs, w)
    decile = F.least(F.floor(F.col("score") * 10).cast("int"), F.lit(9))
    return (
        scored.groupBy(decile.alias("score_decile"))
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("label").cast("long").alias("n_gate_pass"),
        )
        .orderBy("score_decile")
    )


@_query(
    "docs_quality_classifier_report",
    None,  # weights come from iterative GD — not SQL-expressible; the
    # pytest replays the identical descent in numpy from the collected
    # (X, y) and pins the weights to float tolerance, plus separation
    # and loss-decrease properties
    driver=False,
    cacheable=False,  # training runs driver-side jobs at build time
)
def docs_quality_classifier_report(spark, sf_dir):
    """Learned quality filter, end to end: distill the curation gate
    into a logistic scorer (aggregate-based GD, one bounded collect per
    round) and report per-decile calibration against the gate label."""
    return quality_classifier_report(load_table(spark, sf_dir, "documents"))
