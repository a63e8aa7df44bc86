"""Streaming corpus-drift monitor — per-micro-batch LM perplexity
against a frozen reference model (beyond-reference; the data-drift
alarm a production ingest pipeline runs ahead of its training-data
sink: when a feed's language distribution shifts — spam burst, new
locale, encoding breakage — batch perplexity under the reference model
jumps long before any downstream metric notices).

Shape: the reference :func:`~ballcone_spark.operators.lm_quality
.bigram_model` is trained ONCE on a trusted corpus and frozen; each
micro-batch is scored by one broadcast gram join + one aggregate
inside ``foreachBatch`` (the model is a few MB of (gram, logp) rows —
broadcast once per batch, no state store needed because the monitor is
stateless per batch by design). Out-of-vocabulary transitions score at
a floor log-probability (the model's min logp minus ln 2 by default) —
unseen text must look EXPENSIVE, not free, or drift would lower
perplexity. Results append as tiny per-batch rows; the alarm is a
relative band around the baseline perplexity.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballcone_spark.operators.repetition import _ngrams

__all__ = ["batch_ppl", "start_drift_monitor"]


def batch_ppl(
    batch: DataFrame, model: DataFrame, oov_logp: float, text_col: str = "text"
) -> DataFrame:
    """One-row (n_docs, n_bigrams, n_oov, ppl) summary of a document
    batch under a frozen (g, logp) model; OOV transitions score
    ``oov_logp``."""
    w = F.split(F.col(text_col), " ")
    bg = batch.select(F.explode(_ngrams(w, 2)).alias("g"))
    scored = bg.join(F.broadcast(model), "g", "left").select(
        F.coalesce("logp", F.lit(oov_logp)).alias("logp"),
        F.col("logp").isNull().cast("int").alias("oov"),
    )
    n_docs = batch.count()
    return scored.agg(
        F.lit(n_docs).alias("n_docs"),
        F.count("*").alias("n_bigrams"),
        # zero-bigram batch: SUM over no rows is NULL — report 0 OOV;
        # ppl stays NULL (nothing scorable), drift is forced false
        # downstream
        F.coalesce(F.sum("oov"), F.lit(0)).alias("n_oov"),
        F.round(F.exp(-F.avg("logp")), 4).alias("ppl"),
    )


def default_oov_logp(model: DataFrame) -> float:
    """Floor for unseen transitions: the model's minimum log-prob minus
    ln 2 — strictly worse than anything in-distribution."""
    row = model.agg(F.min("logp").alias("m")).collect()[0]
    return float(row["m"]) - math.log(2.0)


def start_drift_monitor(
    spark: SparkSession,
    stream: DataFrame,
    model: DataFrame,
    baseline_ppl: float,
    out_dir: str,
    checkpoint_dir: str,
    rel_band: float = 0.25,
    oov_logp: float | None = None,
    text_col: str = "text",
):
    """Attach the drift monitor to a streaming document DataFrame.

    Appends one row per micro-batch to ``out_dir`` (parquet):
    (batch_id, n_docs, n_bigrams, n_oov, ppl, drift) where ``drift``
    is true when batch perplexity leaves ``baseline_ppl ± rel_band``
    (relative). A non-empty batch whose docs are all <2 tokens has
    ``n_bigrams = 0``: the model has nothing to score, so ``ppl`` is
    written as NULL and ``drift`` as an explicit ``false`` (ADVICE r6:
    a NULL drift flag made the batch invisible both to
    ``drift = true`` alarms and to ``NOT drift`` all-quiet queries). The frozen model is materialized to a local literal-free
    DataFrame once; `foreachBatch` re-broadcasts it per batch — the
    exactly-once story is the sink file commit via the checkpointed
    batch_id, same as the ingest sink."""
    model = model.localCheckpoint()  # freeze: never recompute per batch
    floor = default_oov_logp(model) if oov_logp is None else oov_logp
    lo, hi = baseline_ppl * (1 - rel_band), baseline_ppl * (1 + rel_band)

    def _process(batch: DataFrame, batch_id: int) -> None:
        if not batch.take(1):
            return
        (
            batch_ppl(batch, model, floor, text_col)
            .select(
                F.lit(batch_id).alias("batch_id"),
                "n_docs",
                "n_bigrams",
                "n_oov",
                "ppl",
                # n_bigrams = 0 → ppl NULL; the guard makes drift an
                # explicit false (false & NULL = false), never NULL
                (
                    (F.col("n_bigrams") > 0)
                    & ((F.col("ppl") < lo) | (F.col("ppl") > hi))
                ).alias("drift"),
            )
            .write.mode("append")
            .parquet(out_dir)
        )

    return (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
