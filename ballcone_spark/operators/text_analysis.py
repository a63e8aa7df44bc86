"""Text-analysis operators over ``documents``: per-doc token statistics,
corpus quality profile, n-gram language-ID, and a binary-column pass
(multimodal plumbing smoke). All pure ``pyspark.sql.functions`` — no
Python UDFs; every query has a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballcone_spark.functions.text import (
    LANG_LEXICONS,
    avg_token_len,
    distinct_tokens,
    fingerprint,
    token_count,
    uniq_token_ratio,
)
from ballcone_spark.queries import _query, load_table

_DUCK_TOKENS = "string_split_regex(trim(text), '\\s+')"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


@_query(
    "docs_token_stats",
    f"""
    SELECT doc_id,
           len({_DUCK_TOKENS}) AS n_tokens,
           len(list_distinct({_DUCK_TOKENS})) AS n_uniq_tokens,
           round(length(regexp_replace(trim(text), '\\s+', '', 'g'))
                 * 1.0 / len({_DUCK_TOKENS}), 4) AS avg_token_len,
           md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents ORDER BY doc_id
    """,
)
def docs_token_stats(spark, sf_dir):
    """Per-doc token counting + fingerprint: whitespace tokenizer, distinct
    count, mean token length, portable md5 fingerprint. One narrow
    projection — no shuffle at all."""
    t = F.col("text")
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            token_count(t).alias("n_tokens"),
            F.size(distinct_tokens(t)).alias("n_uniq_tokens"),
            F.round(avg_token_len(t), 4).alias("avg_token_len"),
            fingerprint(t).alias("fp"),
        )
        .orderBy("doc_id")
    )


@_query(
    "docs_quality_by_source",
    f"""
    SELECT source,
           count(*) AS n_docs,
           round(avg(n_chars), 4) AS avg_chars,
           round(avg(len({_DUCK_TOKENS})), 4) AS avg_tokens,
           round(avg(len(list_distinct({_DUCK_TOKENS}))
                     * 1.0 / len({_DUCK_TOKENS})), 4) AS avg_uniq_ratio,
           sum(CASE WHEN n_chars < 200 THEN 1 ELSE 0 END) AS short_docs
    FROM documents GROUP BY source ORDER BY source
    """,
)
def docs_quality_by_source(spark, sf_dir):
    """Corpus quality profile per source: length, token, repetition and
    short-doc signals — the filter-threshold inputs of a training-data
    quality pipeline. Partial-aggregated groupBy on a low-card key."""
    t = F.col("text")
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.round(F.avg(token_count(t)), 4).alias("avg_tokens"),
            F.round(F.avg(uniq_token_ratio(t)), 4).alias("avg_uniq_ratio"),
            F.sum(F.when(F.col("n_chars") < 200, 1).otherwise(0)).alias("short_docs"),
        )
        .orderBy("source")
    )


def _duck_lang_scores() -> str:
    parts = []
    for lang, words in LANG_LEXICONS.items():
        arr = ", ".join(f"'{w}'" for w in words)
        parts.append(
            f"len(list_intersect(list_distinct({_DUCK_TOKENS}), [{arr}])) AS s_{lang}"
        )
    return ", ".join(parts)


def _duck_lang_case() -> str:
    langs = list(LANG_LEXICONS)
    clauses = []
    for i, lang in enumerate(langs[:-1]):
        rest = ", ".join(f"s_{o}" for o in langs[i + 1 :])
        greatest = f"greatest({rest})" if "," in rest else f"s_{langs[-1]}"
        clauses.append(f"WHEN s_{lang} >= {greatest} THEN '{lang}'")
    return "CASE " + " ".join(clauses) + f" ELSE '{langs[-1]}' END"


@_query(
    "docs_lang_id_confusion",
    f"""
    WITH scored AS (SELECT doc_id, lang, {_duck_lang_scores()} FROM documents),
    pred AS (SELECT lang, {_duck_lang_case()} AS predicted FROM scored)
    SELECT lang, predicted, count(*) AS n
    FROM pred GROUP BY lang, predicted ORDER BY lang, predicted
    """,
)
def docs_lang_id_confusion(spark, sf_dir):
    """Language-ID heuristic: score each doc against tiny per-language
    stopword lexicons (distinct-token ∩ lexicon), argmax with a fixed
    priority tie-break, then confusion matrix against the labeled lang.
    Lexicons are shared verbatim with the oracle."""
    t = F.col("text")
    langs = list(LANG_LEXICONS)
    df = _docs(spark, sf_dir).select(
        "lang",
        *[
            F.size(
                F.array_intersect(
                    distinct_tokens(t), F.array(*[F.lit(w) for w in LANG_LEXICONS[l]])
                )
            ).alias(f"s_{l}")
            for l in langs
        ],
    )
    pred = None
    for i, lang in enumerate(langs[:-1]):
        rest = [F.col(f"s_{o}") for o in langs[i + 1 :]]
        greatest = F.greatest(*rest) if len(rest) > 1 else rest[0]
        cond = F.col(f"s_{lang}") >= greatest
        pred = F.when(cond, lang) if pred is None else pred.when(cond, lang)
    pred = pred.otherwise(langs[-1])
    return (
        df.withColumn("predicted", pred)
        .groupBy("lang", "predicted")
        .agg(F.count("*").alias("n"))
        .orderBy("lang", "predicted")
    )


@_query(
    "docs_binary_meta",
    """
    SELECT doc_id, octet_length(encode(text)) AS n_bytes, md5(text) AS content_md5
    FROM documents ORDER BY doc_id
    """,
)
def docs_binary_meta(spark, sf_dir):
    """Opaque-binary column pass (multimodal plumbing smoke): treat the
    UTF-8 encoding of text as a binary payload, compute size + content
    hash — the same schema/plan shape used for image/audio bytes
    (see ballcone_spark.operators.multimodal for the decode stubs)."""
    b = F.encode(F.col("text"), "UTF-8")
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.length(b).cast("long").alias("n_bytes"),
            F.md5(b).alias("content_md5"),
        )
        .orderBy("doc_id")
    )
