"""Syslog/nginx ingest parsing — S1–S3 of SURVEY.md §2.1 — as pure
DataFrame transforms.

The reference receives one UDP datagram per HTTP request:
``<PRI>... : {json}`` (nginx ``log_format ballcone_json_escape`` →
syslog, reference ballcone/syslog_protocol.py:20,32-49 and
README.md:104-118). Parsing here is expressed once as batch transforms
and reused verbatim by the streaming pipeline (a Structured Streaming
plan accepts the same transformations) — the malformed-input policy is
"drop, never crash" exactly like the reference (log-and-drop at
syslog_protocol.py:33-59), implemented as filters so bad rows simply
leave the pipeline; :func:`parse_stats` counts what was dropped at each
stage for observability.

Scale: every step is a codegen'd projection/filter over the raw line —
no Python, no shuffle. At 100 TB of logs this pipeline is scan-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ballcone_spark.schema import SYSLOG_JSON_SCHEMA, VALID_SERVICE_RE

__all__ = [
    "SYSLOG_MESSAGE_RE",
    "extract_message",
    "parse_datagrams",
    "parse_stats",
]

#: The reference's syslog frame regex (syslog_protocol.py:20), anchored.
#: regexp_extract returns '' on no-match; '' marks a malformed frame.
SYSLOG_MESSAGE_RE = r"^<[0-9]{1,3}>.*?: (.+)$"


def extract_message(raw: Column) -> Column:
    """Strip the syslog PRI/header, keep the JSON payload."""
    return F.regexp_extract(raw, SYSLOG_MESSAGE_RE, 1)


def parse_datagrams(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Raw datagram lines → typed, validated Entry-shaped rows.

    Stages (each mirrors a reference drop point):
      1. syslog header strip (drop frames that don't match — S1);
      2. ``from_json`` with the nginx payload schema (malformed JSON →
         null struct → dropped — S2; Spark's PERMISSIVE mode maps exactly
         onto the reference's try/except drop);
      3. ``service`` is normalized exactly like the reference —
         strip + lowercase (syslog_protocol.py:55:
         ``content['service'].strip().lower()``) — *then* validated
         against ``\\A[\\w]+\\Z`` (core.py:15) — S2. Without the
         normalization, 'Example' and 'example' would split one site
         across two partitions and ' example ' (valid after strip in the
         reference) would be dropped;
      4. field coercions — S3: ISO8601 (any offset) → UTC timestamp
         (session TZ is pinned UTC), URL-decoded path, smallint status,
         int length, double generation_time, empty referrer → NULL.

    Output columns: service + the 14 Entry fields (user_agent retained
    for the enrichment stage downstream).
    """
    msg = raw.withColumn("_msg", extract_message(F.col(value_col))).where(
        F.col("_msg") != ""
    )
    j = msg.withColumn("_j", F.from_json("_msg", SYSLOG_JSON_SCHEMA)).where(
        F.col("_j").isNotNull()
    )
    svc = F.lower(F.trim(F.col("_j.service")))
    valid = j.where(
        svc.isNotNull()
        & svc.rlike(VALID_SERVICE_RE.replace("\\A", "^").replace("\\Z", "$"))
    )
    # try_to_timestamp: ANSI mode (Spark 4 default) makes to_timestamp
    # THROW on malformed input; the drop-don't-crash policy needs NULL
    ts = F.try_to_timestamp(F.col("_j.date"))
    return (
        valid.where(ts.isNotNull())
        .select(
            svc.alias("service"),
            ts.alias("datetime"),
            F.col("_j.host").alias("host"),
            # try_url_decode: url_decode THROWS (CANNOT_DECODE_URL) on any
            # malformed percent-escape, and request paths are
            # attacker-controlled — one '/a%zz' datagram would abort the
            # micro-batch and, with a checkpoint, poison-pill the stream
            # retrying it forever. NULL-on-failure + fall back to the raw
            # path (the reference's urllib.parse.unquote never raises).
            F.coalesce(
                F.try_url_decode(F.col("_j.path")), F.col("_j.path")
            ).alias("path"),
            # try_cast, not cast: under ANSI (Spark 4 default) a single
            # malformed numeric string would fail the whole micro-batch
            F.col("_j.status").try_cast("smallint").alias("status"),
            F.col("_j.length").try_cast("int").alias("length"),
            # nginx's $request_time arrives in the *_milli field but is
            # seconds — the reference stores it as-is (syslog_protocol.py:78)
            F.col("_j.generation_time_milli").cast("double").alias(
                "generation_time"
            ),
            F.when(F.col("_j.referrer") == "", None)
            .otherwise(F.col("_j.referrer"))
            .alias("referer"),
            F.col("_j.ip").alias("ip"),
            F.col("_j.user_agent").alias("user_agent"),
        )
    )


def parse_stats(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Drop accounting: one row with counts per pipeline stage — the
    observability the reference gets from log lines."""
    msg = extract_message(F.col(value_col))
    msg_ok = msg != ""
    # from_json maps unparseable input to an all-null struct, so JSON
    # validity is probed separately with try_parse_json (NULL on bad JSON)
    json_ok = msg_ok & F.try_parse_json(msg).isNotNull()
    j = F.from_json(msg, SYSLOG_JSON_SCHEMA)
    svc = F.lower(F.trim(j["service"]))
    svc_ok = svc.isNotNull() & svc.rlike(r"^[\w]+$")
    ts_ok = F.try_to_timestamp(j["date"]).isNotNull()
    return raw.agg(
        F.count("*").alias("received"),
        F.sum(F.when(~msg_ok, 1).otherwise(0)).alias("bad_frame"),
        F.sum(F.when(msg_ok & ~json_ok, 1).otherwise(0)).alias("bad_json"),
        F.sum(F.when(json_ok & ~svc_ok, 1).otherwise(0)).alias("bad_service"),
        F.sum(F.when(json_ok & svc_ok & ~ts_ok, 1).otherwise(0)).alias(
            "bad_timestamp"
        ),
        F.sum(F.when(json_ok & svc_ok & ts_ok, 1).otherwise(0)).alias("parsed"),
    )
