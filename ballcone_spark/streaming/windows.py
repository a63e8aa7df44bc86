"""Streaming analytics operators: event-time windows with watermarks,
native session windows, and a custom stateful operator.

The reference has no event-time windowing at all — late data lands
correctly only because it aggregates at read time (SURVEY.md §1.3).
These operators provide the ingest-time (streaming) equivalents of the
read-time queries, with explicit late-data semantics:

- :func:`windowed_visits` — Q4 (daily visits) as a watermarked tumbling
  window: counts finalize ``watermark`` after the day closes; later rows
  are dropped *by the stream* but still land in the warehouse via the
  ingest sink, where read-time queries see them (both worlds documented).
- :func:`sliding_traffic` — short sliding windows for live dashboards.
- :func:`session_counts` — Spark's native ``session_window`` (gap-based,
  the streaming twin of the ``events_sessionization`` batch query).
- :func:`running_user_totals` — custom stateful op via
  ``applyInPandasWithState``: durable per-key running aggregates that
  survive restarts through the checkpoint (the pattern for any operator
  Spark lacks natively: counters with TTL, CEP-ish flags, dedup-by-key).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "windowed_visits",
    "sliding_traffic",
    "session_counts",
    "running_user_totals",
    "dedup_stream",
]


def windowed_visits(
    events: DataFrame,
    ts_col: str = "datetime",
    key: str = "service",
    window_size: str = "1 day",
    watermark: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time visit counts per key with late-data bound."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_size).alias("w"), key)
        .agg(F.count("*").alias("visits"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key,
            "visits",
        )
    )


def sliding_traffic(
    events: DataFrame,
    ts_col: str = "datetime",
    window_size: str = "5 minutes",
    slide: str = "1 minute",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding-window request rate (live-dashboard shape)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_size, slide).alias("w"))
        .agg(F.count("*").alias("requests"))
        .select(F.col("w.start").alias("window_start"), "requests")
    )


def session_counts(
    events: DataFrame,
    ts_col: str = "datetime",
    key: str = "ip",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessions per key via the native session_window operator
    (state merges adjacent windows; closes ``gap`` after the last event,
    finalized by the watermark)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("s"), key)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            key,
            "n_events",
        )
    )


_TOTALS_OUT_SCHEMA = "key string, total bigint, batch_events bigint"
_TOTALS_STATE_SCHEMA = "total bigint"


def _totals_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n = 0
    for pdf in pdfs:
        n += len(pdf)
    (prev,) = state.get if state.exists else (0,)
    total = prev + n
    state.update((total,))
    yield pd.DataFrame({"key": [key[0]], "total": [total], "batch_events": [n]})


def running_user_totals(
    events: DataFrame, key_col: str = "service"
) -> DataFrame:
    """Durable per-key running event totals (custom stateful operator).

    Arrow-batched state function; state is one bigint per key, persisted
    in the checkpoint — totals continue across restarts. Output mode
    must be ``update``."""
    return (
        events.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .applyInPandasWithState(
            _totals_fn,
            outputStructType=_TOTALS_OUT_SCHEMA,
            stateStructType=_TOTALS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def dedup_stream(
    events: DataFrame,
    keys: list[str],
    ts_col: str = "datetime",
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: keep the first record per ``keys`` within
    the watermark horizon (``dropDuplicatesWithinWatermark``). The
    streaming twin of the batch hash-groupBy dedup: state per key is
    dropped once the watermark passes it, so memory is bounded by the
    key arrival rate × horizon — the property that makes exact streaming
    dedup viable at ingest scale (a duplicate datagram delivered twice
    by UDP, a replayed spool file, a re-sent batch)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )
