"""Structured Streaming ingest — S6 of SURVEY.md §2.1.

Replaces the reference's deque + 5-second flush timer
(reference ballcone/core.py:31-51 → dao.py:222-234) with a checkpointed
micro-batch stream:

    readStream (file/socket source)
      → parse_datagrams → enrich            (same transforms as batch)
      → foreachBatch: append Parquet partitioned by (service, date)
      → trigger(processingTime='5 seconds') — the reference's period

Durability upgrade, documented deliberately (SURVEY.md §3.1): the
reference buffers in memory and loses the buffer on crash
(at-most-once); checkpointed file-source streaming is exactly-once to
the sink. The reference's UDP transport is itself lossy, so a tiny
UDP→spool-file bridge (:mod:`ballcone_spark.sources.udp_bridge`) feeds
the file source — Spark has no UDP source and a bridge keeps the lossy
boundary outside the engine, where it was in the reference too.

Small-files note (SURVEY.md §7 hard part d): 5-second batches ×
(service, date) partitioning produce many small parquet files; each
micro-batch coalesces to 1 file per partition, and
:func:`compact_warehouse` rewrites a partition to target-sized files —
run it periodically (the reference has an analogous maintenance step in
tools/duck-upgrade.sh).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ballcone_spark.sources.enrich import enrich
from ballcone_spark.sources.syslog import parse_datagrams

__all__ = ["ingest_pipeline", "start_file_ingest", "compact_warehouse"]

_FACT_ORDER = [
    "service",
    "datetime",
    "host",
    "path",
    "status",
    "length",
    "generation_time",
    "referer",
    "ip",
    "country_iso_code",
    "platform_name",
    "platform_version",
    "browser_name",
    "browser_version",
    "is_robot",
]


def ingest_pipeline(
    raw: DataFrame, geoip_ranges: DataFrame | None = None
) -> DataFrame:
    """datagram lines → enriched fact rows (+ ``date`` partition col).
    Works identically on a batch or streaming DataFrame."""
    parsed = parse_datagrams(raw)
    enriched = enrich(parsed, geoip_ranges=geoip_ranges)
    return enriched.select(*_FACT_ORDER).withColumn(
        "date", F.to_date("datetime")
    )


def start_file_ingest(
    spark: SparkSession,
    spool_dir: str,
    warehouse_data_dir: str,
    checkpoint_dir: str,
    geoip_ranges: DataFrame | None = None,
    trigger_seconds: int = 5,
    available_now: bool = False,
):
    """Start the micro-batch ingest from a spool directory of datagram
    text files (written by the UDP bridge or any log shipper).

    Returns the StreamingQuery. ``available_now=True`` drains whatever
    is in the spool and stops — the test/backfill mode."""
    raw = spark.readStream.format("text").load(spool_dir)
    facts = ingest_pipeline(raw, geoip_ranges=geoip_ranges)

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.coalesce(1)
            .write.mode("append")
            .partitionBy("service", "date")
            .parquet(warehouse_data_dir)
        )

    writer = (
        facts.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .queryName("ballcone_ingest")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def compact_warehouse(
    spark: SparkSession,
    warehouse_data_dir: str,
    target_file_mb: int = 128,
) -> None:
    """Rewrite each (service, date) partition into target-sized files.
    Run periodically to fold micro-batch files together; readers see the
    swap atomically per partition directory."""
    if not os.path.isdir(warehouse_data_dir):
        return
    df = spark.read.parquet(warehouse_data_dir)
    tmp = warehouse_data_dir.rstrip("/") + "._compact_tmp"
    bytes_total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _d, fs in os.walk(warehouse_data_dir)
        for f in fs
    )
    n_files = max(1, bytes_total // (target_file_mb * 1024 * 1024))
    (
        df.repartition(int(n_files), "service", "date")
        .write.mode("overwrite")
        .partitionBy("service", "date")
        .parquet(tmp)
    )
    import shutil

    shutil.rmtree(warehouse_data_dir)
    os.rename(tmp, warehouse_data_dir)
