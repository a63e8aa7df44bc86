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
    Run periodically to fold micro-batch files together.

    Guarantee (and its limits, stated honestly): the swap is atomic **per
    partition directory** — each (service, date) dir is snapshotted,
    rewritten to a sibling tmp dir, and swapped with two ``os.rename``
    calls, so a reader never observes a missing or half-written partition
    (POSIX rename is atomic; between the two renames a reader can see the
    partition momentarily absent — the old all-at-once variant deleted
    the ENTIRE data dir before renaming, a much wider window that also
    silently discarded any micro-batch appended after the snapshot
    read). Appends that land in a partition dir *after* its snapshot are
    preserved: the swap is skipped for that partition when new files are
    detected (the stream owns the dir; compaction retries it next run).
    For a shared production lake use a table format with a transaction
    log; for this engine's single-writer spool the per-partition swap +
    skip-on-conflict is exact."""
    if not os.path.isdir(warehouse_data_dir):
        return
    root = warehouse_data_dir.rstrip("/")
    target_bytes = target_file_mb * 1024 * 1024
    import shutil

    for svc_entry in sorted(os.scandir(root), key=lambda e: e.path):
        if not svc_entry.is_dir() or not svc_entry.name.startswith("service="):
            continue
        for date_entry in sorted(os.scandir(svc_entry.path), key=lambda e: e.path):
            if not date_entry.is_dir() or not date_entry.name.startswith("date="):
                continue
            part_dir = date_entry.path
            snapshot = sorted(
                f for f in os.listdir(part_dir) if f.endswith(".parquet")
            )
            if len(snapshot) <= 1:
                continue  # already compact
            part_bytes = sum(
                os.path.getsize(os.path.join(part_dir, f)) for f in snapshot
            )
            n_files = max(1, part_bytes // target_bytes)
            tmp = part_dir + "._compact_tmp"
            old = part_dir + "._compact_old"
            shutil.rmtree(tmp, ignore_errors=True)
            shutil.rmtree(old, ignore_errors=True)
            (
                spark.read.parquet(
                    *[os.path.join(part_dir, f) for f in snapshot]
                )
                .coalesce(int(n_files))
                .write.mode("overwrite")
                .parquet(tmp)
            )
            now = sorted(
                f for f in os.listdir(part_dir) if f.endswith(".parquet")
            )
            if now != snapshot:
                # a micro-batch appended mid-compaction: keep its data,
                # drop this rewrite, retry on the next run
                shutil.rmtree(tmp, ignore_errors=True)
                continue
            os.rename(part_dir, old)
            os.rename(tmp, part_dir)
            shutil.rmtree(old)
