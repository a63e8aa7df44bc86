"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (one JVM); the configuration is written
so the same code lands well on a multi-executor cluster:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting —
  at 100 TB the static ``shuffle.partitions`` number is always wrong for
  some stage, AQE fixes it per-stage from observed map output sizes.
- UTC session timezone: the reference normalizes all event times to UTC at
  ingest (reference ballcone/syslog_protocol.py:67) and computes "today"
  in UTC (reference ballcone/core.py:68); pinning the session timezone
  makes ``to_date``/``date_trunc`` match that behavior and the DuckDB
  oracle.
- Arrow enabled: every pandas_udf / createDataFrame(pandas) path is
  Arrow-batched, never per-row pickled.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "tune_for_local"]


def get_spark(
    app_name: str = "ballcone_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` defaults to ``local[N]`` where N comes from
    ``$SPARK_GRAFT_CPUS`` (driver contract) or all cores. On a real
    cluster, pass ``master=None`` with ``spark.master`` preconfigured, or
    an explicit ``yarn``/``k8s`` master — the session defaults here are
    cluster-safe.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        # Local mode: a 200-partition shuffle of a tiny table is pure
        # scheduler overhead; AQE coalesces post-shuffle partitions but
        # the map-side task count still matters at small SF. Default low
        # here. r15 A/B (headline bench, 32 cores, sf0.1, quiet box):
        # 64 initial partitions + AQE coalescing read 1.302 s vs 1.214 s
        # at the default 8 — raising local partitions is neutral-to-
        # negative, so the low default stands. On a cluster, size
        # shuffles via $SPARK_GRAFT_SHUFFLE_PARTITIONS (or spark.conf)
        # so AQE coalesces DOWN from a generous start; skew-join
        # splitting stays on either way.
        env = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
        if env is not None:
            shuffle_partitions = int(env)
        else:
            shuffle_partitions = 8 if cpus == "*" else min(max(int(cpus), 1), 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # Ballcone-shaped data has no huge rows; bigger split size means
        # fewer, fuller input partitions at small SF while staying far
        # below executor memory at scale.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # Star-schema dims (region/nation/customer/supplier/part at any
        # SF that fits one executor) should broadcast; the 10 MB default
        # is conservative for 2026 executor memory. 64 MB is still tiny
        # against executor heaps and avoids SMJ shuffles on every
        # fact⋈dim join.
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # Timestamp physical-type armor. The driver's testdata has shipped
        # two different parquet timestamp encodings across rounds:
        # TIMESTAMP(NANOS) (vectorized reader rejects; this conf reads ns
        # as long and queries.load_table truncates to micros) and, since
        # r5, timestamp[us] WITHOUT timezone, which Spark 4 infers as
        # TIMESTAMP_NTZ. load_table detects per-file; engine expressions
        # must stay type-agnostic (interval comparisons, never
        # CAST(ts AS BIGINT) — see tests/test_plans.py NTZ/LTZ gate).
        # Set here once per session, not inside query builds (global conf
        # mutation mid-build is race-prone).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_for_local(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable local-mode tweaks to an existing session."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    return spark
