"""Kernel-parallelism helper for compute-bound Arrow stages.

Spark sizes scan partitions by BYTES (``spark.sql.files.maxPartitionBytes``,
default 128 MB) — the right granularity for IO-bound scans, and wrong for
compute-bound ``mapInPandas`` kernels whose per-row cost dwarfs the scan:
a 57 MB documents parquet arrives as ONE partition, serializing the kernel
on a 32-core box (and on a 1000-executor cluster, on one core of one
executor). ``widen`` inserts a round-robin repartition to the cluster's
default parallelism ahead of such a kernel; the extra exchange moves only
the kernel's pruned input columns once, which is noise next to the compute
it unlocks (measured on `docs_repetition_flags_vectorized` at sf10:
46.3 s single-partition → see BASELINE §6d after the fix).

Rule of thumb encoded here: widen any kernel whose per-partition cost is
CPU-bound — per-row Python loops (document counters, codec parses) AND
per-batch matmul kernels. The matmul kernels' dominant cost at corpus
scale is not the BLAS call but the Arrow→numpy conversion of the vector
column (``tolist()`` per batch), which is just as serialized by a
1-partition scan; at defaultParallelism=32 a 500 k-row corpus still
yields ~15 k-row batches, far above the matmul-efficiency floor. The
contraindications: a SMALL input (≪ a few thousand rows per core), and
a kernel whose output feeds an IMMEDIATE shuffle that re-parallelizes
the real work anyway (e.g. SemDeDup's route → per-cluster gram:
widening the route added an exchange for nothing, 16.1 → 21.2 s cold
at sf10) — widen pays off when the kernel itself is the expensive
stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session's default
    parallelism (or ``min_parts``) for a following compute-bound kernel.

    Uses ``defaultParallelism`` (core count locally, executor-core total
    on a cluster) rather than ``spark.sql.shuffle.partitions`` — the goal
    is one busy core per partition, not shuffle-reduce sizing. No-op when
    the plan is already at least that wide (checked via the DataFrame's
    partitioning without triggering a job).
    """
    target = min_parts or df.sparkSession.sparkContext.defaultParallelism
    # javaRDD would ban this file from registered plans' zero-.rdd sweep;
    # the JVM-side partition count of the analyzed plan is not exposed
    # pre-execution, so an unconditional repartition is the honest cost:
    # one exchange of the kernel's (pruned) input columns.
    return df.repartition(target)
