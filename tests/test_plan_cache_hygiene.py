"""r16 plan-cache hygiene (ADVICE r15): directory-style parquet
fingerprints must see per-file changes, and a fingerprint-miss
replacement (or an explicit eviction) must release the superseded
plan's materialized localCheckpoint blocks instead of leaving them to
GC timing."""

from __future__ import annotations

import os
import time

from ballcone_spark.queries import (
    _PLAN_CACHE,
    _plan_cached,
    _table_fingerprints,
    _unpersist_plan_checkpoints,
    evict_plan,
)


def test_directory_fingerprint_sees_nested_file_change(tmp_path):
    d = tmp_path / "documents.parquet"
    d.mkdir()
    part = d / "part-0000.snappy.parquet"
    part.write_bytes(b"a" * 64)
    fp1 = _table_fingerprints(str(tmp_path), ("documents",))
    # same-size in-place rewrite with a bumped mtime — the case the dir
    # entry's own stat misses entirely
    time.sleep(0.01)
    part.write_bytes(b"b" * 64)
    os.utime(part)
    fp2 = _table_fingerprints(str(tmp_path), ("documents",))
    assert fp1 != fp2
    # a new part file changes it too
    (d / "part-0001.snappy.parquet").write_bytes(b"c")
    assert _table_fingerprints(str(tmp_path), ("documents",)) != fp2


def _n_persistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def test_replacement_unpersists_superseded_checkpoints(spark, tmp_path):
    src = tmp_path / "t.parquet"
    src.write_bytes(b"")

    def build(sp, sf_dir):
        df = sp.range(100).localCheckpoint(eager=False)
        df.count()  # materialize the blocks
        return df

    fn = _plan_cached("_hygiene_probe", build, cacheable=("t",))
    base = _n_persistent(spark)
    fn(spark, str(tmp_path))
    assert _n_persistent(spark) == base + 1
    # unchanged fingerprint: cache hit, no new RDD
    fn(spark, str(tmp_path))
    assert _n_persistent(spark) == base + 1
    # data change: the superseded checkpoint must be RELEASED, not
    # merely superseded — one live RDD after, not two
    time.sleep(0.01)
    src.write_bytes(b"x")
    fn(spark, str(tmp_path))
    assert _n_persistent(spark) == base + 1
    # explicit eviction releases the rest
    assert evict_plan("_hygiene_probe") == 1
    assert _n_persistent(spark) == base
    assert not [k for k in _PLAN_CACHE if k[2] == "_hygiene_probe"]


def test_unpersist_walks_only_logical_rdd_leaves(spark):
    # a plain scan-backed frame has no checkpoint leaves — the helper
    # must be a no-op, never an error
    df = spark.range(10)
    _unpersist_plan_checkpoints(df)
    assert df.count() == 10
