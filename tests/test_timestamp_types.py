"""Timestamp physical-type gate.

The driver's testdata parquet has shipped two different timestamp
encodings across rounds — TIMESTAMP(NANOS) and, since round 5,
timestamp[us] WITHOUT timezone metadata, which Spark 4 infers as
TIMESTAMP_NTZ. The switch broke `events_session_overlaps` at analysis
time (CAST(ntz AS BIGINT) is illegal). This gate rebuilds the testdata
in BOTH flavors (NTZ and UTC/LTZ) and plan-builds every registered
query against each: analysis errors are what bit, so forcing analysis
is enough — no execution needed.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as entry_mod

SRC = "/root/testdata/sf0.001"


def _rewrite_timestamps(src: str, dst: str, tz: str | None) -> None:
    """Copy a parquet file, casting every timestamp column to
    timestamp[us] with the given tz (None → NTZ, "UTC" → LTZ)."""
    t = pq.read_table(src)
    fields, arrays = [], []
    for f, col in zip(t.schema, t.columns):
        if pa.types.is_timestamp(f.type):
            typ = pa.timestamp("us", tz=tz)
            col = col.cast(typ)
            f = pa.field(f.name, typ, nullable=f.nullable)
        fields.append(f)
        arrays.append(col)
    pq.write_table(pa.table(arrays, schema=pa.schema(fields)), dst)


@pytest.fixture(scope="session", params=["ntz", "ltz"])
def flavored_sf_dir(request, tmp_path_factory) -> str:
    """A full sf0.001 table dir whose timestamp columns are all NTZ or
    all LTZ. Non-timestamp tables are symlinked, not copied."""
    tz = None if request.param == "ntz" else "UTC"
    out = tmp_path_factory.mktemp(f"sf_{request.param}")
    for fname in sorted(os.listdir(SRC)):
        src = os.path.join(SRC, fname)
        dst = str(out / fname)
        schema = pq.read_schema(src)
        if any(pa.types.is_timestamp(f.type) for f in schema):
            _rewrite_timestamps(src, dst, tz)
        else:
            os.symlink(src, dst)
    return str(out)


def test_all_registered_queries_analyze_on_both_timestamp_types(
    spark, flavored_sf_dir
):
    """Every queries() builder must produce an analyzable plan whether
    the parquet timestamps read as TIMESTAMP or TIMESTAMP_NTZ — engine
    expressions must stay type-agnostic (interval comparisons, never
    CAST(ts AS BIGINT))."""
    offenders = {}
    for name, fn in entry_mod.queries().items():
        try:
            df = fn(spark, flavored_sf_dir)
            df.columns  # force analysis
            df._jdf.queryExecution().analyzed()
        except Exception as e:  # noqa: BLE001 - collect all offenders
            offenders[name] = f"{type(e).__name__}: {e}"
    assert offenders == {}, f"queries broken on {flavored_sf_dir}: {offenders}"
