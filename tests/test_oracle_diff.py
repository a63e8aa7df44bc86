"""Differential correctness: run every registered query through Spark AND
its DuckDB oracle on the same parquet files, compare row-for-row — a local
replica of the driver's t2 gate (sorted columns, order-insensitive rows)."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod
from ballcone_spark.queries import EXTRA_QUERIES, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")

#: Driver-exported queries PLUS the demoted EXTRA_QUERIES variants — the
#: driver checks only the exported 50, but every oracle-bearing query
#: keeps machine-checked parity here (ADVICE r2: demotions must not lose
#: continuous oracle coverage).
ALL_SPECS = {**QUERIES, **EXTRA_QUERIES}
ORACLE_NAMES = sorted(n for n, s in ALL_SPECS.items() if s.oracle is not None)

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(rows, colnames):
    """Sort columns by name, normalize values, sort rows — matches the
    driver's order-insensitive compare."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = round(v, 4)
                if math.isclose(v, 0.0, abs_tol=1e-9):
                    v = 0.0
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.fixture(scope="module")
def duck_con():
    return _duck()


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_query_matches_oracle(spark, duck_con, name):
    spec = ALL_SPECS[name]
    sdf = spec.fn(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck_con.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column names differ: {spark_cols} vs {duck_cols}"
    )
    s, d = _norm(spark_rows, spark_cols), _norm(duck_rows, duck_cols)
    assert len(s) == len(d), f"{name}: row count {len(s)} vs {len(d)}"
    mismatches = [i for i, (a, b) in enumerate(zip(s, d)) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatching rows; first: "
        f"{s[mismatches[0]]} vs {d[mismatches[0]]}"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None
