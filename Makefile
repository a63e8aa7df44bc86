# Convenience entries around the driver contract. The contract itself
# is unchanged: bench.py reads $SPARK_GRAFT_SF_DIR / $SPARK_GRAFT_CPUS
# and prints one JSON line.

CPUS ?= 32

.PHONY: test bench bench-sf1 oracle-sweep

test:
	python -m pytest tests/ -x -q

bench:
	SPARK_GRAFT_CPUS=$(CPUS) python bench.py

# sf1 bench arm (r16, VERDICT r15 #2): the sf0.1 headline numbers sit at
# the local scheduler floor; this runs the SAME bench.py (same queries,
# same methodology, same JSON contract) over the composite sf1 dir so
# corpus-family optimizations are visible. Record the line in
# BASELINE.md each round alongside the sf0.1 artifact.
# SKIP_DUCKDB: the O(n^2)-oracle set (recursive-closure CTEs) costs
# hours per DuckDB pass at 50k docs; the arm measures the Spark side.
# Unset it if you have the DuckDB budget.
bench-sf1:
	python tools/make_bench_sf1.py
	SPARK_GRAFT_CPUS=$(CPUS) SPARK_GRAFT_SF_DIR=$(CURDIR)/.scale_data/bench_sf1 SPARK_GRAFT_SKIP_DUCKDB=1 python bench.py

oracle-sweep:
	SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.1 python -m pytest tests/test_oracle_diff.py -q
