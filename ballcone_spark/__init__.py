"""ballcone_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of dustalov/ballcone.

The reference (https://github.com/dustalov/ballcone) is a server-side web
analytics system: syslog-UDP ingest of nginx access-log JSON, micro-batched
persistence into an embedded columnar store (DuckDB), and a typed analytic
query layer (daily counts, distinct counts, averages, per-day top-N) plus a
raw-SQL console. This package re-expresses that surface Spark-first:

- one logical fact table (``service`` as a partition column instead of
  per-service physical tables), Parquet-backed, partitioned by
  ``service``/``date`` so Q1 date-range predicates become partition pruning;
- Structured Streaming micro-batch ingest replacing the in-memory deque +
  5-second flush timer;
- the typed query layer as declarative DataFrame plans (Catalyst does
  predicate pushdown, partial aggregation, WindowGroupLimit top-N);
- ``spark.sql`` as the raw-SQL console, which makes the full Spark SQL
  surface (joins, windows, set ops) part of the engine;
- beyond-reference LLM-data-pipeline operators: dedup (exact, MinHash-LSH,
  SimHash, n-gram Jaccard), embedding similarity search, text analysis.
"""

from ballcone_spark.schema import ENTRY_SCHEMA, FACT_SCHEMA  # noqa: F401
from ballcone_spark.dao import SparkDAO  # noqa: F401

__version__ = "0.1.0"
