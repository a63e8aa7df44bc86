"""Data model: the access-log fact schema.

The reference derives its DDL from Python type annotations on an ``Entry``
NamedTuple (reference ballcone/dao.py:16-25,74-90; plain-SQL DDL at
reference tools/monet2duck.py:58-75). We declare the same 14 fields as a
Spark ``StructType`` with identical nullability, plus a leading ``service``
column: the reference encodes the service as the *table name* (one
identically-schemaed table per monitored site); Spark-first, that is one
logical table partitioned by ``service`` — same semantics, and a single
``groupBy('service')`` replaces N per-table queries.

Type mapping (reference dao.py:16-25 → Spark):
    datetime  -> TimestampType (NOT NULL)   TIMESTAMP
    str       -> StringType                 VARCHAR
    smallint  -> ShortType (NOT NULL)       SMALLINT
    int       -> IntegerType (NOT NULL)     INTEGER
    float     -> DoubleType (NOT NULL)      DOUBLE
    IPv4/IPv6 -> StringType (NOT NULL)      VARCHAR (no native IP type)
    bool      -> BooleanType                BOOLEAN

Nullable fields (Optional[...] in the reference, dao.py:35-45):
referer, country_iso_code, platform_name, platform_version, browser_name,
browser_version, is_robot.
"""

from __future__ import annotations

from pyspark.sql import types as T

__all__ = [
    "ENTRY_FIELDS",
    "ENTRY_SCHEMA",
    "FACT_SCHEMA",
    "NULLABLE_FIELDS",
    "SYSLOG_JSON_SCHEMA",
    "VALID_SERVICE_RE",
    "entry_ddl",
]

# Service names must match the reference's validation regex
# (reference ballcone/core.py:15, enforced at core.py:53-58).
VALID_SERVICE_RE = r"\A[\w]+\Z"

NULLABLE_FIELDS = frozenset(
    {
        "referer",
        "country_iso_code",
        "platform_name",
        "platform_version",
        "browser_name",
        "browser_version",
        "is_robot",
    }
)

# (name, spark type) in the reference's declaration order (dao.py:74-90).
ENTRY_FIELDS: list[tuple[str, T.DataType]] = [
    ("datetime", T.TimestampType()),
    ("host", T.StringType()),
    ("path", T.StringType()),
    ("status", T.ShortType()),
    ("length", T.IntegerType()),
    ("generation_time", T.DoubleType()),
    ("referer", T.StringType()),
    ("ip", T.StringType()),
    ("country_iso_code", T.StringType()),
    ("platform_name", T.StringType()),
    ("platform_version", T.StringType()),
    ("browser_name", T.StringType()),
    ("browser_version", T.StringType()),
    ("is_robot", T.BooleanType()),
]

#: The 14-field Entry schema (one reference table's schema).
ENTRY_SCHEMA = T.StructType(
    [T.StructField(n, t, n in NULLABLE_FIELDS) for n, t in ENTRY_FIELDS]
)

#: The unified fact-table schema: Entry + leading ``service`` column.
FACT_SCHEMA = T.StructType(
    [T.StructField("service", T.StringType(), False), *ENTRY_SCHEMA.fields]
)

#: Schema of the raw nginx JSON payload carried inside a syslog datagram
#: (reference demo/nginx.conf log_format / README.md:104-118;
#: field coercions at reference syslog_protocol.py:67-79). All fields are
#: read as they appear in the JSON; coercion to the Entry schema happens in
#: sources.syslog.
SYSLOG_JSON_SCHEMA = T.StructType(
    [
        T.StructField("service", T.StringType(), True),
        T.StructField("ip", T.StringType(), True),
        T.StructField("host", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("status", T.StringType(), True),
        T.StructField("referrer", T.StringType(), True),
        T.StructField("user_agent", T.StringType(), True),
        T.StructField("length", T.LongType(), True),
        T.StructField("generation_time_milli", T.DoubleType(), True),
        T.StructField("date", T.StringType(), True),
    ]
)


def entry_ddl(with_service: bool = True) -> str:
    """DDL string for the fact table (mirrors reference monet2duck.py:58-75)."""
    schema = FACT_SCHEMA if with_service else ENTRY_SCHEMA
    cols = []
    for f in schema.fields:
        sql_type = {
            "timestamp": "TIMESTAMP",
            "string": "VARCHAR",
            "smallint": "SMALLINT",
            "integer": "INTEGER",
            "double": "DOUBLE",
            "boolean": "BOOLEAN",
        }[f.dataType.simpleString()]
        null = "" if f.nullable else " NOT NULL"
        cols.append(f"    {f.name} {sql_type}{null}")
    return ",\n".join(cols)
