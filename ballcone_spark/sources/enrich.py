"""Ingest enrichment — S4 (GeoIP) and S5 (User-Agent) of SURVEY.md §2.1.

The reference enriches each record in Python at ingest: MaxMind GeoLite2
country lookup (reference ballcone/core.py:60-64) and
``httpagentparser.detect`` (syslog_protocol.py:71,83-87). Neither
library ships in this container, so each has two implementations:

- **JVM-side default** (always available): a regex UA mini-parser
  covering the mainstream browser/platform families, and GeoIP via a
  broadcast-joined CIDR→country lookup table (the scale-correct design:
  the GeoLite2 database IS a range table; shipping it as a broadcast
  DataFrame beats per-row mmdb lookups and keeps everything in codegen).
- **Library path** (:func:`enrich_user_agent_library`,
  :func:`enrich_geoip_library`): Arrow-batched pandas UDFs wrapping
  ``httpagentparser.detect`` / ``maxminddb.Reader.get`` for output
  parity with the reference; ``HAVE_MAXMINDDB``/``HAVE_HTTPAGENTPARSER``
  report availability and the functions raise ``ImportError`` without
  them. The detect/get callables are injectable, so the Spark plumbing
  (Arrow batch shape, struct schema, null handling) is pinned by tests
  with deterministic fakes even in containers without the libraries;
  a parity test against the regex path runs wherever the real libraries
  exist (skip-if-absent).
"""

from __future__ import annotations

from typing import Callable, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    import maxminddb  # noqa: F401

    HAVE_MAXMINDDB = True
except ImportError:
    HAVE_MAXMINDDB = False

try:  # pragma: no cover - not installed in this container
    import httpagentparser  # noqa: F401

    HAVE_HTTPAGENTPARSER = True
except ImportError:
    HAVE_HTTPAGENTPARSER = False

__all__ = [
    "HAVE_MAXMINDDB",
    "HAVE_HTTPAGENTPARSER",
    "parse_user_agent_cols",
    "enrich_user_agent",
    "enrich_user_agent_library",
    "enrich_geoip_with_table",
    "enrich_geoip_library",
    "ipv4_to_long",
    "enrich",
]


# --------------------------------------------------------------------- #
# User-Agent: regex mini-parser (JVM-side, codegen)                     #
# --------------------------------------------------------------------- #

_BOT_RE = r"(?i)(bot|crawler|spider|slurp|curl|wget|python-requests|scrapy)"

# (browser_name, version-capture regex) in match-priority order. Edge and
# Opera must precede Chrome; Chrome precedes Safari (UA strings nest).
# iOS re-skins carry their own tokens (CriOS/FxiOS/EdgiOS — WebKit
# mandated, distinct from the desktop tokens); IE11 dropped the MSIE
# token for Trident/…rv:11.0.
_BROWSERS = [
    ("Edge", r"Edg(?:e|A|iOS)?/([\d.]+)"),
    ("Opera", r"(?:OPR|Opera Mini)/([\d.]+)"),
    ("Firefox", r"(?:Firefox|FxiOS)/([\d.]+)"),
    ("Chrome", r"(?:Chrome|CriOS)/([\d.]+)"),
    ("Safari", r"Version/([\d.]+).*Safari"),
    ("MSIE", r"(?:MSIE |Trident/.*rv:)([\d.]+)"),
]

_PLATFORMS = [
    ("Windows", r"Windows NT ([\d.]+)"),
    ("Android", r"Android ([\d.]+)"),
    ("iOS", r"(?:iPhone|iPad).*? OS ([\d_]+)"),
    ("Mac OS", r"Mac OS X ([\d_.]+)"),
    ("Linux", r"(Linux)"),
]


def parse_user_agent_cols(ua: Column) -> dict[str, Column]:
    """UA string → platform_name/version, browser_name/version, is_robot
    as pure regexp columns."""
    browser_name: Column = F.lit(None).cast("string")
    browser_version: Column = F.lit(None).cast("string")
    for name, pat in reversed(_BROWSERS):
        hit = F.regexp_extract(ua, pat, 1)
        browser_name = F.when(hit != "", name).otherwise(browser_name)
        browser_version = F.when(hit != "", hit).otherwise(browser_version)
    platform_name: Column = F.lit(None).cast("string")
    platform_version: Column = F.lit(None).cast("string")
    for name, pat in reversed(_PLATFORMS):
        hit = F.regexp_extract(ua, pat, 1)
        platform_name = F.when(hit != "", name).otherwise(platform_name)
        ver = F.translate(hit, "_", ".")
        platform_version = F.when(
            hit != "", F.when(ver != name, ver)
        ).otherwise(platform_version)
    return {
        "platform_name": platform_name,
        "platform_version": F.when(
            platform_version == "Linux", None
        ).otherwise(platform_version),
        "browser_name": browser_name,
        "browser_version": browser_version,
        "is_robot": F.when(ua.isNull(), None).otherwise(ua.rlike(_BOT_RE)),
    }


def enrich_user_agent(df: DataFrame, ua_col: str = "user_agent") -> DataFrame:
    cols = parse_user_agent_cols(F.col(ua_col))
    for name, col in cols.items():
        df = df.withColumn(name, col)
    return df


# --------------------------------------------------------------------- #
# User-Agent: library-parity path (Arrow-batched pandas UDF)            #
# --------------------------------------------------------------------- #

_UA_STRUCT = T.StructType(
    [
        T.StructField("platform_name", T.StringType()),
        T.StructField("platform_version", T.StringType()),
        T.StructField("browser_name", T.StringType()),
        T.StructField("browser_version", T.StringType()),
        T.StructField("is_robot", T.BooleanType()),
    ]
)

_UA_FIELDS = [f.name for f in _UA_STRUCT.fields]


def _ua_struct_udf(detect_fn: Callable[[str], dict]):
    """Arrow-batched struct UDF over any ``detect(ua) -> dict`` callable
    shaped like ``httpagentparser.detect``. Field extraction mirrors the
    reference verbatim (reference ballcone/syslog_protocol.py:83-87):
    ``platform.name/version``, ``browser.name/version``, ``bot``, each
    ``None`` when absent."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(_UA_STRUCT)
    def parse(ua: pd.Series) -> pd.DataFrame:
        rows = []
        for v in ua:
            if v is None:
                rows.append((None, None, None, None, None))
                continue
            d = detect_fn(v) or {}
            rows.append(
                (
                    d.get("platform", {}).get("name", None),
                    d.get("platform", {}).get("version", None),
                    d.get("browser", {}).get("name", None),
                    d.get("browser", {}).get("version", None),
                    d.get("bot", None),
                )
            )
        return pd.DataFrame(rows, columns=_UA_FIELDS)

    return parse


def enrich_user_agent_library(
    df: DataFrame,
    ua_col: str = "user_agent",
    detect_fn: Optional[Callable[[str], dict]] = None,
) -> DataFrame:
    """S5 with reference-identical outputs: ``httpagentparser.detect``
    behind an Arrow-batched pandas UDF (one Python round-trip per Arrow
    batch, never per row). ``detect_fn`` is injectable for tests; by
    default it requires ``httpagentparser`` and raises ``ImportError``
    with the regex fallback named when absent."""
    if detect_fn is None:
        if not HAVE_HTTPAGENTPARSER:
            raise ImportError(
                "httpagentparser is not installed — use enrich_user_agent "
                "(the JVM-side regex path) or install the library for "
                "reference parity"
            )
        import httpagentparser

        detect_fn = httpagentparser.detect
    parsed = df.withColumn("_ua", _ua_struct_udf(detect_fn)(F.col(ua_col)))
    for name in _UA_FIELDS:
        parsed = parsed.withColumn(name, F.col(f"_ua.{name}"))
    return parsed.drop("_ua")


# --------------------------------------------------------------------- #
# GeoIP: broadcast range-join against a CIDR table                      #
# --------------------------------------------------------------------- #


def ipv4_to_long(ip: Column) -> Column:
    """Dotted-quad IPv4 → long (NULL for non-IPv4 strings)."""
    parts = F.split(ip, r"\.")
    valid = (F.size(parts) == 4) & ip.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    val = (
        parts[0].cast("long") * 16777216
        + parts[1].cast("long") * 65536
        + parts[2].cast("long") * 256
        + parts[3].cast("long")
    )
    return F.when(valid, val)


def enrich_geoip_with_table(
    df: DataFrame, ranges: DataFrame, ip_col: str = "ip"
) -> DataFrame:
    """country_iso_code via a broadcast **range join**:
    ``ranges(start_ip long, end_ip long, country_iso_code string)``
    (a GeoLite2 CSV converts directly to this shape).

    A non-equi join against a broadcast table is a BroadcastNestedLoop —
    fine for a lookup table of O(100k) ranges when the probe side streams
    through it; for the 100 TB case pre-bucket the ranges by /8 prefix
    and add an equality key on ``prefix`` to make it a broadcast hash
    join, which is what we do here. Each range is exploded into EVERY /8
    prefix it spans (``sequence(start div 2^24, end div 2^24)``), not just
    its start's — a range crossing a /8 boundary (supernets, merged
    blocks) must be probe-able from its tail prefixes too, else those IPs
    silently resolve to NULL. Well-formed GeoLite2 rows span one prefix
    and explode to exactly one row."""
    r = ranges.withColumn(
        "prefix",
        F.explode(
            F.sequence(
                (F.col("start_ip") / 16777216).cast("int"),
                (F.col("end_ip") / 16777216).cast("int"),
            )
        ),
    )
    ipl = ipv4_to_long(F.col(ip_col))
    probe = df.withColumn("_ipl", ipl).withColumn(
        "_prefix", (F.col("_ipl") / 16777216).cast("int")
    )
    joined = probe.join(
        F.broadcast(r),
        (probe["_prefix"] == r["prefix"])
        & (probe["_ipl"] >= r["start_ip"])
        & (probe["_ipl"] <= r["end_ip"]),
        "left",
    )
    return joined.drop("_ipl", "_prefix", "prefix", "start_ip", "end_ip")


# --------------------------------------------------------------------- #
# GeoIP: library-parity path (maxminddb behind a pandas UDF)            #
# --------------------------------------------------------------------- #

#: per-worker-process mmdb readers, keyed by path — maxminddb mmaps the
#: file, so one open per executor process amortizes across all batches.
_MMDB_READERS: dict = {}


def _iso_code(get_fn: Callable[[str], Optional[dict]], ip: str) -> Optional[str]:
    """Reference ``Ballcone.iso_code`` verbatim (reference
    ballcone/core.py:60-64) + a guard for malformed IPs (maxminddb raises
    ValueError; the reference never sees one because ``ip_address()``
    validated upstream — our streaming path is PERMISSIVE instead)."""
    try:
        geo = get_fn(ip)
    except ValueError:
        return None
    return geo["country"].get("iso_code", None) if geo and "country" in geo else None


def enrich_geoip_library(
    df: DataFrame,
    mmdb_path: str,
    ip_col: str = "ip",
    get_fn: Optional[Callable[[str], Optional[dict]]] = None,
) -> DataFrame:
    """S4 with reference-identical outputs: a MaxMind ``.mmdb`` lookup
    behind an Arrow-batched pandas UDF. ``mmdb_path`` must be reachable
    on every executor (ship it with ``spark.sparkContext.addFile`` and
    pass ``SparkFiles.get(...)``). ``get_fn`` is injectable for tests;
    by default requires ``maxminddb``."""
    if get_fn is None and not HAVE_MAXMINDDB:
        raise ImportError(
            "maxminddb is not installed — use enrich_geoip_with_table "
            "(the broadcast range-join path) or install the library for "
            "reference parity"
        )
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def iso(ips: pd.Series) -> pd.Series:
        if get_fn is not None:
            get = get_fn
        else:
            import maxminddb

            reader = _MMDB_READERS.get(mmdb_path)
            if reader is None:
                reader = _MMDB_READERS[mmdb_path] = maxminddb.open_database(
                    mmdb_path
                )
            get = reader.get
        return ips.map(
            lambda ip: None if ip is None else _iso_code(get, ip)
        )

    return df.withColumn("country_iso_code", iso(F.col(ip_col)))


def enrich(
    df: DataFrame,
    geoip_ranges: DataFrame | None = None,
    ua_col: str = "user_agent",
) -> DataFrame:
    """Full S4+S5 enrichment: UA parse (always) + GeoIP (when a range
    table is supplied, else NULL country like the reference's
    no-database mode, reference __main__.py:54-58)."""
    out = enrich_user_agent(df, ua_col)
    if geoip_ranges is not None:
        out = enrich_geoip_with_table(out, geoip_ranges)
    else:
        out = out.withColumn("country_iso_code", F.lit(None).cast("string"))
    return out
