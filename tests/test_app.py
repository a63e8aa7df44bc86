"""App-layer tests (A1-A6 composition semantics)."""

from __future__ import annotations

import datetime

from ballcone_spark.app import Ballcone, days_before, json_value
from tests.conftest import DAY1, DAY2, GOLDEN_ENTRIES


def test_days_before():
    start, stop = days_before(datetime.date(2020, 1, 10), days=7)
    assert start == datetime.date(2020, 1, 4)
    assert stop == datetime.date(2020, 1, 10)


def test_json_value():
    assert json_value(datetime.date(2020, 1, 1)) == "2020-01-01"
    assert json_value(5) == 5
    assert json_value("x") == "x"


def test_dashboard(seeded_dao):
    app = Ballcone(seeded_dao)
    seeded_dao.batch_insert_into("second", GOLDEN_ENTRIES[:1])
    board = app.dashboard(day=DAY2)
    # 'test' has 1 unique ip on day2; 'second' none that day → 0
    assert board == [
        {"service": "test", "unique": 1},
        {"service": "second", "unique": 0},
    ]


def test_overview_single_pass(seeded_dao):
    app = Ballcone(seeded_dao)
    ov = app.overview("test", days=7, stop=DAY2)
    assert ov == {
        "2020-01-01": {"visits": 2, "unique": 1},
        "2020-01-02": {"visits": 2, "unique": 1},
    }


def test_top_paths_web_defaults(seeded_dao):
    app = Ballcone(seeded_dao, top_limit=1)
    top = app.top_paths("test", days=7, stop=DAY2)
    # per day, top path by distinct-ip... field=ip distinct=False counts
    # rows of ip per (day, path); ties break by group asc → "/"
    assert [t["group"] for t in top] == ["/", "/"]
    assert [t["date"] for t in top] == ["2020-01-01", "2020-01-02"]


def test_sql_console_envelope(seeded_dao):
    app = Ballcone(seeded_dao)
    ok = app.sql("SELECT service, count(*) AS n FROM access_log GROUP BY service")
    assert ok["columns"] == ["service", "n"]
    assert ok["rows"] == [["test", 4]]
    bad = app.sql("SELECT nope FROM access_log")
    assert "error" in bad and "nope" in bad["error"]


def test_size_ttl_cache(seeded_dao):
    app = Ballcone(seeded_dao)
    s1 = app.size()
    assert s1 > 0
    seeded_dao.batch_insert_into("more", GOLDEN_ENTRIES)
    assert app.size() == s1  # cached
    app._size_ttl = 0
    assert app.size() > s1  # expired → recomputed


def test_console_dialect_shims(seeded_dao):
    """The reference console's default query and its catalog queries run
    VERBATIM: pragma_database_size() (web_ballcone.py:134), the size
    probe (dao.py:147-148), and sqlite_master table listing
    (dao.py:150-160)."""
    app = Ballcone(seeded_dao)
    out = app.sql("SELECT * FROM pragma_database_size();")
    assert "error" not in out
    assert out["columns"] == ["database_size", "block_size", "total_blocks"]
    assert out["rows"][0][0] == seeded_dao.size() > 0

    out = app.sql(
        "SELECT COALESCE(total_blocks * block_size, 0) AS sz"
        " FROM pragma_database_size()"
    )
    assert out["rows"][0][0] >= seeded_dao.size()

    out = app.sql(
        "SELECT DISTINCT name FROM sqlite_master"
        " WHERE type = 'table' ORDER BY name"
    )
    assert [r[0] for r in out["rows"]] == seeded_dao.tables()


def test_service_view_cannot_clobber_dataset_views(seeded_dao):
    """ADVICE r2 namespace guard: a syslog-supplied service named after
    an analytics dataset view ('events', 'lineitem', ...) or a catalog
    shim must NOT shadow it — and the query layer's view-registration
    cache must be invalidated for anything register_views rebinds, so a
    later analytics build re-asserts its own binding."""
    import ballcone_spark.queries as q
    from ballcone_spark.queries import load_table

    spark = seeded_dao.spark
    sf = "/root/testdata/sf0.001"
    # analytics surface binds `events` (and caches the registration)
    q._register_views(spark, sf, ["events"])
    expected = load_table(spark, sf, "events").count()

    # a hostile-but-valid service name arrives and views are rebuilt
    seeded_dao.batch_insert_into("events", GOLDEN_ENTRIES[:1])
    seeded_dao.batch_insert_into("mysite", GOLDEN_ENTRIES)
    seeded_dao.register_views()

    # the dataset view survives; the service is still reachable through
    # the unified table (the documented path for reserved names)
    assert spark.table("events").count() == expected
    n = spark.sql(
        "SELECT count(*) AS n FROM access_log WHERE service = 'events'"
    ).collect()[0]["n"]
    assert n == 1
    # and a normal service name IS addressable verbatim
    assert spark.sql("SELECT count(*) AS n FROM mysite").collect()[0]["n"] == 4

    # cache invalidation: register_views popped its rebound names, so a
    # fresh analytics build re-registers instead of trusting a stale entry
    app_id = spark.sparkContext.applicationId
    assert (app_id, "mysite") not in q._VIEWS_REGISTERED


def test_service_view_cannot_shadow_catalog_tables(seeded_dao):
    """ADVICE r3: temp views win name resolution over session-catalog
    tables, so a valid service named like a bucketized table
    (bkt_*) — or any persistent catalog table — must not get a view;
    otherwise bucketed-join queries silently read service data."""
    from ballcone_spark.plans.bucketing import ensure_bucketed

    spark = seeded_dao.spark
    bkt = ensure_bucketed(
        spark, "/root/testdata/sf0.001", "orders", ["o_orderkey"], 4
    )
    n_orders = spark.table(bkt).count()

    # hostile-but-valid service names: the bucketized table itself and
    # an unrelated bkt_-prefixed name
    seeded_dao.batch_insert_into(bkt, GOLDEN_ENTRIES[:2])
    seeded_dao.batch_insert_into("bkt_other", GOLDEN_ENTRIES[:1])
    seeded_dao.register_views()

    # the catalog table still resolves to orders data, not service rows
    assert spark.table(bkt).count() == n_orders
    assert "o_orderkey" in spark.table(bkt).columns
    # both services remain reachable through the unified fact table
    for svc, expect in [(bkt, 2), ("bkt_other", 1)]:
        n = spark.sql(
            f"SELECT count(*) AS n FROM access_log WHERE service = '{svc}'"
        ).collect()[0]["n"]
        assert n == expect
    # idempotency: a second register_views still rebinds normal services
    seeded_dao.register_views()
    assert spark.table(bkt).count() == n_orders
