"""Shared fixtures: one SparkSession per test run, the 4-row golden
fixture from the reference test suite (reference ballcone/test_dao.py:13-41,
documented in FIXTURES.md §1.1)."""

from __future__ import annotations

import datetime

import pytest

from ballcone_spark.session import get_spark


def window_group_limit_expected(spark) -> bool:
    """Spark ≥ 3.5 rewrites rank/row_number≤k window filters to the
    WindowGroupLimit physical node; older versions lack the rule and
    the rendered node name is not a stable cross-version contract
    (ADVICE r10) — plan-shape assertions gate on this, while the
    result-correctness assertions in the same tests stay
    unconditional."""
    major, minor = (int(x) for x in spark.version.split(".")[:2])
    return (major, minor) >= (3, 5)


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="ballcone_spark_tests", master="local[4]",
                      shuffle_partitions=4)
    yield spark


def _dt(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


#: The reference's golden fixture: 4 rows, two dates, service="test".
GOLDEN_ENTRIES = [
    dict(
        datetime=_dt("2020-01-01 12:00:00"), host="example.com", path="/",
        status=200, length=1024, generation_time=0.1, referer=None,
        ip="192.168.1.1", country_iso_code="UNKNOWN",
        platform_name="Mac OS", platform_version="X 10.15",
        browser_name="Firefox", browser_version="75.0", is_robot=False,
    ),
    dict(
        datetime=_dt("2020-01-01 12:15:00"), host="example.com",
        path="/robots.txt", status=404, length=0, generation_time=0.01,
        referer=None, ip="192.168.1.1", country_iso_code="UNKNOWN",
        platform_name="Linux", platform_version=None, browser_name=None,
        browser_version=None, is_robot=True,
    ),
    dict(
        datetime=_dt("2020-01-02 23:59:00"), host="example.com", path="/",
        status=200, length=256, generation_time=0.01,
        referer="https://github.com/dustalov", ip="192.168.1.2",
        country_iso_code="UNKNOWN", platform_name="iOS",
        platform_version="13.3.1", browser_name="Safari",
        browser_version="13.0.5", is_robot=False,
    ),
    dict(
        datetime=_dt("2020-01-02 23:59:59"), host="example.com", path="/post",
        status=200, length=512, generation_time=1.0, referer=None,
        ip="192.168.1.2", country_iso_code="UNKNOWN", platform_name="iOS",
        platform_version="13.3.1", browser_name="Safari",
        browser_version="13.0.5", is_robot=False,
    ),
]

DAY1 = datetime.date(2020, 1, 1)
DAY2 = datetime.date(2020, 1, 2)


@pytest.fixture()
def dao(spark, tmp_path):
    from ballcone_spark.dao import SparkDAO

    return SparkDAO(spark, str(tmp_path / "warehouse"))


@pytest.fixture()
def seeded_dao(dao):
    dao.batch_insert_into("test", GOLDEN_ENTRIES)
    return dao
