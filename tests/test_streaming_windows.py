"""Streaming window/state operator tests over a file stream of JSON
events. Append-mode outputs only contain windows FINALIZED by the
watermark (max event time − watermark bound) — the assertions below pin
that late-data semantic, which the reference lacks entirely."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import types as T

from ballcone_spark.streaming.windows import (
    running_user_totals,
    session_counts,
    sliding_traffic,
    windowed_visits,
)

SCHEMA = T.StructType(
    [
        T.StructField("datetime", T.TimestampType(), False),
        T.StructField("service", T.StringType(), False),
        T.StructField("ip", T.StringType(), False),
    ]
)


def _write_events(path, rows):
    path.mkdir(parents=True, exist_ok=True)
    with open(path / f"part-{len(list(path.iterdir()))}.json", "w") as f:
        for dt, svc, ip in rows:
            f.write(json.dumps({"datetime": dt, "service": svc, "ip": ip}) + "\n")


def _drain(spark, df, name, mode, tmp_path):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


@pytest.fixture()
def stream_src(spark, tmp_path):
    src = tmp_path / "src"
    _write_events(
        src,
        [
            ("2020-01-01 10:00:00", "blog", "1.1.1.1"),
            ("2020-01-01 10:10:00", "blog", "1.1.1.1"),   # same session
            ("2020-01-01 12:00:00", "blog", "1.1.1.1"),   # new session
            ("2020-01-01 10:05:00", "shop", "2.2.2.2"),
            ("2020-01-02 09:00:00", "blog", "3.3.3.3"),
        ],
    )
    # max event time 2020-01-02 09:00 → watermark (1h) = 2020-01-02 08:00:
    # day-1 state finalizes, day-2 is still open
    return spark.readStream.schema(SCHEMA).json(str(src))


def test_windowed_visits_append_finalized_only(spark, stream_src, tmp_path):
    out = _drain(
        spark, windowed_visits(stream_src), "wv", "append", tmp_path
    ).collect()
    got = {(str(r["window_start"]), r["service"]): r["visits"] for r in out}
    # the 2020-01-02 window has not crossed the watermark → not emitted
    assert got == {
        ("2020-01-01 00:00:00", "blog"): 3,
        ("2020-01-01 00:00:00", "shop"): 1,
    }


def test_session_counts(spark, stream_src, tmp_path):
    out = _drain(
        spark, session_counts(stream_src), "sc", "append", tmp_path
    ).collect()
    by_ip = {}
    for r in out:
        by_ip.setdefault(r["ip"], []).append(r["n_events"])
    # 1.1.1.1: (10:00,10:10) merge into one session of 2 (gap < 30 min);
    # 12:00 starts a new session of 1. 3.3.3.3's day-2 session is still
    # open at the watermark → absent.
    assert sorted(by_ip["1.1.1.1"]) == [1, 2]
    assert by_ip["2.2.2.2"] == [1]
    assert "3.3.3.3" not in by_ip


def test_sliding_traffic(spark, stream_src, tmp_path):
    out = _drain(
        spark, sliding_traffic(stream_src), "st", "append", tmp_path
    ).collect()
    # each event lands in 5 sliding windows (5 min / 1 min slide); the 4
    # day-1 events' windows are all finalized, day-2's are not → 20
    assert sum(r["requests"] for r in out) == 20


def test_running_user_totals_durable_state(spark, tmp_path):
    """State survives across separate availableNow runs sharing one
    checkpoint (memory sink can't recover checkpoints — foreachBatch)."""
    src = tmp_path / "src2"
    ckpt = str(tmp_path / "ckpt_totals")
    _write_events(src, [("2020-01-01 10:00:00", "blog", "x")] * 3
                  + [("2020-01-01 10:00:00", "shop", "y")])

    collected: list = []

    def sink(batch_df, _bid):
        collected.extend(batch_df.collect())

    def drain():
        collected.clear()
        stream = spark.readStream.schema(SCHEMA).json(str(src))
        q = (
            running_user_totals(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["key"]: (r["total"], r["batch_events"]) for r in collected}

    t1 = drain()
    assert t1 == {"blog": (3, 3), "shop": (1, 1)}

    # add more data, drain again with the SAME checkpoint: totals resume
    _write_events(src, [("2020-01-02 10:00:00", "blog", "x")] * 2)
    t2 = drain()
    assert t2["blog"] == (5, 2)  # 3 restored from state + 2 new in batch


def test_dedup_stream_drops_replays(spark, tmp_path):
    """Duplicate (service, ip, datetime) records inside the watermark
    horizon are emitted once; distinct records all survive."""
    from ballcone_spark.streaming.windows import dedup_stream

    src = tmp_path / "dsrc"
    _write_events(
        src,
        [
            ("2020-01-01 10:00:00", "blog", "1.1.1.1"),
            ("2020-01-01 10:00:00", "blog", "1.1.1.1"),  # exact replay
            ("2020-01-01 10:00:00", "blog", "9.9.9.9"),  # same ts, other ip
            ("2020-01-01 10:05:00", "blog", "1.1.1.1"),  # later, survives
        ],
    )
    stream = spark.readStream.schema(SCHEMA).json(str(src))
    out = _drain(
        spark,
        dedup_stream(stream, ["service", "ip", "datetime"]),
        "dedup_sink",
        "append",
        tmp_path,
    )
    rows = {(str(r["datetime"]), r["service"], r["ip"]) for r in out.collect()}
    assert rows == {
        ("2020-01-01 10:00:00", "blog", "1.1.1.1"),
        ("2020-01-01 10:00:00", "blog", "9.9.9.9"),
        ("2020-01-01 10:05:00", "blog", "1.1.1.1"),
    }
    assert out.count() == 3
