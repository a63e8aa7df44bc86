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


# --------------------------------------------------------------------- #
# incremental MinHash dedup vs the persistent signature index (r4)      #
# --------------------------------------------------------------------- #

BASE = ("the quick brown fox jumps over the lazy dog while seven wizards "
        "brew strong potions beneath the ancient stone bridge at midnight")
OTHER = ("completely different subject matter entirely about submarine "
         "navigation sonar arrays and deep ocean pressure hull engineering "
         "with ballast tanks")
THIRD = ("quarterly financial projections estimate modest revenue growth "
         "across retail segments despite persistent supply chain headwinds "
         "and currency fluctuations")


def _write_docs(path, docs):
    import json as _json

    path.mkdir(parents=True, exist_ok=True)
    with open(path / f"docs-{len(list(path.iterdir()))}.jsonl", "w") as f:
        for doc_id, text in docs:
            f.write(_json.dumps({"doc_id": doc_id, "text": text}) + "\n")


def _run_dedup(spark, tmp_path):
    from ballcone_spark.streaming.dedup_stream import start_dedup_stream

    q = start_dedup_stream(
        spark,
        str(tmp_path / "spool"),
        str(tmp_path / "index"),
        str(tmp_path / "decisions"),
        str(tmp_path / "ckpt_dedup"),
        available_now=True,
    )
    q.awaitTermination(120)


def test_incremental_dedup_across_batches(spark, tmp_path):
    """Planted near-dups ACROSS micro-batches are caught by the index
    probe; checkpoint resume keeps the index consistent (batch 2 runs
    with the same checkpoint after a stop)."""
    from ballcone_spark.streaming.dedup_stream import (
        read_decisions,
        read_index,
    )

    spool = tmp_path / "spool"
    _write_docs(spool, [(1, BASE), (2, OTHER), (3, BASE)])  # 3 dups 1
    _run_dedup(spark, tmp_path)
    d1 = {r["doc_id"]: r["is_dup"] for r in
          read_decisions(spark, str(tmp_path / "decisions")).collect()}
    assert d1 == {1: False, 2: False, 3: True}

    # second batch arrives after a full stop: 4 dups doc 1 (history!),
    # 5 is fresh, 6 dups 5 within the batch
    _write_docs(spool, [(4, BASE), (5, THIRD), (6, THIRD)])
    _run_dedup(spark, tmp_path)
    dec = read_decisions(spark, str(tmp_path / "decisions"))
    d2 = {r["doc_id"]: r["is_dup"] for r in dec.collect()}
    assert d2 == {1: False, 2: False, 3: True, 4: True, 5: False, 6: True}
    # the index holds every seen doc across both batches (banded rows)
    idx = read_index(spark, str(tmp_path / "index"))
    assert sorted(
        r["doc_id"] for r in idx.select("doc_id").distinct().collect()
    ) == [1, 2, 3, 4, 5, 6]
    assert idx.select("batch_id").distinct().count() == 2
    # replay-safety invariant: decisions carry their batch partition
    n_b = dict(
        dec.groupBy("batch_id").count().orderBy("batch_id").collect()
    )
    assert n_b == {0: 3, 1: 3}


def test_incremental_dedup_batch_replay_idempotent(spark, tmp_path):
    """A replayed micro-batch (same batch_id re-run after a crash) must
    reproduce byte-identical decisions and not grow the index: the probe
    reads only batch_id < current and the writes overwrite their own
    partition."""
    from ballcone_spark.streaming.dedup_stream import (
        _bands,
        _overwrite_batch_partition,
        batch_signatures,
        incremental_dedup_batch,
        read_index,
    )
    from pyspark.sql import functions as F

    index_dir = str(tmp_path / "index")
    b1 = spark.createDataFrame([(1, BASE), (2, OTHER)], "doc_id long, text string")
    _overwrite_batch_partition(_bands(batch_signatures(b1)), index_dir, 0)

    b2 = spark.createDataFrame([(3, BASE), (4, OTHER + " q")], "doc_id long, text string")
    s2 = batch_signatures(b2)

    def run_batch2():
        hist = read_index(spark, index_dir).where(F.col("batch_id") < 1).select(
            "doc_id", "band_idx", "band_key", "sig"
        )
        dec = incremental_dedup_batch(s2, hist)
        out = sorted((r["doc_id"], r["is_dup"], r["n_matches"]) for r in dec.collect())
        _overwrite_batch_partition(_bands(s2), index_dir, 1)
        return out

    first = run_batch2()
    second = run_batch2()  # the replay
    assert first == second
    assert first[0] == (3, True, 1)  # 3 dups 1 via the index
    idx = read_index(spark, index_dir)
    assert idx.select("doc_id").distinct().count() == 4  # no double-append
    assert idx.count() == 16  # 4 docs × 4 banded rows, exactly once


def test_streaming_decisions_match_declarative_simulation(spark, tmp_path):
    """The batch-by-batch streaming loop and the single-statement
    simulation (the driver-checked form) implement the SAME decision
    rule: identical is_dup per doc on the same batch split."""
    from ballcone_spark.streaming.dedup_stream import (
        batch_signatures,
        incremental_dedup_simulation,
        read_decisions,
    )
    from pyspark.sql import functions as F

    docs = [
        (1, BASE), (2, OTHER), (3, BASE),
        (4, BASE + " extra"), (5, OTHER), (6, "tiny"),
        (7, OTHER + " deep dive"), (8, BASE),
    ]
    spool = tmp_path / "spool"
    _write_docs(spool, docs[:3])
    _run_dedup(spark, tmp_path)
    _write_docs(spool, docs[3:6])
    _run_dedup(spark, tmp_path)
    _write_docs(spool, docs[6:])
    _run_dedup(spark, tmp_path)
    dec = read_decisions(spark, str(tmp_path / "decisions"))
    streamed = {r["doc_id"]: r["is_dup"] for r in dec.collect()}

    batch_of = {d[0]: i // 3 for i, d in enumerate(docs)}
    all_docs = spark.createDataFrame(docs, "doc_id long, text string")
    sigs = batch_signatures(all_docs).withColumn(
        "batch_id",
        F.element_at(
            F.create_map(
                *[F.lit(x) for kv in batch_of.items() for x in kv]
            ),
            F.col("doc_id").cast("int"),
        ),
    )
    simulated = {
        r["doc_id"]: r["is_dup"]
        for r in incremental_dedup_simulation(sigs).collect()
    }
    assert streamed == simulated
    assert simulated[8] is True  # cross-batch dup caught in both paths


def test_probe_plan_index_side(spark, tmp_path):
    """100 TB gate: the index side of the probe must not shuffle — the
    (small) batch side is broadcast — and the batch's band keys must be
    pushed into the index scan for row-group pruning."""
    from ballcone_spark.streaming.dedup_stream import (
        _bands,
        _overwrite_batch_partition,
        batch_signatures,
        incremental_dedup_batch,
        read_index,
    )
    from pyspark.sql import functions as F

    index_dir = str(tmp_path / "index")
    hist_docs = spark.createDataFrame(
        [(i, f"{BASE} variant {i}") for i in range(20)],
        "doc_id long, text string",
    )
    _overwrite_batch_partition(
        _bands(batch_signatures(hist_docs)), index_dir, 0
    )
    batch = spark.createDataFrame(
        [(100, BASE + " variant 3"), (101, OTHER)], "doc_id long, text string"
    )
    hist = read_index(spark, index_dir).where(F.col("batch_id") < 1).select(
        "doc_id", "band_idx", "band_key", "sig"
    )
    dec = incremental_dedup_batch(batch_signatures(batch), hist)
    plan = dec._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the index never shuffles: no repartition by band key in the plan
    assert "hashpartitioning(band_key" not in plan
    assert "hashpartitioning(a_band_key" not in plan
    # the collected batch band keys reach the index parquet scan as a
    # PUSHED filter on the physical band_key column (banded storage is
    # what makes this possible — a sig-derived key could never push)
    assert "PushedFilters: [In(band_key" in plan.replace("\n", " ") or (
        "PushedFilters:" in plan and "In(band_key" in plan
    )


def test_compact_index_preserves_decisions(spark, tmp_path):
    """Folding per-batch index partitions must not change future
    decisions, and the folded partition keeps batch_id = max (stays
    strictly older than any future batch)."""
    import os

    from ballcone_spark.streaming.dedup_stream import (
        _bands,
        _overwrite_batch_partition,
        batch_signatures,
        compact_index,
        incremental_dedup_batch,
        read_index,
    )
    from pyspark.sql import functions as F

    index_dir = str(tmp_path / "index")
    for b in range(3):
        docs = spark.createDataFrame(
            [(b * 10 + i, f"{BASE} b{b} i{i}") for i in range(3)],
            "doc_id long, text string",
        )
        _overwrite_batch_partition(
            _bands(batch_signatures(docs)), index_dir, b
        )
    probe = spark.createDataFrame(
        [(999, BASE + " b1 i2"), (998, OTHER)], "doc_id long, text string"
    )

    def decide():
        hist = read_index(spark, index_dir).where(F.col("batch_id") < 50)
        return sorted(
            (r["doc_id"], r["is_dup"])
            for r in incremental_dedup_batch(
                batch_signatures(probe),
                hist.select("doc_id", "band_idx", "band_key", "sig"),
            ).collect()
        )

    before = decide()
    assert compact_index(spark, index_dir, every=3)
    spark.catalog.clearCache()
    after = decide()
    assert before == after
    parts = sorted(
        e for e in os.listdir(index_dir) if e.startswith("batch_id=")
    )
    assert parts == ["batch_id=2"]  # folded under the max seen batch
    assert read_index(spark, index_dir).select("doc_id").distinct().count() == 9


@pytest.mark.parametrize("crash_at", ["during_fold", "mid_delete", "new_batch_survives"])
def test_compact_index_crash_recovery(spark, tmp_path, monkeypatch, crash_at):
    """compact_index killed mid-swap must not lose index batches: an
    incomplete fold is discarded (sources intact); a complete fold
    supersedes only the partitions it covers — batches appended after
    the crash keep their own dirs and survive recovery."""
    import os
    import shutil

    from ballcone_spark.streaming import dedup_stream as ds

    index_dir = str(tmp_path / "index")
    for b in range(3):
        docs = spark.createDataFrame(
            [(b * 10 + i, f"{BASE} b{b} i{i}") for i in range(2)],
            "doc_id long, text string",
        )
        ds._overwrite_batch_partition(
            ds._bands(ds.batch_signatures(docs)), index_dir, b
        )
    all_docs = set(range(0, 2)) | set(range(10, 12)) | set(range(20, 22))

    class Boom(RuntimeError):
        pass

    if crash_at == "during_fold":
        # kill before the fold completes: no _SUCCESS in tmp
        real_rmtree = shutil.rmtree
        state = {"armed": True}

        def rmtree_hook(p, **kw):
            # first source deletion attempt aborts (fold already done
            # here, so simulate the earlier crash by nuking _SUCCESS)
            if state["armed"] and "batch_id=" in os.path.basename(p):
                state["armed"] = False
                tmp = ds._fold_tmp_dir(index_dir)
                for f in os.listdir(os.path.join(tmp, "batch_id=2")):
                    if f == "_SUCCESS":
                        os.remove(os.path.join(tmp, "batch_id=2", f))
                raise Boom()
            real_rmtree(p, **kw)

        monkeypatch.setattr(ds.shutil, "rmtree", rmtree_hook)
        with pytest.raises(Boom):
            ds.compact_index(spark, index_dir, every=3)
        monkeypatch.undo()
    elif crash_at in ("mid_delete", "new_batch_survives"):
        real_rmtree = shutil.rmtree
        state = {"deleted": 0}

        def rmtree_hook(p, **kw):
            if "batch_id=" in os.path.basename(p):
                state["deleted"] += 1
                if state["deleted"] == 2:
                    raise Boom()  # one source deleted, fold complete
            real_rmtree(p, **kw)

        monkeypatch.setattr(ds.shutil, "rmtree", rmtree_hook)
        with pytest.raises(Boom):
            ds.compact_index(spark, index_dir, every=3)
        monkeypatch.undo()
        if crash_at == "new_batch_survives":
            # the stream appends a NEW batch between crash and recovery
            late = spark.createDataFrame(
                [(99, BASE + " very late")], "doc_id long, text string"
            )
            ds._overwrite_batch_partition(
                ds._bands(ds.batch_signatures(late)), index_dir, 7
            )
            all_docs = all_docs | {99}

    spark.catalog.clearCache()
    # recovery runs at the start of the next compaction attempt
    ds.compact_index(spark, index_dir, every=999)  # recover only, no fold
    spark.catalog.clearCache()
    idx = ds.read_index(spark, index_dir)
    got = {r["doc_id"] for r in idx.select("doc_id").distinct().collect()}
    assert got == all_docs, f"{crash_at}: lost {all_docs - got}"
    assert not os.path.isdir(ds._fold_tmp_dir(index_dir))
    if crash_at == "new_batch_survives":
        # the late batch kept its own id, strictly above the fold's
        ids = {r["batch_id"] for r in idx.select("batch_id").distinct().collect()}
        assert 7 in ids and max(ids) == 7
