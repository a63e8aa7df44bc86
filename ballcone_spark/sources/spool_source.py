"""Custom Structured Streaming source for the syslog spool — the Spark 4
Python data source API path that SURVEY.md §4 flags as the native
alternative to tailing the spool with the built-in file source.

Why a custom source at all: Spark has no UDP socket source (the
reference ingests syslog UDP datagrams directly,
reference ballcone/syslog_protocol.py:20-49). The
:mod:`ballcone_spark.sources.udp_bridge` turns datagrams into
atomically-published spool files with lexicographically increasing
names; this source exposes those files as an exactly-once stream:

- **offset** = the last published file name (a total order, because the
  bridge names files ``datagrams-<epoch>-<seq>`` and renames them into
  place atomically — a reader never sees a partial file);
- **partitions(start, end]** = one :class:`InputPartition` per file in
  the window, so a batch distributes across executors file-per-task;
- **read** yields one ``value`` row per datagram line — downstream is
  the same :func:`ballcone_spark.sources.syslog.parse_datagrams`
  pipeline the file-source path uses.

Checkpointed offsets give exactly-once delivery from the spool onward
(the UDP hop stays fire-and-forget, as in the reference — datagram loss
happens before durability begins, a documented boundary).

Register and use::

    spark.dataSource.register(SyslogSpoolDataSource)
    raw = spark.readStream.format("syslog_spool").load(spool_dir)
    parsed = parse_datagrams(raw)
"""

from __future__ import annotations

import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

__all__ = ["SyslogSpoolDataSource"]


class _SpoolFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _visible_files(spool_dir: str) -> list[str]:
    try:
        names = os.listdir(spool_dir)
    except FileNotFoundError:
        return []
    # dot-prefixed files are in-progress (bridge publishes by rename)
    return sorted(n for n in names if not n.startswith("."))


class SyslogSpoolStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("syslog_spool requires a path: .load(spool_dir)")
        self.spool_dir = path

    def initialOffset(self) -> dict:
        return {"last": ""}

    def latestOffset(self) -> dict:
        files = _visible_files(self.spool_dir)
        return {"last": files[-1] if files else ""}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start.get("last", ""), end.get("last", "")
        return [
            _SpoolFilePartition(os.path.join(self.spool_dir, n))
            for n in _visible_files(self.spool_dir)
            if lo < n <= hi
        ]

    def read(self, partition: _SpoolFilePartition) -> Iterator[tuple]:
        with open(partition.path, "rb") as f:
            for line in f:
                line = line.rstrip(b"\r\n")
                if line:
                    yield (line.decode("utf-8", errors="replace"),)

    def commit(self, end: dict) -> None:
        # Spool retention is the bridge's concern (files may feed other
        # consumers); nothing to acknowledge upstream.
        pass


class SyslogSpoolDataSource(DataSource):
    """``format("syslog_spool")`` — one string column ``value`` per
    datagram line from the UDP bridge's spool directory."""

    @classmethod
    def name(cls) -> str:
        return "syslog_spool"

    def schema(self) -> str:
        return "value string"

    def streamReader(self, schema) -> SyslogSpoolStreamReader:
        return SyslogSpoolStreamReader(self.options)
