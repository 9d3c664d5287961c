"""Custom Python DataSource: raw access-log → typed events.

The reference ingests events arriving as raw transport payloads (HTTP
POST bodies / queue messages), not ready-made parquet.  Spark 4's
Python DataSource API is the native way to plug such a format into the
DataFrame stack: implement partitions() + read(partition) and the
source joins the planner like any built-in — partition-parallel,
column-prunable downstream, usable from spark.read and SQL.

Format accepted (one event per line, the reference's wire shape):

    <event_id>|<iso8601 ts>|<user_id>|<event_type>|<value>|<props json>

Malformed lines land in a `_corrupt` column instead of killing the
scan (PERMISSIVE semantics — ingest pipelines must survive bad input).

Scale notes: one InputPartition per file (a directory of N files scans
with N-way parallelism; at 100 TB you shard the upload into many
files, as every log shipper does).  Each partition streams its file
line-by-line — no whole-file buffering.  Python-side parse cost is the
trade for format flexibility; once parsed, everything downstream is
JVM-side.  For formats Spark already reads (csv/json), use
sources/files.py — this API is for formats it does NOT.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.datasource import (
    DataSource, DataSourceReader, InputPartition,
    SimpleDataSourceStreamReader)
from pyspark.sql.types import StructType

EVENTLOG_DDL = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING, _corrupt STRING"
)


@dataclass
class _FilePartition(InputPartition):
    path: str


def _parse_line(line: str):
    """One wire record → typed tuple (or _corrupt row)."""
    raw = line.rstrip("\n")
    if not raw:
        return None
    try:
        event_id, ts_s, user_id, etype, value, props = raw.split("|", 5)
        ts = datetime.fromisoformat(ts_s)
        if ts.tzinfo is not None:
            ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
        return (int(event_id), ts, int(user_id), etype,
                float(value), props, None)
    except (ValueError, TypeError):
        return (None, None, None, None, None, None, raw)


class EventLogReader(DataSourceReader):
    def __init__(self, options):
        self._paths = sorted(__import__("glob").glob(
            options["path"] + "/*.log"))

    def partitions(self):
        return [_FilePartition(p) for p in self._paths]

    def read(self, partition: _FilePartition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                row = _parse_line(line)
                if row is not None:
                    yield row


class EventLogStreamReader(SimpleDataSourceStreamReader):
    """Continuous tail of a log directory: the offset is the count of
    files ingested from the lexicographically-sorted listing (log
    shippers name files monotonically — same contract as Spark's own
    file source).  Each micro-batch reads exactly the new files, so a
    replayed batch (recovery) re-reads the same slice: exactly-once
    into idempotent sinks.

    State is the offset integer only — no driver-side file cache to
    grow without bound (cf. the JVM file source's seenFiles map)."""

    def __init__(self, options):
        self._dir = options["path"]

    def _files(self):
        return sorted(__import__("glob").glob(self._dir + "/*.log"))

    def initialOffset(self):
        return {"n_files": 0}

    def read(self, start):
        files = self._files()
        n0 = start["n_files"]
        rows = []
        for p in files[n0:]:
            with open(p, encoding="utf-8") as fh:
                rows.extend(r for r in map(_parse_line, fh)
                            if r is not None)
        return iter(rows), {"n_files": len(files)}

    def readBetweenOffsets(self, start, end):
        files = self._files()[start["n_files"]:end["n_files"]]
        rows = []
        for p in files:
            with open(p, encoding="utf-8") as fh:
                rows.extend(r for r in map(_parse_line, fh)
                            if r is not None)
        return iter(rows)


class EventLogDataSource(DataSource):
    """`spark.read.format("eventlog").option("path", dir)` after
    `register_eventlog(spark)`; `spark.readStream.format("eventlog")`
    tails the same directory."""

    @classmethod
    def name(cls) -> str:
        return "eventlog"

    def schema(self) -> str:
        return EVENTLOG_DDL

    def reader(self, schema: StructType) -> EventLogReader:
        return EventLogReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> EventLogStreamReader:
        return EventLogStreamReader(self.options)


def register_eventlog(spark: SparkSession) -> None:
    spark.dataSource.register(EventLogDataSource)


def read_eventlog(spark: SparkSession, path: str) -> DataFrame:
    """Typed events from a directory of .log files; corrupt rows kept
    in `_corrupt` for a dead-letter sink."""
    register_eventlog(spark)
    return spark.read.format("eventlog").option("path", path).load()
