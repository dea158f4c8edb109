"""Custom source connector via the Spark 4 Python DataSource API.

The reference ships its own source-side programs (a Postgres insert
loop, src/datagen.py, and connector DDL for every external system);
the Spark-native analog for "a system Spark has no built-in reader
for" is the `pyspark.sql.datasource` API: declare schema +
partitions, yield rows per partition, and the source becomes a
first-class `spark.read.format(...)` — partition-parallel, usable in
SQL, no RDD glue.

This module implements `engagement_gen`, a deterministic synthetic
engagement-event source in that API (the pure-Python sibling of
sources/datagen.py — same value domains and drift-free timestamp
grid, md5-derived hashing instead of xxhash64 since the generation
runs in Python workers):

    spark.dataSource.register(EngagementGenDataSource)
    df = (spark.read.format("engagement_gen")
          .option("n", 100000).option("partitions", 8).load())

Batch reads split the id space into contiguous partition ranges
(`partitions(self)`), so generation parallelizes like spark.range and
regenerating any partition after executor loss is idempotent — the
same rebuild-without-a-coordinator property the column-expression
generator has. A `SimpleDataSourceStreamReader` exposes the same rows
as an unbounded micro-batch stream (offset = next id), covering the
reference's insert-loop role end-to-end.

This is plumbing for EXTERNAL systems; for synthetic data at scale
prefer sources/datagen.py (JVM column arithmetic, no Python in the
row path). Kept deliberately small: the value is demonstrating the
connector surface, tested in tests/test_plans.py.
"""

from __future__ import annotations

import datetime
import hashlib
import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .datagen import DEVICES, EVENT_TYPES

_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, content_id bigint, "
    "event_type string, duration_ms bigint, device string, "
    "raw_payload string"
)
_EPOCH = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _h(i: int, salt: int) -> int:
    """Deterministic 48-bit int from (id, salt) — md5-based so any
    Python worker computes the same value."""
    return int(hashlib.md5(f"{i}:{salt}".encode()).hexdigest()[:12], 16)


def _row(i: int, rate: int) -> tuple:
    q, r = divmod(1_000_000, rate)
    off_us = i * q + (i * r) // rate  # drift-free grid, as in datagen
    etype = EVENT_TYPES[_h(i, 11) % len(EVENT_TYPES)]
    duration = 1000 + _h(i, 12) % 299001 if etype in ("play", "finish") else None
    payload = json.dumps(
        {
            "metadata": f"m-{_h(i, 13) % 1000}",
            "ip": f"10.{_h(i, 14) % 256}.{_h(i, 15) % 256}.1",
        },
        separators=(",", ":"),
    )
    return (
        i,
        _EPOCH + datetime.timedelta(microseconds=off_us),
        _h(i, 16) % 150,
        _h(i, 17) % 50,
        etype,
        duration,
        DEVICES[_h(i, 18) % len(DEVICES)],
        payload,
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class _Reader(DataSourceReader):
    def __init__(self, options):
        self.n = int(options.get("n", 1000))
        self.parts = int(options.get("partitions", 4))
        self.rate = int(options.get("events_per_second", 10))

    def partitions(self):
        step = max(1, -(-self.n // self.parts))  # ceil div
        return [
            _RangePartition(lo, min(lo + step, self.n))
            for lo in range(0, self.n, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i, self.rate)


class _StreamReader(SimpleDataSourceStreamReader):
    """Unbounded form: offset = next id to emit; each micro-batch
    carries `batch_rows` ids. Replaying [start, end) regenerates
    identical rows, so exactly-once sinks compose downstream."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batch_rows", 100))
        self.rate = int(options.get("events_per_second", 10))

    def initialOffset(self):
        return {"next": 0}

    def read(self, start):
        lo = start["next"]
        hi = lo + self.batch_rows
        return iter([_row(i, self.rate) for i in range(lo, hi)]), {"next": hi}

    def readBetweenOffsets(self, start, end):
        return iter([_row(i, self.rate) for i in range(start["next"], end["next"])])


class EngagementGenDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "engagement_gen"

    def schema(self) -> str:
        return _SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _Reader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _StreamReader(self.options)
