"""Batch table sources: parquet scans with explicit schemas.

Plays the role of the reference's table DDL (reference
src/ingest.py:9-32, src/process.py:122-160): every table is declared,
never inferred. Parquet scans get column pruning + predicate pushdown
from Catalyst for free — the `.explain()` of downstream queries must
show ReadSchema restricted to used columns and PushedFilters for any
literal predicates; that is the 100 TB contract.

Events NANOS note: the fixture stores ``events.ts`` as parquet
TIMESTAMP(NANOS), which Spark 4.x cannot read as TimestampType. We set
``spark.sql.legacy.parquet.nanosAsLong=true`` on the *passed-in*
session (the driver calls queries with its own SparkSession, so the
config must be applied here in the query path, not only in our session
factory), read ``ts`` as LongType nanoseconds, and convert with
**integer** division ``timestamp_micros(ts DIV 1000)``. Float division
``(ts/1000).cast("long")`` is 1 µs off on ~12% of rows
(double-precision rounding) and fails the oracle hash.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import EVENTS_RAW, TABLES

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"
_TZ_CONF = "spark.sql.session.timeZone"


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """Runtime-settable; must be applied to whichever session runs the
    read (the driver's own session included).

    Also pins the session timezone to UTC: hour()/year()/date_format()
    and string->timestamp casts all render through the session TZ, and
    the DuckDB oracle's TIMESTAMP is timezone-free (== UTC wall time).
    A driver session in any other TZ would shift every date extraction
    by the offset; pinning here (the query path) makes results
    driver-config-independent."""
    if spark.conf.get(_NANOS_CONF, "false") != "true":
        spark.conf.set(_NANOS_CONF, "true")
    # Set unconditionally: for an UNSET key conf.get returns the
    # caller's default, not the effective value (the JVM zone), so a
    # read-before-write guard can skip the write exactly when it is
    # needed. The set is an O(1) conf-map update.
    spark.conf.set(_TZ_CONF, "UTC")


def normalize_events(raw: DataFrame) -> DataFrame:
    """ns-long ``ts`` -> TimestampType (µs).  Integer DIV, never float
    division (see module docstring).  Works on batch and streaming
    DataFrames alike."""
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))


_TS_UNIT_CACHE: dict[str, bool] = {}
_COLUMNS_CHECKED: set[str] = set()


def _check_fixture_columns(path: str, expected: tuple[str, ...]) -> None:
    """Fail LOUDLY if the fixture lacks a declared column.

    An imposed read schema silently yields NULLs for columns missing
    from the file — with driver-regenerated fixtures (whose layout has
    already changed between rounds, see the ts-unit note) that would
    turn a rename into silently-wrong query results. One cached footer
    read per path converts that into an immediate, named error.
    """
    if path in _COLUMNS_CHECKED:
        return
    import pyarrow.parquet as pq

    actual = set(pq.read_schema(path).names)
    missing = [c for c in expected if c not in actual]
    if missing:
        raise ValueError(
            f"fixture {path} lacks declared column(s) {missing}; "
            f"file has: {sorted(actual)}"
        )
    _COLUMNS_CHECKED.add(path)


def events_ts_is_nanos(path: str) -> bool:
    """True when the events parquet stores ``ts`` as raw nanoseconds
    (TIMESTAMP(NANOS), or int64 ns — the convention of test-written raw
    files); False for TIMESTAMP(MICROS/MILLIS).

    The fixture generation has shipped both units across rounds
    (TIMESTAMP(NANOS) and TIMESTAMP(MICROS)); assuming either one
    corrupts every timestamp by 1000x when the other arrives. One
    pyarrow footer read (driver-side, O(KB), cached per path) pins the
    truth. ``path`` may be a single parquet file or a directory of them
    (the streaming source layout) — all files in one directory share
    the writer, so the first footer speaks for all.
    """
    cached = _TS_UNIT_CACHE.get(path)
    if cached is not None:
        return cached
    import glob

    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        hits = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not hits:
            raise FileNotFoundError(f"no parquet files under {path!r}")
        probe = hits[0]
    ts_type = str(pq.read_schema(probe).field("ts").type)
    is_nanos = ts_type in ("timestamp[ns]", "int64")
    _TS_UNIT_CACHE[path] = is_nanos
    return is_nanos


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table with its declared schema.

    ``schema(...)`` on a parquet read prunes to the declared columns and
    fixes types instead of trusting file metadata — the reference's
    explicit-DDL discipline.  ``events`` goes through the unit-detected
    ns->µs normalization so every downstream query sees TimestampType.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {sorted(TABLES)}")
    path = os.path.join(sf_dir, f"{name}.parquet")
    _ensure_nanos_conf(spark)  # nanos + UTC: needed by every table with timestamps
    _check_fixture_columns(path, tuple(TABLES[name].fieldNames()))
    if name == "events" and events_ts_is_nanos(path):
        # Spark 4.x cannot read TIMESTAMP(NANOS) as TimestampType:
        # read raw ns longs and integer-divide (module docstring).
        return normalize_events(spark.read.schema(EVENTS_RAW).parquet(path))
    return spark.read.schema(TABLES[name]).parquet(path)


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view (the SQL front door,
    mirroring the reference's catalog registration step, reference
    src/process.py:122-160)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
