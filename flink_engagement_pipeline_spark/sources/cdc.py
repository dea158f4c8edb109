"""Postgres-CDC-style changelog ingestion (SURVEY.md §2 S1).

The reference ingests a Postgres table as a Debezium-style keyed
changelog and declares ``PRIMARY KEY ... NOT ENFORCED`` so downstream
queries see the *materialized* latest state (reference src/ingest.py:
9-47).  Structured Streaming has no changelog relations, so the two
halves are explicit operators here:

- ``to_cdc_envelope`` / ``parse_cdc_envelope``: the wire format — a
  JSON envelope ``{"op": c|u|d, "after": {...}, "ts_ms": ...}`` per
  change, serialized/parsed with ``to_json``/``from_json`` against a
  declared schema (never inferred).  The parse is a narrow projection:
  at 100 TB it runs inside the scan stage, no shuffle.
- ``materialize``: changelog -> current table state.  Latest change
  per key via the single-shuffle ``row_number() = 1`` pattern, then
  drop keys whose *latest* op is a delete.  This is upsert semantics
  exactly: an earlier delete followed by a later upsert resurrects the
  key; a trailing delete removes it.

Batch and streaming share the same functions — ``materialize`` is the
per-microbatch compact step ``streaming/stateful.py`` applies
cross-batch.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("op", T.StringType(), False),
            T.StructField("after", row_schema, True),
            T.StructField("ts_ms", T.LongType(), False),
        ]
    )


def to_cdc_envelope(df: DataFrame, op: Column, ts_ms: Column) -> DataFrame:
    """Serialize rows to the JSON wire envelope (the shape a Debezium
    topic carries; also what the upsert-Kafka sink emits)."""
    payload = F.to_json(
        F.struct(
            op.alias("op"),
            F.struct(*[F.col(c) for c in df.columns]).alias("after"),
            ts_ms.alias("ts_ms"),
        )
    )
    return df.select(payload.alias("value"))


def parse_cdc_envelope(raw: DataFrame, row_schema: T.StructType) -> DataFrame:
    """JSON envelope -> typed (op, ts_ms, row-columns). Declared-schema
    ``from_json`` — malformed payloads become NULL structs rather than
    poisoning the job (PERMISSIVE semantics)."""
    parsed = raw.select(
        F.from_json(F.col("value"), envelope_schema(row_schema)).alias("e")
    )
    return parsed.select("e.op", "e.ts_ms", "e.after.*")


def materialize(changelog: DataFrame, key: str, order: list[str]) -> DataFrame:
    """Changelog -> current state: latest change per key wins; keys
    whose latest op is 'd' are absent. One shuffle on the key."""
    w = Window.partitionBy(key).orderBy(
        *[F.col(c).desc_nulls_last() for c in order]
    )
    return (
        changelog.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("op") != "d"))
        .drop("__rn", "op", "ts_ms")
    )
