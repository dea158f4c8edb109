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


# ---------------------------------------------------------------------------
# Full Debezium envelope (before + after images) and retract-stream
# aggregation.
#
# The reference's Flink runtime turns its keyed changelog into a
# *retract stream*: every UPDATE carries the before image as a
# retraction (-U) and the after image as an accumulation (+U), so a
# downstream SUM/COUNT is maintained incrementally without per-key
# state (reference src/ingest.py:9-32 declares the keyed table; the
# retract arithmetic is what Flink's group-agg operator does with it).
# Spark has no changelog relations, so the semantics are explicit
# here: each change row contributes (+1, after) and/or (-1, before)
# and a plain associative aggregation over the signed contributions
# reproduces the final-state aggregate EXACTLY — in any order, which
# is the property that makes it shuffle-safe at 100 TB: no window, no
# row_number, no per-key state, ONE shuffle on the group key.
# ---------------------------------------------------------------------------


def full_envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Debezium-style envelope with both images: {op, before, after,
    ts_ms}. `before` is null for creates, `after` null for deletes."""
    return T.StructType(
        [
            T.StructField("op", T.StringType(), False),
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
            T.StructField("ts_ms", T.LongType(), False),
        ]
    )


def to_full_cdc_envelope(changes: DataFrame) -> DataFrame:
    """Serialize (op, before, after, ts_ms) rows to the JSON wire
    envelope. to_json omits null structs, so creates carry no
    `before` key and deletes no `after` key — the Debezium shape."""
    payload = F.to_json(
        F.struct(
            F.col("op"), F.col("before"), F.col("after"), F.col("ts_ms")
        )
    )
    return changes.select(payload.alias("value"))


def parse_full_cdc_envelope(raw: DataFrame, row_schema: T.StructType) -> DataFrame:
    """JSON full envelope -> typed (op, ts_ms, before, after) with
    declared-schema from_json (PERMISSIVE: malformed -> null)."""
    parsed = raw.select(
        F.from_json(F.col("value"), full_envelope_schema(row_schema)).alias("e")
    )
    return parsed.select("e.op", "e.ts_ms", "e.before", "e.after")


def retract_aggregate(
    changes: DataFrame,
    group_field: str,
    measure_field: str,
    *,
    keep_retired: bool = False,
) -> DataFrame:
    """Changelog -> grouped (count, sum) via retract arithmetic.

    op 'c' contributes (+1, after); op 'u' contributes (-1, before)
    AND (+1, after); op 'd' contributes (-1, before). Groups whose
    live count reaches zero disappear, exactly like a retracting
    Flink group-aggregate. ``keep_retired=True`` keeps them instead —
    REQUIRED when the result is partial state to be merged with other
    partials (incremental view maintenance): a batch holding only
    deletes legitimately carries zero or negative intermediate counts
    that must survive until the final merge. Both candidate contributions are built per
    change row and the inapplicable ones dropped inside the array
    BEFORE the explode, so the changelog is scanned once and the only
    shuffle is the final groupBy on the group value — which is why an
    update that MOVES a row across groups (before.group != after
    .group) needs no special casing: the retraction lands in the old
    group's partition, the accumulation in the new one.

    The measure must be an exactly-summable type (integer cents/
    micros) — floats would make the incremental result order-
    dependent and break equality with the batch aggregate.
    """
    minus = F.struct(
        F.when(F.col("op").isin("u", "d"), F.lit(-1))
        .otherwise(F.lit(0))
        .alias("sign"),
        F.col(f"before.{group_field}").alias("grp"),
        F.col(f"before.{measure_field}").alias("m"),
    )
    plus = F.struct(
        F.when(F.col("op").isin("c", "u"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("sign"),
        F.col(f"after.{group_field}").alias("grp"),
        F.col(f"after.{measure_field}").alias("m"),
    )
    contrib = changes.select(
        F.explode(
            F.filter(F.array(minus, plus), lambda x: x["sign"] != 0)
        ).alias("c")
    )
    agg = contrib.groupBy(F.col("c.grp").alias(group_field)).agg(
        F.sum("c.sign").cast("long").alias("n_live"),
        F.sum(F.col("c.sign") * F.col("c.m")).cast("long").alias("total"),
    )
    return agg if keep_retired else agg.filter(F.col("n_live") > 0)
