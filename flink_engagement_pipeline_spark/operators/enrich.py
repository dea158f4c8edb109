"""Enrichment: the reference's core query (reference src/process.py:163-183).

Reference semantics: each streamed engagement event probes the content
dimension via a temporal lookup LEFT join (``FOR SYSTEM_TIME AS OF
e.proc_time``, reference src/process.py:180-182), then derives
``engagement_seconds`` (CAST + /1000.0) and ``engagement_pct``
(guarded ROUND division) — SURVEY.md §2.3/§2.5.

Fixture remapping (deliberate): the reference computes
``ROUND((duration_ms/1000.0)/length_seconds, 2)``; the fixtures have
no ``length_seconds``, so ``engagement_pct`` here is
``ROUND(value/c_acctbal, 4)`` — same operator shape (guarded divide +
ROUND), different denominator and scale. ``engagement_seconds`` keeps
the /1000.0 step verbatim.

Spark-first design: a **broadcast stream-static LEFT equi-join**. The
dimension is tiny relative to the fact stream (50 rows in the
reference, 150*sf customers here), so broadcasting it turns Flink's
per-event JDBC lookup (no cache configured, reference
src/process.py:145-160) into a zero-shuffle, zero-round-trip hash probe
on every executor. At 100 TB of events this is the only plan that does
not shuffle the fact table at all: the dim ships once per executor, the
event scan stays pipelined inside whole-stage codegen, and Catalyst
prunes the parquet scan to the referenced columns.

The function is batch/stream agnostic — the same code path serves the
batch oracle queries and the Structured Streaming pipeline (stream-
static joins re-evaluate the static side per micro-batch, reproducing
the lookup join's "as of processing time" behavior at micro-batch
granularity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.engagement import engagement_pct, engagement_seconds


def enrich_events(events: DataFrame, dim: DataFrame) -> DataFrame:
    """events LEFT JOIN broadcast(dim) ON user_id = c_custkey + derived cols.

    Output schema (mirrors the reference's `engagement_enriched`,
    reference src/process.py:17-31 / FIXTURES.md output schema 1):
    passthrough event columns, the two derived engagement metrics, and
    the dimension attributes (NULL when the join is unmatched — the
    LEFT-join NULL path of reference src/process.py:181).
    """
    e = events.alias("e")
    c = F.broadcast(dim.alias("c"))
    joined = e.join(c, F.col("e.user_id") == F.col("c.c_custkey"), "left")
    return joined.select(
        F.col("e.event_id").alias("event_id"),
        F.col("e.user_id").alias("user_id"),
        F.col("e.event_type").alias("event_type"),
        F.col("e.ts").alias("ts"),
        F.col("e.value").alias("value"),
        engagement_seconds(F.col("e.value")),
        engagement_pct(F.col("e.value"), F.col("c.c_acctbal")),
        F.col("c.c_name").alias("user_name"),
        F.col("c.c_mktsegment").alias("user_segment"),
        F.col("c.c_nationkey").alias("user_nationkey"),
        F.col("c.c_acctbal").alias("user_acctbal"),
    )


ENRICH_ORACLE_SQL = """
SELECT
    e.event_id                    AS event_id,
    e.user_id                     AS user_id,
    e.event_type                  AS event_type,
    e.ts                          AS ts,
    e.value                       AS value,
    CAST(e.value AS DOUBLE) / 1000.0 AS engagement_seconds,
    CASE WHEN c.c_acctbal > 0
         THEN ROUND(CAST(e.value AS DOUBLE) / c.c_acctbal, 4)
         ELSE NULL END            AS engagement_pct,
    c.c_name                      AS user_name,
    c.c_mktsegment                AS user_segment,
    c.c_nationkey                 AS user_nationkey,
    c.c_acctbal                   AS user_acctbal
FROM events e
LEFT JOIN customer c ON e.user_id = c.c_custkey
"""
