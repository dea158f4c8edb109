"""Extended operator coverage beyond the reference surface
(SURVEY.md §2.12 notes these as absent in the reference; declared here
as engine capabilities): session windows, OVER window functions,
CUBE grouping sets, part-dimension conditional aggregation, and the
upsert-ingest payload (K1/S1 parity, rows-only)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..operators.dedup import latest_per_key
from ..operators.util import fan_out
from ..sources.tables import load_table
from ..streaming.sinks import kafka_payload
from .registry import register

SESSION_GAP = "2 days"


@register(
    "session_windows",
    oracle="""
WITH o AS (
    SELECT user_id,
           CAST(ts AS TIMESTAMP) AS ts,
           CAST(value AS DECIMAL(18,2)) AS v,
           CASE WHEN CAST(ts AS TIMESTAMP)
                     - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts)
                     < INTERVAL 2 DAY
                THEN 0 ELSE 1 END AS new_s
    FROM events
),
s AS (
    SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
    FROM o
)
SELECT user_id,
       min(ts)                    AS session_start,
       max(ts) + INTERVAL 2 DAY   AS session_end,
       count(*)                   AS n_events,
       CAST(SUM(v) AS DOUBLE)     AS sum_value
FROM s
GROUP BY user_id, sid
""",
    doc=(
        "Session windows (gap 2 days) per user — Spark session_window "
        "merges events whose [t, t+gap) ranges overlap (strict <); the "
        "oracle reproduces that with lag/gaps-and-islands. Session "
        "end = last event + gap, matching Spark's semantics. Extension "
        "beyond the reference (SURVEY §2.9 T3 notes sessions absent)."
    ),
    tags=("session-window", "event-time"),
)
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", SESSION_GAP), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
        .select("user_id", "session_start", "session_end", "n_events", "sum_value")
    )


@register(
    "user_event_gaps",
    oracle="""
SELECT event_id, user_id, ts,
       CAST(epoch_us(CAST(ts AS TIMESTAMP))
            - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE)
           / 1000000.0 AS gap_seconds
FROM events
""",
    doc=(
        "OVER window function surface (lag): inter-event gap per user "
        "in seconds. Integer microsecond subtraction, one double "
        "division — cross-engine exact; NULL for each user's first "
        "event. Partition-by-user scales (no global window)."
    ),
    tags=("window-function", "lag"),
)
def q_user_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = (
        (F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)).cast("double")
        / 1000000.0
    )
    return events.select("event_id", "user_id", "ts", gap.alias("gap_seconds"))


@register(
    "cube_returnflag_status",
    oracle="""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
GROUP BY CUBE(l_returnflag, l_linestatus)
""",
    doc=(
        "CUBE grouping sets over lineitem: all 4 grouping combinations "
        "incl. the grand total, matching DuckDB CUBE NULL semantics."
    ),
    tags=("cube", "grouping-sets", "aggregates"),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n"),
        F.sum(dec("l_quantity", "decimal(12,2)")).cast("double").alias("sum_qty"),
    )


@register(
    "promo_revenue",
    oracle="""
SELECT (100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
                         * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))
                    ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE))
       / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                  * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
       AS promo_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
""",
    doc=(
        "TPC-H q14-style promo revenue share: lineitem x broadcast "
        "part with conditional decimal aggregation; date filter pushed "
        "to the scan. Exercises the part dimension + CASE inside SUM."
    ),
    tags=("join", "broadcast", "case-when", "aggregates", "pushdown"),
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = fan_out(
        load_table(spark, sf_dir, "lineitem").filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-03-01").cast("timestamp"))
        )
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = dec("l_extendedprice", "decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - dec("l_discount", "decimal(3,2)")
    )
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(12,4)")
    )
    joined = li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    return joined.agg(
        (
            (F.lit(100.0) * F.sum(promo).cast("double"))
            / F.sum(rev).cast("double")
        ).alias("promo_pct")
    )


@register(
    "ingest_kafka_payload",
    oracle=None,  # JSON wire format; round-trip checked in pytest
    doc=(
        "K1/S1 ingest parity: latest-per-key upserted events rendered "
        "as upsert-Kafka JSON key/value payloads. Rows-only BY "
        "DESIGN, verified by "
        "tests/test_streaming.py::test_kafka_payload_roundtrip (the "
        "wire JSON parses back to the exact input rows) — a wire "
        "format has no fixture-derivable SQL twin. Reference "
        "src/ingest.py:35-56."
    ),
    tags=("sink", "kafka", "upsert"),
)
def q_ingest_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = latest_per_key(load_table(spark, sf_dir, "events"))
    return kafka_payload(events)
