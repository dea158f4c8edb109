"""Core reference-parity queries (SURVEY.md §2).

Each query maps a capability of the reference pipeline (file:line cited
per query) onto the driver fixtures with ``events`` as the fact stream
and ``customer`` as the dimension. Every computed column is aliased
identically in the Spark code and the oracle SQL (the driver's compare
sorts columns by name before hashing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.engagement import props_get
from ..functions.exact import dec
from ..operators import dedup, topk, windows
from ..operators.enrich import ENRICH_ORACLE_SQL, enrich_events
from ..sources.tables import load_table
from .registry import register

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "enrich_events",
    oracle=ENRICH_ORACLE_SQL,
    doc=(
        "Reference core query: temporal lookup LEFT join + derived "
        "engagement metrics (reference src/process.py:163-183). "
        "Broadcast stream-static hash join; zero shuffle of the fact side."
    ),
    bench=True,
    tags=("join", "projection", "case-when", "round", "cast"),
)
def q_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer")
    return enrich_events(events, dim)


@register(
    "events_identity",
    oracle="SELECT event_id, ts, user_id, event_type, value, props FROM events",
    doc=(
        "Identity projection SELECT * (SURVEY §2 P2; reference "
        "src/ingest.py:56 INSERT INTO ... SELECT *). Also proves the "
        "ns->us timestamp normalization round-trips the fixture exactly."
    ),
    tags=("projection",),
)
def q_identity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


@register(
    "sink_projection",
    oracle="""
SELECT
    CAST(event_id AS VARCHAR)             AS event_key,
    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS ts_fmt,
    user_id                               AS user_id,
    event_type                            AS event_type,
    value                                 AS value
FROM events
WHERE value IS NOT NULL AND value <> 0 AND user_id IS NOT NULL
""",
    doc=(
        "Sink-side projection + guards (SURVEY §2 P9/P10/P11, F2): "
        "key cast to string (reference sql/init.sql:28-36 UUID::text), "
        "timestamp formatted '%Y-%m-%d %H:%M:%S' (reference "
        "src/process.py:50-54), null/zero filter (reference "
        "src/process.py:90). Filters are pushed to the parquet scan."
    ),
    tags=("projection", "filter", "date-format", "cast"),
)
def q_sink_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        F.col("value").isNotNull() & (F.col("value") != 0) & F.col("user_id").isNotNull()
    ).select(
        F.col("event_id").cast("string").alias("event_key"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_fmt"),
        "user_id",
        "event_type",
        "value",
    )


@register(
    "latest_per_key",
    oracle=dedup.DEDUP_ORACLE_SQL,
    doc=(
        "Upsert latest-per-key dedup (SURVEY §2 T4/S2) — the reference's "
        "PRIMARY KEY NOT ENFORCED changelog semantics (reference "
        "src/ingest.py:19, src/process.py:133) as row_number()=1 with a "
        "deterministic total tie-break. One shuffle, no self-join."
    ),
    bench=True,
    tags=("dedup", "window-function"),
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.latest_per_key(load_table(spark, sf_dir, "events"))


@register(
    "hop_engagement_sum",
    oracle=windows.hop_oracle_sql(),
    doc=(
        "A1: sliding-window SUM, HOP 10 min / 5 s (reference "
        "src/process.py:196-204) on event time. Narrow-then-explode: "
        "only (ts, key, decimal measure) enter the 120x window Expand."
    ),
    bench=True,
    tags=("window-agg", "hop", "event-time"),
)
def q_hop(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.hop_engagement_sum(load_table(spark, sf_dir, "events"))


@register(
    "tumbling_stats",
    oracle=windows.tumbling_oracle_sql(),
    doc=(
        "Tumbling-window COUNT/SUM/AVG/MIN/MAX per event_type — the "
        "extended aggregate surface (SURVEY §7 Phase 1 item 8); AVG as "
        "SUM(decimal)/COUNT for cross-engine exactness."
    ),
    bench=True,
    tags=("window-agg", "tumbling", "aggregates"),
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    return windows.tumbling_stats(load_table(spark, sf_dir, "events"))


@register(
    "leaderboard_topk",
    oracle=topk.topk_oracle_sql(),
    doc=(
        "A2: leaderboard top-10 by total engagement (reference Redis "
        "ZRANGE read path, src/process.py:92, README.md:100). "
        "TakeOrderedAndProject — per-partition heaps, no global sort."
    ),
    bench=True,
    tags=("topk", "order-limit"),
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.leaderboard_topk(load_table(spark, sf_dir, "events"))


@register(
    "leaderboard_rank",
    oracle=topk.rank_oracle_sql(),
    doc=(
        "rank() OVER the top-100 leaderboard (SURVEY §2.7) — rank runs "
        "after the limit, over k rows, never over the full key space."
    ),
    tags=("topk", "rank", "window-function"),
)
def q_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    return topk.leaderboard_rank(load_table(spark, sf_dir, "events"))


@register(
    "distinct_users_by_type",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_events
FROM events GROUP BY event_type
""",
    doc="Exact COUNT(DISTINCT) per event_type (extended agg surface).",
    tags=("aggregates", "distinct"),
)
def q_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count("*").alias("n_events"),
        )
    )


@register(
    "approx_distinct_users",
    oracle=None,  # approximate by design => rows-only driver check
    doc=(
        "approx_count_distinct (HLL++) per event_type — the scale path "
        "for distinct counting; exactness checked against "
        "distinct_users_by_type in tests (rel. error < 5%)."
    ),
    tags=("aggregates", "approx"),
)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id").alias("n_users_approx"))
    )


@register(
    "props_k_agg",
    oracle="""
SELECT
    TRY_CAST(NULLIF(regexp_extract(props, '"k":\\s*(\\d+)', 1), '') AS INTEGER) AS props_k,
    COUNT(*) AS n,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1
""",
    doc=(
        "JSON extraction of the opaque payload (reference carries "
        "raw_payload opaquely, sql/init.sql:20; extended surface SURVEY "
        "§7 Phase 1 item 8): get_json_object($.k) -> int, grouped agg."
    ),
    tags=("json", "aggregates"),
)
def q_props_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            props_get("props", "k").cast("int").alias("props_k"), dec("value").alias("v")
        )
        .groupBy("props_k")
        .agg(F.count("*").alias("n"), F.sum("v").cast("double").alias("sum_value"))
    )


@register(
    "daily_event_pivot",
    oracle=f"""
SELECT
    strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
    {", ".join(f"COUNT(*) FILTER (WHERE event_type = '{t}') AS {t}" for t in EVENT_TYPES)}
FROM events
GROUP BY 1
""",
    doc=(
        "Pivot: per-day counts by event_type (extended surface, SURVEY "
        "§7 Phase 1 item 8). Explicit pivot values keep the plan a "
        "single pass; nulls filled to 0 to match COUNT FILTER."
    ),
    tags=("pivot", "aggregates"),
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    pivoted = (
        events.select(F.date_format("ts", "yyyy-MM-dd").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", list(EVENT_TYPES))
        .count()
    )
    return pivoted.na.fill(0, list(EVENT_TYPES))


@register(
    "rollup_event_type",
    oracle="""
SELECT
    event_type,
    COUNT(*) AS n,
    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY ROLLUP(event_type)
""",
    doc=(
        "ROLLUP grouping-sets aggregate (extended surface): per-type "
        "rows plus the NULL grand-total row, matching DuckDB ROLLUP."
    ),
    tags=("rollup", "grouping-sets", "aggregates"),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.rollup("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec("value")).cast("double").alias("total_value"),
    )
