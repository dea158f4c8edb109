"""Second extension batch: as-of join, per-group top-k, TF-IDF."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..llm.text import words
from ..operators.asof import asof_join_backward
from ..operators.util import fan_out
from ..sources.tables import load_table
from .registry import register


@register(
    "events_asof_orders",
    oracle="""
WITH u AS (
    SELECT o_custkey AS ukey, o_orderdate AS ut, 0 AS is_left,
           NULL::BIGINT AS event_id, NULL::TIMESTAMP AS ts, NULL::DOUBLE AS value,
           o_orderkey, o_totalprice
    FROM orders
    UNION ALL
    SELECT user_id, CAST(ts AS TIMESTAMP), 1,
           event_id, CAST(ts AS TIMESTAMP), value,
           NULL, NULL
    FROM events
),
w AS (
    SELECT *,
           last_value(o_orderkey IGNORE NULLS) OVER (
               PARTITION BY ukey ORDER BY ut, is_left, o_orderkey NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_orderkey,
           last_value(o_totalprice IGNORE NULLS) OVER (
               PARTITION BY ukey ORDER BY ut, is_left, o_orderkey NULLS FIRST
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_totalprice
    FROM u
)
SELECT event_id, ukey AS user_id, ts, value,
       c_orderkey AS o_orderkey, c_totalprice AS o_totalprice
FROM w
WHERE is_left = 1
""",
    doc=(
        "As-of backward join: each event picks the user's most recent "
        "order with o_orderdate <= ts (latest orderkey on date ties). "
        "Union-merge implementation: one shuffle + one sort, never a "
        "range-explode or per-row probe (operators/asof.py). Oracle "
        "mirrors the same carry-forward window (DuckDB's native ASOF "
        "JOIN is tie-unstable, so the explicit form is used)."
    ),
    bench=True,
    tags=("asof-join", "temporal", "window-function"),
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    return asof_join_backward(
        events,
        orders,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        payload_cols=["o_orderkey", "o_totalprice"],
        tiebreak="o_orderkey",
    ).select("event_id", "user_id", "ts", "value", "o_orderkey", "o_totalprice")


@register(
    "events_dim_asof",
    oracle="""
WITH hist AS (
    SELECT o_custkey,
           o_orderdate AS valid_from,
           row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS version_no,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS cum_spend,
           c_mktsegment
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
),
u AS (
    SELECT o_custkey AS ukey, valid_from AS ut, 0 AS is_left, version_no AS tb,
           NULL::BIGINT AS event_id, NULL::TIMESTAMP AS ts, NULL::DOUBLE AS value,
           version_no, cum_spend, c_mktsegment
    FROM hist
    UNION ALL
    SELECT user_id, CAST(ts AS TIMESTAMP), 1, NULL,
           event_id, CAST(ts AS TIMESTAMP), value, NULL, NULL, NULL
    FROM events
),
w AS (
    SELECT *,
           last_value(version_no IGNORE NULLS) OVER win AS v_no,
           last_value(cum_spend IGNORE NULLS) OVER win AS v_spend,
           last_value(c_mktsegment IGNORE NULLS) OVER win AS v_seg
    FROM u
    WINDOW win AS (
        PARTITION BY ukey ORDER BY ut, is_left, tb NULLS FIRST
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
    )
)
SELECT event_id, ukey AS user_id, ts, value,
       v_no AS version_no, v_spend AS cum_spend, v_seg AS c_mktsegment
FROM w
WHERE is_left = 1
""",
    doc=(
        "Dim-HISTORY as-of join — the event-time generalization of the "
        "reference's `FOR SYSTEM_TIME AS OF` temporal lookup (reference "
        "src/process.py:180-182): instead of probing the *current* "
        "dimension row, each event joins the dimension VERSION that was "
        "valid at the event's timestamp. The versioned (SCD-2 style) "
        "customer dimension is synthesized deterministically from "
        "orders: every order bumps version_no and the exact-decimal "
        "cumulative spend, and carries the static c_mktsegment "
        "attribute. The temporal probe is the same union-merge as-of "
        "pattern as events_asof_orders (one shuffle + one sort, no "
        "range explode); events before a customer's first version get "
        "NULL dim columns, matching the reference's LEFT lookup join. "
        "At 100 TB the history build is one window over the dim delta "
        "(small vs the fact side) and the probe costs exactly one "
        "fact-side shuffle on the join key."
    ),
    tags=("asof-join", "temporal", "dim-history", "scd2"),
)
def q_events_dim_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    return events_dim_asof(events, customer_version_history(spark, sf_dir))


def customer_version_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SCD-2 style versioned customer dimension synthesized from
    orders: each order bumps version_no and the exact-decimal
    cumulative spend; c_mktsegment rides along as the static
    attribute. Shared by the batch query and the streaming
    micro-batch temporal join (tests/test_streaming.py)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"
    )
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("version_no", F.row_number().over(w))
        .withColumn(
            "cum_spend",
            F.sum(dec("o_totalprice")).over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("double"),
        )
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(
            "o_custkey",
            F.col("o_orderdate").alias("valid_from"),
            "version_no",
            "cum_spend",
            "c_mktsegment",
        )
    )


def events_dim_asof(events: DataFrame, hist: DataFrame) -> DataFrame:
    """Event-time temporal probe of the version history — works on any
    events frame (a micro-batch included), so streaming reuses the
    exact batch code path."""
    return asof_join_backward(
        events,
        hist,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="valid_from",
        payload_cols=["version_no", "cum_spend", "c_mktsegment"],
        tiebreak="version_no",
    ).select(
        "event_id", "user_id", "ts", "value",
        "version_no", "cum_spend", "c_mktsegment",
    )


@register(
    "top_users_per_type",
    oracle="""
SELECT event_type, user_id, total_value, rn
FROM (
    SELECT event_type, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
           row_number() OVER (
               PARTITION BY event_type
               ORDER BY SUM(CAST(value AS DECIMAL(18,2))) DESC, user_id ASC
           ) AS rn
    FROM events
    GROUP BY event_type, user_id
)
WHERE rn <= 3
""",
    doc=(
        "Per-group top-k: top-3 users by total engagement per "
        "event_type via row_number partitioned by the group — rank "
        "state never exceeds the per-group key space; ordering on the "
        "exact decimal sum."
    ),
    tags=("topk", "window-function", "aggregates"),
)
def q_top_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    totals = events.groupBy("event_type", "user_id").agg(
        F.sum(dec("value")).alias("__tot")
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("__tot").desc(), F.col("user_id").asc()
    )
    return (
        totals.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "event_type",
            "user_id",
            F.col("__tot").cast("double").alias("total_value"),
            "rn",
        )
    )


@register(
    "events_from_buyers",
    oracle="""
SELECT e.event_id, e.user_id, e.event_type
FROM events e
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.user_id)
""",
    doc=(
        "LEFT SEMI join: events whose user has at least one order "
        "(EXISTS). Broadcast the distinct key side; no fact shuffle."
    ),
    tags=("join", "semi"),
)
def q_events_from_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return events.join(
        F.broadcast(orders), events.user_id == orders.o_custkey, "left_semi"
    ).select("event_id", "user_id", "event_type")


@register(
    "events_from_non_buyers",
    oracle="""
SELECT e.event_id, e.user_id, e.event_type
FROM events e
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = e.user_id)
""",
    doc="LEFT ANTI join: events whose user has no order (NOT EXISTS).",
    tags=("join", "anti"),
)
def q_events_from_non_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return events.join(
        F.broadcast(orders), events.user_id == orders.o_custkey, "left_anti"
    ).select("event_id", "user_id", "event_type")


@register(
    "heavy_users",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY user_id
HAVING COUNT(*) >= 80
""",
    doc="HAVING clause: post-aggregation filter on the group count.",
    tags=("aggregates", "having"),
)
def q_heavy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("total_value"),
        )
        .filter(F.col("n_events") >= 80)
    )


@register(
    "user_value_median",
    oracle="""
SELECT user_id,
       median(value)  AS median_value,
       count(*)       AS n_events
FROM events
GROUP BY user_id
""",
    doc=(
        "Grouped-map applyInPandas (SURVEY §2.11 extension surface): "
        "per-user median via an Arrow-batched pandas group function — "
        "the pattern for per-group logic Spark aggregates can't "
        "express. pandas and DuckDB both interpolate even-count "
        "medians as the mean of the middle pair, so the oracle "
        "hash-matches."
    ),
    tags=("pandas-udf", "grouped-map", "aggregates"),
)
def q_user_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    events = load_table(spark, sf_dir, "events").select("user_id", "value")

    def _median(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "median_value": [pdf["value"].median()],
                "n_events": [len(pdf)],
            }
        )

    return events.groupBy("user_id").applyInPandas(
        _median, schema="user_id bigint, median_value double, n_events bigint"
    )


@register(
    "docs_tfidf",
    oracle="""
WITH toks AS (
    SELECT doc_id,
           unnest(string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ')) AS term
    FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT tf.doc_id, tf.term, tf.tf, df.df,
       floor(tf.tf * ln((1.0 + n.n_docs) / (1.0 + df.df)) * 1000000 + 0.5) / 1000000 AS tfidf
FROM tf JOIN df USING (term) CROSS JOIN n
""",
    doc=(
        "TF-IDF per (doc, term): exact integer tf/df counts + smoothed "
        "idf. tfidf is ROUND(...,6) because Spark's Math.log and "
        "DuckDB's ln differ in the last ulp (verified); counts are the "
        "exact backbone. Plan: explode -> two hash aggs -> broadcast "
        "of the term-df side at this cardinality."
    ),
    tags=("llm", "text", "tfidf"),
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = fan_out(docs.select("doc_id", "text")).select(
        "doc_id", F.explode(words("text")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.count()
    idf = F.log((F.lit(1.0) + F.lit(float(n_docs))) / (F.lit(1.0) + F.col("df")))
    return tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        (F.floor(F.col("tf") * idf * 1_000_000 + F.lit(0.5)) / 1_000_000).alias("tfidf"),
    )


@register(
    "cdc_materialize",
    oracle="""
SELECT event_id, ts, user_id, event_type, value, props
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY event_id
        ORDER BY ts DESC NULLS LAST, value DESC NULLS LAST,
                 event_type DESC NULLS LAST, user_id DESC NULLS LAST,
                 props DESC NULLS LAST
    ) AS rn
    FROM events
)
WHERE rn = 1 AND (event_type <> 'error' OR event_type IS NULL)
""",
    doc=(
        "Postgres-CDC-style ingestion (S1): rows are serialized to a "
        "Debezium-style JSON envelope {op, after, ts_ms} (op='d' for "
        "error events), parsed back with a declared from_json schema, "
        "and materialized to current table state — latest change per "
        "key wins, keys whose latest op is a delete are absent. The "
        "oracle expresses the same changelog semantics directly over "
        "events. Round-trips the full wire format, so JSON serde, "
        "envelope schema, and upsert/delete semantics are all under "
        "the hash check."
    ),
    tags=("cdc", "source", "json", "dedup", "sql"),
)
def q_cdc_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from ..sources import cdc

    ev = load_table(spark, sf_dir, "events")
    src = ev.select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    wire = cdc.to_cdc_envelope(
        src,
        op=F.when(F.col("event_type") == "error", "d").otherwise("u"),
        ts_ms=F.expr("ts_us DIV 1000"),
    )
    row_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts_us", T.LongType(), False),
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("value", T.DoubleType(), True),
            T.StructField("props", T.StringType(), True),
        ]
    )
    changes = cdc.parse_cdc_envelope(wire, row_schema)
    state = cdc.materialize(
        changes,
        key="event_id",
        order=["ts_us", "value", "event_type", "user_id", "props"],
    )
    return state.select(
        "event_id",
        F.timestamp_micros("ts_us").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )


@register(
    "orders_events_interval_join",
    oracle="""
SELECT o.o_orderkey AS o_orderkey,
       COUNT(e.event_id)                                        AS n_events,
       CAST(COALESCE(SUM(CAST(e.value AS DECIMAL(18,2))), 0) AS DOUBLE)
                                                                AS sum_value
FROM orders o
LEFT JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.o_orderdate
 AND e.ts <  o.o_orderdate + INTERVAL 7 DAY
GROUP BY o.o_orderkey
""",
    doc=(
        "Interval/range join: per order, activity of the same user in "
        "the 7 days after the order (LEFT, so orderless-event weeks "
        "keep count 0). Plan shape that survives 100 TB: the *equi* "
        "half (user_id = o_custkey) drives the shuffle partitioning, "
        "the range predicate rides along as a join filter — never a "
        "cross product; a theta-only formulation would be BNLJ and is "
        "exactly what this query avoids. Skew note: a viscerally hot "
        "user concentrates one partition — salt via operators/skew.py "
        "at real scale."
    ),
    tags=("join", "range", "interval", "aggregates"),
)
def q_orders_events_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    joined = orders.join(
        ev,
        (ev["user_id"] == orders["o_custkey"])
        & (ev["ts"] >= orders["o_orderdate"])
        & (ev["ts"] < F.col("o_orderdate") + F.expr("INTERVAL 7 DAY")),
        "left",
    )
    return joined.groupBy("o_orderkey").agg(
        F.count("event_id").alias("n_events"),
        F.coalesce(F.sum(dec("value", "decimal(18,2)")), F.lit(0).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_value"),
    )


@register(
    "conversion_funnel",
    oracle="""
WITH ev AS (
    SELECT user_id, ts, event_type FROM events
    WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
),
v AS (
    SELECT user_id, min(ts) AS t1 FROM ev
    WHERE event_type = 'view' GROUP BY user_id
),
c AS (
    SELECT e.user_id, min(e.ts) AS t2
    FROM ev e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
    WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
    SELECT e.user_id, min(e.ts) AS t3
    FROM ev e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
    WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_viewed,
       (SELECT count(*) FROM c) AS n_clicked_after_view,
       (SELECT count(*) FROM p) AS n_purchased_after_click
""",
    doc=(
        "Ordered conversion funnel (view -> click -> purchase): each "
        "step counts only users whose step event strictly follows "
        "their previous step's first occurrence — the canonical "
        "engagement-analytics query over the reference's event "
        "domain, scoped to the first day so the funnel discriminates "
        "(56 -> 19 -> 3 users at sf0.01). Three chained min-aggregate "
        "+ range-join stages, "
        "each shuffling only (user_id, ts) pairs already reduced to "
        "one row per user; Catalyst keeps every join an equi-join on "
        "user_id with the time predicate as residual. At 100 TB the "
        "funnel prunes monotonically (each stage's input is the "
        "previous stage's survivors), so cost is dominated by the "
        "first step's scan."
    ),
    tags=("funnel", "join", "aggregates", "engagement"),
)
def q_conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("ts") < F.lit("2024-01-02").cast("timestamp"))
        .select("user_id", "ts", "event_type")
    )

    def first_after(step: str, prev: DataFrame, prev_ts: str, out: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == step)
        return (
            e.join(prev, "user_id")
            .filter(F.col("ts") > F.col(prev_ts))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )

    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = first_after("click", v, "t1", "t2")
    p = first_after("purchase", c, "t2", "t3")
    return (
        v.agg(F.count("*").alias("n_viewed"))
        .crossJoin(c.agg(F.count("*").alias("n_clicked_after_view")))
        .crossJoin(p.agg(F.count("*").alias("n_purchased_after_click")))
    )


@register(
    "events_profile",
    oracle="""
SELECT 'event_id' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT(event_id) AS n_null,
       COUNT(DISTINCT event_id) AS n_distinct,
       CAST(MIN(event_id) AS DOUBLE) AS min_v, CAST(MAX(event_id) AS DOUBLE) AS max_v
FROM events
UNION ALL
SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id),
       COUNT(DISTINCT user_id),
       CAST(MIN(user_id) AS DOUBLE), CAST(MAX(user_id) AS DOUBLE)
FROM events
UNION ALL
SELECT 'value', COUNT(*), COUNT(*) - COUNT(value),
       COUNT(DISTINCT value),
       MIN(value), MAX(value)
FROM events
UNION ALL
SELECT 'ts_us', COUNT(*), COUNT(*) - COUNT(ts),
       COUNT(DISTINCT epoch_us(CAST(ts AS TIMESTAMP))),
       CAST(MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS DOUBLE),
       CAST(MAX(epoch_us(CAST(ts AS TIMESTAMP))) AS DOUBLE)
FROM events
""",
    doc=(
        "Single-pass table profiling (per-column row/null/exact-"
        "distinct/min/max), the data-quality screen a corpus runs "
        "before training ingestion. The oracle is four UNION ALL "
        "scans for SQL clarity, but the Spark side computes ALL "
        "columns' statistics in ONE aggregation - Catalyst plans the "
        "multi-distinct via a single Expand (4x internal row growth, "
        "one scan, one shuffle) instead of four scans - then "
        "unpivots the 1-row result with stack(). Epoch-microsecond "
        "longs stand in for the timestamp min/max (exactly "
        "representable in DOUBLE < 2^53; formatted timestamps would "
        "hash differently across engines). Scale: one scan of the "
        "fact table regardless of how many columns are profiled; "
        "exact COUNT(DISTINCT) is the expensive honest answer - the "
        "approx_distinct_users query is the sketch-based cheap one."
    ),
    tags=("profiling", "aggregates", "distinct", "unpivot"),
)
def q_events_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts"))
    )
    one = ev.agg(
        F.count("*").alias("n"),
        (F.count("*") - F.count("event_id")).alias("null_eid"),
        F.countDistinct("event_id").alias("nd_eid"),
        F.min("event_id").cast("double").alias("min_eid"),
        F.max("event_id").cast("double").alias("max_eid"),
        (F.count("*") - F.count("user_id")).alias("null_uid"),
        F.countDistinct("user_id").alias("nd_uid"),
        F.min("user_id").cast("double").alias("min_uid"),
        F.max("user_id").cast("double").alias("max_uid"),
        (F.count("*") - F.count("value")).alias("null_val"),
        F.countDistinct("value").alias("nd_val"),
        F.min("value").alias("min_val"),
        F.max("value").alias("max_val"),
        (F.count("*") - F.count("ts_us")).alias("null_ts"),
        F.countDistinct("ts_us").alias("nd_ts"),
        F.min("ts_us").cast("double").alias("min_ts"),
        F.max("ts_us").cast("double").alias("max_ts"),
    )
    return one.select(
        F.expr(
            """stack(4,
            'event_id', n, null_eid, nd_eid, min_eid, max_eid,
            'user_id',  n, null_uid, nd_uid, min_uid, max_uid,
            'value',    n, null_val, nd_val, min_val, max_val,
            'ts_us',    n, null_ts,  nd_ts,  min_ts,  max_ts)
            AS (col_name, n_rows, n_null, n_distinct, min_v, max_v)"""
        )
    )
