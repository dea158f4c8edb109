"""TPC-H-style analytical queries over the star-schema fixtures.

The reference pipeline's analytical read side is ClickHouse
(`engagement_enriched`, reference src/process.py:17-31) — these queries
declare the equivalent warehouse capability surface on Spark: wide
grouped aggregation (q1-style), selective fact/dim join with top-k
(q3-style), and a multi-dimension snowflake join (q5-style).

Exactness: all money math runs in DECIMAL end-to-end (see
functions/exact.py) — products of 2-decimal columns are exact decimals
in both Spark and DuckDB, sums are order-independent, ORDER BY uses the
exact decimal (never its double projection), and only the final output
casts to DOUBLE.

Scale design per query is in each docstring; the common rules: filters
are expressed on the base scans (Catalyst pushes them into parquet:
PushedFilters), dimensions are broadcast explicitly, the big
fact-to-fact joins are left to shuffle-hash/sort-merge under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.exact import dec
from ..operators.util import fan_out
from ..sources.tables import load_table
from .registry import register

# Tight decimal types keep precision under Spark's 38-digit cap through
# the product chain: (12,2)*(4,2)=(17,4), *(4,2)=(22,6), sum adds 10.
_QTY = "decimal(12,2)"
_PRICE = "decimal(12,2)"
_FRAC = "decimal(3,2)"  # discounts/taxes are < 1.00


def _one() -> F.Column:
    return F.lit(1).cast(_FRAC)


@register(
    "pricing_summary",
    oracle="""
SELECT
    l_returnflag,
    l_linestatus,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)       AS sum_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)  AS sum_base_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                                                                 AS sum_disc_price,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))
             * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(3,2)))) AS DOUBLE)
                                                                 AS sum_charge,
    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_quantity)
                                                                 AS avg_qty,
    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(l_extendedprice)
                                                                 AS avg_price,
    CAST(SUM(CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) / COUNT(l_discount)
                                                                 AS avg_disc,
    COUNT(*)                                                     AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    doc=(
        "TPC-H q1-style pricing summary: single scan, pushed-down date "
        "filter, partial+final hash agg over 2 low-cardinality keys. "
        "The map-side combine collapses ~all rows before the shuffle — "
        "the plan that survives 100 TB unchanged."
    ),
    bench=True,
    tags=("aggregates", "scan", "pushdown"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    # fan_out: the fixture is one unsplittable row group; on a real
    # cluster the scan arrives in many splits and this is a no-op
    li = fan_out(
        load_table(spark, sf_dir, "lineitem").filter(
            F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
        )
    )
    qty = dec("l_quantity", _QTY)
    price = dec("l_extendedprice", _PRICE)
    disc = dec("l_discount", _FRAC)
    tax = dec("l_tax", _FRAC)
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(qty).cast("double").alias("sum_qty"),
        F.sum(price).cast("double").alias("sum_base_price"),
        F.sum(price * (_one() - disc)).cast("double").alias("sum_disc_price"),
        F.sum(price * (_one() - disc) * (_one() + tax)).cast("double").alias("sum_charge"),
        (F.sum(qty).cast("double") / F.count("l_quantity")).alias("avg_qty"),
        (F.sum(price).cast("double") / F.count("l_extendedprice")).alias("avg_price"),
        (F.sum(disc).cast("double") / F.count("l_discount")).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "forecast_revenue_change",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * CAST(l_discount AS DECIMAL(3,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
    doc=(
        "TPC-H q6-style forecast revenue: pure scan + conjunctive "
        "pushed-down range predicates + single decimal SUM — the "
        "canonical predicate-pushdown benchmark; zero shuffle beyond "
        "the final single-row reduce."
    ),
    bench=True,
    tags=("scan", "pushdown", "aggregates"),
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(dec("l_extendedprice", _PRICE) * dec("l_discount", _FRAC))
        .cast("double")
        .alias("revenue")
    )


@register(
    "shipmode_priority_counts",
    oracle="""
SELECT l.l_linestatus AS l_linestatus,
       COUNT(*) FILTER (WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH'))
           AS high_priority,
       COUNT(*) FILTER (WHERE o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
           AS low_priority
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l.l_linestatus
""",
    doc=(
        "TPC-H q12-style: fact-fact join + IN-list conditional counts "
        "(CASE-in-SUM form). Covers IN predicates and the "
        "join-then-pivot-count shape; date filter pushed to the "
        "lineitem scan."
    ),
    tags=("join", "case-when", "in-list", "aggregates"),
)
def q_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_priority"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_priority"),
        )
    )


@register(
    "top_orders_by_revenue",
    oracle="""
SELECT
    l.l_orderkey                                   AS l_orderkey,
    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                                                   AS revenue,
    o.o_orderdate                                  AS o_orderdate
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l.l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) DESC,
         o.o_orderdate ASC, l.l_orderkey ASC
LIMIT 10
""",
    doc=(
        "TPC-H q3-style: selective dim filter broadcast into the fact "
        "join, grouped revenue, top-10 via TakeOrderedAndProject "
        "ordered on the exact decimal sum. customer is broadcast "
        "explicitly; orders-lineitem is a shuffle join sized by AQE."
    ),
    bench=True,
    tags=("join", "topk", "aggregates", "pushdown"),
)
def q_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1998-06-01").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue_dec = F.sum(
        dec("l_extendedprice", _PRICE) * (_one() - dec("l_discount", _FRAC))
    )
    return (
        li.join(
            orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue_dec.alias("__rev_dec"))
        .orderBy(
            F.col("__rev_dec").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc()
        )
        .limit(10)
        .select(
            "l_orderkey", F.col("__rev_dec").cast("double").alias("revenue"), "o_orderdate"
        )
    )


def _view(spark: SparkSession, sf_dir: str, table: str) -> str:
    """Register the fixture table as a temp view for spark.sql queries
    (the SQL front door — same Catalyst plans as the DataFrame API)."""
    load_table(spark, sf_dir, table).createOrReplaceTempView(table)
    return table


@register(
    "late_ship_priority_counts",
    oracle="""
SELECT o.o_orderpriority AS o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o.o_orderpriority
""",
    doc=(
        "TPC-H q4-style correlated EXISTS (orders with an item shipped "
        ">90 days after order date), via the spark.sql front door. "
        "Catalyst decorrelates the subquery into a left-semi join on "
        "l_orderkey with the date predicate as join condition — no "
        "per-row re-execution, one shuffle; hash-matched against "
        "DuckDB running the identical correlated form."
    ),
    tags=("subquery", "exists", "semi", "sql"),
)
def q_late_ship_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "orders")
    _view(spark, sf_dir, "lineitem")
    return spark.sql(
        """
SELECT o.o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey
        AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
GROUP BY o.o_orderpriority
"""
    )


@register(
    "small_quantity_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (
      SELECT 0.2 * avg(l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
""",
    doc=(
        "TPC-H q17-style correlated *scalar* subquery (per-part average "
        "quantity threshold). Catalyst decorrelates to an aggregate-"
        "then-join: one pass computes avg(l_quantity) per partkey, "
        "joined back to the filtered fact — the subquery never "
        "re-executes per row. Decimal sum for cross-engine exactness."
    ),
    tags=("subquery", "scalar", "aggregates", "sql"),
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "lineitem")
    _view(spark, sf_dir, "part")
    return spark.sql(
        """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0
           AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#23'
  AND l.l_quantity < (
      SELECT 0.2 * avg(l2.l_quantity)
      FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""
    )


@register(
    "large_volume_customers",
    oracle="""
SELECT c.c_name AS c_name, o.o_orderkey AS o_orderkey,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(sum(l.l_quantity) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 20
""",
    doc=(
        "TPC-H q18-style IN-subquery over an aggregated HAVING set. "
        "Catalyst rewrites the IN to a left-semi join against the "
        "grouped lineitem relation; the outer aggregate groups on the "
        "already-shuffled orderkey. Top-20 is TakeOrderedAndProject."
    ),
    tags=("subquery", "in", "having", "topk", "sql"),
)
def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("customer", "orders", "lineitem"):
        _view(spark, sf_dir, t)
    return spark.sql(
        """
SELECT c.c_name AS c_name, o.o_orderkey AS o_orderkey,
       CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
       CAST(sum(l.l_quantity) AS DOUBLE) AS total_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
    SELECT l_orderkey FROM lineitem
    GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
GROUP BY c.c_name, o.o_orderkey, o.o_totalprice
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
LIMIT 20
"""
    )


@register(
    "regional_revenue",
    oracle="""
SELECT
    n.n_name                                       AS n_name,
    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                                                   AS revenue
FROM region r
JOIN nation n   ON n.n_regionkey = r.r_regionkey
JOIN supplier s ON s.s_nationkey = n.n_nationkey
JOIN customer c ON c.c_nationkey = s.s_nationkey
JOIN orders o   ON o.o_custkey  = c.c_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_suppkey = s.s_suppkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name
""",
    doc=(
        "TPC-H q5-style snowflake join: region/nation/supplier/customer "
        "all broadcast (each orders-of-magnitude smaller than the "
        "fact); lineitem-orders is the one shuffle join. Same-nation "
        "constraint rides the join keys, date filter pushed to the "
        "orders scan."
    ),
    bench=True,
    tags=("join", "broadcast", "aggregates", "pushdown"),
)
def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")

    dims = (
        supplier.join(
            F.broadcast(nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    cust = customer.select("c_custkey", "c_nationkey")
    fact = li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_suppkey", "l_extendedprice", "l_discount", "o_custkey"
    )
    joined = (
        fact.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(dims),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.sum(dec("l_extendedprice", _PRICE) * (_one() - dec("l_discount", _FRAC)))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "returned_item_customers",
    oracle="""
SELECT
    c.c_custkey                                    AS c_custkey,
    c.c_name                                       AS c_name,
    CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
                                                   AS revenue,
    CAST(c.c_acctbal AS DOUBLE)                    AS c_acctbal,
    n.n_name                                       AS n_name
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND l.l_returnflag = 'R'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) DESC,
         c.c_custkey ASC
LIMIT 20
""",
    doc=(
        "TPC-H q10-style returned-item reporting: which customers "
        "returned the most revenue last quarter. The returnflag + date "
        "filters are pushed into both fact scans, customer and nation "
        "are broadcast, and the top-20 runs as TakeOrderedAndProject "
        "on the exact decimal revenue (deterministic c_custkey "
        "tie-break). The one shuffle is the orderkey join; the "
        "customer-grain aggregate rides the AQE-sized exchange. "
        "Mirrors the reference's ClickHouse read side (reference "
        "src/process.py:17-31) as a warehouse ranking query."
    ),
    tags=("join", "broadcast", "topk", "aggregates", "pushdown"),
)
def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    rev_dec = F.sum(
        dec("l_extendedprice", _PRICE) * (_one() - dec("l_discount", _FRAC))
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev_dec.alias("__rev_dec"))
        .orderBy(F.col("__rev_dec").desc(), F.col("c_custkey").asc())
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.col("__rev_dec").cast("double").alias("revenue"),
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
            "n_name",
        )
    )


@register(
    "brand_bracket_revenue",
    oracle="""
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
           AS revenue
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 1  AND l.l_quantity <= 21)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
       AND l.l_quantity >= 10 AND l.l_quantity <= 30)
   OR (p.p_brand = 'Brand#25' AND p.p_size BETWEEN 1 AND 35
       AND l.l_quantity >= 20 AND l.l_quantity <= 40)
""",
    doc=(
        "TPC-H q19-style disjunctive bracket predicate: three OR'd "
        "brand/size/quantity brackets across the part-lineitem join. "
        "Catalyst extracts the common sub-predicates each side can "
        "evaluate alone (p_brand IN (...) AND p_size ranges to the "
        "part scan; the quantity envelope to the lineitem scan) and "
        "pushes them into the parquet scans, keeping the full "
        "disjunction as the post-join residual — the classic test "
        "that OR predicates don't defeat pushdown. part is broadcast; "
        "single-row decimal reduce, no further shuffle."
    ),
    tags=("join", "pushdown", "disjunction", "aggregates"),
)
def q_brand_bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    qty = F.col("l_quantity")
    size = F.col("p_size")
    bracket = (
        ((F.col("p_brand") == "Brand#12") & size.between(1, 15) & (qty >= 1) & (qty <= 21))
        | ((F.col("p_brand") == "Brand#23") & size.between(1, 25) & (qty >= 10) & (qty <= 30))
        | ((F.col("p_brand") == "Brand#25") & size.between(1, 35) & (qty >= 20) & (qty <= 40))
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .filter(bracket)
        .agg(
            F.sum(dec("l_extendedprice", _PRICE) * (_one() - dec("l_discount", _FRAC)))
            .cast("double")
            .alias("revenue")
        )
    )


@register(
    "brand_supplier_counts",
    oracle="""
SELECT p.p_brand AS p_brand, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_size >= 40
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand
""",
    doc=(
        "TPC-H q16-style supplier diversity: distinct suppliers per "
        "brand for large parts, excluding blacklisted (negative-"
        "balance) suppliers via NOT IN. Catalyst plans the NOT IN as "
        "a null-aware anti join (BroadcastNestedLoopJoin degenerate "
        "form is avoided because s_suppkey is non-null: it becomes a "
        "broadcast anti hash join); count(DISTINCT) runs as the "
        "standard two-shuffle expand-dedup-agg. Via the spark.sql "
        "front door to exercise the SQL planner path."
    ),
    tags=("subquery", "not-in", "anti", "distinct", "aggregates", "sql"),
)
def q_brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    for t in ("part", "lineitem", "supplier"):
        _view(spark, sf_dir, t)
    return spark.sql(
        """
SELECT p.p_brand AS p_brand, count(DISTINCT l.l_suppkey) AS supplier_cnt
FROM part p
JOIN lineitem l ON p.p_partkey = l.l_partkey
WHERE p.p_size >= 40
  AND l.l_suppkey NOT IN (
      SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand
"""
    )


@register(
    "dominant_event_types",
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
HAVING SUM(CAST(value AS DECIMAL(18,2))) * 5 > (
    SELECT SUM(CAST(value AS DECIMAL(18,2))) FROM events)
""",
    doc=(
        "TPC-H q11-style HAVING against an uncorrelated scalar "
        "subquery: event types carrying more than a 1/5 share of "
        "global value. The threshold is written as sum*5 > global "
        "(decimal multiply) rather than global/5 — decimal division "
        "scale rules differ between engines, integer multiplication "
        "doesn't. Catalyst evaluates the scalar subquery once "
        "(ReusedSubquery/Subquery node), then filters the grouped "
        "relation — two scans of events, one shuffle each, no per-"
        "group re-execution. Via the spark.sql front door."
    ),
    tags=("subquery", "scalar", "having", "aggregates", "sql"),
)
def q_dominant_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "events")
    return spark.sql(
        """
SELECT event_type,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY event_type
HAVING SUM(CAST(value AS DECIMAL(18,2))) * 5 > (
    SELECT SUM(CAST(value AS DECIMAL(18,2))) FROM events)
"""
    )


@register(
    "nation_pair_trade",
    oracle="""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       year(l.l_shipdate) AS l_year,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE)
           AS revenue
FROM supplier s
JOIN lineitem l ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
""",
    doc=(
        "TPC-H q7-style bilateral trade volume: revenue between a "
        "nation pair (both directions kept distinct) by ship year. "
        "Exercises year() extraction as a grouping key and a "
        "disjunctive predicate spanning BOTH join sides — Catalyst "
        "cannot push the pair condition to either scan alone, so it "
        "must survive as a post-join filter while the per-side "
        "IN ('NATION_3','NATION_7') residuals do push into the two "
        "broadcast nation dims. lineitem-orders is the one big "
        "shuffle; everything else is broadcast."
    ),
    tags=("join", "broadcast", "disjunction", "date-functions", "aggregates"),
)
def q_nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = F.col("n_name").isin("NATION_3", "NATION_7")
    n1 = nation.filter(pair).withColumnsRenamed(
        {"n_nationkey": "n1_key", "n_name": "supp_nation"}
    )
    n2 = nation.filter(pair).withColumnsRenamed(
        {"n_nationkey": "n2_key", "n_name": "cust_nation"}
    )
    joined = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
        )
    )
    return joined.groupBy(
        "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
    ).agg(
        F.sum(dec("l_extendedprice", _PRICE) * (_one() - dec("l_discount", _FRAC)))
        .cast("double")
        .alias("revenue")
    )


@register(
    "customer_order_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
    SELECT c.c_custkey AS c_custkey, COUNT(o.o_orderkey) AS c_count
    FROM customer c
    LEFT OUTER JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
    GROUP BY c.c_custkey
) per_cust
GROUP BY c_count
""",
    doc=(
        "TPC-H q13-style order-count distribution: LEFT OUTER join with "
        "the filter folded into the join condition (NOT the WHERE clause "
        "- putting it in WHERE would turn the outer join inner and drop "
        "zero-order customers), COUNT over the nullable right key so "
        "unmatched customers count 0, then a second aggregation over the "
        "first's output. Scale: the first groupBy shuffles on c_custkey "
        "(same key as the join, so AQE coalesces into one exchange "
        "chain); the second input is one row per customer and the "
        "distribution output is ~tens of rows - the classic two-level "
        "agg whose second level is nearly free."
    ),
    tags=("join", "outer", "aggregates", "two-level"),
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey", "o_orderkey")
    )
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "top_revenue_supplier",
    oracle="""
WITH revenue AS (
    SELECT l_suppkey AS supplier_no,
           SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))) AS tr
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-10-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey
)
SELECT s.s_suppkey AS s_suppkey, s.s_name AS s_name,
       CAST(r.tr AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.tr = (SELECT MAX(tr) FROM revenue)
""",
    doc=(
        "TPC-H q15-style top supplier: aggregate a quarter's revenue per "
        "supplier, then keep the row(s) equal to the MAX of that same "
        "derived table. The max is computed on the exact DECIMAL (never "
        "the double projection - a double max can tie-break differently "
        "across engines), and the one-row max relation is broadcast back "
        "against the aggregate rather than re-scanning lineitem. Scale: "
        "one shuffle for the per-supplier agg; the max+filter is a "
        "broadcast of a single row; supplier dim joins broadcast."
    ),
    tags=("subquery", "scalar", "aggregates", "broadcast"),
)
def q_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-10-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(dec("l_extendedprice", _PRICE) * (_one() - dec("l_discount", _FRAC))).alias(
            "tr"
        )
    )
    mx = rev.agg(F.max("tr").alias("mx"))
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.join(F.broadcast(mx), F.col("tr") == F.col("mx"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name", F.col("tr").cast("double").alias("total_revenue")
        )
    )


@register(
    "lone_late_suppliers",
    oracle="""
SELECT s.s_name AS s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
JOIN orders o    ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
      SELECT 1
      FROM lineitem l3 JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
      WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name
""",
    doc=(
        "TPC-H q21-style waiting-supplier blame: late lines (shipped "
        ">60 days after the order date, finished orders) on multi-"
        "supplier orders where no OTHER supplier was also late - the "
        "supplier solely responsible for the wait. The fixture lacks "
        "commit/receipt dates, so lateness is ship-vs-order-date "
        "(reference semantics preserved: EXISTS another supplier, NOT "
        "EXISTS another LATE supplier). Spark side decomposes the "
        "quantifiers the way Catalyst itself would - EXISTS -> left_semi "
        "against all lines, NOT EXISTS -> left_anti against the late "
        "set's self-alias - keeping every join an equi-join on "
        "l_orderkey with the <> supplier test as a residual (no "
        "BroadcastNestedLoopJoin). Scale: the late set is a small "
        "fraction of lineitem; both quantifier joins shuffle on "
        "l_orderkey, the same key as the orders join, so the exchange "
        "is reused across all three."
    ),
    tags=("subquery", "exists", "anti-join", "semi-join", "join"),
)
def q_lone_late_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    late = (
        li.join(orders_f, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2"))
    with_other = late.join(
        l2,
        (F.col("l_orderkey") == F.col("k2")) & (F.col("l_suppkey") != F.col("s2")),
        "left_semi",
    )
    late_b = late.select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    solo = with_other.join(
        late_b,
        (F.col("l_orderkey") == F.col("k3")) & (F.col("l_suppkey") != F.col("s3")),
        "left_anti",
    )
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        solo.join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )


@register(
    "idle_rich_customers",
    oracle="""
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE CAST(c_acctbal AS DECIMAL(12,2))
        * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
""",
    doc=(
        "TPC-H q22-style untapped customers: above-average-balance "
        "customers with no urgent orders (every fixture customer has "
        "SOME order, so the reference's no-orders-at-all anti join "
        "would be vacuous; scoping the NOT EXISTS to '1-URGENT' keeps "
        "the anti join selective). The above-average test is written "
        "bal * count > sum in DECIMAL - dividing for a literal AVG "
        "would compare doubles whose last-ulp rounding can disagree "
        "across engines and flip membership at the boundary. Via the "
        "spark.sql front door: Catalyst evaluates the two uncorrelated "
        "scalar subqueries once each and rewrites NOT EXISTS into a "
        "left-anti hash join on o_custkey. Scale: customer scans twice "
        "(once per scalar, collapsible by AQE subquery reuse), the anti "
        "join shuffles on custkey only."
    ),
    tags=("subquery", "scalar", "anti-join", "aggregates", "sql"),
)
def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    _view(spark, sf_dir, "customer")
    _view(spark, sf_dir, "orders")
    return spark.sql(
        """
SELECT c_nationkey, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE CAST(c_acctbal AS DECIMAL(12,2))
        * (SELECT COUNT(*) FROM customer WHERE c_acctbal > 0)
      > (SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
GROUP BY c_nationkey
"""
    )


@register(
    "cheapest_supplier_per_part",
    oracle="""
SELECT DISTINCT l_partkey, l_suppkey,
       CAST(min_price AS DOUBLE) AS min_price
FROM (
    SELECT l_partkey, l_suppkey,
           CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
           MIN(CAST(l_extendedprice AS DECIMAL(12,2))) OVER (
               PARTITION BY l_partkey) AS min_price
    FROM lineitem
) priced
WHERE price = min_price
""",
    doc=(
        "TPC-H q2-style groupwise minimum (the fixture has no "
        "partsupp, so lineitem prices stand in for supply costs): "
        "every supplier tied at a part's minimum price survives - "
        "tie RETENTION is what separates this from a rank()=1 pick. "
        "Plan: window MIN over l_partkey then filter - ONE shuffle, "
        "where the naive self-join-to-aggregate form (q2's textbook "
        "correlated subquery) shuffles twice and re-scans; Catalyst "
        "does not do that rewrite itself, so the engine encodes it. "
        "The min comparison is decimal = decimal (exact); the price "
        "only casts to DOUBLE on output."
    ),
    tags=("window-function", "groupwise-min", "aggregates"),
)
def q_cheapest_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", dec("l_extendedprice", _PRICE).alias("price")
    )
    w = Window.partitionBy("l_partkey")
    priced = li.withColumn("min_price", F.min("price").over(w))
    return (
        priced.filter(F.col("price") == F.col("min_price"))
        .select(
            "l_partkey", "l_suppkey", F.col("min_price").cast("double").alias("min_price")
        )
        .distinct()
    )


@register(
    "nation_market_share",
    oracle="""
SELECT o_year,
       CAST(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                          ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
            / CAST(SUM(volume) AS DOUBLE) AS DOUBLE)      AS mkt_share
FROM (
    SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(l.l_extendedprice AS DECIMAL(12,2))
               * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2))) AS volume,
           n2.n_name AS nation
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'AMERICA'
      AND p.p_type = 'ECONOMY'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY o_year
""",
    doc=(
        "TPC-H q8-style national market share: NATION_1's share of "
        "ECONOMY-part revenue delivered into AMERICA customers, per "
        "order year. Every dimension (part filter, supplier+nation, "
        "customer+nation+region) broadcasts; lineitem-orders is the "
        "single shuffle join; the share is a conditional decimal SUM "
        "over the same joined fact, so one aggregation pass computes "
        "numerator and denominator without a second scan. Filters on "
        "p_type / r_name / o_orderdate push into the parquet scans."
    ),
    tags=("join", "broadcast", "aggregates", "conditional-agg", "pushdown"),
)
def q_nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    cust_dim = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_dim = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation"))),
            F.col("s_nationkey") == F.col("n2_key"),
        )
        .select("s_suppkey", "nation")
    )
    volume = dec("l_extendedprice", _PRICE) * (_one() - dec("l_discount", _FRAC))
    fact = (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_dim), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_dim), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            volume.alias("volume"),
            "nation",
        )
    )
    zero = F.lit(0).cast("decimal(18,4)")
    return fact.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("nation") == "NATION_1", F.col("volume")).otherwise(zero)).cast("double")
            / F.sum("volume").cast("double")
        )
        .cast("double")
        .alias("mkt_share")
    )
