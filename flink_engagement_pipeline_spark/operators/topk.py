"""Leaderboard top-k (SURVEY.md §2.6 A2, §2.7/§2.8).

The reference materializes a running top-k in a Redis sorted set
(``ZINCRBY``, reference src/process.py:92) and reads it back with
``ZRANGE leaderboard 0 -1 WITHSCORES`` (reference README.md:100). As a
declared query that is: total engagement per key, ordered descending,
top k — plus a rank() variant standing in for the sorted-set rank.

Scale design: ``orderBy(...).limit(k)`` compiles to
TakeOrderedAndProject — each partition keeps a k-row heap and the
driver merges k*numPartitions rows; no global sort, no single-task
shuffle. The rank() window runs *after* the limit, over k rows, never
over the full key space (a global rank() OVER (ORDER BY ...) is a
one-partition sort — an automatic scale-killer at 100 TB). Rank values
over the top-k subset equal the global ranks for those rows because
every strictly-greater total is inside the subset.

The ordering key is the exact DECIMAL sum (not its double projection),
so Spark and DuckDB order identically even in the last ulp; ties break
on the unique key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.exact import dec


def _totals(events: DataFrame, key: str, measure: str) -> DataFrame:
    return events.groupBy(key).agg(
        F.sum(dec(measure)).alias("__total_dec"),
        F.count("*").alias("n_events"),
    )


def leaderboard_topk(
    events: DataFrame, key: str = "user_id", measure: str = "value", k: int = 10
) -> DataFrame:
    totals = _totals(events, key, measure)
    return (
        totals.orderBy(F.col("__total_dec").desc_nulls_last(), F.col(key).asc())
        .limit(k)
        .select(key, F.col("__total_dec").cast("double").alias("total_value"), "n_events")
    )


def leaderboard_rank(
    events: DataFrame, key: str = "user_id", measure: str = "value", k: int = 100
) -> DataFrame:
    top = (
        _totals(events, key, measure)
        .orderBy(F.col("__total_dec").desc_nulls_last(), F.col(key).asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("__total_dec").desc_nulls_last())
    return top.select(
        F.rank().over(w).alias("rank"),
        key,
        F.col("__total_dec").cast("double").alias("total_value"),
        "n_events",
    )


def topk_oracle_sql(key: str = "user_id", measure: str = "value", k: int = 10) -> str:
    return f"""
SELECT
    {key},
    CAST(SUM(CAST({measure} AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
    COUNT(*) AS n_events
FROM events
GROUP BY {key}
ORDER BY SUM(CAST({measure} AS DECIMAL(18,2))) DESC NULLS LAST, {key} ASC
LIMIT {k}
"""


def rank_oracle_sql(key: str = "user_id", measure: str = "value", k: int = 100) -> str:
    return f"""
SELECT
    rank() OVER (ORDER BY total_dec DESC NULLS LAST) AS rank,
    {key},
    CAST(total_dec AS DOUBLE) AS total_value,
    n_events
FROM (
    SELECT
        {key},
        SUM(CAST({measure} AS DECIMAL(18,2))) AS total_dec,
        COUNT(*) AS n_events
    FROM events
    GROUP BY {key}
    ORDER BY total_dec DESC NULLS LAST, {key} ASC
    LIMIT {k}
)
"""
