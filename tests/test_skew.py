"""Salted aggregation must be bit-identical to the direct plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_engagement_pipeline_spark.functions.exact import dec
from flink_engagement_pipeline_spark.operators.skew import salted_sum
from flink_engagement_pipeline_spark.sources.tables import load_table


def test_salted_sum_equals_direct(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    direct = {
        r["user_id"]: (r["total_value"], r["n_events"])
        for r in events.groupBy("user_id")
        .agg(
            F.sum(dec("value")).cast("double").alias("total_value"),
            F.count("*").alias("n_events"),
        )
        .collect()
    }
    salted = {
        r["user_id"]: (r["total_value"], r["n_events"])
        for r in salted_sum(events, "user_id", "value").collect()
    }
    assert salted == direct  # exact equality, not approx


def test_salted_sum_spreads_hot_key(spark):
    # one key owning 90% of rows: the partial phase must see >1 salt
    df = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.lit(2)).alias("k"),
        (F.col("id") % 100).cast("double").alias("v"),
    )
    out = {r["k"]: r for r in salted_sum(df, "k", "v", n_salts=16).collect()}
    assert out[1]["n_events"] == 9_000 and out[2]["n_events"] == 1_000
    # exactness under the hot key
    expect = sum(float(i % 100) for i in range(10_000) if i % 10 < 9)
    assert out[1]["total_value"] == expect
