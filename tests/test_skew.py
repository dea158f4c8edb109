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


def test_aqe_splits_skewed_join(spark):
    """AQE skew-join: a sort-merge join with one hot key must be split
    at runtime (`skew=true` in the final adaptive plan) instead of one
    straggler task owning the hot partition — the join-side complement
    to salted aggregation, and the mechanism we rely on for skewed
    fact-fact joins at 100 TB."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    try:
        # shrink the skew thresholds so fixture-scale data exhibits the
        # production behavior; forbid broadcast so a real SMJ plans
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256k")
        left = spark.range(0, 300_000).select(
            F.when(F.col("id") < 250_000, F.lit(0))
            .otherwise(F.col("id"))
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad"),
        )
        right = spark.range(0, 1_000).select(
            F.col("id").alias("k2"), F.lit("dim").alias("d")
        )
        joined = (
            left.join(right, F.col("k") == F.col("k2"))
            .select(F.length("pad").alias("n"))
        )
        # collect() (not count(), which plans its own execution) so the
        # SAME QueryExecution holds the final adaptive plan
        rows = joined.collect()
        # k=0 carries 250k rows and matches one dim row; the uniform
        # tail (ids >= 250k) is disjoint from the dim key range
        assert len(rows) == 250_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan, plan[:500]
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_equals_plain_join_and_spreads(spark, sf_dir):
    """salted_join must return exactly the plain join's rows, run as a
    ShuffledHashJoin keyed by (key, salt) — never broadcast — and
    spread a hot key's rows across multiple salts."""
    from flink_engagement_pipeline_spark.operators.skew import salted_join

    events = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    out = salted_join(events, cust, "user_id", "c_custkey", "event_id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan, plan[:1500]
    assert "BroadcastHashJoin" not in plan
    assert "__salt" in plan  # the join key carries the salt
    got = sorted(
        (r["event_id"], r["c_name"])
        for r in out.select("event_id", "c_name").collect()
    )
    expect = sorted(
        (r["event_id"], r["c_name"])
        for r in events.join(
            cust, events["user_id"] == cust["c_custkey"]
        ).select("event_id", "c_name").collect()
    )
    assert got == expect and len(got) > 0
    # hot-key spread: a single dominant key must land on >1 salt
    df = spark.range(1000).select(
        F.lit(7).alias("k"), F.col("id").alias("rowid")
    )
    dim = spark.range(10).select(
        F.col("id").alias("dk"), (F.col("id") * 2).alias("payload")
    )
    j = salted_join(df, dim, "k", "dk", "rowid", n_salts=8)
    assert j.count() == 1000  # every fact row matched exactly once
