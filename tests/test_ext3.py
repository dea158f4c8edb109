"""Unit tests for the round-5 extension queries (queries_ext3.py) —
the registry oracle proves cross-engine equality; these pin the
SEMANTIC quality claims the doc strings make (sketch accuracy, Bloom
guarantees, interval-merge algebra, rerank recall)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_engagement_pipeline_spark.plans.registry import REGISTRY


def _run(spark, sf_dir, name):
    return REGISTRY[name].spark(spark, sf_dir)


def test_hll_estimate_is_accurate(spark, sf_dir):
    # m=64 registers -> standard error ~1.04/sqrt(64) ~ 13%; assert a
    # generous 3-sigma band so the test pins "this is a real HLL",
    # not fixture luck.
    rows = _run(spark, sf_dir, "hll_portable_reach").collect()
    assert rows, "no event types"
    for r in rows:
        assert 0 < r["registers_used"] <= 64
        assert abs(r["rel_err"]) < 0.40, (
            r["event_type"], r["hll_estimate"], r["exact_distinct"]
        )


def test_bloom_no_false_negatives_and_bounded_fp(spark, sf_dir):
    row = _run(spark, sf_dir, "events_bloom_prune").collect()[0]
    # the structural guarantee: a Bloom filter NEVER misses a member
    assert row["n_false_negatives"] == 0
    assert row["n_bloom_pass"] >= row["n_true_members"]
    # 512 bits / k=3 over the fixture's purchaser count keeps the
    # false-positive rate well under 50% of non-members
    non_members = row["n_probed"] - row["n_true_members"]
    if non_members:
        assert row["n_false_positives"] / non_members < 0.5


def test_active_coverage_interval_algebra(spark, sf_dir):
    df = _run(spark, sf_dir, "user_active_coverage")
    bad = df.filter(
        (F.col("covered_us") < 300 * 1_000_000)
        | (F.col("covered_us") < F.col("n_intervals") * 300 * 1_000_000)
        | (F.col("n_intervals") < 1)
    ).count()
    # every merged interval covers at least one 5-minute window, and
    # k disjoint intervals cover at least k windows
    assert bad == 0


def test_matryoshka_rerank_agrees_with_exact_topk(spark, sf_dir):
    """The coarse 16-dim stage is a real pruner, not a shuffler: the
    re-ranked top-10 must share most of the exact full-dim top-10
    (dot-product order). On the synthetic fixture the prefix dims
    carry signal, so recall >= 0.5 is a conservative floor."""
    from flink_engagement_pipeline_spark.llm.similarity import _as_double, _dot
    from flink_engagement_pipeline_spark.sources.tables import load_table

    got = {r["vec_id"] for r in _run(spark, sf_dir, "embedding_matryoshka_rerank").collect()}
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("q"))
    full = _dot(_as_double(F.col("embedding")), _as_double(F.col("q")))
    exact = {
        r["vec_id"]
        for r in emb.join(F.broadcast(q))
        .select("vec_id", full.alias("s"))
        .orderBy(F.col("s").desc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    }
    assert len(got & exact) >= 5, (sorted(got), sorted(exact))


def test_cms_one_sided_error(spark, sf_dir):
    """Count-min's structural guarantee: the estimate NEVER
    undercounts (every row's counter includes the key's full count
    plus collisions), so overcount >= 0 on every probed key — and
    with 3x1024 counters over the fixture's key cardinality,
    collisions stay small relative to the key's own count."""
    rows = _run(spark, sf_dir, "cms_user_frequency").collect()
    assert rows
    for r in rows:
        assert r["overcount"] >= 0, r
        assert r["cms_estimate"] >= r["true_count"], r


def test_scd2_versions_partition_time(spark, sf_dir):
    """Per customer: exactly one current version, and version
    intervals chain (every non-current row's valid_to equals some
    other version's valid_from — the lead() contract)."""
    df = _run(spark, sf_dir, "orders_scd2_history")
    per_cust = df.groupBy("cust_key").agg(
        F.sum("is_current").alias("n_current"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    assert per_cust.filter(F.col("n_current") != 1).count() == 0
    # chaining: count(valid_to is null) == count(is_current)
    assert (
        df.filter(F.col("valid_to").isNull()).count()
        == df.filter(F.col("is_current") == 1).count()
    )


def test_ols_slope_matches_numpy(spark, sf_dir):
    """The integer-moment closed form equals an independent float
    computation of the same regression to ~1e-6 relative."""
    import numpy as np

    from flink_engagement_pipeline_spark.sources.tables import load_table

    rows = _run(spark, sf_dir, "events_value_trend_ols").collect()
    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("unix_micros(ts) div 3600000000 - 438000").alias("x"),
            F.expr(
                "CASE WHEN value IS NULL THEN 0 WHEN value >= 0 THEN "
                "CAST(floor(value * 100 + 0.5) AS BIGINT) ELSE "
                "-CAST(floor(-value * 100 + 0.5) AS BIGINT) END"
            ).alias("y"),
        )
        .toPandas()
    )
    for r in rows:
        g = ev[ev.event_type == r["event_type"]]
        slope = np.polyfit(g.x.astype(float), g.y.astype(float), 1)[0]
        assert abs(slope - r["slope_cents_per_hr"]) <= max(
            1e-6, 1e-6 * abs(slope)
        ), (r["event_type"], slope, r["slope_cents_per_hr"])
