"""Custom stateful streaming operator + the SQL front door."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from flink_engagement_pipeline_spark.sources.tables import load_table, register_views
from flink_engagement_pipeline_spark.streaming import pipeline as sp
from flink_engagement_pipeline_spark.streaming import sinks as sk
from flink_engagement_pipeline_spark.streaming.stateful import running_user_totals

SF = "/root/testdata/sf0.001"


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """State must survive micro-batch boundaries: two files forced into
    two batches via maxFilesPerTrigger; the last emitted totals per
    user must equal the global batch aggregation."""
    d = tmp_path / "stream-in"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "a.parquet")
    shutil.copy(f"{SF}/events.parquet", d / "b.parquet")

    # force 2 micro-batches so the second must read back saved state
    stream = sp.read_events_stream(spark, str(d), max_files_per_trigger=1)
    totals = running_user_totals(stream)
    mem = sk.MemorySink()
    (
        totals.writeStream.foreachBatch(
            lambda df, bid: mem.write_batch(df, bid)
        )
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert len(mem.batches) >= 2, "expected multiple micro-batches"
    # last emission per user wins (update mode)
    final: dict = {}
    for _, rows in sorted(mem.batches):
        for r in rows:
            final[r["user_id"]] = (r["n_events"], r["total_value"])

    events = load_table(spark, SF, "events")
    doubled = events.unionByName(events)
    expect = {
        r["user_id"]: (r["n"], r["s"])
        for r in doubled.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(expect)
    for uid, (n, s) in expect.items():
        fn, fs = final[uid]
        assert fn == n, f"user {uid} count {fn} != {n}"
        assert fs == pytest.approx(s, rel=1e-9)


def test_sql_front_door_matches_dataframe(spark, sf_dir):
    """The same enrichment expressed through spark.sql over registered
    temp views must equal the DataFrame-API query (SURVEY §7 Phase 1
    item 5: both front doors tested)."""
    from flink_engagement_pipeline_spark.plans import REGISTRY

    register_views(spark, sf_dir)
    sql_df = spark.sql(
        """
        SELECT
            e.event_id, e.user_id, e.event_type, e.ts, e.value,
            CAST(e.value AS DOUBLE) / 1000.0 AS engagement_seconds,
            CASE WHEN c.c_acctbal > 0
                 THEN ROUND(CAST(e.value AS DOUBLE) / c.c_acctbal, 4)
                 ELSE NULL END AS engagement_pct,
            c.c_name AS user_name,
            c.c_mktsegment AS user_segment,
            c.c_nationkey AS user_nationkey,
            c.c_acctbal AS user_acctbal
        FROM events e
        LEFT JOIN customer c ON e.user_id = c.c_custkey
        """
    )
    df_api = REGISTRY["enrich_events"].spark(spark, sf_dir)
    assert sql_df.schema == df_api.schema
    assert sorted(map(tuple, sql_df.collect())) == sorted(
        map(tuple, df_api.collect())
    )


def test_sql_front_door_window_agg(spark, sf_dir):
    """HOP aggregation through pure SQL (window TVF-style via the
    window() function in SQL) equals the DataFrame implementation."""
    from flink_engagement_pipeline_spark.plans import REGISTRY

    register_views(spark, sf_dir)
    sql_df = spark.sql(
        """
        SELECT window.start AS window_start, window.end AS window_end,
               user_id,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS engagement_sum
        FROM events
        GROUP BY window(ts, '10 minutes', '5 seconds'), user_id
        """
    )
    df_api = REGISTRY["hop_engagement_sum"].spark(spark, sf_dir)
    assert sorted(map(tuple, sql_df.collect())) == sorted(
        map(tuple, df_api.collect())
    )


def test_tws_processor_matches_apply_in_pandas_with_state(spark, tmp_path):
    """The Spark 4 StatefulProcessor (transformWithStateInPandas) form
    must produce the same final per-user totals as the
    applyInPandasWithState form and the batch aggregation.

    Requires protobuf: Spark's TWS state server speaks protobuf to the
    Python worker; the container ships pyspark without it, so this
    test runs wherever the engine actually deploys and skips here."""
    pytest.importorskip("google.protobuf")
    from flink_engagement_pipeline_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    d = tmp_path / "stream-in"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "a.parquet")
    shutil.copy(f"{SF}/events.parquet", d / "b.parquet")

    stream = sp.read_events_stream(spark, str(d), max_files_per_trigger=1)
    totals = running_user_totals_tws(stream)
    mem = sk.MemorySink()
    (
        totals.writeStream.foreachBatch(lambda df, bid: mem.write_batch(df, bid))
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt-tws"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    assert len(mem.batches) >= 2, "expected multiple micro-batches"
    final: dict = {}
    for _, rows in sorted(mem.batches):
        for r in rows:
            final[r["user_id"]] = (r["n_events"], r["total_value"])

    events = load_table(spark, SF, "events")
    doubled = events.unionByName(events)
    expect = {
        r["user_id"]: (r["n"], r["s"])
        for r in doubled.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(expect)
    for uid, (n, s) in expect.items():
        fn, fs = final[uid]
        assert fn == n, f"user {uid} count {fn} != {n}"
        assert fs == pytest.approx(s, rel=1e-9)
