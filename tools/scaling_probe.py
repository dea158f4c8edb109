import time
from pyspark.sql import functions as F
from flink_engagement_pipeline_spark.session import get_spark
from flink_engagement_pipeline_spark.sources.datagen import gen_events
from flink_engagement_pipeline_spark.operators.windows import (
    hop_engagement_sum, cumulate_engagement_sum, tumbling_stats)
from flink_engagement_pipeline_spark.operators.dedup import latest_per_key
spark = get_spark("scaling-probe")
spark.range(1000000).selectExpr("sum(id)").write.format("noop").mode("overwrite").save()

def run(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0

for n in (100_000, 1_000_000, 10_000_000):
    raw = gen_events(spark, n, events_per_second=max(10, n // 100))
    ev = raw.select(
        "event_id", "ts", "user_id", "event_type",
        (F.coalesce(F.col("duration_ms"), F.lit(0)).cast("double") / 1000.0).alias("value"),
    ).cache()
    ev.count()
    for name, q in [
        ("latest_per_key", latest_per_key(ev, key="user_id")),
        ("tumbling_stats", tumbling_stats(ev)),
        ("cumulate", cumulate_engagement_sum(ev)),
        ("hop", hop_engagement_sum(ev)),
    ]:
        best = min(run(q) for _ in range(3))
        print(f"n={n:>9,} {name:>16}: {best:6.2f}s  {n/best/1e6:7.2f} M rows/s")
    ev.unpersist()

# Findings (2026-08-15, local[32], quiet host, min-of-3 per point;
# events_per_second scales with n so the EVENT-TIME SPAN — and with it
# the window-count output cardinality — stays constant while the input
# row count grows 100x; the datagen user domain is 150 keys):
#   n=100k : latest_per_key 0.35s, tumbling 0.27s, cumulate 0.43s, hop 0.40s
#   n=1M   : 0.33s / 0.22s / 0.34s / 0.34s
#   n=10M  : 0.43s / 0.55s / 0.60s / 0.57s  (17-23 M rows/s sustained)
# 100x input -> ~1.4x wall-clock: the fixed per-query overhead dominates
# until the 32 cores saturate, and the per-row scan+pre-aggregate cost
# is what scales — the property the two-phase window plans were built
# for (the explode multiplies PRE-AGGREGATED rows, never the input).
