#!/usr/bin/env python
"""Stage-level decomposition of media_video_neardup (r14 optimization
round, guide §1: measure first). Times each prefix of the composition
with the noop sink, min-of-N, so the per-stage cost is the delta
between consecutive rows. Run on a quiet host; host interference is
episodic and multi-second (BASELINE.md), so compare mins only."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_engagement_pipeline_spark.llm import multimodal as lm  # noqa: E402
from flink_engagement_pipeline_spark.session import get_spark  # noqa: E402
from flink_engagement_pipeline_spark.sources.tables import load_table  # noqa: E402


def timed(spark, name, make_df, n=4):
    runs = []
    for _ in range(n):
        df = make_df()
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        spark._jvm.System.gc()
    print(f"{name}: min {min(runs):.3f}s  (runs: "
          + ", ".join(f"{r:.3f}" for r in runs) + ")")
    return min(runs)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("video-profile")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    docs = load_table(spark, sf_dir, "documents")
    media = lm.docs_as_media(docs)

    timed(spark, "0 frames fan-out", lambda: lm.media_video_frames(media))
    timed(spark, "1 frame phash sigs", lambda: lm.media_phash(lm.media_video_frames(media)))
    timed(spark, "2 frame buckets", lambda: lm.media_phash_buckets(lm.media_video_frames(media)))
    timed(spark, "3 full video_neardup", lambda: lm.media_video_neardup(media))
    # doc-level family for comparison
    timed(spark, "4 doc phash sigs", lambda: lm.media_phash(media))
    timed(spark, "5 doc phash pairs", lambda: lm.media_phash_pairs(media))

    # breakdown inside sigs: shingle+md5+bin explode only (pre-agg)
    def binned():
        from flink_engagement_pipeline_spark.llm.text import shingles
        frames = lm.media_video_frames(media)
        base = frames.select(
            "doc_id", shingles(F.col("payload").cast("string"), 3).alias("sh")
        )
        return (
            base.select("doc_id", F.explode("sh").alias("s"))
            .selectExpr(
                "doc_id",
                "CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT) AS h",
            )
            .selectExpr(
                "doc_id",
                "CAST(h % 60 AS INT) AS bin",
                "(h DIV 60) % 256 AS lum",
            )
        )
    timed(spark, "6 frame binned (pre-agg)", binned)
    timed(spark, "7 frame cells (agg)", lambda: binned().groupBy("doc_id", "bin").agg(F.sum("lum").alias("pix")))

    # corpus stats
    n_frames = lm.media_video_frames(media).count()
    print("frames:", n_frames, "docs:", docs.count())


if __name__ == "__main__":
    main()
