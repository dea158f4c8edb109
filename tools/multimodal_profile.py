#!/usr/bin/env python
"""Stage-level decomposition of corpus_manifest_multimodal (r15
optimization round, guide §1: measure first — the r14 verdict's top
next item). Times each prefix of the composition with the noop sink,
min-of-N; per-stage cost is the delta between consecutive rows. The
CC closure runs driver-side convergence actions, so its row measures
jobs + actions — exactly what the query pays."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_engagement_pipeline_spark.llm import dedup as ld  # noqa: E402
from flink_engagement_pipeline_spark.llm import multimodal as lm  # noqa: E402
from flink_engagement_pipeline_spark.session import get_spark  # noqa: E402
from flink_engagement_pipeline_spark.sources.tables import load_table  # noqa: E402


def timed(spark, name, make_df, n=3):
    # the clock starts BEFORE make_df(): iterative builders (the CC
    # closure) run driver actions during plan construction, and
    # bench.py's timed region includes construction too
    runs = []
    for _ in range(n):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        make_df().write.format("noop").mode("overwrite").save()
        runs.append(time.perf_counter() - t0)
        spark._jvm.System.gc()
    print(f"{name}: min {min(runs):.3f}s  (runs: "
          + ", ".join(f"{r:.3f}" for r in runs) + ")")
    return min(runs)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("multimodal-profile")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from flink_engagement_pipeline_spark.plans.queries_ext7 import (
        media_survivors_frame,
    )
    from flink_engagement_pipeline_spark.plans.queries_ext8 import (
        manifest_index_of,
        q_corpus_manifest_multimodal,
    )
    from flink_engagement_pipeline_spark.plans.queries_llm import (
        corpus_prep_frame,
    )

    docs = load_table(spark, sf_dir, "documents")

    timed(spark, "0 corpus_prep", lambda: corpus_prep_frame(spark, sf_dir))
    timed(spark, "1 phash pairs",
          lambda: lm.media_phash_pairs(lm.docs_as_media(docs)))
    timed(spark, "2 pairs + CC closure",
          lambda: ld.connected_components(
              lm.media_phash_pairs(lm.docs_as_media(docs))
              .select("doc_a", "doc_b"),
              docs.select("doc_id")))
    timed(spark, "3 media_survivors_frame",
          lambda: media_survivors_frame(spark, sf_dir))
    timed(spark, "4 video vdrop",
          lambda: lm.media_video_neardup(lm.docs_as_media(docs))
          .select(F.col("doc_b").alias("doc_id")).distinct())

    def gated():
        prep = corpus_prep_frame(spark, sf_dir)
        surv = (media_survivors_frame(spark, sf_dir)
                .filter(F.col("is_survivor")).select("doc_id"))
        vdrop = (lm.media_video_neardup(lm.docs_as_media(docs))
                 .select(F.col("doc_b").alias("doc_id")).distinct())
        return (prep.join(surv, "doc_id", "leftsemi")
                .join(vdrop, "doc_id", "left_anti"))

    timed(spark, "5 gated (prep+surv+vdrop)", gated)
    timed(spark, "6 full manifest",
          lambda: q_corpus_manifest_multimodal(spark, sf_dir))


if __name__ == "__main__":
    main()
