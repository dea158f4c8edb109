#!/usr/bin/env python
"""Per-query decomposition: DataFrame CONSTRUCTION time (py4j
expression building, SQL parsing, and any driver actions the builder
runs — trainer collects, CC gate counts, state-memo builds) vs
EXECUTION time (the noop write). bench.py's timed region pays both;
this splits them so optimization effort goes where the time is
(guide §1: measure first). min-of-N per phase, same-session."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_engagement_pipeline_spark import plans  # noqa: E402
from flink_engagement_pipeline_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "corpus_manifest_multimodal",
    "embedding_semdedup",
    "media_video_neardup",
    "media_phash_neardup",
    "parts_pagerank",
    "docs_dedup_e2e_portable",
    "embedding_pq_ingest",
    "embedding_semdedup_ingest",
    "docs_manifest_ingest",
    "docs_hybrid_retrieval_batch",
    "docs_hybrid_retrieval_batch_ivf",
    "embedding_ivf_ingest",
    "docs_substring_dedup",
    "corpus_manifest_from_state",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:] or DEFAULT
    n = int(os.environ.get("SPARK_GRAFT_PROFILE_RUNS", "3"))
    spark = get_spark("build-exec-profile")
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"{'query':38s} {'build(s)':>9s} {'exec(s)':>9s} {'total':>7s}")
    for name in names:
        spec = plans.REGISTRY[name]
        builds, execs = [], []
        for _ in range(n):
            spark.sparkContext.setJobDescription(f"profile: {name}")
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
            spark.sparkContext.setJobDescription(None)
            spark._jvm.System.gc()
        b, e = min(builds), min(execs)
        print(
            f"{name:38s} {b:9.3f} {e:9.3f} {b + e:7.3f}"
            f"   (builds: {', '.join(f'{x:.2f}' for x in builds)}"
            f" | execs: {', '.join(f'{x:.2f}' for x in execs)})"
        )


if __name__ == "__main__":
    main()
