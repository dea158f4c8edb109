#!/usr/bin/env python
"""Benchmark the headline query set.

Runs every registry entry tagged ``bench=True`` at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {"<name>": sec, ...}, "sf": <float>}

Each query is executed to completion with a ``noop`` write — the full
plan runs on the executors (scan, shuffle, agg) with zero driver-side
collection, so timings measure the engine, not pandas conversion.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from flink_engagement_pipeline_spark import plans
from flink_engagement_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("fep-spark-bench")
    # warm the JVM/codegen once with a trivial job so the first
    # measured query doesn't pay session startup
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    specs = [s for s in plans.REGISTRY.values() if s.bench]
    timings: dict[str, float] = {}
    for spec in sorted(specs, key=lambda s: s.name):
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[spec.name] = round(time.perf_counter() - t0, 3)
        print(f"# {spec.name}: {timings[spec.name]:.3f}s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
