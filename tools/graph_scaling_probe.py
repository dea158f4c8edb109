"""Scaling probe for the GRAPH family (round-8 verdict ask #6):
wall-clock AND shuffle bytes for pagerank / connected-components
(star contraction) / triangle counting at 10k / 100k / 1M edges, on
two deterministic graph shapes:

- UNIFORM: edge i connects i -> xxhash64(i) mod n_nodes (n_nodes =
  edges/2, so mean degree ~4 after symmetrization). Degrees
  concentrate around the mean — the benign shape.
- POWERLAW: edge i connects i mod n_nodes -> floor(n_nodes^u) where
  u = (xxhash64(i) mod 1e6)/1e6, giving in-degree(j) ~ 1/j — node 0
  region holds massive hubs. This is exactly the shape that
  stress-tests the triangle orientation's sum(out_deg^2) claim (the
  degree-ordered orientation must keep hub out-degrees SMALL: a hub's
  wedges are generated at its low-degree neighbors, never at the hub)
  and pagerank's hub-in-degree aggregation.

Methodology mirrors dedup_scaling_probe: UI REST API on for this
session only, each measured pipeline is a noop write, shuffle bytes
are completed-stage deltas around the sequential runs. Edges are
localCheckpointed and counted before timing. Pagerank runs its
default 3 iterations; CC runs to its confirmed fixpoint; triangles
run the full wedge join + closing-edge semi-join.

Findings from quiet-host runs are appended at the bottom and
summarized in BASELINE.md.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_engagement_pipeline_spark.operators.graph import (
    connected_components_star,
    pagerank,
    triangle_counts,
)
from flink_engagement_pipeline_spark.session import get_spark

spark = get_spark(
    "graph-scaling-probe",
    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
)
spark.sparkContext.setLogLevel("ERROR")
# JVM + codegen warmup so the first timed run isn't paying it
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
    "overwrite"
).save()

_APP = None


def _stage_totals():
    global _APP
    base = "http://localhost:4049/api/v1"
    if _APP is None:
        apps = json.load(urllib.request.urlopen(f"{base}/applications"))
        _APP = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/applications/{_APP}/stages?status=complete"
        )
    )
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def run(thunk, label, n_edges):
    r0, w0 = _stage_totals()
    t0 = time.perf_counter()
    df = thunk()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    r1, w1 = _stage_totals()
    print(
        f"edges={n_edges:>9,} {label:>10}: {dt:7.2f}s  "
        f"shuffleR {(r1 - r0) / 1e6:9.1f} MB  "
        f"shuffleW {(w1 - w0) / 1e6:9.1f} MB",
        flush=True,
    )


def uniform_edges(n_edges: int):
    """i -> xxhash64(i) mod (n_edges/2); near-uniform degrees."""
    n_nodes = max(2, n_edges // 2)
    return spark.range(n_edges).select(
        (F.col("id") % n_nodes).alias("src"),
        F.pmod(F.xxhash64("id"), F.lit(n_nodes)).alias("dst"),
    )


def powerlaw_edges(n_edges: int):
    """i -> floor(n_nodes^u), u ~ U(0,1): in-degree(j) ~ 1/j (Zipf),
    so the low-id region is a dense hub cluster — hub triangles and
    hub rank mass included."""
    n_nodes = max(2, n_edges // 2)
    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)).cast("double")) / 1e6
    return spark.range(n_edges).select(
        (F.col("id") % n_nodes).alias("src"),
        F.floor(F.pow(F.lit(float(n_nodes)), u)).cast("long").alias("dst"),
    )


def simple_undirected(edges):
    """Normalize to a simple undirected graph (min, max), no loops."""
    return (
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def probe(shape_name, edge_fn, n_edges):
    e = simple_undirected(edge_fn(n_edges)).localCheckpoint()
    n = e.count()
    deg = e.select(F.col("src").alias("x")).union(
        e.select(F.col("dst"))
    ).groupBy("x").count()
    dmax = deg.agg(F.max("count")).first()[0]
    print(f"-- {shape_name} requested={n_edges:,} simple={n:,} max_deg={dmax:,}")
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    pr_edges = sym.withColumn("w", F.lit(1)).localCheckpoint()
    run(lambda: pagerank(pr_edges), "pagerank", n)
    run(lambda: connected_components_star(e), "cc_star", n)
    run(lambda: triangle_counts(e), "triangles", n)


if __name__ == "__main__":
    sizes = [10_000, 100_000, 1_000_000]
    if len(sys.argv) > 1:
        sizes = [int(x) for x in sys.argv[1:]]
    for n_edges in sizes:
        probe("uniform", uniform_edges, n_edges)
        probe("powerlaw", powerlaw_edges, n_edges)


# ---------------------------------------------------------------------------
# Findings (quiet host, local[32], 128 GiB JVM) are appended below by
# hand after each run and summarized in BASELINE.md.
# ---------------------------------------------------------------------------
