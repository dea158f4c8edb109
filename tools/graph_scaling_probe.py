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
#
# Round-9 run (quiet host, 2026-08-15):
#
#   -- uniform   10k  max_deg=14
#   pagerank  2.42s  shuffleR   0.7MB | cc_star  7.36s   2.5MB | tri 1.27s  0.4MB
#   -- powerlaw 10k  max_deg=779
#   pagerank  1.88s            0.6MB | cc_star  5.08s   1.8MB | tri 1.47s  0.3MB
#   -- uniform  100k max_deg=12
#   pagerank  1.89s            6.1MB | cc_star  7.69s  27.0MB | tri 1.66s  3.5MB
#   -- powerlaw 100k max_deg=6,253
#   pagerank  2.00s            5.4MB | cc_star  6.31s  18.8MB | tri 1.35s  3.0MB
#   -- uniform  1M   max_deg=14
#   pagerank  8.35s          165.5MB | cc_star 24.70s 421.2MB | tri 4.00s 62.5MB
#   -- powerlaw 1M   max_deg=51,215
#   pagerank  5.88s          119.1MB | cc_star 15.74s 231.3MB | tri 3.56s 47.4MB
#
# Readings:
# - TRIANGLES: the degree-ordered orientation claim HOLDS under a
#   51,215-degree hub — 1M powerlaw runs FASTER with LESS shuffle than
#   1M uniform (3.56s/47MB vs 4.00s/62MB): the hub's edges all orient
#   AWAY from it (it is the (degree,id)-largest endpoint), so its
#   wedges are generated at its low-degree neighbors and
#   sum(out_deg^2) stays bounded. Wall-clock 100k->1M is 2.4x on 10x
#   edges — sublinear (fixed 32-partition overhead amortizing out).
# - PAGERANK: 10x edges -> 4.4x wall (8.35s), shuffle ~ edges x
#   iterations; hub graph again cheaper (fewer distinct rank rows).
#   No driver-side state; nothing here breaks at 100x.
# - CC_STAR: 10x edges -> 3.2x wall (24.7s); shuffle grows
#   n x alternation-rounds (O(log n) rounds, hence the 15.6x bytes at
#   10x edges). The absolute constant is the per-round
#   localCheckpoint + fixpoint CONFIRMATION pass (an extra large-star
#   diff per convergence check) — acceptable for the exactness
#   guarantee; at 100 TB the knob is checkpoint interval, not the
#   join shape.
# ---------------------------------------------------------------------------
