"""Iterative graph operators as DataFrame compositions.

PageRank here is the Pregel-as-DataFrame shape: each iteration is one
edge×rank equi-join plus one destination-keyed aggregation — the plan
a 1000-executor cluster wants (rank state and edges both partition by
node key; no driver-side state, no collect). The arithmetic is
INTEGER-quantized (micro-units, integer division) so the per-node
contribution sum is order-independent and the whole unrolled recursion
can be replicated bit-for-bit in SQL CTEs — an iterative float
algorithm with an exact cross-engine oracle, same device as
llm/cluster.py's quantized k-means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING_MILLI = 850  # 0.85 damping as integer milli-units
BASE_MICRO = 150_000  # (1 - 0.85) in rank micro-units
INIT_MICRO = 1_000_000  # initial rank 1.0 in micro-units


def pagerank(edges: DataFrame, iters: int = 3) -> DataFrame:
    """Weighted PageRank over DIRECTED ``edges`` (src, dst, w) — pass
    both directions for an undirected graph.

    Per iteration: every node v sends ``(r(v) * w(v,u)) div wdeg(v)``
    micro-units along each out-edge (integer division — exact in both
    engines), and ``r'(u) = 150000 + (850 * sum) div 1000``. Returns
    (node, rank_micros, pr). All weights must be positive integers.

    The edge list is referenced ``iters``+2 times by the composed
    plan (contributions each round, wdeg, nodes). ``localCheckpoint``
    materializes edges ONCE on the executors and cuts the lineage —
    the same device connected_components uses. On the sf0.1
    co-purchase graph wall-clock is unchanged (~4 s — AQE reuses the
    repeated exchanges at runtime either way); the cut is for PLAN
    growth: without it the analyzed plan embeds the edge subtree
    iters+2 times (75 KB of plan text at 3 iterations) and Catalyst
    analysis cost compounds with iteration count. At real scale,
    persist the edge table explicitly and pass the scan in.
    """
    edges = edges.localCheckpoint()
    wdeg = edges.groupBy("src").agg(F.sum("w").alias("wdeg"))
    e = edges.join(wdeg, "src")
    # node set = src ∪ dst: a sink node (appearing only as dst) must
    # still hold rank — deriving nodes from src alone silently dropped
    # sinks in directed graphs (round-4 ADVICE). Sinks send nothing
    # (no out-edges -> absent from wdeg -> absent from e), matching
    # the "dangling mass discarded" convention the quantized
    # formulation already uses. For the undirected both-directions
    # usage src set == dst set, so results are unchanged.
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    r = nodes.select(
        "node", F.lit(INIT_MICRO).cast("long").alias("r")
    )
    for _ in range(iters):
        contrib = e.join(
            r.select(F.col("node").alias("src"), "r"), "src"
        ).select(
            F.col("dst").alias("node"),
            F.expr("(r * w) div wdeg").alias("c"),
        )
        s = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        r = nodes.join(s, "node", "left").select(
            "node",
            (
                F.lit(BASE_MICRO)
                + F.expr(f"({DAMPING_MILLI} * coalesce(s, 0L)) div 1000")
            ).cast("long").alias("r"),
        )
    return r.select(
        "node",
        F.col("r").alias("rank_micros"),
        (F.col("r").cast("double") / F.lit(1e6)).alias("pr"),
    )


def pagerank_ctes(edges_cte: str, iters: int = 3) -> str:
    """The unrolled SQL twin of :func:`pagerank`: CTE text computing
    wdeg/nodes/r0..r{iters} from an edge CTE named ``edges_cte`` with
    columns (src, dst, w). The caller selects from ``r{iters}``."""
    parts = [
        f"wdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wdeg"
        f" FROM {edges_cte} GROUP BY src)",
        # src ∪ dst, mirroring pagerank(): sink nodes keep their rank
        f"nodes AS (SELECT src AS node FROM {edges_cte}"
        f" UNION SELECT dst FROM {edges_cte})",
        f"r0 AS (SELECT node, CAST({INIT_MICRO} AS BIGINT) AS r FROM nodes)",
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""c{i} AS (
  SELECT e.dst AS node, CAST(sum((r.r * e.w) // d.wdeg) AS BIGINT) AS s
  FROM {edges_cte} e JOIN r{i - 1} r ON r.node = e.src
  JOIN wdeg d ON d.src = e.src
  GROUP BY e.dst
)"""
        )
        parts.append(
            f"""r{i} AS (
  SELECT n.node AS node,
         CAST({BASE_MICRO} + ({DAMPING_MILLI} * coalesce(c.s, 0)) // 1000
              AS BIGINT) AS r
  FROM nodes n LEFT JOIN c{i} c ON c.node = n.node
)"""
        )
    return ",\n".join(parts)
