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


def connected_components_star(
    edges: DataFrame, max_rounds: int = 40
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    contraction (Kiveris et al. 2014, "Connected Components in
    MapReduce and Beyond") — the O(log n)-round counterpart to
    llm/dedup.py:connected_components' min-label propagation, whose
    round count is the component DIAMETER. Near-dup clusters are
    shallow, so label propagation wins there; chain-shaped graphs
    (linked page sequences, temporal follows, interval overlaps) have
    diameter O(n) and NEED the star contraction at scale — a
    300-node chain converges here in 5 alternating rounds where
    25-round label propagation raises (pinned by test).

    Per round, each phase is ONE groupBy-min on the node key plus one
    equi-join of the edge list against that min table — the same
    shuffle shape as a label-prop round (no neighborhood collect_list
    ever materializes; the paper's N(u) only appears as min(N(u))):

    - large-star: every node u computes m = min(N(u) ∪ {u}) over the
      SYMMETRIC edge list and re-points its strictly-larger neighbors
      at m: emit (v, m) for v in N(u), v > u.
    - small-star: edges directed high->low; every node u re-points
      its smaller-or-equal neighborhood (and itself) at
      m = min(N_<(u) ∪ {u}): emit (v, m) for v in N_<(u), v != m,
      plus (u, m).

    Both phases preserve connectivity and strictly shrink component
    "height"; at the fixpoint the edge set is a star forest — every
    non-root node holds exactly the edge (node, component_min).
    Convergence is detected by (count, order-independent xxhash64
    checksum) stability and then CONFIRMED exactly (one more
    large-star must reproduce the edge set) before returning, so a
    checksum collision cannot smuggle out a half-contracted forest.
    Each round localCheckpoints — the iterative-lineage discipline
    pagerank/connected_components use. Returns (node, cluster_id)
    for every node appearing in ``edges``; union singleton ids
    downstream (the dedup pipelines' roster join) as with
    connected_components.
    """

    def _sym(e: DataFrame) -> DataFrame:
        return e.union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )

    def _large_star(e: DataFrame) -> DataFrame:
        sym = _sym(e)
        mins = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        return (
            sym.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        # direct every edge high -> low (u > v); u == v never occurs
        d = _sym(e).filter(F.col("u") > F.col("v"))
        mins = d.groupBy("u").agg(F.min("v").alias("m"))  # m < u always
        repoint = (
            d.join(mins, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_edge = mins.select(F.col("u"), F.col("m").alias("v"))
        return repoint.union(self_edge).distinct()

    def _sig(e: DataFrame) -> tuple[int, int]:
        # decimal(38,0) accumulator: a long sum of xxhash64 values
        # overflows (ANSI mode raises); decimal keeps the checksum
        # exact and order-independent
        row = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(
                F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
                F.lit(0).cast("decimal(38,0)"),
            ).alias("h"),
        ).collect()[0]
        return int(row["n"]), int(row["h"])

    raw = edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    e = raw.filter(F.col("u") != F.col("v")).distinct().localCheckpoint()
    # roster from the RAW endpoint columns, BEFORE the self-loop
    # filter: a node whose only incident edges are self-loops is its
    # own singleton component and must still appear in the output
    # (the contraction below never sees it, so the left join's
    # coalesce maps it to itself). NULL endpoints are not nodes —
    # without the isNotNull an edge row with a null src/dst would
    # fabricate a (null, null) component row (ADVICE r8).
    nodes = (
        raw.select(F.col("u").alias("node"))
        .union(raw.select(F.col("v").alias("node")))
        .filter(F.col("node").isNotNull())
        .distinct()
        .localCheckpoint()
    )
    sig = _sig(e)
    for _ in range(max_rounds):
        # lazy checkpoint: the _sig job materializes it, so each round
        # is ONE action instead of checkpoint-then-checksum (r14)
        e = _small_star(_large_star(e)).localCheckpoint(eager=False)
        new_sig = _sig(e)
        if new_sig == sig:
            # exact confirmation: a star forest is a fixpoint of
            # large-star (every neighborhood min is the root itself)
            diff = _large_star(e).exceptAll(e).count() + e.exceptAll(
                _large_star(e)
            ).count()
            if diff == 0:
                break
        sig = new_sig
    else:
        raise RuntimeError(
            f"connected_components_star did not converge in "
            f"{max_rounds} rounds; the bound is ~3*log2(n) — raise "
            "max_rounds only after checking the edge list for "
            "degenerate self-loops/duplicates"
        )
    # star forest: e holds (node, root) for every non-root node
    return nodes.join(
        e.select(F.col("u").alias("node"), F.col("v").alias("root")),
        "node",
        "left",
    ).select(
        "node", F.coalesce("root", F.col("node")).alias("cluster_id")
    )


def triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-node triangle counts + local clustering coefficient over an
    undirected simple graph, by DEGREE-ORDERED wedge counting (the
    MapReduce-era standard — Suri & Vassilvitskii 2011's partition
    trick descends from it; GraphX's triangleCount uses the same
    orientation): orient every edge from the (degree, id)-smaller
    endpoint to the larger, making the graph a DAG where every
    triangle has exactly ONE apex with two out-edges. Wedges are
    generated apex-side only, so the join volume is
    sum(out_deg(v)^2) with out_deg bounded by O(sqrt(m)) — the
    high-degree hub that would explode a naive neighbor self-join
    (deg^2 wedges on the hub) generates almost nothing, because hubs
    sit on the HIGH end of the order and receive edges instead of
    emitting them. At 100 TB this is the difference between a
    power-law graph finishing and not.

    Plan: one degree aggregation, one orientation projection, one
    self-equi-join on the apex, one semi-closing equi-join against the
    oriented edge set, then one explode-free per-corner aggregation —
    every shuffle on a node key, no driver state. Returns
    (node, degree, n_triangles, clustering_coeff) for every node with
    degree >= 1; coefficient = triangles / C(degree, 2) as a single
    final double division (0.0 for degree < 2)."""
    e = (
        edges.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
        )
        .distinct()
        .localCheckpoint()  # degrees + orientation + closing join all
        # reuse this edge set; cut the recompute/lineage
    )
    sym = e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("deg"))
    # orient low (deg, id) -> high (deg, id): attach both endpoint
    # degrees, then order
    with_deg = (
        e.join(deg.select(F.col("a"), F.col("deg").alias("deg_a")), "a")
        .join(
            deg.select(F.col("a").alias("b"), F.col("deg").alias("deg_b")),
            "b",
        )
    )
    oriented = with_deg.select(
        F.when(
            (F.col("deg_a") < F.col("deg_b"))
            | ((F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))),
            F.struct(F.col("a").alias("lo"), F.col("b").alias("hi")),
        )
        .otherwise(F.struct(F.col("b").alias("lo"), F.col("a").alias("hi")))
        .alias("s")
    ).select(F.col("s.lo").alias("x"), F.col("s.hi").alias("y"))
    # wedges at the apex: (x -> y1), (x -> y2), y1 < y2 in the SAME
    # total order the orientation used — but since both are
    # out-neighbors of x, plain id order dedups the pair; the closing
    # edge must then be checked in BOTH oriented directions? No:
    # closing edge (y1, y2) is oriented by the same global order, so
    # exactly one direction exists — join on both columns against the
    # oriented set twice is avoided by normalizing the wedge pair to
    # the oriented direction via a degree lookup-free trick: check
    # (y1, y2) OR (y2, y1) membership with a single join on the
    # UNORDERED canonical (min, max) form.
    w1 = oriented.select(F.col("x"), F.col("y").alias("y1"))
    w2 = oriented.select(F.col("x"), F.col("y").alias("y2"))
    wedges = w1.join(w2, "x").filter(F.col("y1") < F.col("y2"))
    closing = e.select(F.col("a").alias("y1"), F.col("b").alias("y2"))
    tri = wedges.join(closing, ["y1", "y2"])  # y1 < y2 == (a, b) form
    # one Generate over the triangle rows — a 3-way union of tri
    # projections would re-execute the wedge join three times
    corners = (
        tri.select(F.explode(F.array("x", "y1", "y2")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        deg.select(F.col("a").alias("node"), "deg")
        .join(corners, "node", "left")
        .select(
            "node",
            F.col("deg").alias("degree"),
            F.coalesce("n_triangles", F.lit(0).cast("long")).alias(
                "n_triangles"
            ),
            F.when(F.col("deg") < 2, F.lit(0.0))
            .otherwise(
                F.coalesce("n_triangles", F.lit(0).cast("long")).cast(
                    "double"
                )
                * 2.0
                / (F.col("deg") * (F.col("deg") - 1))
            )
            .alias("clustering_coeff"),
        )
    )
