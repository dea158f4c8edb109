"""Unit tests for the integer-quantized PageRank operator
(operators/graph.py) on a hand-computed graph — the registry oracle
(parts_pagerank) covers the full-scale composition; this pins the
per-iteration arithmetic to exact expected micro-unit values."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_engagement_pipeline_spark.operators.graph import pagerank


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w long")


def test_pagerank_path_graph_exact_micros(spark):
    # undirected path a(1) - b(2) - c(3), unit weights, 2 iterations.
    # wdeg: a=1, b=2, c=1; r0 = 1_000_000 each.
    # iter1: s(a)=500000, s(b)=2_000_000, s(c)=500000
    #        r1(a)=150000+425000=575000, r1(b)=1_850_000, r1(c)=575000
    # iter2: s(a)=925000, s(b)=1_150_000, s(c)=925000
    #        r2(a)=936250, r2(b)=1_127_500, r2(c)=936250
    e = _edges(
        spark,
        [(1, 2, 1), (2, 1, 1), (2, 3, 1), (3, 2, 1)],
    )
    got = {
        r["node"]: r["rank_micros"]
        for r in pagerank(e, iters=2).collect()
    }
    assert got == {1: 936_250, 2: 1_127_500, 3: 936_250}


def test_pagerank_total_rank_bounded_and_symmetric(spark):
    # a 4-cycle is vertex-transitive: all ranks identical, and each
    # equals the stationary value 1.0 (integer units: 1_000_000)
    # because every node both sends and receives its full rank.
    e = _edges(
        spark,
        [(a, b, 1) for a, b in [(0, 1), (1, 2), (2, 3), (3, 0)]]
        + [(b, a, 1) for a, b in [(0, 1), (1, 2), (2, 3), (3, 0)]],
    )
    rows = pagerank(e, iters=3).collect()
    micros = {r["rank_micros"] for r in rows}
    assert micros == {1_000_000}
    assert {r["pr"] for r in rows} == {1.0}


def test_pagerank_directed_sink_node_kept(spark):
    # directed chain 1 -> 2 -> 3: node 3 is a pure sink (never a src).
    # It must appear in the output with the rank it received — the
    # round-4 ADVICE defect was deriving nodes from DISTINCT src only,
    # which silently dropped sinks in directed graphs.
    # wdeg: 1->1, 2->1. r0 = 1_000_000 for all three nodes.
    # iter1: s(2)=1_000_000, s(3)=1_000_000, s(1)=none
    #   r1(1)=150_000, r1(2)=1_000_000, r1(3)=1_000_000
    # iter2: s(2)=150_000, s(3)=1_000_000
    #   r2(1)=150_000, r2(2)=277_500, r2(3)=1_000_000
    e = _edges(spark, [(1, 2, 1), (2, 3, 1)])
    got = {r["node"]: r["rank_micros"] for r in pagerank(e, iters=2).collect()}
    assert got == {1: 150_000, 2: 277_500, 3: 1_000_000}


def test_pagerank_weight_bias(spark):
    # star with one heavy edge: the heavy neighbor must outrank the
    # light one, and ranks stay positive longs.
    e = _edges(
        spark,
        [(1, 2, 9), (2, 1, 9), (1, 3, 1), (3, 1, 1)],
    )
    got = {r["node"]: r["rank_micros"] for r in pagerank(e, iters=3).collect()}
    assert got[2] > got[3] > 0


def test_pagerank_plan_no_cartesian(spark):
    e = _edges(spark, [(1, 2, 1), (2, 1, 1)])
    plan = (
        pagerank(e, iters=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan


# ---------------------------------------------------------------------------
# connected components: large-star / small-star contraction
# ---------------------------------------------------------------------------


def test_star_cc_matches_label_propagation(spark):
    """Star contraction and min-label propagation must produce
    IDENTICAL (node, component-min) labelings on a seeded random
    graph with mixed component shapes (cliques, paths, singleton
    pairs)."""
    from flink_engagement_pipeline_spark.llm.dedup import (
        connected_components,
    )
    from flink_engagement_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    # deterministic pseudo-random edges over 400 nodes: hash
    # arithmetic, no RNG state (same device as sources/datagen.py)
    edges = (
        spark.range(600)
        .select(
            (F.xxhash64(F.col("id")) % 400).alias("src"),
            (F.xxhash64(F.col("id") + 7919) % 400).alias("dst"),
        )
        .select(F.abs("src").alias("src"), F.abs("dst").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    nodes = (
        edges.select(F.col("src").alias("doc_id"))
        .union(edges.select(F.col("dst")))
        .distinct()
    )
    lp = {
        (r["doc_id"], r["cluster_id"])
        for r in connected_components(
            edges.select(
                F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
            ),
            nodes,
        ).collect()
    }
    star = {
        (r["node"], r["cluster_id"])
        for r in connected_components_star(edges).collect()
    }
    assert star == lp


def test_star_cc_chain_converges_where_label_prop_cannot(spark):
    """The O(log n) claim, demonstrated: a 300-node chain (diameter
    299) converges under star contraction, while min-label
    propagation's default 25-round budget — ample for shallow
    near-dup clusters — must raise its documented non-convergence
    error rather than silently split the chain."""
    import pytest

    from flink_engagement_pipeline_spark.llm.dedup import (
        connected_components,
    )
    from flink_engagement_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    chain = spark.range(299).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    labels = connected_components_star(chain).collect()
    assert len(labels) == 300
    assert all(r["cluster_id"] == 0 for r in labels)
    nodes = spark.range(300).select(F.col("id").alias("doc_id"))
    # driver_max_edges=0 forces the distributed loop (the r15
    # small-graph gate's union-find converges on any diameter)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(
            chain.select(
                F.col("src").alias("doc_a"), F.col("dst").alias("doc_b")
            ),
            nodes,
            driver_max_edges=0,
        ).collect()


def test_star_cc_tolerates_duplicates_and_self_loops(spark):
    """Raw candidate-pair output contains duplicates, reversed copies
    and self-pairs; the operator must normalize all three."""
    from flink_engagement_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    rows = [(1, 2), (2, 1), (1, 2), (3, 3), (3, 2)]
    e = spark.createDataFrame(rows, "src long, dst long")
    res = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(e).collect()
    }
    assert res == {1: 1, 2: 1, 3: 1}


def test_star_cc_keeps_self_loop_only_nodes(spark):
    """A node whose ONLY incident edge is a self-loop is a singleton
    component and must still appear in the roster (node 9 here has no
    real edge — the contraction never sees it, but the docstring
    promises every node appearing in ``edges``)."""
    from flink_engagement_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    rows = [(1, 2), (9, 9)]
    e = spark.createDataFrame(rows, "src long, dst long")
    res = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(e).collect()
    }
    assert res == {1: 1, 2: 1, 9: 9}


def test_star_cc_drops_null_endpoints(spark):
    """NULL endpoints are not nodes (ADVICE r8): an edge row with a
    null src/dst must not fabricate a (null, null) component row, and
    the non-null side of such a row still joins the roster."""
    from flink_engagement_pipeline_spark.operators.graph import (
        connected_components_star,
    )

    rows = [(1, 2), (7, None), (None, None)]
    e = spark.createDataFrame(rows, "src long, dst long")
    res = {
        r["node"]: r["cluster_id"]
        for r in connected_components_star(e).collect()
    }
    assert res == {1: 1, 2: 1, 7: 7}


# ---------------------------------------------------------------------------
# triangle counting (degree-ordered wedges)
# ---------------------------------------------------------------------------


def test_triangles_k4_and_path(spark):
    """K4: every node has degree 3, sits in 3 of the 4 triangles,
    coefficient 1.0; a path contributes zero triangles and zero
    coefficient (including the degree-1 endpoints)."""
    from flink_engagement_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    rows = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    rows += [(10, 11), (11, 12)]
    e = spark.createDataFrame(rows, "src long, dst long")
    out = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_coeff"])
        for r in triangle_counts(e).collect()
    }
    for n in range(4):
        assert out[n] == (3, 3, 1.0)
    assert out[10] == (1, 0, 0.0)
    assert out[11] == (2, 0, 0.0)
    assert out[12] == (1, 0, 0.0)


def test_triangles_match_pure_python(spark):
    """Seeded pseudo-random graph: per-node triangle counts must
    equal a brute-force pure-Python enumeration."""
    from itertools import combinations

    from pyspark.sql import functions as F

    from flink_engagement_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    edges_df = (
        spark.range(400)
        .select(
            F.abs(F.xxhash64(F.col("id")) % 60).alias("src"),
            F.abs(F.xxhash64(F.col("id") + 104729) % 60).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
    )
    pairs = {
        (min(r["src"], r["dst"]), max(r["src"], r["dst"]))
        for r in edges_df.collect()
    }
    nbrs: dict[int, set[int]] = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    expect = {}
    for n, ns in nbrs.items():
        t = sum(1 for x, y in combinations(sorted(ns), 2) if (x, y) in pairs)
        deg = len(ns)
        coeff = 0.0 if deg < 2 else t * 2.0 / (deg * (deg - 1))
        expect[n] = (deg, t, coeff)
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering_coeff"])
        for r in triangle_counts(edges_df).collect()
    }
    assert got == expect


def test_triangles_hub_graph_no_wedge_blowup(spark):
    """A star K(1,200) has zero triangles; the degree-ordered
    orientation must point every edge AT the hub (the hub emits no
    wedges), keeping apex-side wedge volume at zero — the plan
    property that makes power-law graphs tractable. Checked
    behaviorally via the leaf coefficients and structurally via the
    hub's orientation."""
    from pyspark.sql import functions as F

    from flink_engagement_pipeline_spark.operators.graph import (
        triangle_counts,
    )

    e = spark.range(200).select(
        F.lit(1000).alias("src"), F.col("id").alias("dst")
    )
    out = {r["node"]: r for r in triangle_counts(e).collect()}
    assert out[1000]["degree"] == 200
    assert out[1000]["n_triangles"] == 0
    assert all(
        out[i]["n_triangles"] == 0 and out[i]["clustering_coeff"] == 0.0
        for i in range(200)
    )
