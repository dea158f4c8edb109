"""Round-11 additions: incremental semantic-dedup ingest
(rebuild-equivalence under the pinned quantizer), hybrid retrieval
(RRF fusion invariants), and the multimodal training manifest
(gate-composition properties)."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

from flink_engagement_pipeline_spark.llm import cluster as lc
from flink_engagement_pipeline_spark.llm import multimodal as lm
from flink_engagement_pipeline_spark.plans import REGISTRY
from flink_engagement_pipeline_spark.sources.tables import load_table


def _split(emb):
    cut = int(
        emb.agg(F.expr("max(vec_id) * 4 div 5").alias("c")).first()["c"]
    )
    return cut, emb.filter(F.col("vec_id") < cut), emb.filter(
        F.col("vec_id") >= cut
    )


def test_semdedup_ingest_rebuild_equivalence(spark, sf_dir):
    """Under the PINNED corpus-trained quantizer, the ingest decision
    for the batch must equal the batch rows of a full rebuild over
    corpus+batch with the same centroids (append == rebuild, the
    ivf_ingest property carried to the semantic family). The rebuild
    side is an independent Python replication of the SemDeDup policy
    over the full assignment — so this test is simultaneously the
    rebuild-equivalence pin AND the policy oracle."""
    emb = load_table(spark, sf_dir, "embeddings")
    cut, corpus, batch = _split(emb)
    cents = lc.train_kmeans(corpus, 8, 3)
    corpus_index = lc.assign_clusters(
        corpus.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        cents,
    ).select("vec_id", "cluster")
    got = {
        r["vec_id"]: (r["cluster"], r["is_kept"])
        for r in lc.semantic_dedup_ingest(
            batch, corpus_index, corpus, cents, threshold=0.35
        ).collect()
    }
    # full rebuild under the SAME pinned centroids, python policy
    assigned = lc.assign_clusters(
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        cents,
    ).collect()
    by_cluster: dict[int, list] = {}
    for r in assigned:
        by_cluster.setdefault(r["cluster"], []).append(
            (r["vec_id"], list(r["v"]))
        )

    def cos(a, b):
        d = n1 = n2 = 0.0
        for x, y in zip(a, b):
            d += x * y
            n1 += x * x
            n2 += y * y
        return d / (math.sqrt(n1) * math.sqrt(n2))

    want = {}
    for cl, members in by_cluster.items():
        members.sort()
        for i, (vid, v) in enumerate(members):
            if vid < cut:
                continue  # rebuild restricted to batch rows
            dropped = any(
                cos(u, v) >= 0.35 for (uid, u) in members[:i]
            )
            want[vid] = (cl, not dropped)
    assert got == want
    kept = sum(1 for _, k in got.values() if k)
    assert 0 < kept < len(got)  # non-vacuous both ways


def test_semdedup_delete_equals_rebuild_and_resurrects(spark, sf_dir):
    """The touched-cluster-only takedown must equal a full
    rebuild-without-X under the pinned quantizer (python
    replication), and the fixture takedown must RESURRECT at least
    one vector (kept after delete, dropped before) — the semantics
    that make a semantic takedown a re-screen, not a filter."""
    emb = load_table(spark, sf_dir, "embeddings")
    del_ids = emb.filter(F.col("vec_id") % 9 == 0).select("vec_id")
    got = {
        r["vec_id"]: (r["cluster"], r["is_kept"])
        for r in lc.semantic_dedup_delete(
            emb, del_ids, threshold=0.35
        ).collect()
    }
    cents = lc.train_kmeans(emb, 8, 3)  # pinned: full original corpus
    assigned = lc.assign_clusters(
        emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        cents,
    ).collect()
    by_cluster: dict[int, list] = {}
    for r in assigned:
        if r["vec_id"] % 9 == 0:
            continue  # rebuild WITHOUT the takedown set
        by_cluster.setdefault(r["cluster"], []).append(
            (r["vec_id"], list(r["v"]))
        )

    def cos(a, b):
        d = n1 = n2 = 0.0
        for x, y in zip(a, b):
            d += x * y
            n1 += x * x
            n2 += y * y
        return d / (math.sqrt(n1) * math.sqrt(n2))

    want = {}
    for cl, members in by_cluster.items():
        members.sort()
        for i, (vid, v) in enumerate(members):
            dropped = any(cos(u, v) >= 0.35 for (uid, u) in members[:i])
            want[vid] = (cl, not dropped)
    assert got == want
    prior = {
        r["vec_id"]: r["is_kept"]
        for r in lc.semantic_dedup(emb, threshold=0.35).collect()
    }
    resurrected = [
        vid for vid, (_, kept) in got.items() if kept and not prior[vid]
    ]
    assert resurrected, "fixture takedown should resurrect a vector"


def test_semdedup_delete_persisted_state_path(spark, sf_dir):
    """The production takedown path (persisted `prior` decisions +
    persisted `index` assignments passed in) must return exactly the
    in-plan-rebuild path's answer — the 1M probe found that WITHOUT
    the index param every driver job recomputed the full corpus
    assignment, making the 'bounded' takedown cost more than a
    rebuild; this pins the equivalence the fix relies on."""
    emb = load_table(spark, sf_dir, "embeddings")
    del_ids = emb.filter(F.col("vec_id") % 9 == 0).select("vec_id")
    inplan = sorted(
        map(
            tuple,
            lc.semantic_dedup_delete(emb, del_ids, threshold=0.35).collect(),
        )
    )
    cents = lc.train_kmeans(emb, 8, 3)
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    index = (
        lc.assign_clusters(e, cents)
        .select("vec_id", "cluster")
        .localCheckpoint()
    )
    prior = lc.semantic_dedup(emb, threshold=0.35).localCheckpoint()
    stateful = sorted(
        map(
            tuple,
            lc.semantic_dedup_delete(
                emb, del_ids, threshold=0.35, prior=prior, index=index
            ).collect(),
        )
    )
    assert inplan == stateful


def test_semdedup_ingest_pair_budget_guard(spark, sf_dir):
    """A batch whose cluster-load (in-batch pairs + batch-vs-state
    cross terms) exceeds the budget must refuse loudly, naming the
    most-loaded clusters."""
    emb = load_table(spark, sf_dir, "embeddings")
    cut, corpus, batch = _split(emb)
    cents = lc.train_kmeans(corpus, 8, 3)
    corpus_index = lc.assign_clusters(
        corpus.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        cents,
    ).select("vec_id", "cluster")
    with pytest.raises(ValueError, match="batch-vs-state pairs"):
        lc.semantic_dedup_ingest(
            batch, corpus_index, corpus, cents, max_candidate_pairs=10
        )


def test_semdedup_ingest_plan_shape(spark, sf_dir):
    """The ingest screen must plan as cluster-keyed equi-joins — no
    CartesianProduct, no per-row Python eval — and the corpus-index
    read must carry the touched-cluster In-filter (the literal isin
    that pushes into a persisted index scan at scale)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cut, corpus, batch = _split(emb)
    cents = lc.train_kmeans(corpus, 8, 3)
    corpus_index = lc.assign_clusters(
        corpus.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        cents,
    ).select("vec_id", "cluster")
    df = lc.semantic_dedup_ingest(batch, corpus_index, corpus, cents)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    assert "cluster#" in opt and " IN " in opt.replace("IN (", " IN (")


def test_streaming_semdedup_pairs_arrival_order(spark, sf_dir):
    """The streaming screen must produce the SAME pair union whichever
    half of the corpus arrives first (arrival-order agnosticism — the
    clause the batch ingest's append-only-id contract does not give),
    each pair exactly once (delta disjointness), and the union must
    equal an independent python replication of the whole-corpus
    within-cluster screen under the pinned quantizer."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = lc.train_kmeans(emb, 8, 3)
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    assigned = lc.assign_clusters(e, cents).collect()
    by_cluster: dict[int, list] = {}
    for r in assigned:
        by_cluster.setdefault(r["cluster"], []).append(
            (r["vec_id"], list(r["v"]))
        )

    def cos(a, b):
        d = n1 = n2 = 0.0
        for x, y in zip(a, b):
            d += x * y
            n1 += x * x
            n2 += y * y
        return d / (math.sqrt(n1) * math.sqrt(n2))

    want = set()
    for members in by_cluster.values():
        members.sort()
        for i, (v_id, v) in enumerate(members):
            for u_id, u in members[:i]:
                if cos(u, v) >= 0.35:
                    want.add((u_id, v_id))
    assert want  # non-vacuous

    h0 = emb.filter(F.col("vec_id") % 2 == 0)
    h1 = emb.filter(F.col("vec_id") % 2 == 1)
    empty_idx = emb.limit(0).select(
        F.col("vec_id"), F.lit(0).alias("cluster")
    )
    empty_emb = emb.limit(0).select("vec_id", "embedding")
    for first, second in ((h0, h1), (h1, h0)):
        p1 = {
            (r["vec_a"], r["vec_b"])
            for r in lc.streaming_semdedup_pairs(
                first, empty_idx, empty_emb, cents, threshold=0.35
            ).collect()
        }
        idx = lc.assign_clusters(
            first.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("v"),
            ),
            cents,
        ).select("vec_id", "cluster")
        p2 = {
            (r["vec_a"], r["vec_b"])
            for r in lc.streaming_semdedup_pairs(
                second, idx, first, cents, threshold=0.35
            ).collect()
        }
        assert not (p1 & p2)  # each pair forms exactly once
        assert p1 | p2 == want


def test_semdedup_replay_serve_join_broadcast_gate(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The replay's final keep/drop serve join carries the same
    _BROADCAST_ID_LIMIT degrade as the three llm.cluster keep/drop
    joins (r11 ADVICE: the committed higher-id set scales with the
    corpus duplicate count, so an unconditional hint is the
    O(corpus)-ids broadcast hazard). The bound is the committed
    pair-row count — sink metadata, no extra scan. Hint below the
    limit, planner-chosen above, rows identical on both paths."""
    from flink_engagement_pipeline_spark.llm import dedup as ldd
    from flink_engagement_pipeline_spark.plans.queries_ext8 import (
        run_semdedup_index_replay,
        serve_semdedup_keepdrop,
    )
    from flink_engagement_pipeline_spark.streaming.sinks import (
        IdempotentParquetSink,
    )

    tmp = str(tmp_path / "replay")
    os.makedirs(tmp)
    run_semdedup_index_replay(spark, sf_dir, tmp)
    codes_sink = IdempotentParquetSink(os.path.join(tmp, "codes"))
    pairs_sink = IdempotentParquetSink(os.path.join(tmp, "pairs"))

    def optimized(df):
        return df._jdf.queryExecution().optimizedPlan().toString()

    small = serve_semdedup_keepdrop(spark, codes_sink, pairs_sink)
    assert "hint" in optimized(small).lower()
    monkeypatch.setattr(ldd, "_BROADCAST_ID_LIMIT", 0)
    big = serve_semdedup_keepdrop(spark, codes_sink, pairs_sink)
    assert "hint" not in optimized(big).lower()
    assert sorted(map(tuple, small.collect())) == sorted(
        map(tuple, big.collect())
    )


def test_hybrid_retrieval_rrf_invariants(spark, sf_dir):
    """RRF fusion properties: scores equal the python recomputation
    from the ranks; a doc ranked by BOTH stages outranks every
    single-stage doc with comparable ranks; output is the top-20 by
    (score desc, doc_id)."""
    rows = REGISTRY["docs_hybrid_retrieval"].spark(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        num = den = None
        a = 60 + r["lex_rank"] if r["lex_rank"] > 0 else None
        b = 60 + r["dense_rank"] if r["dense_rank"] > 0 else None
        if a and b:
            num, den = a + b, a * b
        else:
            num, den = 1, (a or b)
        assert r["rrf_score"] == num / den
        assert r["lex_rank"] > 0 or r["dense_rank"] > 0
    scores = [(r["rrf_score"], -r["doc_id"]) for r in rows]
    assert scores == sorted(scores, reverse=True)
    both = [r for r in rows if r["lex_rank"] > 0 and r["dense_rank"] > 0]
    if both:  # a doc in both lists beats any single-stage doc
        singles = [
            r["rrf_score"]
            for r in rows
            if (r["lex_rank"] > 0) != (r["dense_rank"] > 0)
        ]
        assert min(r["rrf_score"] for r in both) > max(singles)


def test_hybrid_batch_consistent_with_single_stages(spark, sf_dir):
    """The batched fusion must agree with independent per-qid
    recomputation: every served row's rrf_score re-derives from its
    ranks; per qid exactly _HYBRID_OUT rows; and qid 0's dense ranks
    agree with the registered knn_join stage at the same depth."""
    from flink_engagement_pipeline_spark.llm import similarity as ls
    from flink_engagement_pipeline_spark.plans.queries_ext8 import (
        _HYBRID_BATCH_TERMS,
        _HYBRID_OUT,
        _HYBRID_TOPK,
    )

    rows = (
        REGISTRY["docs_hybrid_retrieval_batch"].spark(spark, sf_dir).collect()
    )
    by_qid: dict[int, list] = {}
    for r in rows:
        by_qid.setdefault(r["qid"], []).append(r)
    assert sorted(by_qid) == list(range(len(_HYBRID_BATCH_TERMS)))
    for qid, group in by_qid.items():
        assert len(group) == _HYBRID_OUT
        for r in group:
            a = 60 + r["lex_rank"] if r["lex_rank"] > 0 else None
            b = 60 + r["dense_rank"] if r["dense_rank"] > 0 else None
            num, den = (a + b, a * b) if a and b else (1, a or b)
            assert r["rrf_score"] == num / den
    emb = load_table(spark, sf_dir, "embeddings")
    knn = {
        (r["query_id"], r["vec_id"]): r["rn"]
        for r in ls.knn_join(
            emb, num_queries=len(_HYBRID_BATCH_TERMS), k=_HYBRID_TOPK
        ).collect()
    }
    for r in rows:
        if r["dense_rank"] > 0:
            assert knn[(r["qid"], r["doc_id"])] == r["dense_rank"]


def test_manifest_ingest_append_stability(spark, sf_dir):
    """The manifest ingest's contract: (a) served ∪ ingested doc ids
    EQUAL a full rebuild's kept set (the append-only id space makes
    cross-set dedup keep the same survivors); (b) every ingested
    sample_idx lands AFTER its split's served count (served training
    positions never shift — the reason append-epochs deviate from
    rebuild index order); (c) served + ingested indices are contiguous
    1..n per split."""
    from flink_engagement_pipeline_spark.plans.queries_llm import (
        corpus_prep_of,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    cut = int(
        docs.agg(F.expr("max(doc_id) * 4 div 5").alias("c")).first()["c"]
    )
    ingested = (
        REGISTRY["docs_manifest_ingest"].spark(spark, sf_dir).collect()
    )
    assert ingested  # non-vacuous
    # served manifest over the corpus side only
    state = corpus_prep_of(docs.filter(F.col("doc_id") < cut))
    h = F.substring(
        F.md5(F.concat(F.lit("split-v1:"), F.col("doc_id").cast("string"))),
        1,
        2,
    )
    served = (
        state.withColumn(
            "split",
            F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test"),
        )
        .select("doc_id", "split")
        .collect()
    )
    served_counts: dict[str, int] = {}
    for r in served:
        served_counts[r["split"]] = served_counts.get(r["split"], 0) + 1
    rebuild = {
        r["doc_id"]
        for r in REGISTRY["docs_training_manifest"].spark(spark, sf_dir).collect()
    }
    assert {r["doc_id"] for r in served} | {
        r["doc_id"] for r in ingested
    } == rebuild
    by_split: dict[str, list[int]] = {}
    for r in ingested:
        assert r["sample_idx"] > served_counts.get(r["split"], 0)
        by_split.setdefault(r["split"], []).append(r["sample_idx"])
    for sp, idxs in by_split.items():
        lo = served_counts.get(sp, 0)
        assert sorted(idxs) == list(range(lo + 1, lo + len(idxs) + 1))


def test_manifest_multimodal_gates(spark, sf_dir):
    """The multimodal manifest must be exactly the text manifest
    minus media non-survivors and video near-dup drops, with
    per-split sample indices contiguous from 1."""
    from flink_engagement_pipeline_spark.plans.queries_ext7 import (
        media_survivors_frame,
    )

    multi = {
        r["doc_id"]: r
        for r in REGISTRY["corpus_manifest_multimodal"]
        .spark(spark, sf_dir)
        .collect()
    }
    text = {
        r["doc_id"]: r
        for r in REGISTRY["docs_training_manifest"]
        .spark(spark, sf_dir)
        .collect()
    }
    surv = {
        r["doc_id"]
        for r in media_survivors_frame(spark, sf_dir)
        .filter(F.col("is_survivor"))
        .collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    vdrops = {
        r["doc_b"]
        for r in lm.media_video_neardup(lm.docs_as_media(docs)).collect()
    }
    want_ids = {d for d in text if d in surv and d not in vdrops}
    assert set(multi) == want_ids
    assert want_ids < set(text)  # the gates must actually drop docs
    # split labels agree with the text manifest; indices contiguous
    for d, r in multi.items():
        assert r["split"] == text[d]["split"]
        assert r["n_tokens"] == text[d]["n_tokens"]
    by_split: dict[str, list[int]] = {}
    for r in multi.values():
        by_split.setdefault(r["split"], []).append(r["sample_idx"])
    for idxs in by_split.values():
        assert sorted(idxs) == list(range(1, len(idxs) + 1))
