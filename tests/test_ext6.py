"""Round-8 additions: streaming dedup-index maintenance and index
lifecycle deletion (remove == rebuild-without-X)."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_engagement_pipeline_spark.llm import dedup as ld
from flink_engagement_pipeline_spark.llm import similarity as ls
from flink_engagement_pipeline_spark.plans.registry import REGISTRY
from flink_engagement_pipeline_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# streaming dedup-index maintenance
# ---------------------------------------------------------------------------


def test_stream_minhash_replay_matches_batch_rebuild(spark, sf_dir):
    """The accumulated pair set committed across two disjoint
    micro-batches must equal the whole-corpus batch rebuild, and the
    fixture must contain pairs whose SMALLER id arrives in the LATER
    batch (the parity split guarantees arrival order != id order) —
    otherwise the arrival-order claim would be vacuously true."""
    got = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in REGISTRY["stream_minhash_index_replay"]
        .spark(spark, sf_dir)
        .collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    want = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in ld.portable_minhash_pairs(docs).collect()
    }
    assert got == want
    assert want, "fixture should contain near-dup pairs"
    # non-vacuous: the batch ingest's doc_id-ordered candidate
    # contract would lose exactly these (odd smaller id arrives in
    # batch 1, after its even partner)
    assert any(a % 2 == 1 and b % 2 == 0 for a, b, _ in want)


def test_streaming_ingest_pairs_arrival_order(spark):
    """Unit pin for the arrival-order contract: when the LARGER id is
    already in the index and the SMALLER id arrives as the new batch,
    the cross join must still form the pair (the append-only-id batch
    ingest keys on new > other and would lose it)."""
    rows = [
        (10, "alpha beta gamma delta epsilon zeta"),
        (3, "alpha beta gamma delta epsilon zeta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    first = docs.filter(F.col("doc_id") == 10)
    second = docs.filter(F.col("doc_id") == 3)
    idx = ld.portable_band_index(ld.portable_base(first))
    got = ld.streaming_portable_ingest_pairs(second, idx, first).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in got] == [(3, 10)]
    assert got[0]["jaccard"] == 1.0


# ---------------------------------------------------------------------------
# index deletion == rebuild-without-X
# ---------------------------------------------------------------------------


def test_band_index_delete_equals_rebuild(spark, sf_dir):
    """Anti-join takedown over the persisted band index must equal
    rebuilding the index from the surviving documents, both at the
    index-row level and through the served pair pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    del_ids = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    full_base = ld.portable_base(docs)
    deleted = ld.portable_band_index(full_base).join(
        del_ids, "doc_id", "anti"
    )
    survivors = docs.filter(F.col("doc_id") % 7 != 0)
    rebuilt = ld.portable_band_index(ld.portable_base(survivors))
    key = lambda r: (r["doc_id"], r["band_idx"], r["key"])  # noqa: E731
    assert sorted(map(key, deleted.collect())) == sorted(
        map(key, rebuilt.collect())
    )
    pk = lambda r: (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))  # noqa: E731
    served = ld.portable_pairs_from_index(deleted, full_base)
    from_rebuild = ld.portable_minhash_pairs(survivors)
    assert sorted(map(pk, served.collect())) == sorted(
        map(pk, from_rebuild.collect())
    )


def test_ivf_delete_equals_rebuild(spark, sf_dir):
    """delete(append(index), X) must equal assigning the survivors
    under the SAME pinned centroids (the takedown contract: a delete
    never retrains the quantizer)."""
    emb = load_table(spark, sf_dir, "embeddings")
    cut = int(
        emb.agg(F.expr("max(vec_id) * 4 div 5").alias("c")).first()["c"]
    )
    corpus = emb.filter(F.col("vec_id") < cut)
    cents = ls._centroids(corpus)
    # the registered query's per-list bookkeeping, reduced to the
    # surviving assignment set
    got = {
        (r["cluster"], r["list_size_after"])
        for r in REGISTRY["embedding_ivf_delete"].spark(spark, sf_dir).collect()
    }
    survivors = emb.filter(F.col("vec_id") % 9 != 0)
    rebuilt = (
        ls.ivf_assignments(survivors, cents)
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    want = {(r["cluster"], r["n"]) for r in rebuilt.collect()}
    # clusters emptied by the delete still appear in the bookkeeping
    # (with after=0) but not in a rebuild; align on nonzero lists
    assert {g for g in got if g[1] > 0} == want
