"""Round-8 additions: streaming dedup-index maintenance and index
lifecycle deletion (remove == rebuild-without-X). Round 9 adds the
DELTA-APPEND persistence pins: per-batch written state proportional
to the batch, and snapshot compaction transparent to readers."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from flink_engagement_pipeline_spark.llm import dedup as ld
from flink_engagement_pipeline_spark.llm import similarity as ls
from flink_engagement_pipeline_spark.plans.queries_ext6 import (
    run_minhash_index_replay,
)
from flink_engagement_pipeline_spark.plans.registry import REGISTRY
from flink_engagement_pipeline_spark.sources.tables import load_table
from flink_engagement_pipeline_spark.streaming.sinks import (
    IdempotentParquetSink,
)

# ---------------------------------------------------------------------------
# streaming dedup-index maintenance
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def replay_run(spark, sf_dir):
    """One shared streaming replay run: (state tmp dir, result rows).
    The replay is a real Structured Streaming job (~6-10 s); every
    test below asserts against this single execution."""
    tmp = tempfile.mkdtemp(prefix="test_minhash_idx_")
    rows = run_minhash_index_replay(spark, sf_dir, tmp).collect()
    return tmp, rows


def test_stream_minhash_replay_matches_batch_rebuild(spark, sf_dir, replay_run):
    """The union of per-batch pair DELTAS committed across two
    disjoint micro-batches must equal the whole-corpus batch rebuild,
    and the fixture must contain pairs whose SMALLER id arrives in the
    LATER batch (the parity split guarantees arrival order != id
    order) — otherwise the arrival-order claim would be vacuously
    true."""
    _, res = replay_run
    got = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9)) for r in res
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


def _dir_bytes(d: str) -> int:
    return sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(d)
        for f in fs
    )


def test_stream_index_deltas_proportional(spark, sf_dir, replay_run):
    """Delta-append persistence pin (r8 verdict's top fix): each
    micro-batch commits ONLY its own band rows and pair rows — the
    r8 behavior rewrote the full accumulated index+pairs every batch
    (O(corpus-index) I/O per batch). Row-level: the two index deltas
    PARTITION the whole-corpus band index (each delta exactly its
    parity half, summing to the full count); pair deltas are
    disjoint. Byte-level: each delta dir is a strict fraction of the
    total, i.e. no directory holds a full-state rewrite."""
    tmp, _ = replay_run
    docs = load_table(spark, sf_dir, "documents")
    full_bands = ld.portable_band_index(ld.portable_base(docs))
    half_counts = {
        p: full_bands.join(
            docs.filter(F.col("doc_id") % 2 == p).select("doc_id"),
            "doc_id",
            "leftsemi",
        ).count()
        for p in (0, 1)
    }
    idx_deltas = {}
    for bid in (0, 1):
        d = os.path.join(tmp, "index", f"batch_id={bid}")
        assert os.path.exists(os.path.join(d, "_COMMITTED"))
        df = spark.read.option("pathGlobFilter", "*.parquet").parquet(d)
        parities = {r["p"] for r in df.select((F.col("doc_id") % 2).alias("p")).distinct().collect()}
        assert parities == {bid}, "delta must contain only its own half"
        idx_deltas[bid] = df.count()
    assert idx_deltas[0] == half_counts[0]
    assert idx_deltas[1] == half_counts[1]
    assert idx_deltas[0] + idx_deltas[1] == full_bands.count()
    # pair deltas disjoint: together they are the full result, and the
    # batch-1 delta never re-writes a batch-0 pair
    p0 = spark.read.parquet(os.path.join(tmp, "pairs", "batch_id=0"))
    p1 = spark.read.parquet(os.path.join(tmp, "pairs", "batch_id=1"))
    k = lambda r: (r["doc_a"], r["doc_b"])  # noqa: E731
    s0, s1 = set(map(k, p0.collect())), set(map(k, p1.collect()))
    assert not (s0 & s1)
    # byte-level: neither index delta dir holds the full state
    b0 = _dir_bytes(os.path.join(tmp, "index", "batch_id=0"))
    b1 = _dir_bytes(os.path.join(tmp, "index", "batch_id=1"))
    assert b0 < (b0 + b1) * 0.75 and b1 < (b0 + b1) * 0.75


def test_sink_compact_transparent(spark, sf_dir, replay_run):
    """IdempotentParquetSink.compact folds committed deltas into a
    snapshot without changing what readers see: same rows before and
    after, superseded delta dirs pruned, committed_paths resolves to
    the single snapshot, and a post-compaction append layers on top
    (snapshot + new delta)."""
    tmp, res = replay_run
    sink = IdempotentParquetSink(os.path.join(tmp, "pairs"))
    before = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in sink.read_committed(spark).collect()
    )
    snap = sink.compact(spark)
    assert snap and os.path.basename(snap) == "compact=1"
    after = sorted(
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in sink.read_committed(spark).collect()
    )
    assert before == after
    assert sink.committed_paths() == [snap]
    assert not os.path.exists(os.path.join(tmp, "pairs", "batch_id=0"))
    # idempotent: nothing new to fold
    assert sink.compact(spark) is None
    # a later delta stacks on the snapshot
    extra = spark.range(1).select(
        F.lit(-1).cast("long").alias("doc_a"),
        F.lit(-2).cast("long").alias("doc_b"),
        F.lit(1.0).alias("jaccard"),
    )
    sink.write_batch(extra, 2)
    paths = sink.committed_paths()
    assert paths[0] == snap and paths[1].endswith("batch_id=2")
    assert sink.read_committed(spark).count() == len(before) + 1
    # state-below-a-batch view: batch 2's own rows are excluded
    assert set(sink.committed_paths(below=2)) == {snap}


def test_stream_index_maintenance_with_midstream_compaction(spark, sf_dir, tmp_path):
    """Compaction BETWEEN maintenance batches must be invisible to the
    result: batch 0 commits its band/pair deltas, the index folds into
    a compact= snapshot (deltas pruned), batch 1 reads its
    below-own-id state — now the snapshot — and the union of pair
    deltas still equals the whole-corpus rebuild. Pins the
    snapshot+delta read path (committed_paths) inside the maintenance
    loop, not just at rest."""
    docs = load_table(spark, sf_dir, "documents")
    index_sink = IdempotentParquetSink(str(tmp_path / "index"))
    pairs_sink = IdempotentParquetSink(str(tmp_path / "pairs"))

    def apply(bid):
        half = docs.filter((F.col("doc_id") % 2) == bid).select(
            "doc_id", "text"
        )
        prev = index_sink.committed_paths(below=bid)
        if prev:
            corpus_bands = spark.read.option(
                "pathGlobFilter", "*.parquet"
            ).parquet(*prev).select("doc_id", "band_idx", "key")
            corpus_docs = docs.join(
                corpus_bands.select("doc_id").distinct(), "doc_id", "leftsemi"
            ).select("doc_id", "text")
        else:
            corpus_bands = ld.portable_band_index(
                ld.portable_base(docs.limit(0))
            )
            corpus_docs = docs.limit(0).select("doc_id", "text")
        new_pairs = ld.streaming_portable_ingest_pairs(
            half, corpus_bands, corpus_docs
        )
        index_sink.write_batch(
            ld.portable_band_index(ld.portable_base(half)), bid
        )
        pairs_sink.write_batch(new_pairs, bid)

    apply(0)
    snap = index_sink.compact(spark)
    assert snap and "compact=0" in snap
    assert not (tmp_path / "index" / "batch_id=0").exists()  # pruned
    apply(1)
    # batch 1 must have read exactly the snapshot as its corpus state
    assert index_sink.committed_paths(below=1) == [snap]
    got = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in pairs_sink.read_committed(spark).collect()
    }
    want = {
        (r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
        for r in ld.portable_minhash_pairs(docs).collect()
    }
    assert got == want and want


def test_stream_simhash_replay_matches_batch_rebuild(spark, sf_dir):
    """The SimHash instance of delta-append maintenance: the union of
    per-batch pair deltas must equal the whole-corpus
    simhash_near_pairs rebuild, each index delta must contain only its
    own parity half, and the batch's corpus-side input must be the
    index alone (structural: streaming_simhash_ingest_pairs takes no
    text argument)."""
    import tempfile

    from flink_engagement_pipeline_spark.plans.queries_ext6 import (
        run_simhash_index_replay,
    )

    tmp = tempfile.mkdtemp(prefix="test_simhash_idx_")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in run_simhash_index_replay(spark, sf_dir, tmp).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    want = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in ld.simhash_near_pairs(docs).collect()
    }
    assert got == want and want
    # arrival-order non-vacuity: some pair's smaller id is odd (batch 1)
    assert any(a % 2 == 1 and b % 2 == 0 for a, b, _ in want)
    for bid in (0, 1):
        d = os.path.join(tmp, "index", f"batch_id={bid}")
        df = spark.read.option("pathGlobFilter", "*.parquet").parquet(d)
        ps = {
            r["p"]
            for r in df.select((F.col("doc_id") % 2).alias("p"))
            .distinct()
            .collect()
        }
        assert ps == {bid}


def test_streaming_simhash_ingest_arrival_order(spark):
    """Unit pin: a smaller id arriving after its larger near-dup
    partner (already in the index) must still pair — the relaxation
    over incremental_simhash_ingest's append-only-id contract."""
    rows = [
        (10, "alpha beta gamma delta epsilon zeta"),
        (3, "alpha beta gamma delta epsilon zeta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = ld.simhash_buckets(docs.filter(F.col("doc_id") == 10))
    got = ld.streaming_simhash_ingest_pairs(
        docs.filter(F.col("doc_id") == 3), idx
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in got] == [
        (3, 10, 0)
    ]


def test_stream_media_phash_replay_matches_batch_rebuild(spark, sf_dir):
    """Media pHash streaming maintenance: the union of per-batch pair
    deltas equals the whole-corpus media_phash_pairs rebuild, and
    each index delta holds only its parity half (delta-append, never
    a full-state rewrite)."""
    import tempfile

    from flink_engagement_pipeline_spark.llm import multimodal as lm
    from flink_engagement_pipeline_spark.plans.queries_ext6 import (
        run_media_phash_index_replay,
    )

    tmp = tempfile.mkdtemp(prefix="test_phash_idx_")
    got = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in run_media_phash_index_replay(spark, sf_dir, tmp).collect()
    }
    docs = load_table(spark, sf_dir, "documents")
    want = {
        (r["doc_a"], r["doc_b"], r["hamming"])
        for r in lm.media_phash_pairs(lm.docs_as_media(docs)).collect()
    }
    assert got == want and want
    assert any(a % 2 == 1 and b % 2 == 0 for a, b, _ in want)
    for bid in (0, 1):
        d = os.path.join(tmp, "index", f"batch_id={bid}")
        df = spark.read.option("pathGlobFilter", "*.parquet").parquet(d)
        ps = {
            r["p"]
            for r in df.select((F.col("doc_id") % 2).alias("p"))
            .distinct()
            .collect()
        }
        assert ps == {bid}


def test_streaming_media_phash_arrival_order(spark):
    """Unit pin: a smaller id arriving after its identical-payload
    partner (already in the index) still pairs at Hamming 0."""
    from flink_engagement_pipeline_spark.llm import multimodal as lm

    rows = [
        (10, "alpha beta gamma delta epsilon zeta"),
        (3, "alpha beta gamma delta epsilon zeta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    idx = lm.media_phash_buckets(
        lm.docs_as_media(docs.filter(F.col("doc_id") == 10))
    )
    got = lm.streaming_media_phash_ingest_pairs(
        lm.docs_as_media(docs.filter(F.col("doc_id") == 3)), idx
    ).collect()
    assert [(r["doc_a"], r["doc_b"], r["hamming"]) for r in got] == [
        (3, 10, 0)
    ]


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
# perceptual-hash media near-dup
# ---------------------------------------------------------------------------


def test_media_phash_matches_pure_python_and_separates(spark, sf_dir):
    """media_phash must equal an independent pure-Python aHash over
    the same fake decode, exact-dup payloads must land at Hamming 0,
    and the near/far separation claimed in the docstring must hold on
    the fixture: every Jaccard>=0.8 near-dup pair within the verify
    threshold, random non-near pairs far outside it."""
    import hashlib
    import itertools
    import re

    import duckdb

    from flink_engagement_pipeline_spark.llm import multimodal as lm

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()

    def shset(t, n=3):
        ws = re.sub(r"\s+", " ", t.strip().lower()).split(" ")
        if len(ws) >= n:
            return {" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)}
        return {" ".join(ws)}

    def py_phash(t, bits=60):
        pix = [0] * bits
        for s in shset(t):
            h = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            pix[h % bits] += (h // bits) % 256
        tot = sum(pix)
        return sum(1 << b for b in range(bits) if pix[b] * bits > tot)

    want = {d: py_phash(t) for d, t in rows}
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: r["phash"]
        for r in lm.media_phash(lm.docs_as_media(docs)).collect()
    }
    assert got == want
    # recall + separation on the text ground truth
    S = {d: shset(t) for d, t in rows}
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in lm.media_phash_pairs(lm.docs_as_media(docs)).collect()
    }
    near = [
        (a, b)
        for (a, sa), (b, sb) in itertools.combinations(S.items(), 2)
        if len(sa & sb) / len(sa | sb) >= 0.8
    ]
    assert near, "fixture should contain near-dup payloads"
    assert all((min(a, b), max(a, b)) in pairs for a, b in near)
    # exact dups at Hamming 0
    exact = [
        (a, b) for (a, b) in near if S[a] == S[b]
    ]
    for a, b in exact:
        assert pairs[(min(a, b), max(a, b))] == 0
    # emitted pairs are all within threshold; fixture separation means
    # none sit just under it by luck of a random collision
    assert all(h <= lm.PHASH_MAX_HAMMING for h in pairs.values())


def test_media_phash_lifecycle_equivalences(spark, sf_dir):
    """The media pHash index must obey the same lifecycle algebra as
    every other index family the round it is born: ingest(corpus
    index, batch) finds exactly the full rebuild's pairs touching the
    batch (append == rebuild under the append-only-id split), and
    delete == rebuild-without-X through the served pair pipeline."""
    from flink_engagement_pipeline_spark.llm import multimodal as lm

    docs = load_table(spark, sf_dir, "documents")
    media = lm.docs_as_media(docs)
    cut = docs.agg(F.expr("max(doc_id) * 4 div 5").alias("c")).first()["c"]
    # ingest == rebuild: batch-vs-(corpus ∪ batch) matches the full
    # build's pairs with their larger id in the batch
    corpus_idx = lm.media_phash_buckets(
        lm.docs_as_media(docs.filter(F.col("doc_id") < cut))
    )
    got = {
        (r["doc_id"], r["dup_of"], r["hamming"])
        for r in lm.incremental_media_phash_ingest(
            lm.docs_as_media(docs.filter(F.col("doc_id") >= cut)),
            corpus_idx,
        ).collect()
    }
    full = {
        (r["doc_b"], r["doc_a"], r["hamming"])
        for r in lm.media_phash_pairs(media).collect()
        if r["doc_b"] >= cut
    }
    assert got == full
    assert got, "split should produce ingest matches on the fixture"
    # delete == rebuild-without-X through the served tail
    del_ids = docs.filter(F.col("doc_id") % 6 == 0).select("doc_id")
    kept = lm.media_phash_buckets(media).join(del_ids, "doc_id", "anti")
    pk = lambda r: (r["doc_a"], r["doc_b"], r["hamming"])  # noqa: E731
    served = lm.media_phash_pairs_from_index(kept)
    rebuilt = lm.media_phash_pairs(
        lm.docs_as_media(docs.filter(F.col("doc_id") % 6 != 0))
    )
    assert sorted(map(pk, served.collect())) == sorted(
        map(pk, rebuilt.collect())
    )


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


def test_simhash_index_delete_equals_rebuild(spark, sf_dir):
    """Anti-join takedown over the SimHash bucket index must equal
    rebuilding the index from the surviving documents — at the
    index-row level and through the served pair pipeline (round 9:
    the takedown lifecycle completed for the simhash family)."""
    docs = load_table(spark, sf_dir, "documents")
    del_ids = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    deleted = ld.simhash_buckets(docs).join(del_ids, "doc_id", "anti")
    survivors = docs.filter(F.col("doc_id") % 5 != 0)
    rebuilt = ld.simhash_buckets(survivors)
    key = lambda r: (r["doc_id"], r["rot"], r["bucket"])  # noqa: E731
    assert sorted(map(key, deleted.collect())) == sorted(
        map(key, rebuilt.collect())
    )
    pk = lambda r: (r["doc_a"], r["doc_b"], r["hamming"])  # noqa: E731
    served = ld.simhash_pairs_from_index(deleted)
    from_rebuild = ld.simhash_near_pairs(survivors)
    assert sorted(map(pk, served.collect())) == sorted(
        map(pk, from_rebuild.collect())
    )


def test_neardup_index_delete_equals_rebuild(spark, sf_dir):
    """Anti-join takedown over the hyperplane-LSH index must equal
    rebuilding from the surviving vectors through the served pair
    pipeline (verify base stays the full store — candidates only come
    from the index, so deleted vectors can never re-enter)."""
    emb = load_table(spark, sf_dir, "embeddings")
    del_ids = emb.filter(F.col("vec_id") % 6 == 0).select("vec_id")
    deleted = ls.neardup_index(emb).join(del_ids, "vec_id", "anti")
    survivors = emb.filter(F.col("vec_id") % 6 != 0)
    pk = lambda r: (  # noqa: E731
        r["vec_a"], r["vec_b"], round(r["cosine"], 9)
    )
    served = ls.neardup_pairs_from_index(deleted, emb, threshold=0.35)
    from_rebuild = ls.near_dup_pairs(survivors, threshold=0.35)
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
