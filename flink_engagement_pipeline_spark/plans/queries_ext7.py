"""Round-10 extension batch: the index-lifecycle matrix COMPLETED —
streaming delta-append maintenance for the two embedding index
families (hyperplane LSH, IVF codes), closing the one empty column the
r9 verdict named — plus policy-triggered LSM compaction exercised
inside those registered maintenance loops, frame-level video near-dup
(frame fan-out x per-frame pHash, matched-frame-fraction scoring),
semantic dedup (the SemDeDup composition of the proven k-means and
cosine-verify pieces), and the cluster/survivor policy layer for the
media pHash axis.

House rules as ever: JVM-side expressions only, each oracle generated
from the same constants as the Spark plan, corpus-derived strings
never spliced into SQL text, every cross-engine float hazard kept
integer until a single final division.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import cluster as lc
from ..llm import dedup as ld
from ..llm import multimodal as lm
from ..llm import similarity as ls
from ..llm import text as lt
from ..operators.util import fan_out
from ..sources.tables import load_table
from ..streaming.sinks import IdempotentParquetSink
from .queries_ext6 import _EMB_STREAM_SCHEMA, _parity_replay
from .queries_ml2 import _QSCORE
from .registry import register

_SEMDEDUP_THRESHOLD = 0.35  # fixture-sized (i.i.d. vectors max ~0.51)

# ---------------------------------------------------------------------------
# streaming index maintenance for the embedding families
# ---------------------------------------------------------------------------


def run_neardup_index_replay(
    spark: SparkSession, sf_dir: str, tmp: str
) -> DataFrame:
    """Core of stream_neardup_index_replay: the hyperplane-LSH
    instance of the delta-append maintenance loop (parity split,
    batchId-keyed delta commits, below-own-id reads — the device
    proven on MinHash/SimHash/media-pHash in rounds 8-9), with the
    MinHash-class verify: candidates from the persisted 3-column
    index only, exact cosine reading corpus VECTORS id-keyed through
    the semi-pruned scan.

    Round-10 addition exercised here under the driver gate:
    POLICY-TRIGGERED compaction. ``maybe_compact(upto=bid)`` runs at
    the top of every batch with the aggressive knob
    (max_live_deltas=1), so the 2-batch replay folds batch 0's index
    delta into a ``compact=0`` snapshot BEFORE batch 1 reads its
    below-own-id state — the LSM fold runs inside the maintenance
    loop itself, bounded to durably-checkpointed ids (< bid), which
    is why a crash-replay can never find its view pruned
    (streaming/sinks.py contract; production tunes the knob to
    amortize the fold)."""
    index_sink = IdempotentParquetSink(os.path.join(tmp, "index"))
    pairs_sink = IdempotentParquetSink(os.path.join(tmp, "pairs"))
    emb_tbl = load_table(spark, sf_dir, "embeddings")

    def apply(df, bid):
        half = df.filter((F.col("vec_id") % 2) == F.lit(bid % 2)).select(
            "vec_id", "embedding"
        )
        batch_idx = ls.neardup_index(half)
        index_sink.maybe_compact(spark, upto=bid, max_live_deltas=1)
        prev = index_sink.committed_paths(below=bid)
        if prev:
            corpus_idx = spark.read.option(
                "pathGlobFilter", "*.parquet"
            ).parquet(*prev).select("vec_id", "t", "bucket")
            # corpus vectors are read id-keyed to vectors the index
            # knows — the persisted index is the only other
            # corpus-side input (the MinHash replay's contract)
            corpus_emb = emb_tbl.join(
                corpus_idx.select("vec_id").distinct(), "vec_id", "leftsemi"
            ).select("vec_id", "embedding")
        else:
            corpus_idx = batch_idx.limit(0)
            corpus_emb = emb_tbl.limit(0).select("vec_id", "embedding")
        new_pairs = ls.streaming_neardup_ingest_pairs(
            half, corpus_idx, corpus_emb, threshold=_SEMDEDUP_THRESHOLD
        )
        index_sink.write_batch(batch_idx, bid)
        pairs_sink.write_batch(new_pairs, bid)

    _parity_replay(spark, sf_dir, tmp, apply, "embeddings", _EMB_STREAM_SCHEMA)
    return pairs_sink.read_committed(spark).select(
        "vec_a", "vec_b", "cosine"
    )


@register(
    "stream_neardup_index_replay",
    oracle=ls.neardup_pairs_oracle_sql(threshold=_SEMDEDUP_THRESHOLD),
    doc=(
        "Streaming hyperplane-LSH index maintenance — the r9 "
        "verdict's top ask: the delta-append device generalized to "
        "the EMBEDDING axis, so the first of the two empty "
        "stream-maintain cells in the index-lifecycle matrix is "
        "filled (build embedding_neardup_pairs / ingest "
        "embedding_neardup_ingest / delete "
        "embedding_neardup_index_delete all pre-exist). The "
        "embeddings fixture replays as two parity micro-batches; "
        "each commits ONLY its own (vec_id, t, bucket) rows and its "
        "own verified pair delta to batchId-keyed exactly-once "
        "sinks, candidates come from the persisted index alone, and "
        "exact cosine verifies reading corpus vectors id-keyed "
        "through the semi-pruned scan (the MinHash-class verify; "
        "float payloads widen to double inside the cosine). "
        "Arrival-order agnostic "
        "(llm/similarity.py:streaming_neardup_ingest_pairs relaxes "
        "the batch ingest's append-only-id contract). NEW this "
        "round and exercised under the gate: POLICY-TRIGGERED "
        "compaction — maybe_compact(upto=bid, max_live_deltas=1) "
        "folds batch 0's delta into an LSM snapshot inside the loop, "
        "so batch 1 reads the compact= snapshot, not deltas. The "
        "union of committed pair deltas hash-matches the LSH-aware "
        "whole-corpus rebuild oracle (same pinned hyperplane "
        "literals as the delete twin — exact at any threshold "
        "regardless of LSH recall)."
    ),
    tags=("streaming", "similarity", "ann", "index", "exactly-once"),
)
def q_stream_neardup_index_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix="stream_neardup_idx_")
    return run_neardup_index_replay(spark, sf_dir, tmp)


def run_ivf_index_replay(
    spark: SparkSession, sf_dir: str, tmp: str
) -> DataFrame:
    """Core of stream_ivf_index_replay: streaming maintenance of the
    IVF codes table under a PINNED quantizer. The quantizer is the
    offline-trained coarse centroids (ls._centroids — strided seeds +
    one quantized Lloyd step, memoized; training is the one-time
    offline stage of an IVF serving stack and maintenance NEVER
    retrains, the same contract ivf_ingest/ivf_index_delete pin for
    the batch lifecycle). Each micro-batch assigns its own vectors —
    a zero-shuffle parsed-SQL projection — and commits only its own
    (vec_id, cluster) delta; the pinned quantizer makes the union of
    deltas EQUAL the whole-corpus rebuild (append == rebuild), which
    is what lets the full hash oracle carry over. Policy-triggered
    compaction folds the codes deltas mid-stream (max_live_deltas=1),
    so the replay's final read exercises the snapshot+delta path."""
    codes_sink = IdempotentParquetSink(os.path.join(tmp, "codes"))
    emb_tbl = load_table(spark, sf_dir, "embeddings")
    cents = ls._centroids(emb_tbl)

    def apply(df, bid):
        half = df.filter((F.col("vec_id") % 2) == F.lit(bid % 2)).select(
            "vec_id", "embedding"
        )
        codes_sink.maybe_compact(spark, upto=bid, max_live_deltas=1)
        codes_sink.write_batch(ls.ivf_assignments(half, cents), bid)

    _parity_replay(spark, sf_dir, tmp, apply, "embeddings", _EMB_STREAM_SCHEMA)
    return codes_sink.read_committed(spark).select("vec_id", "cluster")


@register(
    "stream_ivf_index_replay",
    oracle=ls.ivf_codes_oracle_sql(),
    doc=(
        "Streaming IVF codes-table maintenance — fills the SECOND "
        "empty stream-maintain cell of the index-lifecycle matrix, "
        "completing it: every persisted index family (MinHash bands, "
        "SimHash buckets, media pHash, hyperplane LSH, IVF codes) "
        "now has build, batch ingest, takedown, AND streaming "
        "maintenance, each hash-matched. The quantizer is pinned "
        "(trained offline once — ls._centroids' strided-seed + "
        "quantized-Lloyd trainer; maintenance never retrains, the "
        "ivf_ingest contract), so each parity micro-batch's "
        "assignment is a zero-shuffle parsed-SQL projection of "
        "batch-sized work, committed as a batchId-keyed "
        "(vec_id, cluster) delta — and append == rebuild under the "
        "pinned centroids means the union of committed deltas "
        "hash-matches the whole-corpus train+assign oracle (the "
        "embedding_kmeans CTE generators). The cheapest maintenance "
        "loop of all five families: no candidate join, no verify, no "
        "corpus-side read of any kind — batch vectors in, 2-column "
        "codes delta out. Policy-triggered compaction "
        "(maybe_compact, max_live_deltas=1) folds deltas into the "
        "LSM snapshot mid-stream."
    ),
    tags=("streaming", "similarity", "ann", "ivf", "exactly-once"),
)
def q_stream_ivf_index_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix="stream_ivf_idx_")
    return run_ivf_index_replay(spark, sf_dir, tmp)


# ---------------------------------------------------------------------------
# frame-level video near-dup
# ---------------------------------------------------------------------------


@register(
    "media_video_neardup",
    oracle=lm.media_video_oracle_sql(),
    doc=(
        "Frame-level VIDEO near-dup — the real video-dedup shape (r9 "
        "verdict ask #3), pure composition of proven pieces: the "
        "deterministic fake frame fan-out (sample_frames' geometry — "
        "frame count from digest byte 2, every 4th frame — evaluated "
        "JVM-side since the fake derives from payload bytes alone; a "
        "codec build would ride the Arrow-batched 1->N mapInPandas "
        "shape), per-frame 60-bit pHash through the IDENTICAL "
        "rotation-bucket index machinery as the document family "
        "(frames keyed doc*64+frame), and video pairs scored by "
        "MATCHED-FRAME FRACTION: >= 50% of the combined sampled "
        "frames must have a Hamming <= 6 partner in the other video. "
        "Candidates are bucketed at the FRAME level — the (rot, "
        "bucket) equi-join over the narrow frame index, never "
        "all-pairs over frames or videos; countDistinct collapses "
        "multi-rotation/multi-frame collisions before the single "
        "final division, so the whole composition hash-matches the "
        "DuckDB twin (the shared pHash signature CTE chain "
        "parameterized by the frames relation — one generator with "
        "the document pair/ingest/delete oracles)."
    ),
    tags=("llm", "multimodal", "media", "video", "phash", "dedup"),
)
def q_media_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # r15: fan_out — the prefix-cell shingle+md5 pass and per-frame
    # tail md5s inherit the fixture scan's ONE split and ran
    # single-threaded (guide §2.5; the text families' device). No-op
    # on real multi-split inputs; applied at corpus-scale callsites
    # so the streaming replays' micro-batch paths stay byte-identical.
    return lm.media_video_neardup(fan_out(lm.docs_as_media(docs)))


@register(
    "media_video_ingest",
    oracle=lm.media_video_oracle_sql(batch_only=True),
    doc=(
        "Incremental video ingest — the video frame index obeys the "
        "lifecycle principle the round it is born (no index family "
        "ships build-only): the batch (video ids >= 80% of max, the "
        "dedup family's shared split) fans out and hashes ONLY its "
        "own frames and screens against the persisted corpus frame "
        "index. Corpus-side inputs are the 4-column index alone — "
        "Hamming verify reads the hashes in it, and even corpus "
        "frame counts derive from its distinct frame keys "
        "(_video_nframes), so no corpus payload is ever read (the "
        "SimHash-class takedown-friendly property, now for video). "
        "Hash-matches the one video oracle generator restricted to "
        "pairs whose larger id is in the batch (under the append-"
        "only-id contract that IS the incremental screen's output); "
        "arrival-order-agnostic maintenance of this same index shape "
        "is the proven stream_media_phash_index_replay loop applied "
        "at frame keys."
    ),
    tags=("llm", "multimodal", "media", "video", "incremental"),
)
def q_media_video_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    cut = docs.agg(F.expr("max(doc_id) * 4 div 5").alias("c")).first()["c"]
    # r15: fan_out both sides — single-split scan fix (see
    # q_media_video_neardup); no-op on real multi-split inputs
    corpus_idx = lm.video_frame_buckets(
        fan_out(lm.docs_as_media(docs.filter(F.col("doc_id") < cut)))
    )
    new = fan_out(lm.docs_as_media(docs.filter(F.col("doc_id") >= cut)))
    return lm.incremental_media_video_ingest(new, corpus_idx)


def run_media_video_index_replay(
    spark: SparkSession, sf_dir: str, tmp: str
) -> DataFrame:
    """Core of stream_media_video_index_replay: the video instance of
    the delta-append maintenance loop. Each parity micro-batch fans
    out and hashes ONLY its own videos' frames, screens them against
    the persisted frame index (scoring needs nothing else — hashes
    for the Hamming verify, distinct frame keys for the
    denominators), and commits its own index/pair deltas; policy
    compaction folds mid-stream like the embedding replays."""
    index_sink = IdempotentParquetSink(os.path.join(tmp, "index"))
    pairs_sink = IdempotentParquetSink(os.path.join(tmp, "pairs"))

    def apply(df, bid):
        half = lm.docs_as_media(
            df.filter((F.col("doc_id") % 2) == F.lit(bid % 2))
        )
        batch_idx = lm.video_frame_buckets(half)
        index_sink.maybe_compact(spark, upto=bid, max_live_deltas=1)
        prev = index_sink.committed_paths(below=bid)
        if prev:
            corpus_idx = spark.read.option(
                "pathGlobFilter", "*.parquet"
            ).parquet(*prev).select("doc_id", "phash", "rot", "bucket")
        else:
            corpus_idx = batch_idx.limit(0)
        new_pairs = lm.streaming_media_video_ingest_pairs(half, corpus_idx)
        index_sink.write_batch(batch_idx, bid)
        pairs_sink.write_batch(new_pairs, bid)

    _parity_replay(spark, sf_dir, tmp, apply)
    return pairs_sink.read_committed(spark).select(
        "doc_a",
        "doc_b",
        "matched_a",
        "matched_b",
        "frames_a",
        "frames_b",
        "match_frac",
    )


@register(
    "stream_media_video_index_replay",
    oracle=lm.media_video_oracle_sql(),
    doc=(
        "Streaming video frame-index maintenance — the sixth and last "
        "persisted index family gets its stream-maintain cell the "
        "round it is born, so the FULL lifecycle matrix (build, batch "
        "ingest, takedown, streaming maintenance) x (MinHash bands, "
        "SimHash buckets, media pHash, hyperplane LSH, IVF codes, "
        "video frame index) is complete with every cell hash-matched. "
        "Same delta-append device as the other five replays, with the "
        "video-specific twist: a video arrives WHOLE, so a pair forms "
        "once — in the later batch — and everything the matched-"
        "frame-fraction score needs for both sides is already in the "
        "indexes (hashes for the verify, distinct frame keys for the "
        "denominators); a batch hashes only its own frames and reads "
        "no corpus payloads ever. Arrival-order agnostic "
        "(llm/multimodal.py:streaming_media_video_ingest_pairs "
        "normalizes either id order with per-side frame "
        "attribution); policy compaction folds the frame-index "
        "deltas mid-stream. The union of committed pair deltas "
        "hash-matches the whole-corpus media_video_neardup rebuild "
        "oracle — the same generator as the build/ingest/delete "
        "stages."
    ),
    tags=("streaming", "multimodal", "media", "video", "exactly-once"),
)
def q_stream_media_video_index_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    tmp = tempfile.mkdtemp(prefix="stream_video_idx_")
    return run_media_video_index_replay(spark, sf_dir, tmp)


@register(
    "media_video_index_delete",
    oracle=lm.media_video_oracle_sql(where="doc_id % 6 = 0"),
    doc=(
        "Video frame-index DELETION — takedown by VIDEO id over the "
        "frame-level index (one broadcast anti-join on the recovered "
        "video key, doc_id div 64), served by the factored tail "
        "media_video_pairs_from_index: one code path deleted or not. "
        "Because the tail derives even frame COUNTS from the index's "
        "distinct frame keys, deleting a video's index rows removes "
        "its pairs AND its denominator contribution in one stroke — "
        "no payload read, no frame re-fan-out, and the output "
        "hash-matches the rebuild-without-X twin (the same "
        "WHERE-parameterized generator as the build and ingest)."
    ),
    tags=("llm", "multimodal", "media", "video", "delete"),
)
def q_media_video_index_delete(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    # r15: fan_out — single-split scan fix (see q_media_video_neardup)
    index = lm.video_frame_buckets(fan_out(lm.docs_as_media(docs)))
    del_ids = docs.filter(F.col("doc_id") % 6 == 0).select(
        F.col("doc_id").alias("vid")
    )
    kept = (
        index.withColumn("vid", F.expr("doc_id div 64"))
        .join(F.broadcast(del_ids), "vid", "anti")
        .drop("vid")
    )
    return lm.media_video_pairs_from_index(kept)


# ---------------------------------------------------------------------------
# semantic dedup (SemDeDup)
# ---------------------------------------------------------------------------


@register(
    "embedding_semdedup",
    oracle=lc.semantic_dedup_oracle_sql(threshold=_SEMDEDUP_THRESHOLD),
    doc=(
        "Semantic dedup — the SemDeDup composition (Abbas et al. "
        "2023): k-means the embedding corpus with the oracle-exact "
        "quantized Lloyd trainer (the embedding_kmeans machinery, "
        "k=8 x 3 iterations, deterministic lowest-id init), then "
        "screen WITHIN each cluster only and drop every vector with "
        "a lower-id >= 0.35-cosine duplicate in its cluster (the "
        "keep-one policy, lowest id as representative; 0.35 is "
        "fixture-sized — i.i.d. vectors max ~0.51). The within-"
        "cluster pair join is the deliberate SemDeDup trade: the "
        "equi-join key is the CLUSTER id, so candidate space is "
        "sum_c(n_c^2), never the n^2 cross-cluster all-pairs, and k "
        "is the knob that bounds cluster size at corpus scale — "
        "enforced by a metadata-sized pair-budget guard (a k too "
        "small for the corpus refuses loudly, naming the oversized "
        "clusters). "
        "Returns the full keep/drop decision (vec_id, cluster, "
        "is_kept). Every stage — trainer, assignment projection, "
        "fold cosine, keep/drop anti-join — is engine-exact, so the "
        "iterative-algorithm composition hash-matches one unrolled "
        "SQL text (the kmeans CTE generators + the strict-order pair "
        "screen)."
    ),
    tags=("llm", "embedding", "dedup", "clustering", "semdedup"),
)
def q_embedding_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lc.semantic_dedup(emb, threshold=_SEMDEDUP_THRESHOLD)


# ---------------------------------------------------------------------------
# media dedup policy layer (clusters + quality survivors)
# ---------------------------------------------------------------------------


# Shared by media_dedup_survivors and the multimodal manifest
# (queries_ext8): the full media keep/drop policy as one SQL text.
MEDIA_SURVIVORS_ORACLE = f"""
WITH cl AS (
  SELECT doc_id, cluster_id
  FROM ({ld.closure_oracle_sql(lm.media_phash_oracle_sql())}) t
),
q AS (SELECT doc_id, {_QSCORE} AS quality_score FROM documents),
j AS (
  SELECT cl.doc_id AS doc_id, cl.cluster_id AS cluster_id,
         q.quality_score AS quality_score
  FROM cl JOIN q USING (doc_id)
)
SELECT doc_id, cluster_id, quality_score,
       first_value(doc_id) OVER (
           PARTITION BY cluster_id
           ORDER BY quality_score DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS survivor_id,
       doc_id = first_value(doc_id) OVER (
           PARTITION BY cluster_id
           ORDER BY quality_score DESC, doc_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS is_survivor
FROM j
"""


@register(
    "media_dedup_survivors",
    oracle=MEDIA_SURVIVORS_ORACLE,
    doc=(
        "Media dedup POLICY layer (r9 verdict ask #7): the pHash "
        "pair family gains the cluster/survivor stage every text "
        "family already has — perceptual pairs (media_phash_pairs, "
        "the rotation-bucket candidates + index-only Hamming verify) "
        "feed the SAME connected-components min-label propagation as "
        "the text pipelines, and each media cluster keeps its "
        "HIGHEST-QUALITY member (the docs_dedup_survivors_quality "
        "policy — quality desc, doc_id asc tiebreak — over the "
        "payload-derived quality score). One extra cluster-keyed "
        "window over the closure; the recursive-CTE closure + "
        "quality scoring are both replicated in the oracle (the "
        "closure generator shared with the text families), so the "
        "full media keep/drop policy hash-matches."
    ),
    tags=("llm", "multimodal", "media", "dedup", "policy"),
)
def q_media_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return media_survivors_frame(spark, sf_dir)


def media_survivors_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The media keep/drop policy (doc_id, cluster_id, quality_score,
    survivor_id, is_survivor) — shared by media_dedup_survivors and
    the multimodal manifest (queries_ext8)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # r15: fan_out — single-split scan fix (guide §2.5; see
    # queries_ext6.q_media_phash_neardup)
    pairs = lm.media_phash_pairs(fan_out(lm.docs_as_media(docs)))
    cc = ld.connected_components(
        pairs.select("doc_a", "doc_b"), docs.select("doc_id")
    )
    q = docs.select(
        "doc_id",
        lt.quality_score("text")["quality_score"].alias("quality_score"),
    )
    j = cc.select("doc_id", "cluster_id").join(q, "doc_id")
    w = (
        Window.partitionBy("cluster_id")
        .orderBy(F.col("quality_score").desc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    survivor = F.first("doc_id").over(w)
    return j.select(
        "doc_id",
        "cluster_id",
        "quality_score",
        survivor.alias("survivor_id"),
        (F.col("doc_id") == survivor).alias("is_survivor"),
    )
