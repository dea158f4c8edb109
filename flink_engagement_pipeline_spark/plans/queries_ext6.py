"""Round-8 extension batch: streaming incremental dedup-INDEX
maintenance (the daily-ingest shape a 100 TB pipeline actually runs,
promoted from batch queries to an exactly-once cross-micro-batch
replay), index lifecycle deletion (the GDPR/takedown shape), and
perceptual-hash near-dup for media.

House rules as ever: JVM-side expressions only, each oracle generated
from the same constants as the Spark plan, corpus-derived strings
never spliced into SQL text (F.lit literals only), every cross-engine
float hazard kept integer until a single final division.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import dedup as ld
from ..llm import similarity as ls
from ..sources.tables import load_table
from ..streaming.sinks import IdempotentParquetSink
from .registry import register

# ---------------------------------------------------------------------------
# streaming dedup-index maintenance (stream == full-rebuild batch)
# ---------------------------------------------------------------------------

_DOCS_STREAM_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


@register(
    "stream_minhash_index_replay",
    oracle=ld.portable_minhash_oracle_sql(),
    doc=(
        "Streaming incremental dedup-index maintenance — the r7 "
        "verdict's top capability ask. The documents fixture replays "
        "as two micro-batches carrying DISJOINT halves (even doc_ids "
        "in batch 0, odd in batch 1 — disjoint by PARITY, not by id "
        "range, so arrival order is deliberately NOT id order and the "
        "batch ingest's append-only-id contract would lose every "
        "(odd-then-even) pair). Each batch builds its portable-"
        "MinHash bands, joins them against the PERSISTED band index "
        "committed by earlier batches (plus itself for in-batch "
        "pairs), exact-verifies candidates reading corpus text "
        "id-keyed via the semi-pruned scan, and commits index' = "
        "index ∪ batch_bands and pairs' = pairs ∪ verified to "
        "exactly-once IdempotentParquetSinks keyed by batch id "
        "(redelivered batches skip on the _COMMITTED marker; each "
        "batch reads only state committed BELOW its own id, so a "
        "crash-replay recomputes from the same snapshot). The final "
        "committed pair set hash-matches the whole-corpus "
        "portable_minhash_pairs REBUILD oracle: stream == batch for "
        "index maintenance, the property that lets a 100 TB corpus "
        "keep one persisted band index and screen daily batches "
        "against it instead of re-scanning the corpus "
        "(llm/dedup.py:streaming_portable_ingest_pairs has the "
        "arrival-order proof sketch). Completes the family: "
        "stream_sketch_replay proved it for HLL registers, the batch "
        "twins (docs_minhash_ingest, docs_simhash_ingest, "
        "embedding_neardup_ingest, embedding_ivf_ingest) proved "
        "single-step ingest; this closes cross-batch index "
        "maintenance under the driver oracle."
    ),
    tags=("streaming", "dedup", "minhash", "index", "exactly-once"),
)
def q_stream_minhash_index_replay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    import glob

    tmp = tempfile.mkdtemp(prefix="stream_minhash_idx_")
    docs_dir = os.path.join(tmp, "docs")
    os.makedirs(docs_dir)
    src = os.path.abspath(os.path.join(sf_dir, "documents.parquet"))
    # same fixture file twice + maxFilesPerTrigger=1 -> two micro-batches
    os.symlink(src, os.path.join(docs_dir, "a.parquet"))
    os.symlink(src, os.path.join(docs_dir, "b.parquet"))
    index_sink = IdempotentParquetSink(os.path.join(tmp, "index"))
    pairs_sink = IdempotentParquetSink(os.path.join(tmp, "pairs"))

    def _committed(sink, below=None):
        out = []
        for m in glob.glob(os.path.join(sink.out_dir, "*", "_COMMITTED")):
            d = os.path.dirname(m)
            bid = int(os.path.basename(d).split("=")[1])
            if below is None or bid < below:
                out.append((bid, d))
        return sorted(out)

    def _read(dirpath):
        return spark.read.option("pathGlobFilter", "*.parquet").parquet(
            dirpath
        )

    docs_tbl = load_table(spark, sf_dir, "documents")

    def apply(df, bid):
        # batch i keeps doc_id % 2 == i: the replayed copies carve the
        # corpus into disjoint halves; parity (not id range) makes
        # arrival order differ from id order on purpose
        half = df.filter((F.col("doc_id") % 2) == F.lit(bid % 2)).select(
            "doc_id", "text"
        )
        prev_idx = _committed(index_sink, below=bid)
        if prev_idx:
            corpus_bands = _read(prev_idx[-1][1]).select(
                "doc_id", "band_idx", "key"
            )
            # corpus TEXT is read id-keyed to docs the index knows —
            # the persisted index is the only other corpus-side input
            corpus_docs = docs_tbl.join(
                corpus_bands.select("doc_id").distinct(), "doc_id", "leftsemi"
            ).select("doc_id", "text")
        else:
            corpus_bands = ld.portable_band_index(
                ld.portable_base(docs_tbl.limit(0))
            )
            corpus_docs = docs_tbl.limit(0).select("doc_id", "text")
        new_pairs = ld.streaming_portable_ingest_pairs(
            half, corpus_bands, corpus_docs
        )
        prev_pairs_dirs = _committed(pairs_sink, below=bid)
        if prev_pairs_dirs:
            all_pairs = _read(prev_pairs_dirs[-1][1]).unionByName(new_pairs)
        else:
            all_pairs = new_pairs
        new_index = corpus_bands.unionByName(
            ld.portable_band_index(ld.portable_base(half))
        )
        index_sink.write_batch(new_index, bid)
        pairs_sink.write_batch(all_pairs, bid)

    part_key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(part_key)
    spark.conf.set(part_key, "8")
    try:
        stream = (
            spark.readStream.schema(_DOCS_STREAM_SCHEMA)
            .option("pathGlobFilter", "*.parquet")
            .option("maxFilesPerTrigger", "1")
            .parquet(docs_dir)
        )
        q = (
            stream.writeStream.foreachBatch(apply)
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(part_key, saved)
    last_dir = _committed(pairs_sink)[-1][1]
    return _read(last_dir).select("doc_a", "doc_b", "jaccard")


# ---------------------------------------------------------------------------
# index lifecycle: deletion / takedown (remove == rebuild-without-X)
# ---------------------------------------------------------------------------


@register(
    "docs_minhash_index_delete",
    oracle=ld.portable_minhash_oracle_sql(where="doc_id % 7 <> 0"),
    doc=(
        "Dedup-index DELETION — the GDPR/takedown half of the index "
        "lifecycle (r7 verdict ask: every persisted index supported "
        "only append). The full portable band index is built, then a "
        "takedown id set (doc_id % 7 == 0, ~14% of the corpus, an "
        "arbitrary-id-list anti-join — not a partition drop) is "
        "REMOVED, and the standard candidate+verify pipeline "
        "(portable_pairs_from_index — the identical factored tail "
        "portable_minhash_pairs runs) is served from the post-delete "
        "index. Output hash-matches the REBUILD-WITHOUT-X oracle "
        "(same SQL generator, WHERE-parameterized), proving "
        "remove(add(X)) == rebuild-without-X for band indexes. The "
        "verify base deliberately stays the FULL corpus shingle "
        "table: candidates only ever come from the index, so deleted "
        "docs can never re-enter a pair and their text is never read "
        "(the semi-pruned scan skips them) — deleting index rows IS "
        "the takedown; text-store GC is an independent concern. At "
        "100 TB: one broadcast anti-join of a takedown-sized id list "
        "against the narrow band table, no signature recompute, no "
        "corpus scan."
    ),
    tags=("llm", "dedup", "minhash", "index", "delete"),
)
def q_docs_minhash_index_delete(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    base = ld.portable_base(docs)
    index = ld.portable_band_index(base)
    del_ids = docs.filter(F.col("doc_id") % 7 == 0).select("doc_id")
    kept = index.join(F.broadcast(del_ids), "doc_id", "anti")
    return ld.portable_pairs_from_index(kept, base)


@register(
    "embedding_ivf_delete",
    oracle=ls.ivf_delete_oracle_sql(),
    doc=(
        "IVF index DELETION — the vectors half of the takedown shape "
        "(docs_minhash_index_delete covers text band indexes). The "
        "served index is built exactly as ivf_ingest leaves it "
        "(corpus-trained pinned centroids, corpus + appended batch "
        "assignments), then a takedown set (vec_id % 9 == 0) is "
        "removed via one broadcast left-join mark over the narrow "
        "codes table; output is the per-list bookkeeping a serving "
        "system updates on takedown: (cluster, list_size_before, "
        "n_deleted, list_size_after). Quantizer stays PINNED through "
        "deletes (retraining is a rebuild, not a delete), so "
        "delete(append(index)) == assign(survivors) under the same "
        "centroids — the remove/rebuild equivalence pinned in pytest "
        "next to ivf_ingest's append equivalence. No vector reads, "
        "no index shuffle beyond the per-cluster aggregation."
    ),
    tags=("llm", "similarity", "ann", "ivf", "delete"),
)
def q_embedding_ivf_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    del_ids = emb.filter(F.col("vec_id") % 9 == 0).select("vec_id")
    return ls.ivf_index_delete(emb, del_ids)
