"""ML-adjacent corpus operators: distributed k-means, embedding
quantization, BM25 retrieval, deterministic epoch ordering, and an
EWMA time-series fold.

Every query here carries a full hash-matching DuckDB oracle —
including the iterative k-means, which is rare: the integer-quantized
centroid update (see llm/cluster.py) makes every Lloyd iteration
order-independent, so the unrolled SQL recursion reproduces Spark's
result bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import cluster as lc
from ..llm import text as lt
from ..llm.cluster import _km_dist, km_assign_cte, km_update_cte
from ..llm.similarity import _dot
from ..operators.rank import global_row_number
from ..sources.tables import load_table
from .queries_llm import _WORDS
from .registry import register

# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------

_KM_K = 8
_KM_ITERS = 3
_KM_DIM = 64


def _km_oracle() -> str:
    """Unrolled Lloyd recursion: c0 -> (a1, c1) -> ... -> final
    assignment against c{ITERS}. Mirrors llm/cluster.py step for step;
    the quantized update keeps every float op identical across
    engines."""
    parts = [
        "WITH e AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cl, v
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {_KM_K}) t
)""",
    ]
    for i in range(1, _KM_ITERS + 1):
        parts.append(km_assign_cte(f"a{i}", f"c{i - 1}"))
        parts.append(km_update_cte(f"c{i}", f"a{i}", f"c{i - 1}", _KM_K, _KM_DIM))
    dist = _km_dist("e.v", "c.v")
    parts.append(
        f"""final AS (
  SELECT vec_id, cluster, dist FROM (
    SELECT e.vec_id AS vec_id, CAST(c.cl AS INT) AS cluster,
           {dist} AS dist,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {dist} ASC, c.cl ASC) AS rn
    FROM e CROSS JOIN c{_KM_ITERS} c) t
  WHERE rn = 1
)"""
    )
    return (
        ",\n".join(parts) + "\nSELECT vec_id, cluster, dist FROM final"
    )


@register(
    "embedding_kmeans",
    oracle=_km_oracle(),
    doc=(
        f"Distributed k-means (Lloyd's, k={_KM_K}, {_KM_ITERS} "
        "iterations, deterministic lowest-vec_id init) over the "
        "embedding corpus — the IVF-index / diversity-sampling "
        "training step as a first-class operator. Centroids are plan "
        "literals (metadata on the driver); each iteration is one "
        "scan + one (cluster,dim)-keyed integer aggregation whose "
        "output is k*dim rows, so the driver never holds more than "
        "metadata. The integer-quantized mean makes the whole "
        "recursion order-independent: the unrolled SQL oracle "
        "hash-matches an ITERATIVE float algorithm bit-for-bit. "
        "Assignment is a pure projection (zero shuffle) at any scale."
    ),
    tags=("llm", "embedding", "clustering", "iterative"),
)
def q_embedding_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return lc.kmeans(emb, k=_KM_K, iters=_KM_ITERS)


# ---------------------------------------------------------------------------
# product quantization + ADC search
# ---------------------------------------------------------------------------


def _pq_oracle() -> str:
    from ..llm.pq import PQ_K, PQ_M, PQ_SUBDIM

    parts = [
        "WITH e0 AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        "cnt AS (SELECT count(*) AS n FROM e0)",
    ]
    for s in range(PQ_M):
        lo, hi = s * PQ_SUBDIM + 1, (s + 1) * PQ_SUBDIM
        parts.append(
            f"sub{s} AS (SELECT vec_id, v[{lo}:{hi}] AS v FROM e0)"
        )
        parts.append(
            f"""seeds{s} AS (
  SELECT CAST(vec_id // greatest(1, n // {PQ_K}) AS INT) AS cl, v
  FROM sub{s}, cnt
  WHERE vec_id % greatest(1, n // {PQ_K}) = 0
    AND vec_id < {PQ_K} * greatest(1, n // {PQ_K})
)"""
        )
        parts.append(km_assign_cte(f"a{s}", f"seeds{s}", src=f"sub{s}"))
        parts.append(
            km_update_cte(f"cb{s}", f"a{s}", f"seeds{s}", PQ_K, PQ_SUBDIM)
        )
        parts.append(km_assign_cte(f"enc{s}", f"cb{s}", src=f"sub{s}"))
        parts.append(
            f"b{s} AS (SELECT vec_id, cl AS c{s} FROM enc{s})"
        )
        parts.append(f"q{s} AS (SELECT v FROM sub{s} WHERE vec_id = 0)")
        parts.append(
            f"""dt{s} AS (
  SELECT c.cl AS cl, {_km_dist("q.v", "c.v")} AS d
  FROM cb{s} c CROSS JOIN q{s} q
)"""
        )
    join_b = " ".join(f"JOIN b{s} USING (vec_id)" for s in range(1, PQ_M))
    join_dt = " ".join(
        f"JOIN dt{s} ON dt{s}.cl = b.c{s}" for s in range(PQ_M)
    )
    csv = " || ',' || ".join(f"CAST(b.c{s} AS VARCHAR)" for s in range(PQ_M))
    est = " + ".join(f"dt{s}.d" for s in range(PQ_M))
    parts.append(
        f"""enc AS (SELECT * FROM b0 {join_b})"""
    )
    return (
        ",\n".join(parts)
        + f"""
SELECT vec_id, codes_csv, est_dist FROM (
  SELECT b.vec_id AS vec_id,
         {csv} AS codes_csv,
         {est} AS est_dist
  FROM enc b {join_dt}) t
ORDER BY est_dist ASC, vec_id ASC
LIMIT 10
"""
    )


@register(
    "embedding_pq_adc",
    oracle=_pq_oracle(),
    doc=(
        "Product-quantization ANN (PQ8x16 + asymmetric-distance "
        "top-10): each 64-dim vector compresses to 8 four-bit codes "
        "(32x smaller than float32) via per-subspace codebooks "
        "trained with the integer-quantized Lloyd step — ALL 8 "
        "subspaces in one aggregation pass (1024 metadata rows). The "
        "query never touches raw vectors after encoding: serving "
        "scans the PERSISTED codes table (llm/pq.py:encoded_table, "
        "built once per corpus), the query's 8x16 distance table "
        "enters as plan literals, and the estimated distance is 8 "
        "array lookups + 7 adds per row, ranked by "
        "TakeOrderedAndProject. Training + encoding + ADC ranking "
        "unroll into plain SQL CTEs, so this approximate index "
        "hash-matches its oracle codebook-bit for codebook-bit — the "
        "compressed-scan serving tier of a billion-vector ANN stack, "
        "completing LSH (buckets) and IVF (inverted lists)."
    ),
    tags=("llm", "embedding", "ann", "pq", "quantization"),
)
def q_embedding_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm import pq

    return pq.adc_topk(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------

@register(
    "embedding_quantize",
    oracle="""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
s AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / CAST(127 AS DOUBLE) AS scale,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0
              THEN CAST(1 AS DOUBLE)
              ELSE list_max(list_transform(v, x -> abs(x))) / CAST(127 AS DOUBLE)
         END AS safe
  FROM e
),
q AS (
  SELECT vec_id, v, scale, safe,
         list_transform(v, x -> CAST(floor(x / safe + CAST(0.5 AS DOUBLE))
                                     AS INT)) AS qv
  FROM s
)
SELECT vec_id,
       scale,
       array_to_string(list_transform(qv, x -> CAST(x AS VARCHAR)), ',') AS q_csv,
       list_dot_product(list_transform(range(1, 65), i -> v[i] - qv[i]*scale),
                        list_transform(range(1, 65), i -> v[i] - qv[i]*scale))
           / CAST(64 AS DOUBLE) AS mse
FROM q
""",
    doc=(
        "Symmetric int8 embedding quantization (scale = max|x|/127, "
        "round-half-up) with per-vector reconstruction MSE — the "
        "4x-shuffle-shrink an ANN index build applies before "
        "shipping vectors. Pure projection, zero shuffle; ids ship "
        "as CSV so the value-hash compare is container-agnostic. "
        "No clamp is needed: |x| <= max|x| bounds every id to "
        "[-127, 127] by construction."
    ),
    tags=("llm", "embedding", "quantization"),
)
def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.col("v")
    amax = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = amax / F.lit(127.0)
    safe = F.when(amax == 0, F.lit(1.0)).otherwise(scale)
    base = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
    ).select(
        "vec_id", "v", scale.alias("scale"), safe.alias("safe")
    )
    qv = F.transform(
        v, lambda x: F.floor(x / F.col("safe") + F.lit(0.5)).cast("int")
    )
    quant = base.select("vec_id", "v", "scale", qv.alias("qv"))
    err = F.zip_with(
        F.col("v"), F.col("qv"), lambda x, q: x - q * F.col("scale")
    )
    return quant.select(
        "vec_id",
        "scale",
        F.array_join(
            F.transform(F.col("qv"), lambda x: x.cast("string")), ","
        ).alias("q_csv"),
        (_dot(err, err) / F.lit(64.0)).alias("mse"),
    )


# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ("spark", "query", "stream", "join")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_TOPK = 20


def _bm25_oracle() -> str:
    tf_cols = ",\n         ".join(
        f"len(list_filter(ws, w -> w = '{t}')) AS tf{i}"
        for i, t in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n         ".join(
        f"sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS df{i}"
        for i in range(len(_BM25_TERMS))
    )
    terms = "\n       + ".join(
        f"(floor(ln((n_docs - df{i} + CAST(0.5 AS DOUBLE))"
        f" / (df{i} + CAST(0.5 AS DOUBLE)) + CAST(1 AS DOUBLE))"
        f" * 1e9 + CAST(0.5 AS DOUBLE)) / 1e9)"
        f" * (tf{i} * CAST({_BM25_K1 + 1} AS DOUBLE))"
        f" / (tf{i} + CAST({_BM25_K1} AS DOUBLE)"
        f" * (CAST({1 - _BM25_B} AS DOUBLE)"
        f" + CAST({_BM25_B} AS DOUBLE) * (dl / avgdl)))"
        for i in range(len(_BM25_TERMS))
    )
    return f"""
WITH feat AS (
  SELECT doc_id, len(ws) AS dl,
         {tf_cols}
  FROM (SELECT doc_id, {_WORDS} AS ws FROM documents) b
),
stats AS (
  SELECT count(*) AS n_docs,
         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl,
         {df_cols}
  FROM feat
)
SELECT doc_id, dl AS n_tokens,
       {terms} AS score
FROM feat CROSS JOIN stats
ORDER BY score DESC, doc_id ASC
LIMIT {_BM25_TOPK}
"""


@register(
    "docs_bm25",
    oracle=_bm25_oracle(),
    doc=(
        f"BM25 retrieval (k1={_BM25_K1}, b={_BM25_B}): score every "
        f"document against the query terms {_BM25_TERMS} and return "
        f"the top {_BM25_TOPK} — the lexical-retrieval half of a "
        "RAG/contamination pipeline. Plan: one projection pass "
        "computes per-doc term frequencies, a metadata-sized global "
        "aggregate (N, avgdl, per-term df) broadcasts back, the "
        "score is a pure expression, and the top-k is "
        "TakeOrderedAndProject — per-partition heaps, no global "
        "sort. Per-term contributions sum in fixed term order, and "
        "the idf (the only transcendental, whose libm ln differs by "
        "~1 ulp across engines) is quantized at 1e-9, so the score "
        "arithmetic is engine-exact."
    ),
    tags=("llm", "text", "retrieval", "bm25"),
)
def q_docs_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bm25_topk_frame(spark, sf_dir)


def bm25_topk_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The BM25 lexical top-k (doc_id, n_tokens, score) — shared by
    docs_bm25 and the docs_hybrid_retrieval fusion (queries_ext8)."""
    docs = load_table(spark, sf_dir, "documents")
    ws = lt.words("text")

    def _tf(term: str):
        # closure helper: a 2-arg lambda would be read as (element,
        # index) by F.filter, so bind the term here
        return F.size(F.filter(ws, lambda w: w == F.lit(term)))

    feat = docs.select(
        "doc_id",
        F.size(ws).alias("dl"),
        *[_tf(t).alias(f"tf{i}") for i, t in enumerate(_BM25_TERMS)],
    )
    stats = feat.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("int")).alias(f"df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(_BM25_TERMS)):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        # idf quantized at 1e-9: libm ln differs by ~1 ulp between the
        # JVM and DuckDB (measured), and idf is the ONLY transcendental
        # in the chain — quantizing it makes the rest of the score
        # arithmetic engine-exact
        idf = (
            F.floor(
                F.log(
                    (F.col("n_docs") - df + F.lit(0.5)) / (df + F.lit(0.5))
                    + F.lit(1.0)
                )
                * F.lit(1e9)
                + F.lit(0.5)
            )
            / F.lit(1e9)
        )
        term = (
            idf
            * (tf * F.lit(_BM25_K1 + 1))
            / (
                tf
                + F.lit(_BM25_K1)
                * (
                    F.lit(1 - _BM25_B)
                    + F.lit(_BM25_B) * (F.col("dl") / F.col("avgdl"))
                )
            )
        )
        score = term if score is None else score + term
    return (
        feat.crossJoin(F.broadcast(stats))
        .select("doc_id", F.col("dl").alias("n_tokens"), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(_BM25_TOPK)
    )


# ---------------------------------------------------------------------------
# unigram LM log-probability scoring
# ---------------------------------------------------------------------------

@register(
    "docs_unigram_logprob",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, unnest(ws) AS w
  FROM (SELECT doc_id, {_WORDS} AS ws FROM documents) b
),
vocab AS (
  SELECT w, count(*) AS c FROM toks GROUP BY w
),
tot AS (SELECT sum(c) AS t FROM vocab),
qlp AS (
  SELECT w,
         CAST(floor(ln(CAST(c AS DOUBLE) / CAST(t AS DOUBLE)) * 1e9
                    + CAST(0.5 AS DOUBLE)) AS BIGINT) AS q
  FROM vocab, tot
)
SELECT t.doc_id                                   AS doc_id,
       count(*)                                   AS n_tokens,
       CAST(sum(q.q) AS DOUBLE) / 1e9             AS logprob,
       -(CAST(sum(q.q) AS DOUBLE) / 1e9) / count(*) AS xent
FROM toks t JOIN qlp q ON t.w = q.w
GROUP BY t.doc_id
""",
    doc=(
        "Unigram language-model scoring: train token probabilities on "
        "the corpus itself (one vocab aggregation), then score every "
        "document's total log-probability and per-token cross-entropy "
        "— the CCNet/C4-style LM quality filter, self-trained. "
        "Per-token log p is quantized to integer nano-nats (floor(ln*"
        "1e9+0.5) as BIGINT), so the per-doc sum is an ORDER-"
        "INDEPENDENT integer aggregation — no float-sum "
        "nondeterminism, and the one transcendental (ln, ~1 ulp libm "
        "skew across engines) is absorbed by the quantization exactly "
        "as in docs_bm25. Plan: one token explode feeding both the "
        "vocab aggregation and the score join (word-keyed equi-join "
        "— the vocab shuffles, never collects), then one doc_id "
        "aggregation."
    ),
    tags=("llm", "text", "quality", "language-model"),
)
def q_docs_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(lt.words("text")).alias("w"))
    vocab = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").alias("t"))
    qlp = vocab.crossJoin(F.broadcast(tot)).select(
        "w",
        F.floor(
            F.log(F.col("c").cast("double") / F.col("t").cast("double"))
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("q"),
    )
    scored = toks.join(qlp, "w").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("q").alias("sq"),
    )
    logprob = F.col("sq").cast("double") / F.lit(1e9)
    return scored.select(
        "doc_id",
        "n_tokens",
        logprob.alias("logprob"),
        (-logprob / F.col("n_tokens")).alias("xent"),
    )


# ---------------------------------------------------------------------------
# deterministic epoch ordering
# ---------------------------------------------------------------------------

_EPOCH_SALT = ":ep1"


@register(
    "docs_epoch_order",
    oracle=f"""
SELECT doc_id,
       md5(CAST(doc_id AS VARCHAR) || '{_EPOCH_SALT}') AS shuffle_key,
       row_number() OVER (ORDER BY md5(CAST(doc_id AS VARCHAR)
                                       || '{_EPOCH_SALT}'), doc_id)
           AS sample_idx
FROM documents
""",
    doc=(
        "Deterministic training-epoch ordering: every document gets a "
        "pseudo-random-but-reproducible shuffle key (md5 of id + "
        "epoch salt) and a contiguous global sample index in that "
        "order — how a trainer addresses 'sample 31,337 of epoch 1' "
        "without materializing a shuffled copy. The numbering uses "
        "the distributed global_row_number primitive (range "
        "boundaries as plan literals + broadcast offsets): no "
        "SinglePartition exchange, no cached relation, any scale. "
        "Changing the salt re-shuffles every epoch for free."
    ),
    tags=("llm", "corpus", "ordering", "sampling"),
)
def q_docs_epoch_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.rank import hex_prefix_pid

    docs = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(_EPOCH_SALT)))
    base = docs.select("doc_id", key.alias("shuffle_key"))
    # shuffle_key is an md5 digest — uniform, so the arithmetic
    # hex-prefix range id skips the device's count + sample passes
    return global_row_number(
        base, ["shuffle_key", "doc_id"], out="sample_idx",
        pid_expr=hex_prefix_pid(
            "shuffle_key", spark.sparkContext.defaultParallelism
        ),
    )


# ---------------------------------------------------------------------------
# EWMA time-series fold
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.125  # 1/8: exactly representable, engine-identical


@register(
    "events_ewma",
    oracle=f"""
SELECT user_id,
       count(*) AS n_events,
       list_reduce(
         list_prepend(CAST(0 AS DOUBLE),
                      list(CAST(value AS DOUBLE) ORDER BY ts, event_id)),
         (acc, x) -> acc * CAST({1 - _EWMA_ALPHA} AS DOUBLE)
                     + x * CAST({_EWMA_ALPHA} AS DOUBLE)) AS ewma_value
FROM events
WHERE value IS NOT NULL
GROUP BY user_id
""",
    doc=(
        f"Per-user exponentially weighted moving average (alpha = "
        f"{_EWMA_ALPHA}) of event value in (ts, event_id) order — the "
        "linear-recurrence class of time-series operator (EWMA / "
        "decayed counters / momentum) that plain SQL aggregates "
        "cannot express order-independently. The fold runs as a "
        "sequential array aggregate after one groupBy shuffle; state "
        "per user is its event list, bounded by the per-key history "
        "(window it first at 100 TB — the operator composes with "
        "user_trailing_7d_value's RANGE frame for that). alpha = 1/8 "
        "is exactly representable, and both engines fold "
        "left-to-right over the same total order, so the chained "
        "double arithmetic is bit-identical."
    ),
    tags=("timeseries", "window", "fold"),
)
def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    vals = F.array_sort(
        F.collect_list(F.struct(F.col("ts"), F.col("event_id"), F.col("value")))
    )
    ewma = F.aggregate(
        vals,
        F.lit(0.0),
        lambda acc, s: acc * F.lit(1 - _EWMA_ALPHA)
        + s["value"] * F.lit(_EWMA_ALPHA),
    )
    return ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ewma.alias("ewma_value"),
    )
