"""Round-7 extension batch: the tokenizer encode step closing the
BPE trainer->apply loop, incremental IVF index maintenance completing
the ingest story for the ANN serving stack, and exact-substring
duplicate-coverage dedup (the Lee et al. suffix-array method's
bounded anchor-merge equivalent) generalizing docs_span_dedup.

House rules as ever: JVM-side expressions only, each oracle generated
from the same constants as the Spark plan, corpus-derived strings
never spliced into SQL text (F.lit literals only), every cross-engine
float hazard kept integer until a single final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..llm import similarity as ls
from ..llm import text as lt
from ..sources.tables import load_table
from .registry import register

# DuckDB fragments mirroring llm/text.py helpers (same constants as
# queries_llm so the dialects cannot drift)
_NORM = "regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')"
_WORDS = f"string_split({_NORM}, ' ')"


# ---------------------------------------------------------------------------
# BPE encode (trainer -> apply loop closed)
# ---------------------------------------------------------------------------


@register(
    "docs_bpe_encode",
    oracle=lt.bpe_encode_oracle_sql(),
    doc=(
        "BPE encode — the apply half of the tokenizer loop "
        "(docs_bpe_merges trains the merge list; this maps every "
        "document to its BPE token-id sequence, what actually feeds "
        "sequence packing in a pre-training pipeline). Token ids are "
        "GPT-2-style: corpus characters in lexicographic order take "
        "0..C-1, merged symbols take C+rank-1. The key scale property "
        "is that BPE is word-LOCAL: the trained word->symbol-sequence "
        "table (TYPE count, not token count — it already exists as "
        "the training loop's final state) joins the posexploded "
        "corpus ONCE, so encoding costs corpus + types work, never "
        "corpus x merge-steps; symbol->id is a metadata-sized "
        "broadcast. Per-doc sequences rebuild via "
        "sort_array(collect_list(struct(word_pos, sym_pos, id))) — "
        "order-exact with no window over the token stream — and emit "
        "space-joined so the driver hash is engine-portable. Oracle: "
        "the unrolled k-stage training CTEs extended by vocab + "
        "encode stages; pytest cross-checks a pure-Python BPE "
        "encoder. Cites reference src/process.py:162-178 (the "
        "reference tokenizes with a static word vocab; training+apply "
        "is the capability a real pipeline needs)."
    ),
    tags=("llm", "text", "tokenizer", "bpe"),
)
def q_docs_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lt.bpe_encode(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# incremental IVF index maintenance
# ---------------------------------------------------------------------------


@register(
    "embedding_ivf_ingest",
    oracle=ls.ivf_ingest_oracle_sql(),
    doc=(
        "Incremental IVF index maintenance — the ANN serving stack's "
        "daily-ingest shape, completing what the dedup family proves "
        "for MinHash/SimHash/hyperplane indexes: new vectors (vec_id "
        ">= 80% of max, the shared split device) are assigned to the "
        "CORPUS-trained coarse centroids (strided seeds + one "
        "integer-quantized Lloyd step, pinned — never retrained on "
        "ingest) and appended to the persisted (vec_id, cluster) "
        "codes table. Assignment is a pure projection of the batch, "
        "so a nightly ingest costs batch-size work + a "
        "vocabulary-sized centroid read, never a corpus rescan; "
        "because the quantizer is pinned, append == rebuild "
        "(rebuild-equivalence pytest). Output rows carry the "
        "inverted list's post-append size — the bookkeeping a "
        "serving system keeps to decide list splits. Quantized "
        "training is order-independent, so the whole path "
        "hash-matches a full SQL oracle (train + assign + append "
        "CTEs)."
    ),
    tags=("llm", "similarity", "ann", "ivf", "incremental"),
)
def q_embedding_ivf_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ls.ivf_ingest(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# exact-substring duplicate coverage (anchor-merge form)
# ---------------------------------------------------------------------------

_SUB_N = 12


@register(
    "docs_substring_dedup",
    oracle=f"""
WITH base AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
anch AS (
    SELECT doc_id, t.i AS pos,
           {" || ' ' || ".join(f"ws[t.i+{d}]" for d in range(_SUB_N))} AS g
    FROM base CROSS JOIN unnest(generate_series(1, len(ws) - {_SUB_N - 1})) AS t(i)
),
cnt AS (SELECT g, count(*) AS n FROM anch GROUP BY g),
shared AS (
    SELECT a.doc_id, a.pos FROM anch a JOIN cnt USING (g) WHERE cnt.n >= 2
),
w AS (
    SELECT doc_id, pos,
           max(pos + {_SUB_N}) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
    FROM shared
),
i AS (
    SELECT doc_id, pos,
           SUM(CASE WHEN prev_end IS NULL OR pos > prev_end THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS island
    FROM w
),
g AS (
    SELECT doc_id, island,
           min(pos) AS s0, max(pos) + {_SUB_N} AS e0
    FROM i GROUP BY doc_id, island
),
per_doc AS (
    SELECT doc_id,
           count(*)                        AS n_dup_intervals,
           CAST(sum(e0 - s0) AS BIGINT)    AS dup_tokens
    FROM g GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.ws) AS BIGINT)                     AS n_tokens,
       COALESCE(p.n_dup_intervals, 0)                AS n_dup_intervals,
       COALESCE(p.dup_tokens, 0)                     AS dup_tokens,
       CAST(COALESCE(p.dup_tokens, 0) AS DOUBLE)
           / len(b.ws)                               AS dup_ratio
FROM base b LEFT JOIN per_doc p USING (doc_id)
""",
    doc=(
        f"Exact-substring duplicate coverage — the bounded form of "
        f"suffix-array substring dedup (Lee et al. 2022, "
        f"'Deduplicating Training Data Makes Language Models "
        f"Better'): every maximal shared token span of length >= "
        f"{_SUB_N} is recovered EXACTLY by anchoring {_SUB_N}-gram "
        f"positions that occur more than once corpus-wide (a shared "
        f"substring of length L is precisely a maximal run of L-"
        f"{_SUB_N}+1 shared anchors) and merging each document's "
        f"anchor intervals [i, i+{_SUB_N}) with the gaps-and-islands "
        f"running-max device (user_active_coverage's interval "
        f"algebra on token offsets). Within-doc repeats count, as in "
        f"the paper. Per doc: merged duplicated-interval count, "
        f"duplicated token coverage, and coverage ratio — the "
        f"quantity the dedup policy thresholds on before cutting. "
        f"Plan (snapshot in PLANS.md): the anchor pipeline is one "
        f"corpus scan (positional grams via the zip-shift device, "
        f"hashed to longs), anchor df via count-over-window on the "
        f"gram exchange (the spill-safe docs_span_dedup pattern — no "
        f"self-join), then two windows + two aggregations all riding "
        f"ONE doc_id exchange; a SECOND corpus scan builds the "
        f"doc roster with token counts (docs below the anchor length "
        f"must still report zero coverage — deriving the roster from "
        f"the anchor stream would either drop them or force a "
        f"posexplode_outer null bucket that skews the gram exchange). "
        f"Two scans + two shuffles total; the interval merge adds no "
        f"exchange."
    ),
    tags=("llm", "dedup", "substring", "interval-algebra"),
)
def q_docs_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import substring_dup_coverage
    from ..operators.util import fan_out

    docs = fan_out(
        load_table(spark, sf_dir, "documents").select("doc_id", "text")
    )
    return substring_dup_coverage(docs, _SUB_N)
