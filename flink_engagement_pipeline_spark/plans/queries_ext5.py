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

from ..llm import dedup as ld
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


# ---------------------------------------------------------------------------
# within-doc repetition signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------


@register(
    "docs_repeated_spans",
    oracle=f"""
WITH base AS (SELECT doc_id, {_WORDS} AS ws FROM documents),
toks AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens FROM base),
big AS (
    SELECT doc_id, ws[t.i] || ' ' || ws[t.i+1] AS g
    FROM base CROSS JOIN unnest(generate_series(1, len(ws) - 1)) AS t(i)
),
top2 AS (
    SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n
    FROM (SELECT doc_id, g, count(*) AS c FROM big GROUP BY doc_id, g)
    GROUP BY doc_id
),
anch AS (
    SELECT doc_id, t.i AS pos,
           {" || ' ' || ".join(f"ws[t.i+{d}]" for d in range(5))} AS g
    FROM base CROSS JOIN unnest(generate_series(1, len(ws) - 4)) AS t(i)
),
shared AS (
    SELECT doc_id, pos FROM (
        SELECT doc_id, pos,
               count(*) OVER (PARTITION BY doc_id, g) AS n
        FROM anch) WHERE n >= 2
),
w AS (
    SELECT doc_id, pos,
           max(pos + 5) OVER (
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
    SELECT doc_id, island, min(pos) AS s0, max(pos) + 5 AS e0
    FROM i GROUP BY doc_id, island
),
rep5 AS (
    SELECT doc_id, CAST(sum(e0 - s0) AS BIGINT) AS rep5_tokens
    FROM g GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens,
       COALESCE(b.top_bigram_n, 0)                          AS top_bigram_n,
       CAST(COALESCE(b.top_bigram_n, 0) * 2 AS DOUBLE)
           / t.n_tokens                                     AS top_bigram_frac,
       COALESCE(r.rep5_tokens, 0)                           AS rep5_tokens,
       CAST(COALESCE(r.rep5_tokens, 0) AS DOUBLE)
           / t.n_tokens                                     AS rep5_frac
FROM toks t
LEFT JOIN top2 b USING (doc_id)
LEFT JOIN rep5 r USING (doc_id)
""",
    doc=(
        "Within-document repeated-SPAN signals, complementing the ratio "
        "family docs_repetition already reports (distinct-word / "
        "top-word / dup-bigram fractions) with the other two Gopher "
        "repetition filter classes (Rae et al. 2021 SA1.1): per doc, the most frequent word bigram's count and "
        "spanned-token fraction (count*2/n_tokens, uncapped as in the "
        "paper's char-fraction form), and the token coverage of the "
        "UNION of all word 5-grams repeating within the doc (the "
        "gaps-and-islands interval merge shared with "
        "docs_substring_dedup — llm/dedup.py:merged_dup_intervals — "
        "so overlapping repeats never double-count). Three "
        "column-pruned (doc_id, text) scans — one per branch, cheaper "
        "at scale than single-scanning into a full-token-stream "
        "shuffle; bigram top-count is two map-side-partial "
        "hash aggregations, 5-gram coverage rides (doc_id, gram) then "
        "doc_id exchanges; every ratio is a single final double "
        "division of exact longs (implementation "
        "llm/text.py:repetition_stats)."
    ),
    tags=("llm", "text", "quality", "repetition", "gopher"),
)
def q_docs_repeated_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.util import fan_out

    return lt.repetition_stats(
        fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    )


# ---------------------------------------------------------------------------
# exact-substring scrub (the removal half of substring dedup)
# ---------------------------------------------------------------------------


@register(
    "docs_substring_scrub",
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
    SELECT doc_id, island, min(pos) AS s0, max(pos) + {_SUB_N} AS e0
    FROM i GROUP BY doc_id, island
),
pos AS (
    SELECT doc_id, t.i AS p, ws[t.i] AS tok
    FROM base CROSS JOIN unnest(generate_series(1, len(ws))) AS t(i)
),
kept AS (
    SELECT p.doc_id, p.p, p.tok FROM pos p
    WHERE NOT EXISTS (SELECT 1 FROM g
                      WHERE g.doc_id = p.doc_id
                        AND p.p >= g.s0 AND p.p < g.e0)
),
kd AS (
    SELECT doc_id, CAST(count(*) AS BIGINT) AS kept_tokens,
           string_agg(tok, ' ' ORDER BY p) AS scrubbed_text
    FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.ws) AS BIGINT)        AS n_tokens,
       COALESCE(kd.kept_tokens, 0)      AS kept_tokens,
       COALESCE(kd.scrubbed_text, '')   AS scrubbed_text
FROM base b LEFT JOIN kd USING (doc_id)
""",
    doc=(
        f"Exact-substring SCRUB — the removal half of substring dedup "
        f"(docs_substring_dedup measures coverage; this emits the "
        f"cleaned corpus): every token covered by a corpus-shared "
        f">= {_SUB_N}-token span is excised and survivors re-joined "
        f"in order. Policy: ALL copies of a duplicated span are "
        f"removed (boilerplate-removal semantics; Lee et al.'s "
        f"keep-one alternative needs a global occurrence order). The "
        f"merged intervals collapse to ONE metadata-sized array row "
        f"per affected doc (collect_list of (s0, e0) structs, bounded "
        f"by interval count), joined doc-level; the scrub itself is "
        f"expression-only (filter(ws, (w, i) -> uncovered) + "
        f"array_join) so no token-level explode or per-token join "
        f"ever materializes — at 100 TB the heavy objects stay in "
        f"the anchor pipeline docs_substring_dedup already pays "
        f"(implementation llm/dedup.py:substring_scrub). The oracle "
        f"mirrors with 1-based positions (interval arithmetic uses "
        f"differences only) and a NOT EXISTS anti-containment per "
        f"position."
    ),
    tags=("llm", "dedup", "substring", "scrub", "interval-algebra"),
)
def q_docs_substring_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..llm.dedup import substring_scrub
    from ..operators.util import fan_out

    return substring_scrub(
        fan_out(load_table(spark, sf_dir, "documents").select("doc_id", "text")),
        _SUB_N,
    )


# ---------------------------------------------------------------------------
# exact percentile aggregates
# ---------------------------------------------------------------------------

# sign-aware integer-cent quantization, NULL-preserving (the
# queries_ext4 device): percentile inputs must be exact integers so
# the only floats both engines touch are the interpolation weights,
# which are computed from identical literals
_Q_CENTS_SQL = """
CASE WHEN value IS NULL THEN NULL
     WHEN value >= 0 THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
     ELSE -CAST(floor(-value * 100 + 0.5) AS BIGINT) END
"""


@register(
    "events_latency_quantiles",
    oracle=f"""
WITH c AS (SELECT event_type, {_Q_CENTS_SQL} AS cents FROM events),
q AS (
    SELECT event_type,
           CAST(count(cents) AS BIGINT)            AS n,
           quantile_cont(cents, [0.5, 0.9, 0.99])  AS qs
    FROM c GROUP BY event_type
)
SELECT event_type, n,
       CAST(CAST(floor(qs[1] * 1e6 + 0.5) AS BIGINT) AS DOUBLE) / 1e8 AS p50_value,
       CAST(CAST(floor(qs[2] * 1e6 + 0.5) AS BIGINT) AS DOUBLE) / 1e8 AS p90_value,
       CAST(CAST(floor(qs[3] * 1e6 + 0.5) AS BIGINT) AS DOUBLE) / 1e8 AS p99_value
FROM q
""",
    doc=(
        "Exact interpolated percentiles (p50/p90/p99 of `value` per "
        "event_type) — the continuous-quantile member of the extended "
        "aggregate surface (the sketch family covers the approximate "
        "path: HDR histogram quantiles in hdr_latency_quantiles). "
        "Cross-engine float discipline: inputs are sign-aware integer "
        "cents (exact), so Spark's `percentile` and DuckDB's "
        "`quantile_cont` interpolate lo + frac*(hi - lo) from "
        "IDENTICAL integers with IDENTICAL p*(n-1) weights computed "
        "from the same literals; the result is then quantized to 1e-6 "
        "cents (floor(q*1e6 + 0.5) — an exact integer in double "
        "range) and returned to value units by ONE division. Exact "
        "percentile is a full-sort-per-group aggregate — fine for "
        "low-cardinality group keys (5 event types), while the HDR "
        "sketch remains the mergeable scale path for high-cardinality "
        "or streaming rollups."
    ),
    tags=("aggregates", "percentile", "quantile"),
)
def q_events_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    cents = F.expr(_Q_CENTS_SQL)
    q = ev.select("event_type", cents.alias("cents")).groupBy("event_type").agg(
        F.count("cents").alias("n"),
        F.percentile("cents", F.lit([0.5, 0.9, 0.99])).alias("qs"),
    )

    def out(i: int) -> F.Column:
        return (
            F.floor(F.col("qs")[i] * 1e6 + 0.5).cast("double") / F.lit(1e8)
        )

    return q.select(
        "event_type",
        "n",
        out(0).alias("p50_value"),
        out(1).alias("p90_value"),
        out(2).alias("p99_value"),
    )


# ---------------------------------------------------------------------------
# exact k-NN graph (blocked all-pairs)
# ---------------------------------------------------------------------------


@register(
    "embedding_knn_graph",
    oracle=ls.knn_graph_oracle_sql(),
    doc=(
        "Exact corpus-wide k-NN graph (top-5 cosine neighbors for "
        "EVERY vector) — the primitive graph-based dedup/clustering "
        "builds on, generalizing embedding_knn_join from Q broadcast "
        "queries to all n. Blocked all-pairs: the left side keeps its "
        "own block id (vec_id mod 8), the right replicates to every "
        "block, so the block equi-join meets each pair exactly once "
        "inside ordinary join machinery (AQE-splittable, no "
        "CartesianProduct node); vector payloads drop before the "
        "top-k exchange so only 24-byte (a, b, cosine) rows shuffle "
        "into the per-vector row_number window (ties -> neighbor id). "
        "Exact all-pairs is the O(n^2) calibration baseline by "
        "definition; the production route at corpus scale is the ANN "
        "candidate family feeding the same window "
        "(llm/similarity.py:knn_graph). Sequential-fold dot product "
        "== DuckDB list_dot_product, so the brute-force oracle "
        "hash-matches bit-for-bit."
    ),
    tags=("llm", "similarity", "ann", "knn-graph"),
)
def q_embedding_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ls.knn_graph(load_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# connected components by star contraction
# ---------------------------------------------------------------------------


@register(
    "docs_cc_star",
    oracle=ld.dedup_clusters_oracle_sql(),  # shared with docs_dedup_clusters
    doc=(
        "Near-dup clustering via LARGE-STAR/SMALL-STAR contraction "
        "(Kiveris et al. 2014) — the O(log n)-round connected-"
        "components alternative to docs_dedup_clusters' min-label "
        "propagation, whose round count is the component DIAMETER. "
        "Same Jaccard>=0.5 pair graph, same (doc_id, cluster_id, "
        "is_survivor) output, same recursive-closure DuckDB oracle — "
        "the two CC algorithms must agree bit-for-bit, and do. Each "
        "star phase is one groupBy-min on the node key + one edge "
        "equi-join (min(N(u)) only — no neighborhood list ever "
        "materializes); convergence is checksum-detected then "
        "confirmed EXACTLY by a fixpoint check before returning "
        "(operators/graph.py:connected_components_star). Chain-shaped "
        "graphs are where this wins: a 300-node chain converges in 5 "
        "alternating rounds where 25-round label propagation raises "
        "(pinned in tests/test_graph.py). Not plan-snapshotted: the "
        "round count is data-dependent, so the composed plan skeleton "
        "is not stable across fixtures by design."
    ),
    tags=("llm", "dedup", "clustering", "graph", "iterative"),
)
def q_docs_cc_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.graph import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    pairs = ld.ngram_jaccard_pairs(docs, 3, 0.5).select("doc_a", "doc_b")
    labels = connected_components_star(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    )
    return (
        docs.select("doc_id")
        .join(labels.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        )
        .select(
            "doc_id",
            "cluster_id",
            (F.col("doc_id") == F.col("cluster_id")).alias("is_survivor"),
        )
    )


# ---------------------------------------------------------------------------
# triangle counting (degree-ordered wedges)
# ---------------------------------------------------------------------------


@register(
    "parts_triangles",
    oracle="""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
  SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
),
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e
  ) GROUP BY node
),
tri AS (
  -- canonical x < y < z: each triangle exactly once
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_triangles FROM (
    SELECT x AS node FROM tri
    UNION ALL SELECT y FROM tri
    UNION ALL SELECT z FROM tri
  ) GROUP BY node
)
SELECT d.node,
       d.degree,
       COALESCE(c.n_triangles, 0)                    AS n_triangles,
       CASE WHEN d.degree < 2 THEN 0.0
            ELSE CAST(COALESCE(c.n_triangles, 0) AS DOUBLE) * 2.0
                 / (d.degree * (d.degree - 1)) END   AS clustering_coeff
FROM deg d LEFT JOIN corners c ON c.node = d.node
""",
    doc=(
        "Per-part triangle counts + local clustering coefficient over "
        "the co-purchase graph (the community-density signal: a "
        "part whose co-purchase neighbors also co-purchase each other "
        "sits inside a basket community; a hub with coefficient ~0 "
        "bridges unrelated baskets). Implementation is DEGREE-ORDERED "
        "wedge counting (operators/graph.py:triangle_counts): every "
        "edge oriented from its (degree, id)-smaller endpoint, so "
        "each triangle has exactly ONE apex generating its wedge and "
        "join volume is sum(out_deg^2) with out_deg = O(sqrt(m)) — "
        "power-law hubs receive edges instead of emitting wedges, the "
        "property that keeps this runnable on a 100 TB graph where "
        "the naive neighborhood self-join explodes on the first hub. "
        "The oracle brute-forces the canonical x<y<z 3-join instead — "
        "per-node counts are algorithm-independent, so the cheap "
        "oracle checks the clever plan. Coefficient = 2t/deg(deg-1) "
        "as ONE final double division of exact longs in both engines."
    ),
    tags=("graph", "triangles", "clustering-coefficient"),
)
def q_parts_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from ..operators.graph import triangle_counts

    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    edges = (
        items.alias("a")
        .join(
            items.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    return triangle_counts(edges)


# ---------------------------------------------------------------------------
# BPE-token bigram LM scoring (tokenizer -> encoder -> quality filter)
# ---------------------------------------------------------------------------


@register(
    "docs_bpe_perplexity",
    oracle=lt.bpe_bigram_logprob_oracle_sql(),
    doc=(
        "Subword-level LM quality scoring — the tokenizer trainer "
        "(docs_bpe_merges), the encoder (docs_bpe_encode) and the "
        "bigram LM ladder (docs_bigram_logprob) COMPOSED into the "
        "loop a production pipeline actually runs: train tokenizer "
        "-> encode corpus -> score every document by token-level "
        "log-probability / cross-entropy. Subword scoring is what "
        "real quality filters use (a word-level LM blows its "
        "vocabulary on rare words and typos; BPE ids make every "
        "bigram in-vocabulary by construction, so the perplexity "
        "signal degrades gracefully instead of zeroing out on OOV). "
        "Determinism: per-bigram ln quantized to integer nano-nats "
        "(order-independent doc sums), and the ENTIRE composed "
        "pipeline — greedy merge training, encode, counts, smoothing "
        "— hash-matches one end-to-end SQL oracle (the shared encode "
        "CTE stages + the word-LM oracle's scoring stages over ids). "
        "Plan: encode's id arrays feed one zip-shift bigram explode "
        "(no window over the token stream); model counts and the "
        "scoring join ride the same exploded frame; training is "
        "memoized per process so merges/encode/perplexity in one "
        "session pay one training run "
        "(implementation llm/text.py:bpe_bigram_logprob)."
    ),
    tags=("llm", "text", "tokenizer", "bpe", "quality", "language-model"),
)
def q_docs_bpe_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lt.bpe_bigram_logprob(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# dynamic-gap session windows (Flink session gap extractor)
# ---------------------------------------------------------------------------


@register(
    "session_windows_dynamic",
    oracle="""
WITH o AS (
    SELECT user_id,
           CAST(ts AS TIMESTAMP) AS ts,
           CAST(value AS DECIMAL(18,2)) AS v,
           CAST(ts AS TIMESTAMP)
               + CASE WHEN event_type = 'purchase'
                      THEN INTERVAL 30 MINUTE
                      ELSE INTERVAL 10 MINUTE END AS e
    FROM events
),
w AS (
    SELECT user_id, ts, v, e,
           max(e) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS prev_max
    FROM o
),
i AS (
    SELECT user_id, ts, v, e,
           SUM(CASE WHEN prev_max IS NULL OR ts >= prev_max
                    THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
    FROM w
)
SELECT user_id,
       min(ts)                 AS session_start,
       max(e)                  AS session_end,
       count(*)                AS n_events,
       CAST(SUM(v) AS DOUBLE)  AS sum_value
FROM i
GROUP BY user_id, sid
""",
    doc=(
        "DYNAMIC-GAP session windows — Flink's session gap extractor "
        "(a per-event gap function) as Spark's session_window with a "
        "gap EXPRESSION: a purchase holds its session open 30 min, "
        "any other event 10 min, so high-intent moments stretch the "
        "session the way engagement analytics actually define it. "
        "Semantics (and the oracle's device) generalize fixed-gap "
        "sessions from lag-comparison to true INTERVAL MERGE: each "
        "event spans [ts, ts + gap(event)); overlapping spans merge; "
        "session end = max per-event end (a long-gap event can bridge "
        "OVER a short-gap successor, which a lag-based oracle would "
        "split — pinned in pytest). The running-max gaps-and-islands "
        "form is the same interval algebra as user_active_coverage / "
        "merged_dup_intervals, riding ONE user_id exchange. Streaming "
        "form proven in pytest (stream==batch through the sentinel "
        "replay device): the same gap expression drives "
        "session_windowed_stream, keeping session state "
        "watermark-evictable with per-event horizons."
    ),
    tags=("session-window", "dynamic-gap", "event-time"),
)
def q_session_windows_dynamic(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    events = load_table(spark, sf_dir, "events")
    gap = F.when(
        F.col("event_type") == "purchase", F.lit("30 minutes")
    ).otherwise(F.lit("10 minutes"))
    return (
        events.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )
