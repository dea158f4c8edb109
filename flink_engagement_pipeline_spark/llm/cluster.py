"""Distributed k-means (Lloyd's) over the embeddings table.

The missing piece between the ANN paths (`similarity.py` buckets by
random hyperplanes; `ivf_topk` trains throwaway centroids) and a real
corpus pipeline: cluster assignments drive IVF index builds, corpus
diversity sampling, and per-cluster dedup sharding.

Scale shape (the only one that survives 100 TB):
- centroids are METADATA (k x dim doubles) — they live on the driver
  and enter every executor-side expression as plan literals, so each
  Lloyd iteration is one scan + one (cluster, dim)-keyed aggregation
  of k*dim rows. No mllib, no cached RDDs, no per-row Python.
- the assignment is a pure projection: dist(v, c_j) computed as
  dot(v,v) - 2*dot(v,c_j) + dot(c_j,c_j) with the same sequential
  fold `similarity._dot` uses (bit-identical to DuckDB's
  list_dot_product, so the whole algorithm carries a hash-matching
  SQL oracle — rare for an iterative algorithm).

Determinism contract (how an iterative float algorithm stays
oracle-exact across engines):
- init: the k lowest vec_ids, in vec_id order (no RNG);
- the mean is computed over integer-quantized members
  (floor(x*1e6 + 0.5) per element): integer sums are
  order-independent, so partial-agg order cannot perturb the result;
- the new centroid element is floor(S_double/n + 0.5)/1e6 where
  S_double mirrors SQL's CAST(S AS DOUBLE) — the driver uses
  float(s)/n (convert-then-divide) so even the double-rounding
  behavior matches the oracle bit-for-bit;
- empty clusters keep their previous centroid (both engines);
- ties in the argmin break to the lowest cluster id.

Quantizing the *centroid* at 1e-6 costs nothing at corpus scale
(embedding noise is orders of magnitude larger) and is what buys the
cross-engine bit-exactness.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.util import fan_out
from .similarity import _dot

_Q = 1_000_000.0


def _dot_py(a: list[float], b: list[float]) -> float:
    """Sequential left-fold dot — same op order as `_dot` / DuckDB."""
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def _quantized(v: Column) -> Column:
    """Element-wise floor(x*1e6 + 0.5) as BIGINT (exact, summable in
    any order)."""
    return F.transform(
        v, lambda x: F.floor(x * F.lit(_Q) + F.lit(0.5)).cast("long")
    )


def assign_clusters(
    emb: DataFrame,
    cents: list[list[float]],
    with_dist: bool = False,
    impl: str = "catalyst",
) -> DataFrame:
    """Nearest-centroid assignment as a pure projection (zero shuffle).

    `emb` must expose (vec_id, v: array<double>). Centroids enter as
    plan literals; k struct(dist, id) candidates per row, array_min
    picks (min dist, then min id) — the same total order the oracle's
    row_number() uses.

    Built as ONE parsed SQL string, not k x dim Column objects: the
    Column form cost ~2 s of py4j traffic PER PLAN BUILD (k=16
    centroids x 64 F.lit doubles + struct/fold trees — the measured
    round-9 fix for embedding_ivf_ingest's recurring build cost; same
    device as minhash_signature and the PQ argmin, BASELINE.md r5).
    `{x!r}D` literals parse to the identical IEEE doubles F.lit
    produces, so every hash-matching oracle is unaffected.

    ``impl``: "catalyst" (default) is the oracle-exact literal form
    every registered query pins, but it tops out in k — the SQL text
    grows as k x dim and the k-struct array_min is interpreted
    HOF-lambda work per row, so quantizers past a few hundred
    centroids crawl or exceed expression limits (the same ceiling
    neardup_index's literal form hits past ~128 planes). "pandas"
    computes the identical argmin as ONE Arrow-batched numpy matmul
    per batch ((rows x dim) @ (dim x k), the BLAS path) with the same
    tie rule (numpy argmin takes the FIRST minimum = lowest cluster
    id); numpy's sum order differs from the sequential fold, so
    assignments can differ only on measure-zero distance ties — fine
    for the scale path, while oracled queries stay on "catalyst"
    (same division of labor as neardup_index)."""
    if impl == "pandas":
        return _assign_clusters_pandas(emb, cents, with_dist)
    if impl != "catalyst":
        raise ValueError(f"unknown assign_clusters impl {impl!r}")
    vv = (
        "aggregate(zip_with(v, v, (x, y) -> x * y), 0.0D,"
        " (acc, x) -> acc + x)"
    )
    cands = []
    for j, c in enumerate(cents):
        arr = "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")"
        dot = (
            f"aggregate(zip_with(v, {arr}, (x, y) -> x * y), 0.0D,"
            " (acc, x) -> acc + x)"
        )
        cands.append(
            f"struct({vv} - 2.0D * {dot} + {float(_dot_py(c, c))!r}D AS d,"
            f" {j} AS c)"
        )
    best = f"array_min(array({','.join(cands)}))"
    out = ["vec_id", "v", f"({best}).c AS cluster"]
    if with_dist:
        out.append(f"({best}).d AS dist")
    return emb.selectExpr(*out)


def _assign_clusters_pandas(
    emb: DataFrame, cents: list[list[float]], with_dist: bool
) -> DataFrame:
    """The scale-path twin of the literal-SQL assignment (see
    assign_clusters ``impl``): one numpy matmul per Arrow batch,
    output schema identical (v rides through so update_centroids and
    the semantic-dedup screen compose unchanged)."""
    import numpy as np
    import pandas as pd

    C = np.array(cents, dtype=np.float64)  # (k, dim)
    cc = (C * C).sum(axis=1)  # (k,)
    # The (rows x k) distance intermediate is the memory hazard at
    # large k: a 10k-row Arrow batch against k=20k centroids is
    # 1.6 GB of doubles PER TASK (measured: 32 concurrent tasks
    # OOM-killed the probe's single-JVM host). Chunk rows so the
    # intermediate stays ~32 MB regardless of k.
    chunk = max(1, 4_000_000 // max(1, len(cents)))

    def _assign(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            M = np.array(pdf["v"].tolist(), dtype=np.float64)
            cls, dists = [], []
            for lo in range(0, len(M), chunk):
                Mc = M[lo : lo + chunk]
                # vv is constant per row: it never changes the
                # argmin, only the reported dist
                d = -2.0 * (Mc @ C.T) + cc  # (chunk, k)
                cl = d.argmin(axis=1)
                cls.append(cl)
                if with_dist:
                    dists.append(
                        (Mc * Mc).sum(axis=1)
                        + d[np.arange(len(cl)), cl]
                    )
            cl = np.concatenate(cls)
            out = {
                "vec_id": pdf["vec_id"],
                "v": pdf["v"],
                "cluster": cl.astype("int32"),
            }
            if with_dist:
                out["dist"] = np.concatenate(dists)
            yield pd.DataFrame(out)

    schema = "vec_id long, v array<double>, cluster int"
    if with_dist:
        schema += ", dist double"
    return emb.select("vec_id", "v").mapInPandas(_assign, schema)


def update_centroids(
    assigned: DataFrame, cents: list[list[float]], k: int
) -> list[list[float]]:
    """One Lloyd update: (cluster, dim)-keyed integer sums (one
    shuffle of k*dim rows — metadata-sized output), means finished on
    the driver. Empty clusters keep their previous centroid."""
    rows = (
        assigned.select(
            "cluster", F.posexplode(_quantized(F.col("v"))).alias("pos", "q")
        )
        .groupBy("cluster", "pos")
        .agg(F.sum("q").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    acc: dict[int, dict[int, tuple[int, int]]] = {}
    for r in rows:
        acc.setdefault(r["cluster"], {})[r["pos"]] = (r["s"], r["n"])
    out: list[list[float]] = []
    for j in range(k):
        if j in acc:
            dims = acc[j]
            # float(s)/n, NOT s/n: mirrors the oracle's
            # CAST(sum AS DOUBLE)/count double-rounding exactly.
            out.append(
                [
                    math.floor(float(s) / n + 0.5) / _Q
                    for _, (s, n) in sorted(dims.items())
                ]
            )
        else:
            out.append(cents[j])
    return out


# ---------------------------------------------------------------------------
# DuckDB oracle mirrors (kept beside the implementation so the two
# dialects cannot drift; consumed by plans/queries_ml.py and the IVF
# oracle in plans/queries_llm.py). All assume a CTE `e(vec_id, v)`
# with v = embedding cast to DOUBLE[].
# ---------------------------------------------------------------------------


def _km_dist(v: str, c: str) -> str:
    """Squared-L2 as vv - 2vc + cc — the exact fold `assign_clusters`
    computes, term for term."""
    return (
        f"list_dot_product({v}, {v}) - 2*list_dot_product({v}, {c})"
        f" + list_dot_product({c}, {c})"
    )


def km_assign_cte(out: str, cents: str, src: str = "e") -> str:
    """SQL CTE: nearest-centroid assignment of vectors CTE `src`
    against centroid CTE `cents` — mirrors assign_clusters (argmin by
    squared L2, ties to lowest cl)."""
    dist = _km_dist("e.v", "c.v")
    return f"""{out} AS (
  SELECT vec_id, v, cl FROM (
    SELECT e.vec_id AS vec_id, e.v AS v, c.cl AS cl,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {dist} ASC, c.cl ASC) AS rn
    FROM {src} e CROSS JOIN {cents} c) t
  WHERE rn = 1
)"""


def km_update_cte(out: str, assigned: str, prev: str, k: int, dim: int) -> str:
    """SQL CTE: integer-quantized Lloyd centroid update from
    assignment CTE `assigned`, falling back to `prev` for empty
    clusters — mirrors update_centroids (including the
    convert-then-divide double rounding)."""
    return f"""{out} AS (
  SELECT CAST(g.cl AS INT) AS cl, coalesce(u.v, p.v) AS v
  FROM range(0, {k}) g(cl)
  LEFT JOIN (
    SELECT cl, list(el ORDER BY pos) AS v FROM (
      SELECT a.cl AS cl, t.i AS pos,
             floor(CAST(sum(CAST(floor(a.v[t.i] * 1e6
                                       + CAST(0.5 AS DOUBLE)) AS BIGINT))
                        AS DOUBLE) / count(*)
                   + CAST(0.5 AS DOUBLE)) / 1e6 AS el
      FROM {assigned} a CROSS JOIN range(1, {dim + 1}) t(i)
      GROUP BY a.cl, t.i) s
    GROUP BY cl) u ON u.cl = g.cl
  LEFT JOIN {prev} p ON p.cl = g.cl
)"""


def train_kmeans(
    emb: DataFrame, k: int = 8, iters: int = 3, impl: str = "catalyst"
) -> list[list[float]]:
    """The centroid-training half of :func:`kmeans`, factored so
    compositions (semantic dedup, IVF variants) can reuse the trained
    quantizer: deterministic lowest-vec_id init, ``iters``
    integer-quantized Lloyd updates, centroids returned as driver
    metadata (k x dim — never corpus-sized). ``impl`` picks the
    assignment path (see assign_clusters): "pandas" for quantizers
    past the literal-SQL k ceiling.

    Memoized per semantic input (deterministic trainer — the same
    device as pq.train_codebooks and similarity._centroids), so
    recurring invocations (bench min-of-N, the gate's repeated query
    builds, every semantic_dedup call) pay the iters x (assign +
    k*dim aggregation) driver jobs once per corpus, not per call."""
    from .pq import _codebook_memo, _memo_freeze, _memo_key, _memo_put, _memo_thaw

    key = ("kmeans_cents", k, iters, impl, _memo_key(emb))
    if key in _codebook_memo:
        return _memo_thaw(_codebook_memo[key])
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = [
        [float(x) for x in r["v"]]
        for r in e.orderBy("vec_id").limit(k).collect()
    ]
    for _ in range(iters):
        cents = update_centroids(
            assign_clusters(e, cents, impl=impl), cents, k
        )
    _memo_put(key, _memo_freeze(cents))
    return cents


# The within-cluster screen is quadratic in cluster size by design
# (the SemDeDup contract); this bounds sum_c(n_c^2) so a mis-sized k
# fails loudly instead of silently scheduling a corpus-scale
# quasi-all-pairs join — the knn_graph guard pattern applied to the
# composed pipeline. The check costs one k-row aggregation (cluster
# sizes are metadata), nothing corpus-sized.
SEMDEDUP_MAX_CANDIDATE_PAIRS = 50_000_000


def semantic_dedup(
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.35,
    max_candidate_pairs: int = SEMDEDUP_MAX_CANDIDATE_PAIRS,
    impl: str = "catalyst",
) -> DataFrame:
    """Semantic (embedding-cluster) dedup — the SemDeDup shape
    (Abbas et al. 2023, arXiv:2303.09540): k-means the corpus, then
    screen for near-duplicate semantics WITHIN each cluster only, and
    drop every vector that has a lower-id duplicate at
    cosine >= ``threshold`` in its cluster (SemDeDup's keep-one
    policy; lowest id is the deterministic representative).

    Composition of proven pieces, so the whole policy hash-matches
    one SQL text: the trainer is the oracle-exact quantized Lloyd's
    (:func:`train_kmeans` — the embedding_kmeans CTEs), assignment is
    the zero-shuffle parsed-SQL projection, and the verify is the
    exact sequential-fold cosine. The within-cluster pair join is the
    deliberate SemDeDup trade: NEVER cross-cluster all-pairs — the
    equi-join key is the cluster id, so the candidate space is
    sum_c(n_c^2) instead of n^2, and k is the knob that bounds n_c
    (SemDeDup runs k ~ n/50k at web scale; a skewed giant cluster is
    the known failure mode and AQE skew-join or a k bump is the
    remedy). A guard makes the contract enforceable: the per-cluster
    sizes (k rows — metadata) are aggregated once and the call
    refuses when sum_c(n_c^2) exceeds ``max_candidate_pairs``, naming
    the oversized clusters — a default k pointed at a corpus-scale
    table fails loudly instead of silently scheduling a
    quasi-all-pairs join (the knn_graph guard pattern). Vector
    payloads ride the single cluster-keyed exchange; at 100 TB the
    width lever (carry float, widen in the cosine — the
    near_dup_pairs device) halves that shuffle if it binds.

    ``impl`` threads through trainer and assignment (see
    assign_clusters): growing k with the corpus eventually outgrows
    the literal-SQL centroid device, and "pandas" (one Arrow-batched
    numpy matmul per batch) is the documented scale path — the
    oracled registry query pins "catalyst".

    Returns (vec_id, cluster, is_kept) for EVERY corpus vector —
    the keep/drop decision a curation pipeline consumes."""
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents = train_kmeans(emb, k, iters, impl=impl)
    # r14: the assignment projection (k x dim argmin per row) is
    # referenced FOUR times downstream (pair-budget guard, both sides
    # of the quadratic screen, the final keep/drop join) — checkpoint
    # it once with the per-row norm already attached; the guard's
    # collect materializes it, so every later reference reads blocks
    # instead of re-running the scan + argmin. At real scale persist
    # the assignment table explicitly (the pagerank edge-table note).
    # r15: fan_out BEFORE the checkpoint — the quadratic screen is a
    # broadcast join whose PROBE side is this frame, so its task count
    # (and the whole interpreted-fold screen's parallelism) is this
    # frame's partition count, which inherited the fixture scan's ONE
    # split (guide §2.5/§2.6; measured: the screen ran as a single
    # task). No-op on real multi-split inputs.
    sided = fan_out(
        assign_clusters(e, cents, impl=impl).select(
            "vec_id",
            "cluster",
            "v",
            F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm"),
        )
    ).localCheckpoint(eager=False)
    sizes = {
        r["cluster"]: r["n"]
        for r in sided.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    est_pairs = sum(n * (n - 1) // 2 for n in sizes.values())
    if est_pairs > max_candidate_pairs:
        biggest = sorted(sizes.items(), key=lambda kv: -kv[1])[:3]
        raise ValueError(
            f"semantic_dedup with k={k} would screen ~{est_pairs} "
            f"within-cluster pairs (> max_candidate_pairs="
            f"{max_candidate_pairs}); largest clusters {biggest}. "
            f"Raise k so clusters shrink (SemDeDup's contract: k "
            f"grows with corpus size), or raise max_candidate_pairs "
            f"for a deliberate run"
        )
    # Each vector's norm is computed ONCE per row BEFORE the pair
    # join, so the quadratic stage pays one interpreted fold per pair
    # (the cross-dot), not three — HOF lambdas evaluate interpreted
    # per element, and measured at sf0.1 the 3-fold form cost ~3x
    # this one (~10 s -> ~3.5 s; same mmr_rerank lesson). Same float
    # ops, same order: dot/(na*nb) multiplies the identical sqrt
    # values the inline form computed per pair, so the result is
    # bit-identical and the oracle mirrors it term for term.
    a, b = sided.alias("a"), sided.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    dropped = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= threshold)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )
    # Keep/drop join: the dropped-id set scales with the corpus
    # duplicate count (SemDeDup at web scale drops tens of percent of
    # the corpus), so an unconditional broadcast hint is the exact
    # hazard _semi_prune already solves. Same device here: hint below
    # _BROADCAST_ID_LIMIT, planner-chosen (runtime bloom-filter /
    # shuffled) join above it. The size gate is FREE — distinct
    # dropped ids are bounded both by the candidate-pair count
    # (each drop needs >= 1 pair) and by the corpus cardinality, and
    # both bounds fall out of the `sizes` metadata already collected
    # for the pair-budget guard; no extra job runs.
    from .dedup import _BROADCAST_ID_LIMIT

    n_drop_upper = min(est_pairs, sum(sizes.values()))
    drop_side = (
        F.broadcast(dropped) if n_drop_upper <= _BROADCAST_ID_LIMIT else dropped
    )
    return (
        sided.select("vec_id", "cluster")
        .join(drop_side, "vec_id", "left")
        .select(
            "vec_id", "cluster", F.col("__dropped").isNull().alias("is_kept")
        )
    )


def semantic_dedup_oracle_sql(
    k: int = 8, iters: int = 3, threshold: float = 0.35, dim: int = 64
) -> str:
    """DuckDB twin of :func:`semantic_dedup`: the embedding_kmeans
    unrolled-Lloyd CTE chain (same generators), the within-cluster
    strict-order pair screen, and the keep/drop left join."""
    parts = [
        "WITH e AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cl, v
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k}) t
)""",
    ]
    for i in range(1, iters + 1):
        parts.append(km_assign_cte(f"a{i}", f"c{i - 1}"))
        parts.append(km_update_cte(f"c{i}", f"a{i}", f"c{i - 1}", k, dim))
    parts.append(km_assign_cte("asg", f"c{iters}"))
    parts.append(
        f"""drops AS (
  SELECT DISTINCT b.vec_id AS vec_id
  FROM asg a JOIN asg b ON a.cl = b.cl AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= {threshold}
)"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT a.vec_id AS vec_id, CAST(a.cl AS INT) AS cluster,
       d.vec_id IS NULL AS is_kept
FROM asg a LEFT JOIN drops d USING (vec_id)
"""
    )


def semantic_dedup_ingest(
    new_emb: DataFrame,
    corpus_index: DataFrame,
    corpus_emb: DataFrame,
    cents: list[list[float]],
    threshold: float = 0.35,
    max_candidate_pairs: int = SEMDEDUP_MAX_CANDIDATE_PAIRS,
    impl: str = "catalyst",
) -> DataFrame:
    """Incremental semantic-dedup ingest — the daily-batch shape for
    SemDeDup (r10 verdict ask #1: the one dedup family without an
    ingest path). A NEW batch of vectors is screened against the
    persisted per-cluster corpus state under the PINNED quantizer:

    - ``cents`` is the corpus-trained centroid list (train_kmeans —
      memoized, NEVER retrained at ingest: retraining would reshuffle
      every persisted assignment and is a rebuild, not an ingest —
      the ivf_ingest contract applied to the semantic quantizer);
    - ``corpus_index`` is the persisted (vec_id, cluster) assignment
      table (the ivf_assignments shape — narrow, two columns);
    - ``corpus_emb`` is the id-keyed corpus vector store, read ONLY
      for same-cluster verification (the
      text-for-verification-only contract of the MinHash ingest).

    The batch is assigned by pure projection against the pinned
    centroids, then screened WITHIN its clusters only: a batch vector
    is dropped iff some lower-id same-cluster vector (corpus or
    earlier-in-batch) has cosine >= ``threshold`` — exactly the
    SemDeDup lower-id-wins policy, which composes with the
    append-only id-space contract (ingest ids above corpus ids, the
    *_ingest split device) so ``b.vec_id < a.vec_id`` covers both
    corpus matches and in-batch ordering. Because the quantizer is
    pinned and corpus decisions cannot depend on higher-id batch rows,
    the ingest decision EQUALS the batch rows of a full
    ``semantic_dedup`` rebuild over corpus+batch under the same
    centroids — the rebuild-equivalence property pinned in pytest.

    Scale shape: candidate space is sum_c(nb_c^2/2 + nb_c*ncorp_c)
    over TOUCHED clusters only, never corpus^2 — the corpus side is
    pruned to the batch's cluster set with a LITERAL isin on the
    metadata-sized touched-cluster list (collected for the pair-budget
    guard anyway), so the predicate pushes into the persisted-index
    scan; corpus vectors ride one id-keyed join against that pruned
    index slice. The pair-budget guard extends to the ingest cross
    terms, and the keep/drop join carries the _BROADCAST_ID_LIMIT
    degrade. Returns (vec_id, cluster, is_kept) for every BATCH row."""
    # r14: the batch assignment is referenced several times downstream
    # (budget guard, screen side(s), keep/drop or union state) —
    # checkpoint once, materialized by the guard's collect (the
    # semantic_dedup device; batch-sized blocks). NO fan_out here,
    # unlike semantic_dedup's corpus-side screen: the ingest screen is
    # batch-sized, and the r15 interleaved bench measured the
    # repartition as pure overhead at that size (1.81 -> 2.33 s) —
    # while on a real multi-split daily batch the fan_out guard is a
    # no-op anyway, so the device could only ever fire where it hurts.
    b_asg = assign_clusters(
        new_emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        cents,
        impl=impl,
    ).localCheckpoint(eager=False)
    b_sizes = {
        r["cluster"]: r["n"]
        for r in b_asg.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    touched = sorted(b_sizes)
    c_sizes = {
        r["cluster"]: r["n"]
        for r in corpus_index.filter(F.col("cluster").isin(touched))
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    est_pairs = sum(
        nb * (nb - 1) // 2 + nb * c_sizes.get(cl, 0)
        for cl, nb in b_sizes.items()
    )
    if est_pairs > max_candidate_pairs:
        biggest = sorted(
            b_sizes.items(),
            key=lambda kv: -(kv[1] + c_sizes.get(kv[0], 0)),
        )[:3]
        raise ValueError(
            f"semantic_dedup_ingest would screen ~{est_pairs} "
            f"batch-vs-state pairs (> max_candidate_pairs="
            f"{max_candidate_pairs}); most-loaded batch clusters "
            f"{biggest}. Raise k at (re)build time so clusters "
            f"shrink, or raise max_candidate_pairs for a deliberate "
            f"run"
        )
    # corpus state pruned to touched clusters at the INDEX scan, then
    # vectors id-keyed through that slice; norms computed once per
    # side before the quadratic stage (the norm-once lesson)
    c_state = (
        corpus_index.filter(F.col("cluster").isin(touched))
        .join(
            corpus_emb.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("v"),
            ),
            "vec_id",
        )
        .select("vec_id", "cluster", "v")
    )
    sided_b = b_asg.select(
        "vec_id",
        "cluster",
        "v",
        F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm"),
    )
    state = (
        b_asg.select("vec_id", "cluster", "v")
        .unionByName(c_state)
        .select(
            "vec_id",
            "cluster",
            "v",
            F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm"),
        )
    )
    a, b = sided_b.alias("a"), state.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    dropped = (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("b.vec_id") < F.col("a.vec_id")),
        )
        .filter(cos >= threshold)
        .select(F.col("a.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )
    from .dedup import _BROADCAST_ID_LIMIT

    n_drop_upper = min(est_pairs, sum(b_sizes.values()))
    drop_side = (
        F.broadcast(dropped) if n_drop_upper <= _BROADCAST_ID_LIMIT else dropped
    )
    return (
        b_asg.select("vec_id", "cluster")
        .join(drop_side, "vec_id", "left")
        .select(
            "vec_id", "cluster", F.col("__dropped").isNull().alias("is_kept")
        )
    )


def semantic_dedup_ingest_oracle_sql(
    k: int = 8, iters: int = 3, threshold: float = 0.35, dim: int = 64
) -> str:
    """DuckDB twin of the registered ``embedding_semdedup_ingest``
    composition: corpus/batch split at (max id * 4) // 5, the
    quantized-Lloyd trainer unrolled on the CORPUS ONLY (pinned
    quantizer), batch assignment, and the batch-vs-(corpus ∪ batch)
    lower-id within-cluster screen."""
    parts = [
        "WITH e AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        "cutt AS (SELECT (max(vec_id) * 4) // 5 AS cut FROM e)",
        "corpus AS (SELECT vec_id, v FROM e, cutt WHERE vec_id < cut)",
        "batch AS (SELECT vec_id, v FROM e, cutt WHERE vec_id >= cut)",
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cl, v
  FROM (SELECT vec_id, v FROM corpus ORDER BY vec_id LIMIT {k}) t
)""",
    ]
    for i in range(1, iters + 1):
        parts.append(km_assign_cte(f"a{i}", f"c{i - 1}", "corpus"))
        parts.append(km_update_cte(f"c{i}", f"a{i}", f"c{i - 1}", k, dim))
    parts.append(km_assign_cte("acorp", f"c{iters}", "corpus"))
    parts.append(km_assign_cte("abatch", f"c{iters}", "batch"))
    parts.append(
        """allv AS (
  SELECT vec_id, v, cl FROM acorp
  UNION ALL
  SELECT vec_id, v, cl FROM abatch
)"""
    )
    parts.append(
        f"""drops AS (
  SELECT DISTINCT a.vec_id AS vec_id
  FROM abatch a JOIN allv b ON a.cl = b.cl AND b.vec_id < a.vec_id
  WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= {threshold}
)"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT a.vec_id AS vec_id, CAST(a.cl AS INT) AS cluster,
       d.vec_id IS NULL AS is_kept
FROM abatch a LEFT JOIN drops d USING (vec_id)
"""
    )


def _within_cluster_drops(members: DataFrame, threshold: float) -> DataFrame:
    """The SemDeDup screen over a (vec_id, cluster, v) frame: distinct
    ids that have a lower-id same-cluster neighbour at
    cosine >= threshold — norm-once form (the measured 3x win), the
    identical float ops and order as semantic_dedup's inline screen."""
    sided = members.select(
        "vec_id",
        "cluster",
        "v",
        F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm"),
    )
    a, b = sided.alias("a"), sided.alias("b")
    cos = _dot(F.col("a.v"), F.col("b.v")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )
    return (
        a.join(
            b,
            (F.col("a.cluster") == F.col("b.cluster"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .filter(cos >= threshold)
        .select(F.col("b.vec_id").alias("vec_id"))
        .distinct()
        .withColumn("__dropped", F.lit(1))
    )


def semantic_dedup_delete(
    emb: DataFrame,
    del_ids: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.35,
    max_candidate_pairs: int = SEMDEDUP_MAX_CANDIDATE_PAIRS,
    impl: str = "catalyst",
    prior: DataFrame | None = None,
    index: DataFrame | None = None,
) -> DataFrame:
    """Semantic-dedup TAKEDOWN — the delete cell of the family's
    lifecycle row (the ivf_index_delete contract on the semantic
    axis). Removes ``del_ids`` from the corpus and serves the
    keep/drop decision of the SHRUNKEN corpus under the PINNED
    quantizer (trained on the original corpus, never retrained at
    takedown — retraining reshuffles every persisted assignment and
    is a rebuild, not a delete), i.e. exactly
    rebuild-without-X under the same centroids.

    The semantically interesting part: deleting a KEPT representative
    can RESURRECT vectors whose only lower-id duplicate it was — so
    a takedown must re-screen, not just filter the persisted
    decisions. The bounded-work shape: only clusters CONTAINING a
    deleted id can change (the screen is within-cluster by
    construction), so prior decisions pass through untouched clusters
    unchanged and the re-screen runs over the touched clusters'
    remaining members only — takedown-sized work plus per-touched-
    cluster state reads, never a corpus re-screen. The touched set is
    metadata (a takedown-sized broadcast semi-join on the narrow
    assignment state, k-bounded collect), and pytest pins
    touched-only == full rebuild-without-X.

    ``prior`` is the persisted keep/drop decision table ((vec_id,
    cluster, is_kept)) and ``index`` the persisted assignment table
    ((vec_id, cluster)) — what a production takedown reads; when None
    (the registered query), both are rebuilt in-plan — the same
    serve-the-index-the-ingest-left device the other delete twins
    use, so the ORACLE is one SQL text, while the scaling probe
    passes the materialized tables to measure the takedown's own
    (touched-cluster-bounded) cost. The probe FOUND the hazard the
    ``index`` param fixes: without it, every driver job in here
    (touched collect, size guard, rescreen) recomputes the full
    corpus assignment — 3 x 60 s at 1M x k=20k, making the
    "bounded" takedown COST MORE than a rebuild (164 s vs 138 s
    measured). With the persisted index it is narrow-table reads +
    a ~100-cluster rescreen. Vectors are read id-keyed through the
    touched-cluster index slice only.

    Returns (vec_id, cluster, is_kept) for every REMAINING vector."""
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if index is None:
        cents = train_kmeans(emb, k, iters, impl=impl)  # pinned
        index = assign_clusters(e, cents, impl=impl).select(
            "vec_id", "cluster"
        )
    dset = del_ids.select("vec_id").distinct()
    touched = sorted(
        r["cluster"]
        for r in index.join(F.broadcast(dset), "vec_id", "leftsemi")
        .select("cluster")
        .distinct()
        .collect()
    )
    remaining = index.join(F.broadcast(dset), "vec_id", "left_anti")
    # untouched clusters: the persisted decisions are unchanged —
    # served here by the same plan that built them (the registered
    # delete queries rebuild the served state in-plan; in production
    # this side is one narrow read of the persisted decision table)
    if prior is None:
        prior = semantic_dedup(
            emb,
            k,
            iters,
            threshold,
            max_candidate_pairs=max_candidate_pairs,
            impl=impl,
        )
    untouched = prior.filter(~F.col("cluster").isin(touched))
    re_members = remaining.filter(F.col("cluster").isin(touched))
    sizes = {
        r["cluster"]: r["n"]
        for r in re_members.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    est_pairs = sum(n * (n - 1) // 2 for n in sizes.values())
    if est_pairs > max_candidate_pairs:
        biggest = sorted(sizes.items(), key=lambda kv: -kv[1])[:3]
        raise ValueError(
            f"semantic_dedup_delete would re-screen ~{est_pairs} "
            f"pairs in the touched clusters (> max_candidate_pairs="
            f"{max_candidate_pairs}); largest {biggest}"
        )
    from .dedup import _BROADCAST_ID_LIMIT, _semi_prune

    # vectors join the rescreen id-keyed through the narrow index
    # slice, SEMI-PRUNED to the touched members' id set first — the
    # 1M probe measured the unpruned form shuffling the entire
    # corpus vector table (~786 MB at 1M) for a ~5k-row rescreen:
    # the planner sizes the payload side before the index slice's
    # cardinality is known (the round-7 verify-join lesson, applied
    # to the takedown). The id-set bound is the size guard's own
    # metadata (sum of touched remaining members), so the gate is
    # free.
    re_vec = _semi_prune(
        e, re_members.select("vec_id"), "vec_id",
        n_ids=sum(sizes.values()),
    ).join(re_members, "vec_id").select("vec_id", "cluster", "v")
    dropped = _within_cluster_drops(re_vec, threshold)
    n_drop_upper = min(est_pairs, sum(sizes.values()))
    drop_side = (
        F.broadcast(dropped) if n_drop_upper <= _BROADCAST_ID_LIMIT else dropped
    )
    rescreened = (
        re_members.select("vec_id", "cluster")
        .join(drop_side, "vec_id", "left")
        .select(
            "vec_id", "cluster", F.col("__dropped").isNull().alias("is_kept")
        )
    )
    return untouched.unionByName(rescreened)


def streaming_semdedup_pairs(
    new_emb: DataFrame,
    corpus_index: DataFrame,
    corpus_emb: DataFrame,
    cents: list[list[float]],
    threshold: float = 0.35,
    max_candidate_pairs: int = SEMDEDUP_MAX_CANDIDATE_PAIRS,
    impl: str = "catalyst",
) -> DataFrame:
    """One micro-batch of STREAMING semantic-dedup maintenance,
    ARRIVAL-ORDER AGNOSTIC — the semantic instance of the relaxation
    `llm/similarity.py:streaming_neardup_ingest_pairs` makes for the
    LSH family: `semantic_dedup_ingest` keys its screen on
    ``other.vec_id < new.vec_id`` under the append-only-id batch
    contract, which silently loses the pair when a stream delivers a
    smaller id after a larger one. Here the cross screen against the
    persisted (vec_id, cluster) state accepts either id order (each
    same-cluster pair forms exactly once, in the batch whose member
    arrived LATER — the earlier member exists only on the state
    side), in-batch pairs come from a strict-order self-join, and
    output is normalized to (vec_a < vec_b, cosine). Accumulated over
    disjoint batches covering a corpus, the union of per-batch pair
    deltas equals the whole-corpus within-cluster screen under the
    same PINNED quantizer — the screen is exact (every same-cluster
    pair is a candidate; no LSH recall caveat), so the maintained
    decisions hash-match the semantic_dedup rebuild oracle.

    Same 100 TB shape as the batch ingest: state is pruned to the
    batch's touched-cluster set at the index scan (literal isin on
    guard metadata), corpus vectors read id-keyed through that slice
    for the verify only, pair budget guarded, batch-sized work plus
    per-touched-cluster state reads."""
    # r14: the batch assignment is referenced several times downstream
    # (budget guard, screen side(s), keep/drop or union state) —
    # checkpoint once, materialized by the guard's collect (the
    # semantic_dedup device; batch-sized blocks). Unlike the batch
    # ingest, NO fan_out here: a micro-batch is replay-sized (a
    # repartition would be pure per-batch shuffle overhead), and the
    # committed replay state must stay byte-identical to r14's.
    b_asg = assign_clusters(
        new_emb.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        ),
        cents,
        impl=impl,
    ).localCheckpoint(eager=False)
    b_sizes = {
        r["cluster"]: r["n"]
        for r in b_asg.groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    touched = sorted(b_sizes)
    c_sizes = {
        r["cluster"]: r["n"]
        for r in corpus_index.filter(F.col("cluster").isin(touched))
        .groupBy("cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    est_pairs = sum(
        nb * (nb - 1) // 2 + nb * c_sizes.get(cl, 0)
        for cl, nb in b_sizes.items()
    )
    if est_pairs > max_candidate_pairs:
        biggest = sorted(
            b_sizes.items(),
            key=lambda kv: -(kv[1] + c_sizes.get(kv[0], 0)),
        )[:3]
        raise ValueError(
            f"streaming_semdedup_pairs would screen ~{est_pairs} "
            f"batch-vs-state pairs (> max_candidate_pairs="
            f"{max_candidate_pairs}); most-loaded clusters {biggest}"
        )
    c_state = (
        corpus_index.filter(F.col("cluster").isin(touched))
        .join(
            corpus_emb.select(
                "vec_id",
                F.col("embedding").cast("array<double>").alias("v"),
            ),
            "vec_id",
        )
        .select("vec_id", "cluster", "v")
    )

    def _sided(df: DataFrame) -> DataFrame:
        return df.select(
            "vec_id",
            "cluster",
            "v",
            F.sqrt(_dot(F.col("v"), F.col("v"))).alias("nrm"),
        )

    sb, sc = _sided(b_asg), _sided(c_state)
    cos = _dot(F.col("a.v"), F.col("b.v")) / (
        F.col("a.nrm") * F.col("b.nrm")
    )

    def _verified(a: DataFrame, b: DataFrame, strict: bool) -> DataFrame:
        on = F.col("a.cluster") == F.col("b.cluster")
        on = (
            on & (F.col("a.vec_id") > F.col("b.vec_id"))
            if strict
            else on & (F.col("a.vec_id") != F.col("b.vec_id"))
        )
        return (
            a.alias("a")
            .join(b.alias("b"), on)
            .filter(cos >= threshold)
            .select(
                F.least(F.col("a.vec_id"), F.col("b.vec_id")).alias(
                    "vec_a"
                ),
                F.greatest(F.col("a.vec_id"), F.col("b.vec_id")).alias(
                    "vec_b"
                ),
                cos.alias("cosine"),
            )
        )

    return (
        _verified(sb, sc, strict=False)
        .unionByName(_verified(sb, sb, strict=True))
        .distinct()
    )


def semantic_dedup_delete_oracle_sql(
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.35,
    dim: int = 64,
    del_pred: str = "vec_id % 9 = 0",
) -> str:
    """DuckDB twin of :func:`semantic_dedup_delete` with the
    registered query's modulo takedown set: the quantizer CTEs train
    on the FULL original corpus (pinned through the takedown), the
    screen and output run on the remaining vectors only — literally
    rebuild-without-X under the same centroids."""
    parts = [
        "WITH e AS (SELECT vec_id, list_transform(embedding,"
        " x -> CAST(x AS DOUBLE)) AS v FROM embeddings)",
        f"""c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cl, v
  FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k}) t
)""",
    ]
    for i in range(1, iters + 1):
        parts.append(km_assign_cte(f"a{i}", f"c{i - 1}"))
        parts.append(km_update_cte(f"c{i}", f"a{i}", f"c{i - 1}", k, dim))
    parts.append(km_assign_cte("asg", f"c{iters}"))
    parts.append(
        f"rem AS (SELECT vec_id, v, cl FROM asg WHERE NOT ({del_pred}))"
    )
    parts.append(
        f"""drops AS (
  SELECT DISTINCT b.vec_id AS vec_id
  FROM rem a JOIN rem b ON a.cl = b.cl AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v)
          / (sqrt(list_dot_product(a.v, a.v))
             * sqrt(list_dot_product(b.v, b.v))) >= {threshold}
)"""
    )
    return (
        ",\n".join(parts)
        + """
SELECT a.vec_id AS vec_id, CAST(a.cl AS INT) AS cluster,
       d.vec_id IS NULL AS is_kept
FROM rem a LEFT JOIN drops d USING (vec_id)
"""
    )


def kmeans(emb: DataFrame, k: int = 8, iters: int = 3) -> DataFrame:
    """Full Lloyd's run; returns (vec_id, cluster, dist).

    `emb` is the raw embeddings frame (vec_id, embedding:
    array<float>). Triggers `iters` metadata-sized driver jobs (k*dim
    aggregated rows each) before returning the lazy assignment plan —
    the same driver-job budget the IVF index build pays.
    """
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    cents = train_kmeans(emb, k, iters)
    return assign_clusters(e, cents, with_dist=True).select(
        "vec_id", "cluster", "dist"
    )
