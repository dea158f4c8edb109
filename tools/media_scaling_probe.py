"""Scaling probe for the round-10 media/semantic families: wall-clock
and per-stage shuffle bytes for the media pHash build, the
frame-level video near-dup, and semantic dedup at 10k / 100k / 1M
rows, using the PRODUCTION functions over the deterministic
planted-duplicate generators (sources/datagen.py:gen_documents /
gen_embeddings).

Questions this answers (asked the way the graph/dedup/ANN probes
were):
- media_phash: the hash stage's exchange is cell-sized (<= 60 rows x
  doc) by map-side partial agg — does wall-clock stay ~linear in
  docs, and does the pair join stay planting-bound?
- media_video_neardup: the frame fan-out multiplies shingle volume
  ~4.6x (sampled frames/doc) — same linearity question, plus whether
  the frame-level bucket join (collision keys now frames, not docs)
  stays bounded.
- semantic_dedup: the SemDeDup contract scales k WITH the corpus so
  within-cluster candidate pairs stay bounded (the pair-budget
  guard; SEM_CONF below has the per-size k). k=8 fits 10k rows on
  the literal-SQL centroid device; the larger ks run impl="pandas"
  (one numpy matmul per Arrow batch), measuring the documented scale
  path. Training cost is iters x (assign + k*dim aggregation); the
  probe reports it separately from the screen.

Methodology identical to tools/dedup_scaling_probe.py: Spark UI REST
enabled for this session, shuffle bytes attributed by diffing
completed-stage totals around each sequential run, generation cached
and counted before timing.

Findings are appended at the bottom after each quiet-host run and
summarized in BASELINE.md.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flink_engagement_pipeline_spark.llm import cluster as lc  # noqa: E402
from flink_engagement_pipeline_spark.llm import multimodal as lm  # noqa: E402
from flink_engagement_pipeline_spark.session import get_spark  # noqa: E402
from flink_engagement_pipeline_spark.sources.datagen import (  # noqa: E402
    gen_documents,
    gen_embeddings,
)

spark = get_spark(
    "media-scaling-probe",
    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
)
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
    "overwrite"
).save()

_APP = None


def _stage_totals():
    global _APP
    base = "http://localhost:4049/api/v1"
    if _APP is None:
        apps = json.load(urllib.request.urlopen(f"{base}/applications"))
        _APP = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{base}/applications/{_APP}/stages?status=complete"
        )
    )
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def run(df_or_fn, label, n):
    """Time construction + noop write (thunks so builders with eager
    jobs — the semdedup trainer, the guard aggregation — bill inside
    the timer)."""
    r0, w0 = _stage_totals()
    t0 = time.perf_counter()
    df = df_or_fn() if callable(df_or_fn) else df_or_fn
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    r1, w1 = _stage_totals()
    print(
        f"n={n:>9,} {label:>16}: {dt:7.2f}s  "
        f"shuffleR {(r1 - r0) / 1e6:9.1f} MB  "
        f"shuffleW {(w1 - w0) / 1e6:9.1f} MB",
        flush=True,
    )
    return dt


SIZES = [int(x) for x in os.environ.get(
    "PROBE_SIZES", "10000,100000,1000000"
).split(",")]

for n in SIZES if not os.environ.get("PROBE_SKIP_DOCS") else []:
    docs = gen_documents(spark, n).cache()
    assert docs.count() == n
    media = lm.docs_as_media(docs)
    print(f"-- documents n={n:,} generated+cached --", flush=True)
    run(lm.media_phash(media), "phash_sigs", n)
    run(lm.media_phash_pairs(media), "phash_pairs", n)
    run(lm.media_video_neardup(media), "video_neardup", n)
    docs.unpersist()

# SemDeDup contract: k grows with n so within-cluster pairs stay
# bounded (the guard's sum_c(n_c^2)/2 budget: k ~ n^2/1e8 keeps the
# screen at ~25-50M candidate pairs). k=8 fits 10k on the literal-SQL
# centroid device; larger ks run impl="pandas" (one numpy matmul per
# Arrow batch) — the documented scale path. At 1M the trainer's k*dim
# update aggregation collects 1.28M driver rows per iteration, so the
# probe trains ONE Lloyd step there (training cost is linear in
# iters; the scaling question is the screen). Training is reported
# separately from the e2e row (which re-trains via the memo: ~0).
SEM_CONF = {
    10_000: (8, 3, "catalyst"),
    100_000: (200, 3, "pandas"),
    1_000_000: (20_000, 1, "pandas"),
}

for n in SIZES:
    emb = gen_embeddings(spark, n).cache()
    assert emb.count() == n
    print(f"-- embeddings n={n:,} generated+cached --", flush=True)
    k, iters, impl = SEM_CONF.get(
        n, (max(8, n * n // 50_000_000), 3, "pandas")
    )
    t0 = time.perf_counter()
    cents = lc.train_kmeans(emb, k=k, iters=iters, impl=impl)
    t_train = time.perf_counter() - t0
    print(
        f"n={n:>9,} {'semdedup_train':>16}: {t_train:7.2f}s  "
        f"(k={k}, iters={iters}, impl={impl})",
        flush=True,
    )
    run(
        lambda: lc.semantic_dedup(emb, k=k, iters=iters, impl=impl),
        "semdedup_e2e",
        n,
    )
    # round-11 lifecycle stages. Ingest: the standard 80/20 split —
    # quantizer pinned on the corpus, batch screened against
    # state-pruned-to-touched-clusters; the scaling question is
    # whether ingest stays batch-bound (sum over touched clusters of
    # nb^2/2 + nb*ncorp), not corpus-bound. Delete: a REALISTIC
    # takedown (100 ids, not a modulo sweep) against a MATERIALIZED
    # prior decision table (the persisted-state read a production
    # takedown does) — the claim under test is that takedown cost is
    # touched-cluster-bounded, i.e. ~flat in n for a fixed-size
    # takedown.
    cut = n * 4 // 5
    corpus = emb.filter(F.col("vec_id") < cut)
    batch = emb.filter(F.col("vec_id") >= cut)
    t0 = time.perf_counter()
    cents_c = lc.train_kmeans(corpus, k=k, iters=iters, impl=impl)
    print(
        f"n={n:>9,} {'ingest_train':>16}: "
        f"{time.perf_counter() - t0:7.2f}s  (corpus-pinned)",
        flush=True,
    )
    corpus_index = lc.assign_clusters(
        corpus.selectExpr(
            "vec_id", "cast(embedding as array<double>) as v"
        ),
        cents_c,
        impl=impl,
    ).select("vec_id", "cluster").localCheckpoint()
    run(
        lambda: lc.semantic_dedup_ingest(
            batch, corpus_index, corpus, cents_c,
            max_candidate_pairs=500_000_000, impl=impl,
        ),
        "semdedup_ingest",
        n,
    )
    prior = lc.semantic_dedup(
        emb, k=k, iters=iters, impl=impl
    ).localCheckpoint()
    full_idx = lc.assign_clusters(
        emb.selectExpr("vec_id", "cast(embedding as array<double>) as v"),
        lc.train_kmeans(emb, k=k, iters=iters, impl=impl),
        impl=impl,
    ).select("vec_id", "cluster").localCheckpoint()
    del_ids = emb.filter(
        F.col("vec_id") % max(1, n // 100) == 0
    ).select("vec_id")
    run(
        lambda: lc.semantic_dedup_delete(
            emb, del_ids, k=k, iters=iters, impl=impl,
            prior=prior, index=full_idx,
        ),
        "semdedup_delete",
        n,
    )
    emb.unpersist()

spark.stop()

# ---------------------------------------------------------------------------
# FINDINGS (quiet-host runs; summarized in BASELINE.md)
# ---------------------------------------------------------------------------
# Quiet-host run, 2026-08-16 (load < 0.3; BASELINE.md round-10 section
# has the analysis):
#
# -- documents --
# n=   10,000  phash_sigs  4.17s | phash_pairs  7.93s | video 13.85s (shuffle 215 MB)
# n=  100,000  phash_sigs  8.92s | phash_pairs  6.39s | video 80.18s (shuffle 2.12 GB)
# n=1,000,000  phash_sigs 81.63s | phash_pairs 45.79s | video 711.55s (shuffle 22.1 GB)
#   -> both media families ~linear in docs; video shuffle is
#      hash-build-bound (<= 60 cells/frame), collision term submerged
#      at a fixed 12-bit prefix up to ~5M frames (grow prefix with
#      log2(frames) past that).
#
# -- embeddings (SemDeDup; k per SEM_CONF) --
# n=   10,000  k=12(first run)  train  9.19s | e2e   4.46s (~4.2M pairs)
# n=  100,000  k=125(first run) train  6.40s | e2e  63.07s (~40M pairs)
# n=1,000,000  k=20,000 iters=1 train 73.86s | e2e 105.72s (~25M pairs, 748 MB shuffle)
#   -> screen is pair-budget-bound (wall tracks pairs, not n): size k
#      so the budget stays flat — the SemDeDup contract, enforced by
#      the guard, which the first 1M attempt (old k=1250 formula,
#      ~422M pairs) crashed into exactly as designed. The k=20k
#      assignment also exposed the (rows x k) matmul-intermediate OOM
#      fixed by row-chunking in _assign_clusters_pandas.
#
# Round-11 quiet-host run (PROBE_SKIP_DOCS=1; semantic lifecycle
# stages; BASELINE.md round-11 section has the analysis):
#
# -- embeddings (SemDeDup ingest/delete; k per SEM_CONF; 80/20 split;
#    delete = 100 ids against MATERIALIZED prior+index state) --
# n=   10,000  ingest  2.50s (0.1 MB shuf) | delete  9.30s (k=8: ALL clusters touched -> rescreen == e2e, expected at fixture k)
# n=  100,000  ingest  8.95s (0.9 MB shuf) | delete  9.64s (~100 of 200 clusters touched)
# n=1,000,000  ingest 60.27s (794 MB shuf) | delete  5.55s (5.5 MB shuf; <=100 of 20k clusters touched)
#   -> ingest is batch-bound (60s for a 200k batch vs 138s whole-corpus
#      e2e this run); its 794 MB shuffle is the honest same-cluster
#      corpus-vector read for a 20% batch that touches ALL clusters —
#      a real daily batch touches |batch| clusters of 20k and the
#      touched-cluster isin prunes the state scan proportionally.
#   -> delete: the probe FOUND two scale bugs fixed this round:
#      (a) without a persisted-index param every driver job recomputed
#          the full 1M x 20k assignment (3 x ~60s: 164.5s total — MORE
#          than a rebuild); fixed by the `index` param (production
#          reads the persisted assignment table) -> 5.48s;
#      (b) the rescreen's vector join shuffled the ENTIRE corpus
#          vector table (785.6 MB for a ~5k-row rescreen — the
#          round-7 verify-join hazard); fixed by _semi_prune on the
#          touched-member id set (bound = the size guard's own
#          metadata) -> 5.5 MB.
#      Final: a fixed-size takedown is ~flat in n (9.3s/9.6s/5.6s at
#      10k/100k/1M) once k scales with the corpus.
