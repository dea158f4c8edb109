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
  guard). k=8 fits 10k rows; 100k needs k=128, which is where the
  literal-SQL centroid device gets slow/fragile — so 100k and 1M run
  impl="pandas" (one numpy matmul per Arrow batch), measuring the
  documented scale path. Training cost is iters x (assign + k*dim
  aggregation); the probe reports it separately from the screen.

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

for n in SIZES:
    docs = gen_documents(spark, n).cache()
    assert docs.count() == n
    media = lm.docs_as_media(docs)
    print(f"-- documents n={n:,} generated+cached --", flush=True)
    run(lm.media_phash(media), "phash_sigs", n)
    run(lm.media_phash_pairs(media), "phash_pairs", n)
    run(lm.media_video_neardup(media), "video_neardup", n)
    docs.unpersist()

for n in SIZES:
    emb = gen_embeddings(spark, n).cache()
    assert emb.count() == n
    print(f"-- embeddings n={n:,} generated+cached --", flush=True)
    # SemDeDup contract: k grows with n so within-cluster pairs stay
    # bounded (guard target ~50M). k=8 at 10k; k=128 at 100k; k=1280
    # at 1M. The literal-SQL device is measured where it fits (10k);
    # larger ks run the pandas matmul path — the documented scale
    # route (assign_clusters impl docstring).
    k = max(8, n // 800)
    impl = "catalyst" if k <= 8 else "pandas"
    t0 = time.perf_counter()
    cents = lc.train_kmeans(emb, k=k, iters=3, impl=impl)
    t_train = time.perf_counter() - t0
    print(
        f"n={n:>9,} {'semdedup_train':>16}: {t_train:7.2f}s  "
        f"(k={k}, impl={impl})",
        flush=True,
    )
    run(
        lambda: lc.semantic_dedup(emb, k=k, impl=impl),
        "semdedup_e2e",
        n,
    )
    emb.unpersist()

spark.stop()

# ---------------------------------------------------------------------------
# FINDINGS (quiet-host runs; summarized in BASELINE.md)
# ---------------------------------------------------------------------------
