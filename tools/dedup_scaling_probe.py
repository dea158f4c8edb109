"""Scaling probe for the dedup flagship path (round-7 ask #1):
wall-clock AND per-stage shuffle bytes for candidates / verify /
closure at 10k / 100k / 1M generated documents, using the PRODUCTION
functions (llm/dedup.py) over the deterministic planted-duplicate
corpus (sources/datagen.py:gen_documents — 10% near-dup + 5% exact-dup
planting, negligible background collisions).

Methodology: the Spark UI REST API is enabled for this session only;
each measured pipeline is a noop-format write, and shuffle read/write
bytes are attributed by diffing the completed-stage totals around the
run (runs are sequential, so the delta is exact). Corpus generation is
cached and counted before anything is timed. Stage attribution within
the composed pipeline comes from measuring cumulative prefixes:
candidates (band index -> in-bucket pairs), pairs (= candidates +
exact verify), e2e (= pairs + connected-component closure +
survivors); the ingest family is measured as index build (persisted
bands) vs ingest join (batch-vs-index, corpus text untouched).

Findings are recorded at the bottom after each quiet-host run, and
summarized in BASELINE.md.
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_engagement_pipeline_spark.llm import dedup as ld
from flink_engagement_pipeline_spark.session import get_spark
from flink_engagement_pipeline_spark.sources.datagen import gen_documents

spark = get_spark(
    "dedup-scaling-probe",
    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4049"},
)
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
    "overwrite"
).save()

_APP = None


def _stage_totals():
    """Sum shuffle read/write bytes over all completed stages."""
    global _APP
    base = "http://localhost:4049/api/v1"
    if _APP is None:
        apps = json.load(urllib.request.urlopen(f"{base}/applications"))
        _APP = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{base}/applications/{_APP}/stages?status=complete")
    )
    return (
        sum(s.get("shuffleReadBytes", 0) for s in stages),
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
    )


def run(df_or_fn, label, n):
    """Time a pipeline end-to-end: CONSTRUCTION + noop write. Pass a
    thunk for pipelines whose builders run eager jobs (the
    checkpoint-materialized candidate set, connected components) so
    that cost lands inside the timer, not silently before it."""
    r0, w0 = _stage_totals()
    t0 = time.perf_counter()
    df = df_or_fn() if callable(df_or_fn) else df_or_fn
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    r1, w1 = _stage_totals()
    print(
        f"n={n:>9,} {label:>12}: {dt:7.2f}s  "
        f"shuffleR {(r1 - r0) / 1e6:9.1f} MB  "
        f"shuffleW {(w1 - w0) / 1e6:9.1f} MB",
        flush=True,
    )
    return dt


def candidates_only(docs, n=3):
    """The candidate stage exactly as portable_minhash_pairs builds it
    (band index -> in-bucket sorted-list pair generation), cut before
    the exact verify."""
    base = ld.portable_base(docs, n)
    bands = ld.portable_band_index(base)
    ids = F.array_sort(F.collect_list("doc_id"))
    pair_list = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    return (
        bands.groupBy("band_idx", "key")
        .agg(ids.alias("ids"))
        .filter(F.size("ids") >= 2)
        .select(F.explode(pair_list).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


for n in (10_000, 100_000, 1_000_000):
    docs = gen_documents(spark, n).cache()
    n_docs = docs.count()
    assert n_docs == n
    cand = candidates_only(docs)
    print(f"-- corpus n={n:,} generated+cached --", flush=True)
    run(cand, "candidates", n)
    # thunk: the builder checkpoints the candidate set eagerly, so
    # construction belongs inside the timer — this row is the TRUE
    # end-to-end candidates+verify cost
    run(lambda: ld.portable_minhash_pairs(docs), "pairs", n)
    pairs = ld.portable_minhash_pairs(docs)
    # closure stage measured from CACHED pairs so the iterative CC
    # cost (which runs EAGERLY during plan construction — count +
    # localCheckpoint per iteration) attributes to this stage alone;
    # the e2e composition = pairs + closure by construction
    # (llm/dedup.py:dedup_e2e_portable)
    pairs_c = pairs.select("doc_a", "doc_b").cache()
    n_pairs = pairs_c.count()
    r0, w0 = _stage_totals()
    t0 = time.perf_counter()
    cc = ld.connected_components(pairs_c, docs.select("doc_id"))
    cc.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    r1, w1 = _stage_totals()
    print(
        f"n={n:>9,} {'closure':>12}: {dt:7.2f}s  "
        f"shuffleR {(r1 - r0) / 1e6:9.1f} MB  "
        f"shuffleW {(w1 - w0) / 1e6:9.1f} MB",
        flush=True,
    )
    # sanity: planted classes recovered (pair count scales with n/20;
    # exact copies verify at jaccard 1.0)
    print(f"n={n:>9,}   pairs found: {n_pairs}", flush=True)
    pairs_c.unpersist()
    # -- ingest family: persisted index vs daily batch ----------------
    cut = n * 4 // 5
    corpus = docs.filter(F.col("doc_id") < cut)
    new = docs.filter(F.col("doc_id") >= cut)
    bands = ld.minhash_bands(corpus).cache()
    t0 = time.perf_counter()
    bands.count()
    print(
        f"n={n:>9,} {'index build':>12}: {time.perf_counter() - t0:7.2f}s",
        flush=True,
    )
    run(lambda: ld.incremental_minhash_dedup(new, bands, corpus), "ingest", n)
    bands.unpersist()
    docs.unpersist()

# Findings (2026-08-15, local[32], quiet host, single pass per point;
# shuffle MB are exact per-run deltas from the stage totals):
# -- see BASELINE.md "Dedup scaling curve (round 7)" for the recorded
#    numbers and the analysis.
