"""Scaling probe for the round-12 families: the persisted BM25 index
(build / serve-from-state / ingest-delta) and the manifest family's
grouped sample-index device, at 10k / 100k / 1M synthetic documents
(sources/datagen.py:gen_documents — planted-duplicate generator).

Questions this answers (asked the way the media/dedup/ANN probes
were):
- bm25 build (postings_of): one explode + one map-side-combinable
  (term, doc_id) aggregation — is wall-clock ~linear in docs and the
  exchange bounded by distinct (term, doc) cells?
- bm25 serve (bm25_serve over PERSISTED parquet state): the literal
  term-isin prunes the postings scan to the query terms — does serve
  time grow only with the matching-posting count (far sublinear in
  index size), and is the shuffle metadata-sized (two 1-row
  broadcasts + a per-doc pivot on the pruned slice)?
- bm25 ingest delta (postings_of on the 20% batch): batch-sized,
  never a corpus rescan.
- manifest numbering: grouped_global_row_number (range buckets within
  split + broadcast offsets) vs the old 3-partition-key Window — the
  r11 weak finding. The window form sorts the whole corpus through 3
  tasks; the grouped form spreads it across buckets. The probe times
  both on the same (doc_id, fp, split) frame.

Methodology identical to tools/media_scaling_probe.py: Spark UI REST
enabled, shuffle bytes attributed by diffing completed-stage totals
around each sequential run, generation cached and counted before
timing.

Findings are appended at the bottom after each quiet-host run and
summarized in BASELINE.md.
"""

import json
import os
import shutil
import sys
import tempfile
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from flink_engagement_pipeline_spark.llm import lexical as lx  # noqa: E402
from flink_engagement_pipeline_spark.operators.rank import (  # noqa: E402
    grouped_global_row_number,
)
from flink_engagement_pipeline_spark.session import get_spark  # noqa: E402
from flink_engagement_pipeline_spark.sources.datagen import (  # noqa: E402
    gen_documents,
)

TERMS = ("spark", "query", "stream", "join")

spark = get_spark(
    "bm25-scaling-probe",
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
    time.sleep(1.0)  # let the UI mark prior stages complete (the
    # first probe run attributed a big build's bytes to the NEXT row)
    r0, w0 = _stage_totals()
    t0 = time.perf_counter()
    df = df_or_fn() if callable(df_or_fn) else df_or_fn
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    time.sleep(1.0)
    r1, w1 = _stage_totals()
    print(
        f"n={n:>9,} {label:>18}: {dt:7.2f}s  "
        f"shuffleR {(r1 - r0) / 1e6:9.1f} MB  "
        f"shuffleW {(w1 - w0) / 1e6:9.1f} MB",
        flush=True,
    )
    return dt


SIZES = [int(x) for x in os.environ.get(
    "PROBE_SIZES", "10000,100000,1000000"
).split(",")]


def churn_stage() -> None:
    """Round-13 stage (PROBE_STAGE=churn): sustained delete/re-ingest
    cycles against the persisted postings sink — the monotonic-growth
    hazard the r12 verdict named. Each cycle tombstones 1/9 of the
    corpus (negated-tf postings) and re-ingests it; WITHOUT compaction
    the stored state grows by two slices per cycle forever, WITH the
    physical fold (lx.fold_postings through the sink's transform hook,
    policy-triggered at max_live_deltas=2) it stays pinned at the net
    base. Reports stored rows + serve seconds for both variants and
    asserts the folded state equals the base bit-for-bit (the churned
    docs all come back, so net == base)."""
    from flink_engagement_pipeline_spark.streaming.sinks import (
        IdempotentParquetSink,
    )

    n = int(os.environ.get("PROBE_CHURN_N", "100000"))
    cycles = int(os.environ.get("PROBE_CHURN_CYCLES", "6"))
    docs = gen_documents(spark, n).select("doc_id", "text").cache()
    assert docs.count() == n
    base = lx.postings_of(docs)
    stats = lx.stats_delta_of(docs)
    print(f"-- churn: n={n:,}, {cycles} delete/re-ingest cycles --",
          flush=True)
    for variant, compacting in (("no_compact", False), ("compact", True)):
        tmp = tempfile.mkdtemp(prefix=f"bm25_churn_{variant}_")
        sink = IdempotentParquetSink(os.path.join(tmp, "postings"))
        sink.write_batch(base, 0)
        bid = 1
        t_churn0 = time.perf_counter()
        for c in range(cycles):
            sl = docs.filter(F.col("doc_id") % 9 == c % 9)
            for delta in (
                lx.postings_of(sl).withColumn("tf", -F.col("tf")),
                lx.postings_of(sl),
            ):
                if compacting:
                    sink.maybe_compact(
                        spark, upto=bid, max_live_deltas=2,
                        transform=lx.fold_postings,
                    )
                sink.write_batch(delta, bid)
                bid += 1
        t_churn = time.perf_counter() - t_churn0
        state = sink.read_committed(spark)
        rows = state.count()
        run(
            lambda: lx.bm25_serve(state, stats, TERMS),
            f"serve_{variant}",
            n,
        )
        print(
            f"n={n:>9,} {variant:>18}: stored rows {rows:>12,}  "
            f"churn wall {t_churn:6.1f}s",
            flush=True,
        )
        if compacting:
            # every churned doc came back: net state == base
            final = sink.compact(spark, transform=lx.fold_postings)
            folded = spark.read.option(
                "pathGlobFilter", "*.parquet"
            ).parquet(final)
            n_base = base.count()
            n_folded = folded.count()
            assert n_folded == n_base, (n_folded, n_base)
            print(
                f"n={n:>9,} {'fold==base':>18}: {n_folded:,} rows "
                f"(asserted equal)",
                flush=True,
            )
        shutil.rmtree(tmp, ignore_errors=True)
    docs.unpersist()


if os.environ.get("PROBE_STAGE") == "churn":
    churn_stage()
    sys.exit(0)

for n in SIZES:
    docs = gen_documents(spark, n).select("doc_id", "text").cache()
    assert docs.count() == n
    print(f"-- documents n={n:,} generated+cached --", flush=True)

    # build: the one corpus-sized stage of the family
    run(lambda: lx.postings_of(docs), "bm25_build", n)

    # persist state, then time the SERVE path (production shape)
    state = tempfile.mkdtemp(prefix=f"bm25_probe_{n}_")
    lx.postings_of(docs).write.parquet(os.path.join(state, "postings"))
    lx.stats_delta_of(docs).write.parquet(os.path.join(state, "stats"))
    postings = spark.read.parquet(os.path.join(state, "postings"))
    stats = spark.read.parquet(os.path.join(state, "stats"))
    run(lambda: lx.bm25_serve(postings, stats, TERMS), "bm25_serve", n)

    # ingest delta: the 20% batch's postings (batch-sized by claim)
    cut = int(n * 4 // 5)
    batch = docs.filter(F.col("doc_id") >= cut)
    run(lambda: lx.postings_of(batch), "bm25_ingest_delta", n)
    shutil.rmtree(state, ignore_errors=True)

    # manifest numbering: grouped device vs the old 3-key window on
    # the same id frame (fp stands in for fp_md5; split is the same
    # salted 3-way case the manifest uses)
    h = F.substring(
        F.md5(F.concat(F.lit("split-v1:"), F.col("doc_id").cast("string"))),
        1,
        2,
    )
    ids = docs.select(
        "doc_id", F.md5("text").alias("fp")
    ).withColumn(
        "split",
        F.when(h < "cc", "train").when(h < "e6", "val").otherwise("test"),
    ).cache()
    assert ids.count() == n
    run(
        lambda: grouped_global_row_number(
            ids, "split", ["fp", "doc_id"], out="sample_idx"
        ),
        "manifest_idx_grouped",
        n,
    )
    w = Window.partitionBy("split").orderBy("fp", "doc_id")
    run(
        ids.withColumn("sample_idx", F.row_number().over(w)),
        "manifest_idx_window",
        n,
    )
    ids.unpersist()
    docs.unpersist()

# ---------------------------------------------------------------------------
# Findings (quiet-host runs; appended per round)
# ---------------------------------------------------------------------------
#
# Round 12 (two runs, drifty afternoon host — min per row per the
# min-of-N methodology; times in s, bytes from the stage-diff):
#
#   n         bm25_build  bm25_serve  ingest_delta  idx_grouped  idx_window
#   100k      9.93        0.58        6.82          1.79 / 4.2MB 0.26 / 3.8MB
#   1M        158.37      0.50        64.47         2.86 / 40MB  1.69 / 38MB
#
# - bm25_serve is FLAT in corpus size (0.58 -> 0.50 s from 100k to
#   1M): the term-isin prunes the persisted postings scan to the 4
#   query terms' rows, so serve cost tracks matching postings, not
#   index size — the inverted-index contract, measured.
# - bm25_build reports ZERO shuffle bytes on this generator, and
#   that is REAL, not a metrics bug: gen_documents descends from
#   spark.range, whose range partitioning clusters equal doc_ids in
#   one partition, so ClusteredDistribution(term, doc_id) is already
#   satisfied and Catalyst elides the aggregation Exchange entirely
#   (executedPlan shows 0 Exchange nodes). On the parquet fixtures
#   (unknown partitioning) the one corpus-sized exchange appears as
#   designed. Build wall-clock is tokenize+explode CPU —
#   embarrassingly parallel, no cliff.
# - manifest numbering: at 1M the WINDOW form ran THREE tasks (the
#   split cardinality — visible in the stage progress: (2+1)/3)
#   versus 32 for the grouped device; wall-clock is comparable
#   locally (1.69 vs 2.86 s — a 1M-row sort is cheap and the grouped
#   form pays ~1.2 s of metadata passes), but per-task sort volume
#   is n/3 for the window vs n/buckets for the device, which is the
#   100 TB difference the plan pin guards. Shuffle bytes equal
#   (38 vs 40 MB — the 2 MB delta is the __pid column + offsets).
