"""Scaling probe for the ANN / embedding near-dup family (round-7
ask #1, vectors half): wall-clock + per-stage shuffle bytes at 10k /
100k / 1M generated vectors, using the PRODUCTION functions
(llm/similarity.py) over the deterministic planted-near-dup corpus
(sources/datagen.py:gen_embeddings).

The hyperplane geometry is the documented scale knob: at the
registry's oracle-pinned (16 tables x 8 bits) the expected random
in-bucket collisions grow ~n^2/2^bits, so the probe raises bits with
log2(n) — (16,8) at 10k, (16,14) at 100k, (16,20) at 1M — holding
expected bucket occupancy roughly constant. That keeps the candidate
join linear-ish in n, which is the measurement that matters; the
planted pairs (1 near + 1 exact per 20 ids) give every run a known
recall target.

Stages (all thunks — builders that checkpoint run inside the timer;
each bucket-projection stage runs under BOTH impls, "catalyst" =
the oracle-pinned literal-SQL fold, "pandas" = the Arrow/numpy
matmul scale path — bit-identical buckets, tests/test_ext5.py):
  pairs-{impl}   near_dup_pairs at the scaled geometry (narrow index
                 self-join -> checkpointed candidates -> id-keyed
                 semi-pruned verify)
  index-{impl}   persisted neardup_index of the corpus 80% (cached)
  ingest-{impl}  incremental_neardup_ingest of the 20% batch
  ivf-train      corpus-only coarse centroids (strided seeds + one
                 quantized Lloyd step; memo cleared per scale)
  ivf-assign     full-corpus assignment projection (zero shuffle)
  ivf-ingest     batch assignment + appended list sizes

Shuffle bytes are exact per-run deltas of the UI stage totals; see
tools/dedup_scaling_probe.py for methodology notes. Findings recorded
in BASELINE.md "Round-7 ANN scaling curve".
"""

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_engagement_pipeline_spark.llm import similarity as ls
from flink_engagement_pipeline_spark.session import get_spark
from flink_engagement_pipeline_spark.sources.datagen import gen_embeddings

spark = get_spark(
    "ann-scaling-probe",
    extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4048"},
)
spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
    "overwrite"
).save()

_APP = None


def _stage_totals():
    global _APP
    base = "http://localhost:4048/api/v1"
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


def run(fn, label, n):
    r0, w0 = _stage_totals()
    t0 = time.perf_counter()
    df = fn() if callable(fn) else fn
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    r1, w1 = _stage_totals()
    print(
        f"n={n:>9,} {label:>13}: {dt:7.2f}s  "
        f"shuffleR {(r1 - r0) / 1e6:9.1f} MB  "
        f"shuffleW {(w1 - w0) / 1e6:9.1f} MB",
        flush=True,
    )
    return dt


def nprobe_stage() -> None:
    """Round-13 stage (PROBE_STAGE=nprobe; r12 verdict ask #7 —
    'measure, don't guess' applied to the one tunable the index-served
    hybrid exposes): the nprobe/recall/latency curve of the persisted
    IVF serve at PROBE_NPROBE_N vectors (default 1M). For each probe
    count, every query is served exactly as queries_ext9.
    ivf_topk_from_state does it — probed clusters prune the persisted
    codes scan, corpus vectors read id-keyed through the candidate
    set — and recall@10 is scored against the exact brute-force
    cosine baseline. Reports mean recall and min serve seconds over
    PROBE_NPROBE_Q queries (min per the host-interference
    methodology). Findings land in BASELINE.md."""
    import tempfile

    n = int(os.environ.get("PROBE_NPROBE_N", "1000000"))
    n_q = int(os.environ.get("PROBE_NPROBE_Q", "8"))
    k = 10
    emb = gen_embeddings(spark, n).cache()
    assert emb.count() == n
    e = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    t0 = time.perf_counter()
    cents = ls._centroids(emb)
    print(f"n={n:>9,} {'ivf-train':>13}: {time.perf_counter() - t0:7.2f}s",
          flush=True)
    state = tempfile.mkdtemp(prefix=f"ivf_nprobe_{n}_")
    ls.ivf_assignments(emb, cents).write.parquet(
        os.path.join(state, "codes")
    )
    codes = spark.read.parquet(os.path.join(state, "codes"))
    qvecs = {
        r["vec_id"]: [float(x) for x in r["v"]]
        for r in e.filter(F.col("vec_id") < n_q).collect()
    }
    from flink_engagement_pipeline_spark.llm.cluster import _dot_py
    from flink_engagement_pipeline_spark.llm.similarity import _dot

    # exact baseline ids per query (brute scan — the calibration cost)
    exact: dict[int, list[int]] = {}
    t0 = time.perf_counter()
    for qid, qv in qvecs.items():
        query = e.filter(F.col("vec_id") == qid).select(
            F.col("v").alias("q")
        )
        v, q = F.col("v"), F.col("q")
        cos = _dot(v, q) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(q, q)))
        exact[qid] = [
            r["vec_id"]
            for r in e.crossJoin(F.broadcast(query))
            .select("vec_id", cos.alias("cosine"))
            .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
            .limit(k)
            .collect()
        ]
    print(f"n={n:>9,} {'exact-base':>13}: {time.perf_counter() - t0:7.2f}s "
          f"({n_q} queries)", flush=True)
    for nprobe in (1, 2, 4, 8):
        hits, t_min = 0, float("inf")
        for qid, qv in qvecs.items():
            dists = sorted(
                (_dot_py(qv, qv) - 2 * _dot_py(qv, c) + _dot_py(c, c), i)
                for i, c in enumerate(cents)
            )
            probes = [i for _, i in dists[:nprobe]]
            t0 = time.perf_counter()
            cand_ids = codes.filter(F.col("cluster").isin(probes)).select(
                "vec_id"
            )
            cand = e.join(cand_ids, "vec_id", "leftsemi")
            query = e.filter(F.col("vec_id") == qid).select(
                F.col("v").alias("q")
            )
            v, q = F.col("v"), F.col("q")
            cos = _dot(v, q) / (F.sqrt(_dot(v, v)) * F.sqrt(_dot(q, q)))
            got = [
                r["vec_id"]
                for r in cand.crossJoin(F.broadcast(query))
                .select("vec_id", cos.alias("cosine"))
                .orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
                .limit(k)
                .collect()
            ]
            t_min = min(t_min, time.perf_counter() - t0)
            hits += len(set(got) & set(exact[qid]))
        print(
            f"n={n:>9,} nprobe={nprobe:>2}/{ls.IVF_LISTS}: "
            f"recall@{k} {hits / (k * n_q):6.3f}  "
            f"serve min {t_min:6.2f}s",
            flush=True,
        )
    emb.unpersist()


if os.environ.get("PROBE_STAGE") == "nprobe":
    nprobe_stage()
    sys.exit(0)

GEOM = {10_000: (16, 8), 100_000: (16, 14), 1_000_000: (16, 20)}

for n, (tables, planes) in GEOM.items():
    emb = gen_embeddings(spark, n).cache()
    assert emb.count() == n
    print(
        f"-- vectors n={n:,} generated+cached (geometry {tables}x{planes}) --",
        flush=True,
    )
    # both bucket-projection impls per scale: "catalyst" is the
    # oracle-pinned literal-SQL fold (interpreted HOF lambdas — the
    # projection cost grows with planes), "pandas" the Arrow/numpy
    # matmul scale path (bit-identical buckets, see
    # tests/test_ext5.py). The pair RESULT is impl-invariant; the
    # curve shows where the crossover lands.
    for impl in ("catalyst", "pandas"):
        holder = {}

        def mk_pairs(impl=impl, holder=holder):
            holder["df"] = ls.near_dup_pairs(emb, 0.9, tables, planes, impl)
            return holder["df"]

        run(mk_pairs, f"pairs-{impl}", n)
        if impl == "catalyst":
            # verify re-reads the checkpointed candidates — cheap
            n_pairs = holder["df"].count()
            # planted: 1 near + 1 exact per 20 ids -> n/10 true pairs
            print(
                f"n={n:>9,}   pairs found: {n_pairs} (planted {n // 10})",
                flush=True,
            )
    cut = n * 4 // 5
    corpus = emb.filter(F.col("vec_id") < cut)
    batch = emb.filter(F.col("vec_id") >= cut)
    idx = None
    for impl in ("catalyst", "pandas"):
        if idx is not None:
            idx.unpersist()
        idx = ls.neardup_index(corpus, tables, planes, impl).cache()
        t0 = time.perf_counter()
        idx.count()
        print(
            f"n={n:>9,} {'index-' + impl:>13}: "
            f"{time.perf_counter() - t0:7.2f}s",
            flush=True,
        )
    # ingest against the cached corpus index; impl drives only the
    # NEW batch's bucket projection
    for impl in ("catalyst", "pandas"):
        run(
            lambda impl=impl: ls.incremental_neardup_ingest(
                batch, idx, corpus, 0.9, tables, planes, impl
            ),
            f"ingest-{impl}",
            n,
        )
    idx.unpersist()
    # -- IVF family --------------------------------------------------
    t0 = time.perf_counter()
    cents = ls._centroids(corpus)
    print(
        f"n={n:>9,} {'ivf-train':>13}: {time.perf_counter() - t0:7.2f}s",
        flush=True,
    )
    run(lambda: ls.ivf_assignments(emb, cents), "ivf-assign", n)
    run(lambda: ls.ivf_ingest(emb), "ivf-ingest", n)
    emb.unpersist()
