"""Unit tests for the round-5 batch-#2 queries (queries_ext4.py) —
the registry oracle proves cross-engine equality; these pin the
SEMANTIC claims: the HDR sketch's one-sided bounded error, and the
retract-aggregate's Flink changelog semantics (cross-group moves,
groups retracting to zero, order independence)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_engagement_pipeline_spark.plans.registry import REGISTRY


def test_hdr_quantile_error_is_one_sided_and_bounded(spark, sf_dir):
    # est_w is the selected bucket's lower bound and the true discrete
    # quantile lies inside that bucket, so the estimate is never above
    # the truth and never more than one sub-bucket width (1/8) below.
    rows = REGISTRY["events_hdr_quantiles"].spark(spark, sf_dir).collect()
    assert {r["pct"] for r in rows} == {50, 90, 99}
    for r in rows:
        assert r["est_w"] <= r["exact_w"], r
        assert r["exact_w"] < r["est_w"] * (1 + 1 / 8) + 8, r
        assert -0.125 < r["rel_err"] <= 0.0, r


def _changelog(spark, rows):
    schema = T.StructType(
        [
            T.StructField("op", T.StringType(), False),
            T.StructField("ts_ms", T.LongType(), False),
            T.StructField(
                "before",
                T.StructType(
                    [
                        T.StructField("event_id", T.LongType(), True),
                        T.StructField("event_type", T.StringType(), True),
                        T.StructField("cents", T.LongType(), True),
                    ]
                ),
                True,
            ),
            T.StructField(
                "after",
                T.StructType(
                    [
                        T.StructField("event_id", T.LongType(), True),
                        T.StructField("event_type", T.StringType(), True),
                        T.StructField("cents", T.LongType(), True),
                    ]
                ),
                True,
            ),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_retract_aggregate_flink_semantics(spark):
    from flink_engagement_pipeline_spark.sources.cdc import retract_aggregate

    rows = [
        # key 1 created in group a, then MOVED to group b with +5
        ("c", 1, None, (1, "a", 10)),
        ("u", 2, (1, "a", 10), (1, "b", 15)),
        # key 2 lives and stays in group a
        ("c", 3, None, (2, "a", 7)),
        # key 3 created in group z then deleted -> z must VANISH
        ("c", 4, None, (3, "z", 100)),
        ("d", 5, (3, "z", 100), None),
        # key 4: in-place value update within group b
        ("c", 6, None, (4, "b", 1)),
        ("u", 7, (4, "b", 1), (4, "b", 2)),
    ]
    out = {
        r["event_type"]: (r["n_live"], r["total"])
        for r in retract_aggregate(
            _changelog(spark, rows), "event_type", "cents"
        ).collect()
    }
    assert out == {"a": (1, 7), "b": (2, 17)}

    # order independence: the same changelog reversed aggregates
    # identically (the property that makes it shuffle-safe)
    out_rev = {
        r["event_type"]: (r["n_live"], r["total"])
        for r in retract_aggregate(
            _changelog(spark, rows[::-1]), "event_type", "cents"
        ).collect()
    }
    assert out_rev == out


def test_full_envelope_round_trip(spark):
    from flink_engagement_pipeline_spark.sources import cdc

    row_schema = T.StructType(
        [
            T.StructField("event_id", T.LongType(), True),
            T.StructField("event_type", T.StringType(), True),
            T.StructField("cents", T.LongType(), True),
        ]
    )
    changes = _changelog(
        spark,
        [
            ("c", 1, None, (1, "a", 10)),
            ("u", 2, (1, "a", 10), (1, "b", 15)),
            ("d", 3, (1, "b", 15), None),
        ],
    ).select("op", "before", "after", "ts_ms")
    wire = cdc.to_full_cdc_envelope(changes)
    payloads = [r["value"] for r in wire.collect()]
    # creates omit `before`, deletes omit `after` — the Debezium shape
    assert '"before"' not in payloads[0] and '"after"' in payloads[0]
    assert '"before"' in payloads[1] and '"after"' in payloads[1]
    assert '"before"' in payloads[2] and '"after"' not in payloads[2]
    back = cdc.parse_full_cdc_envelope(wire, row_schema)
    got = sorted(
        (r["op"], r["ts_ms"], r["before"], r["after"]) for r in back.collect()
    )
    want = sorted(
        (r["op"], r["ts_ms"], r["before"], r["after"])
        for r in changes.collect()
    )
    assert got == want


def test_hdr_bucket_math_properties():
    # pure-python mirror of the SQL bucket formula: lower bound is the
    # bucket floor, widths bound relative error at 1/8, the bucket
    # index is monotone in the value, and (bucket -> lb) inverts.
    prev_bucket = -1
    for cents in range(1, 20000):
        w = cents * 8
        e = w.bit_length()
        m = w >> (e - 4)
        bucket = (e - 4) * 8 + m - 8
        lb = m << (e - 4)
        width = 1 << (e - 4)
        assert lb <= w < lb + width
        assert width * 8 <= lb  # width/lb <= 1/8 -> <=12.5% rel error
        assert lb == (8 + bucket % 8) << (bucket // 8)
        assert bucket >= prev_bucket
        prev_bucket = bucket


def test_audience_overlap_estimates_are_plausible(spark, sf_dir):
    # inclusion-exclusion amplifies each sketch's error; assert a
    # generous band so this pins "it is a real estimator", plus the
    # exact identity that must hold by construction.
    row = REGISTRY["audience_overlap"].spark(spark, sf_dir).collect()[0]
    assert row["exact_intersection"] == (
        row["exact_view"] + row["exact_purchase"] - row["exact_union"]
    )
    assert row["exact_union"] > 0
    assert abs(row["est_union"] / row["exact_union"] - 1) < 0.40
    slack = 0.40 * (row["exact_view"] + row["exact_purchase"])
    assert abs(row["est_intersection"] - row["exact_intersection"]) <= slack


def test_cep_semantics_on_crafted_sequences(spark, tmp_path):
    """CEP pattern semantics on hand-built histories: a clean
    view->click->purchase inside the window matches; an error between
    the bound view and the purchase kills it; exceeding the window
    kills it; wrong order (click before view) never binds."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    H = 3_600_000_000  # one hour in micros
    base = 1_700_000_000_000_000

    rows = [
        # user 1: clean match, latency 2h
        (1, 101, "view", base),
        (1, 102, "click", base + H),
        (1, 103, "purchase", base + 2 * H),
        # user 2: error between view and purchase -> no match
        (2, 201, "view", base),
        (2, 202, "error", base + H // 2),
        (2, 203, "click", base + H),
        (2, 204, "purchase", base + 2 * H),
        # user 3: window exceeded (view .. purchase > 48h) -> no match
        (3, 301, "view", base),
        (3, 302, "click", base + H),
        (3, 303, "purchase", base + 49 * H),
        # user 4: click precedes the only view -> chain never forms
        (4, 401, "click", base),
        (4, 402, "view", base + H),
        (4, 403, "purchase", base + 2 * H),
    ]
    table = pa.table(
        {
            "event_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array([r[3] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))

    from flink_engagement_pipeline_spark.plans.registry import REGISTRY

    out = {
        r["user_id"]: (r["n_conversions"], r["min_latency_us"])
        for r in REGISTRY["cep_conversion_within"]
        .spark(spark, str(tmp_path))
        .collect()
    }
    assert out == {1: (1, 2 * H)}


def test_hdr_sketch_counters_merge_by_addition(spark, sf_dir):
    """The 100 TB claim behind events_hdr_quantiles is that the
    histogram is MERGEABLE partial state: per-(group, bucket) counters
    from disjoint shards sum to the whole-corpus counters, so the
    sketch can be built map-side per partition / per day and merged
    without touching raw values again. Proven literally: bucket
    counters over two disjoint halves of events, added, equal the
    full-table counters bucket-for-bucket (and therefore every
    downstream quantile read-off is identical)."""
    from pyspark.sql import functions as F

    from flink_engagement_pipeline_spark.plans.queries_ext4 import _cents_null
    from flink_engagement_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())

    def counters(df):
        v = df.select(
            "event_type", (_cents_null(F.col("value")) * 8).alias("w")
        ).filter(F.col("w") >= 8)
        bb = (
            v.withColumn("e", F.length(F.bin("w")))
            .withColumn("m", F.expr("shiftright(w, e - 4)"))
            .withColumn("bucket", (F.col("e") - 4) * 8 + F.col("m") - 8)
        )
        return {
            (r["event_type"], r["bucket"]): r["cnt"]
            for r in bb.groupBy("event_type", "bucket")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }

    full = counters(ev)
    a = counters(ev.filter(F.col("event_id") % 2 == 0))
    b = counters(ev.filter(F.col("event_id") % 2 == 1))
    merged: dict = {}
    for part in (a, b):
        for key, cnt in part.items():
            merged[key] = merged.get(key, 0) + cnt
    assert merged == full and len(full) > 10


def test_mmr_rerank_matches_numpy_greedy_and_diversifies(spark, sf_dir):
    """Independent oracle for embedding_mmr_rerank: rerun the greedy
    MMR selection in pure numpy/Python from the raw parquet and demand
    the identical (rank, vec_id) sequence, then pin that the diversity
    term is load-bearing — the MMR order must differ from the pure
    relevance order on the fixture (if they coincided, the query would
    prove nothing beyond cosine_topk)."""
    import numpy as np

    from flink_engagement_pipeline_spark.llm import similarity as sim

    rows = REGISTRY["embedding_mmr_rerank"].spark(spark, sf_dir).collect()
    assert [r["mmr_rank"] for r in rows] == list(range(1, sim.MMR_K + 1))

    def dot(a, b):
        # sequential fold, matching the Spark/DuckDB accumulation order
        # exactly (np.dot's BLAS pairwise reordering can differ in the
        # last bits, which an exactness oracle must not tolerate)
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    import math

    pdf = spark.read.parquet(f"{sf_dir}/embeddings.parquet").toPandas()
    vecs = {
        int(r.vec_id): [float(x) for x in r.embedding]
        for r in pdf.itertuples()
    }
    q = vecs[0]
    qn = math.sqrt(dot(q, q))
    # relevance = cosine on RAW vectors (numerator fold / norm product),
    # mirroring the query's formula; pool vectors are normalized only
    # after selection, exactly as the Spark plan does
    rel = {
        i: dot(v, q) / (math.sqrt(dot(v, v)) * qn)
        for i, v in vecs.items()
        if i != 0
    }
    nv = {
        i: [x / math.sqrt(dot(v, v)) for x in v]
        for i, v in vecs.items()
        if i != 0
    }
    pool = sorted(rel, key=lambda i: (-rel[i], i))[: sim.MMR_POOL]
    selected: list[int] = []
    lam = sim.MMR_LAMBDA
    for _ in range(sim.MMR_K):
        remaining = [i for i in pool if i not in selected]
        scores = {
            i: lam * rel[i]
            - (1 - lam)
            * (max(dot(nv[i], nv[s]) for s in selected)
               if selected else 0.0)
            for i in remaining
        }
        selected.append(min(remaining, key=lambda i: (-scores[i], i)))
    assert [r["vec_id"] for r in rows] == selected

    rel_order = pool[: sim.MMR_K]
    assert selected != rel_order, (
        "diversity term did not change the ranking on this fixture"
    )

    # the selection stage must stay metadata-sized: the distributed
    # part ends at the pool top-k (TakeOrderedAndProject), never a
    # global sort or a driver collect of the corpus
    plan = (
        REGISTRY["embedding_mmr_rerank"]
        .spark(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_hll_register_merge_algebra(spark, sf_dir):
    """The property stream_sketch_replay rides: max-merging the
    register tables of two DISJOINT corpus halves reconstructs the
    whole-corpus register table exactly. Then, on two crafted users
    that collide into the SAME register with DIFFERENT rho (found by
    mirroring the md5 register math in Python — deterministic, not a
    fixture accident), prove the merge operator itself is
    load-bearing: merging the higher-rho user's batch genuinely
    raises the committed register, so cross-batch state matters."""
    import hashlib

    from flink_engagement_pipeline_spark.plans.queries_ext3 import (
        hll_registers,
    )
    from flink_engagement_pipeline_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    even = hll_registers(ev.filter(F.col("event_id") % 2 == 0))
    odd = hll_registers(ev.filter(F.col("event_id") % 2 == 1))
    whole = hll_registers(ev)

    def key(rows):
        return sorted((r["event_type"], r["reg"], r["m_rho"]) for r in rows)

    merged = (
        even.unionByName(odd)
        .groupBy("event_type", "reg")
        .agg(F.max("m_rho").alias("m_rho"))
    )
    assert key(merged.collect()) == key(whole.collect())

    # find a register collision with different rho by mirroring the
    # portable-HLL hash in Python
    def reg_rho(uid: int) -> tuple[int, int]:
        x = int(hashlib.md5(str(uid).encode()).hexdigest()[:12], 16)
        y = x // 64
        rho = 1
        while y % 2 == 0 and y > 0:
            rho += 1
            y //= 2
        return x % 64, rho

    by_reg: dict[int, tuple[int, int]] = {}
    pair = None
    for uid in range(10_000):
        r, rho = reg_rho(uid)
        if r in by_reg and by_reg[r][1] != rho:
            pair = (by_reg[r][0], uid) if by_reg[r][1] < rho else (
                uid, by_reg[r][0]
            )
            break
        by_reg.setdefault(r, (uid, rho))
    assert pair is not None
    lo_uid, hi_uid = pair

    def one_user(uid):
        return spark.range(1).select(
            F.lit("t").alias("event_type"), F.lit(uid).alias("user_id")
        )

    lo = key(hll_registers(one_user(lo_uid)).collect())
    both = key(
        hll_registers(one_user(lo_uid).union(one_user(hi_uid))).collect()
    )
    hi = key(hll_registers(one_user(hi_uid)).collect())
    assert lo != both and both == hi  # same register, max wins


def test_bpe_merges_match_pure_python_reference(spark, sf_dir):
    """Independent oracle for docs_bpe_merges: dict-and-loop BPE over
    the same corpus (collections.Counter word counts, greedy argmax
    by (count desc, pair asc), merge application via the SAME
    boundary-guarded str.replace device both engines use — see the
    bpe_merges semantics note on self-pair runs) must produce the
    identical merge list."""
    from collections import Counter

    import duckdb

    from flink_engagement_pipeline_spark.llm.text import BPE_MERGES

    rows = REGISTRY["docs_bpe_merges"].spark(spark, sf_dir).collect()
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"],
         r["pair_count"])
        for r in sorted(rows, key=lambda r: r["merge_rank"])
    ]

    texts = duckdb.sql(
        f"SELECT text FROM '{sf_dir}/documents.parquet'"
    ).fetchall()
    wc = Counter(w for (t,) in texts for w in t.split(" ") if w)
    seqs = {w: list(w) for w in wc}
    want = []
    for step in range(1, BPE_MERGES + 1):
        pc: Counter = Counter()
        for w, s in seqs.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += wc[w]
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((step, a, b, a + b, n))
        for w, s in seqs.items():
            joined = " " + " ".join(s) + " "
            seqs[w] = joined.replace(
                f" {a} {b} ", f" {a}{b} "
            ).split()
    assert got == want


def test_bpe_merges_safe_on_quoted_symbols(spark):
    """Regression (round-7 advisory): corpus symbols flow through
    F.lit literals, never spliced into SQL text — a corpus whose
    winning merge pairs contain apostrophes and backslashes must
    train cleanly and still match the pure-Python reference."""
    from collections import Counter

    from flink_engagement_pipeline_spark.llm.text import bpe_merges

    corpus = ["don't don't don't it's can't", "a\\b a\\b 'q' 'q'"]
    docs = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = [
        (r["merge_rank"], r["left_sym"], r["right_sym"], r["merged"],
         r["pair_count"])
        for r in sorted(
            bpe_merges(docs, k=4).collect(),
            key=lambda r: r["merge_rank"],
        )
    ]
    wc = Counter(w for t in corpus for w in t.split(" ") if w)
    seqs = {w: list(w) for w in wc}
    want = []
    for step in range(1, 5):
        pc: Counter = Counter()
        for w, s in seqs.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += wc[w]
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        want.append((step, a, b, a + b, n))
        for w, s in seqs.items():
            joined = " " + " ".join(s) + " "
            seqs[w] = joined.replace(f" {a} {b} ", f" {a}{b} ").split()
    # the winning pairs genuinely exercise the escaping path
    assert any("'" in a or "\\" in a for _, a, _b, _m, _n in want)
    assert got == want
