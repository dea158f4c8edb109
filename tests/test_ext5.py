"""Round-7 additions: BPE encode (trainer->apply loop), incremental
IVF index maintenance, exact-substring duplicate coverage, and the
stream-stream LEFT OUTER and FULL OUTER interval joins.

Each registered query is also swept against its DuckDB oracle by
tests/test_registry_oracle.py; the tests here pin the semantics the
oracle compare can't see (independent pure-Python recomputation,
rebuild-equivalence, planted duplicates, streaming null emission).
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from flink_engagement_pipeline_spark.plans.registry import REGISTRY


# ---------------------------------------------------------------------------
# BPE encode
# ---------------------------------------------------------------------------


def _py_bpe(texts: list[str], k: int):
    """Pure-Python reference: train k merges (greedy argmax by
    (count desc, pair asc), boundary-guarded str.replace application —
    the same semantics both engines implement), then encode every
    word and assign GPT-2-style ids (sorted chars 0..C-1, merges
    C+rank-1). Returns (merges, word->symbol-list, symbol->id)."""
    wc = Counter(w for t in texts for w in t.split(" ") if w)
    seqs = {w: list(w) for w in wc}
    merges = []
    for _step in range(1, k + 1):
        pc: Counter = Counter()
        for w, s in seqs.items():
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += wc[w]
        (a, b), _n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((a, b))
        for w, s in seqs.items():
            joined = " " + " ".join(s) + " "
            seqs[w] = joined.replace(f" {a} {b} ", f" {a}{b} ").split()
    chars = sorted({c for w in wc for c in w})
    ids = {c: i for i, c in enumerate(chars)}
    for r, (a, b) in enumerate(merges, start=1):
        ids[a + b] = len(chars) + r - 1
    return merges, seqs, ids


def test_bpe_encode_matches_pure_python_reference(spark, sf_dir):
    """docs_bpe_encode must equal training + greedy application +
    id mapping done entirely in Python over the same corpus."""
    import duckdb

    from flink_engagement_pipeline_spark.llm.text import BPE_MERGES

    texts = [
        t
        for (t,) in duckdb.sql(
            f"SELECT text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    doc_ids = [
        i
        for (i,) in duckdb.sql(
            f"SELECT doc_id FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    ]
    _merges, seqs, ids = _py_bpe(texts, BPE_MERGES)
    want = {}
    for doc_id, t in zip(doc_ids, texts):
        toks = [ids[sym] for w in t.split(" ") if w for sym in seqs[w]]
        if toks:
            want[doc_id] = (len(toks), " ".join(str(x) for x in toks))
    rows = REGISTRY["docs_bpe_encode"].spark(spark, sf_dir).collect()
    got = {r["doc_id"]: (r["n_tokens"], r["token_ids"]) for r in rows}
    assert got == want


def test_bpe_encode_concat_roundtrip(spark, sf_dir):
    """Decoding property: concatenating the symbols of every doc's
    token-id sequence must reproduce the doc's whitespace-normalized
    text (BPE merges never cross word boundaries, so decode ==
    concat within words, space-join across words)."""
    import duckdb

    from flink_engagement_pipeline_spark.llm.text import BPE_MERGES

    texts = {
        i: t
        for (i, t) in duckdb.sql(
            f"SELECT doc_id, text FROM '{sf_dir}/documents.parquet'"
        ).fetchall()
    }
    _m, seqs, ids = _py_bpe(list(texts.values()), BPE_MERGES)
    inv = {v: k for k, v in ids.items()}
    rows = REGISTRY["docs_bpe_encode"].spark(spark, sf_dir).collect()
    for r in rows[:50]:
        decoded = "".join(
            inv[int(x)] for x in r["token_ids"].split(" ")
        )
        want = "".join(w for w in texts[r["doc_id"]].split(" ") if w)
        assert decoded == want, r["doc_id"]


# ---------------------------------------------------------------------------
# IVF incremental ingest
# ---------------------------------------------------------------------------


def test_ivf_ingest_rebuild_equivalence(spark, sf_dir):
    """The pinned-quantizer contract: appending the ingested batch's
    assignments to the persisted corpus index must EQUAL rebuilding
    the full assignment table over corpus+batch with the same
    corpus-trained centroids — and the reported list sizes must match
    the rebuilt table's cluster histogram."""
    from flink_engagement_pipeline_spark.llm import similarity as ls
    from flink_engagement_pipeline_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    cut = int(
        emb.agg(F.expr("max(vec_id) * 4 div 5").alias("c")).first()["c"]
    )
    corpus = emb.filter(F.col("vec_id") < cut)
    cents = ls._centroids(corpus)

    ingested = {
        r["vec_id"]: (r["cluster"], r["list_size_after"])
        for r in REGISTRY["embedding_ivf_ingest"].spark(spark, sf_dir).collect()
    }
    # every ingested row is a batch row, and every batch row ingested
    assert ingested and all(v >= cut for v in ingested)

    rebuilt = {
        r["vec_id"]: r["cluster"]
        for r in ls.ivf_assignments(emb, cents).collect()
    }
    hist = Counter(rebuilt.values())
    for vec_id, (cl, size_after) in ingested.items():
        assert rebuilt[vec_id] == cl
        assert hist[cl] == size_after
    assert set(ingested) == {v for v in rebuilt if v >= cut}


# ---------------------------------------------------------------------------
# exact-substring duplicate coverage
# ---------------------------------------------------------------------------


def test_substring_dedup_planted_span(spark):
    """A shared substring of length L >= N must surface as ONE merged
    interval covering exactly L tokens in each document containing it
    (the maximal-anchor-run equivalence the query's doc claims), and
    a document with no shared >=N-gram must report zero coverage."""
    from flink_engagement_pipeline_spark.llm.dedup import (
        substring_dup_coverage,
    )
    from flink_engagement_pipeline_spark.plans.queries_ext5 import _SUB_N

    shared = " ".join(f"tok{i}" for i in range(_SUB_N + 5))  # L = N+5
    docs = [
        (0, f"alpha beta {shared} gamma delta"),
        (1, f"epsilon {shared} zeta eta theta iota"),
        (2, "unique words only here nothing repeats at all today"),
    ]
    frame = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in substring_dup_coverage(frame, _SUB_N).collect()
    }
    L = _SUB_N + 5
    for d in (0, 1):
        assert out[d]["n_dup_intervals"] == 1, out[d]
        assert out[d]["dup_tokens"] == L, out[d]
    assert out[2]["n_dup_intervals"] == 0
    assert out[2]["dup_tokens"] == 0
    assert out[2]["dup_ratio"] == 0.0


def test_substring_dedup_within_doc_repeat_and_merge(spark):
    """Within-doc repeats count (Lee et al. semantics), and
    overlapping anchor intervals from DIFFERENT shared substrings
    merge into maximal intervals."""
    from flink_engagement_pipeline_spark.llm.dedup import (
        substring_dup_coverage,
    )
    from flink_engagement_pipeline_spark.plans.queries_ext5 import _SUB_N

    span = " ".join(f"w{i}" for i in range(_SUB_N))  # exactly N tokens
    # doc 0 contains the N-token span twice -> two merged intervals
    # (separated by a unique token), each exactly N tokens
    docs = [(0, f"{span} breaker {span}")]
    frame = spark.createDataFrame(docs, "doc_id long, text string")
    (row,) = substring_dup_coverage(frame, _SUB_N).collect()
    assert row["n_dup_intervals"] == 2
    assert row["dup_tokens"] == 2 * _SUB_N


# ---------------------------------------------------------------------------
# stream-stream LEFT OUTER join
# ---------------------------------------------------------------------------


def test_stream_outer_join_emits_null_rows(spark, sf_dir):
    """The streaming left-outer replay must (a) emit one
    null-completed row per matchless click — the watermark-driven
    emission inner joins cannot produce — and (b) agree with the
    batch left interval join row-for-row."""
    from flink_engagement_pipeline_spark.sources.tables import load_table
    from flink_engagement_pipeline_spark.streaming.pipeline import (
        click_purchase_left_join,
    )

    got = REGISTRY["stream_outer_join_replay"].spark(spark, sf_dir).collect()
    nulls = [r for r in got if r["purchase_id"] == -1]
    assert nulls, "no null-completed rows — outer path not exercised"
    for r in nulls:
        assert r["purchase_ts"] is None and r["purchase_value"] is None

    ev = load_table(spark, sf_dir, "events")
    batch = click_purchase_left_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
    ).select(
        "user_id",
        "click_id",
        "click_ts",
        F.coalesce("purchase_id", F.lit(-1).cast("long")).alias(
            "purchase_id"
        ),
        "purchase_ts",
        "purchase_value",
    )
    key = lambda r: (  # noqa: E731
        r["user_id"],
        r["click_id"],
        str(r["click_ts"]),
        r["purchase_id"],
        str(r["purchase_ts"]),
        str(r["purchase_value"]),
    )
    assert sorted(map(key, got)) == sorted(map(key, batch.collect()))


def test_stream_full_outer_join_emits_both_null_sides(spark, sf_dir):
    """The full-outer replay must null-complete BOTH sides (purchases
    with no preceding click emit with click_id == -1 — the emission
    the left-outer form cannot produce) and agree with the batch full
    outer interval join row-for-row."""
    from flink_engagement_pipeline_spark.sources.tables import load_table
    from flink_engagement_pipeline_spark.streaming.pipeline import (
        click_purchase_left_join,
    )

    got = (
        REGISTRY["stream_full_outer_join_replay"].spark(spark, sf_dir).collect()
    )
    left_nulls = [r for r in got if r["purchase_id"] == -1]
    right_nulls = [r for r in got if r["click_id"] == -1]
    assert left_nulls, "no matchless clicks emitted"
    assert right_nulls, "no matchless purchases emitted"
    for r in right_nulls:
        assert r["click_ts"] is None and r["user_id"] is not None

    ev = load_table(spark, sf_dir, "events")
    batch = click_purchase_left_join(
        ev.filter(F.col("event_type") == "click"),
        ev.filter(F.col("event_type") == "purchase"),
        how="fullOuter",
    ).select(
        "user_id",
        F.coalesce("click_id", F.lit(-1).cast("long")).alias("click_id"),
        "click_ts",
        F.coalesce("purchase_id", F.lit(-1).cast("long")).alias(
            "purchase_id"
        ),
        "purchase_ts",
        "purchase_value",
    )
    key = lambda r: (  # noqa: E731
        r["user_id"],
        r["click_id"],
        str(r["click_ts"]),
        r["purchase_id"],
        str(r["purchase_ts"]),
        str(r["purchase_value"]),
    )
    assert sorted(map(key, got)) == sorted(map(key, batch.collect()))


def test_neardup_index_pandas_impl_matches_catalyst(spark):
    """The Arrow-batched numpy-matmul bucket projection (the
    documented scale path once the hyperplane geometry outgrows
    literal Catalyst expressions) must produce IDENTICAL (vec_id, t,
    bucket) rows to the oracle-pinned Catalyst fold — at the registry
    default (16x8) and at a probe geometry (4x14)."""
    from flink_engagement_pipeline_spark.llm import similarity as ls
    from flink_engagement_pipeline_spark.sources.datagen import (
        gen_embeddings,
    )

    emb = gen_embeddings(spark, 500)
    for tables, planes in ((16, 8), (4, 14)):
        cat = sorted(
            (r["vec_id"], r["t"], r["bucket"])
            for r in ls.neardup_index(emb, tables, planes).collect()
        )
        pan = sorted(
            (r["vec_id"], r["t"], r["bucket"])
            for r in ls.neardup_index(
                emb, tables, planes, impl="pandas"
            ).collect()
        )
        assert cat == pan, (tables, planes)
