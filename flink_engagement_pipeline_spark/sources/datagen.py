"""Synthetic workload generator (SURVEY.md §3.3, reference
src/datagen.py): the third entry point a reference user would need
when switching engines.

The reference drives load with a psycopg2 loop — one INSERT + commit
per row, 0.1–1.0 s sleep, ~1–10 events/s (src/datagen.py:49-68).
The Spark-native form generates the same value domains (src/datagen.py:
27-47, 55-59 and sql/init.sql CHECK constraints) as a *distributed
projection over spark.range*: every column is hash arithmetic on the
row id with a fixed per-column salt, so output is deterministic
(same n → bit-identical table, any partitioning, any retry), there is
no Python in the row path, and generation scales to any size the
cluster can write — the 100 TB fixture problem is exactly "generate
deterministic data in parallel without a coordinator".

``gen_events_stream`` swaps the base for the rate source: an
unbounded stream with identical column derivations keyed on the
generated ``value``, for soak tests at arbitrary events/s — the role
of the reference's sleep loop, minus its single-connection ceiling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CONTENT_TYPES = ("podcast", "newsletter", "video")
EVENT_TYPES = ("play", "pause", "finish", "click")
DEVICES = ("ios", "android", "web-safari", "web-chrome")


def _pick(id_col, salt: int, choices: tuple[str, ...]):
    """Deterministic uniform pick: salted hash modulo the choice list."""
    idx = F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(len(choices)))
    return F.element_at(F.array(*[F.lit(c) for c in choices]), (idx + 1).cast("int"))


def _uniform_long(id_col, salt: int, lo: int, hi: int):
    """Deterministic uniform long in [lo, hi] (inclusive)."""
    return F.pmod(F.xxhash64(id_col, F.lit(salt)), F.lit(hi - lo + 1)) + F.lit(lo)


def gen_content(spark: SparkSession, n: int = 50) -> DataFrame:
    """The dimension seed (reference src/datagen.py:27-47): n content
    rows with type in the CHECK domain and length_seconds in [60, 3600]."""
    base = spark.range(n).withColumnRenamed("id", "content_id")
    cid = F.col("content_id")
    return base.select(
        cid,
        F.concat(F.lit("content-"), cid.cast("string")).alias("title"),
        _pick(cid, 1, CONTENT_TYPES).alias("content_type"),
        _uniform_long(cid, 2, 60, 3600).alias("length_seconds"),
    )


def _event_columns(id_col, start_ts: str, events_per_second: int):
    """The shared deterministic column derivations (reference
    src/datagen.py:49-68 value domains)."""
    etype = _pick(id_col, 11, EVENT_TYPES)
    duration = F.when(
        etype.isin("play", "finish"), _uniform_long(id_col, 12, 1000, 300000)
    )  # NULL for pause/click, as in the reference
    payload = F.to_json(
        F.struct(
            F.concat(F.lit("m-"), F.pmod(F.xxhash64(id_col, F.lit(13)), F.lit(1000)).cast("string")).alias("metadata"),
            F.concat(
                F.lit("10."),
                F.pmod(F.xxhash64(id_col, F.lit(14)), F.lit(256)).cast("string"),
                F.lit("."),
                F.pmod(F.xxhash64(id_col, F.lit(15)), F.lit(256)).cast("string"),
                F.lit(".1"),
            ).alias("ip"),
        )
    )
    if not 1 <= events_per_second <= 1_000_000:
        # above 1e6/s the µs grid cannot separate events (a naive step
        # of 1_000_000 // rate would collapse ALL of them onto start_ts)
        raise ValueError(
            f"events_per_second must be in [1, 1_000_000], got {events_per_second}"
        )
    # Drift-free spacing: offset_us(id) = (id * 1e6) DIV rate, computed
    # as id*q + (id*r) DIV rate with (q, r) = divmod(1e6, rate) — pure
    # bigint arithmetic, so 7/s yields exactly 142857/142857/142858...µs
    # steps instead of a cumulative 1µs-per-7-events drift. The residual
    # DIV is done as (x - pmod(x, rate)) / rate: x is id*r < id*1e6, so
    # the float division of an exact multiple stays integral up to
    # id ~ 2^53/r; divisor rates (r == 0) skip it entirely.
    q, r = divmod(1_000_000, events_per_second)
    offset_us = (id_col * F.lit(q)).cast("long")
    if r:
        num = (id_col * F.lit(r)).cast("long")
        offset_us = offset_us + (
            (num - F.pmod(num, F.lit(events_per_second)))
            / F.lit(events_per_second)
        ).cast("long")
    ts = F.timestamp_micros(
        F.unix_micros(F.lit(start_ts).cast("timestamp")) + offset_us
    )
    return [
        id_col.cast("long").alias("event_id"),
        ts.alias("ts"),
        _uniform_long(id_col, 16, 0, 149).alias("user_id"),
        _uniform_long(id_col, 17, 0, 49).alias("content_id"),
        etype.alias("event_type"),
        duration.alias("duration_ms"),
        _pick(id_col, 18, DEVICES).alias("device"),
        payload.alias("raw_payload"),
    ]


def gen_events(
    spark: SparkSession,
    n: int,
    start_ts: str = "2024-01-01 00:00:00",
    events_per_second: int = 10,
    partitions: int | None = None,
) -> DataFrame:
    """n deterministic events, timestamps spaced at the given rate.

    ``spark.range`` splits the id space across the cluster; every
    derived column depends only on (id, fixed salt), so regeneration
    is idempotent — the property that lets a 100 TB synthetic corpus
    be rebuilt partition-by-partition after executor loss."""
    base = (
        spark.range(0, n, numPartitions=partitions)
        if partitions
        else spark.range(n)
    )
    return base.select(*_event_columns(F.col("id"), start_ts, events_per_second))


def gen_events_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
    start_ts: str = "2024-01-01 00:00:00",
) -> DataFrame:
    """Unbounded generator on the rate source — the reference's
    insert-loop role at arbitrary rates. ``value`` (the rate source's
    monotonically increasing long) keys the same derivations, so a
    replayed micro-batch regenerates identical rows (exactly-once
    downstream stays possible)."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return rate.select(*_event_columns(F.col("value"), start_ts, rows_per_second))


def gen_documents(
    spark: SparkSession,
    n: int,
    vocab: int = 5000,
    partitions: int | None = None,
) -> DataFrame:
    """n deterministic synthetic documents with PLANTED duplicates,
    for scale probes of the dedup/ANN family (the document-table
    counterpart of ``gen_events``: every column is hash arithmetic on
    the row id, so regeneration is idempotent at any partitioning).

    Duplicate classes (per 20 consecutive ids): id%20==19 is an EXACT
    copy of id-1's base text; id%20==9 is a NEAR duplicate of id-1
    (one word mutated at a hash-picked position). Everything else is
    an independent draw: 60-139 words uniform over a {vocab}-word
    surrogate vocabulary, so unplanted 3-gram collisions are
    negligible and the candidate stage's output is controlled by the
    planting rate (10% near + 5% exact), not noise. The text builds
    as ONE sequence/transform expression per row — no Python in the
    row path, ~L interpreted lambda evaluations per doc (O(1) body;
    generation is cached before any probe measures)."""
    base = (
        spark.range(0, n, numPartitions=partitions)
        if partitions
        else spark.range(n)
    )
    return base.selectExpr(
        "id AS doc_id",
        # base_id: the id whose word stream this doc copies
        "CASE WHEN id % 20 IN (9, 19) AND id > 0 THEN id - 1 ELSE id END"
        " AS _bid",
    ).selectExpr(
        "doc_id",
        "60 + pmod(xxhash64(_bid, 11), 80) AS _len",
        "_bid",
    ).selectExpr(
        "doc_id",
        # near-dup: mutate one hash-picked position; exact dup: none
        "CASE WHEN doc_id % 20 = 9 AND doc_id > 0"
        "     THEN 1 + pmod(xxhash64(doc_id, 13), _len) ELSE -1 END AS _mut",
        "_len",
        "_bid",
    ).selectExpr(
        "doc_id",
        f"""array_join(
              transform(sequence(1, cast(_len AS int)), i ->
                CASE WHEN i = _mut THEN concat('m', doc_id)
                     ELSE concat('w', pmod(xxhash64(_bid, i, 7), {vocab}))
                END),
              ' ') AS text""",
    )


def gen_embeddings(
    spark: SparkSession,
    n: int,
    dim: int = 64,
    partitions: int | None = None,
) -> DataFrame:
    """n deterministic synthetic embeddings with PLANTED near
    duplicates, for scale probes of the ANN/near-dup family
    (companion to ``gen_documents``; same idempotent hash-arithmetic
    contract).

    Per 20 consecutive ids: id%20==19 is an EXACT copy of id-1's
    vector (cosine 1.0); id%20==9 copies id-1 with one hash-picked
    dimension nudged by +0.05 (cosine ~0.999 — a near duplicate at
    any honest threshold). All other vectors are independent uniform
    [-1, 1) draws, whose pairwise cosines concentrate near 0 at
    dim=64, so candidate generation is dominated by planting, not
    noise. Schema matches the fixture: (vec_id, embedding
    array<float>)."""
    base = (
        spark.range(0, n, numPartitions=partitions)
        if partitions
        else spark.range(n)
    )
    return base.selectExpr(
        "id AS vec_id",
        "CASE WHEN id % 20 IN (9, 19) AND id > 0 THEN id - 1 ELSE id END"
        " AS _bid",
    ).selectExpr(
        "vec_id",
        "CASE WHEN vec_id % 20 = 9 AND vec_id > 0"
        f"     THEN pmod(xxhash64(vec_id, 29), {dim}) ELSE -1 END AS _mut",
        "_bid",
    ).selectExpr(
        "vec_id",
        f"""cast(transform(sequence(0, {dim - 1}), d ->
              (pmod(xxhash64(_bid, d, 23), 2000001) - 1000000) / 1e6
              + CASE WHEN d = _mut THEN 0.05D ELSE 0.0D END)
            AS array<float>) AS embedding""",
    )
