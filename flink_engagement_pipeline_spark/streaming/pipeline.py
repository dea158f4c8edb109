"""Structured Streaming pipeline (SURVEY.md §2.9 T1-T6, §3.2).

Reproduces the reference's processing job shape (reference
src/process.py:117-210): keyed upsert source -> latest-per-key dedup ->
broadcast dimension lookup join -> derived metrics -> multi-sink
fan-out + windowed aggregation — as one micro-batch pipeline:

- source: file-source ``readStream`` over the events fixture with the
  declared schema (stand-in for upsert-Kafka, SURVEY §2 S2; a real
  deployment swaps ``format("parquet")`` for ``format("kafka")`` +
  ``from_json`` without touching anything downstream);
- time: event time + watermark (deliberate upgrade from the
  reference's PROCTIME, SURVEY §4.3.2);
- upsert semantics: per-micro-batch ``latest_per_key`` (reference's
  RowKind INSERT/UPDATE_AFTER filter, SURVEY §2 T4/F1). Cross-batch
  keyed state would use dropDuplicatesWithinWatermark; the fixture
  replay delivers each key's versions within one batch, and the batch
  oracle query (latest_per_key) checks the full-history semantics;
- enrichment: the *same* ``enrich_events`` function as the batch path
  (stream-static broadcast join re-evaluates the dim per micro-batch =
  the lookup join's FOR SYSTEM_TIME AS OF semantics at batch
  granularity);
- fan-out: ONE ``foreachBatch`` persisting the enriched batch and
  feeding every sink (T6) — one source scan per batch regardless of
  sink count, and all sinks see the same rows (the reference runs one
  Flink job with multiple sinks for the same reason);
- windowed aggregation: event-time window + watermark in append mode
  (A1/T2/T3) as a separate query over the same stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import latest_per_key
from ..operators.enrich import enrich_events
from ..schemas import EVENTS, EVENTS_RAW
from ..sources.tables import (
    _ensure_nanos_conf,
    events_ts_is_nanos,
    load_table,
    normalize_events,
)
from .sinks import Sink

DEFAULT_WATERMARK = "1 minute"


def with_proc_time(df: DataFrame) -> DataFrame:
    """Computed processing-time column (SURVEY §2 S4): the reference
    declares ``proc_time AS PROCTIME()`` on its Kafka source (reference
    src/process.py:132). In micro-batch Spark the equivalent is
    ``current_timestamp()`` evaluated per batch. Deliberately kept OUT
    of every oracle-checked query — processing time is irreproducible;
    the declared pipeline uses event time (SURVEY §4.3.2)."""
    return df.withColumn("proc_time", F.current_timestamp())


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of events parquet files in a directory,
    normalized to the logical schema (unit-detected ns->us ts, same
    contract as the batch loader). ``availableNow`` replay of the
    fixture = the reference's datagen loop, but deterministic
    (SURVEY §3.3). ``max_files_per_trigger`` bounds each micro-batch
    (and lets tests force multi-batch runs)."""
    _ensure_nanos_conf(spark)
    is_nanos = events_ts_is_nanos(events_dir)
    schema = EVENTS_RAW if is_nanos else EVENTS
    reader = spark.readStream.schema(schema).option("pathGlobFilter", "*.parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(events_dir)
    return normalize_events(stream) if is_nanos else stream


def enriched_stream(
    spark: SparkSession, events: DataFrame, sf_dir: str
) -> DataFrame:
    """Dedup + broadcast-enrich a (streaming) events frame; identical
    code path to the batch `enrich_events` query."""
    dim = load_table(spark, sf_dir, "customer")
    return enrich_events(latest_per_key(events), dim)


def run_enriched_fanout(
    spark: SparkSession,
    events_dir: str,
    sf_dir: str,
    sinks: dict[str, Sink],
    checkpoint_dir: str,
    cross_batch_dedup: bool = False,
    max_files_per_trigger: int | None = None,
) -> None:
    """Multi-sink fan-out (T6): one foreachBatch, N sinks.

    The batch is persisted so N sink writes cost one scan; unpersist
    in a finally so a failing sink can't leak executor memory.

    ``cross_batch_dedup`` turns on *stateful* key dedup
    (``dropDuplicates`` on the upsert key): a key replayed in a later
    micro-batch is suppressed — the reference's PRIMARY-KEY-upsert
    semantics across batches, not just within one. State grows with
    the key space; a production deployment with unbounded keys bounds
    it via ``dropDuplicatesWithinWatermark`` instead.
    """
    stream = read_events_stream(spark, events_dir, max_files_per_trigger)
    if cross_batch_dedup:
        stream = stream.dropDuplicates(["event_id"])
    dim = load_table(spark, sf_dir, "customer")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        enriched = enrich_events(latest_per_key(batch_df), dim).persist()
        try:
            for sink in sinks.values():
                sink.write_batch(enriched, batch_id)
        finally:
            enriched.unpersist()

    (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    for sink in sinks.values():
        sink.close()


def windowed_stream(
    events: DataFrame,
    watermark: str = DEFAULT_WATERMARK,
    size: str = "10 minutes",
    key: str = "user_id",
    slide: str | None = None,
) -> DataFrame:
    """Event-time window SUM with watermark (T1-T3); tumbling by
    default, sliding (HOP) when ``slide`` is given — the reference's
    10min/5s HOP parameters run as ``slide="5 seconds"``.

    Append mode emits a window only once the watermark passes its end
    — exactly-once window results, late rows beyond the watermark
    dropped (documented upgrade over the reference's proc-time HOP,
    whose results are irreproducible)."""
    win = F.window("ts", size, slide) if slide else F.window("ts", size)
    return _windowed(events, win, watermark, key)


def session_windowed_stream(
    events: DataFrame,
    watermark: str = DEFAULT_WATERMARK,
    gap: str = "5 minutes",
    key: str = "user_id",
) -> DataFrame:
    """Event-time SESSION window SUM: windows extend while events
    arrive within ``gap`` of the last one and close at the first gap —
    data-driven bounds, unlike fixed tumbling/HOP grids. In streaming,
    a session stays open (buffered in the state store) until the
    watermark passes its current end + gap; the watermark is what
    makes session state evictable at all — unbounded-key session
    tracking without it would grow forever. Batch/stream agnostic
    like the fixed-window form."""
    return _windowed(events, F.session_window("ts", gap), watermark, key)


def _windowed(
    events: DataFrame, win, watermark: str, key: str
) -> DataFrame:
    win_col = win.alias("window")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win_col, key)
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("engagement_sum"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            key,
            "engagement_sum",
        )
    )


def run_windowed(
    spark: SparkSession,
    events_dir: str,
    sink: Sink,
    checkpoint_dir: str,
    watermark: str = DEFAULT_WATERMARK,
    size: str = "10 minutes",
    slide: str | None = None,
    max_files_per_trigger: int | None = None,
) -> None:
    """Run the windowed aggregation in append mode into a sink."""
    agg = windowed_stream(
        read_events_stream(spark, events_dir, max_files_per_trigger),
        watermark,
        size=size,
        slide=slide,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink.write_batch(batch_df, batch_id)

    (
        agg.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    sink.close()


def click_purchase_join(
    clicks: DataFrame, purchases: DataFrame, watermark: str = DEFAULT_WATERMARK
) -> DataFrame:
    """Stream-stream event-time inner join (beyond the reference, which
    has only the stream-static lookup join J1): purchases within one
    hour after a click by the same user.

    Works identically on batch and streaming frames. In streaming both
    sides carry watermarks and the join condition bounds the time
    range, so Spark can expire buffered state: click-side rows are
    droppable once the watermark passes click_ts + 1h — without the
    range bound, stream-stream join state grows forever. That state
    bound IS the 100 TB design; the equi half (user_id) drives the
    shuffle partitioning exactly as in the batch interval join.
    """
    # withWatermark is a documented no-op on batch frames, so the same
    # code path serves the batch oracle and the stream
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    joined = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    )
    return joined.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def run_session_windowed(
    spark: SparkSession,
    events_dir: str,
    sink: Sink,
    checkpoint_dir: str,
    watermark: str = DEFAULT_WATERMARK,
    gap: str = "5 minutes",
    max_files_per_trigger: int | None = None,
) -> None:
    """Run the session-window aggregation in append mode into a sink.
    A session emits once the watermark passes its end (last event +
    gap) — until then it is buffered, mergeable state."""
    agg = session_windowed_stream(
        read_events_stream(spark, events_dir, max_files_per_trigger),
        watermark,
        gap=gap,
    )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink.write_batch(batch_df, batch_id)

    (
        agg.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    sink.close()


def click_purchase_left_join(
    clicks: DataFrame,
    purchases: DataFrame,
    watermark: str = DEFAULT_WATERMARK,
    how: str = "leftOuter",
) -> DataFrame:
    """Stream-stream event-time OUTER join — the null-emitting half
    of the interval-join family (Flink's interval join supports outer
    variants; :func:`click_purchase_join` covers inner only): every
    click row emits, paired with each purchase within one hour after
    it, or once with NULL purchase fields if none arrives. With
    ``how="fullOuter"`` the right side is null-completed symmetrically
    (a purchase no click preceded emits with NULL click fields).

    In streaming, an unmatched click is provably unmatched only when
    the watermark passes the end of its match window (click_ts + 1h),
    so outer null rows emit with that delay — and the emission is
    driven by the SAME watermark that expires buffered state, which
    is why the outer forms stay bounded-state at 100 TB exactly like
    the inner one (an unmatched purchase's window is [p_ts - 1h,
    p_ts], so its null row needs only the same horizon). Matched rows
    emit as matches arrive, unchanged.

    On batch frames this is the plain outer interval join (withWatermark
    is a no-op), so one code path serves the stream and the oracle.
    """
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    ).withWatermark("click_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    ).withWatermark("purchase_ts", watermark)
    joined = c.join(
        p,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") < F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        how,
    )
    return joined.select(
        F.coalesce(F.col("c_user"), F.col("p_user")).alias("user_id"),
        "click_id",
        "click_ts",
        "purchase_id",
        "purchase_ts",
        "purchase_value",
    )


def run_stream_stream_join(
    spark: SparkSession,
    events_dir: str,
    sink: Sink,
    checkpoint_dir: str,
    how: str = "inner",
    max_files_per_trigger: int | None = None,
) -> None:
    """Drive the stream-stream join over the file-source stream: the
    same source is filtered into two event-time streams and joined
    (``how``: "inner", "left_outer" or "full_outer"). The outer forms
    need ``max_files_per_trigger=1`` so the watermark-advancing
    sentinel and the drain files arrive as separate micro-batches."""
    ev = read_events_stream(spark, events_dir, max_files_per_trigger)
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    if how == "inner":
        out = click_purchase_join(clicks, purchases)
    else:
        out = click_purchase_left_join(
            clicks,
            purchases,
            how="fullOuter" if how == "full_outer" else "leftOuter",
        )

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink.write_batch(batch_df, batch_id)

    (
        out.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    sink.close()


def run_abandoned_clicks(
    spark: SparkSession,
    events_dir: str,
    sink: Sink,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drive the event-time-timer absence detector
    (streaming/stateful.py:abandoned_clicks) over the file-source
    stream into an exactly-once sink. ``max_files_per_trigger=1`` lets
    the replay stage the watermark-advancing sentinel and the drain
    files as separate micro-batches (timer firings lag the watermark
    update by one batch, like append-mode window eviction)."""
    from .stateful import abandoned_clicks

    ev = read_events_stream(spark, events_dir, max_files_per_trigger)
    out = abandoned_clicks(ev)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        sink.write_batch(batch_df, batch_id)

    (
        out.writeStream.foreachBatch(_process)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    sink.close()


def dedup_stream_bounded(
    stream: DataFrame, key: str = "event_id", watermark: str = "1 hour"
) -> DataFrame:
    """Cross-batch keyed dedup with BOUNDED state (T4 at 100 TB).

    Plain ``dropDuplicates`` keeps every key ever seen — state grows
    with the key space and a month of 100 TB/day events OOMs the state
    store. ``dropDuplicatesWithinWatermark`` keeps a key only until the
    event-time watermark passes its timestamp + delay: duplicates
    arriving within the watermark horizon are suppressed, state for
    older keys is evicted, and rows older than the watermark are
    dropped as late data (the same contract every watermarked operator
    has). The delay is the replay/out-of-orderness budget — an upsert
    source that can replay a key hours later needs that horizon here.

    tests/test_streaming.py::test_bounded_dedup_state_eviction pins the
    observable semantics: in-horizon duplicates suppressed across
    micro-batches, late replays beyond the horizon not re-emitted.
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark([key])
