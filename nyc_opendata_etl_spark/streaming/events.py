"""Structured Streaming over the ``events`` table.

The reference's unit of work is a windowed batch append (SURVEY §1.4):
``[start, end)`` on a timestamp, with a monthly backfill loop
(``load_history.py:4-17``). Structured Streaming is the Spark-native
generalization: the same dataflow declared once runs incrementally
(micro-batch), as a backfill (``Trigger.AvailableNow`` ≙ the reference's
history loop), or continuously — with watermarks making late-data
semantics explicit where the reference had none.

Scale notes: event-time windowed aggregation shuffles on (window, key)
with partial aggregation per micro-batch; state store size is bounded by
the watermark horizon. At 100 TB/day the same topology holds — state is
per-window-per-key, not per-event.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source event stream (parquet directory). In production this
    would be Kafka/Kinesis; the transformations below are source-agnostic."""
    reader = spark.readStream.schema(EVENT_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(path)


def tumbling_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling event-time window: count + sum(value) per (window,
    event_type), tolerating ``watermark`` of event-time lateness."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_rates(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding window counts per event_type (rate monitoring)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity. Uses the native session_window state operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("first_event"),
            F.max("ts").alias("last_event"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "first_event",
            "last_event",
        )
    )


def watermarked_dedup(
    events: DataFrame, key_cols: list[str], watermark: str = "2 hours"
) -> DataFrame:
    """Native bounded-state streaming dedup:
    ``dropDuplicatesWithinWatermark`` keeps the first row per key and
    expires each key's state once the watermark passes it — the
    engine-managed TTL twin of :func:`stateful_first_seen` (which keeps
    keys forever, the unbounded-state trade). At scale this is the one
    to reach for on high-cardinality keys: state is O(keys per
    watermark window), not O(all keys ever)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def stateful_first_seen(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Custom stateful streaming operator: emit each key the first time
    it is ever seen across the whole stream (keyed dedup with unbounded
    state), via ``applyInPandasWithState``.

    This is the canonical shape for custom state logic Spark's built-in
    operators don't cover (the built-in ``dropDuplicates`` on a stream
    keeps whole rows; here the state is a single bit per key, and the
    emitted record is deterministic — just the key — regardless of how
    the input was micro-batched). State is one boolean per distinct key,
    partitioned by the grouping key: at 100 TB the state store shards
    with the shuffle, and a watermark-based timeout would bound it for
    keys that can expire.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def first_seen(key, batches, state: GroupState):
        for _ in batches:  # drain; content irrelevant beyond presence
            pass
        if not state.exists:
            state.update((True,))
            yield pd.DataFrame({key_col: [key[0]]})

    # output schema derives from the ACTUAL key type (round-11 review:
    # a hardcoded 'long' crashed the Arrow conversion mid-stream for
    # any non-bigint grouping key, e.g. key_col="event_type")
    key_type = events.schema[key_col].dataType.simpleString()
    return events.groupBy(key_col).applyInPandasWithState(
        first_seen,
        outputStructType=f"{key_col} {key_type}",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def tws_count_threshold(
    events: DataFrame, key_col: str = "user_id", threshold: int = 67
) -> DataFrame:
    """Custom stateful streaming operator on Spark 4's
    ``transformWithStateInPandas`` API: a running per-key event counter
    that emits the key exactly once, in the micro-batch where its
    lifetime count crosses ``threshold``.

    Complements ``stateful_first_seen`` (the older
    ``applyInPandasWithState`` API) with the newer processor-object API:
    explicit typed state variables (``ValueState``), per-batch
    ``handleInputRows``, TTL hooks. The emitted set — keys whose total
    count ever reaches the threshold — is batching-invariant, so a
    batch GROUP BY/HAVING is a full-value oracle for a genuinely
    streaming execution. State is one long per key, sharded with the
    grouping shuffle; at 100 TB a TTL (``ttlDurationMs``) would bound
    it for keys that go quiet.

    Environment gate: transformWithStateInPandas moves state through a
    protobuf-encoded side channel, so it needs the ``protobuf`` package
    at RUNTIME. The import check below runs on the DRIVER only — it
    catches the all-one-environment case (this container, local mode);
    on a cluster the EXECUTORS' Python needs protobuf too, and a
    driver-only pass with bare executors still dies mid-stream with an
    executor-side ImportError (ship protobuf in the executor image —
    the gate cannot see that from here).
    """
    if threshold < 1:
        raise ValueError(
            f"threshold must be >= 1 (got {threshold}): the crossing "
            f"test n < threshold <= n+add can never fire for a "
            f"non-positive threshold, silently diverging from the "
            f"batch GROUP BY/HAVING oracle that would return every key"
        )
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env-dependent
        raise NotImplementedError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(pyspark's stateful-processor channel is protobuf-encoded); "
            "not installed in this environment"
        ) from exc
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class CountThreshold(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._cnt = handle.getValueState("cnt", "n BIGINT")

        def handleInputRows(self, key, rows, timer_values):
            prev = self._cnt.get()
            n = int(prev[0]) if prev is not None else 0
            add = sum(len(pdf) for pdf in rows)
            self._cnt.update((n + add,))
            if n < threshold <= n + add:
                yield pd.DataFrame({key_col: [key[0]]})

        def close(self) -> None:
            pass

    key_type = events.schema[key_col].dataType.simpleString()
    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=CountThreshold(),
        outputStructType=f"{key_col} {key_type}",
        outputMode="Append",
        timeMode="None",
    )


def interval_join_clicks_views(
    clicks: DataFrame,
    views: DataFrame,
    lookback: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-stream inner join: each click pairs with the same user's
    views in the ``lookback`` window strictly before it.

    The canonical attribution join. Both sides carry watermarks and the
    join predicate bounds event time on both sides, so Spark can size
    the join state: a buffered view is droppable once the click-side
    watermark passes ``view_ts + lookback`` — state is O(rate ·
    (lookback + watermark)) per user shard, not unbounded. Works
    identically on batch DataFrames (same function, batch mode), which
    is what the differential oracle checks.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("__v_user__"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    return c.join(
        v,
        (c["user_id"] == v["__v_user__"])
        & (v["view_ts"] < c["click_ts"])
        & (v["view_ts"] >= c["click_ts"] - F.expr(f"INTERVAL {lookback}")),
    ).select("user_id", "click_id", "view_id", "click_ts", "view_ts")


def stream_to_partitioned_sink(
    events: DataFrame,
    sink_path: str,
    ts_col: str = "ts",
    query_name: str = "sink",
    checkpoint_location: str | None = None,
) -> None:
    """Stream → (month, batch)-partitioned warehouse parquet via
    ``foreachBatch``, with dynamic partition overwrite keyed by
    (month, batch_id).

    Idempotency contract, stated exactly (round-11 review): the scheme
    is replay-safe because a re-delivered micro-batch rewrites exactly
    its own (month, batch_id) partitions, and a LATER batch touching
    the same month lands in different batch_id partitions (overwriting
    by month alone would drop every earlier batch of the month). That
    guarantee holds when replays reproduce the SAME batch boundaries —
    which is what ``checkpoint_location`` provides: Structured
    Streaming's offset log pins batch composition across restarts, so
    production callers MUST pass a durable checkpoint. Without one
    (tests, throwaway backfills) each invocation re-batches from
    scratch; a re-run whose batching differs can leave a stale
    higher-numbered batch_id partition from the previous run alongside
    the new layout — re-runs without a checkpoint should write to a
    fresh ``sink_path``.

    Readers scan ``sink_path`` normally (month pruning still applies;
    batch_id is an extra partition level); periodic
    :func:`~nyc_opendata_etl_spark.operators.backfill.compact_partitions`
    folds the per-batch files. Bounded by ``Trigger.AvailableNow`` here
    (the backfill use); drop the trigger for a continuous pipeline.
    """

    def sink_batch(batch_df: DataFrame, batch_id: int) -> None:
        from pyspark.sql import functions as F

        (
            batch_df.withColumn("month", F.date_format(ts_col, "yyyy-MM"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            # writer-level, NOT session conf: without dynamic mode an
            # overwrite would truncate the whole sink path each batch,
            # deleting every prior batch. Pinning it here makes the
            # loss-free guarantee hold on any session.
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("month", "batch_id")
            .parquet(sink_path)
        )

    writer = (
        events.writeStream.foreachBatch(sink_batch)
        .queryName(query_name)
        .trigger(availableNow=True)
    )
    if checkpoint_location is not None:
        writer = writer.option("checkpointLocation", checkpoint_location)
    q = writer.start()
    q.awaitTermination()


_SHUFFLE_CONF_LOCK = threading.Lock()


def run_available_now(
    stream_df: DataFrame,
    query_name: str = "backfill",
    output_mode: str = "complete",
    state_partitions: int | None = None,
) -> DataFrame:
    """Drain the stream as a bounded backfill (Trigger.AvailableNow) into
    an in-memory sink and return the sink as a batch DataFrame — the
    Spark-native equivalent of the reference's month-by-month
    ``load_history`` subprocess loop, minus the subprocesses.

    ``output_mode``: "complete" for aggregations whose final state should
    equal the batch answer; "append" for row streams / watermark-evicted
    output (then windows newer than the final watermark are withheld,
    by design).

    ``state_partitions``: number of state-store shards for this stream.
    Unlike batch shuffles (AQE re-sizes those at runtime), a streaming
    query's state partition count is frozen into the checkpoint at
    creation and every micro-batch pays a per-shard commit (a
    stream-stream join maintains 4 state stores per shard) — so sizing
    it to the stream's key cardinality/throughput is a deliberate
    deployment decision, not a tunable afterthought. None = inherit the
    session's ``spark.sql.shuffle.partitions``.

    The partition override is necessarily a SESSION conf (a streaming
    query's state shard count has no per-query knob), so the
    set → drain → restore window is serialized under a module lock:
    without it, two concurrent callers corrupt each other's saved
    value and one caller's count leaks into the restored session
    default. Unrelated batch work running in the same session DURING
    the window still sees the override — callers that can't tolerate
    that should drain on a dedicated session.
    """
    spark = stream_df.sparkSession

    def _drain() -> None:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if state_partitions is None:
        _drain()
    else:
        with _SHUFFLE_CONF_LOCK:
            old = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set(
                "spark.sql.shuffle.partitions", str(state_partitions)
            )
            try:
                _drain()
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(query_name)
