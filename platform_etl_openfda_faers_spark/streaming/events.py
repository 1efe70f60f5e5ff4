"""Structured Streaming over the events table (beyond-reference surface —
the reference is pure batch; SURVEY §1.1 notes "no streams").

Each transformation is written once as a DataFrame->DataFrame function and
applied identically to a batch frame or a ``readStream`` frame — Spark's
unified API makes the batch twin the natural correctness oracle for the
streaming path (and the DuckDB oracle checks the batch twin).

Scale notes: watermarks bound state (late rows beyond the watermark are
dropped); the windowed aggregate state is partitioned by (window, key) so it
scales horizontally.  ``availableNow`` triggers give batch-like runs over a
growing directory without keeping a cluster hot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.readers import normalize_timestamps

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def read_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a parquet directory (schema must be explicit)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(path)
    )


def tumbling_counts(
    df: DataFrame,
    window: str = "1 hour",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Per-(hour, event_type) count + value sum.  Works batch or streaming."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            # decimal-cast sum: exact, order-independent (a parallel double
            # sum is nondeterministic in the last ulps) — then back to double
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_user_activity(
    df: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Sliding-window distinct-user activity (batch or streaming).

    Streaming mode uses ``approx_count_distinct`` (exact distinct over
    sliding state doesn't exist in streaming); batch mode is exact.
    """
    if df.isStreaming:
        if watermark is not None:
            df = df.withWatermark("ts", watermark)
        cnt = F.approx_count_distinct("user_id")
    else:
        cnt = F.countDistinct("user_id")
    return (
        df.groupBy(F.window("ts", window, slide).alias("w"))
        .agg(cnt.alias("n_users"))
        .select(F.col("w.start").alias("window_start"), "n_users")
    )


def session_counts(
    df: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Per-user session windows (gap-merged), batch or streaming.

    ``F.session_window`` merges an event into the open session while it
    starts strictly before the previous event's ts+gap; a gap >= ``gap``
    closes the session.  State is keyed (session, user) so it scales
    horizontally; the watermark bounds open-session state in streaming.
    The batch twin is the gaps-and-islands SQL the DuckDB oracle runs.
    """
    if watermark is not None and df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2)
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("user_id"),
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def running_user_totals(df: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (n_events, sum_value).

    The ``applyInPandasWithState`` shape for stateful logic Spark's built-in
    aggregates can't express (arbitrary per-key state machines).  State is
    one (long, double) tuple per user — O(|users|) total, partitioned by the
    grouping key so it scales horizontally.  Each micro-batch emits the
    updated running totals for the users it touched (update semantics).

    Batch-mode fallback: a plain groupBy with the same output schema (the
    equivalence of the two is the pytest check).
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    if not df.isStreaming:
        return df.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id long, n_events long, sum_value double"
    state_schema = "n long, s double"

    def update(key, pdf_iter, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdf_iter:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return df.groupBy("user_id").applyInPandasWithState(
        update,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def click_purchase_join(
    df: DataFrame,
    watermark: str = "2 hours",
    max_delay_minutes: int = 60,
    how: str = "inner",
) -> DataFrame:
    """Stream-stream INNER INTERVAL JOIN: each purchase matched to the same
    user's clicks in the preceding ``max_delay_minutes`` — the canonical
    attribution join of an event pipeline.

    Batch and streaming share the code path; in streaming, BOTH sides carry
    a watermark and the join condition bounds event time on both sides, so
    Spark can evict click state once the watermark passes
    ``click_ts + max_delay`` (bounded state — without the time bound a
    stream-stream join would buffer both sides forever).  Inner-join
    matches emit in the micro-batch where they're found; the watermark
    governs state eviction and late-input drop, not emission latency.

    ``how="left_outer"`` keeps unmatched clicks: in streaming they emit
    (with NULL purchase columns) only once the watermark proves no
    in-window purchase can still arrive — the state-closure semantics
    unique to outer stream-stream joins.

    The BATCH twin routes through the binned ``interval_join``
    (``operators/rangejoin.py``) instead of a raw equi-join with a range
    conjunct: the raw form hash-partitions on ``user_id`` but degenerates
    to a per-user nested loop on hot users; the binned plan is a pure
    equi-join on ``(user_id, time-bin)`` that AQE can split like any
    other.  Streaming keeps the range conjunct — Spark's stream-stream
    join needs it verbatim to derive the state-eviction bound.

    Output: (click_id, purchase_id, user_id, delay_us).
    """
    if how not in ("inner", "left_outer"):
        # left_semi would drop the purchase columns this join projects
        raise ValueError(f"how must be inner or left_outer, got {how!r}")
    df = normalize_timestamps(df)
    c = df.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("click_ts"),
    )
    delay = (
        F.unix_micros("purchase_ts") - F.unix_micros("click_ts")
    ).alias("delay_us")
    if not df.isStreaming:
        from ..operators.rangejoin import interval_join

        p_b = df.where(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id"),
            F.col("ts").alias("purchase_ts"),
        )
        return interval_join(
            c,
            p_b,
            key="user_id",
            left_ts="click_ts",
            right_ts="purchase_ts",
            lower_s=0.0,
            upper_s=max_delay_minutes * 60.0,
            how=how,
            left_id="click_id",
        ).select("click_id", "purchase_id", "user_id", delay)
    p = df.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("ts").alias("purchase_ts"),
    )
    c = c.withWatermark("click_ts", watermark)
    p = p.withWatermark("purchase_ts", watermark)
    cond = (
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {max_delay_minutes} MINUTES")
        )
    )
    return c.join(p, cond, how).select(
        "click_id",
        "purchase_id",
        "user_id",
        delay,
    )


def running_user_totals_tws(df: DataFrame) -> DataFrame:
    """Per-user running totals via ``transformWithStateInPandas`` — the
    Spark 4 arbitrary-stateful-processing API (successor of
    ``applyInPandasWithState``): explicit typed state handles, timers, and
    TTL support.  Requires the RocksDB state store provider and the
    ``protobuf`` package (the driver<->state-server protocol) at runtime.

    Where ``protobuf`` is absent (this container), the call TRANSPARENTLY
    falls back to ``running_user_totals`` — the ``applyInPandasWithState``
    twin with identical update-mode semantics and output schema — so
    callers (and the pytest) exercise a real streaming stateful plan either
    way instead of skipping.

    Semantics match ``running_user_totals`` exactly (update-mode emission of
    the running (n_events, sum_value) per touched user per micro-batch);
    the batch fallback is the same plain aggregate.
    """
    import pandas as pd  # noqa: PLC0415 — worker-side import

    if not df.isStreaming:
        return df.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )

    try:
        import google.protobuf  # noqa: F401, PLC0415 — runtime capability probe
    except ImportError:
        return running_user_totals(df)

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, s DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            if self._totals.exists():
                n, s = self._totals.get()
            else:
                n, s = 0, 0.0
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
            )

        def close(self) -> None:
            pass

    return df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType="user_id long, n_events long, sum_value double",
        outputMode="Update",
        timeMode="None",
    )


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain the stream into an in-memory table and return it (test helper)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def enrich_with_dim(
    df: DataFrame,
    dim: DataFrame,
    stream_key,
    dim_key: str,
) -> DataFrame:
    """Stream-static enrichment join: each (micro-batch of) events joined
    to a slowly-changing dimension table.

    The canonical streaming-enrichment pattern: a stream-static equi-join
    is stateless (no watermark, no join state — the static side is simply
    re-joined per micro-batch, picking up dimension updates between
    triggers).  The dimension is broadcast (bounded by definition — a
    dimension that scales with the fact stream isn't a dimension), so each
    micro-batch is a map-only probe, no shuffle of the stream.  Works
    identically on a batch frame, which is the correctness oracle.

    ``stream_key`` is a Column expression (e.g. a derived foreign key);
    ``dim_key`` the dimension's key column name.
    """
    return df.join(
        F.broadcast(dim), stream_key == F.col(dim_key), "left_outer"
    ).drop(dim_key)


def dedup_events(
    df: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming-safe exact dedup on a key set (default: event_id).

    Streaming: ``dropDuplicatesWithinWatermark`` — the seen-key state is
    evicted once the watermark passes, so memory is bounded by the
    watermark horizon (a plain ``dropDuplicates`` on a stream would keep
    every key forever).  Batch: ordinary ``dropDuplicates``.  This is the
    streaming half of the dedup family in ``operators/dedup.py``.
    """
    keys = keys or ["event_id"]
    if df.isStreaming:
        return df.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def write_stream_idempotent_parquet(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    query_name: str = "idempotent_sink",
):
    """Exactly-once-style parquet sink via ``foreachBatch``: each
    micro-batch writes to ``out_dir/batch_id=N`` with ``overwrite`` mode,
    so a batch REPLAYED after a failure/restart overwrites its own
    directory instead of appending duplicates — idempotent-by-path, the
    standard pattern when the sink itself has no transaction log.

    The checkpoint records which batch ids are committed; on restart
    Structured Streaming replays at-least-once and the (batch_id)-keyed
    overwrite turns that into effectively-once output.  Readers get
    partition pruning on ``batch_id`` for free (hive layout).  Returns
    the (started) query; caller awaits termination.
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_dir}/batch_id={batch_id}"
        )

    return (
        stream_df.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
