"""Structured Streaming equivalence: the streaming path over the events
directory must produce exactly the batch twin's rows."""

import pytest
from pyspark.sql import functions as F

from platform_etl_openfda_faers_spark.sources.readers import load_table
from platform_etl_openfda_faers_spark.streaming import events as ev


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    # re-write the events table as a plain-timestamp parquet dir so the
    # file-source stream can read it with an explicit schema
    out = str(tmp_path_factory.mktemp("events_stream"))
    load_table(spark, sf_dir, "events").write.mode("overwrite").parquet(out)
    return out


def test_streaming_tumbling_equals_batch(spark, events_dir):
    batch = spark.read.schema(ev.EVENT_SCHEMA).parquet(events_dir)
    expected = sorted(
        (str(r.window_start), r.event_type, r.n_events, r.sum_value)
        for r in ev.tumbling_counts(batch).collect()
    )
    stream = ev.read_event_stream(spark, events_dir)
    got_df = ev.run_available_now(ev.tumbling_counts(stream), "tumbling_test")
    got = sorted(
        (str(r.window_start), r.event_type, r.n_events, r.sum_value)
        for r in got_df.collect()
    )
    assert got == expected
    assert len(got) > 0


def test_streaming_is_streaming(spark, events_dir):
    stream = ev.read_event_stream(spark, events_dir)
    assert stream.isStreaming
    agg = ev.tumbling_counts(stream)
    assert agg.isStreaming


def test_sliding_batch_window_membership(spark, events_dir):
    batch = spark.read.schema(ev.EVENT_SCHEMA).parquet(events_dir)
    out = ev.sliding_user_activity(batch)
    starts = [r.window_start for r in out.collect()]
    assert len(starts) == len(set(starts))  # one row per window
    assert len(starts) > 0
    # each event belongs to exactly two 1h/30m sliding windows
    memberships = batch.select(F.window("ts", "1 hour", "30 minutes")).count()
    assert memberships == 2 * batch.count()


def test_stateful_running_totals_converge_to_batch(spark, events_dir):
    """applyInPandasWithState: after draining all micro-batches, each user's
    last emitted running total equals the batch aggregate."""
    batch = spark.read.schema(ev.EVENT_SCHEMA).parquet(events_dir)
    expected = {
        r.user_id: (r.n_events, round(r.sum_value, 6))
        for r in ev.running_user_totals(batch).collect()
    }
    stream = ev.read_event_stream(spark, events_dir)
    out = ev.running_user_totals(stream)
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_totals")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    updates = spark.table("stateful_totals")
    # update mode appends one row per touched user per micro-batch; the
    # running count is monotone, so max(n_events) is the final state
    final = {
        r.user_id: (r.n_events, round(r.sum_value, 6))
        for r in updates.orderBy("n_events").collect()
    }
    assert final == expected
    # multiple micro-batches actually happened (maxFilesPerTrigger) or at
    # least one emission per user
    assert updates.count() >= len(expected)
