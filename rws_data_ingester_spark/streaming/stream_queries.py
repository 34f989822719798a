"""Registered driver-checkable wrappers for the streaming tier
(SURVEY.md §2.9): each entry replays the events parquet through a real
Structured Streaming query (availableNow trigger — the reference's
cron-full-refresh semantics, cronjob.sh:1-3) into a memory sink and
returns the final table as a batch DataFrame.

Where the availableNow replay is provably batch-equal (one source file →
one micro-batch → no watermark drops), the stream query carries the SAME
oracle as its batch twin and is hash-checked like any batch query
(tumbling/sliding/session windows, watermark dedup, stream-static join,
file-sink recovery). Only the genuinely order/state-dependent ones
(applyInPandasWithState running totals in update mode, stream-stream
join) stay rows-only, with batch↔stream equivalence pinned in
tests/test_streaming.py instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rws_data_ingester_spark.functions.rounding import pround
from rws_data_ingester_spark.operators import temporal  # noqa: F401  (registers the batch twins whose oracles we share)
from rws_data_ingester_spark.plans.registry import REGISTRY, query
from rws_data_ingester_spark.streaming import jobs


# The availableNow replay reads the whole fixture in ONE micro-batch (one
# source file), so no window is watermark-dropped and the streamed result
# equals the batch twin exactly — which makes these five streaming queries
# oracle-checkable with the SAME oracle SQL as their batch twins (shared by
# reference, not copied, so they cannot drift).
@query("stream_tumbling_counts", oracle=REGISTRY["tumbling_window_hourly"].oracle)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window agg, streamed to completion. Batch twin
    (oracle-checked): tumbling_window_hourly — same oracle attached here."""
    return jobs.run_to_memory(jobs.tumbling_counts_stream(spark, sf_dir))


@query("stream_sliding_counts", oracle=REGISTRY["sliding_window_counts"].oracle)
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (overlapping) windows, streamed. Batch twin:
    sliding_window_counts — same oracle attached here."""
    return jobs.run_to_memory(jobs.sliding_counts_stream(spark, sf_dir))


@query("stream_session_windows", oracle=REGISTRY["session_window_native"].oracle)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window sessionization with merging session state.
    Batch twins: session_window_native / session_window_islands — the
    native twin's oracle is attached here."""
    return jobs.run_to_memory(jobs.session_windows_stream(spark, sf_dir))


@query(
    "stream_dedup_within_watermark",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, user_id,
           event_type, ROUND(value, 4) AS value, props
    FROM events
    """,
)
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark — bounded-state streaming dedup.
    event_id is unique in the fixture, so the deduped stream must equal
    the full events table (oracle above); state-bounding semantics have
    their own test. Timestamps render to strings per the registry rule."""
    from pyspark.sql import functions as F

    out = jobs.run_to_memory(jobs.stream_dedup(spark, sf_dir), output_mode="append")
    return out.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "user_id",
        "event_type",
        pround("value", 4).alias("value"),
        "props",
    )


@query("stream_static_enrich_purchases", oracle=REGISTRY["stream_static_join"].oracle)
def stream_static_enrich_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join per micro-batch. Batch twin:
    stream_static_join — same oracle attached here."""
    return jobs.run_to_memory(
        jobs.stream_static_enrich(spark, sf_dir), output_mode="append"
    )


@query("stream_stateful_running_totals", oracle=None)  # streaming → rows-only
def stream_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom per-key grouped state via applyInPandasWithState (running
    per-user totals across micro-batches)."""
    return jobs.run_to_memory(
        jobs.stateful_running_totals(spark, sf_dir), output_mode="update"
    )


@query("stream_stream_click_attribution", oracle=None)  # streaming → rows-only
def stream_stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (click→purchase attribution within one
    hour); both sides watermarked so the join state stays bounded. Batch
    twin pinned in tests/test_streaming.py."""
    return jobs.run_to_memory(
        jobs.stream_stream_click_purchase(spark, sf_dir), output_mode="append"
    )


@query(
    "stream_parquet_sink_recovery",
    oracle="""
    SELECT COUNT(*)::BIGINT AS n_rows,
           COUNT(DISTINCT event_id)::BIGINT AS n_events
    FROM events
    """,
)
def stream_parquet_sink_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Checkpointed parquet file sink driven through a two-wave arrival +
    restart: the recovered sink must equal the batch events table exactly
    (no loss, no duplicates) — which makes this streaming query
    oracle-checkable, unlike the windowed ones."""
    return jobs.parquet_sink_two_phase_replay(spark, sf_dir)


@query(
    "stream_scheduled_refresh",
    oracle=REGISTRY["tumbling_window_hourly"].oracle,
)
def stream_scheduled_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's cron model end-to-end (cronjob.sh:1-3 →
    generate.sh: full refresh, output overwritten every run): one
    availableNow pass of the tumbling-window agg through an idempotent
    foreachBatch overwrite sink, then read the refreshed store back.
    Because the sink holds exactly the completed aggregate, the refreshed
    table carries the SAME oracle as the batch twin — the driver verifies
    the whole refresh loop (stream → overwrite → read-back), not just the
    in-memory result. Overwrite idempotency (a second refresh leaves the
    store identical) is pinned separately in tests/test_streaming.py."""
    import tempfile

    out = tempfile.mkdtemp(prefix="rws_refresh_")
    jobs.scheduled_refresh(spark, sf_dir, out)
    return spark.read.parquet(out)
