"""Registered driver-checkable wrappers for the streaming tier
(SURVEY.md §2.9): each entry replays the events parquet through a real
Structured Streaming query (availableNow trigger — the reference's
cron-full-refresh semantics, cronjob.sh:1-3) into a memory sink and
returns the final table as a batch DataFrame.

All rows-only (oracle=None): a streaming execution is not expressible as
one DuckDB statement, and the batch↔stream equivalence is already pinned
in tests/test_streaming.py against the oracle-checked batch twins in
operators/temporal.py. Registering them gives the driver a non-null
row-count check over the streaming engine itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from rws_data_ingester_spark.plans.registry import query
from rws_data_ingester_spark.streaming import jobs


@query("stream_tumbling_counts", oracle=None)  # streaming → rows-only
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling-window agg, streamed to completion. Batch twin
    (oracle-checked): tumbling_window_hourly."""
    return jobs.run_to_memory(jobs.tumbling_counts_stream(spark, sf_dir))


@query("stream_sliding_counts", oracle=None)  # streaming → rows-only
def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (overlapping) windows, streamed. Batch twin:
    sliding_window_counts."""
    return jobs.run_to_memory(jobs.sliding_counts_stream(spark, sf_dir))


@query("stream_session_windows", oracle=None)  # streaming → rows-only
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window sessionization with merging session state.
    Batch twins: session_window_native / session_window_islands."""
    return jobs.run_to_memory(jobs.session_windows_stream(spark, sf_dir))


@query("stream_dedup_within_watermark", oracle=None)  # streaming → rows-only
def stream_dedup_within_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicatesWithinWatermark — bounded-state streaming dedup.
    Batch twin: dedup_first_event."""
    return jobs.run_to_memory(jobs.stream_dedup(spark, sf_dir), output_mode="append")


@query("stream_static_enrich_purchases", oracle=None)  # streaming → rows-only
def stream_static_enrich_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast join per micro-batch. Batch twin:
    stream_static_join."""
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
