"""Structured Streaming layer."""

from sf_datalake_spark.streaming.streams import (
    event_transitions_stateful,
    read_file_stream,
    run_bloom_gate,
    run_near_dup_gate,
    run_to_memory,
    run_scd2_sink,
    run_skyline_sink,
    run_upsert_sink,
    running_total_alerts,
    running_total_alerts_tws,
    session_aggregate,
    stream_stream_join,
    streaming_sample_admissions,
    streaming_dedup,
    windowed_aggregate,
)

__all__ = [
    "event_transitions_stateful",
    "read_file_stream",
    "run_bloom_gate",
    "run_near_dup_gate",
    "run_to_memory",
    "run_scd2_sink",
    "run_skyline_sink",
    "run_upsert_sink",
    "running_total_alerts",
    "running_total_alerts_tws",
    "session_aggregate",
    "stream_stream_join",
    "streaming_sample_admissions",
    "streaming_dedup",
    "windowed_aggregate",
]
