from mapreduceimpl_spark.streaming.ops import (
    read_events_stream,
    session_counts,
    sliding_counts,
    stream_click_view_join,
    stream_dedup,
    stream_dedup_against_corpus,
    stream_dedup_content,
    stream_enrich,
    stream_next_event_pairs,
    stream_running_anomaly,
    stream_running_totals,
    tumbling_counts,
)

__all__ = [
    "read_events_stream",
    "session_counts",
    "sliding_counts",
    "stream_click_view_join",
    "stream_dedup",
    "stream_dedup_against_corpus",
    "stream_dedup_content",
    "stream_enrich",
    "stream_next_event_pairs",
    "stream_running_anomaly",
    "stream_running_totals",
    "tumbling_counts",
]
