"""Structured Streaming extension (SURVEY.md §2.10).

The reference is strictly batch; these operators are the streaming face
of the same aggregation expressions, mandated by the 100 TB north star.
Batch twins of the window aggregations live in operators.timeseries and
are oracle-checked; the streaming variants here add watermarks and state.
"""

from .ops import (
    STATEFUL_STATE_STORE_CONF,
    configure_state_store,
    stream_dedup_within_watermark,
    stream_drift_monitor,
    stream_heavy_hitters,
    stream_interval_join,
    stream_merge_upsert_sink,
    stream_session_agg,
    stream_sliding_agg,
    stream_tumbling_agg,
    stream_session_state,
    streaming_counter_state,
)

__all__ = [
    "STATEFUL_STATE_STORE_CONF",
    "configure_state_store",
    "stream_dedup_within_watermark",
    "stream_drift_monitor",
    "stream_heavy_hitters",
    "stream_interval_join",
    "stream_merge_upsert_sink",
    "stream_session_agg",
    "stream_sliding_agg",
    "stream_tumbling_agg",
    "stream_session_state",
    "streaming_counter_state",
]
