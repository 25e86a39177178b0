"""Structured Streaming surface (SURVEY.md §2.4 streaming row / §7.2.5).

The reference is purely request/response (zero streaming constructs in
``server.py``); this package supplies the streaming capabilities the
north star requires over the append-style ``events`` table: windowed
aggregation with watermarks, session windows, streaming dedup, and a
custom stateful operator via ``transformWithStateInPandas``-style
``applyInPandasWithState``.
"""

from cassandrastack_spark.streaming.ops import (
    events_stream,
    run_to_batch,
    session_window_counts,
    sliding_window_counts,
    stateful_user_totals,
    streaming_dedup,
    tumbling_window_counts,
)

__all__ = [
    "events_stream",
    "run_to_batch",
    "session_window_counts",
    "sliding_window_counts",
    "stateful_user_totals",
    "streaming_dedup",
    "tumbling_window_counts",
]
