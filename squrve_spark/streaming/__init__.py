"""Structured Streaming over event logs (engine extension, SURVEY §2.D/§7.8).

The reference has no streaming surface; this module adds the Spark-native
one: file-source streams over the ``events`` table shape, watermarked
tumbling/session windows, and a custom stateful per-key operator via
``applyInPandasWithState``. Batch equivalents live in plans/analytics.py —
the test contract is streaming == batch on the same data.
"""

from squrve_spark.streaming.ops import (  # noqa: F401
    dedup_stream,
    enrich_stream,
    interval_join_stream,
    hourly_counts_stream,
    read_event_stream,
    run_stream_to_table,
    session_counts_stream,
    user_running_state_stream,
    write_stream_exactly_once,
)
