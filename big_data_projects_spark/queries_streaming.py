"""Structured Streaming queries (additive — the reference is batch-only,
SURVEY.md §2.9). The bounded events table drives a real streaming query
to completion; results equal the batch twin, so the windowed aggregate
is fully oracle-checked against DuckDB time_bucket.
"""

from __future__ import annotations

from big_data_projects_spark.registry import register
from big_data_projects_spark.session import ensure_runtime_conf
from big_data_projects_spark.streaming.windowed import hourly_event_counts_stream


@register(
    "q_stream_hourly_counts",
    oracle="""
    SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start_ms,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_hourly_counts(spark, sf_dir):
    """Tumbling 1-hour event-time windows with watermark, run as a real
    readStream→writeStream job (memory sink, complete mode, driven to
    completion). Decimal-accumulated sums keep streaming-state update
    order from affecting the result."""
    ensure_runtime_conf(spark)
    return hourly_event_counts_stream(spark, sf_dir)
