"""Structured Streaming queries (additive — the reference is batch-only,
SURVEY.md §2.9). The bounded events table drives a real streaming query
to completion; results equal the batch twin, so the windowed aggregate
is fully oracle-checked against DuckDB time_bucket.

API coverage note: arbitrary stateful processing is exercised through
applyInPandasWithState (q_stream_user_stats). Spark 4's successor API,
transformWithStateInPandas, is deliberately absent: its driver-side
worker requires a working google.protobuf, which this container lacks
(verified: STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE, ImportError
'descriptor' from google.protobuf) and installs are off-limits. The
operator surface it would cover is the same per-key stateful shape
already verified here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_projects_spark.registry import register
from big_data_projects_spark.session import ensure_runtime_conf
from big_data_projects_spark.streaming.joins import (
    stream_static_enrich,
    stream_stream_click_purchase,
)
from big_data_projects_spark.streaming.stateful import (
    session_window_stream,
    stream_dedup,
    user_running_stats_stream,
)
from big_data_projects_spark.streaming.windowed import (
    hourly_event_counts_stream,
    sliding_event_counts_stream,
)


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


@register(
    "q_stream_sliding_counts",
    oracle="""
    SELECT epoch_ms(time_bucket(INTERVAL '30 minutes', ts)
                    - k.k * INTERVAL '30 minutes') AS window_start_ms,
           event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events CROSS JOIN (VALUES (0),(1)) k(k)
    GROUP BY 1, 2
    """,
)
def q_stream_sliding_counts(spark, sf_dir):
    """Sliding 1-hour windows every 30 minutes (each event in exactly
    two windows), run as a real streaming job. Oracle replicates each
    event into its two window starts."""
    ensure_runtime_conf(spark)
    return sliding_event_counts_stream(spark, sf_dir)


@register(
    "q_stream_session_windows",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL '30 minutes'
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        -- event_id tiebreak keeps sid deterministic under duplicate
        -- (user_id, ts) at a session boundary.
        SELECT user_id, ts,
               SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM flagged
    )
    SELECT user_id, epoch_ms(min(ts)) AS session_start_ms,
           COUNT(*) AS n_events
    FROM numbered GROUP BY user_id, sid
    """,
)
def q_stream_session_windows(spark, sf_dir):
    """Event-time session windows (30-min inactivity gap) as a real
    streaming query; final merged sessions equal batch gap-based
    sessionization (the oracle's lag/running-sum island detection)."""
    ensure_runtime_conf(spark)
    return session_window_stream(spark, sf_dir)


@register(
    "q_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_stream_dedup(spark, sf_dir):
    """Streaming dedup against the state store: first (user_id,
    event_type) occurrence passes, later duplicates are dropped."""
    ensure_runtime_conf(spark)
    return stream_dedup(spark, sf_dir)


@register(
    "q_stream_user_stats",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(MAX(value) AS DOUBLE) AS max_value
    FROM events GROUP BY user_id
    """,
)
def q_stream_user_stats(spark, sf_dir):
    """Custom stateful operator (applyInPandasWithState): per-user
    running count + max, emitted per micro-batch in update mode; the
    bounded run's final state matches the batch aggregate."""
    ensure_runtime_conf(spark)
    return user_running_stats_stream(spark, sf_dir)


@register(
    "q_stream_static_join",
    oracle="""
    SELECT epoch_ms(time_bucket(INTERVAL '1 day', ts)) AS window_start_ms,
           c_mktsegment, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    """,
)
def q_stream_static_join(spark, sf_dir):
    """Stream⋈static enrichment: each micro-batch joins the broadcast
    customer dim (no streaming state for the static side), then a daily
    tumbling-window aggregate per market segment. Run to completion over
    the bounded source; equals the batch join+group."""
    ensure_runtime_conf(spark)
    return stream_static_enrich(spark, sf_dir)


@register(
    "q_stream_stream_join",
    oracle="""
    SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
           epoch_ms(c.ts) AS click_ms, epoch_ms(p.ts) AS purchase_ms
    FROM events c JOIN events p
      ON c.user_id = p.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def q_stream_stream_join(spark, sf_dir):
    """Stream⋈stream event-time join (clicks × same-user purchases
    within 1 hour): watermarks on both sides plus the time-range bound
    keep the join state finite — the only stream-stream formulation
    that survives an unbounded source. Append mode; the bounded run
    emits exactly the batch join's pairs."""
    ensure_runtime_conf(spark)
    return stream_stream_click_purchase(spark, sf_dir)


@register(
    "q_stream_foreach_sink",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY event_type
    """,
)
def q_stream_foreach_sink(spark, sf_dir):
    """foreachBatch sink: the stream's micro-batches are written to
    parquet by arbitrary batch logic (the production escape hatch for
    sinks Structured Streaming lacks), then the files are read back and
    aggregated — proving the sink persisted exactly the source rows."""
    import tempfile

    from big_data_projects_spark.streaming.core import (
        events_stream,
        run_foreach_batch_to_parquet,
    )

    ensure_runtime_conf(spark)
    out = tempfile.mkdtemp(prefix="bdp_stream_sink_") + "/events_out"
    stream = events_stream(spark, sf_dir).select("event_id", "event_type", "value")
    run_foreach_batch_to_parquet(stream, out)
    back = spark.read.parquet(out)
    from big_data_projects_spark.operators.relational import dsum

    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value", "total_value")
    )


from big_data_projects_spark.sources import synthetic as _synth  # noqa: E402


@register(
    "q_stream_custom_source",
    oracle=f"""
    WITH synth AS ({_synth.oracle_sql(20000)})
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(amount AS DECIMAL(38,6))) AS DOUBLE) AS total_amount
    FROM synth GROUP BY event_type
    """,
)
def q_stream_custom_source(spark, sf_dir):
    """Streaming face of the custom Python DataSource: readStream over
    bdp_synth (SimpleDataSourceStreamReader — offsets are row indices,
    micro-batches of 2k rows, exactly-once restartable because each
    batch is a pure function of its offset pair), aggregated per event
    type in complete mode and driven to completion. The oracle
    regenerates the full relation in SQL and applies the same
    aggregate, so the driver hash-verifies the custom STREAMING
    connector end-to-end. ``sf_dir`` unused — the source is its own
    data."""
    from big_data_projects_spark.sources import synthetic
    from big_data_projects_spark.streaming.core import run_to_completion

    ensure_runtime_conf(spark)
    synthetic.register(spark)
    stream = (
        spark.readStream.format("bdp_synth")
        .option("n_rows", 20000)
        .option("batch_rows", 2000)
        .load()
    )
    agg = stream.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("amount").cast("decimal(38,6)"))
        .cast("double")
        .alias("total_amount"),
    )
    return run_to_completion(agg, "complete")


@register(
    "q_stream_anti_dedup",
    oracle="""
    SELECT event_type, COUNT(*) AS n_new,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events WHERE event_id % 3 != 0 GROUP BY 1
    """,
)
def q_stream_anti_dedup(spark, sf_dir):
    """Stream⋈static LEFT ANTI dedup: records whose id is already in
    the historical ingestion ledger are dropped inside each micro-batch
    before aggregation — the incremental-corpus shape where replayed
    feeds must not double-count. Oracle is the batch twin."""
    from big_data_projects_spark.streaming.joins import (
        stream_static_anti_dedup,
    )

    ensure_runtime_conf(spark)
    return stream_static_anti_dedup(spark, sf_dir)


@register(
    "q_stream_dedup_watermarked",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_stream_dedup_watermarked(spark, sf_dir):
    """Bounded-state streaming dedup via dropDuplicatesWithinWatermark
    — the state-evicting production API (plain dropDuplicates keeps
    every key forever). Horizon > data span here, so the run equals
    global DISTINCT and stays fully oracle-checked."""
    from big_data_projects_spark.streaming.stateful import (
        stream_dedup_watermarked,
    )

    ensure_runtime_conf(spark)
    return stream_dedup_watermarked(spark, sf_dir)


@register(
    "q_stream_daily_topk",
    oracle="""
    WITH c AS (
        SELECT epoch_ms(time_bucket(INTERVAL '1 day', ts)) AS day_start_ms,
               event_type, COUNT(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT day_start_ms, event_type, n, CAST(rk AS BIGINT) AS rk
    FROM (SELECT c.*, row_number() OVER (
              PARTITION BY day_start_ms ORDER BY n DESC, event_type) AS rk
          FROM c)
    WHERE rk <= 3
    """,
)
def q_stream_daily_topk(spark, sf_dir):
    """Streaming windowed top-k: the watermarked stream maintains
    per-(day, type) counts; the per-day rank runs over the drained
    aggregate (rank-over-aggregate can't live inside a streaming
    plan — this two-stage split is the production shape). Equals the
    batch window-rank twin."""
    from big_data_projects_spark.streaming.windowed import (
        daily_topk_types_stream,
    )

    ensure_runtime_conf(spark)
    return daily_topk_types_stream(spark, sf_dir, k=3)


@register(
    "q_stream_file_ingest",
    oracle="""
    SELECT event_type, CAST(FLOOR(value) AS BIGINT) // 100 AS value_bucket,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_file_ingest(spark, sf_dir):
    """Rate-limited incremental file ingestion — the most common
    production streaming shape (files landing in object storage): the
    events table is staged as 8 parquet files, readStream consumes the
    directory with maxFilesPerTrigger=2, and Trigger.AvailableNow
    drains the backlog as 4 rate-limited micro-batches then stops on
    its own (the catch-up trigger; trigger-once would ignore the rate
    limit). Each micro-batch lands via foreachBatch append; the
    read-back aggregate proves every staged row arrived exactly once.
    tests/test_streaming_recovery.py pins the batch split itself."""
    import tempfile

    from big_data_projects_spark.streaming.core import (
        run_available_now_to_parquet,
    )
    from big_data_projects_spark.operators.relational import dsum

    ensure_runtime_conf(spark)
    src = f"{sf_dir}/events.parquet"
    stage = tempfile.mkdtemp(prefix="bdp_file_ingest_src_")
    base = spark.read.parquet(src).select("event_id", "event_type", "value")
    base.repartition(8).write.mode("overwrite").parquet(stage)
    stream = spark.readStream.schema(base.schema).option(
        "maxFilesPerTrigger", 2
    ).parquet(stage)
    out = tempfile.mkdtemp(prefix="bdp_file_ingest_out_") + "/ingested"
    run_available_now_to_parquet(stream, out)
    back = spark.read.parquet(out)
    return back.groupBy(
        "event_type",
        F.expr("CAST(FLOOR(value) AS BIGINT) DIV 100").alias("value_bucket"),
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value", "total_value"))
