"""Event-time windowed aggregation as a Structured Streaming job.

readStream over the events parquet → tumbling event-time windows with a
watermark → sink. For tests/oracle runs the sink is an in-memory table
driven to completion with processAllAvailable() (the parquet batch acts
as a bounded stream); in production the same plan runs over a file/Kafka
source with the same watermark semantics.

Aggregates over double columns use exact decimal accumulation so the
final values are order-independent (streaming state updates arrive in
arbitrary order) and hash-match the batch/DuckDB twin.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def hourly_event_counts_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    """Tumbling 1-hour counts + value sums per event_type, computed by a
    real streaming query driven to completion, returned as a DataFrame.

    Complete output mode: every window is emitted at the final trigger
    (append mode would withhold windows newer than the watermark — with
    a bounded backfill the last hours would be missing)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    src = f"{sf_dir}/events.parquet"
    batch_schema = spark.read.parquet(src).schema
    # The file-stream source requires a *directory*; stage the single
    # parquet file behind a symlink (no data copy).
    stage = tempfile.mkdtemp(prefix="bdp_stream_src_")
    link = os.path.join(stage, "events.parquet")
    try:
        os.symlink(src, link)
    except OSError:
        shutil.copy(src, link)
    stream = spark.readStream.schema(batch_schema).parquet(stage)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))

    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.unix_millis(F.col("window.start")).alias("window_start_ms"),
            "event_type",
            "n",
            "total_value",
        )
    )

    name = f"bdp_stream_{uuid.uuid4().hex[:8]}"
    query = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    # Materialize before the memory sink's table goes away.
    result = spark.table(name)
    out = spark.createDataFrame(result.collect(), schema=result.schema)
    return out
