"""Shared Structured Streaming plumbing.

Every streaming query here follows one shape: readStream over the
bounded events parquet (staged behind a directory symlink, since the
file source wants a directory) → event-time stateful transform →
memory sink driven to completion with processAllAvailable(). The same
plan runs unchanged over a file/Kafka source in production; only the
sink and trigger differ.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# One staging dir per source file per process (reused across calls):
# repeated sweeps/tests must not accumulate mkdtemp dirs — the staging
# dir only holds a symlink to the read-only source parquet, so reuse
# is always safe.
_STAGE_CACHE: dict[str, str] = {}

# Schema-peek cache (r13): the file-stream source requires an explicit
# schema, so every *_stream() call paid a batch `read.parquet().schema`
# footer scan (~0.1 s of driver round-trips) for a schema that is
# immutable per source path within a process — the testdata files never
# change under a running session.  Keyed by path, like _STAGE_CACHE.
_SCHEMA_CACHE: dict[str, object] = {}


def _peeked_schema(spark: SparkSession, src: str):
    schema = _SCHEMA_CACHE.get(src)
    if schema is None:
        schema = spark.read.parquet(src).schema
        _SCHEMA_CACHE[src] = schema
    return schema


def _staged_source(src: str, prefix: str) -> str:
    """Return a directory containing (symlinks to) ``src``'s data
    file(s), creating it on first use and reusing it afterwards.

    ``src`` may be a single parquet file (the driver testdata shape)
    or a Spark-written DIRECTORY of part files (the scale-smoke
    corpora): the file-stream source lists only the top level of its
    path — a symlinked subdirectory is silently skipped and the
    stream reads ZERO rows (caught by the round-10 smoke run of
    q_stream_ivf_gate) — so directory sources are flattened by
    symlinking each part file directly into the stage dir.  The walk
    RECURSES: a hive-partitioned source (written with partitionBy)
    nests its part files one level down per partition column, and a
    single-level flatten would symlink those partition directories —
    reintroducing the same silent zero/partial-row skip one level
    deeper (ADVICE r10).  Note the flatten drops partition-column
    values encoded only in directory names; sources staged here carry
    their columns in the data files (the testdata/scale-smoke shape)."""
    stage = _STAGE_CACHE.get(src)
    if stage is not None and os.path.isdir(stage):
        return stage
    stage = tempfile.mkdtemp(prefix=prefix)
    if os.path.isdir(src):
        entries = []
        # followlinks=False (ADVICE r11 #4): Spark-written sources nest
        # REAL directories (partitionBy subdirs), never symlinked ones,
        # and following directory symlinks both re-traverses the exact
        # shape the flatten exists to avoid staging and hangs forever
        # on a symlink cycle.  Symlinked FILES are still staged — only
        # directory-symlink descent is off.
        for root, dirs, files in os.walk(src, followlinks=False):
            dirs[:] = sorted(
                d for d in dirs if not d.startswith("_") and not d.startswith(".")
            )
            entries.extend(
                os.path.join(root, f)
                for f in sorted(files)
                if not f.startswith("_") and not f.startswith(".")
            )
    else:
        entries = [src]
    for i, path in enumerate(entries):
        link = os.path.join(stage, f"{i:05d}_{os.path.basename(path)}")
        try:
            os.symlink(path, link)
        except OSError:
            shutil.copy(path, link)
    _STAGE_CACHE[src] = stage
    return stage


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events table (bounded backfill).

    Schema comes from a batch peek (the file-stream source requires an
    explicit schema); the nanos-epoch ts column is normalized to a real
    timestamp exactly as in data.load_table.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    src = f"{sf_dir}/events.parquet"
    batch_schema = _peeked_schema(spark, src)
    stage = _staged_source(src, "bdp_stream_src_")
    stream = spark.readStream.schema(batch_schema).parquet(stage)
    if dict(stream.dtypes).get("ts") == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif dict(stream.dtypes).get("ts") == "timestamp_ntz":
        # tz-naive parquet → TIMESTAMP_NTZ under inferTimestampNTZ;
        # reinterpret as UTC TIMESTAMP exactly as data._normalize_ntz.
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def run_to_completion(df: DataFrame, output_mode: str) -> DataFrame:
    """Start df as a memory-sink streaming query, drain the source, and
    return the sink contents as a (materialized) batch DataFrame.

    HARNESS-ONLY, for aggregate-shaped streams: the memory sink plus
    the final collect are bounded by the aggregate's group count (tens
    to thousands of rows). Streams whose output scales with the data —
    candidate pairs, per-row gates — must drain through
    run_to_distributed_batch (foreachBatch → parquet, no driver
    collect) instead."""
    spark = df.sparkSession
    name = f"bdp_stream_{uuid.uuid4().hex[:8]}"
    query = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    result = spark.table(name)
    return spark.createDataFrame(result.collect(), schema=result.schema)


def run_to_distributed_batch(df: DataFrame) -> DataFrame:
    """Drain ``df`` through a foreachBatch parquet sink — the
    production shape for candidate-scale streams — and return the sink
    contents as a DISTRIBUTED batch DataFrame (read back from parquet;
    nothing proportional to the stream's output ever touches the
    driver). The scratch sink dir is removed at process exit."""
    import atexit

    spark = df.sparkSession
    out = tempfile.mkdtemp(prefix="bdp_stream_sink_")
    atexit.register(shutil.rmtree, out, ignore_errors=True)
    run_foreach_batch_to_parquet(df, out)
    if not any(f.startswith("part-") for f in os.listdir(out)):
        return spark.createDataFrame([], df.schema)
    return spark.read.parquet(out)


def run_foreach_batch_to_parquet(df, out_dir: str):
    """Drive ``df`` as a stream whose sink is a foreachBatch writing
    hive-partitioned parquet — the production sink shape (idempotent
    re-runs key on batch_id; here each bounded run appends its batches).
    Returns after the source is drained."""

    def write_batch(batch_df, batch_id: int):
        batch_df.write.mode("append").parquet(out_dir)

    query = df.writeStream.outputMode("append").foreachBatch(write_batch).start()
    try:
        query.processAllAvailable()
    finally:
        query.stop()


def run_available_now_to_parquet(
    df: DataFrame, out_dir: str, ledger: list | None = None
) -> None:
    """Drive ``df`` with Trigger.AvailableNow — the production catch-up
    trigger: process everything available at start as rate-limited
    micro-batches (source options like maxFilesPerTrigger are honored,
    unlike a one-shot trigger-once), then stop on its own. foreachBatch
    appends each micro-batch to parquet; ``ledger`` (if given) collects
    the batch ids so callers can assert the rate limit actually split
    the backlog."""

    def write_batch(batch_df, batch_id: int):
        batch_df.write.mode("append").parquet(out_dir)
        if ledger is not None:
            ledger.append(batch_id)

    query = (
        df.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .foreachBatch(write_batch)
        .start()
    )
    query.awaitTermination()


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the documents table (bounded backfill), same
    staging trick as events_stream. Documents carry no event time —
    callers run stateless transforms (append mode) or add an arrival
    timestamp if they need windows."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = f"{sf_dir}/documents.parquet"
    batch_schema = _peeked_schema(spark, src)
    stage = _staged_source(src, "bdp_stream_docs_")
    return spark.readStream.schema(batch_schema).parquet(stage)


def embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the embeddings table (bounded backfill), same
    staging trick as documents_stream. No event time — vector-gate
    consumers run stateless in-row projections + stream-static joins
    in append mode."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    src = f"{sf_dir}/embeddings.parquet"
    batch_schema = _peeked_schema(spark, src)
    stage = _staged_source(src, "bdp_stream_emb_")
    return spark.readStream.schema(batch_schema).parquet(stage)
