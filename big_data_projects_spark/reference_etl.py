"""The reference's full workload, re-expressed: Sparkify song-analytics
ETL (songs + logs JSON → star schema → partitioned parquet sinks).

This is the "switch path" for a user of the reference repo: the same
inputs (schema'd JSON), the same derived tables (songs_info, artists,
users, time, songplays, user_level_listen), the same sink layout
(parquet partitioned by year / year,month — transform-data.py:323-327)
— with the reference's defects fixed:

- F1 timestamp UDF (transform-data.py:126-129): Python row UDF with
  local-timezone semantics → built-in ``timestamp_millis`` on a UTC
  session (JVM-side, pushdown-transparent).
- W1 surrogate key (transform-data.py:292-298): ``row_number() over
  (order by "idx")`` orders by a string *literal* → Exchange
  SinglePartition + nondeterministic numbering. Here:
  ``monotonically_increasing_id`` (unique, no shuffle, any scale).
- Credentials `collect()` and S3 mounts (transform-data.py:38-56):
  out of engine scope; paths come in as arguments.

Faithfully preserved semantics (deliberate, documented):
- `users` dim dedups on (user_id, first_name, last_name, gender,
  level) — a user who switched level appears twice
  (transform-data.py:135-138).
- `user_level_listen` inner-joins per-user paid×free counts — only
  users active at BOTH levels appear (transform-data.py:152-157).
- songplays joins logs to songs/artists on *natural* keys (artist
  name, song title — transform-data.py:281-284), so duplicate titles
  fan out. Kept because output parity matters; at scale prefer
  surrogate-key joins (see pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from big_data_projects_spark.functions.timestamps import (
    ts_from_epoch_ms,
    with_calendar_cols,
)
from big_data_projects_spark.session import ensure_runtime_conf

# Explicit input schemas — the reference never infers
# (transform-data.py:186-197, 207-226).
SONGS_SCHEMA = T.StructType(
    [
        T.StructField("num_songs", T.IntegerType()),
        T.StructField("artist_id", T.StringType()),
        T.StructField("artist_latitude", T.FloatType()),
        T.StructField("artist_longitude", T.FloatType()),
        T.StructField("artist_location", T.StringType()),
        T.StructField("artist_name", T.StringType()),
        T.StructField("song_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("duration", T.FloatType()),
        T.StructField("year", T.IntegerType()),
    ]
)

LOGS_SCHEMA = T.StructType(
    [
        T.StructField("artist", T.StringType()),
        T.StructField("auth", T.StringType()),
        T.StructField("firstName", T.StringType()),
        T.StructField("gender", T.StringType()),
        T.StructField("itemInSession", T.LongType()),
        T.StructField("lastName", T.StringType()),
        T.StructField("length", T.DoubleType()),
        T.StructField("level", T.StringType()),
        T.StructField("location", T.StringType()),
        T.StructField("method", T.StringType()),
        T.StructField("page", T.StringType()),
        T.StructField("registration", T.DoubleType()),
        T.StructField("sessionId", T.LongType()),
        T.StructField("song", T.StringType()),
        T.StructField("status", T.StringType()),
        T.StructField("ts", T.StringType()),  # ms-epoch as STRING
        T.StructField("userAgent", T.StringType()),
        T.StructField("userId", T.StringType()),
    ]
)


def read_json(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """S2: schema'd JSON scan (transform-data.py:64-81) — no inference."""
    return spark.read.schema(schema).json(path)


def process_songs(songs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """songs_info + artists dims (transform-data.py:85-108)."""
    songs = songs.fillna({"artist_latitude": 0.0, "artist_longitude": 0.0})
    songs_info = songs.select(
        "song_id", "title", "artist_id", "year", "duration"
    ).dropDuplicates()
    artists = songs.select(
        F.col("artist_id"),
        F.col("artist_name").alias("name"),
        F.col("artist_location").alias("location"),
        F.col("artist_latitude").alias("latitude"),
        F.col("artist_longitude").alias("longitude"),
    ).dropDuplicates()
    return songs_info, artists


def storage_info(df: DataFrame) -> dict:
    """C2: storage-level introspection (transform-data.py:247-248).

    The reference's only 'performance verification' is printing
    ``df.storageLevel.useMemory`` for its two cache()d inputs after an
    action materialized them. Same surface here: cache() defaults to
    MEMORY_AND_DISK(_DESER), so a memory-resident relation reports
    useMemory=True once materialized."""
    lvl = df.storageLevel
    return {
        "useMemory": lvl.useMemory,
        "useDisk": lvl.useDisk,
        "deserialized": lvl.deserialized,
        "replication": lvl.replication,
    }


def process_logs(logs: DataFrame) -> DataFrame:
    """Filter to listen events + convert timestamps
    (transform-data.py:112-132): page='NextSong', ms-epoch-string ts →
    timestamp (built-in, UTC), registration double → long."""
    listens = logs.filter(F.col("page") == "NextSong")
    return listens.withColumn(
        "ts_converted", ts_from_epoch_ms("ts")
    ).withColumn("registration", F.col("registration").cast("long"))


def users_dim(listens: DataFrame) -> DataFrame:
    """users (transform-data.py:135-138): dedup INCLUDING level — a
    level-switching user appears once per level (reference semantics)."""
    return listens.select(
        F.col("userId").alias("user_id"),
        F.col("firstName").alias("first_name"),
        F.col("lastName").alias("last_name"),
        "gender",
        "level",
    ).dropDuplicates()


def time_dim(listens: DataFrame) -> DataFrame:
    """time (transform-data.py:168-177): calendar breakdown, deduped."""
    t = listens.select(F.col("ts_converted").alias("start_time"))
    return with_calendar_cols(t, "start_time").dropDuplicates()


def user_level_listen(listens: DataFrame) -> DataFrame:
    """Per-user paid×free listen counts (transform-data.py:144-165):
    two filtered aggregates inner-joined (users with BOTH levels only),
    empty userId dropped, full_name concat, DISTINCT."""
    paid = (
        listens.filter(F.col("level") == "paid")
        .groupBy("userId")
        .agg(F.count(F.lit(1)).alias("paid_use_count"))
    )
    free = (
        listens.filter(F.col("level") == "free")
        .groupBy("userId")
        .agg(F.count(F.lit(1)).alias("free_use_count"))
    )
    both = paid.join(free, "userId").filter(F.col("userId") != "")
    users = users_dim(listens)
    return (
        users.join(both, users.user_id == both.userId)
        .select(
            F.concat_ws(" ", "first_name", "last_name").alias("full_name"),
            "paid_use_count",
            "free_use_count",
        )
        .distinct()
    )


def songplays_fact(
    listens: DataFrame, time: DataFrame, artists: DataFrame, songs_info: DataFrame
) -> DataFrame:
    """songplays (transform-data.py:276-298): 4-way star join on the
    reference's natural keys (ts, artist name, song title), then a
    scale-safe surrogate key (monotonically_increasing_id, not the
    reference's order-by-constant global row_number)."""
    # artists and songs_info share lineage (both derive from the songs
    # scan), so qualify everything through explicit aliases.
    l, t = listens.alias("l"), time.alias("t")
    a, s = artists.alias("a"), songs_info.alias("s")
    joined = (
        l.join(t, F.col("l.ts_converted") == F.col("t.start_time"))
        .join(F.broadcast(a), F.col("l.artist") == F.col("a.name"))
        .join(F.broadcast(s), F.col("l.song") == F.col("s.title"))
    )
    return joined.select(
        F.monotonically_increasing_id().alias("num"),
        F.col("t.start_time"),
        F.col("l.userId").alias("user_id"),
        F.col("l.level").alias("level"),
        F.col("s.song_id"),
        F.col("s.artist_id"),  # the songs-side id, as in the reference output
        F.col("l.sessionId").alias("session_id"),
        F.col("l.location"),  # the log event's location, not the artist's
        F.col("l.userAgent").alias("user_agent"),
        F.col("t.year"),
        F.col("t.month"),
    )


def write_star_schema(out_dir: str, **tables: DataFrame) -> None:
    """S4 sinks (transform-data.py:313-327): overwrite parquet,
    hive-partitioned — songs_info by year; time & songplays by
    (year, month); artists/users unpartitioned."""
    partitioning = {
        "songs_info": ["year"],
        "time": ["year", "month"],
        "songplays": ["year", "month"],
    }
    for name, df in tables.items():
        writer = df.write.mode("overwrite")
        if name in partitioning:
            writer = writer.partitionBy(*partitioning[name])
        writer.parquet(f"{out_dir}/{name}.parquet")


def run_reference_etl(
    spark: SparkSession, songs_path: str, logs_path: str, out_dir: str | None = None
) -> dict[str, DataFrame]:
    """The reference notebook, top to bottom (transform-data.py:338-343)."""
    ensure_runtime_conf(spark)
    songs = read_json(spark, songs_path, SONGS_SCHEMA)
    logs = read_json(spark, logs_path, LOGS_SCHEMA)

    songs_info, artists = process_songs(songs)
    listens = process_logs(logs).cache()  # reused by 4 downstream tables
    users = users_dim(listens)
    time = time_dim(listens)
    ull = user_level_listen(listens)
    songplays = songplays_fact(listens, time, artists, songs_info)

    tables = {
        "songs_info": songs_info,
        "artists": artists,
        "users": users,
        "time": time,
        "user_level_listen": ull,
        "songplays": songplays,
    }
    if out_dir:
        write_star_schema(out_dir, **tables)
    return tables
