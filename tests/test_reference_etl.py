"""Golden-semantics tests for the reference ETL rebuild, on synthetic
reference-shaped inputs (FIXTURES.md §A): pins every observed behavior
of /root/reference/Song-Analytics-with-Spark/transform-data.py."""

from __future__ import annotations

import json

import pytest

from big_data_projects_spark.reference_etl import run_reference_etl

SONGS = [
    # artist Alpha has two songs; song "Shared Title" exists under TWO
    # song_ids (join fan-out); artist_latitude/longitude nullable
    dict(num_songs=1, artist_id="AR001", artist_latitude=10.5, artist_longitude=-3.25,
         artist_location="Springfield", artist_name="Alpha", song_id="SO001",
         title="Song A", duration=180.5, year=2010),
    dict(num_songs=1, artist_id="AR001", artist_latitude=None, artist_longitude=None,
         artist_location="Springfield", artist_name="Alpha", song_id="SO002",
         title="Shared Title", duration=200.0, year=0),
    dict(num_songs=1, artist_id="AR002", artist_latitude=None, artist_longitude=None,
         artist_location="", artist_name="Beta", song_id="SO003",
         title="Shared Title", duration=120.0, year=2015),
]

BASE_TS = 1542241826796  # 2018-11-15 UTC


def log(ts_offset_s, user, first, last, level, song, artist, page="NextSong"):
    return dict(
        artist=artist, auth="Logged In", firstName=first, gender="F",
        itemInSession=0, lastName=last, length=180.0, level=level,
        location="Springfield, USA", method="PUT", page=page,
        registration=1541033612345.0, sessionId=1, song=song, status="200",
        ts=str(BASE_TS + ts_offset_s * 1000), userAgent="UA", userId=user,
    )


LOGS = [
    # user 1: listens at BOTH levels (appears in user_level_listen,
    # twice in users dim)
    log(0, "1", "Ann", "Lee", "free", "Song A", "Alpha"),
    log(60, "1", "Ann", "Lee", "paid", "Song A", "Alpha"),
    log(120, "1", "Ann", "Lee", "paid", "Shared Title", "Alpha"),
    # user 2: free only (excluded from user_level_listen)
    log(180, "2", "Bob", "Kim", "free", "Song A", "Alpha"),
    # empty userId (filtered from the report by userId != '')
    log(240, "", "", "", "free", "Song A", "Alpha"),
    log(300, "", "", "", "paid", "Song A", "Alpha"),
    # non-NextSong rows (filtered by the page predicate)
    log(360, "1", "Ann", "Lee", "paid", None, None, page="Home"),
    log(420, "2", "Bob", "Kim", "free", None, None, page="Logout"),
]


@pytest.fixture(scope="module")
def etl(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("ref_etl")
    songs_path, logs_path = str(d / "songs.json"), str(d / "logs.json")
    with open(songs_path, "w") as f:
        f.write("\n".join(json.dumps(r) for r in SONGS))
    with open(logs_path, "w") as f:
        f.write("\n".join(json.dumps(r) for r in LOGS))
    out = str(d / "star")
    tables = run_reference_etl(spark, songs_path, logs_path, out_dir=out)
    return tables, out


def test_songs_info_dedup(etl):
    tables, _ = etl
    rows = tables["songs_info"].collect()
    assert len(rows) == 3
    assert {r.song_id for r in rows} == {"SO001", "SO002", "SO003"}


def test_artists_fillna_zero(etl):
    tables, _ = etl
    artists = {r.artist_id: r for r in tables["artists"].collect()}
    # fillna happens BEFORE dedup (transform-data.py:97-100): AR001's
    # null-coords row became (0,0) → two rows for AR001
    ar1 = [r for r in tables["artists"].collect() if r.artist_id == "AR001"]
    assert len(ar1) == 2
    assert {(r.latitude, r.longitude) for r in ar1} == {(10.5, -3.25), (0.0, 0.0)}
    assert artists["AR002"].latitude == 0.0


def test_users_level_switch_appears_twice(etl):
    tables, _ = etl
    u1 = [r for r in tables["users"].collect() if r.user_id == "1"]
    assert {r.level for r in u1} == {"free", "paid"}
    assert len(u1) == 2


def test_time_dim_utc(etl):
    tables, _ = etl
    t = {r.start_time for r in tables["time"].collect()}
    assert len(t) == 6  # 6 distinct NextSong timestamps
    one = sorted(t)[0]
    assert (one.year, one.month, one.day) == (2018, 11, 15)  # UTC, not local


def test_user_level_listen_both_levels_only(etl):
    tables, _ = etl
    rows = tables["user_level_listen"].collect()
    # only user 1 has both paid and free listens with non-empty userId
    assert len(rows) == 1
    r = rows[0]
    assert (r.full_name, r.paid_use_count, r.free_use_count) == ("Ann Lee", 2, 1)


def test_songplays_fanout_on_natural_keys(etl):
    tables, _ = etl
    sp = tables["songplays"].collect()
    # The reference joins on artist NAME and song TITLE
    # (transform-data.py:281-284). Fan-out multiplies:
    # - every listen × 2 artist rows ("Alpha" → AR001 twice, because
    #   fillna runs BEFORE dedup so (10.5,-3.25) and (0,0) both survive)
    # - the "Shared Title" listen × 2 song rows (SO002, SO003)
    # 6 listens: 5×2×1 + 1×2×2 = 14 rows — the §4 anti-pattern, pinned.
    assert len(sp) == 14
    shared = [r for r in sp if r.song_id in ("SO002", "SO003")]
    assert len(shared) == 4
    # surrogate keys unique
    assert len({r.num for r in sp}) == len(sp)


def test_star_schema_sink_partitioned(etl, spark):
    import os

    _, out = etl
    # hive-style layout: songs_info by year; songplays by year,month
    years = os.listdir(f"{out}/songs_info.parquet")
    assert any(p.startswith("year=") for p in years)
    sp_parts = os.listdir(f"{out}/songplays.parquet")
    assert any(p.startswith("year=2018") for p in sp_parts)
    back = spark.read.parquet(f"{out}/songplays.parquet")
    assert back.count() == 14


def test_cached_listens_resident_in_memory(spark, etl):
    """C1+C2 parity (transform-data.py:235,241,247-248): the cleaned
    listens relation is cache()d and, after an action has materialized
    it, its storage level reports memory use — the reference's only
    'performance verification'. We assert the same introspection on the
    one cached relation in the rebuilt ETL."""
    cached = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    assert len(cached) >= 1, "no cached RDDs after the ETL ran"
    assert any(info.memSize() > 0 for info in cached), (
        "cached relation not memory-resident"
    )


def test_storage_level_introspection_api(spark):
    """C2 via the public df.storageLevel surface (the exact check a
    reference user ports): uncached → useMemory False; after cache()
    + action → useMemory True (MEMORY_AND_DISK default), and False
    again after unpersist()."""
    import json as _json

    from big_data_projects_spark.reference_etl import (
        LOGS_SCHEMA,
        process_logs,
        storage_info,
    )

    logs = spark.read.schema(LOGS_SCHEMA).json(
        spark.sparkContext.parallelize([_json.dumps(r) for r in LOGS])
    )
    listens = process_logs(logs)
    assert storage_info(listens)["useMemory"] is False

    listens = listens.cache()
    listens.count()  # materialize the cache
    info = storage_info(listens)
    assert info["useMemory"] is True
    assert info["useDisk"] is True  # cache() default MEMORY_AND_DISK
    listens.unpersist(blocking=True)
    assert storage_info(listens)["useMemory"] is False
