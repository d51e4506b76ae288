"""The driver checks the FIRST 50 registry entries each round; these
meta-tests pin the rotation machinery so a window typo or a forgotten
activation can't silently waste a round's correctness signal."""

from __future__ import annotations

import json
import os

from big_data_projects_spark.queries import (
    REGISTRY,
    _ALREADY_DRIVER_CHECKED,
    _ROUND3_WINDOW,
    _ROUND4_WINDOW,
    _ROUND5_WINDOW,
    _ROUND6_QUEUE,
    _ROUND6_WINDOW,
    _ROUND5_BATCH,
    _ROUND7_QUEUE,
    _ROUND7_WINDOW,
    _ROUND8_QUEUE,
    _ROUND8_WINDOW,
    _ROUND9_QUEUE,
    _ROUND9_WINDOW,
    _ROUND10_QUEUE,
    _ROUND10_WINDOW,
    _ROUND11_QUEUE,
    _ROUND11_WINDOW,
    _ROUND12_QUEUE,
    _ROUND12_WINDOW,
    _ROUND13_QUEUE,
    _ROUND13_WINDOW,
    _ROUND14_QUEUE,
    _ROUND14_WINDOW,
    _R11_DEFERRED_R05,
    _R12_DEFERRED_R06,
    _R13_DEFERRED_R07,
    _R14_DEFERRED_R08,
    _swept,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_checked() -> set[str]:
    names: set[str] = set()
    for r in range(1, 99):
        p = os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json")
        if os.path.exists(p):
            with open(p) as f:
                names |= set(json.load(f))
    return names


def test_windows_are_well_formed():
    for window in (
        _ROUND3_WINDOW, _ROUND4_WINDOW, _ROUND5_WINDOW, _ROUND6_WINDOW,
        _ROUND7_WINDOW, _ROUND8_WINDOW, _ROUND9_WINDOW, _ROUND10_WINDOW,
        _ROUND11_WINDOW, _ROUND12_WINDOW, _ROUND13_WINDOW, _ROUND14_WINDOW,
    ):
        assert len(window) == 50
        assert len(set(window)) == 50, "duplicate entry in a window"
        missing = [n for n in window if n not in REGISTRY]
        assert not missing, f"window names not registered: {missing}"


def test_active_window_is_at_the_front():
    """Derived, not enumerated (VERDICT r11 #1): compute the max swept
    round from the CORRECTNESS files actually on disk, map it through
    the SAME _WINDOW_LADDER the production rotation consumes, and pin
    the registry front.  Because both sides read one table, the driver
    committing a new CORRECTNESS file after round close can never again
    strand this test one rung behind _rotate_registry — unless no rung
    is staged for the new round, which MUST fail loudly (see the
    ladder-headroom test below)."""
    import big_data_projects_spark.queries as Q

    max_swept = max(
        (r for r in range(1, 99)
         if os.path.exists(os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json"))),
        default=0,
    )
    rungs = [(g, w) for g, w in Q._WINDOW_LADDER if g <= max_swept]
    expected = max(rungs)[1] if rungs else _ROUND3_WINDOW + Q._ROUND4_QUEUE
    assert list(REGISTRY)[:50] == expected, (
        "the driver would sweep the wrong 50 queries this round"
    )


def test_ladder_has_headroom_for_the_next_driver_commit():
    """There must always be a rung staged ONE round past the latest
    swept round: the driver commits CORRECTNESS_r{N}.json after round-N
    close, and the round-(N+1) sweep needs a pre-staged window at the
    front the moment that file lands.  If this fails, stage the next
    window + ladder rung NOW (one entry in _WINDOW_LADDER plus the
    window definition)."""
    import big_data_projects_spark.queries as Q

    max_swept = max(
        (r for r in range(1, 99)
         if os.path.exists(os.path.join(REPO, f"CORRECTNESS_r{r:02d}.json"))),
        default=0,
    )
    top_gate = max(g for g, _ in Q._WINDOW_LADDER)
    assert top_gate >= max_swept + 1, (
        f"no window staged for round {max_swept + 2}: the ladder tops out "
        f"at gate {top_gate} but CORRECTNESS_r{max_swept:02d}.json exists — "
        f"add a (gate={max_swept + 1}, window) rung before the driver "
        "commits the next CORRECTNESS file"
    )


def test_every_ladder_rung_activates_under_simulation(monkeypatch):
    """For EVERY rung in _WINDOW_LADDER, simulate the driver having
    swept exactly through that gate round and pin that the rotation
    puts that rung's window at the registry front.  Parameterized over
    the shared table, so a newly staged rung is simulated automatically
    with zero test edits.  The registry is re-rotated back to the real
    state afterward."""
    import big_data_projects_spark.queries as Q

    real = dict(REGISTRY)
    try:
        for gate, window in Q._WINDOW_LADDER:
            monkeypatch.setattr(Q, "_swept", lambda r, g=gate: r <= g)
            Q._rotate_registry()
            assert list(REGISTRY)[:50] == window, (
                f"rung gate={gate} did not activate its window"
            )
            monkeypatch.undo()
    finally:
        monkeypatch.undo()
        REGISTRY.clear()
        REGISTRY.update(real)
        Q._rotate_registry()
    assert list(REGISTRY)[:50] == list(real)[:50]


def test_round14_window_carries_the_deferred_r07_rows_and_oldest_r08():
    """The r14 window must retire the round-13 deferral: the 5 deferred
    r07 rows lead the refresh slots, and the remaining slots are
    exactly 45 of the 50 round-8 rows (the oldest after round 13
    lands), with the 5 deferred r08 entries all in bench HEADLINE
    (timed every round) and four of them scale-smoke-tracked."""
    import bench
    from tools.scale_smoke import QUERIES as SMOKE

    refreshes = [n for n in _ROUND14_WINDOW if n not in _ROUND14_QUEUE]
    assert refreshes[:5] == _R13_DEFERRED_R07
    r08 = set(_ROUND8_WINDOW)
    rest = refreshes[5:]
    assert all(n in r08 for n in rest)
    deferred_r08 = sorted(r08 - set(rest))
    assert deferred_r08 == sorted(_R14_DEFERRED_R08)
    assert all(n in bench.HEADLINE for n in deferred_r08), deferred_r08
    # Four of the five deferrals are scale-smoke-tracked; q_tpch_q6 is
    # the only one whose ambient signal is bench-HEADLINE alone.  (The
    # old `len(smoked) >= 4 or "q_tpch_q6" in deferred_r08` was
    # vacuous: the disjunct was guaranteed by the equality pin above.)
    not_smoked = set(deferred_r08) - set(SMOKE)
    assert not_smoked == {"q_tpch_q6"}, not_smoked


def test_round13_window_carries_the_deferred_r06_rows_and_oldest_r07():
    """The r13 window must retire the round-12 deferral: the 5 deferred
    r06 rows lead the refresh slots, and the remaining slots are
    exactly 45 of the 50 round-7 rows (the oldest after round 12
    lands), with the 5 deferred r07 entries all in bench HEADLINE_41
    (timed every round)."""
    import bench

    refreshes = [n for n in _ROUND13_WINDOW if n not in _ROUND13_QUEUE]
    assert refreshes[:5] == _R12_DEFERRED_R06
    r07 = set(_ROUND7_WINDOW)
    rest = refreshes[5:]
    assert all(n in r07 for n in rest)
    deferred_r07 = sorted(r07 - set(rest))
    assert deferred_r07 == sorted(_R13_DEFERRED_R07)
    assert all(n in bench.HEADLINE_41 for n in deferred_r07), deferred_r07


def test_round12_window_carries_the_deferred_r05_rows_and_oldest_r06():
    """The r12 window must retire the round-11 deferral: the 5 deferred
    r05 rows lead the refresh slots, and the remaining slots are
    exactly 45 of the 50 round-6 rows (the oldest after round 11
    lands), with the 5 deferred r06 entries all in bench HEADLINE
    (timed every round)."""
    import bench

    refreshes = [n for n in _ROUND12_WINDOW if n not in _ROUND12_QUEUE]
    assert refreshes[:5] == _R11_DEFERRED_R05
    r06 = set(_ROUND6_WINDOW)
    rest = refreshes[5:]
    assert all(n in r06 for n in rest)
    deferred_r06 = sorted(r06 - set(rest))
    assert deferred_r06 == sorted(_R12_DEFERRED_R06)
    assert all(n in bench.HEADLINE for n in deferred_r06), deferred_r06


def test_round11_window_carries_the_deferred_r04_rows_and_oldest_r05():
    """The r11 window must retire the round-10 deferral: the 4
    bench-HEADLINE_41 r04 rows lead the refresh slots, and the
    remaining slots are exactly 46 of the 50 round-5 rows (the oldest
    after round 10 lands), with the 4 deferred r05 entries all
    carrying standing alternate signal (bench HEADLINE_41 membership
    or a scale-smoke row / machinery exercised under one)."""
    import bench
    from tools.scale_smoke import QUERIES as SMOKE

    refreshes = [n for n in _ROUND11_WINDOW if n not in _ROUND11_QUEUE]
    deferred_r04 = {"q_knn_pq", "q_interpolate_linear",
                    "q_sketch_top_terms", "q_stats_moments"}
    assert set(refreshes[:4]) == deferred_r04
    assert all(n in bench.HEADLINE_41 for n in deferred_r04)
    r05 = set(_ROUND5_WINDOW)
    rest = refreshes[4:]
    assert all(n in r05 for n in rest)
    deferred_r05 = sorted(r05 - set(rest))
    assert deferred_r05 == sorted(_R11_DEFERRED_R05)
    covered_by_machinery = {
        "q_kmeans_clusters",  # kmeans_assign via HEADLINE q_cluster_purity
        "q_gopher_rules",     # rule set via HEADLINE q_stream_gopher_gate
    }
    for n in deferred_r05:
        assert (
            n in bench.HEADLINE_41
            or n in SMOKE
            or n in covered_by_machinery
        ), f"deferred r05 row without standing signal: {n}"


def test_round10_window_carries_the_deferred_r03_rows_and_oldest_r04():
    """The r10 window must retire the round-9 deferral (VERDICT r8
    "what's missing" #2): the 3 bench-covered r03 rows lead the
    refresh slots, and the remaining slots are exactly 46 of the 50
    round-4 rows (the oldest after round 9 lands), with the 4 deferred
    entries all carrying standing bench-HEADLINE signal."""
    import bench

    refreshes = [n for n in _ROUND10_WINDOW if n not in _ROUND10_QUEUE]
    deferred_r03 = {"q_bloom_filter_join", "q_interval_overlap",
                    "q_line_dedup"}
    assert set(refreshes[:3]) == deferred_r03
    r04 = set(_ROUND4_WINDOW)
    rest = refreshes[3:]
    assert all(n in r04 for n in rest)
    deferred_r04 = sorted(r04 - set(rest))
    assert len(deferred_r04) == 4
    assert all(n in bench.HEADLINE_41 for n in deferred_r04), deferred_r04


def test_round9_window_refreshes_the_oldest_rows():
    """The 47 non-queue r9 slots must be exactly 47 of the 50 round-3
    rows (the oldest after round 8 lands), with the 3 deferred entries
    all carrying standing bench-HEADLINE signal."""
    import bench

    refreshes = [n for n in _ROUND9_WINDOW if n not in _ROUND9_QUEUE]
    r03 = set(_ROUND3_WINDOW)
    assert all(n in r03 for n in refreshes)
    deferred = sorted(r03 - set(refreshes))
    assert len(deferred) == 3
    assert all(n in bench.HEADLINE_41 for n in deferred), deferred


def test_every_query_lands_under_a_driver_window():
    """Union of recorded driver rows + pre-staged windows must cover the
    registry: every query eventually gets the hard driver signal."""
    covered = (
        _driver_checked()
        | set(_ALREADY_DRIVER_CHECKED)
        | set(_ROUND3_WINDOW)
        | set(_ROUND4_WINDOW)
        | set(_ROUND5_WINDOW)
        | set(_ROUND6_QUEUE)
        | set(_ROUND5_BATCH)
        | set(_ROUND7_QUEUE)
        | set(_ROUND7_WINDOW)
        | set(_ROUND8_QUEUE)
        | set(_ROUND8_WINDOW)
        | set(_ROUND9_QUEUE)
        | set(_ROUND9_WINDOW)
        | set(_ROUND10_QUEUE)
        | set(_ROUND10_WINDOW)
        | set(_ROUND11_QUEUE)
        | set(_ROUND11_WINDOW)
        | set(_ROUND12_QUEUE)
        | set(_ROUND13_QUEUE)
        | set(_ROUND14_QUEUE)
    )
    uncovered = [n for n in REGISTRY if n not in covered]
    assert not uncovered, (
        "queries with no recorded driver row and no window slot "
        f"(extend the next round's window): {uncovered}"
    )
