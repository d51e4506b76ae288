"""Meta-guard for bench.py's query lists: a renamed or dropped registry
entry must fail HERE, not at the driver's per-round bench run (which
would silently cost a round of the only independent perf signal)."""

from __future__ import annotations

import bench
from big_data_projects_spark.queries import REGISTRY


def test_bench_names_are_registered():
    missing = [
        n for n in bench.HEADLINE + bench.INCOMING if n not in REGISTRY
    ]
    assert not missing, f"bench names not in registry: {missing}"


def test_bench_lists_are_disjoint_and_unique():
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)
    assert len(set(bench.INCOMING)) == len(bench.INCOMING)
    assert not set(bench.HEADLINE) & set(bench.INCOMING)


def test_headline_41_is_a_prefix_of_headline():
    """The like-for-like subtotal must keep measuring the same 41
    queries, in place, as later batches graduate."""
    assert len(bench.HEADLINE_41) == 41
    assert bench.HEADLINE[: len(bench.HEADLINE_41)] == bench.HEADLINE_41


def test_headline_56_is_a_prefix_of_headline():
    """Same contract for the round-6 era: headline_41 + the r4
    graduates stay in place as the r5 batch (and later) graduate."""
    era56 = bench.HEADLINE_41 + bench.GRADUATED_R4
    assert len(era56) == 56
    assert bench.HEADLINE[: len(era56)] == era56


def test_headline_78_is_a_prefix_of_headline():
    """Round-8 era: headline_41 + r4 + r5 graduates stay in place as
    the r6 batch (and later) graduate."""
    era78 = bench.HEADLINE_41 + bench.GRADUATED_R4 + bench.GRADUATED_R5
    assert len(era78) == 78
    assert bench.HEADLINE[: len(era78)] == era78


def test_headline_94_is_a_prefix_of_headline():
    """Round-9 era: headline_41 + r4 + r5 + r6 graduates stay in place
    as the r7 batch (and later) graduate."""
    era94 = (
        bench.HEADLINE_41
        + bench.GRADUATED_R4
        + bench.GRADUATED_R5
        + bench.GRADUATED_R6
    )
    assert len(era94) == 94
    assert bench.HEADLINE[: len(era94)] == era94


def test_headline_95_is_a_prefix_of_headline():
    """Round-10 era: headline_41 + r4 + r5 + r6 + r7 graduates stay in
    place as the r8 batch (and later) graduate."""
    era95 = (
        bench.HEADLINE_41
        + bench.GRADUATED_R4
        + bench.GRADUATED_R5
        + bench.GRADUATED_R6
        + bench.GRADUATED_R7
    )
    assert len(era95) == 95
    assert bench.HEADLINE[: len(era95)] == era95
    assert len(bench.HEADLINE) == 97  # + the two r8 graduates


def test_bench_summary_line_is_self_contained():
    """The driver parses the LAST stdout line; the compact summary must
    carry every total, round-trip through JSON, and agree with the full
    record it compresses."""
    import json

    timings = {n: 1.0 for n in bench.HEADLINE}
    incoming = {n: 2.0 for n in bench.INCOMING}
    spreads = {n: 1.1 for n in bench.HEADLINE + bench.INCOMING}
    spreads[bench.HEADLINE[0]] = 2.0  # one noisy query
    medians = {n: 1.5 for n in bench.HEADLINE + bench.INCOMING}
    env = {"load_start": [1.0, 1.0, 1.0], "cpus": 32}
    full, summary = bench.build_output(
        timings, incoming, "/x/sf0.1", spreads, env, medians
    )
    summary = json.loads(json.dumps(summary))
    assert summary["value"] == full["value"] == len(bench.HEADLINE) * 1.0
    assert summary["headline_41"] == 41.0
    assert summary["headline_56"] == 56.0
    assert summary["headline_78"] == 78.0
    assert summary["headline_94"] == 94.0
    assert summary["headline_95"] == 95.0
    # Median series (ADVICE r8 #1): pass-1 median-of-3 per query rides
    # in the full line; the like-for-like 41-query median subtotal
    # rides in BOTH lines so the r1-r7 median history stays comparable.
    assert full["queries_median"] == medians
    assert summary["headline_41_median"] == full["headline_41_median"] == 61.5
    assert summary["incoming_total"] == len(bench.INCOMING) * 2.0
    assert summary["n_headline"] == len(bench.HEADLINE)
    assert summary["sf"] == 0.1
    assert len(full["top5"]) == 5
    assert max(full["top5"].values()) == 2.0  # incoming heaviest
    assert "queries" not in summary  # merged in by pack_summary_queries
    # Self-adjudication fields survive in BOTH lines (the driver's tail
    # capture may truncate the full line — VERDICT r7 item #2).
    for rec in (full, summary):
        assert rec["estimator"] == "min_of_3_plus_pass2_allcols"
        assert rec["noise_median_ratio"] == 1.1
        assert rec["env"]["load_start"] == [1.0, 1.0, 1.0]
    assert full["noisy_queries"] == {bench.HEADLINE[0]: 2.0}
    assert summary["n_noisy"] == 1


def test_summary_line_carries_per_query_map_within_parse_window():
    """VERDICT r12 item #1: the driver parses the LAST stdout line of a
    2000-char tail capture (BENCH_r05.json's lone truncated line is the
    empirical proof of the window), and PERF needs per-query timings in
    that parsed record.  All 99 names cannot fit (1529 chars of names
    alone), so the packed summary must (a) stay under the hard budget,
    (b) include the MOST EXPENSIVE queries first, and (c) label the
    omitted tail by count and summed seconds so the total reconciles."""
    import json

    timings = {n: 1.0 for n in bench.HEADLINE}
    incoming = {n: 2.0 for n in bench.INCOMING}
    # make a few queries expensive so priority order is observable
    timings[bench.HEADLINE[0]] = 9.5
    timings[bench.HEADLINE[1]] = 7.25
    spreads = {n: 1.1 for n in bench.HEADLINE + bench.INCOMING}
    medians = {n: 1.5 for n in bench.HEADLINE + bench.INCOMING}
    env = {
        "load_start": [1.0, 1.0, 1.0],
        "load_end": [1.0, 1.0, 1.0],
        "cached_kb_start": 1,
        "cached_kb_end": 2,
        "cpus": 32,
        "pass2_gain_sec": 0.0,
        "pass2_improved": 0,
        "pass2_skipped": 0,
        "pass2_skipped_names": [],
        "wall_sec": 1200.0,
    }
    full, summary = bench.build_output(
        timings, incoming, "/x/sf0.1", spreads, env, medians
    )
    packed = bench.pack_summary_queries(summary, {**timings, **incoming})
    line = json.dumps(packed, separators=(",", ":"))
    assert len(line) <= bench.SUMMARY_LINE_BUDGET
    rt = json.loads(line)  # round-trips
    # the heavy queries made it in, at 2-decimal values
    assert rt["queries"][bench.HEADLINE[0]] == 9.5
    assert rt["queries"][bench.HEADLINE[1]] == 7.25
    for n in bench.INCOMING:  # 2.0s incoming beat the 1.0s crowd
        assert rt["queries"][n] == 2.0
    # substantial coverage, honest omission labeling, reconciling total
    assert len(rt["queries"]) >= 40
    assert rt["n_omitted"] == len(timings) + len(incoming) - len(rt["queries"])
    omitted = set(timings) | set(incoming) - set(rt["queries"])
    assert rt["omitted_total"] == round(
        sum(v for n, v in {**timings, **incoming}.items()
            if n not in rt["queries"]), 2)
    assert round(rt["value"] + rt["incoming_total"], 2) == round(
        sum(rt["queries"].values()) + rt["omitted_total"], 2
    )
    # totals and adjudication fields still ride along
    assert rt["value"] == full["value"]
    assert rt["headline_41"] == full["headline_41"]
    assert rt["noise_median_ratio"] == 1.1
    assert rt["env"]["load_start"] == [1.0, 1.0, 1.0]
    assert rt["env"]["cpus"] == 32
    # summary vs_baseline compresses the watch/alarm maps to counts;
    # the full record keeps the named lists
    if isinstance(rt.get("vs_baseline"), dict) and "median_ratio" in rt["vs_baseline"]:
        assert "n_over_1_25" in rt["vs_baseline"]
        assert "over_1_25" in full["vs_baseline"]


def test_pack_summary_queries_budget_is_exact():
    """The budget check re-serializes after every add, so a crowd of
    long names cannot overshoot by even one char."""
    import json

    base = {"metric": "m", "value": 1.0, "unit": "sec", "sf": 0.1}
    qmap = {f"q_{'x' * 40}_{i:03d}": float(i) for i in range(200)}
    packed = bench.pack_summary_queries(base, qmap, budget=900)
    line = json.dumps(packed, separators=(",", ":"))
    assert len(line) <= 900
    assert 0 < len(packed["queries"]) < 200
    assert packed["n_omitted"] == 200 - len(packed["queries"])
    # descending-cost priority: the most expensive query is present
    assert f"q_{'x' * 40}_199" in packed["queries"]


def test_build_output_defaults_without_instrumentation():
    """build_output stays callable without spreads/env (unit callers,
    older tooling): adjudication fields degrade to None/empty."""
    full, summary = bench.build_output(
        {n: 1.0 for n in bench.HEADLINE}, {}, "/x/sf0.01"
    )
    assert full["noise_median_ratio"] is None
    assert full["noisy_queries"] == {}
    assert full["queries_median"] == {}
    assert full["headline_41_median"] is None
    assert summary["env"] is None
    assert summary["sf"] == 0.01


def test_spreads_are_denominated_in_the_final_min():
    """VERDICT r9 item #3 unit pin: the noise/spread record derives
    from ALL samples (pass 1 + pass 2), so a pass-2-improved query's
    ratio uses the FINAL reported min as its denominator — the fields
    can never disagree with the reported timing."""
    all_runs = {
        "qa": [4.0, 4.0, 4.0, 1.0],  # pass 2 improved the min 4x
        "qb": [2.0, 2.0, 2.0],       # quiet query, no pass-2 gain
    }
    spreads = bench.compute_spreads(all_runs)
    assert spreads["qa"] == 4.0  # max 4.0 / FINAL min 1.0 — not 4/4
    assert spreads["qb"] == 1.0


def test_baseline_current_record_shape_and_provenance():
    """The consolidated reference (VERDICT r9 item #2) must carry one
    {min, median} row per benched query (headline + incoming), the
    estimator string (so a future estimator change can't be compared
    across eras silently), and the generating run's env fields."""
    timings = {n: 1.0 for n in bench.HEADLINE}
    incoming = {n: 2.0 for n in bench.INCOMING}
    medians = {n: 1.5 for n in bench.HEADLINE + bench.INCOMING}
    env = {"load_start": [1.0, 1.0, 1.0], "cpus": 32}
    full, _ = bench.build_output(
        timings, incoming, "/x/sf0.1", {}, env, medians
    )
    rec = bench.baseline_current_record(full)
    assert rec["estimator"] == "min_of_3_plus_pass2_allcols"
    assert rec["sf"] == 0.1
    assert rec["env"]["cpus"] == 32
    assert set(rec["queries"]) == set(bench.HEADLINE) | set(bench.INCOMING)
    assert rec["queries"][bench.HEADLINE[0]] == {"min": 1.0, "median": 1.5}
    assert rec["queries"][bench.INCOMING[0]] == {"min": 2.0, "median": 1.5}


def test_committed_baseline_current_covers_the_headline():
    """BASELINE_CURRENT.json (the committed consolidated reference) must
    stay diffable against the live bench lists: every HEADLINE query
    has a reference row, and every reference row is a benched query —
    newly-registered INCOMING entries may lag until the next idle
    regeneration, but a graduated or renamed query must fail HERE."""
    import json
    import os

    path = os.path.join(os.path.dirname(bench.__file__), "BASELINE_CURRENT.json")
    with open(path) as f:
        rec = json.load(f)
    assert rec["estimator"] == "min_of_3_plus_pass2_allcols"
    keys = set(rec["queries"])
    assert set(bench.HEADLINE) <= keys, (
        f"headline queries without a reference row: "
        f"{sorted(set(bench.HEADLINE) - keys)}"
    )
    allowed = set(bench.HEADLINE) | set(bench.INCOMING)
    assert keys <= allowed, (
        f"stale reference rows (renamed/dropped queries): "
        f"{sorted(keys - allowed)}"
    )
    for row in rec["queries"].values():
        assert row["min"] > 0


def test_pass2_budget_skips_are_enumerated_by_name():
    """VERDICT r8 "what's wrong" #1: when the pass-2 wall budget is
    exhausted, the skipped queries must be enumerable BY NAME in the
    artifact — a future loaded run can't silently degrade the
    estimator unlabeled.  Also pins the estimator semantics: a pass-2
    sample below the pass-1 min counts as improvement mass, and every
    taken sample lands in the run record (so the final spread ratio is
    denominated in the final min — ADVICE r8 #3)."""
    names = ["qa", "qb", "qc", "qd"]
    all_runs = {n: [2.0, 3.0, 4.0] for n in names}
    calls = {"n": 0}

    def over_budget():
        return calls["n"] >= 2  # budget dies after two pass-2 runs

    def run_once(name):
        calls["n"] += 1
        return 1.0 if name == "qa" else 5.0

    gain, improved, skipped = bench.run_pass2(
        names, all_runs, run_once, over_budget
    )
    assert skipped == ["qc", "qd"]  # enumerated, in order
    assert improved == 1 and gain == 1.0  # qa: 2.0 -> 1.0
    assert all_runs["qa"] == [2.0, 3.0, 4.0, 1.0]  # sample recorded
    assert all_runs["qb"] == [2.0, 3.0, 4.0, 5.0]  # slower run too
    assert all_runs["qc"] == [2.0, 3.0, 4.0]  # skipped: untouched


def test_vs_baseline_adjudication_fields(tmp_path):
    """VERDICT r10 #2: every bench line self-adjudicates against the
    committed idle reference — median ratio + over-1.25x watch list +
    over-2x alarm list, emitted in BOTH the full and summary lines."""
    import json

    ref = {
        "queries": {
            "a": {"min": 1.0, "median": 1.2},
            "b": {"min": 2.0, "median": 2.2},
            "c": {"min": 4.0, "median": 4.4},
        }
    }
    p = tmp_path / "BASELINE_CURRENT.json"
    p.write_text(json.dumps(ref))
    out = bench._vs_baseline_current(
        {"a": 1.0, "b": 3.0, "c": 9.0, "unknown": 5.0}, path=str(p)
    )
    assert out["n_compared"] == 3  # unknown has no reference row
    assert out["median_ratio"] == 1.5
    assert out["over_1_25"] == {"c": 2.25, "b": 1.5}  # worst first
    assert out["over_2"] == {"c": 2.25}
    # absent reference -> None (older trees, unit callers)
    assert bench._vs_baseline_current({"a": 1.0}, path=str(tmp_path / "nope")) is None
    # cross-SF run -> a TAGGED skip, not None (r12: a bare None read
    # as "no reference committed" and invited a baseline regeneration)
    ref_sf = dict(ref, sf=0.1)
    p.write_text(json.dumps(ref_sf))
    out = bench._vs_baseline_current({"a": 1.0}, sf_val=0.001, path=str(p))
    assert set(out) == {"skipped"} and "sf" in out["skipped"]
    out = bench._vs_baseline_current({"a": 1.0}, sf_val="sfdev", path=str(p))
    assert set(out) == {"skipped"}  # unparseable dir suffix, same tag
    # matching SF still adjudicates
    out = bench._vs_baseline_current({"a": 1.0}, sf_val=0.1, path=str(p))
    assert out["n_compared"] == 1
    # the real build_output path wires it against the committed file
    full, summary = bench.build_output(
        {n: 0.001 for n in bench.HEADLINE}, {}, "/x/sf0.1"
    )
    for rec in (full, summary):
        assert rec["vs_baseline"]["n_compared"] > 90
    assert full["vs_baseline"]["over_2"] == {}
    # summary carries the compressed counts form (r13)
    assert summary["vs_baseline"]["n_over_2"] == 0
