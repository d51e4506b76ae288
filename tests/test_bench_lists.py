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
    assert len(bench.HEADLINE) == 94  # + the 16 r6 graduates


def test_bench_summary_line_is_self_contained():
    """The driver parses the LAST stdout line; the compact summary must
    carry every total, round-trip through JSON, and agree with the full
    record it compresses."""
    import json

    timings = {n: 1.0 for n in bench.HEADLINE}
    incoming = {n: 2.0 for n in bench.INCOMING}
    spreads = {n: 1.1 for n in bench.HEADLINE + bench.INCOMING}
    spreads[bench.HEADLINE[0]] = 2.0  # one noisy query
    env = {"load_start": [1.0, 1.0, 1.0], "cpus": 32}
    full, summary = bench.build_output(
        timings, incoming, "/x/sf0.1", spreads, env
    )
    summary = json.loads(json.dumps(summary))
    assert summary["value"] == full["value"] == len(bench.HEADLINE) * 1.0
    assert summary["headline_41"] == 41.0
    assert summary["headline_56"] == 56.0
    assert summary["headline_78"] == 78.0
    assert summary["incoming_total"] == len(bench.INCOMING) * 2.0
    assert summary["n_headline"] == len(bench.HEADLINE)
    assert summary["sf"] == 0.1
    assert len(summary["top5"]) == 5
    assert max(summary["top5"].values()) == 2.0  # incoming heaviest
    assert "queries" not in summary  # stays compact
    # Self-adjudication fields survive in BOTH lines (the driver's tail
    # capture may truncate the full line — VERDICT r7 item #2).
    for rec in (full, summary):
        assert rec["estimator"] == "min_of_3_plus_pass2"
        assert rec["noise_median_ratio"] == 1.1
        assert rec["env"]["load_start"] == [1.0, 1.0, 1.0]
    assert full["noisy_queries"] == {bench.HEADLINE[0]: 2.0}
    assert summary["n_noisy"] == 1


def test_build_output_defaults_without_instrumentation():
    """build_output stays callable without spreads/env (unit callers,
    older tooling): adjudication fields degrade to None/empty."""
    full, summary = bench.build_output(
        {n: 1.0 for n in bench.HEADLINE}, {}, "/x/sf0.01"
    )
    assert full["noise_median_ratio"] is None
    assert full["noisy_queries"] == {}
    assert summary["env"] is None
    assert summary["sf"] == 0.01
