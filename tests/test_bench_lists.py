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
    assert len(bench.HEADLINE) == 78  # + the 22 r5 graduates


def test_bench_summary_line_is_self_contained():
    """The driver parses the LAST stdout line; the compact summary must
    carry every total, round-trip through JSON, and agree with the full
    record it compresses."""
    import json

    timings = {n: 1.0 for n in bench.HEADLINE}
    incoming = {n: 2.0 for n in bench.INCOMING}
    full, summary = bench.build_output(timings, incoming, "/x/sf0.1")
    summary = json.loads(json.dumps(summary))
    assert summary["value"] == full["value"] == len(bench.HEADLINE) * 1.0
    assert summary["headline_41"] == 41.0
    assert summary["headline_56"] == 56.0
    assert summary["incoming_total"] == len(bench.INCOMING) * 2.0
    assert summary["n_headline"] == len(bench.HEADLINE)
    assert summary["sf"] == 0.1
    assert len(summary["top5"]) == 5
    assert all(v == 2.0 for v in summary["top5"].values())  # heaviest
    assert "queries" not in summary  # stays compact
