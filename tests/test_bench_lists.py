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
