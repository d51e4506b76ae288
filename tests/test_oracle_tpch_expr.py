"""Differential-oracle tests for the TPC-H-shaped and
expression-family queries (queries_tpch.py, queries_expr.py)."""

from __future__ import annotations

import pytest

from big_data_projects_spark.queries import REGISTRY
from tests.oracle_utils import compare_query

NAMES = sorted(
    n for n, q in REGISTRY.items()
    if q.oracle is not None
    and n.startswith(
        ("q_tpch_", "q_json_", "q_explode_", "q_grouping_", "q_date_arith",
         "q_string_funcs", "q_range_join", "q_ntile_", "q_array_ops",
         "q_max_by", "q_map_ops")
    )
)


def test_all_registered():
    # q_tpch_q1 predates this module; 6 more TPC-H shapes + 9 families.
    assert len(NAMES) >= 15


@pytest.mark.parametrize("name", NAMES)
def test_oracle_match(spark, name):
    assert compare_query(spark, name) >= 0
