"""Differential-oracle tests for the TPC-H-shaped and
expression-family queries (queries_tpch.py, queries_expr.py)."""

from __future__ import annotations

import pytest

from big_data_projects_spark.queries import REGISTRY
from tests.oracle_utils import compare_query, suite_queries

NAMES = suite_queries("tpch_expr")


def test_all_registered():
    # q_tpch_q1 predates this module; 6 more TPC-H shapes + 9 families.
    assert len(NAMES) >= 15


@pytest.mark.parametrize("name", NAMES)
def test_oracle_match(spark, name):
    assert compare_query(spark, name) >= 0
