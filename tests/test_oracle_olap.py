"""Differential-oracle tests for the OLAP-surface queries."""

from __future__ import annotations

import pytest

from big_data_projects_spark.queries import REGISTRY
from tests.oracle_utils import compare_query, suite_queries

OLAP_QUERIES = suite_queries("olap")


@pytest.mark.parametrize("name", OLAP_QUERIES)
def test_oracle_match(spark, name):
    assert compare_query(spark, name) >= 0
