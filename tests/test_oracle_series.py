"""Differential-oracle tests for the time-series + sketch family."""

from __future__ import annotations

import pytest

from big_data_projects_spark.queries import REGISTRY
from tests.oracle_utils import compare_query, suite_queries

SERIES_QUERIES = suite_queries("series")


def test_family_is_registered():
    # q_scalar_iter_udf moved to the olap suite under the disjoint
    # ownership map (it matches olap's q_scalar_ prefix first).
    assert len(SERIES_QUERIES) == 23, SERIES_QUERIES


@pytest.mark.parametrize("name", SERIES_QUERIES)
def test_oracle_match(spark, name):
    assert compare_query(spark, name) >= 0
