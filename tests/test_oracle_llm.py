"""Differential-oracle tests for the LLM-pipeline + streaming queries."""

from __future__ import annotations

import pytest

from big_data_projects_spark.queries import REGISTRY
from tests.oracle_utils import compare_query, suite_queries

LLM_ORACLE_QUERIES = suite_queries("llm")


@pytest.mark.parametrize("name", LLM_ORACLE_QUERIES)
def test_oracle_match(spark, name):
    assert compare_query(spark, name) >= 0
