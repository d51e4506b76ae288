"""Differential-oracle tests for the core (reference-parity) queries —
the same check the driver performs, run locally at sf0.01."""

from __future__ import annotations

import pytest

from big_data_projects_spark.queries import REGISTRY
from tests.oracle_utils import compare_query, suite_queries

# Residual suite: every oracle-backed query not owned by a family module
# (tests/oracle_utils.py ownership map — disjoint by construction).
CORE_ORACLE_QUERIES = suite_queries("core")


@pytest.mark.parametrize("name", CORE_ORACLE_QUERIES)
def test_oracle_match(spark, name):
    n = compare_query(spark, name)
    assert n >= 0


def test_rows_only_queries_run(spark):
    for name, q in REGISTRY.items():
        if q.oracle is None:
            df = q.spark(spark, "/root/testdata/sf0.001")
            assert df.count() >= 0, name
