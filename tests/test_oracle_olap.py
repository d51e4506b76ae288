"""Differential-oracle tests for the OLAP-surface queries."""

from __future__ import annotations

import pytest

from big_data_projects_spark.queries import REGISTRY
from tests.oracle_utils import compare_query

OLAP_QUERIES = sorted(
    n for n, q in REGISTRY.items()
    if q.oracle is not None
    and n.startswith(("q_join_left", "q_join_semi", "q_join_anti", "q_set_",
                      "q_rollup", "q_cube", "q_pivot", "q_window_",
                      "q_having", "q_scalar_", "q_case_", "q_distinct_",
                      "q_median", "q_rolling_", "q_quantiles", "q_gapfill",
                      "q_union_by", "q_nullsafe", "q_scd2", "q_histogram",
                      "q_string_agg", "q_grouping_id", "q_bitwise",
                      "q_merge", "q_incremental"))
)


@pytest.mark.parametrize("name", OLAP_QUERIES)
def test_oracle_match(spark, name):
    assert compare_query(spark, name) >= 0
