"""Differential-oracle tests for the time-series + sketch family."""

from __future__ import annotations

import pytest

from big_data_projects_spark.queries import REGISTRY
from tests.oracle_utils import compare_query

SERIES_QUERIES = sorted(
    n for n, q in REGISTRY.items()
    if q.oracle is not None
    and n.startswith(("q_interpolate_", "q_ewma", "q_event_transitions",
                      "q_mad_", "q_trend_", "q_hll_", "q_sketch_",
                      "q_dup_span", "q_ohlc_", "q_parameterized_",
                      "q_sql_variables", "q_sql_scripting", "q_sql_udf",
                      "q_scalar_iter_udf", "q_map_in_arrow",
                      "q_pandas_api_", "q_drift_", "q_approx_", "q_feature_store_", "q_cdc_", "q_profile_", "q_shard_", "q_codec_"))
)


def test_family_is_registered():
    assert len(SERIES_QUERIES) == 24, SERIES_QUERIES


@pytest.mark.parametrize("name", SERIES_QUERIES)
def test_oracle_match(spark, name):
    assert compare_query(spark, name) >= 0
