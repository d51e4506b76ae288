"""Differential-oracle tests for the core (reference-parity) queries —
the same check the driver performs, run locally at sf0.01."""

from __future__ import annotations

import pytest

from big_data_projects_spark.queries import REGISTRY
from tests.oracle_utils import compare_query

CORE_ORACLE_QUERIES = sorted(
    n for n, q in REGISTRY.items()
    if q.oracle is not None and not n.startswith((
        "q_dedup_", "q_knn", "q_text", "q_lang", "q_token", "q_doc_",
        "q_simhash", "q_multimodal", "q_stream", "q_ngram",
        # covered by tests/test_oracle_tpch_expr.py
        "q_tpch_", "q_json_", "q_explode_", "q_grouping_", "q_date_arith",
        "q_string_funcs", "q_range_join", "q_ntile_", "q_array_ops",
        "q_max_by",
    ))
)


@pytest.mark.parametrize("name", CORE_ORACLE_QUERIES)
def test_oracle_match(spark, name):
    n = compare_query(spark, name)
    assert n >= 0


def test_rows_only_queries_run(spark):
    for name, q in REGISTRY.items():
        if q.oracle is None:
            df = q.spark(spark, "/root/testdata/sf0.001")
            assert df.count() >= 0, name
