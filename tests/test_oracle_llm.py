"""Differential-oracle tests for the LLM-pipeline + streaming queries."""

from __future__ import annotations

import pytest

from big_data_projects_spark.queries import REGISTRY
from tests.oracle_utils import compare_query

LLM_ORACLE_QUERIES = sorted(
    n for n, q in REGISTRY.items()
    if q.oracle is not None
    and n.startswith(("q_dedup", "q_knn", "q_text", "q_lang", "q_token",
                      "q_doc_", "q_simhash", "q_multimodal", "q_stream",
                      "q_ngram", "q_embed", "q_tfidf", "q_pipeline",
                      "q_hash_", "q_data_quality", "q_rank_",
                      # round-5 curation family (queries_curation.py)
                      "q_dsir", "q_char_entropy", "q_trigram",
                      "q_pca_", "q_bt_", "q_rouge", "q_span_corruption",
                      "q_zipf", "q_lsh_", "q_minhash_", "q_length_kl",
                      "q_tokenizer_", "q_quality_calibration",
                      "q_quality_lr_train", "q_filter_ablation",
                      "q_dedup_survivor_bias", "q_split_",
                      "q_lang_confusion", "q_graph_",
                      # round-6 eval/provenance/label-QA family
                      "q_pass_at_k", "q_cross_source_",
                      "q_annotator_", "q_ivf_"))
)


@pytest.mark.parametrize("name", LLM_ORACLE_QUERIES)
def test_oracle_match(spark, name):
    assert compare_query(spark, name) >= 0
