"""Scale-factor robustness: the oracle suite runs at sf0.01 (the
driver's scale); this sweep re-checks one representative per family at
sf0.001 so an oracle or builder that silently bakes in a row count,
panel size, shard constant, or data-dependent literal fails here
instead of surviving until the data changes."""

from __future__ import annotations

import pytest

from tests.oracle_utils import compare_query

SF_SMALL = "/root/testdata/sf0.001"

# One representative per family — chosen for having internal constants
# that COULD have been tuned to sf0.01 (panels, shards, caps, buckets).
REPRESENTATIVES = [
    "q_tpch_q1",                # reference OLAP
    "q_flagship_star_rollup",   # composed star pipeline
    "q_quality_percentile",     # sharded prefix-sum (32-shard constant)
    "q_dedup_minhash_lsh",      # banded LSH (64 perms, 32 bands)
    "q_knn_pq",                 # PQ training (PQ_K seeds, ADC cut)
    "q_ann_recall",             # fixed query panel (vec_id % 25)
    "q_matryoshka_recall",      # truncation panel
    "q_kn_bigram_ppl",          # count-table LM
    "q_bpe_train",              # 8-round iterative trainer
    "q_bpe_encode",             # trained-merge application
    "q_pipeline_ccnet",         # per-lang terciles (lang min-rank bases)
    "q_dataset_report",         # per-source rollup
    "q_preference_pairs",       # per-group argmax/argmin
    "q_negative_sampling",      # damped-unigram distribution
    "q_multimodal_dhash",       # byte-signature buckets
    "q_stream_bloom_dedup",     # bitmask gate (B=4096 positions)
    "q_stream_cdc_apply",       # streaming max-of-struct state
    "q_semdedup",               # k = max(8, n//64) sizing rule
    "q_hll_uniques",            # sketch error-bound boolean
    "q_interpolate_linear",     # per-group spine generation
    # round-6 additions
    "q_pass_at_k",              # 25-problem panel; n >= k filter can
    #                             empty a k-sweep at tiny SF (NULL mean
    #                             must match NULL, not crash)
    "q_cross_source_leakage",   # df-cap constant + source matrix
    "q_annotator_agreement",    # fixed rater thresholds (40 / 220)
    "q_ivf_probe_recall",       # 20-query panel + probe sweep vs a
    #                             10-label clustering at any SF
    "q_dedup_threshold_sweep",  # sweep constants vs tiny pair sets
    "q_quality_lr_train",       # 4x4 Gram solve must stay non-singular
    #                             (and the Cramer doubles must agree)
    #                             on a different corpus
    "q_filter_ablation",        # 16-cell funnel: empty cells must
    #                             stay consistently absent, not NULL
    "q_dedup_survivor_bias",    # pair-drop vs a different dup graph;
    #                             all-survivor sources keep exact 0s
    "q_split_leakage",          # split masses and the one-hop rep map
    #                             vs a different dup graph; both rules
    #                             must conserve total pair count
    "q_encoding_audit",         # md5 damage-injection shares must stay
    #                             strictly interior at any corpus size
    "q_sft_turn_audit",         # turn materialization + exists audit
    #                             vs different doc-length distribution
    "q_vocab_growth",           # rank/cumsum self-joins and first-source
    #                             attribution vs a different source mix
    "q_code_switch_audit",      # per-window lang-id transforms + md5
    #                             injection shares vs a different corpus
    # round-8 additions
    "q_dedup_merge_ingest",     # md5 d/e/f batch split + LSH verify +
    #                             verdict precedence vs a different
    #                             dup graph (batch share must not bake
    #                             in a corpus size)
    "q_tokenizer_roundtrip",    # trained-merge decode identity vs a
    #                             different vocab (merge trajectory
    #                             changes with the corpus)
    # round-9 addition
    "q_ivf_merge_ingest",       # frozen-centroid routing + verdicts vs
    #                             a different corpus/batch split (cell
    #                             means, probe ranking, and verdict mix
    #                             must not bake in a corpus size)
    # round-10 addition
    "q_stream_ivf_gate",        # streaming twin: frozen index + in-row
    #                             routing + stream-static candidates vs
    #                             a different corpus (drain + verify
    #                             must not bake in a batch size)
]


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_oracle_match_at_small_sf(spark, name):
    assert compare_query(spark, name, sf_dir=SF_SMALL) >= 0
