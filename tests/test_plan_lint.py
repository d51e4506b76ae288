"""Plan linter: every registered batch query's physical plan is swept
for the anti-patterns that kill a 1000-executor run. The hand-written
assertions in test_plans.py pin specific shapes; this test guarantees
no NEW query regresses the global invariants.

Invariants:
- no CartesianProduct anywhere (a cross join that isn't a broadcast
  nested loop of a 1-row scalar is always a bug at scale);
- no Python evaluation (Batch/ArrowEvalPython) outside the sanctioned
  Python-stage operators (multimodal featurizers, stateful streaming);
- no single-partition exchange whose consumer is data-scale work
  (Window/Sort over raw rows). A single-partition exchange feeding a
  FINAL aggregate merge is fine — only one partial row per partition
  crosses it — as is the whitelisted surrogate-key window over an
  already-aggregated, provably small result.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from big_data_projects_spark.queries import REGISTRY

SF = "/root/testdata/sf0.01"

# Builders that start real jobs / write side outputs — their *final*
# read-back plans are trivial; linting would execute the side effect.
SIDE_EFFECTING = {
    "q_sink_parquet_partitioned", "q_sink_csv_roundtrip",
    "q_sink_orc_roundtrip", "q_ctas_insert", "q_sink_json_roundtrip",
    "q_bucketed_join", "q_scan_json_schema", "q_scan_json_corrupt",
    "q_compaction", "q_multimodal_resize", "q_multimodal_frames",
    "q_scan_text_lines", "q_scan_binaryfile", "q_zorder_layout",
    "q_range_sharded_write", "q_scan_merge_schema", "q_dpp_join",
    "q_scan_csv_corrupt", "q_scan_xml", "q_codec_tradeoff",
}

# Surrogate-key windows documented to run over post-aggregation results
# (dozens of rows): a single-partition exchange there is free, and it is
# exactly the reference-intent semantics (SURVEY.md §2.5).
SINGLE_PARTITION_OK = {
    "q_flagship_star_rollup", "q_row_number", "q_mono_id",
    # distributed prefix-sum: its global-offset window runs over the
    # per-shard totals (|docs|/PACK_SHARD rows, already aggregated) —
    # the data-scale cumsum is partitioned by shard.
    "q_sequence_packing",
    # same sharded-prefix-sum shape: the only single-partition window
    # is over the 32-row shard-totals relation; per-doc ranks are
    # shard-partitioned windows.
    "q_quality_percentile",
    # operators.relational.sharded_row_number — identical shape: the
    # single-partition window consumes the n_shards-row totals relation.
    "q_vocab_build", "q_global_shuffle", "q_length_batching",
    # per-language tercile rank via ONE global sharded_row_number
    # (naive per-lang windows would be ~6 giant partitions): same
    # 32-row shard-totals single-partition window as above.
    "q_pipeline_ccnet",
    # load-factor normalization: the only single-partition window is
    # the total over the N_SHARDS-row (8-row) per-shard counts — the
    # per-doc routing itself is a broadcast-array lambda, no window.
    "q_shard_assignment",
}

# Sanctioned Python stages (Arrow-batched by design).
# q_udtf_spans exists to pin the Spark 4 Python UDTF API surface
# (Arrow-batched; the built-ins twin q_doc_chunking is the hot path).
PYTHON_OK = {
    "q_multimodal_features", "q_user_gap_features", "q_udtf_spans",
    # the two-table grouped-map API (cogroup + applyInPandas) — the
    # oracle's full-outer-join restatement keeps the Python path checked
    "q_cogroup_stats", "q_multimodal_decode",
    # iterator pandas UDF (amortized per-task init) and the RecordBatch-
    # level mapInArrow hop — both exist to pin Python-boundary APIs;
    # their built-ins twins are the hot paths.
    "q_scalar_iter_udf", "q_map_in_arrow",
    # grouped-map Arrow boundary (one pyarrow Table per key) — completes
    # the Python-boundary matrix; built-ins twin is the plain groupBy.
    "q_apply_in_arrow",
}

LINTABLE = sorted(
    n for n in REGISTRY
    if not n.startswith("q_stream_") and n not in SIDE_EFFECTING
)


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].spark(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


# Consumers for which a single-partition exchange is benign: final
# merges of per-partition partials (one row per partition crosses).
_MERGE_CONSUMERS = (
    "HashAggregate", "SortAggregate", "ObjectHashAggregate",
    "TakeOrderedAndProject", "CollectLimit", "BroadcastExchange",
)


def _indent(line: str) -> int:
    for marker in ("+- ", ":- "):
        if marker in line:
            return line.index(marker)
    return -1


def _bad_single_partition_consumers(plan: str) -> list[str]:
    """Parent node of each 'Exchange SinglePartition' in the ascii tree
    (the nearest preceding line with smaller indentation)."""
    bad = []
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        depth = _indent(line)
        parent = next(
            (
                lines[j]
                for j in range(i - 1, -1, -1)
                if -1 < _indent(lines[j]) < depth or _indent(lines[j]) == -1
            ),
            "",
        )
        if not any(c in parent for c in _MERGE_CONSUMERS):
            bad.append(parent.strip() or "<root>")
    return bad


@pytest.mark.parametrize("name", LINTABLE)
def test_plan_invariants(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in PYTHON_OK:
        assert "EvalPython" not in plan, f"{name}: Python eval in plan"
    if name not in SINGLE_PARTITION_OK:
        bad = _bad_single_partition_consumers(plan)
        assert not bad, (
            f"{name}: single-partition exchange feeding {bad} "
            "(O(N) wall at scale)"
        )
