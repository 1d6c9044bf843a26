"""Physical-plan quality gates: the properties that keep queries viable
at 100 TB, asserted on the actual Catalyst output so regressions that
silently de-optimize a plan (lost pushdown, dropped broadcast, missing
map-side combine) fail CI rather than a production run.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

import pytest

from __spark_entry__ import queries


@pytest.fixture(scope="module")
def qs():
    return queries()


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def read_schema_width(plan: str) -> int:
    widths = [
        len(m.split(",")) for m in re.findall(r"ReadSchema: struct<([^>]+)>", plan)
    ]
    return max(widths) if widths else 0


def test_filter_pushdown_reaches_scan(spark, sf_dir, qs):
    plan = plan_of(qs["basic_filter"](spark, sf_dir))
    assert "PushedFilters: [" in plan and "PushedFilters: []" not in plan


def test_column_pruning_reaches_scan(spark, sf_dir, qs):
    # lineitem has 16 columns; the grouped sum needs 3
    plan = plan_of(qs["agg_group_sum"](spark, sf_dir))
    assert 0 < read_schema_width(plan) <= 4


def test_small_dims_broadcast(spark, sf_dir, qs):
    plan = plan_of(qs["join_broadcast_dims"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    plan3 = plan_of(qs["join_3way_topk"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan3


def test_aggregation_is_partial_then_final(spark, sf_dir, qs):
    # map-side combine: partial_sum before the exchange, final after
    plan = plan_of(qs["tpch_q1"](spark, sf_dir))
    assert "partial_sum" in plan
    assert plan.index("partial_sum") > plan.index("Exchange") or "Exchange" in plan


def test_no_single_reducer_window_in_rank(spark, sf_dir, qs):
    # the scalable rank partitions its window by bucket — the plan must
    # not contain an unpartitioned (global) Sort covering all rows in
    # one partition: every Exchange is hash/range, none SinglePartition
    plan = plan_of(qs["basic_rank"](spark, sf_dir))
    assert "SinglePartition" not in plan


def test_dedup_shuffles_hashes_not_documents(spark, sf_dir, qs):
    # exact dedup groups by the 64-bit fingerprint: the aggregation
    # exchange partitions on fp, and no exchange carries the text column
    plan = plan_of(qs["dedup_exact_text"](spark, sf_dir))
    assert "hashpartitioning(fp" in plan
    # ENSURE_REQUIREMENTS exchanges are the real (aggregation) shuffles;
    # the explicit fan_out REPARTITION of the tiny scan is exempt
    for m in re.finditer(
        r"\(\d+\) Exchange\nInput \[\d+\]: \[([^\]]*)\]\nArguments: [^\n]*ENSURE_REQUIREMENTS",
        plan,
    ):
        assert "text#" not in m.group(1)


def test_partitioned_write_prunes_partitions(spark, sf_dir, qs):
    # reading back a table partitioned by l_returnflag with an equality
    # filter must prune at the directory level: the partition filter
    # appears as PartitionFilters and is NOT a data-file PushedFilter
    plan = plan_of(qs["io_partitioned_pruning"](spark, sf_dir))
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "l_returnflag" in m.group(1)


def test_hash_sample_is_narrow(spark, sf_dir, qs):
    # the deterministic sample is a pure filter over the scan: no
    # Exchange anywhere — at 100 TB a sampling pass that shuffles is
    # a bug, not an implementation detail
    plan = plan_of(qs["sample_hash_bernoulli"](spark, sf_dir))
    assert "Exchange" not in plan


def test_emb_centroid_partial_agg(spark, sf_dir, qs):
    # the element-wise centroid must combine map-side: one partial_sum
    # before the (bucket, dim) exchange, final after
    plan = plan_of(qs["emb_centroid_by_bucket"](spark, sf_dir))
    assert "partial_sum" in plan
    assert "Exchange" in plan


def test_range_join_is_binned_equi_join(spark, sf_dir, qs):
    # the ±w self-join must ride the bin equi-key — a nested-loop /
    # cartesian plan here is the O(n²) failure mode the binning exists
    # to prevent
    plan = plan_of(qs["join_range_cooccur"](spark, sf_dir))
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_subquery_tpch_shapes_decorrelate(spark, sf_dir, qs):
    # EXISTS → LeftSemi hash join, NOT IN → LeftAnti hash join,
    # correlated scalar MIN → aggregate + equi join. If Catalyst ever
    # falls back to BroadcastNestedLoop/Cartesian for any of these, the
    # query is O(n²) at scale — exactly what decorrelation exists to
    # prevent.
    expectations = {
        "tpch_q4_exists": "LeftSemi",
        "tpch_q16_notin": "LeftAnti",
        "tpch_q22_antijoin": "LeftAnti",
        "tpch_q2_corr_min": "Join Inner",
    }
    for name, marker in expectations.items():
        plan = plan_of(qs[name](spark, sf_dir))
        assert marker in plan, f"{name}: expected {marker}\n{plan}"
        assert "NestedLoop" not in plan and "Cartesian" not in plan, name


def test_decontaminate_broadcasts_benchmark(spark, sf_dir, qs):
    # the benchmark shingle-hash set must broadcast — shuffling the
    # corpus shingles against a tiny benchmark is the wrong join order
    # at any scale
    plan = plan_of(qs["corpus_decontaminate"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_unpivot_is_narrow(spark, sf_dir, qs):
    # wide→long reshape is a per-row Expand: any Exchange means it
    # shuffled 3× the data for nothing
    plan = plan_of(qs["agg_unpivot"](spark, sf_dir))
    assert "Expand" in plan
    assert "Exchange" not in plan


def test_funnel_single_shuffle(spark, sf_dir, qs):
    # conditional-MIN funnel: exactly one hash-partitioned exchange (on
    # user_id) feeding the per-user aggregate; the final global fold is
    # a SinglePartition exchange over ONE row per partition, which is
    # the correct terminal shape (not a data-sized single reducer)
    plan = plan_of(qs["events_funnel_ordered"](spark, sf_dir))
    exchanges = re.findall(r"\(\d+\) Exchange", plan)
    assert len(exchanges) == 2, plan  # user_id shuffle + terminal fold
    assert "hashpartitioning(user_id" in plan
    assert "SinglePartition" in plan  # folds ONE row per partition — fine


def test_bucketed_join_has_no_shuffle(spark, sf_dir, qs):
    # both sides bucketed+sorted on the join key: with broadcast off the
    # SortMergeJoin must consume bucket layout directly — no Exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = plan_of(qs["io_bucketed_join"](spark, sf_dir))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "SortMergeJoin" in plan
    # Both scans must consume the bucket layout directly.
    assert "Bucketed: true" in plan
    # In formatted output every operator in the join's subtree carries an
    # id LOWER than the join's own id (leaves are numbered first).  Any
    # Exchange above the join (e.g. the downstream aggregation shuffle)
    # is legitimate; an Exchange below it would mean the bucket layout
    # was not consumed.  Scope the assertion to the join's inputs.
    join_ids = [int(m) for m in re.findall(r"SortMergeJoin[^(\n]*\((\d+)\)", plan)]
    assert join_ids, plan
    exchange_ids = [int(m) for m in re.findall(r"Exchange[^(\n]*\((\d+)\)", plan)]
    below = [e for e in exchange_ids if e < min(join_ids)]
    assert not below, f"Exchange nodes {below} feed the SortMergeJoin:\n{plan}"


def test_chunk_documents_is_narrow(spark, sf_dir, qs):
    # posexplode of a per-row sequence: no shuffle anywhere in the plan
    plan = plan_of(qs["corpus_chunk_documents"](spark, sf_dir))
    assert "Exchange" not in plan
    assert "Generate" in plan  # the explode


def test_boilerplate_scrub_broadcasts_hot_set(spark, sf_dir, qs):
    # the hot-segment anti-join must be broadcast, never a sort-merge of
    # the corpus against itself
    plan = plan_of(qs["corpus_boilerplate_scrub"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin LeftAnti" not in plan


def test_pack_sequences_no_single_partition_window(spark, sf_dir, qs):
    # the prefix sum must come from the bucketed form: a partitioned
    # window plus broadcast offsets, never Exchange SinglePartition
    plan = plan_of(qs["corpus_pack_sequences"](spark, sf_dir))
    assert "Window" in plan
    assert "Exchange SinglePartition" not in plan


def test_new_tpch_shapes_decorrelate(spark, sf_dir, qs):
    # round-4 additions: q17's correlated AVG must become an aggregate +
    # equi join; q20's nested IN chain must be semi joins; q21's
    # EXISTS + NOT-EXISTS double correlation must be one semi and one
    # anti hash join — never a nested-loop fallback
    expectations = {
        "tpch_q17_small_qty": ("Join Inner",),
        "tpch_q20_promo_suppliers": ("LeftSemi",),
        "tpch_q21_waiting_supplier": ("LeftSemi", "LeftAnti"),
        "tpch_q11_important_parts": ("Join Inner",),  # HAVING-scalar join
        "tpch_q15_top_supplier": ("Join Inner",),  # scalar-max join
    }
    for name, markers in expectations.items():
        plan = plan_of(qs[name](spark, sf_dir))
        for marker in markers:
            assert marker in plan, f"{name}: expected {marker}\n{plan}"
        assert "CartesianProduct" not in plan, name


def test_dynamic_partition_pruning_fires(spark, sf_dir, qs):
    # the fact scan's partition filter must be the runtime dynamicpruning
    # subquery (dim-side broadcast reused), not a static literal — and
    # the result columns must come only from the pruned scan
    df = qs["io_dynamic_pruning"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]
