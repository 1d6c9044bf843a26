"""End-to-end engine tests: enumerate → execute → score → rank on real
testdata, plus planner unit checks (Pareto pruning, signature matching)."""

from __future__ import annotations

import json

import pytest

from data_transformation_2022_spark.engine import MAX_PER_TYPE, recommend
from data_transformation_2022_spark.plans.catalog import channel_candidates
from data_transformation_2022_spark.plans.load import Load, prune_dominated
from data_transformation_2022_spark.plans.search import enumerate_tpaths
from data_transformation_2022_spark.profiler import profile_table
from data_transformation_2022_spark.sources.readers import load_table


def test_load_partial_order():
    a, b = Load(1, 1, 1), Load(2, 2, 2)
    c = Load(0.5, 3, 1)
    assert a.dominates(b) and not b.dominates(a)
    assert not a.dominates(c) and not c.dominates(a)  # incomparable
    kept = prune_dominated([(a, "a"), (b, "b"), (c, "c")])
    assert {p for _, p in kept} == {"a", "c"}  # no dominated survivor


def test_channel_signature_matching():
    cands = channel_candidates("num_scatter")
    assert set(cands["xy"]) >= {"pca", "tsne", "mds", "umap"}
    assert "kmeans" not in cands["xy"]
    assert cands["color"] == ["null_num1"] or "null_num1" in cands["color"]
    bar = channel_candidates("sum_bar")
    assert "null_nom1" in bar["x"] and "kmeans" in bar["x"]


def test_enumeration_pools(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    tp = profile_table(li)
    pools = enumerate_tpaths(tp, max_depth=2)
    assert pools["null_nom1"], "nominal columns must enumerate"
    assert pools["null_num"], "numeric select must enumerate"
    assert pools["dm"], "dm cluster selects must enumerate"
    # no dominated survivor within a dm depth layer is enforced by
    # construction; check candidates are unique
    sigs = [c.signature() for c in pools["dm"]]
    assert len(sigs) == len(set(sigs))


def test_recommend_end_to_end(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem", rid=True)
    res = recommend(li, dm_ts=["pca", "kmeans"], sample_cap=500)
    assert res.charts, "must produce recommendations"
    # caps respected
    by_type: dict[str, int] = {}
    for c in res.charts:
        by_type[c.chart_type] = by_type.get(c.chart_type, 0) + 1
    for t, n in by_type.items():
        assert n <= MAX_PER_TYPE[t]
    # scores are finite and sorted desc
    scores = [c.score for c in res.charts]
    assert scores == sorted(scores, reverse=True)
    # no duplicate signatures
    sigs = [c.signature() for c in res.charts]
    assert len(sigs) == len(set(sigs))
    # provenance serializes to JSON and references every chart
    payload = json.loads(res.to_json())
    assert len(payload["provenance"]["vis_list"]) == len(res.charts)
    assert any(n["node_type"] == "D" for n in payload["provenance"]["nodes"])


def test_recommend_empty_numeric_table(spark):
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame({"c": ["a", "b", "a", "b"]}))
    res = recommend(df, dm_ts=["pca"], sample_cap=100)
    # count_bar on the nominal column is still producible; no crash
    assert all(ch.chart_type in MAX_PER_TYPE for ch in res.charts)


def test_decorate_presentation_reorder():
    from data_transformation_2022_spark.engine import decorate

    vl = [{"id": f"V{i}"} for i in range(6)]
    out = decorate({"vis_list": vl, "nodes": []})
    # reference order for <13 charts: [3, 2, 0, 4, 8, 7] then the rest
    assert [v["id"] for v in out["vis_list"]] == ["V3", "V2", "V0", "V4", "V1", "V5"]
    assert out["nodes"] == []  # provenance untouched
    big = [{"id": f"V{i}"} for i in range(14)]
    out2 = decorate({"vis_list": big})
    assert [v["id"] for v in out2["vis_list"]][:5] == ["V0", "V2", "V3", "V6", "V12"]
    assert len(out2["vis_list"]) == 14  # permutation, nothing dropped


def test_rank_step_reduced_to_consumed_outputs(spark):
    """Per-consumer rank reduction (r9 verdict item 5): a shared rank
    step over many columns is REDUCED to the outputs some bar consumer
    actually touches — the persisted base ranks (and keeps) only those,
    with identical values, so wide-table rank-chain materialization
    scales with consumed width, not table width. A consumer whose
    LATER step reads more ranked columns widens the reduction via the
    suffix-input union (second scenario)."""
    from data_transformation_2022_spark.engine import Executor
    from data_transformation_2022_spark.operators.steps import Step
    from data_transformation_2022_spark.plans.search import Candidate

    cols = [f"m{i}" for i in range(6)]
    df = spark.createDataFrame(
        [tuple(float(i * 7 + j) for j in range(6)) + (f"g{i % 2}",)
         for i in range(30)],
        ", ".join(f"{c} double" for c in cols) + ", g string",
    )
    rank = Step(
        t="rank", i_type="==", i=list(cols), o_type="append",
        index=[f"rank {c}" for c in cols],
    )
    ex = Executor(df, sample_cap=10)
    cand = Candidate(
        family="sum_bar", steps=[rank],
        out_cols=["rank m1", "rank m4"], derived=["rank m1", "rank m4"],
    )
    ex.prefetch(frame_jobs=[], bar_jobs=[("g", cand, "sum")])
    key = next(iter(ex._persisted_base_keys))
    base = ex._derived_bases[key]
    ranked = sorted(c for c in base.columns if c.startswith("rank "))
    assert ranked == ["rank m1", "rank m4"], ranked
    assert "m0" not in base.columns  # un-consumed sources pruned too
    out = ex.bar_aggregate("g", cand, "sum")
    # values identical to an unreduced rank over the same data
    ex2 = Executor(df, sample_cap=10)
    want = ex2.bar_aggregate("g", cand, "sum")
    got = {r["g"]: (r["SUM(rank m1)"], r["SUM(rank m4)"]) for _, r in out.iterrows()}
    exp = {r["g"]: (r["SUM(rank m1)"], r["SUM(rank m4)"]) for _, r in want.iterrows()}
    assert got == exp
    ex.release()
    ex2.release()

    # scenario 2: a sibling chain's arithmetic step consumes MORE ranked
    # columns — the suffix-input union widens the shared rank prefix
    sub = Step(
        t="sub", i_type="==", i=["rank m2", "rank m3"], o_type="append",
        index=["d"],
    )
    cand2 = Candidate(
        family="sum_bar", steps=[rank, sub], out_cols=["d"], derived=["d"],
    )
    ex3 = Executor(df, sample_cap=10)
    ex3.prefetch(
        frame_jobs=[], bar_jobs=[("g", cand, "sum"), ("g", cand2, "sum")]
    )
    rank_key = min(ex3._persisted_base_keys, key=len)
    ranked3 = sorted(
        c for c in ex3._derived_bases[rank_key].columns
        if c.startswith("rank ")
    )
    assert ranked3 == ["rank m1", "rank m2", "rank m3", "rank m4"], ranked3
    ex3.release()


def test_bar_aggregate_rebuilds_pruned_base(spark):
    """A public-API bar_aggregate on a chain whose persisted base was
    column-pruned by an earlier prefetch registration (for a DIFFERENT
    consumer set) must rebuild the base unpruned and return real sums —
    not fall through the except-to-None path (r8 advice)."""
    from data_transformation_2022_spark.engine import Executor
    from data_transformation_2022_spark.operators.steps import Step
    from data_transformation_2022_spark.plans.search import Candidate

    df = spark.createDataFrame(
        [(float(i), float(2 * i), f"g{i % 2}") for i in range(40)],
        "a double, b double, g string",
    )
    ex = Executor(df, sample_cap=10)
    rank = Step(t="rank", i_type="==", i=["a"], o_type="append", index=["rank a"])
    cand_a = Candidate(
        family="sum_bar", steps=[rank], out_cols=["rank a"], derived=["rank a"]
    )
    ex.prefetch(frame_jobs=[], bar_jobs=[("g", cand_a, "sum")])
    key = (("rank", "==", ("a",), "append", ("rank a",)),)
    assert key in ex._persisted_base_keys
    # per-level pruning: neither the un-consumed column b NOR the rank
    # input a itself survives (no bar job and no later step reads them)
    assert "b" not in ex._derived_bases[key].columns
    assert "a" not in ex._derived_bases[key].columns
    # scenario 1: public-API bar_aggregate summing the pruned column b
    cand_b = Candidate(family="sum_bar", steps=[rank], out_cols=["b"])
    out = ex.bar_aggregate("g", cand_b, "sum")
    assert out is not None, "pruning miss must rebuild, not return None"
    got = dict(zip(out["g"], out["SUM(b)"]))
    assert got == {"g0": 760.0, "g1": 800.0}
    assert "b" in ex._derived_bases[key].columns  # memo now unpruned
    ex.release()

    # scenario 2: extending the chain through _derived_base with a step
    # whose input was pruned away — the extension itself must rebuild
    # the prefix unpruned instead of raising, and the child must compute
    # real values over the rebuilt parent
    ex2 = Executor(df, sample_cap=10)
    ex2.prefetch(frame_jobs=[], bar_jobs=[("g", cand_a, "sum")])
    assert "a" not in ex2._derived_bases[key].columns
    sub = Step(
        t="sub", i_type="==", i=["rank a", "a"], o_type="append", index=["d"]
    )
    sib = ex2._derived_base([rank, sub])
    assert "d" in sib.columns and "a" in ex2._derived_bases[key].columns
    row = sib.orderBy("a").limit(1).collect()[0]
    assert row["d"] == row["rank a"] - row["a"]
    ex2.release()


def test_dynamic_selector_over_pruned_prefix_rebuilds(spark):
    """ADVICE r10: a public-API chain extension whose step uses a
    DYNAMIC input selector (num/all/like) resolves its inputs from the
    parent's columns, so a keep_fn-pruned parent would silently change
    the computation (no missing-column error). The executor must
    rebuild the prefix unpruned — the horizontal sum over 'num' must
    cover ALL ranked columns, identical to a never-pruned executor."""
    from data_transformation_2022_spark.engine import Executor
    from data_transformation_2022_spark.operators.steps import Step
    from data_transformation_2022_spark.plans.search import Candidate

    cols = [f"m{i}" for i in range(6)]
    df = spark.createDataFrame(
        [tuple(float(i * 7 + j) for j in range(6)) + (f"g{i % 2}",)
         for i in range(30)],
        ", ".join(f"{c} double" for c in cols) + ", g string",
    )
    rank = Step(
        t="rank", i_type="==", i=list(cols), o_type="append",
        index=[f"rank {c}" for c in cols],
    )
    ex = Executor(df, sample_cap=10)
    narrow = Candidate(
        family="sum_bar", steps=[rank],
        out_cols=["rank m1"], derived=["rank m1"],
    )
    # registration prunes the rank base to the narrow consumer's width
    ex.prefetch(frame_jobs=[], bar_jobs=[("g", narrow, "sum")])
    key = next(iter(ex._persisted_base_keys))
    assert key in ex._pruned_base_keys
    assert len([c for c in ex._derived_bases[key].columns
                if c.startswith("rank ")]) == 1
    # now extend the SAME chain with a dynamic-selector horizontal sum
    hsum = Step(t="sum", i_type="num", i=[], o_type="append",
                index=["SUM over num"])
    wide = Candidate(
        family="sum_bar", steps=[rank, hsum],
        out_cols=["SUM over num"], derived=["SUM over num"],
    )
    got = ex.bar_aggregate("g", wide, "sum")
    ex2 = Executor(df, sample_cap=10)
    want = ex2.bar_aggregate("g", wide, "sum")
    g = {r["g"]: r["SUM(SUM over num)"] for _, r in got.iterrows()}
    w = {r["g"]: r["SUM(SUM over num)"] for _, r in want.iterrows()}
    assert g == w, (g, w)
    ex.release()
    ex2.release()
