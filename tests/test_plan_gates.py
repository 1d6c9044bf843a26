"""Plan-shape gates over EVERY registered query (r9 verdict item 4).

The scale audit's standing claim is "no global (SinglePartition) window
anywhere a corpus-shaped row stream flows" — rank/order paths are
bucketed (functions/order.py), and the only unpartitioned windows ride
synopsis-sized frames that are bounded BY CONSTRUCTION. This test turns
that argument into a gate: it walks every batch query's ANALYZED plan,
finds each Window node with an empty partitionSpec, and fails unless the
query is whitelisted with a named bound. A new unbounded global window
anywhere in the registry fails CI.

The ANALYZED plan (not the optimized one) on purpose: it shows windows
as the code WROTE them. At tiny test SFs the bucketed helpers'
quantile boundaries can collapse to a single bucket, and the optimizer
then folds the constant partition key away — an optimized-plan gate
would flag scale-safe bucketed windows (seen: corpus_classifier_eval's
global_running_sum at sf0.001) while the analyzed plan correctly shows
their __gr_bucket partition column.

Streaming queries are excluded: building them RUNS the stream to
completion (they drain to a sink), and their stateful operators are
keyed by construction (applyInPandasWithState grouping keys) with
dedicated state-bound tests in test_streaming_multimodal.py.
"""
from __future__ import annotations

import json

from data_transformation_2022_spark import queries as Q

# query -> (max unpartitioned Window nodes, the named input bound)
WHITELIST: dict[str, tuple[int, str]] = {
    "profile_skew_report": (
        1,
        "row_number over the per-key COUNT table capped to top<=10 rows "
        "(operators/relational.skew_report)",
    ),
    "sketch_kmv_union": (
        1,
        "k-smallest selection over <= groups*k distinct merged sketch "
        "rows (operators/sketches.kmv_union_report)",
    ),
    "sketch_kmv_join_card": (
        8,
        "_k_min fan/top stages and the K-union selection, each over "
        "<= KMV_FAN*k or <= 2k sketch rows "
        "(operators/sketches.kmv_join_cardinality_report)",
    ),
    "basic_nominalize": (
        1,
        "dense_rank over the post-DISTINCT nominal domain (<=5% distinct "
        "by the nominal-column definition; broadcast back to the table — "
        "operators/relational.nominalize)",
    ),
    "sig_linearness_fstat": (
        1,
        "row_number over a chart-sized aggregate frame (per-x-domain "
        "rows, bounded by the reference's chart caps — scoring/insight)",
    ),
    "sig_outstanding1_fstat": (
        1,
        "row_number over a chart-sized aggregate frame (per-key rows, "
        "bounded by the reference's chart caps — scoring/insight)",
    ),
    "sim_hybrid_rrf": (
        3,
        "three rank<=k top-k legs (lexical, vector, fused) — each "
        "row_number+filter compiles to map-side WindowGroupLimit + a "
        "k-bounded final selection (operators/similarity)",
    ),
}

_SF = "/root/testdata/sf0.001"


def test_unpartitioned_windows_are_whitelisted_and_bounded(spark):
    """Exhaustive SinglePartition-window inventory: every batch query's
    analyzed plan; any unpartitioned Window must be whitelisted (with
    its bound named above), every whitelist entry must still exist and
    still exhibit its windows (no stale entries)."""
    found: dict[str, int] = {}
    for name, qd in Q.REGISTRY.items():
        if "streaming" in qd.tags:
            continue
        df = qd.spark(spark, _SF)
        plan = json.loads(df._jdf.queryExecution().analyzed().toJSON())
        n_unpart = sum(
            1
            for node in plan
            if node.get("class", "").endswith(".Window")
            and not node.get("partitionSpec")
        )
        if n_unpart:
            found[name] = n_unpart
        cap = WHITELIST.get(name, (0, ""))[0]
        assert n_unpart <= cap, (
            f"{name}: {n_unpart} unpartitioned Window node(s) in the "
            f"analyzed plan (whitelisted cap {cap}) — a global window "
            "is a single-reducer sort at scale; either partition it, "
            "bound its input, or whitelist it here WITH the named bound"
        )
    stale = [n for n in WHITELIST if n not in Q.REGISTRY]
    assert not stale, f"whitelist names unknown queries: {stale}"
    unexercised = [n for n in WHITELIST if n not in found]
    assert not unexercised, (
        f"whitelisted queries no longer have unpartitioned windows "
        f"(remove the stale entries): {unexercised}"
    )
