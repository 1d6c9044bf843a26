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

# Condition-less logical Join nodes (crossJoin): every one must be a
# broadcast of a 1-row aggregate / bounded synopsis frame against the
# data stream — the z-order-bounds / sketch-report idiom — never a
# data×data cartesian. query -> max such nodes; the shared bound is
# "one side is a 1-row aggregate or a ≤k-row sketch/synopsis frame".
CROSSJOIN_WHITELIST: dict[str, int] = {
    "corpus_bigram_fluency": 1,    # 1-row vocabulary-size aggregate
                                   # (bigram_fluency's broadcast __v)
    "corpus_classifier_eval": 1,   # 1-row confusion/AUC scalar frames
    "corpus_ppl_buckets": 1,       # 1-row vocab frame via bigram_fluency
    "corpus_ppl_buckets_sketch": 7,  # histogram-sketch threshold rows
                                     # + the 1-row vocab frame
    "emb_neardup_pairs": 1,        # the GUARDED all-pairs oracle anchor:
                                   # cosine_neardup_pairs refuses inputs
                                   # beyond max_rows instead of launching
                                   # an n² job (similarity.py)
    "io_zorder_cluster": 1,        # 1-row min/max bounds
    "io_zorder_cluster3": 1,       # 1-row min/max bounds
    "join_bloom_pruned": 1,        # 1-row bloom-bitset build
    "profile_outliers": 4,         # 1-row per-column quantile frames
    "profile_skew_report": 1,      # 1-row total-count frame
    "scoring_cdm": 2,              # 1-row grid-extent frames
    "scoring_hist2d": 1,           # 1-row grid-extent frame
    "sig_outstanding1_fstat": 1,   # 1-row F-stat scalar frame
    "sim_cosine_topk": 1,          # ≤k-row query-vector frame
    "sim_hybrid_rrf": 1,           # ≤k-row fused-leg frame
    "sketch_hist_quantile": 15,    # per-quantile 1-row threshold frames
    "sketch_kmv_join_card": 4,     # 1-row sketch-scalar frames
    "sketch_kmv_union": 2,         # 1-row sketch-scalar frames
}

_SF = "/root/testdata/sf0.001"


def test_plan_shape_gates(spark):
    """Exhaustive plan-shape inventory in ONE pass over every batch
    query's analyzed plan:

    * any unpartitioned Window must be whitelisted with a named bound
      (WHITELIST above) — a global window is a single-reducer sort;
    * ZERO row-wise Python UDF nodes anywhere (EvalPython) — the only
      Python in any plan is Arrow-vectorized mapInPandas /
      applyInPandas(WithState);
    * every condition-less Join is whitelisted (CROSSJOIN_WHITELIST) —
      a cross join is only ever a broadcast 1-row/synopsis frame.

    Whitelists are exhaustive both ways: an entry whose query no longer
    exhibits the shape fails as stale."""
    found_w: dict[str, int] = {}
    found_c: dict[str, int] = {}
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
        n_udf = sum(
            1 for node in plan if "EvalPython" in node.get("class", "")
        )
        n_cross = sum(
            1
            for node in plan
            if node.get("class", "").endswith(".Join")
            and not node.get("condition")
        )
        if n_unpart:
            found_w[name] = n_unpart
        if n_cross:
            found_c[name] = n_cross
        cap = WHITELIST.get(name, (0, ""))[0]
        assert n_unpart <= cap, (
            f"{name}: {n_unpart} unpartitioned Window node(s) in the "
            f"analyzed plan (whitelisted cap {cap}) — a global window "
            "is a single-reducer sort at scale; either partition it, "
            "bound its input, or whitelist it here WITH the named bound"
        )
        assert n_udf == 0, (
            f"{name}: {n_udf} row-wise Python UDF node(s) — use built-in "
            "expressions or an Arrow-vectorized mapInPandas instead"
        )
        ccap = CROSSJOIN_WHITELIST.get(name, 0)
        assert n_cross <= ccap, (
            f"{name}: {n_cross} condition-less Join node(s) (cap {ccap}) "
            "— a cross join must be a broadcast 1-row/synopsis frame; "
            "whitelist it here WITH that property verified"
        )
    for wl, found, what in (
        (WHITELIST, found_w, "unpartitioned windows"),
        (CROSSJOIN_WHITELIST, found_c, "condition-less joins"),
    ):
        stale = [n for n in wl if n not in Q.REGISTRY]
        assert not stale, f"whitelist names unknown queries: {stale}"
        unexercised = [n for n in wl if n not in found]
        assert not unexercised, (
            f"whitelisted queries no longer have {what} "
            f"(remove the stale entries): {unexercised}"
        )


def test_streaming_plan_shape_gates(spark):
    """The streaming twin of the batch gate (r10 verdict item 7): the
    batch gate skips streaming queries because EXECUTING them drains a
    stream, but their plans are buildable unstarted — so the standing
    claims about the stateful operators are CI-checked here, on the
    analyzed plans of the exact frames the drivers start:

    * every custom-stateful node (FlatMapGroupsInPandasWithState) is
      KEYED — non-empty groupingAttributes; an unkeyed stateful op
      would funnel the whole stream through one state partition;
    * every streaming Aggregate / Deduplicate is keyed the same way;
    * every stream-stream Join carries a condition (the event-time
      range is what lets Spark bound the join state);
    * watermarks are present where the pipeline claims bounded state;
    * zero row-wise EvalPython nodes, as in batch.
    """
    from data_transformation_2022_spark.streaming import pipelines as P

    docs_schema = spark.read.parquet(f"{_SF}/documents.parquet").schema
    doc_stream = (
        spark.readStream.format("parquet")
        .schema(docs_schema)
        .option("path", _SF)
        .option("pathGlobFilter", "documents.parquet")
        .load()
    )
    ev = P._event_stream(spark, _SF)

    # name -> (frame, expected stateful-node counts)
    cases = {
        "stream_lsh_neardup": (
            P.streaming_lsh_neardup(doc_stream, "doc_id", "text", expected_docs=500),
            dict(with_state=1, watermarks=0),
        ),
        "stream_running_totals": (
            P.running_user_totals(ev),
            dict(with_state=1, watermarks=0),  # processing-time timeout
        ),
        "stream_hourly_rollup": (
            P.hourly_rollup_agg(ev, with_watermark=True),
            dict(aggregates=1, watermarks=1),
        ),
        "stream_sessionize": (
            ev.withWatermark("ts", "2 hours")
            .groupBy(P.F.session_window("ts", "30 minutes").alias("w"), "user_id")
            .agg(P.F.count(P.F.lit(1)).alias("n_events")),
            dict(aggregates=1, watermarks=1),
        ),
        "stream_dedup_keys": (
            ev.withWatermark("ts", "2 hours").dropDuplicates(
                ["user_id", "event_type"]
            ),
            dict(dedups=1, watermarks=1),
        ),
    }
    for name, (frame, want) in cases.items():
        assert frame.isStreaming, name
        plan = json.loads(frame._jdf.queryExecution().analyzed().toJSON())
        got = dict(with_state=0, aggregates=0, dedups=0, watermarks=0)
        for node in plan:
            cls = node.get("class", "")
            if cls.endswith("FlatMapGroupsInPandasWithState"):
                got["with_state"] += 1
                assert node.get("groupingAttributes"), (
                    f"{name}: unkeyed FlatMapGroupsInPandasWithState — "
                    "all-stream single-partition state"
                )
            elif cls.endswith(".Aggregate"):
                got["aggregates"] += 1
                assert node.get("groupingExpressions"), (
                    f"{name}: global streaming aggregate (no grouping)"
                )
            elif cls.endswith(".Deduplicate") or cls.endswith(
                "DeduplicateWithinWatermark"
            ):
                got["dedups"] += 1
                assert node.get("keys"), f"{name}: keyless Deduplicate"
            elif cls.endswith(".Join"):
                assert node.get("condition"), (
                    f"{name}: condition-less stream join (unbounded state)"
                )
            elif cls.endswith("EventTimeWatermark"):
                got["watermarks"] += 1
            assert "EvalPython" not in cls, f"{name}: row-wise Python UDF"
        for k, v in want.items():
            assert got[k] == v, f"{name}: expected {k}={v}, plan has {got[k]}"

    # the stream-stream interval join, built exactly as the driver does
    views = (
        ev.filter(P.F.col("event_type") == "view")
        .select("event_id", "user_id", P.F.col("ts").alias("view_ts"))
        .withWatermark("view_ts", "2 hours")
    )
    clicks = (
        ev.filter(P.F.col("event_type") == "click")
        .select(
            P.F.col("event_id").alias("click_id"),
            P.F.col("user_id").alias("c_user"),
            P.F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "2 hours")
    )
    joined = views.join(
        clicks,
        (P.F.col("user_id") == P.F.col("c_user"))
        & (P.F.col("click_ts") >= P.F.col("view_ts"))
        & (P.F.col("click_ts") <= P.F.col("view_ts") + P.F.expr("INTERVAL 3 HOURS")),
        "inner",
    )
    plan = json.loads(joined._jdf.queryExecution().analyzed().toJSON())
    joins = [n for n in plan if n.get("class", "").endswith(".Join")]
    assert joins and all(n.get("condition") for n in joins)
    assert sum(
        1 for n in plan if n.get("class", "").endswith("EventTimeWatermark")
    ) == 2


def test_bar_grouping_sets_prunes_scan(spark, sf_dir):
    """The engine's batched bar job (one GROUPING SETS aggregation per
    derived base, engine.Executor.prefetch r12) must keep column
    pruning through the Expand node: the parquet scan reads ONLY the
    grouping x columns + the aggregated sum inputs, never the full
    table width — the property that makes one multi-set pass strictly
    better than per-(base,x) jobs at 100 TB. Pins Catalyst behavior
    against Spark upgrades."""
    import re

    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    gdf = li.groupingSets(
        [[F.col("l_returnflag")], [F.col("l_linestatus")]],
        F.col("l_returnflag"),
        F.col("l_linestatus"),
    ).agg(
        F.grouping_id().alias("__gid"),
        F.sum("l_quantity").alias("SUM(l_quantity)"),
    )
    plan = gdf._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    read_cols = {c.split(":")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"l_returnflag", "l_linestatus", "l_quantity"}, read_cols
    # and the slice ids the engine computes match what Spark emits
    rows = gdf.collect()
    gids = {r["__gid"] for r in rows}
    assert gids == {0b01, 0b10}, gids
