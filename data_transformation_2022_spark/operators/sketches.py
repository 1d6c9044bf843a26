"""Deterministic cardinality sketches (KMV / k-minimum-values).

COUNT(DISTINCT) is the classic 100 TB wall: the exact form shuffles
every distinct key to one reducer per group. The KMV synopsis (Beyer et
al., "On Synopses for Distinct-Value Estimation Under Multiset
Operations", SIGMOD 2007) keeps only the k smallest hash values per
group and estimates the cardinality as ``(k-1) / U_(k)`` where
``U_(k)`` is the k-th minimum normalized to [0, 1). Unlike
HyperLogLog-style sketches (whose register layouts differ per engine),
KMV is *engine-portable by construction*: the sketch is literally "the
k smallest md5 prefixes", so an SQL oracle reproduces the estimate
bit-for-bit — and the sketch is MERGEABLE: the k smallest of a union of
per-group sketches is exactly the union's sketch, which is why a
1000-executor fleet can sketch partitions independently and combine
metadata-sized results.

Why KMV and not Spark's built-in DataSketches HLL (``hll_sketch_agg``)?
Measured, not assumed: besides being oracle-opaque (engine-specific
register layout), the built-in HLL estimate is not even
partitioning-invariant — the same 500-key input returns 396 under one
repartitioning and 397 under another, because each partial sketch
promotes through list→set→HLL modes at partition-local thresholds and
the merged register state differs (likewise union-of-group-sketches vs
sketch-of-union: 398 vs 396). Every other estimator in this repo is
bit-stable across plan shapes; KMV keeps the sketch layer to that
standard. The trade is size: KMV needs k·8 bytes for ~1/√k error where
HLL needs ~k registers of 6 bits — acceptable at synopsis scale.

Scale shape:

* hashing is a map-only codegen'd expression (md5 prefix → 60-bit
  bigint, the repo-wide idiom from functions/text.md5_prefix_long);
* the distinct pass is a partially-aggregated groupBy on 8-byte keys —
  map-side combine collapses duplicates before the shuffle;
* per-group k-minimums run TWO-LEVEL: first the k smallest within each
  (group, h % fan) sub-bucket — that window rides a 64-way-wider key so
  no single reducer ever sees more than ~distinct/fan rows — then the k
  smallest of the ≤ fan·k survivors per group. Exactly the global
  k-minimums (each global top-k member is top-k within its sub-bucket),
  never a per-group single-reducer sort over the full distinct set.

The reference has no sketches (its COUNT DISTINCT is pandas nunique,
reference search.py's domain profiling); this module is part of the
extension surface a warehouse-scale engine needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import md5_prefix_long

# 60-bit hash space: md5_prefix_long(_, 15) is uniform on [0, 2^60).
HASH_SPACE = float(1 << 60)
# Sub-bucket fan-out for the two-level k-minimums (see module docstring).
KMV_FAN = 64


def _k_min(hashed: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Two-level per-group k smallest distinct values of column ``h``
    (see module docstring for why two-level)."""
    d = hashed.groupBy(*group_cols, "h").agg(F.lit(1).alias("__one")).drop("__one")
    sub = Window.partitionBy(*group_cols, F.col("h") % KMV_FAN).orderBy("h")
    pruned = (
        d.withColumn("__rn", F.row_number().over(sub))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    top = Window.partitionBy(*group_cols).orderBy("h")
    return (
        pruned.withColumn("__rn", F.row_number().over(top))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )


def kmv_sketch(
    df: DataFrame, group_cols: list[str], key: Column, k: int = 64
) -> DataFrame:
    """The per-group KMV synopsis: the ``k`` smallest distinct 60-bit
    hashes of ``key`` per group — (group_cols…, h) rows, ≤ k per group.
    This IS the mergeable sketch: union sketches of disjoint slices,
    re-take the k smallest, and you have the union's sketch."""
    hashed = df.select(*group_cols, md5_prefix_long(key, 15).alias("h"))
    return _k_min(hashed, group_cols, k)


def _kmv_raw_est(k: int) -> Column:
    """The estimator over (hk, n_kept) columns: exact count when the
    sketch saw the whole domain (n_kept < k), else (k−1)·2^60/h_(k).
    ONE shared definition — the same arithmetic is mirrored verbatim by
    the SQL oracles (queries._KMV_EST)."""
    return F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(HASH_SPACE) / F.col("hk").cast("double")
    )


def kmv_estimate(sketch: DataFrame, group_cols: list[str], k: int = 64) -> DataFrame:
    """Distinct-count estimate per group from a KMV sketch: exact count
    when the group holds fewer than ``k`` hashes (the sketch saw the
    whole domain), else ``(k-1) · 2^60 / h_(k)``. Pure arithmetic on the
    metadata-sized sketch — this is the step a driver (or an SQL oracle)
    replays bit-for-bit."""
    agg = sketch.groupBy(*group_cols).agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).alias("n_kept")
    )
    return agg.select(*group_cols, F.round(_kmv_raw_est(k), 6).alias("est_distinct"))


def kmv_distinct_report(
    df: DataFrame, group_cols: list[str], key: Column, k: int = 64
) -> DataFrame:
    """Sketch-vs-exact report per group: exact distinct (the expensive
    thing the sketch replaces — computed here only to exhibit the
    error), the KMV estimate, and the relative error. At production
    scale you would keep only the estimate path."""
    hashed = df.select(*group_cols, md5_prefix_long(key, 15).alias("h"))
    exact = (
        hashed.groupBy(*group_cols, "h")
        .agg(F.lit(1).alias("__one"))
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    est = kmv_estimate(kmv_sketch(df, group_cols, key, k), group_cols, k)
    joined = exact.join(est, group_cols)
    rel = F.round(
        F.abs(F.col("est_distinct") - F.col("n_exact").cast("double"))
        / F.col("n_exact").cast("double"),
        6,
    )
    return joined.select(
        *group_cols, "n_exact", "est_distinct", rel.alias("rel_err")
    )


def kmv_union_report(
    df: DataFrame, group_cols: list[str], key: Column, k: int = 64
) -> DataFrame:
    """The merge property, end-to-end: build PER-GROUP sketches, then
    estimate the GLOBAL distinct count from the merged sketches alone —
    the k smallest distinct hashes across all group sketches (≤ groups·k
    rows ever touched past the sketch stage; the raw data contributes
    only through the per-group sketches, exactly how a fleet combines
    per-partition synopses). Returns one row: the number of merged
    sketch rows, exact global distinct (for the error exhibit), the
    merged-sketch estimate, and relative error."""
    sketches = kmv_sketch(df, group_cols, key, k)
    merged = sketches.select("h").distinct()
    top = Window.orderBy("h")  # input bounded: ≤ groups·k sketch rows
    global_sketch = (
        merged.withColumn("__rn", F.row_number().over(top))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    agg = global_sketch.agg(
        F.max("h").alias("hk"), F.count(F.lit(1)).alias("n_kept")
    )
    n_sketch = sketches.agg(F.count(F.lit(1)).alias("n_sketch_rows"))
    exact = (
        df.select(md5_prefix_long(key, 15).alias("h"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    joined = n_sketch.crossJoin(exact).crossJoin(
        agg.select(_kmv_raw_est(k).alias("__raw"))
    )
    rel = F.round(
        F.abs(F.round(F.col("__raw"), 6) - F.col("n_exact").cast("double"))
        / F.col("n_exact").cast("double"),
        6,
    )
    return joined.select(
        "n_sketch_rows",
        "n_exact",
        F.round("__raw", 6).alias("est_distinct"),
        rel.alias("rel_err"),
    )


def hist_quantile_report(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bins: int = 256,
) -> DataFrame:
    """Mergeable equi-width histogram → quantile estimates (p50/p90/p99)
    per group AND for the merged global histogram.

    This is the second synopsis a cost-based optimizer keeps next to
    the KMV distinct sketch: a fixed-bin histogram whose bins are
    GLOBAL (one min/max pass), so per-group — or per-partition, or
    per-day — histograms merge by adding counts. The ``__merged__``
    output row is computed from the per-group histograms alone,
    exhibiting exactly how a 1000-executor fleet combines
    metadata-sized partials into fleet-wide quantiles without ever
    re-touching the data.

    Scale shape: one min/max aggregate (broadcast back as a 1-row
    relation — the z-order bounds idiom), one partially-aggregated
    groupBy on (group, bin); everything after operates on ≤
    groups·bins synopsis rows (the per-group cumulative window rides
    ≤ ``bins`` rows per partition). The estimator arithmetic —
    integer cumulative counts, one IEEE division per quantile, linear
    interpolation inside the crossing bin — is replayed bit-for-bit
    by the SQL oracle.
    """
    j = _hist_cum_frame(df, group_col, value_col, bins, include_merged=True)
    out = None
    for name, q in (("p50_est", 0.5), ("p90_est", 0.9), ("p99_est", 0.99)):
        o = _hist_quantile_at(j, q, bins, name).select("grp", "n_rows", name)
        out = o if out is None else out.join(o, ["grp", "n_rows"])
    return out


def _hist_cum_frame(
    df: DataFrame,
    group_col: str,
    value_col: str,
    bins: int,
    include_merged: bool,
) -> DataFrame:
    """Shared histogram core for the quantile report and the threshold
    extractor: global min/max broadcast, equi-width binning, per-group
    counts (+ optional __merged__ union), cumulative counts, totals.
    ONE implementation so the SQL oracles that replay the estimator
    can never silently diverge between the two consumers."""
    v = (
        df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("val"))
        .filter(F.col("val").isNotNull())
    )
    b = v.agg(F.min("val").alias("lo"), F.max("val").alias("hi"))
    c = v.crossJoin(F.broadcast(b)).select(
        "grp",
        F.when(F.col("hi") == F.col("lo"), F.lit(0).cast("bigint"))
        .otherwise(
            F.least(
                F.lit(bins - 1).cast("bigint"),
                F.floor(
                    ((F.col("val") - F.col("lo")) * F.lit(float(bins)))
                    / (F.col("hi") - F.col("lo"))
                ),
            )
        )
        .alias("bin"),
    )
    h0 = c.groupBy("grp", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    h = h0.select("grp", "bin", "cnt")
    if include_merged:
        merged = (
            h0.groupBy("bin")
            .agg(F.sum("cnt").alias("cnt"))
            .select(F.lit("__merged__").alias("grp"), "bin", "cnt")
        )
        h = h.unionByName(merged)
    w = (
        Window.partitionBy("grp")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = h.withColumn("cum", F.sum("cnt").over(w))  # ≤ bins rows/group
    totals = h.groupBy("grp").agg(F.sum("cnt").alias("n_rows"))
    return cum.join(totals, "grp").crossJoin(F.broadcast(b))


def _hist_quantile_at(j, q: float, bins: int, name: str) -> DataFrame:
    """Value estimate at quantile ``q`` from the cumulative histogram
    frame: integer target rank, crossing-bin filter, linear
    interpolation, ROUND 6 — the arithmetic every SQL oracle replays."""
    tgt = F.ceil(F.col("n_rows").cast("double") * F.lit(q)).cast("bigint")
    crossing = j.filter(
        (F.col("cum") >= tgt) & ((F.col("cum") - F.col("cnt")) < tgt)
    )
    est = F.col("lo") + (
        F.col("bin").cast("double")
        + (tgt - (F.col("cum") - F.col("cnt"))).cast("double")
        / F.col("cnt").cast("double")
    ) * ((F.col("hi") - F.col("lo")) / F.lit(float(bins)))
    return crossing.select("grp", "n_rows", F.round(est, 6).alias(name))


def cms_topk_report(
    df: DataFrame,
    key: Column,
    top_n: int = 10,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) frequency
    estimates for the exact top-``top_n`` heaviest keys — the third
    mergeable synopsis next to KMV (distinct counts) and the equi-width
    histogram (quantiles): ``depth × width`` integer counters that merge
    by addition, answering "how often does key x occur" from metadata
    alone, with one-sided error (always ≥ the true count).

    Scale shape: the sketch build is ONE partially-aggregated groupBy
    on (row, col) — at most ``depth·width`` counter rows ever shuffle,
    whatever the data volume; the estimate pass joins the probe keys'
    ``depth`` positions against the broadcast-sized counter table and
    takes the per-key MIN. The hashes are the repo's md5-prefix idiom,
    so the SQL oracle replays build + probe bit-for-bit. The exact
    top-N (groupBy + TakeOrdered) rides alongside as the error
    exhibit — at production scale you would keep only the sketch.
    """
    from ..functions.text import md5_prefix_long

    keyed = df.select(key.cast("string").alias("key"))

    def _pos(i: int) -> Column:
        return md5_prefix_long(
            F.concat(F.col("key"), F.lit(f"|cms{i}")), 15
        ) % width

    exact = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("n_exact"))
    top = exact.orderBy(F.desc("n_exact"), "key").limit(top_n)
    rc = F.explode(
        F.array(
            *[
                F.struct(F.lit(i).alias("row"), _pos(i).alias("col"))
                for i in range(depth)
            ]
        )
    ).alias("rc")
    counters = (
        keyed.select(rc)
        .select("rc.row", "rc.col")
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = top.select("key", "n_exact", rc).select(
        "key", "n_exact", "rc.row", "rc.col"
    )
    est = (
        probes.join(F.broadcast(counters), ["row", "col"])
        .groupBy("key", "n_exact")
        .agg(F.min("cnt").alias("est"))
    )
    rel = F.round(
        (F.col("est") - F.col("n_exact")).cast("double")
        / F.col("n_exact").cast("double"),
        6,
    )
    return est.select("key", "n_exact", "est", rel.alias("rel_err"))


def kmv_join_cardinality_report(
    dfa: DataFrame,
    key_a: Column,
    dfb: DataFrame,
    key_b: Column,
    k: int = 64,
) -> DataFrame:
    """Join-cardinality estimation from sketches (the Beyer et al. 2007
    multiset-operation algebra): estimate |distinct(A) ∩ distinct(B)|
    from the two KMV sketches ALONE — the number a cost-based optimizer
    wants before committing to a join strategy, obtained without
    touching either table past its sketch pass.

    K∪ = the k smallest of the merged sketches estimates the union
    cardinality D∪; the fraction ρ = n_both / |K∪| of K∪ present in
    BOTH input sketches estimates Jaccard(A, B); the intersection
    estimate is ρ · D∪. The denominator is |K∪| (= n_kept), NOT k:
    when the union holds fewer than k distinct hashes the sketch IS
    the whole domain and ρ must be exact — dividing by k there
    underestimated a 10-element identical pair of sets at ~10/64 of
    its true intersection (pytest-pinned small-domain case). One row
    out: exact distinct of each side and of the intersection (the
    error exhibit), the estimate, relative error."""
    ha = dfa.select(md5_prefix_long(key_a, 15).alias("h"))
    hb = dfb.select(md5_prefix_long(key_b, 15).alias("h"))
    ska = _k_min(ha, [], k)
    skb = _k_min(hb, [], k)
    # k smallest of the union of the two sketches (bounded: ≤ 2k rows)
    merged = ska.union(skb).distinct()
    top = Window.orderBy("h")
    ku = (
        merged.withColumn("__rn", F.row_number().over(top))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    both = ku.join(ska, "h", "semi").join(skb, "h", "semi")
    agg = ku.agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("n_kept"))
    nb = both.agg(F.count(F.lit(1)).alias("n_both"))
    ex_a = ha.distinct().agg(F.count(F.lit(1)).alias("n_exact_a"))
    ex_b = hb.distinct().agg(F.count(F.lit(1)).alias("n_exact_b"))
    ex_i = (
        ha.distinct()
        .join(hb.distinct(), "h", "semi")
        .agg(F.count(F.lit(1)).alias("n_exact_inter"))
    )
    est = (
        F.col("n_both").cast("double") / F.col("n_kept").cast("double")
    ) * _kmv_raw_est(k)
    joined = (
        ex_a.crossJoin(ex_b)
        .crossJoin(ex_i)
        .crossJoin(agg)
        .crossJoin(nb)
        .select(
            "n_exact_a",
            "n_exact_b",
            "n_exact_inter",
            F.round(est, 6).alias("est_inter"),
            F.round(
                F.abs(F.round(est, 6) - F.col("n_exact_inter").cast("double"))
                / F.greatest(F.col("n_exact_inter").cast("double"), F.lit(1.0)),
                6,
            ).alias("rel_err"),
        )
    )
    return joined


def hist_thresholds(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: list[float],
    bins: int = 256,
) -> DataFrame:
    """Per-group quantile THRESHOLDS from the mergeable equi-width
    histogram — the synopsis that turns quantile-based policies
    (CCNet perplexity terciles, tail trimming) into map-only bucket
    assignment at fleet scale: build once (one min/max pass + one
    partially-aggregated groupBy on (group, bin)), broadcast the
    ≤ groups×len(qs) threshold rows, and every downstream row
    classifies by comparison — zero sorts, zero windows over data.

    Same estimator arithmetic as ``hist_quantile_report`` (integer
    cumulative counts, one IEEE division per quantile, linear
    interpolation in the crossing bin, ROUND 6), so an SQL oracle
    replays the thresholds bit-for-bit. Output: one row per group with
    ``thr_0 .. thr_{len(qs)-1}`` columns (ascending q order expected)."""
    j = _hist_cum_frame(df, group_col, value_col, bins, include_merged=False)
    out = None
    for i, q in enumerate(qs):
        o = _hist_quantile_at(j, q, bins, f"thr_{i}").select("grp", f"thr_{i}")
        out = o if out is None else out.join(o, "grp")
    return out
