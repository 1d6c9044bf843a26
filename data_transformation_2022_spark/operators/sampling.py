"""Deterministic sampling operators for large-scale corpus pipelines.

``sample()``/``TABLESAMPLE`` are nondeterministic across engines, runs,
and partitionings — useless when a training-data pipeline must be
reproducible and auditable. These operators derive the keep/drop
decision from an md5 hash of the row's KEY (not its partition), so:

* the same row always gets the same decision (stable under retries,
  re-partitioning, and incremental re-runs — the property that matters
  when a 100 TB sample job restarts halfway);
* the decision is engine-portable (md5 is everywhere), so a SQL oracle
  reproduces the sample exactly;
* rates are exact in expectation with no coordination: no count pass,
  no global sort, no driver state — a pure codegen'd filter that
  predicate-pushes like any other.

Reference scope note: the reference engine's only "sampling" is the
hard 400-row input cap (MAXSOURCEDATAROWS, config.py:1) — these
operators are part of the LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import small_df

from ..functions.text import md5_prefix_long

# 15 hex digits = 60 bits of hash, still exact int64 arithmetic on any
# engine. 2^60 % 1e6 leaves a relative bucket-rate bias of ~1e-12
# (with a 32-bit prefix the bias was ~2.3e-4 — buckets below
# 2^32 % 1e6 = 967296 were each hit one extra time per 4295 draws).
_BUCKETS = 1_000_000
_HASH_HEX_DIGITS = 15


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) derived from md5(key || salt). The salt
    decorrelates independent samples drawn from the same keys (e.g. a
    train/validation split followed by a 1% eval subsample)."""
    return md5_prefix_long(F.concat_ws("|", key, F.lit(salt)), _HASH_HEX_DIGITS) % _BUCKETS


def _threshold(rate: float) -> int:
    # half-up, not int() truncation and not round(): float rate literals
    # like 0.7 sit just below the exact product (0.7 * 1e6 =
    # 699999.9999...) so truncation would shave a full bucket off the
    # requested rate, while round() is banker's half-to-even, which
    # rounds an exact .5 product (e.g. 5e-7 * 1e6) DOWN to 0.
    return int(rate * _BUCKETS + 0.5)


def hash_sample(
    df: DataFrame, key_cols: list[str], rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_cols``."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    return df.filter(hash_bucket(key, salt) < _threshold(rate))


def stratified_hash_sample(
    df: DataFrame,
    key_cols: list[str],
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-balancing
    primitive (e.g. keep 100% of rare languages, 5% of English). Rates
    are literals in the plan; the filter stays a single codegen'd
    predicate with no shuffle and no per-group pass."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    threshold: Column = F.lit(_threshold(default_rate))
    for value, rate in rates.items():
        threshold = (
            F.when(F.col(strata_col) == value, F.lit(_threshold(rate))).otherwise(
                threshold
            )
        )
    return df.filter(hash_bucket(key, salt) < threshold)


def balance_by_quota(
    df: DataFrame,
    key_cols: list[str],
    strata_col: str,
    quota: int,
    salt: str = "balance",
) -> DataFrame:
    """Data-driven corpus balancing: cap every stratum at ~``quota``
    rows (in expectation) with per-stratum Bernoulli thresholds derived
    from the OBSERVED stratum counts — the language-rebalancing step of
    a pretraining mix (downsample the dominant language to the quota,
    keep rare languages whole) when the mix isn't known up front, unlike
    ``stratified_hash_sample`` whose rates are caller literals.

    thr = min(BUCKETS, (quota·BUCKETS + n div 2) div n) in EXACT integer
    arithmetic (round-half-up rational), so a SQL oracle derives
    bit-identical thresholds from the same counts. One groupBy over the
    stratum column (domain-sized), a broadcast join of the tiny
    threshold table, then the same pure codegen'd md5-bucket filter as
    ``hash_sample`` — no per-stratum sort, no skew: the scalable
    alternative to an exact-quota rank, which would sort each hot
    stratum on one reducer. Oversampled strata keep ≈quota rows
    (Bernoulli variance); strata at or under quota are kept whole."""
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    thr = F.least(
        F.lit(_BUCKETS).cast("bigint"),
        F.expr(f"({quota} * {_BUCKETS}L + __n div 2) div __n"),
    )
    rates = counts.select(F.col(strata_col), thr.alias("__thr"))
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    return (
        df.join(F.broadcast(rates), strata_col)
        .filter(hash_bucket(key, salt) < F.col("__thr"))
        .select(*df.columns)
    )


def select_by_token_budget(
    df: DataFrame,
    order_cols: list[str],
    token_col: str,
    budget: int,
    out_col: str = "cum_tokens",
) -> DataFrame:
    """Data selection under a token budget: keep the best-first prefix
    of the corpus whose INCLUSIVE cumulative token count stays within
    ``budget`` — the "take the highest-quality N-token subset" step of
    assembling a pretraining mix from a scored corpus.

    The cumulative sum runs under the global ``order_cols`` order via
    the bucketed prefix-sum (``functions.order.global_running_sum``:
    frozen quantile boundaries → map-side per-bucket sums → bucket-
    partitioned window + broadcast offsets — no single-reducer window),
    exact for integral token counts, so a SQL window-SUM oracle matches
    hash-exactly. Descending quality orders are expressed by negating
    the score into a column and ordering ascending."""
    from ..functions.order import global_running_sum

    with_cum = global_running_sum(df, order_cols, token_col, out_col)
    return with_cum.filter(F.col(out_col) <= budget)


def split_train_eval(
    df: DataFrame, key_cols: list[str], eval_fraction: float, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic train/eval split — same hash,
    complementary predicates, so every row lands in exactly one side on
    every engine and every re-run."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    cut = _threshold(eval_fraction)
    bucket = hash_bucket(key, salt)
    return df.filter(bucket >= cut), df.filter(bucket < cut)


def weighted_priority_sample(
    df: DataFrame,
    key_cols: list[str],
    weight_col: str,
    k: int,
    salt: str = "wps",
) -> DataFrame:
    """Sequential Poisson sampling (Ohlsson 1998): a weight-proportional
    fixed-size sample via per-row priority ``u / w`` — ``u`` the row's
    deterministic 60-bit md5 uniform, ``w`` its weight — keeping the k
    SMALLEST priorities. The standard πps approximation used by survey
    statisticians and, here, the "sample the corpus proportional to
    quality score" step of a training-data mix.

    Determinism/portability: ``u`` comes from the row KEY (stable under
    retries, repartitioning, engine); the priority is ONE IEEE division
    (``CAST(h AS DOUBLE) / w`` — identical bits on every engine, no
    transcendental functions, unlike the exp-draw A-ES formulation
    whose ``ln`` differs across libm builds). Ties broken on the key
    hash itself.

    Scale shape: priority is a map-only codegen'd expression; the k
    smallest arrive via TakeOrderedAndProject (per-partition top-k then
    a k-row merge) — never a global sort. Zero-or-negative weights are
    excluded (a weight of 0 must mean "never sample")."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    h = md5_prefix_long(F.concat_ws("|", key, F.lit(salt)), _HASH_HEX_DIGITS)
    # RAW division, no rounding: an IEEE quotient of exact inputs is
    # bit-identical on every engine, while ROUND(x, 6) at ~1e14
    # magnitudes differs in the last ulp between implementations
    # (observed Spark HALF_UP-via-BigDecimal vs DuckDB 1 ulp apart).
    pri = h.cast("double") / F.col(weight_col).cast("double")
    ranked = (
        df.filter(F.col(weight_col) > 0)
        .withColumn("__h", h)
        .withColumn("priority", pri)
    )
    return ranked.orderBy(F.col("priority"), F.col("__h")).limit(k).drop("__h")


def alpha_quotas(
    counts: dict[str, int], total: int, alpha: float
) -> dict[str, int]:
    """Temperature-based (α) source quotas — the multilingual mixing
    step of mC4/T5/XLM-R-style pipelines: stratum s gets a share of
    ``total`` proportional to n_s**α (α=1 → proportional to corpus,
    α=0 → uniform across strata, α≈0.3-0.7 → upsample the tail).

    Deterministic shared-Python contract (the same single-implementation
    rule the classifier/DSIR fits use): BOTH the Spark operator and the
    DuckDB oracle derive their own per-stratum counts, then run them
    through THIS function, so the integer quotas embedded in each plan
    are identical by construction. Internally: strata processed in
    sorted order (the float accumulation order is pinned), ideal shares
    floor'd, the remainder distributed by largest fractional part (ties
    → lexicographically smaller stratum), then each quota capped at its
    stratum population (freed units are NOT redistributed — a stratum
    smaller than its share is simply kept whole, the standard behavior
    when a rare language undershoots its temperature share)."""
    import math

    if total < 0 or not counts:
        return {s: 0 for s in counts}
    strata = sorted(counts)
    w = {s: float(counts[s]) ** alpha if counts[s] > 0 else 0.0 for s in strata}
    acc = 0.0
    for s in strata:
        acc += w[s]
    if acc <= 0.0:
        return {s: 0 for s in strata}
    ideal = {s: total * w[s] / acc for s in strata}
    base = {s: int(math.floor(ideal[s])) for s in strata}
    rem = total - sum(base.values())
    for s in sorted(strata, key=lambda s: (-(ideal[s] - base[s]), s))[:rem]:
        base[s] += 1
    return {s: min(int(counts[s]), base[s]) for s in strata}


def alpha_sample(
    df: DataFrame,
    key_cols: list[str],
    strata_col: str,
    total: int,
    alpha: float,
    salt: str = "alpha",
    headroom: int = 4,
) -> DataFrame:
    """EXACT-quota temperature sampling: draw alpha_quotas(...) rows
    per stratum, deterministically — the rows with the smallest salted
    key-hashes win, so the selection is stable under retries,
    repartitioning, and engine replay.

    Scale shape: the stratum counts are one map-side-combined groupBy
    (domain-sized, collected as metadata); quotas and integer prefilter
    thresholds broadcast back. The PREFILTER keeps ~headroom×quota rows
    per stratum via the same integer-threshold arithmetic as
    balance_by_quota (thr = min(BUCKETS, (headroom·q·BUCKETS + n div 2)
    div n)), so the per-stratum exact rank window runs over a
    quota-sized survivor set instead of the full stratum — a hot
    stratum at fleet scale ranks thousands of rows, not billions. The
    prefilter is PART OF THE SPEC (the oracle replays it), so the
    result is engine-exact regardless of the headroom margin; with
    4× headroom the chance the rank-selected set differs from the
    unfiltered ideal is negligible, and any such difference is still
    deterministic and identical on both engines.

    Returns the input columns + ``rk`` (1-based hash rank within the
    stratum, ≤ quota)."""
    spark = df.sparkSession
    counts = {
        r[strata_col]: int(r["__n"])
        for r in df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    quotas = alpha_quotas(counts, total, alpha)
    rows = []
    for s in sorted(counts):
        n, q = counts[s], quotas[s]
        # max(1, ...): a huge stratum with a small positive quota (n >
        # 2·headroom·q·BUCKETS — real at fleet scale) rounds the
        # threshold to 0 and would silently return ZERO rows for a
        # stratum alpha_quotas assigned a share. At thr=1 the expected
        # survivor count is n/BUCKETS ≥ 2·headroom·q in exactly that
        # regime, so the rank window still fills the quota.
        thr = (
            max(1, min(_BUCKETS, (headroom * q * _BUCKETS + n // 2) // n))
            if n and q
            else 0
        )
        rows.append((s, q, thr))
    from pyspark.sql.types import LongType, StructField, StructType

    # quota-frame stratum field inherits the input column's real type —
    # a hardcoded string here would join a non-string stratum through an
    # implicit cast (or fail outright)
    qdf = F.broadcast(
        small_df(
            spark,
            rows,
            StructType(
                [
                    StructField(strata_col, df.schema[strata_col].dataType),
                    StructField("__q", LongType()),
                    StructField("__thr", LongType()),
                ]
            ),
        )
    )
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    h = md5_prefix_long(F.concat_ws("|", key, F.lit(salt)), _HASH_HEX_DIGITS)
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        F.col("__h"), *[F.col(c) for c in key_cols]
    )
    return (
        df.join(qdf, strata_col)
        .filter(h % _BUCKETS < F.col("__thr"))
        .withColumn("__h", h)
        .withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= F.col("__q"))
        .select(*df.columns, "rk")
    )
