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

from ..functions.text import md5_prefix_long

# 8 hex digits = 32 bits of hash → rate granularity 1/2^32; the modulus
# keeps the arithmetic in exact int64 territory on any engine.
_BUCKETS = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform bucket in [0, 1e6) derived from md5(key || salt). The salt
    decorrelates independent samples drawn from the same keys (e.g. a
    train/validation split followed by a 1% eval subsample)."""
    return md5_prefix_long(F.concat_ws("|", key, F.lit(salt)), 8) % _BUCKETS


def hash_sample(
    df: DataFrame, key_cols: list[str], rate: float, salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_cols``."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    return df.filter(hash_bucket(key, salt) < int(rate * _BUCKETS))


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
    threshold: Column = F.lit(int(default_rate * _BUCKETS))
    for value, rate in rates.items():
        threshold = (
            F.when(F.col(strata_col) == value, F.lit(int(rate * _BUCKETS))).otherwise(
                threshold
            )
        )
    return df.filter(hash_bucket(key, salt) < threshold)


def split_train_eval(
    df: DataFrame, key_cols: list[str], eval_fraction: float, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive, deterministic train/eval split — same hash,
    complementary predicates, so every row lands in exactly one side on
    every engine and every re-run."""
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    cut = int(eval_fraction * _BUCKETS)
    bucket = hash_bucket(key, salt)
    return df.filter(bucket >= cut), df.filter(bucket < cut)
