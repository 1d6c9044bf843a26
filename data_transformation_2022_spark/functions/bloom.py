"""Bloom-filter runtime join pruning.

The 100 TB join problem this solves: ``fact JOIN dim`` where the dim
side is *filtered* down to a small key set but the fact side still
shuffles in full — at scale the fact exchange dominates the query. A
Bloom filter over the filtered dim keys, broadcast to the fact scan,
drops non-matching fact rows BEFORE the exchange, cutting shuffled
bytes by roughly the dim filter's selectivity. False positives only
let a few extra rows through; the real join re-checks key equality, so
the RESULT is exact for any false-positive rate — which is why the
oracle for `join_bloom_pruned` is the plain SQL join.

This is the explicit, deterministic form of Spark's own runtime
row-level filtering (`spark.sql.optimizer.runtime.bloomFilter.*`,
SPARK-32268): building it by hand keeps the plan shape gateable in
tests and works regardless of optimizer heuristics/statistics.

Scale shape:

* the filter is built with ONE partially-aggregated groupBy over the
  (small) filtered dim keys: k hash positions per key exploded
  map-side, `bit_or` combines per 64-bit word — the shuffle carries at
  most ``m/64`` word rows, never the keys;
* the assembled word array is metadata-sized BY CONSTRUCTION: ``m`` is
  capped (default 2^27 bits = 16 MiB) — past the cap the false-positive
  rate degrades gracefully (less pruning, same exact result) instead of
  the driver/broadcast blowing up;
* the probe is a 1-row broadcast (BroadcastNestedLoopJoin with a
  single build row — the repo's z-order bounds idiom) plus pure
  codegen'd bit tests: ``xxhash64`` positions, ``element_at`` word
  lookup, shift/mask — no Python anywhere;
* at 1000 executors the word array ships once per executor like any
  broadcast variable, and the pruned fact exchange is the win.

The reference has no runtime filters (single-node pandas joins need
none); this is extension surface a distributed engine needs.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import small_df

log = logging.getLogger(__name__)

# Default sizing: 16 bits/key with 6 hashes → ~0.9% false positives.
BITS_PER_KEY = 16
N_HASHES = 6
# Hard cap on the bit-array size (2^27 bits = 16 MiB of words): past
# this the fpp degrades instead of the broadcast growing unboundedly.
MAX_BITS = 1 << 27
MIN_BITS = 1 << 10


@dataclass(frozen=True)
class BloomFilter:
    """A built Bloom filter: ``m`` bits in 64-bit words, ``k`` hashes.

    ``words`` lives on the driver (metadata-sized by the MAX_BITS cap)
    and is shipped to executors as a 1-row broadcast relation, not a
    plan literal — the query plan stays constant-size however big the
    filter is.
    """

    words: list[int]
    m: int
    k: int
    n_keys: int


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _positions(key: Column, m: int, k: int) -> list[Column]:
    # xxhash64(key, seed) & (m-1): m is a power of two, and two's-
    # complement AND of the signed hash with a positive mask is already
    # non-negative — no pmod needed.
    return [F.xxhash64(key, F.lit(i)).bitwiseAND(F.lit(m - 1)) for i in range(k)]


def bloom_build(
    keys: DataFrame,
    key: Column | str,
    bits_per_key: int = BITS_PER_KEY,
    n_hashes: int = N_HASHES,
    max_bits: int = MAX_BITS,
) -> BloomFilter:
    """Build a Bloom filter over ``keys``'s ``key`` column.

    Distributed build: explode the k bit positions per key (map-side),
    one partially-aggregated groupBy on the word index with ``bit_or``
    of the set bit — the only shuffle is ≤ m/64 word rows. The word
    array returned to the driver is bounded by ``max_bits`` (16 MiB
    default), the same contract as the repo's other driver-side fit
    literals: metadata-sized by construction.
    """
    key = F.col(key) if isinstance(key, str) else key
    if max_bits & (max_bits - 1):
        # the probe mask and word-array sizing both assume a power of
        # two; floor rather than crash — fpp changes, results never do
        max_bits = 1 << (max_bits.bit_length() - 1)
    # two passes are inherent (m must be known before positions hash),
    # so pin the key set across them instead of recomputing the dim
    # pipeline twice — unless the caller already persisted it (then
    # the unpersist below must not drop THEIR cache)
    ours = keys.storageLevel.useMemory is False and keys.storageLevel.useDisk is False
    if ours:
        keys = keys.persist()
    try:
        n = keys.count()
        m = min(max(_next_pow2(bits_per_key * max(n, 1)), MIN_BITS), max_bits)
        if bits_per_key * max(n, 1) > max_bits:
            log.warning(
                "bloom_build: %d keys want %d bits, capped at %d — false-positive "
                "rate degrades (results stay exact, pruning gets weaker)",
                n, bits_per_key * n, max_bits,
            )
        pos = F.explode(F.array(*_positions(key, m, n_hashes))).alias("pos")
        words = (
            keys.select(pos)
            .select(
                F.shiftright(F.col("pos"), 6).alias("word"),
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos & 63 AS INT))").alias("bit"),
            )
            .groupBy("word")
            .agg(F.expr("bit_or(bit)").alias("bits"))
            .collect()
        )
    finally:
        if ours:
            keys.unpersist()
    arr = [0] * (m // 64)
    for r in words:
        arr[r["word"]] = r["bits"]
    return BloomFilter(words=arr, m=m, k=n_hashes, n_keys=n)


def bloom_prune(df: DataFrame, key: Column | str, bloom: BloomFilter) -> DataFrame:
    """Keep only rows whose ``key`` *may* be in ``bloom`` (no false
    negatives; false positives pass through and must be re-checked by
    whatever join/filter follows).

    The word array rides a single-row broadcast relation
    (BroadcastNestedLoopJoin with one build row), so the plan is
    constant-size; the membership test is pure codegen — xxhash64,
    element_at, shift, mask — per hash function.
    """
    key = F.col(key) if isinstance(key, str) else key
    spark = df.sparkSession
    bits_df = small_df(
        spark, [(bloom.words,)], "__bloom_bits array<bigint>"
    )
    probed = df.withColumn("__bloom_key", key).crossJoin(F.broadcast(bits_df))
    terms = []
    for i in range(bloom.k):
        pos = f"(xxhash64(__bloom_key, {i}) & {bloom.m - 1})"
        terms.append(
            f"((element_at(__bloom_bits, CAST(({pos}) >> 6 AS INT) + 1)"
            f" >> CAST(({pos}) & 63 AS INT)) & CAST(1 AS BIGINT)) = 1"
        )
    return probed.filter(" AND ".join(terms)).drop("__bloom_key", "__bloom_bits")


def bloom_pruned_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "inner",
    bits_per_key: int = BITS_PER_KEY,
    n_hashes: int = N_HASHES,
) -> DataFrame:
    """``fact JOIN dim`` with a Bloom-filter prefilter on the fact side.

    Builds the filter from ``dim``'s (already filtered) keys, prunes
    ``fact`` before its exchange, then runs the ordinary equi-join —
    which re-checks the key, so the result equals the plain join for
    ANY false-positive rate. The win is the pruned fact shuffle.

    Only join types where dropping non-matching FACT rows is sound are
    accepted: inner, the left-semi family, and right outer (whose
    output never contains an unmatched fact row either). A left/full
    outer or anti join must SEE the non-matching fact rows the filter
    exists to drop — pruning would corrupt them, so those raise.

    Both key columns must have the same data type: ``xxhash64`` is
    type-sensitive (the INT 5 and the BIGINT 5 hash differently), so a
    mismatch would turn the equi-join's implicit cast into silent
    Bloom false NEGATIVES. Cast one side explicitly instead.
    """
    # normalize the way Spark's own JoinType.apply does (case- and
    # underscore-insensitive), so every Spark-accepted spelling of a
    # sound type ('Inner', 'RIGHT', 'rightOuter') is accepted here too
    sound = {"inner", "semi", "leftsemi", "right", "rightouter"}
    if how.lower().replace("_", "") not in sound:
        raise ValueError(
            f"bloom_pruned_join(how={how!r}): pruning the fact side drops "
            f"exactly the rows a left/full outer or anti join must keep; "
            f"use the plain join for those types."
        )
    ft = fact.schema[fact_key].dataType
    dt = dim.schema[dim_key].dataType
    if ft != dt:
        raise ValueError(
            f"bloom_pruned_join: fact[{fact_key}] is {ft} but dim[{dim_key}] "
            f"is {dt}; xxhash64 is type-sensitive, so the Bloom probe would "
            f"produce false negatives. Cast one side first."
        )
    bloom = bloom_build(
        dim.select(dim_key), dim_key,
        bits_per_key=bits_per_key, n_hashes=n_hashes,
    )
    if bloom.n_keys == 0:
        # empty dim: every SOUND join type produces an empty result
        # (inner/semi need a match; every right-outer output row
        # corresponds to a dim row) — skip the probe noise
        return fact.join(dim, fact.__getattr__(fact_key) == dim.__getattr__(dim_key), how).limit(0)
    pruned = bloom_prune(fact, fact_key, bloom)
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
