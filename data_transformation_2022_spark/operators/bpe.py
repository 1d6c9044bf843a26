"""Distributed BPE-merge training over a document corpus.

The tokenizer-training half of a training-data pipeline: given the
corpus as whitespace token sequences, repeatedly (1) count adjacent
symbol pairs corpus-wide, (2) pick the most frequent pair, (3) rewrite
every sequence with that pair merged — the classic byte-pair-encoding
loop (Sennrich et al. 2016), run here at WORD granularity so the merge
table learns collocations ("new york"-style units) rather than subwords.

Scale shape, per merge round:
- pair counting is a narrow per-row transform (no positional self-join)
  followed by ONE partially-aggregated groupBy whose output is
  vocabulary²-bounded, and the argmax is a 1-row TakeOrdered — never a
  global sort;
- the winning pair goes driver-side as one metadata row, then the merge
  is applied corpus-wide as a pure JVM ``aggregate()`` lookbehind fold
  (left-to-right non-overlapping, exactly the sequential BPE semantics)
  — zero Python in the rewrite path;
- the rewritten corpus is lineage-truncated each round (executor-local
  ``localCheckpoint`` by default; reliable ``checkpoint()`` when a
  checkpoint_dir is configured — see session.iter_checkpoint) so lineage
  (and Catalyst analysis cost) stays flat across rounds instead of
  nesting one lambda per merge.

The returned merge table is metadata-sized (``n_merges`` rows) by
construction. Exactness is gated by a pytest that replays the naive
single-process BPE loop on the same corpus and asserts the merge tables
are identical (tests/test_extensions.py) — the loop is iterative, so
there is no single-statement SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Separator for merged symbols. Word tokens are whitespace-split, so no
# input symbol can contain a space — "w1 w2" is collision-free with any
# raw token and keeps merged symbols readable.
MERGE_SEP = " "


def _adjacent_pairs(syms: F.Column) -> F.Column:
    """Array of (w1, w2) structs for each adjacent position — the same
    slice(transform(sequence...)) shape as functions.text.word_bigrams
    (see its docstring for why slice-then-probe instead of CASE)."""
    return F.expr(
        "slice(transform(sequence(0, greatest(size({c}) - 2, 0)),"
        " i -> struct(get({c}, i) AS w1, get({c}, i+1) AS w2)),"
        " 1, greatest(size({c}) - 1, 0))".format(c="__syms")
    )


def _apply_merge(syms: F.Column, w1: str, w2: str) -> F.Column:
    """Left-to-right non-overlapping merge of (w1, w2) -> "w1 w2" via a
    lookbehind fold: append each symbol unless it completes the pair
    with the accumulator's last element, in which case replace that
    element with the merged symbol. Because the merged symbol is a new
    string, a just-merged element can never re-trigger the same pair —
    overlapping runs resolve left-first exactly like sequential BPE
    ("a a a" with (a,a) -> ["a a", "a"]). Array-copy cost is O(len²)
    per document per round, bounded by max document length; the Arrow
    ``mapInPandas`` rewrite is the escape hatch if sequences ever get
    book-length."""
    merged = w1 + MERGE_SEP + w2
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(w1))
            & (x == F.lit(w2)),
            F.concat(
                F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
    min_count: int = 2,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Train ``n_merges`` BPE merges over ``text_col``; stop early when
    the best remaining pair occurs fewer than ``min_count`` times.
    Tie-break (count desc, w1 asc, w2 asc) makes the whole table
    deterministic. Pair counts are OVERLAPPING adjacent counts (the
    standard implementation shape: "a a a" counts (a,a) twice) while the
    rewrite merges non-overlapping left-to-right.

    ``checkpoint_dir`` (or $SPARK_GRAFT_CHECKPOINT_DIR) switches the
    per-round lineage truncation from executor-local ``localCheckpoint``
    to reliable ``checkpoint()`` — see session.iter_checkpoint: a
    multi-hour merge loop at fleet scale must survive executor loss.
    Identical merge tables either way (pytest-pinned).

    Returns (step, w1, w2, pair_count, merged) — ``n_merges`` rows."""
    from ..session import iter_checkpoint
    from ..sources.readers import fan_out

    spark = df.sparkSession
    cur = iter_checkpoint(
        fan_out(df).select(tokens_ws_lower(F.col(text_col)).alias("__syms")),
        checkpoint_dir,
    )
    merges: list[tuple[int, str, str, int, str]] = []
    try:
        for step in range(n_merges):
            top = (
                cur.select(F.explode(_adjacent_pairs(F.col("__syms"))).alias("p"))
                .groupBy("p.w1", "p.w2")
                .agg(F.count("*").alias("c"))
                .orderBy(F.col("c").desc(), "w1", "w2")
                .limit(1)
                .collect()
            )
            if not top or top[0]["c"] < min_count:
                break
            w1, w2, c = top[0]["w1"], top[0]["w2"], int(top[0]["c"])
            merges.append((step, w1, w2, c, w1 + MERGE_SEP + w2))
            nxt = iter_checkpoint(
                cur.select(_apply_merge(F.col("__syms"), w1, w2).alias("__syms")),
                checkpoint_dir,
            )
            cur.unpersist()
            cur = nxt
    finally:
        cur.unpersist()
    return spark.createDataFrame(
        merges, schema="step int, w1 string, w2 string, pair_count bigint, merged string"
    )


def tokens_ws_lower(text: F.Column) -> F.Column:
    from ..functions.text import tokens_ws

    return tokens_ws(F.lower(text))


def bpe_encode(df: DataFrame, text_col: str, merges: list[tuple[str, str]]) -> DataFrame:
    """Apply an ordered merge list to a corpus (the inference half):
    replays each merge with the same lookbehind fold. Returns the input
    plus ``__syms`` (the encoded symbol array) and ``n_syms``."""
    out = df.withColumn("__syms", tokens_ws_lower(F.col(text_col)))
    for w1, w2 in merges:
        out = out.withColumn("__syms", _apply_merge(F.col("__syms"), w1, w2))
    return out.withColumn("n_syms", F.size("__syms"))


# Sentinels for the packed (string-form) encoder. Tokens are
# whitespace-split so neither byte can occur inside a symbol.
PACK_WRAP = "\x1f"  # wraps every symbol: US+sym+US
PACK_JOIN = "\x1e"  # joins symbols in the fingerprint form


def bpe_encode_packed(
    df: DataFrame, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """The packed-string twin of ``bpe_encode``: represent the symbol
    sequence as ``US+s1+US US+s2+US …`` and replay each merge as ONE
    native ``replace`` — left-to-right non-overlapping replace-all is
    exactly the lookbehind fold's semantics (a just-merged symbol can
    never re-trigger its own pair, and sentinel wrapping makes partial-
    token matches impossible), but it runs as a JVM string scan instead
    of O(len²) array-copy folds — measured ~10× faster per merge on the
    bench corpus. Equivalence with ``bpe_encode`` is pytest-pinned.

    Returns the input plus ``n_syms`` and ``syms`` (the PACK_JOIN-joined
    symbol string, ready for fingerprinting)."""
    toks = tokens_ws_lower(F.col(text_col))
    # Sentinel-injection guard: \x1f/\x1e are NOT regex whitespace, so a
    # crawl document containing them would carry them INSIDE tokens,
    # where they would forge bucket boundaries and silently diverge from
    # the fold encoder (e.g. "a\x1fa a\x1fa" would false-merge across
    # the token-internal sentinel). Raise rather than corrupt; callers
    # with dirty corpora pre-clean or use the sentinel-free bpe_encode.
    wrapped = F.when(
        F.col(text_col).contains(PACK_WRAP) | F.col(text_col).contains(PACK_JOIN),
        F.raise_error(
            F.lit(
                "bpe_encode_packed: text contains sentinel bytes \\x1f/\\x1e; "
                "pre-clean the corpus or use the array-fold bpe_encode"
            )
        ),
    ).otherwise(
        F.when(F.size(toks) == 0, F.lit("")).otherwise(
            F.concat(
                F.lit(PACK_WRAP),
                F.array_join(toks, PACK_WRAP + PACK_WRAP),
                F.lit(PACK_WRAP),
            )
        )
    )
    for w1, w2 in merges:
        pat = PACK_WRAP + w1 + PACK_WRAP + PACK_WRAP + w2 + PACK_WRAP
        rep = PACK_WRAP + w1 + MERGE_SEP + w2 + PACK_WRAP
        wrapped = F.replace(wrapped, F.lit(pat), F.lit(rep))
    n_syms = (
        (F.length(wrapped) - F.length(F.replace(wrapped, F.lit(PACK_WRAP), F.lit(""))))
        / 2
    ).cast("bigint")
    syms = F.when(wrapped == "", F.lit("")).otherwise(
        F.replace(
            F.substring(wrapped, 2, F.length(wrapped) - 2),
            F.lit(PACK_WRAP + PACK_WRAP),
            F.lit(PACK_JOIN),
        )
    )
    return df.withColumn("n_syms", n_syms).withColumn("syms", syms)
