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

from ..session import small_df

# Separator for merged symbols. Word tokens are whitespace-split, so no
# input symbol can contain a space — "w1 w2" is collision-free with any
# raw token and keeps merged symbols readable.
MERGE_SEP = " "


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


def _pair_count_gen(sep: str, repls: tuple[tuple[str, str], ...] = ()):
    """mapInPandas generator: packed-corpus batches → PARTIAL adjacent-
    pair counts (w1, w2, c) — overlapping counts, exactly the explode+
    count of the expression form, but one python Counter pass per Arrow
    batch instead of an interpreted transform/get lambda per position
    (the HOF path measured 0.8-8 s per round at sf0.1; this is <0.3 s).
    Partial aggregation per batch keeps the shuffle vocabulary²-bounded,
    same as partial groupBy aggregation would.

    ``repls`` replays the merges accepted so far onto each packed
    string before counting (``str.replace`` — left-to-right
    non-overlapping, byte-identical to the JVM ``replace`` the packed
    encoder uses). Applying them HERE instead of layering per-round
    ``F.replace`` projections keeps every round's JVM plan IDENTICAL,
    so whole-stage codegen compiles once for the whole training loop
    instead of once per round (the per-round recompile made the cold
    loop ~18 s at sf0.1; with a constant plan it is the one-time Arrow
    stage cost)."""

    def gen(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            cnt: Counter = Counter()
            for s in pdf["__p"]:
                if not s:  # empty or NULL doc packs to ""/None — no pairs
                    continue
                for pat, rep in repls:
                    s = s.replace(pat, rep)
                syms = s[1:-1].split(sep)
                cnt.update(zip(syms, syms[1:]))
            if cnt:
                yield pd.DataFrame(
                    ((a, b, c) for (a, b), c in cnt.items()),
                    columns=["w1", "w2", "c"],
                )

    return gen


def bpe_train_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 8,
    min_count: int = 2,
    checkpoint_dir: str | None = None,
    fold_every: int = 16,
) -> DataFrame:
    """Train ``n_merges`` BPE merges over ``text_col``; stop early when
    the best remaining pair occurs fewer than ``min_count`` times.
    Tie-break (count desc, w1 asc, w2 asc) makes the whole table
    deterministic. Pair counts are OVERLAPPING adjacent counts (the
    standard implementation shape: "a a a" counts (a,a) twice) while the
    rewrite merges non-overlapping left-to-right.

    r11 round-cost shape (replacing the array-fold + per-round
    checkpoint loop — identical merge tables, naive-equivalence
    pytest-pinned):

    - the corpus is packed ONCE into the sentinel-string form of
      :func:`bpe_encode_packed` (``US+s1+US US+s2+US …``), checkpointed,
      and NEVER rewritten: the merge state is the driver-side merge
      list, replayed onto each packed string inside the count pass
      (``str.replace`` ≡ the JVM ``replace`` of the packed encoder);
    - pair counting is a vectorized Arrow ``mapInPandas`` partial count
      (one Counter pass per batch) feeding a vocabulary²-bounded
      groupBy SUM and a 1-row TakeOrdered — ONE job per round, and
      every round shares the IDENTICAL JVM plan over the checkpointed
      base, so codegen compiles once for the whole loop;
    - rounds re-apply the accepted merges: round j replays j string
      scans, so between fold-ins the replay work is QUADRATIC in the
      pending-merge count — O(fold_every² · corpus) per fold window,
      O(n_merges · fold_every · corpus) total (NOT O(n_merges ·
      corpus); ADVICE r11 caught the original claim). ``fold_every``
      bounds it: every ``fold_every`` accepted merges the pending
      replacements are folded into the base as one JVM ``replace``
      chain + re-checkpoint (a ``bpe_encode_packed``-style pass), the
      pending list resets, and per-round replay cost stays O(≤
      fold_every · corpus) no matter how large ``n_merges`` grows. The
      JVM plan is identical WITHIN a fold window (codegen compiles
      once per window, not per round);
    - fault tolerance: reliable ``checkpoint()`` mode (``checkpoint_dir``
      / $SPARK_GRAFT_CHECKPOINT_DIR, see session.iter_checkpoint) now
      protects the ONLY cluster-side state — the packed base; everything
      else is driver metadata, so executor loss costs one round's job.

    Like ``bpe_encode_packed``, the packed form raises on corpora
    containing the \\x1f/\\x1e sentinel bytes (they would forge symbol
    boundaries); pre-clean such a corpus (functions.text.
    clean_control_chars) before training.

    Returns (step, w1, w2, pair_count, merged) — ``n_merges`` rows."""
    from ..session import iter_checkpoint
    from ..sources.readers import fan_out

    spark = df.sparkSession
    toks = tokens_ws_lower(F.col(text_col))
    packed = F.when(
        F.col(text_col).contains(PACK_WRAP) | F.col(text_col).contains(PACK_JOIN),
        F.raise_error(
            F.lit(
                "bpe_train_merges: text contains sentinel bytes \\x1f/\\x1e; "
                "pre-clean the corpus (clean_control_chars) before training"
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
    base = iter_checkpoint(
        fan_out(df).select(packed.alias("__p")), checkpoint_dir
    )
    merges: list[tuple[int, str, str, int, str]] = []
    repls: list[tuple[str, str]] = []
    try:
        for step in range(n_merges):
            gen = _pair_count_gen(PACK_WRAP + PACK_WRAP, tuple(repls))
            top = (
                base.mapInPandas(gen, schema="w1 string, w2 string, c long")
                .groupBy("w1", "w2")
                .agg(F.sum("c").alias("c"))
                .orderBy(F.col("c").desc(), "w1", "w2")
                .limit(1)
                .collect()
            )
            if not top or top[0]["c"] < min_count:
                break
            w1, w2, c = top[0]["w1"], top[0]["w2"], int(top[0]["c"])
            merges.append((step, w1, w2, c, w1 + MERGE_SEP + w2))
            repls.append(
                (
                    PACK_WRAP + w1 + PACK_WRAP + PACK_WRAP + w2 + PACK_WRAP,
                    PACK_WRAP + w1 + MERGE_SEP + w2 + PACK_WRAP,
                )
            )
            if fold_every > 0 and len(repls) >= fold_every and step < n_merges - 1:
                # fold the pending merges into the base (one JVM
                # replace chain — identical semantics to the in-count
                # str.replace replay, bpe_encode_packed's pass) and
                # re-checkpoint, so replay cost per round stays
                # bounded by fold_every for arbitrarily long runs
                folded = F.col("__p")
                for pat, rep in repls:
                    folded = F.replace(folded, F.lit(pat), F.lit(rep))
                new_base = iter_checkpoint(
                    base.select(folded.alias("__p")), checkpoint_dir
                )
                base.unpersist()
                base = new_base
                repls.clear()
    finally:
        base.unpersist()
    return small_df(
        spark, merges,
        "step int, w1 string, w2 string, pair_count bigint, merged string",
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
