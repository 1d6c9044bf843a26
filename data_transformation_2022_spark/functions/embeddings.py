"""Corpus-trained word embeddings for header-name semantics
(PPMI + truncated SVD) — the in-repo replacement for the reference's
pretrained word2vec model.

The reference loads GoogleNews word2vec vectors (reference
utils.py:13) and uses them for (a) the planner's semantic-distance
Load axis (utils.py:176-213 ``w2v``, searchthread.py) and (b) the
profiler's semantic column-name clustering (spreadsheet.py:230-253,
DBSCAN eps=0.5/min_samples=5 over the name vectors). This environment
has no pretrained model and no network, so the engine ships three
tiers, best available wins:

1. a REAL pretrained model, if the environment ever gains one
   (env hook, see plans/load.py);
2. THIS module — embeddings trained on the user's own corpus with
   PPMI + truncated SVD, which factorizes the same objective
   word2vec's skip-gram-negative-sampling optimizes (Levy & Goldberg,
   "Neural Word Embedding as Implicit Matrix Factorization",
   NeurIPS 2014) while staying fully deterministic (exact integer
   co-occurrence counts → a fixed matrix → one numpy SVD) — no
   external weights, reproducible across runs and partitionings;
3. the model-free token/char-ngram stand-in (plans/search.py
   name_distance, profiler.semantic_name_clusters) — always-on
   default, so golden outputs never depend on a corpus.

Scale shape: tokenization + windowed pair generation + counting are
distributed (``slice``+``arrays_zip`` per offset — codegen'd, no
per-element lambdas) and reduce to a vocabulary-bounded table; only
the ≤ vocab² co-occurrence triplets are collected (metadata-sized,
independent of corpus size — the synopsis-collect convention). The
dense PPMI matrix is vocab×vocab; the default vocab (2000) keeps the
driver-side SVD in the tens-of-MB / seconds range.
"""

from __future__ import annotations

import re

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import STOPWORDS, tokens_ws

DEFAULT_WINDOW = 5
DEFAULT_VOCAB = 2000
DEFAULT_DIM = 64


def cooccurrence_pairs(
    df: DataFrame, text_col: str, window: int = DEFAULT_WINDOW
) -> DataFrame:
    """Symmetric windowed co-occurrence pairs (center, context), one
    row per (position, offset ≤ window) occurrence — the standard
    word2vec/GloVe counting scheme (unweighted window). For each
    offset d the pair stream is ``arrays_zip(slice(toks, 1, n-d),
    slice(toks, d+1, n-d))`` — built-in array ops, no higher-order
    lambdas (the interpreted-HOF trap, BENCH_NOTES r10/r11). Both the
    per-offset arrays AND the swapped (symmetric) direction are
    concat'd per row and exploded ONCE, so the corpus is scanned and
    tokenized exactly once — the r11 per-offset union form re-scanned
    the unpersisted corpus ~2·window times (ADVICE r11)."""
    from ..sources.readers import fan_out

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    toked = fan_out(df).select(
        tokens_ws(F.lower(F.col(text_col))).alias("__toks")
    )
    n = F.size("__toks")
    arrs = []
    for d in range(1, window + 1):
        ln = F.greatest(n - d, F.lit(0))
        fwd = F.slice(F.col("__toks"), 1, ln)
        bwd = F.slice(F.col("__toks"), d + 1, ln)
        arrs.append(F.arrays_zip(fwd.alias("a"), bwd.alias("b")))
        arrs.append(F.arrays_zip(bwd.alias("a"), fwd.alias("b")))
    return (
        toked.filter(n > 1)
        .select(F.explode(F.concat(*arrs)).alias("p"))
        .select(F.col("p.a").alias("center"), F.col("p.b").alias("context"))
    )


def cooccurrence_topk(
    df: DataFrame, text_col: str, window: int = DEFAULT_WINDOW, k: int = 100
) -> DataFrame:
    """Top-k symmetric co-occurrence counts — the exact-oracle query
    surface over the pair stream (count desc, center, context ties:
    fully deterministic). Partially-aggregated groupBy + a k-row
    TakeOrdered; never a global sort."""
    return (
        cooccurrence_pairs(df, text_col, window)
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_cooc"))
        .orderBy(F.col("n_cooc").desc(), "center", "context")
        .limit(k)
    )


# (fit_key, window, vocab_size, dim, min_count) -> trained vector
# table. The fit is deterministic per (data, params) — the same
# contract as functions/text._FIT_CACHE for the quality classifier —
# so sharing it across repeat invocations (a min-of-2 bench, the
# profiler hook plus the neighbors query in one session) skips the
# two bounded collect jobs and the vocab²-sized numpy SVD. Keys are
# caller-scoped (use text.data_fit_key for a version-aware key);
# entries are treated as READ-ONLY by every consumer. Call
# clear_ppmi_cache() after regenerating data at a previously-keyed
# path (data_fit_key's mtime token covers on-disk rewrites already).
_PPMI_CACHE: dict[tuple, dict[str, np.ndarray]] = {}


def clear_ppmi_cache() -> None:
    """Invalidate every memoized PPMI-SVD fit (the embeddings
    counterpart of text.clear_fit_cache)."""
    _PPMI_CACHE.clear()


def train_ppmi_svd(
    df: DataFrame,
    text_col: str,
    window: int = DEFAULT_WINDOW,
    vocab_size: int = DEFAULT_VOCAB,
    dim: int = DEFAULT_DIM,
    min_count: int = 2,
    fit_key: tuple | None = None,
) -> dict[str, np.ndarray]:
    """Train token embeddings on a corpus: exact distributed
    co-occurrence counts over the top-``vocab_size`` tokens, PPMI
    transform, rank-``dim`` truncated SVD, vectors = U_d·√Σ_d (the
    symmetric weighting Levy & Goldberg recommend). Deterministic end
    to end: counts are exact integers (partition-order independent),
    vocabulary ties break lexicographically, and each singular vector's
    sign is pinned to make its largest-|entry| positive.

    Returns {token: float64[dim≤]} (dim is capped by the matrix rank).
    READ-ONLY when ``fit_key`` is given — the cached table is shared.

    ``fit_key``: optional caller-scoped identity of the corpus (e.g.
    ``text.data_fit_key(sf_dir, "documents", "ppmi")``). When given,
    the trained table is memoized under (fit_key, window, vocab_size,
    dim, min_count) — the quality-classifier _FIT_CACHE convention
    (functions/text.py); the caller owns key correctness.
    """
    from ..sources.readers import fan_out

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")
    cache_key = (
        (fit_key, window, vocab_size, dim, min_count)
        if fit_key is not None
        else None
    )
    if cache_key is not None:
        cached = _PPMI_CACHE.get(cache_key)
        if cached is not None:
            # shallow copy: the dict is the consumer's to reshape, the
            # arrays stay shared but are frozen below, so an in-place
            # normalize can't corrupt later cache hits (ADVICE r12 —
            # "READ-ONLY" is now enforced, not just documented)
            return dict(cached)
    # ONE tokenized frame feeds both passes (vocabulary count + pair
    # count) — persisted so the corpus is scanned and tokenized once;
    # try/finally so a failed collect/job can't leak the persisted
    # frame for the session's lifetime (ADVICE r11)
    toked = fan_out(df).select(
        tokens_ws(F.lower(F.col(text_col))).alias("__toks")
    ).persist()
    try:
        vecs = _train_ppmi_svd_impl(toked, window, vocab_size, dim, min_count)
    finally:
        toked.unpersist()
    if cache_key is not None:
        for arr in vecs.values():
            arr.flags.writeable = False
        _PPMI_CACHE[cache_key] = vecs
        return dict(vecs)
    return vecs


def _train_ppmi_svd_impl(
    toked: DataFrame, window: int, vocab_size: int, dim: int, min_count: int
) -> dict[str, np.ndarray]:
    vocab_rows = (
        toked.select(F.explode("__toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= min_count)
        .orderBy(F.col("c").desc(), "tok")
        .limit(vocab_size)
        .collect()
    )
    vocab = [r["tok"] for r in vocab_rows]
    if len(vocab) < 2:
        return {}
    idx = {t: i for i, t in enumerate(vocab)}
    # Pair counting for TRAINING runs as an Arrow partial-Counter pass
    # (the bpe-trainer counting shape): one python loop per batch with
    # the vocabulary filter applied in the closure, emitting ≤ vocab²
    # partial rows per batch — no 2·window-way explode, no string-pair
    # shuffle (measured 22-28 s → ~4 s for the neighbors query at
    # sf0.1). Integer counts are EXACTLY those of cooccurrence_pairs
    # (pytest-pinned), which stays the declarative, oracle-replayable
    # form the corpus_cooccurrence_topk query uses.
    vset = frozenset(vocab)

    def pair_counts(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            cnt: Counter = Counter()
            for toks in pdf["__toks"]:
                if toks is None or len(toks) < 2:
                    continue
                nt = len(toks)
                for i, a in enumerate(toks):
                    if a not in vset:
                        continue
                    for d in range(1, min(window, nt - 1 - i) + 1):
                        b = toks[i + d]
                        if b in vset:
                            cnt[(a, b)] += 1
                            cnt[(b, a)] += 1
            if cnt:
                yield pd.DataFrame(
                    ((a, b, c) for (a, b), c in cnt.items()),
                    columns=["center", "context", "n"],
                )

    trips = (
        toked.mapInPandas(
            pair_counts, schema="center string, context string, n long"
        )
        .groupBy("center", "context")
        .agg(F.sum("n").alias("n"))
        .collect()  # ≤ vocab² triplets — metadata-sized by construction
    )
    V = len(vocab)
    M = np.zeros((V, V), dtype=np.float64)
    for r in trips:
        M[idx[r["center"]], idx[r["context"]]] = float(r["n"])
    total = M.sum()
    if total == 0:
        return {}
    rows = M.sum(axis=1, keepdims=True)
    cols = M.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log((M * total) / (rows @ cols))
    ppmi = np.where(np.isfinite(pmi) & (pmi > 0), pmi, 0.0)
    u, s, _ = np.linalg.svd(ppmi, full_matrices=False)
    d = min(dim, int((s > 1e-12).sum()))
    if d == 0:
        return {}
    u, s = u[:, :d], s[:d]
    # sign convention: largest-|entry| of each left singular vector > 0
    flips = np.sign(u[np.abs(u).argmax(axis=0), np.arange(d)])
    flips[flips == 0] = 1.0
    vecs = (u * flips) * np.sqrt(s)
    return {t: vecs[i].copy() for t, i in idx.items()}


_NAME_TOKEN_RE = re.compile(r"[a-z]+")


def name_tokens(name: str) -> list[str]:
    """Header-name tokens under the reference's w2v preprocessing shape
    (utils.py:165-174: lowercase, strip punctuation/numerics, drop
    stopwords)."""
    return [
        t
        for t in _NAME_TOKEN_RE.findall(name.lower())
        if t not in STOPWORDS
    ]


class NameEmbedder:
    """Header-name embedding + cosine distance over trained token
    vectors. Mirrors the reference's ``w2v(stype="multiple")``: a name
    embeds as the MEAN of its token vectors, and out-of-vocabulary
    tokens map to a fixed UNK vector (the reference uses
    ``w2v_model['TOKEN']``; here UNK = the vocabulary's mean vector) —
    so, like the reference, any two fully-OOV names have distance 0."""

    def __init__(self, vectors: dict[str, np.ndarray]):
        if not vectors:
            raise ValueError("NameEmbedder needs a non-empty vector table")
        self.vectors = vectors
        self.unk = np.mean(list(vectors.values()), axis=0)

    def embed(self, name: str) -> np.ndarray:
        toks = name_tokens(name) or ["TOKEN"]
        vs = [self.vectors.get(t, self.unk) for t in toks]
        return np.mean(vs, axis=0)

    def distance(self, a: str, b: str) -> float:
        """Cosine distance in [0, 2] clipped to [0, 1] (the planner's
        Load axis and the reference's scipy ``cosine`` both treat
        anti-correlation as max distance for ranking purposes)."""
        va, vb = self.embed(a), self.embed(b)
        na, nb = np.linalg.norm(va), np.linalg.norm(vb)
        if na == 0 or nb == 0:
            return 1.0
        d = 1.0 - float(va @ vb) / (na * nb)
        if abs(d) < 1e-12:  # identical-direction pairs (e.g. shared UNK)
            d = 0.0
        return float(min(1.0, max(0.0, d)))


def save_embeddings(vectors: dict[str, np.ndarray], path: str) -> None:
    """Persist a trained vector table as parquet (token,
    vector float64[]) — pyarrow directly, no SparkSession needed, so a
    serving process can load it before any Spark work starts (the
    persisted-IVF-index convention applied to the name model)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    toks = sorted(vectors)
    tbl = pa.table(
        {
            "token": pa.array(toks, pa.string()),
            "vector": pa.array(
                [vectors[t].tolist() for t in toks],
                pa.list_(pa.float64()),
            ),
        }
    )
    pq.write_table(tbl, path)


def load_embeddings(path: str) -> dict[str, np.ndarray]:
    """Inverse of :func:`save_embeddings` — bit-exact round trip
    (float64 end to end, pytest-pinned)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    toks = tbl.column("token").to_pylist()
    vecs = tbl.column("vector").to_pylist()
    return {t: np.asarray(v, dtype=np.float64) for t, v in zip(toks, vecs)}


# --- active-embedder registry (opt-in; default None keeps the
# model-free stand-ins and every golden byte-stable) ------------------
_ACTIVE: NameEmbedder | None = None
_ENV_TRIED = False

# Env tier: point at a saved vector table (parquet from
# save_embeddings, or a word2vec-format .bin if the image ever gains
# gensim) and every session picks it up without code changes — the
# concrete form of the "real model when the environment provides one"
# hook the reference's GoogleNews dependency maps to.
NAME_EMB_ENV = "SPARK_GRAFT_NAME_EMB"


def set_name_embedder(emb: NameEmbedder | None) -> None:
    """Install (or clear) the process-wide name embedder consulted by
    plans/search.name_distance and profiler.semantic_name_clusters.
    Opt-in by design: profiling must not silently depend on whichever
    corpus was last trained. Clearing also re-arms the env loader."""
    global _ACTIVE, _ENV_TRIED
    _ACTIVE = emb
    _ENV_TRIED = emb is not None


def get_name_embedder() -> NameEmbedder | None:
    global _ACTIVE, _ENV_TRIED
    if _ACTIVE is None and not _ENV_TRIED:
        _ENV_TRIED = True  # one attempt per process; failures warn once
        import os
        import sys

        path = os.environ.get(NAME_EMB_ENV)
        if path:
            try:
                if path.endswith(".bin"):
                    from gensim.models import KeyedVectors  # env-gated

                    kv = KeyedVectors.load_word2vec_format(path, binary=True)
                    _ACTIVE = NameEmbedder(
                        {t: np.asarray(kv[t], dtype=np.float64) for t in kv.key_to_index}
                    )
                else:
                    _ACTIVE = NameEmbedder(load_embeddings(path))
            except Exception as e:  # degrade to the stand-in, loudly
                print(
                    f"WARN {NAME_EMB_ENV}={path} failed to load "
                    f"({type(e).__name__}: {e}); name semantics fall back "
                    "to the model-free stand-in",
                    file=sys.stderr,
                )
    return _ACTIVE
