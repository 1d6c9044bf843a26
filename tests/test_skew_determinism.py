"""Round-5 gates: adversarial-skew bounds on the banded self-joins and
partitioning-independence of every bounded driver-side sample.

Skew: a degenerate corpus (many identical documents) must not turn the
LSH/SimHash band joins quadratic — oversized buckets are dropped before
the self-join (operators/dedup.py MAX_BAND_BUCKET), and the boilerplate
scrub's hot-segment set must fall back to a shuffle anti-join instead of
a driver broadcast when it exceeds the session broadcast threshold.

Determinism: `orderBy(__rid).limit` sampling means tsne/umap/dbscan,
IVF centroids, and the profiler's date-format probe return byte-equal
results no matter how the input happens to be partitioned.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_transformation_2022_spark.operators.steps import RID


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# adversarial skew
# ---------------------------------------------------------------------------


def _identical_docs(spark, n: int):
    text = "the quick brown fox jumps over the lazy dog again and again"
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(text).alias("text")
    )


def test_lsh_identical_docs_bounded(spark):
    """10k identical docs: every band bucket is oversized -> dropped;
    the self-join emits nothing instead of ~50M pairs (exact_dedup is
    the operator that handles literal duplicates)."""
    from data_transformation_2022_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(_identical_docs(spark, 10_000), "doc_id", "text")
    assert lsh_candidate_pairs(sigs, "doc_id").count() == 0


def test_simhash_identical_docs_bounded(spark):
    from data_transformation_2022_spark.operators.dedup import simhash_neardup_pairs

    pairs = simhash_neardup_pairs(_identical_docs(spark, 10_000), "doc_id", "text")
    assert pairs.count() == 0


def test_lsh_cap_is_noop_on_real_corpus(spark, sf_dir):
    """No bucket in the real documents table approaches the cap: the
    capped (default) and uncapped pair sets are identical — the bound
    changes worst-case complexity, not results."""
    from data_transformation_2022_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from data_transformation_2022_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, "doc_id", "text").persist()
    capped = {tuple(r) for r in lsh_candidate_pairs(sigs, "doc_id").collect()}
    uncapped = {
        tuple(r) for r in lsh_candidate_pairs(sigs, "doc_id", max_bucket=None).collect()
    }
    sigs.unpersist()
    assert capped == uncapped and capped


def test_ngram_identical_docs_bounded(spark):
    """10k identical docs through the stop-shingle (max_df) path: every
    shingle's document frequency blows past the cap, so the whole
    shingle universe is dropped before the self-join — O(n) work and
    zero pairs instead of a 50M-row hot-shingle join."""
    from data_transformation_2022_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        _identical_docs(spark, 10_000), "doc_id", "text", n=3, threshold=0.0, max_df=100
    )
    assert pairs.count() == 0


def test_ngram_jaccard_skew_oracle_equality(spark):
    """End-to-end oracle equality of the capped path ON A SKEWED CORPUS:
    60 docs share a viral phrase (df=60 > cap=10, shingles dropped) next
    to genuine near-dup pairs whose private shingles survive. The Spark
    operator and the registered DuckDB oracle must agree exactly."""
    import duckdb

    from data_transformation_2022_spark.operators.dedup import ngram_jaccard_pairs
    from data_transformation_2022_spark.queries import _JACCARD_MAX_DF, _JACCARD_SQL

    viral = "breaking news wire update flash alert tonight"
    rows = [(i, f"{viral} singleton tail token{i} end{i}") for i in range(60)]
    for j in range(10):
        body = f"private cluster{j} body words shared segment alpha beta gamma"
        rows.append((100 + 2 * j, f"{body} left variant"))
        rows.append((101 + 2 * j, f"{body} right variant"))
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    docs = spark.createDataFrame(pdf)
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.005, max_df=_JACCARD_MAX_DF
        ).collect()
    }
    con = duckdb.connect()
    con.register("documents", pdf)
    want = {(a, b, round(j, 9)) for a, b, j in con.execute(_JACCARD_SQL).fetchall()}
    con.close()
    assert got == want
    assert want, "skewed corpus must still yield surviving near-dup pairs"
    assert all(a >= 100 for a, _, _ in want), "viral-only pairs must be capped away"


def test_emb_lsh_identical_vectors_bounded(spark):
    """10k identical embedding vectors: every (band, bucket) group holds
    all 10k rows -> over the cap -> dropped before the self-join; the
    banded join emits nothing (bounded O(n) count work) instead of
    collapsing one bucket into a ~50M-pair self-join. Twin of
    test_lsh_identical_docs_bounded for the embedding path."""
    from data_transformation_2022_spark.operators.similarity import lsh_neardup_pairs

    vec = [float(j % 7) - 3.0 for j in range(16)]
    df = spark.range(10_000).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(v) for v in vec]).alias("embedding"),
    )
    assert lsh_neardup_pairs(df, "vec_id", "embedding", threshold=0.9).count() == 0


def test_emb_lsh_cap_is_noop_on_real_corpus(spark, sf_dir):
    """No (band, bucket) group in the real embeddings table approaches
    the cap: capped (default) and uncapped pair sets are identical — the
    bound changes worst-case complexity, not results."""
    from data_transformation_2022_spark.operators.similarity import lsh_neardup_pairs
    from data_transformation_2022_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    kw = dict(threshold=0.4, n_planes=8, bands=4)
    capped = {
        (r["id_a"], r["id_b"])
        for r in lsh_neardup_pairs(emb, "vec_id", "embedding", **kw).collect()
    }
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in lsh_neardup_pairs(
            emb, "vec_id", "embedding", max_bucket=1 << 60, **kw
        ).collect()
    }
    assert capped == uncapped and capped


def test_emb_lsh_auto_planes_scale_with_corpus(spark):
    """n_planes='auto' widens rows-per-band with corpus size so the
    expected bucket population stays bounded (the 256-bucket ceiling of
    a fixed 8-plane signature is the scale hazard)."""
    from data_transformation_2022_spark.operators.similarity import lsh_band_signatures

    rs = np.random.RandomState(3)
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(5000, dtype=np.int64),
            "embedding": list(rs.normal(size=(5000, 8))),
        }
    )
    df = spark.createDataFrame(pdf)
    sigs = lsh_band_signatures(df, "vec_id", "embedding", bands=2, n_planes="auto")
    # ceil(log2(5000)) - 4 = 9 planes -> bucket values exceed the 8-bit
    # range 0..255 somewhere, and per-(band,bucket) population is small
    assert sigs.agg(F.max("bucket")).collect()[0][0] > 255
    top = (
        sigs.groupBy("band", "bucket").count().agg(F.max("count")).collect()[0][0]
    )
    assert top < 200


def test_keep_best_mega_cluster_bounded(spark):
    """One 50k-row duplicate cluster: the canonical pick must complete
    bounded (map-side-combinable max_by, not a single-reducer window
    sort of the whole component) and keep exactly the highest-quality
    member, ties broken by minimum id."""
    from data_transformation_2022_spark.operators.dedup import keep_best_per_cluster

    n = 50_000
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        # two docs tie at the top quality (9): ids 9 and n-1... make ties
        (F.col("id") % 10).cast("int").alias("quality"),
    )
    comp = spark.range(n).select(F.col("id"), F.lit(0).alias("component"))
    out = keep_best_per_cluster(docs, comp, "doc_id", "quality").persist()
    try:
        assert out.count() == n
        kept = out.filter(F.col("keep")).collect()
        # max quality 9; min id among quality==9 rows is 9
        assert [(r["doc_id"], r["component"]) for r in kept] == [(9, 0)]
    finally:
        out.unpersist()


def test_resample_grid_bounded_by_key_lifetimes(spark):
    """One key spanning 3 years next to 2000 keys alive a single day:
    the resample grid must be sum-of-key-lifetimes (1097 + 2000 rows),
    NOT keys x global-range (2001 x 1097 ~ 2.2M dead rows), and the
    gap-filled long key must carry its first value forward."""
    from data_transformation_2022_spark.operators.timeseries import resample_ffill

    rows = [(0, "2020-01-01 00:00:00", 1.0, 1), (0, "2023-01-01 00:00:00", 2.0, 2)]
    rows += [(k, "2021-06-15 12:00:00", float(k), 10 + k) for k in range(1, 2001)]
    events = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "value", "event_id"])
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = resample_ffill(events, "user_id", "ts", "value", tie_col="event_id")
    assert out.count() == 1097 + 2000
    long_key = {
        str(r["bucket"]): r["value_ffill"]
        for r in out.filter(F.col("user_id") == 0).collect()
    }
    assert long_key["2020-01-01"] == 1.0
    assert long_key["2022-12-31"] == 1.0
    assert long_key["2023-01-01"] == 2.0
    assert out.filter(F.col("value_ffill").isNull()).count() == 0


def test_scrub_hot_set_broadcast_thresholded(spark):
    """anti_join_hot honors spark.sql.autoBroadcastJoinThreshold: under a
    normal threshold the hot set is broadcast (BroadcastHashJoin LeftAnti);
    with the threshold floored the same plan degrades to a non-broadcast
    anti-join — no driver-side collection of a potentially huge hot set."""
    from data_transformation_2022_spark.functions.text import (
        scrub_boilerplate_segments,
    )

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("shared boilerplate header words one two three eight "),
            F.lit("unique tail number "),
            F.col("id").cast("string"),
        ).alias("text"),
    )
    out_bc = scrub_boilerplate_segments(docs, "doc_id", "text")
    assert "BroadcastHashJoin" in _plan(out_bc) or "BroadcastNestedLoop" in _plan(out_bc)

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        out_shuffle = scrub_boilerplate_segments(docs, "doc_id", "text")
        plan = _plan(out_shuffle)
        assert "BroadcastHashJoin" not in plan
        rows_bc = {tuple(r) for r in out_bc.collect()}
        rows_sh = {tuple(r) for r in out_shuffle.collect()}
        assert rows_bc == rows_sh
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


# ---------------------------------------------------------------------------
# partitioning-independent samples
# ---------------------------------------------------------------------------


def _numeric_frame(spark):
    rs = np.random.RandomState(7)
    pdf = pd.DataFrame(
        {
            RID: np.arange(300, dtype=np.int64),
            "a": rs.normal(size=300),
            "b": rs.normal(size=300) * 3 + 1,
            "c": rs.normal(size=300) - 2,
        }
    )
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("runner", ["tsne", "umap", "dbscan", "mds"])
def test_sample_transforms_partition_invariant(spark, runner):
    from data_transformation_2022_spark.ml import coret

    fn = {
        "tsne": coret.run_tsne,
        "umap": coret.run_umap,
        "dbscan": coret.run_dbscan,
        "mds": coret.run_mds,
    }[runner]
    base = _numeric_frame(spark)
    shuffled = base.repartition(13, F.col("a"))
    a = fn(base).toPandas().sort_values(RID).reset_index(drop=True)
    b = fn(shuffled).toPandas().sort_values(RID).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_ivf_lists_populated(spark, sf_dir):
    """The coarse quantizer must actually PARTITION the corpus: at
    least half the lists populated and no single list holding the
    whole corpus. (Regression: the centers-as-labels bug collapsed
    every vector into list 0 and no recall/exactness test noticed —
    full-probe stays exact and recall is trivially 1.0 on one list.)"""
    from data_transformation_2022_spark.operators.similarity import ivf_assign_lists
    from data_transformation_2022_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = ivf_assign_lists(emb, "vec_id", "embedding", n_lists=16)
    sizes = {
        r["list_id"]: r["n"]
        for r in assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    total = sum(sizes.values())
    assert len(sizes) >= 8, f"only {len(sizes)} lists populated"
    assert max(sizes.values()) < 0.5 * total, "one list holds most of the corpus"


def test_ivf_centroids_partition_invariant(spark, sf_dir):
    from data_transformation_2022_spark.operators.similarity import ivf_assign_lists
    from data_transformation_2022_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    _, cents_a = ivf_assign_lists(emb, "vec_id", "embedding", n_lists=4)
    _, cents_b = ivf_assign_lists(
        emb.repartition(11, F.col("vec_id")), "vec_id", "embedding", n_lists=4
    )
    np.testing.assert_array_equal(cents_a, cents_b)


def test_profiler_date_probe_partition_invariant(spark):
    """The date-format probe samples the FIRST `date_sample` rows by
    __rid: rows 0..999 are clean ISO dates, rows 1000+ are garbage, so a
    partition-order-dependent sample would sometimes see garbage and
    report no format. With the RID anchor the probe must detect the
    format on every layout."""
    from data_transformation_2022_spark.profiler import profile_table

    pdf = pd.DataFrame(
        {
            RID: np.arange(3000, dtype=np.int64),
            "d": ["2020-01-15"] * 1000 + ["not a date"] * 2000,
        }
    )
    base = spark.createDataFrame(pdf)
    for frame in (base, base.repartition(17), base.repartition(5, F.col("d"))):
        prof = profile_table(frame, cluster=False)
        assert prof.column("d").date_format is not None, frame


def test_incremental_lsh_identical_docs_bounded(spark):
    """Degenerate incremental ingestion: 10k identical docs split
    new-vs-corpus — every band bucket on BOTH sides is oversized ->
    dropped per side; the cross join emits nothing instead of ~25M
    pairs (exact dedup handles literal duplicates)."""
    from data_transformation_2022_spark.operators.dedup import (
        lsh_incremental_pairs,
        minhash_signatures,
    )

    docs = _identical_docs(spark, 10_000)
    new = docs.filter("doc_id % 2 = 0")
    corpus = docs.filter("doc_id % 2 = 1")
    pairs = lsh_incremental_pairs(
        minhash_signatures(corpus, "doc_id", "text"),
        minhash_signatures(new, "doc_id", "text"),
        "doc_id",
    )
    assert pairs.count() == 0


def test_incremental_lsh_cross_only(spark):
    """Near-dup pairs inside the corpus side (or inside the new side)
    are never emitted — only new x corpus collisions."""
    from data_transformation_2022_spark.operators.dedup import (
        lsh_incremental_pairs,
        minhash_signatures,
    )

    base = " ".join(f"w{i}" for i in range(30))
    rows = [(1, base), (2, base), (10, base), (11, base), (20, "zz " * 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    new = df.filter("doc_id < 10")       # 1, 2 (near-dups of each other)
    corpus = df.filter("doc_id >= 10")   # 10, 11 (near-dups), 20 (unique)
    got = {
        (r.new_id, r.corpus_id)
        for r in lsh_incremental_pairs(
            minhash_signatures(corpus, "doc_id", "text"),
            minhash_signatures(new, "doc_id", "text"),
            "doc_id",
        ).collect()
    }
    assert got == {(1, 10), (1, 11), (2, 10), (2, 11)}
