"""Unit tests for the LLM-pipeline extension operators (text analysis,
dedup, similarity) on small hand-built frames with known answers."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_transformation_2022_spark.functions.text import (
    fingerprint64,
    langid_heuristic,
    tokens_ws,
)
from data_transformation_2022_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from data_transformation_2022_spark.operators.similarity import (
    ann_topk_fast,
    cosine_neardup_pairs,
    cosine_topk_bruteforce,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "the quick brown fox jumps over the lazy dog",
                    "the quick brown fox jumps over the lazy dog",  # exact dup of 1
                    "the quick brown fox jumps over a sleepy dog",  # near dup
                    "completely different words entirely here now",
                ],
            }
        )
    )


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0]),  # near dup of 1
        (3, [0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 1.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_tokens_and_fingerprint(spark):
    df = spark.createDataFrame(pd.DataFrame({"t": ["  Hello   World ", "hello world"]}))
    out = df.select(
        F.size(tokens_ws(F.col("t"))).alias("n"), fingerprint64(F.col("t")).alias("fp")
    ).collect()
    assert [r["n"] for r in out] == [2, 2]
    # same normalized content → same fingerprint
    assert out[0]["fp"] == out[1]["fp"] and out[0]["fp"] >= 0


def test_langid_marker_words(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "t": [
                    "the cat and the hat is here",
                    "der hund und die katze ist da",
                    "xyzzy plugh",
                ]
            }
        )
    )
    out = [r[0] for r in df.select(langid_heuristic(F.col("t"))).collect()]
    assert out == ["en", "de", "und"]


def test_exact_dedup_groups(docs):
    out = exact_dedup(docs, "doc_id", "text").orderBy("keep_id").collect()
    by_keep = {r["keep_id"]: r["n_dups"] for r in out}
    assert by_keep == {1: 2, 3: 1, 4: 1}  # docs 1+2 collapse


def test_minhash_near_dup_similarity(docs):
    sigs = minhash_signatures(docs, "doc_id", "text", k=16)
    rows = {r["doc_id"]: [r[f"sig_{i}"] for i in range(16)] for r in sigs.collect()}
    same = sum(a == b for a, b in zip(rows[1], rows[2]))
    near = sum(a == b for a, b in zip(rows[1], rows[3]))
    far = sum(a == b for a, b in zip(rows[1], rows[4]))
    assert same == 16  # identical docs → identical signature
    assert near > far  # near dup agrees on more minhashes than unrelated
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(sigs, "doc_id").collect()}
    assert (1, 2) in pairs


def test_simhash_distance(docs):
    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs, "doc_id", "text").collect()}
    assert fp[1] == fp[2]
    ham = lambda a, b: bin(a ^ b).count("1")
    assert ham(fp[1], fp[3]) < ham(fp[1], fp[4])


def test_ngram_jaccard_values(docs):
    out = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, "doc_id", "text", n=3, threshold=0.0).collect()
    }
    assert out[(1, 2)] == 1.0
    assert 0.0 < out[(1, 3)] < 1.0
    assert (1, 4) not in out


def test_ngram_jaccard_stop_shingle_cap(spark):
    # 20 docs all share one viral phrase ("breaking news wire" 3-gram);
    # docs 1/2 additionally share a genuine near-dup body. With
    # max_df=5 the viral shingles (df=20) are dropped: the 1-2 pair
    # survives on its private shingles, while pairs whose ONLY overlap
    # was the viral phrase disappear — and so does their d² join blowup.
    viral = "breaking news wire update"
    rows = [(1, f"{viral} alpha beta gamma delta epsilon"),
            (2, f"{viral} alpha beta gamma delta zeta")] + [
        (i, f"{viral} body{i} filler{i} words{i} tail{i}") for i in range(3, 21)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.0, max_df=5
        ).collect()
    }
    assert (1, 2) in capped and capped[(1, 2)] > 0.4
    # viral-only pairs are gone (e.g. 3-4 share nothing but the phrase)
    assert (3, 4) not in capped
    # uncapped form still sees the viral-only pairs — the cap is what
    # removed them, not the threshold
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.0, max_df=None
        ).collect()
    }
    assert (3, 4) in uncapped


def test_ngram_jaccard_unbounded_guard(spark):
    docs = spark.createDataFrame(
        [(i, f"word{i} word{i+1} word{i+2} word{i+3}") for i in range(30)],
        "doc_id long, text string",
    )
    with pytest.raises(ValueError, match="max_df"):
        ngram_jaccard_pairs(docs, "doc_id", "text", max_rows=10)
    # with a df cap the same input is accepted (bounded form)
    ngram_jaccard_pairs(docs, "doc_id", "text", max_df=5, max_rows=10).count()


def test_cosine_neardup_all_pairs_guard(vecs):
    with pytest.raises(ValueError, match="lsh_neardup_pairs"):
        cosine_neardup_pairs(vecs, "vec_id", "embedding", 0.9, max_rows=2)


def test_cosine_topk_and_neardup(vecs):
    top = cosine_topk_bruteforce(vecs, vecs.filter(F.col("vec_id") == 1), "vec_id", "embedding", k=1).collect()
    assert len(top) == 1 and top[0]["cand_id"] == 2
    pairs = {(r["id_a"], r["id_b"]) for r in cosine_neardup_pairs(vecs, "vec_id", "embedding", 0.9).collect()}
    assert pairs == {(1, 2)}


def test_ann_fast_matches_exact(vecs):
    exact = cosine_topk_bruteforce(vecs, vecs, "vec_id", "embedding", k=2)
    fast = ann_topk_fast(vecs, vecs, "vec_id", "embedding", k=2)
    e = {(r["query_id"], r["rank"]): r["cand_id"] for r in exact.collect()}
    f = {(r["query_id"], r["rank"]): r["cand_id"] for r in fast.collect()}
    assert e == f


def test_hash_sample_deterministic_and_proportional(spark, sf_dir):
    from data_transformation_2022_spark.operators.sampling import hash_sample
    from data_transformation_2022_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem")
    n = li.count()
    a = hash_sample(li, ["l_orderkey", "l_linenumber"], 0.2)
    b = hash_sample(li, ["l_orderkey", "l_linenumber"], 0.2)
    ka, kb = a.count(), b.count()
    assert ka == kb  # same keys → same decisions, every run
    assert abs(ka / n - 0.2) < 0.02  # rate holds in expectation
    # different salt → decorrelated (not identical) sample
    c = hash_sample(li, ["l_orderkey", "l_linenumber"], 0.2, salt="other")
    assert c.count() != 0 and c.exceptAll(a).count() > 0


def test_split_train_eval_disjoint_exhaustive(spark, sf_dir):
    from data_transformation_2022_spark.operators.sampling import split_train_eval
    from data_transformation_2022_spark.sources.readers import load_table

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    train, ev = split_train_eval(li, ["l_orderkey", "l_linenumber"], 0.1)
    nt, ne, n = train.count(), ev.count(), li.count()
    assert nt + ne == n  # exhaustive
    assert train.intersect(ev).count() == 0  # disjoint
    assert 0.05 < ne / n < 0.15


def test_connected_components_min_labels(spark):
    from data_transformation_2022_spark.operators.dedup import connected_components

    # two chains + an isolated pair: {1-2-3-4}, {10-11}, {20-21}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21)], "id_a long, id_b long"
    )
    comp = {r["id"]: r["component"] for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_self_pair_singletons(spark):
    from data_transformation_2022_spark.operators.dedup import connected_components

    # node 5's ONLY pair is reflexive; it must survive as a singleton
    # component on both engines (self-edges are dropped, nodes are not)
    pairs = spark.createDataFrame(
        [(1, 2), (5, 5), (2, 2)], "id_a long, id_b long"
    )
    want = {1: 1, 2: 1, 5: 5}
    for algo in ("propagation", "star", "driver"):
        comp = {
            r["id"]: r["component"]
            for r in connected_components(pairs, algorithm=algo).collect()
        }
        assert comp == want, algo


def test_reliable_checkpoint_mode_identical_results(spark, tmp_path):
    """The checkpoint_dir knob (r7 verdict item 2) switches iterative
    operators from executor-local localCheckpoint to reliable
    checkpoint() for cluster fault tolerance — both modes must produce
    IDENTICAL labels/merges, and the reliable mode must actually write
    checkpoint blocks to the given directory."""
    import os

    from data_transformation_2022_spark.operators.bpe import bpe_train_merges
    from data_transformation_2022_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (7, 7)], "id_a long, id_b long"
    )
    ck = str(tmp_path / "ck_cc")
    for algo in ("propagation", "star"):
        local = {
            r["id"]: r["component"]
            for r in connected_components(pairs, algorithm=algo).collect()
        }
        reliable = {
            r["id"]: r["component"]
            for r in connected_components(
                pairs, algorithm=algo, checkpoint_dir=ck
            ).collect()
        }
        assert local == reliable, algo
    # reliable mode really checkpointed: block files landed under ck
    assert any(files for _, _, files in os.walk(ck))

    docs = spark.createDataFrame(
        [("new york city new york city",), ("new york is a big city",)],
        "text string",
    )
    m_local = bpe_train_merges(docs, "text", n_merges=3).collect()
    m_rel = bpe_train_merges(
        docs, "text", n_merges=3, checkpoint_dir=str(tmp_path / "ck_bpe")
    ).collect()
    assert m_local == m_rel


def test_iter_checkpoint_env_var_engages_reliable_mode(spark, tmp_path, monkeypatch):
    """$SPARK_GRAFT_CHECKPOINT_DIR is the fleet-wide default: with it
    set and no explicit arg, iter_checkpoint writes reliable checkpoint
    blocks."""
    import os

    from data_transformation_2022_spark.session import CHECKPOINT_DIR_ENV, iter_checkpoint

    d = str(tmp_path / "ck_env")
    monkeypatch.setenv(CHECKPOINT_DIR_ENV, d)
    df = iter_checkpoint(spark.range(100).withColumnRenamed("id", "x"))
    assert df.count() == 100
    assert any(files for _, _, files in os.walk(d))


def test_connected_components_driver_path_is_count_gated(spark):
    """The driver union-find engine collects ONLY after a count job
    proves the edge set is under the bound; an explicit request above
    the bound refuses instead of pulling an unbounded edge list."""
    import pytest

    from data_transformation_2022_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a long, id_b long"
    )
    with pytest.raises(ValueError, match="driver_threshold"):
        connected_components(pairs, algorithm="driver", driver_threshold=2)
    # auto respects the same gate: under a tiny threshold it falls back
    # to a distributed engine and still produces the identical labeling
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            pairs, algorithm="auto", driver_threshold=0
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_sampling_threshold_half_up():
    from data_transformation_2022_spark.operators.sampling import _BUCKETS, _threshold

    assert _threshold(0.7) == 700_000  # 0.7*1e6 = 699999.999... must not truncate
    assert _threshold(5e-7) == 1  # exact .5 product must round UP, not to even
    assert _threshold(0.0) == 0
    assert _threshold(1.0) == _BUCKETS


def test_connected_components_star_matches_propagation(spark):
    from data_transformation_2022_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (4, 1)], "id_a long, id_b long"
    )
    prop = {r["id"]: r["component"] for r in connected_components(pairs, algorithm="propagation").collect()}
    star = {r["id"]: r["component"] for r in connected_components(pairs, algorithm="star").collect()}
    assert prop == star == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_star_path_graph_olog_rounds(spark):
    """A 1000-node path (diameter 999) — min-label propagation would
    need ~999 rounds; star contraction must converge within its
    O(log n) bound (2·log2(1000) ≈ 20 alternating rounds)."""
    from data_transformation_2022_spark.operators.dedup import connected_components

    n = 1000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long"
    )
    labels = connected_components(pairs, algorithm="star", max_iters=25)
    rows = labels.collect()
    assert len(rows) == n
    assert all(r["component"] == 1 for r in rows)


def test_connected_components_raises_instead_of_truncating(spark):
    """A silently-truncated labeling is data corruption (the dedup
    keep-list drops the wrong rows) — both engines must raise when the
    round budget is exhausted before convergence."""
    import pytest

    from data_transformation_2022_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 50)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, algorithm="propagation", max_iters=3)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, algorithm="star", max_iters=1)


def test_pii_scrub_counts_and_redaction(spark):
    from data_transformation_2022_spark.functions.text import pii_counts, pii_scrub

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+spam@example.co.uk or +1 415-555-0199 ok"),
            (2, "no pii here, just words and the number 7"),
            (3, "two mails: a@b.io c.d@e-f.org and phone 020 7946 0958"),
        ],
        "id long, text string",
    )
    c = pii_counts(F.col("text"))
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            c["n_emails"].alias("e"),
            c["n_phoneish"].alias("p"),
            pii_scrub(F.col("text")).alias("clean"),
        ).collect()
    }
    assert (rows[1]["e"], rows[1]["p"]) == (1, 1)
    assert (rows[2]["e"], rows[2]["p"]) == (0, 0)
    assert (rows[3]["e"], rows[3]["p"]) == (2, 1)
    assert "<EMAIL>" in rows[1]["clean"] and "<PHONE>" in rows[1]["clean"]
    assert "@" not in rows[3]["clean"] and "0958" not in rows[3]["clean"]
    assert rows[2]["clean"] == "no pii here, just words and the number 7"


def test_simhash_pairs_find_near_dups(docs):
    from data_transformation_2022_spark.operators.dedup import simhash_neardup_pairs

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_neardup_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0  # identical docs: distance 0
    assert all(h <= 3 for h in pairs.values())


def test_ivf_full_probe_equals_bruteforce(spark, sf_dir):
    from data_transformation_2022_spark.operators.similarity import ivf_topk
    from data_transformation_2022_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = cosine_topk_bruteforce(e, q, "vec_id", "embedding", k=3)
    full = ivf_topk(e, q, "vec_id", "embedding", k=3, n_lists=8, n_probe=8)
    ex = {(r["query_id"], r["rank"]): r["cand_id"] for r in exact.collect()}
    fu = {(r["query_id"], r["rank"]): r["cand_id"] for r in full.collect()}
    assert ex == fu


def test_ivf_partial_probe_recall(spark, sf_dir):
    from data_transformation_2022_spark.operators.similarity import ivf_topk
    from data_transformation_2022_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(e, q, "vec_id", "embedding", k=5)
    approx = ivf_topk(e, q, "vec_id", "embedding", k=5, n_lists=8, n_probe=2)
    ex: dict[int, set] = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["cand_id"])
    ap: dict[int, set] = {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["cand_id"])
    hits = sum(len(ex[qid] & ap.get(qid, set())) for qid in ex)
    total = sum(len(s) for s in ex.values())
    # clustered synthetic embeddings: probing 1/4 of the lists must keep
    # most true neighbors (they share the query's list by construction)
    assert hits / total >= 0.6


def test_ivf_persisted_index_full_probe_matches_live(spark, sf_dir, tmp_path):
    """Build-once/query-many IVF: a persisted index queried with
    n_probe == n_lists must return exactly what the live ivf_topk
    returns, and the lists scan must be partition-pruned to the probed
    list_ids (static PartitionFilters, not a full-index read)."""
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    from data_transformation_2022_spark.operators.similarity import (
        ivf_build_index,
        ivf_query_index,
        ivf_topk,
    )
    from data_transformation_2022_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "ivf_idx")
    ivf_build_index(e, "vec_id", "embedding", path, n_lists=8)

    got = ivf_query_index(spark, path, q, "vec_id", "embedding", k=3, n_probe=8)
    live = ivf_topk(e, q, "vec_id", "embedding", k=3, n_lists=8, n_probe=8)
    key = lambda r: (r["query_id"], r["rank"])
    assert sorted(map(tuple, got.select("query_id", "cand_id", "rank").collect()), key=lambda t: (t[0], t[2])) == \
           sorted(map(tuple, live.select("query_id", "cand_id", "rank").collect()), key=lambda t: (t[0], t[2]))

    # pruning: with n_probe=2 the scan must carry a list_id partition filter
    pruned = ivf_query_index(spark, path, q, "vec_id", "embedding", k=3, n_probe=2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        pruned.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "list_id" in plan.split("PartitionFilters", 1)[1][:200]


def test_global_running_sum_matches_single_window(spark):
    import pandas as pd

    from data_transformation_2022_spark.functions.order import global_running_sum

    pdf = pd.DataFrame({"k": range(1000), "v": [(i * 37) % 101 for i in range(1000)]})
    df = spark.createDataFrame(pdf)
    got = {
        r["k"]: r["cum"]
        for r in global_running_sum(df, ["k"], "v", "cum", num_partitions=7).collect()
    }
    want = pdf.sort_values("k")["v"].cumsum()
    assert got == dict(zip(pdf["k"], want))


def test_scrub_boilerplate_segments(spark):
    from data_transformation_2022_spark.functions.text import (
        scrub_boilerplate_segments,
    )

    boiler = "all rights reserved contact us terms of service"  # 8 words
    rows = [
        (1, f"alpha beta gamma delta epsilon zeta eta theta {boiler}"),
        (2, f"one two three four five six seven eight {boiler}"),
        (3, f"nine ten eleven twelve thirteen fourteen fifteen sixteen {boiler}"),
        (4, boiler),  # pure boilerplate: must disappear entirely
        (5, "unique words only here nothing shared at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_segments_kept"], r["clean_text"])
        for r in scrub_boilerplate_segments(
            df, "doc_id", "text", seg_words=8, max_df=2
        ).collect()
    }
    assert 4 not in out  # pure-boilerplate doc dropped
    assert out[1] == (1, "alpha beta gamma delta epsilon zeta eta theta")
    assert out[5] == (1, "unique words only here nothing shared at all")
    assert all(boiler not in t for _, t in out.values())


def test_chunk_documents_coverage(spark):
    from data_transformation_2022_spark.functions.text import chunk_documents

    rows = [(1, "x" * 500), (2, "short"), (3, "y" * 200), (4, "z" * 201)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    chunks = chunk_documents(df, "doc_id", "text", chunk_chars=200, overlap=50)
    got = {}
    for r in chunks.collect():
        got.setdefault(r["doc_id"], []).append((r["chunk_id"], r["chunk_len"]))
    for v in got.values():
        v.sort()
    # 500 chars, step 150: ceil((500-50)/150)=3 chunks at 0/150/300
    assert got[1] == [(0, 200), (1, 200), (2, 200)]
    assert got[2] == [(0, 5)]  # short doc: exactly one chunk
    assert got[3] == [(0, 200)]  # exactly one window
    assert got[4] == [(0, 200), (1, 51)]  # one char past: second chunk
    # overlap check: consecutive chunks share `overlap` chars
    assert 3 * 150 + 50 == 500


def test_pack_sequences_invariants(spark):
    import pandas as pd

    from data_transformation_2022_spark.operators.packing import (
        pack_sequences,
        pack_stats,
    )

    texts = [(i, " ".join(["w"] * ((i * 13) % 40 + 1))) for i in range(200)]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    packed = pack_sequences(df, "doc_id", "text", budget=100).toPandas()
    # every doc assigned, tokens preserved
    assert len(packed) == 200
    assert packed["n_tokens"].sum() == sum((i * 13) % 40 + 1 for i in range(200))
    # pack_id equals the start-offset rule replayed in pandas
    p = packed.sort_values("doc_id").reset_index(drop=True)
    start = p["n_tokens"].cumsum() - p["n_tokens"]
    assert (p["pack_id"] == start // 100).all()
    # packs are contiguous 0..max
    stats = pack_stats(
        pack_sequences(df, "doc_id", "text", budget=100)
    ).toPandas().sort_values("pack_id")
    assert list(stats["pack_id"]) == list(range(len(stats)))


def test_ivf_index_reuse_and_invalidation(spark, sf_dir, tmp_path):
    import json
    import os
    import time

    from pyspark.sql import functions as F

    from data_transformation_2022_spark.operators.similarity import ivf_build_index
    from data_transformation_2022_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "idx")
    ivf_build_index(e, "vec_id", "embedding", path, n_lists=4)
    built_at = os.path.getmtime(f"{path}/lists/_SUCCESS")
    time.sleep(0.05)
    # same corpus + params: skipped (no rewrite)
    ivf_build_index(e, "vec_id", "embedding", path, n_lists=4)
    assert os.path.getmtime(f"{path}/lists/_SUCCESS") == built_at
    # parameter change: rebuilt
    ivf_build_index(e, "vec_id", "embedding", path, n_lists=8)
    assert os.path.getmtime(f"{path}/lists/_SUCCESS") > built_at
    assert json.load(open(f"{path}/meta.json"))["n_lists"] == 8
    # bounded output files (r13): the pre-repartition write fanned every
    # input task across every list directory (tasks x lists small files);
    # now <= n_lists x shards_per_list data files total
    import glob

    n_files = len(glob.glob(f"{path}/lists/**/*.parquet", recursive=True))
    assert 0 < n_files <= 8, n_files
    ivf_build_index(
        e, "vec_id", "embedding", path, n_lists=4, shards_per_list=2,
        force_rebuild=True,
    )
    n_files = len(glob.glob(f"{path}/lists/**/*.parquet", recursive=True))
    assert 0 < n_files <= 8, n_files
    # sharding changes the FILE layout only: the sharded index serves
    # the same neighbors as the live path at full probe
    from data_transformation_2022_spark.operators.similarity import (
        ivf_query_index,
        ivf_topk,
    )

    q = e.filter(F.col("vec_id") < 3)
    got = ivf_query_index(spark, path, q, "vec_id", "embedding", k=3, n_probe=4)
    live = ivf_topk(e, q, "vec_id", "embedding", k=3, n_lists=4, n_probe=4)
    pick = lambda df: sorted(
        map(tuple, df.select("query_id", "cand_id", "rank").collect())
    )
    assert pick(got) == pick(live)


def test_keep_best_per_cluster_semantics(spark):
    """Quality-aware canonical pick: highest quality wins its cluster,
    ties break to the minimum id, singletons keep themselves."""
    from pyspark.sql import functions as F

    from data_transformation_2022_spark.operators.dedup import (
        keep_best_per_cluster,
    )

    docs = spark.createDataFrame(
        [(1, 10), (2, 30), (3, 30), (7, 5)], "doc_id long, q long"
    )
    comp = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "id long, component long"
    )
    out = {
        r["doc_id"]: (r["component"], r["keep"])
        for r in keep_best_per_cluster(docs, comp, "doc_id", "q").collect()
    }
    # cluster 1: ids 1,2,3 — q=30 tie between 2 and 3 -> min id 2 wins
    assert out[1] == (1, False)
    assert out[2] == (1, True)
    assert out[3] == (1, False)
    # 7 is a singleton: its own component, kept
    assert out[7] == (7, True)


def test_balance_by_quota(spark):
    """Over-quota strata downsample to ~quota in expectation; under-quota
    strata are kept whole; decisions are deterministic under
    repartitioning (hash-keyed, not partition-keyed)."""
    from data_transformation_2022_spark.operators.sampling import balance_by_quota

    df = spark.range(10_050).selectExpr(
        "id", "CASE WHEN id < 10000 THEN 'en' ELSE 'rare' END AS lang"
    )
    kept = balance_by_quota(df, ["id"], "lang", quota=100)
    by_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert by_lang.get("rare") == 50  # under quota: kept whole
    assert 60 <= by_lang.get("en", 0) <= 160  # ~Binomial(10000, 0.01)
    a = {r["id"] for r in kept.collect()}
    b = {r["id"] for r in balance_by_quota(
        df.repartition(13, "id"), ["id"], "lang", quota=100).collect()}
    assert a == b


def test_bigram_fluency_values(spark):
    """Hand-checked corpus: C(a,b)=3, C(b,a)=1, C(z,q)=1, rowtots
    a:3/b:1/z:1, V=4 -> p(a,b)=4/7, p(b,a)=2/5, p(z,q)=2/5. One-token
    docs have no bigrams and are absent."""
    from data_transformation_2022_spark.functions.text import bigram_fluency

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "z q"), (4, "solo")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: (r["n_bigrams"], r["fluency"])
           for r in bigram_fluency(docs, "doc_id", "text").collect()}
    assert out[1] == (3, round((4/7 + 2/5 + 4/7) / 3, 6))
    assert out[2] == (1, round(4/7, 6))
    assert out[3] == (1, 0.4)
    assert 4 not in out


def test_select_by_token_budget(spark):
    """Inclusive prefix under the quality order: rows kept while the
    running token total stays within budget; the first row past the
    budget is dropped even if later rows would fit."""
    from data_transformation_2022_spark.operators.sampling import (
        select_by_token_budget,
    )

    df = spark.createDataFrame(
        [(i, -q, t) for i, (q, t) in enumerate([(9, 4), (8, 5), (7, 3), (6, 10), (5, 1)])],
        "doc_id long, negq long, n_tokens long",
    )
    kept = select_by_token_budget(df, ["negq", "doc_id"], "n_tokens", budget=12)
    got = {r["doc_id"]: r["cum_tokens"] for r in kept.collect()}
    # order q desc: tokens 4,5,3,10,1 -> cum 4,9,12,22,23; budget 12
    assert got == {0: 4, 1: 9, 2: 12}


def test_new_ops_plan_shapes(spark):
    """Plan gates: the balance threshold table broadcasts (never a
    shuffle join against the domain-sized rates), and the token-budget
    prefix sum plans with no single-partition exchange."""
    from data_transformation_2022_spark.operators.sampling import (
        balance_by_quota,
        select_by_token_budget,
    )

    df = spark.range(5000).selectExpr(
        "id", "CASE WHEN id % 7 = 0 THEN 'a' ELSE 'b' END AS lang",
        "CAST(id % 13 AS BIGINT) AS n_tokens", "-id AS negq"
    )
    bal = balance_by_quota(df, ["id"], "lang", quota=100)
    plan_b = bal._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan_b

    kept = select_by_token_budget(df, ["negq", "id"], "n_tokens", budget=500)
    plan_t = kept._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan_t


def test_segment_dedup_keep_first(spark):
    """Segment repeated across (and within) documents survives only at
    its minimum (doc_id, seg_id); docs reassemble in order; a document
    that is pure repetition disappears."""
    from data_transformation_2022_spark.functions.text import (
        dedup_segments_keep_first,
    )

    seg_a = "a1 a2 a3"
    seg_b = "b1 b2 b3"
    docs = spark.createDataFrame(
        [
            (1, f"{seg_a} {seg_b} {seg_a}"),   # trailing repeat of A dropped
            (2, f"{seg_b} c1 c2 c3"),          # B dropped (doc1 had it), C kept
            (3, seg_a),                        # pure repetition: disappears
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_segments_kept"], r["clean_text"])
        for r in dedup_segments_keep_first(
            docs, "doc_id", "text", seg_words=3
        ).collect()
    }
    assert out[1] == (2, f"{seg_a} {seg_b}")
    assert out[2] == (1, "c1 c2 c3")
    assert 3 not in out


def test_pq_codes_deterministic_and_compressive(spark, sf_dir):
    """PQ assignment: codes in [0, k), stable under repartitioning
    (rid-ordered fit), and actually using the codebook (multiple
    distinct codes per subvector on real embeddings)."""
    from data_transformation_2022_spark.operators.similarity import pq_assign, pq_fit
    from data_transformation_2022_spark.queries import _flit
    from data_transformation_2022_spark.sources.readers import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    books = pq_fit(emb, "vec_id", "embedding")
    a = {tuple(r) for r in pq_assign(emb, "vec_id", "embedding", books, _flit).collect()}
    shuffled = emb.repartition(11, "vec_id")
    books2 = pq_fit(shuffled, "vec_id", "embedding")
    assert books == books2
    b = {tuple(r) for r in pq_assign(shuffled, "vec_id", "embedding", books2, _flit).collect()}
    assert a == b
    import collections
    per_sub = collections.defaultdict(set)
    for row in a:
        for j, c in enumerate(row[1:]):
            assert 0 <= c < 16
            per_sub[j].add(c)
    assert all(len(s) >= 4 for s in per_sub.values())


def test_gopher_rules_fire_individually(spark):
    """Each Gopher gate trips on a crafted document while the control
    document passes all seven — integer cross-multiplied rules, so the
    expected flags are computable by hand."""
    from data_transformation_2022_spark.functions.text import gopher_rules

    good = "the quick brown fox jumps with vigor " * 8 + "that have be of"
    short = "the and that have words"
    bullets = "\n".join(f"- {w}" for w in ["the and of that"] * 10)
    ellipsis = "\n".join(f"the and of that have {i} ..." for i in range(10))
    symbols = ("the and that have " + "# " * 20) * 4
    digits = ("1 2 3 4 5 6 7 8 9 10 " * 6) + "the and"
    longwords = ("pneumonoultramicroscopic " * 60) + "the and that have"
    docs = spark.createDataFrame(
        [
            (1, good), (2, short), (3, bullets), (4, ellipsis),
            (5, symbols), (6, digits), (7, longwords), (8, ""),
        ],
        "doc_id long, text string",
    )
    r = gopher_rules(F.col("text"))
    rows = {
        row["doc_id"]: row
        for row in docs.select(
            "doc_id", *[r[k].alias(k) for k in r]
        ).collect()
    }
    assert all(rows[1][k] for k in rows[1].asDict() if k.startswith("r_"))
    assert not rows[2]["r_word_count"]          # 5 words < 50
    assert not rows[3]["r_bullet_lines"]        # 100% bulleted lines
    assert not rows[4]["r_ellipsis_lines"]      # 100% '...'-ending lines
    assert not rows[5]["r_symbol_ratio"]        # '#' per word >> 0.1
    assert not rows[6]["r_alpha_words"]         # mostly digit tokens
    assert not rows[7]["r_mean_word_len"]       # mean word length > 10
    assert rows[8]["n_words"] == 0 and rows[8]["sum_word_len"] == 0
    # empty doc: ratio gates pass vacuously (0 <= 0), word count fails
    assert not rows[8]["r_word_count"] and rows[8]["r_symbol_ratio"]


def test_semantic_dedup_semantics(spark):
    """Near-identical vectors in the same cluster collapse to the
    minimum id; orthogonal vectors survive; the kept set carries its
    cluster assignment."""
    from data_transformation_2022_spark.operators.similarity import (
        pq_fit,
        semantic_dedup,
    )
    from data_transformation_2022_spark.queries import _flit

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0 -> dropped
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.01, 0.999, 0.0, 0.0]),   # near-dup of 2 -> dropped
        (4, [0.0, 0.0, 1.0, 0.0]),      # unique -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_fit(df, "vec_id", "embedding", m=1, k=2, fit_cap=100)
    kept = semantic_dedup(
        df, "vec_id", "embedding", books, _flit, threshold=0.95
    )
    ids = {r["vec_id"] for r in kept.collect()}
    assert 0 in ids and 2 in ids and 4 in ids
    assert 1 not in ids and 3 not in ids


def test_semantic_dedup_null_vector_and_duplicate_ids(spark):
    """Degenerate inputs the gram-matrix candidate stage must survive
    (r10 self-review): a NULL embedding is excluded from pairing but
    KEPT in the output (the r9 zip_with fold gave it a null cosine —
    same policy), and duplicate ids must not self-pair — a positional
    upper-triangle would emit (X, X) at cosine 1 and spuriously drop
    every duplicated id."""
    from data_transformation_2022_spark.operators.similarity import (
        pq_fit,
        semantic_dedup,
    )
    from data_transformation_2022_spark.queries import _flit

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),   # near-dup of 0 -> dropped
        (2, None),                       # NULL vector: kept, never pairs
        (3, [3.0, 3.0, 3.0, 3.0]),      # duplicate id pair below
        (3, [3.0, 3.0, 3.0, 3.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_fit(
        df.filter(F.col("embedding").isNotNull()),
        "vec_id", "embedding", m=1, k=2, fit_cap=100,
    )
    kept = {
        r["vec_id"]
        for r in semantic_dedup(
            df, "vec_id", "embedding", books, _flit, threshold=0.95
        ).collect()
    }
    assert 0 in kept and 1 not in kept
    assert 2 in kept, "null-vector row must survive, not crash or drop"
    assert 3 in kept, "duplicate ids must not self-pair into dropped"


def test_semantic_dedup_identical_vectors_bounded(spark):
    """Degenerate skew gate: 10k identical vectors land in ONE cluster;
    the windowed cap bounds pairing to the first ``max_cluster`` ids, so
    the job completes quickly and dedups within the capped pool while
    keeping everything beyond it (partial dedup, never O(n^2))."""
    from data_transformation_2022_spark.operators.similarity import (
        pq_fit,
        semantic_dedup,
    )
    from data_transformation_2022_spark.queries import _flit

    n = 10_000
    df = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(2.0), F.lit(3.0), F.lit(4.0)).alias("embedding"),
    )
    books = pq_fit(df, "vec_id", "embedding", m=1, k=4, fit_cap=500)
    kept = semantic_dedup(
        df, "vec_id", "embedding", books, _flit, threshold=0.9, max_cluster=100
    )
    ids = sorted(r["vec_id"] for r in kept.collect())
    # first 100 ids collapse to id 0; ids >= 100 sat out of pairing
    assert ids[0] == 0 and len(ids) == 1 + (n - 100)
    assert ids[1] == 100


def test_dsir_weights_separate_target(spark):
    """Documents made of target-style bigrams outscore off-target
    documents; the per-bucket ratios come from one shared Python log
    implementation, so Spark's weights equal a numpy recomputation."""
    from data_transformation_2022_spark.functions.text import dsir_weights

    target_text = "spark shuffle join plan codegen scan"
    other_text = "lorem ipsum dolor sit amet consectetur"
    rows = (
        [(i, target_text, True) for i in range(10)]
        + [(100 + i, other_text, False) for i in range(10)]
        + [(200, target_text, False), (201, other_text, False)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, is_t boolean")
    out = {
        r["doc_id"]: r["dsir_weight"]
        for r in dsir_weights(df, "doc_id", "text", F.col("is_t")).collect()
    }
    # doc 200 repeats the target bigrams -> high weight;
    # doc 201 repeats the raw-only bigrams -> low weight
    assert out[200] > 0 > out[201]
    assert out[200] == out[0] and out[201] == out[100]


# --- BPE merge training ----------------------------------------------------


def _naive_bpe(texts, n_merges=8, min_count=2):
    """Sequential reference BPE: overlapping pair counts, (count desc,
    w1, w2) argmax, left-to-right non-overlapping lookbehind rewrite —
    the exact semantics bpe_train_merges distributes."""
    from collections import Counter

    seqs = [t.lower().split() for t in texts]
    merges = []
    for step in range(n_merges):
        counts = Counter()
        for s in seqs:
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] += 1
        if not counts:
            break
        (w1, w2), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_count:
            break
        merged = w1 + " " + w2
        merges.append((step, w1, w2, cnt, merged))
        out = []
        for s in seqs:
            ns = []
            for x in s:
                if ns and ns[-1] == w1 and x == w2:
                    ns[-1] = merged
                else:
                    ns.append(x)
            out.append(ns)
        seqs = out
    return merges, seqs


def test_bpe_merges_match_naive(spark, sf_dir):
    """The distributed trainer's merge table equals the sequential
    reference's, row for row, on the real sf0.001 corpus."""
    from data_transformation_2022_spark.operators.bpe import bpe_train_merges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    texts = [r.text for r in docs.select("text").collect()]
    expect, _ = _naive_bpe(texts, n_merges=6)
    got = [
        (r.step, r.w1, r.w2, int(r.pair_count), r.merged)
        for r in bpe_train_merges(docs, "text", n_merges=6).orderBy("step").collect()
    ]
    assert got == expect
    assert len(got) == 6  # corpus is repetitive enough to sustain 6 merges

    # periodic fold-in (ADVICE r11): folding pending merges into the
    # checkpointed base every 2 rounds is semantics-free — the merge
    # table is identical to the unfolded run and to the naive replay
    folded = [
        (r.step, r.w1, r.w2, int(r.pair_count), r.merged)
        for r in bpe_train_merges(docs, "text", n_merges=6, fold_every=2)
        .orderBy("step")
        .collect()
    ]
    assert folded == expect


def test_bpe_encode_applies_learned_merges(spark):
    """Encoding with a learned merge list shrinks sequences by exactly
    the number of merge applications, and overlapping runs resolve
    left-first ('a a a' -> ['a a', 'a'])."""
    from data_transformation_2022_spark.operators.bpe import bpe_encode

    df = spark.createDataFrame(
        [(1, "a a a b c"), (2, "b c b c"), (3, "x y z")], "id int, text string"
    )
    enc = {
        r.id: (list(r.syms), r.n_syms)
        for r in bpe_encode(df, "text", [("a", "a"), ("b", "c")])
        .selectExpr("id", "__syms as syms", "n_syms")
        .collect()
    }
    assert enc[1] == (["a a", "a", "b c"], 3)
    assert enc[2] == (["b c", "b c"], 2)
    assert enc[3] == (["x", "y", "z"], 3)


def test_vocab_and_tfidf_shapes(spark, sf_dir):
    """vocab_stats is bounded by k and cf >= df everywhere; tfidf ranks
    are dense 1..k per document with no global sort in the vocab plan
    (TakeOrderedAndProject, not a full Sort+Exchange materialization)."""
    from data_transformation_2022_spark.functions.text import (
        tfidf_topk_terms,
        vocab_stats,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    v = vocab_stats(docs, "doc_id", "text", k=10)
    assert "TakeOrderedAndProject" in v._jdf.queryExecution().executedPlan().toString()
    rows = v.collect()
    assert len(rows) == 10 and all(r.cf >= r.df > 0 for r in rows)

    t = tfidf_topk_terms(docs.limit(50), "doc_id", "text", k=3)
    by_doc = {}
    for r in t.collect():
        by_doc.setdefault(r.doc_id, []).append(r.rank)
    assert len(by_doc) == 50
    assert all(sorted(v) == list(range(1, len(v) + 1)) for v in by_doc.values())


# ---------------------------------------------------------------------------
# round-6 continuation: KMV sketches / z-order / BPE encode / stream join
# ---------------------------------------------------------------------------


def test_kmv_sketch_is_exact_k_minimums(spark):
    """The two-level (sub-bucketed) k-minimums equals the brute-force k
    smallest distinct hashes per group — the sub-bucket pruning is a
    plan optimization, never an approximation."""
    from data_transformation_2022_spark.functions.text import md5_prefix_long
    from data_transformation_2022_spark.operators.sketches import kmv_sketch

    df = spark.range(2000).selectExpr(
        "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g",
        "CAST(id % 700 AS STRING) AS key",
    )
    sk = kmv_sketch(df, ["g"], F.col("key"), k=32).toPandas()
    brute = (
        df.select("g", md5_prefix_long(F.col("key"), 15).alias("h"))
        .distinct()
        .toPandas()
    )
    for g in ("a", "b"):
        expect = sorted(set(brute[brute.g == g].h))[:32]
        got = sorted(sk[sk.g == g].h)
        assert got == expect, g


def test_kmv_estimate_accuracy_and_merge_property(spark):
    """Estimate within 4 standard errors (stderr ~ 1/sqrt(k-1)) of a
    5000-key domain, and the merged-sketch estimate equals the estimate
    from the brute-force GLOBAL k smallest — the KMV merge property."""
    from data_transformation_2022_spark.functions.text import md5_prefix_long
    from data_transformation_2022_spark.operators.sketches import (
        HASH_SPACE,
        kmv_distinct_report,
        kmv_union_report,
    )

    k = 64
    df = spark.range(20000).selectExpr(
        "CASE WHEN id % 4 = 0 THEN 'a' WHEN id % 4 = 1 THEN 'b' "
        "WHEN id % 4 = 2 THEN 'c' ELSE 'd' END AS g",
        "CAST(id % 5000 AS STRING) AS key",
    )
    rep = kmv_distinct_report(df, ["g"], F.col("key"), k=k).collect()
    assert len(rep) == 4
    for r in rep:
        assert r["rel_err"] < 4.0 / (k - 1) ** 0.5, r

    uni = kmv_union_report(df, ["g"], F.col("key"), k=k).collect()[0]
    assert uni["n_exact"] == 5000
    hashes = sorted(
        r["h"]
        for r in df.select(md5_prefix_long(F.col("key"), 15).alias("h"))
        .distinct()
        .collect()
    )
    expect = round((k - 1) * HASH_SPACE / float(hashes[k - 1]), 6)
    assert uni["est_distinct"] == expect


def test_zvalue_matches_python_interleave(spark):
    """The Morton key expression reproduces the reference bit
    interleave for exhaustive small values and boundary cells."""
    from data_transformation_2022_spark.functions.zorder import zvalue

    def py_z(x, y, bits):
        z = 0
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    pairs = [(x, y) for x in range(8) for y in range(8)]
    pairs += [(1023, 1023), (0, 1023), (1023, 0), (512, 256)]
    df = spark.createDataFrame(pairs, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zvalue(F.col("x"), F.col("y"), 10).alias("z")).collect()
    }
    for x, y in pairs:
        assert got[(x, y)] == py_z(x, y, 10), (x, y)


def test_zorder_buckets_partition_and_localize(spark, sf_dir):
    """Top-4-bit z-buckets fix 2 high bits of EACH dimension, so every
    bucket's bounding box covers at most 1/16 of the grid — the
    guarantee that makes the layout prune 2-D predicates. Buckets
    partition the table exactly."""
    from data_transformation_2022_spark.functions.zorder import zorder_extent_report

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rep = zorder_extent_report(orders, "o_custkey", "o_totalprice").collect()
    assert sum(r["n"] for r in rep) == orders.count()
    for r in rep:
        assert r["extent_frac"] <= 1.0 / 16 + 1e-9, r
        assert 0 <= r["zbucket"] < 16


def test_bpe_encode_overlap_and_stacked_merges(spark):
    """Left-to-right non-overlap ("a a a" -> ["a a", "a"]) and stacked
    merges (a pair of already-merged symbols) both encode correctly."""
    from data_transformation_2022_spark.operators.bpe import bpe_encode

    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "x y z w")], "doc_id long, text string"
    )
    out = {
        r["doc_id"]: (list(r["__syms"]), r["n_syms"])
        for r in bpe_encode(
            docs, "text", [("a", "a"), ("x", "y"), ("z", "w"), ("x y", "z w")]
        ).collect()
    }
    assert out[1] == (["a a", "a"], 2)
    assert out[2] == (["x y z w"], 1)


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """The drained stream-stream interval join emits exactly the batch
    interval-join pairs (append mode, inner join, both sides
    watermarked)."""
    from data_transformation_2022_spark.streaming.pipelines import stream_stream_join

    got = {
        (r["user_id"], r["view_id"], r["click_id"], r["delay_us"])
        for r in stream_stream_join(
            spark, sf_dir, window_hours=3, query_name="t_ssj_gate"
        ).collect()
    }
    e = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    v = e.filter("event_type = 'view'").selectExpr(
        "user_id", "event_id AS view_id", "ts AS view_ts"
    )
    c = e.filter("event_type = 'click'").selectExpr(
        "user_id AS c_user", "event_id AS click_id", "ts AS click_ts"
    )
    batch = v.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (F.col("click_ts") <= F.col("view_ts") + F.expr("INTERVAL 3 HOURS")),
    ).select(
        "user_id",
        "view_id",
        "click_id",
        (F.unix_micros("click_ts") - F.unix_micros("view_ts")).alias("delay_us"),
    )
    expect = {tuple(r) for r in batch.collect()}
    assert got == expect and len(got) > 0


def test_weighted_priority_sample_proportional_and_stable(spark):
    """Inclusion scales with weight (w=10 rows ~10x the w=1 rows in the
    sample) and the selected id set is invariant under repartitioning —
    the hash-priority, not the layout, decides."""
    from data_transformation_2022_spark.operators.sampling import (
        weighted_priority_sample,
    )

    df = spark.range(1000).selectExpr(
        "id", "CASE WHEN id < 500 THEN 10 ELSE 1 END AS w"
    )
    got = weighted_priority_sample(df, ["id"], "w", k=200)
    ids = {r["id"] for r in got.collect()}
    heavy = sum(1 for i in ids if i < 500)
    light = len(ids) - heavy
    assert len(ids) == 200
    assert heavy > 3 * light, (heavy, light)
    ids2 = {
        r["id"]
        for r in weighted_priority_sample(
            df.repartition(13, "id"), ["id"], "w", k=200
        ).collect()
    }
    assert ids2 == ids


def test_kmv_join_cardinality_known_overlap(spark):
    """A = 0..999, B = 500..1499: exact fields are exact, and the
    sketch-only intersection estimate lands within a generous
    statistical bound of the true 500."""
    from data_transformation_2022_spark.operators.sketches import (
        kmv_join_cardinality_report,
    )

    a = spark.range(0, 1000).selectExpr("CAST(id AS STRING) AS k")
    b = spark.range(500, 1500).selectExpr("CAST(id AS STRING) AS k")
    r = kmv_join_cardinality_report(a, F.col("k"), b, F.col("k"), k=64).collect()[0]
    assert (r["n_exact_a"], r["n_exact_b"], r["n_exact_inter"]) == (1000, 1000, 500)
    assert abs(r["est_inter"] - 500) / 500 < 0.6, r["est_inter"]

    # small-domain regression: union < k means every sketch is the whole
    # domain — the estimate must be EXACT (the n_both/k denominator bug
    # gave ~10/64 of the truth here)
    s = spark.range(0, 10).selectExpr("CAST(id AS STRING) AS k")
    r2 = kmv_join_cardinality_report(s, F.col("k"), s, F.col("k"), k=64).collect()[0]
    assert r2["n_exact_inter"] == 10 and r2["est_inter"] == 10.0 and r2["rel_err"] == 0.0


def test_bpe_encode_packed_equals_fold(spark, sf_dir):
    """The packed string-replace encoder and the array-fold encoder
    produce identical symbol sequences on the real corpus (plus the
    stacked/overlap edge docs)."""
    from data_transformation_2022_spark.operators.bpe import (
        PACK_JOIN,
        bpe_encode,
        bpe_encode_packed,
    )
    from data_transformation_2022_spark.queries import _BPE_MERGES

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    ).union(
        spark.createDataFrame(
            [(100001, "a a a"), (100002, "table hash part filter slow key")],
            "doc_id long, text string",
        )
    )
    merges = _BPE_MERGES + [("a", "a")]
    fold = {
        r["doc_id"]: (r["n_syms"], PACK_JOIN.join(r["__syms"]))
        for r in bpe_encode(docs, "text", merges).collect()
    }
    packed = {
        r["doc_id"]: (r["n_syms"], r["syms"])
        for r in bpe_encode_packed(docs, "text", merges).collect()
    }
    assert fold == packed and len(packed) == docs.count()


def test_zorder_layout_prunes_2d_box(spark, sf_dir, tmp_path):
    """End-to-end skipping proof: write orders one partition per
    z-bucket, answer a 2-D box predicate by reading ONLY the buckets
    whose bounding box (from the extent report — the skipping index)
    overlaps the query box, and get exactly the full-scan answer while
    touching a fraction of the buckets."""
    from pyspark.sql import functions as F

    from data_transformation_2022_spark.functions.zorder import zvalue

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    bounds = orders.agg(
        F.min("o_custkey").alias("xlo"), F.max("o_custkey").alias("xhi"),
        F.min("o_totalprice").alias("ylo"), F.max("o_totalprice").alias("yhi"),
    ).collect()[0]
    cells = 1 << 10
    b = orders.crossJoin(
        F.broadcast(spark.createDataFrame([tuple(bounds)], "xlo long, xhi long, ylo double, yhi double"))
    )
    cx = F.expr(
        f"CAST((o_custkey - xlo) div ((xhi - xlo + {cells}) div {cells}) AS BIGINT)"
    )
    cy = F.least(
        F.lit(cells - 1).cast("bigint"),
        F.floor((F.col("o_totalprice") - F.col("ylo")) * F.lit(float(cells)) / (F.col("yhi") - F.col("ylo"))).cast("bigint"),
    )
    keyed = b.withColumn("cx", cx).withColumn("cy", cy).withColumn(
        "zbucket", F.shiftright(zvalue(F.col("cx"), F.col("cy"), 10), 16)
    )
    out = str(tmp_path / "zorders")
    keyed.write.partitionBy("zbucket").parquet(out)

    # skipping index: per-bucket bounding boxes in RAW units
    idx = {
        r["zbucket"]: (r["lo_ck"], r["hi_ck"], r["lo_tp"], r["hi_tp"])
        for r in keyed.groupBy("zbucket").agg(
            F.min("o_custkey").alias("lo_ck"), F.max("o_custkey").alias("hi_ck"),
            F.min("o_totalprice").alias("lo_tp"), F.max("o_totalprice").alias("hi_tp"),
        ).collect()
    }
    ck_lo, ck_hi, tp_lo, tp_hi = 100, 400, 50_000.0, 150_000.0
    hit = [
        z for z, (a, b2, c, d) in idx.items()
        if not (b2 < ck_lo or a > ck_hi or d < tp_lo or c > tp_hi)
    ]
    assert 0 < len(hit) < 16 // 2, hit  # the layout actually skips

    pred = (
        (F.col("o_custkey").between(ck_lo, ck_hi))
        & (F.col("o_totalprice").between(tp_lo, tp_hi))
    )
    pruned = (
        spark.read.parquet(out)
        .filter(F.col("zbucket").isin(hit))
        .filter(pred)
        .agg(F.count(F.lit(1)), F.sum(F.col("o_totalprice").cast("decimal(18,6)")))
        .collect()[0]
    )
    full = (
        orders.filter(pred)
        .agg(F.count(F.lit(1)), F.sum(F.col("o_totalprice").cast("decimal(18,6)")))
        .collect()[0]
    )
    assert tuple(pruned) == tuple(full) and pruned[0] > 0


def test_sketch_and_skew_plan_shapes(spark, sf_dir):
    """Plan gates: the KMV per-group sketch path has NO single-partition
    exchange (the two-level k-minimums ride sub-bucketed keys), and the
    skew report ends in TakeOrderedAndProject, never a global sort."""
    from pyspark.sql import functions as F

    from data_transformation_2022_spark.operators.relational import skew_report
    from data_transformation_2022_spark.operators.sketches import (
        kmv_distinct_report,
    )

    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    rep = kmv_distinct_report(e, ["event_type"], F.col("user_id").cast("string"))
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sk = skew_report(li, "l_suppkey", top=10)
    plan2 = sk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan2


def test_streaming_lsh_equals_batch(spark, sf_dir):
    """The drained online LSH pair set equals batch lsh_candidate_pairs
    on the real corpus (same constants, same banding, caps non-binding)."""
    from data_transformation_2022_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from data_transformation_2022_spark.streaming.pipelines import stream_lsh_neardup

    got = {
        (r["id_a"], r["id_b"])
        for r in stream_lsh_neardup(
            spark, sf_dir, k=16, bands=4, max_bucket=256, query_name="t_slsh_eq"
        ).collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sigs = minhash_signatures(docs, "doc_id", "text", k=16)
    exp = {
        (r["id_a"], r["id_b"])
        for r in lsh_candidate_pairs(
            sigs, "doc_id", k=16, bands=4, max_bucket=256
        ).collect()
    }
    assert got == exp and len(got) > 0


def test_streaming_band_rows_arrow_equals_catalyst(spark, sf_dir):
    """The vectorized Arrow signature stage (hashlib md5 + numpy
    universal-hash minimums) produces EXACTLY the band rows of the
    legacy pure-expression fold — same (id, band, bh) set, so the
    r11 signature rewrite cannot have changed any emitted pair."""
    from data_transformation_2022_spark.streaming.pipelines import (
        _streaming_band_rows,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    arrow = {
        tuple(r)
        for r in _streaming_band_rows(
            docs, "doc_id", "text", 16, 4, sig_impl="arrow"
        ).collect()
    }
    legacy = {
        tuple(r)
        for r in _streaming_band_rows(
            docs, "doc_id", "text", 16, 4, sig_impl="catalyst"
        ).collect()
    }
    assert arrow == legacy and len(arrow) > 0


def test_streaming_lsh_degenerate_bounded(spark, tmp_path):
    """5k identical documents: the keep-first state cap bounds emitted
    pairs to C(cap, 2) per bucket (identical docs share ONE bucket per
    band) and the drain completes — the O(n²) blowup cannot happen."""
    import pandas as pd

    from data_transformation_2022_spark.streaming.pipelines import stream_lsh_neardup

    n, cap = 5000, 16
    src = str(tmp_path / "dup_corpus")
    spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(n), "text": ["all work and no play makes jack a dull boy"] * n}
        )
    ).coalesce(1).write.parquet(f"{src}/documents.parquet")
    pairs = stream_lsh_neardup(
        spark, src, k=16, bands=4, max_bucket=cap, query_name="t_slsh_deg"
    ).collect()
    # identical docs: every band collapses to one bucket; distinct pairs
    # are exactly the first cap ids' C(cap, 2) combinations
    assert len(pairs) == cap * (cap - 1) // 2
    ids = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    assert ids == set(range(cap))


def test_clean_control_chars_dirty_input(spark):
    """Control bytes become single spaces, runs collapse, ends trim —
    and the cleaned text passes the packed-encoder sentinel guard."""
    from data_transformation_2022_spark.functions.text import clean_control_chars
    from data_transformation_2022_spark.operators.bpe import bpe_encode_packed

    docs = spark.createDataFrame(
        [
            (1, "a\x1fa\x00b\tc  \r\n d\x7f"),
            (2, "already clean"),
            (3, "\x0b\x1e\x01"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["clean"]
        for r in docs.select(
            "doc_id", clean_control_chars(F.col("text")).alias("clean")
        ).collect()
    }
    assert out[1] == "a a b c d"
    assert out[2] == "already clean"
    assert out[3] == ""
    cleaned = docs.select("doc_id", F.col("text"), clean_control_chars(F.col("text")).alias("c")).drop("text").withColumnRenamed("c", "text")
    enc = bpe_encode_packed(cleaned, "text", [("a", "a")]).collect()
    # doc 1 cleans to "a a b c d": (a,a) merges -> ["a a", b, c, d]
    assert {r["doc_id"]: r["n_syms"] for r in enc} == {1: 4, 2: 2, 3: 0}


def test_bloom_filter_no_false_negatives_and_prunes(spark):
    """Every true key survives the probe (no false negatives — the
    correctness half), and the false-positive rate over a disjoint key
    set stays near the design point (the pruning half: at 16 bits/key
    the fp rate is ~1%, so the fact shuffle shrinks ~100x beyond the
    true-match fraction)."""
    from data_transformation_2022_spark.functions.bloom import (
        bloom_build,
        bloom_prune,
    )

    keys = spark.range(0, 1000).select((F.col("id") * 7 + 3).alias("k"))
    bloom = bloom_build(keys, "k")
    assert bloom.n_keys == 1000
    assert bloom.m >= 16 * 1000
    # probe the true keys: all pass
    kept_true = bloom_prune(keys, "k", bloom).count()
    assert kept_true == 1000
    # probe 20k keys from a disjoint range: only false positives pass
    probe = spark.range(100_000, 120_000).select(F.col("id").alias("k"))
    fp = bloom_prune(probe, "k", bloom).count()
    assert fp <= 0.05 * 20_000, f"false-positive rate too high: {fp}/20000"


def test_bloom_pruned_join_equals_plain_join(spark):
    """The pruned join returns exactly the plain join's rows — false
    positives are re-checked by the equi-join — including when the dim
    side is empty."""
    from data_transformation_2022_spark.functions.bloom import bloom_pruned_join

    fact = spark.range(0, 5000).select(
        (F.col("id") % 700).alias("fk"), F.col("id").alias("payload")
    )
    dim = spark.range(0, 50).select((F.col("id") * 13).alias("dk"))
    got = (
        bloom_pruned_join(fact, dim, "fk", "dk")
        .select("fk", "payload", "dk")
        .collect()
    )
    exp = (
        fact.join(dim, fact["fk"] == dim["dk"])
        .select("fk", "payload", "dk")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))
    assert len(exp) > 0
    empty = dim.filter(F.lit(False))
    assert bloom_pruned_join(fact, empty, "fk", "dk").count() == 0


def test_bloom_build_caps_bit_array(spark):
    """The word array is bounded by max_bits however many keys arrive —
    the broadcast stays metadata-sized and only the fp rate degrades."""
    from data_transformation_2022_spark.functions.bloom import bloom_build

    keys = spark.range(0, 10_000).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", bits_per_key=16, max_bits=1 << 14)
    assert bloom.m == 1 << 14
    assert len(bloom.words) == (1 << 14) // 64


def test_bloom_non_pow2_cap_floors_instead_of_crashing(spark):
    """A non-power-of-two max_bits must floor to the mask-compatible
    power below it — the & (m-1) probe and m//64 sizing both assume a
    power of two (10_000 used to IndexError at position 9999)."""
    from data_transformation_2022_spark.functions.bloom import (
        bloom_build,
        bloom_prune,
    )

    keys = spark.range(0, 2000).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", bits_per_key=16, max_bits=10_000)
    assert bloom.m == 1 << 13
    assert bloom_prune(keys, "k", bloom).count() == 2000  # no false negatives


def test_bloom_pruned_join_refuses_unsound_types(spark):
    """Pruning the fact side is only sound for inner/semi/right-outer;
    a type mismatch between the keys would produce xxhash64 false
    negatives — both must refuse loudly instead of corrupting."""
    import pytest

    from data_transformation_2022_spark.functions.bloom import bloom_pruned_join

    fact = spark.range(0, 100).select((F.col("id") % 7).alias("fk"))
    dim = spark.range(0, 3).select((F.col("id") * 2).alias("dk"))
    with pytest.raises(ValueError, match="outer or anti"):
        bloom_pruned_join(fact, dim, "fk", "dk", how="left")
    with pytest.raises(ValueError, match="outer or anti"):
        bloom_pruned_join(fact, dim, "fk", "dk", how="left_anti")
    dim_int = dim.select(F.col("dk").cast("int"))
    with pytest.raises(ValueError, match="type-sensitive"):
        bloom_pruned_join(fact, dim_int, "fk", "dk")
    # right outer IS sound: unmatched fact rows never appear in it
    got = bloom_pruned_join(fact, dim, "fk", "dk", how="right").count()
    exp = fact.join(dim, fact["fk"] == dim["dk"], "right").count()
    assert got == exp
    # every Spark-accepted SPELLING of a sound type is accepted too
    for spelling in ("Inner", "RIGHT", "rightOuter", "LEFT_SEMI"):
        assert bloom_pruned_join(fact, dim, "fk", "dk", how=spelling).count() >= 0
    with pytest.raises(ValueError, match="outer or anti"):
        bloom_pruned_join(fact, dim, "fk", "dk", how="FULL_OUTER")


def test_hist_quantile_merge_and_accuracy(spark):
    """The __merged__ row is derived from per-group histograms alone and
    must equal the histogram of the union (mergeability); estimates land
    within one bin width of numpy's exact quantiles."""
    import numpy as np

    from data_transformation_2022_spark.operators.sketches import (
        hist_quantile_report,
    )

    rng = np.random.RandomState(7)
    vals_a = rng.uniform(0.0, 100.0, 4000)
    vals_b = rng.uniform(50.0, 150.0, 2000)
    rows = [("a", float(v)) for v in vals_a] + [("b", float(v)) for v in vals_b]
    df = spark.createDataFrame(rows, "grp string, v double")
    rep = {r["grp"]: r for r in hist_quantile_report(df, "grp", "v").collect()}
    assert set(rep) == {"a", "b", "__merged__"}
    assert rep["__merged__"]["n_rows"] == 6000
    lo, hi = 0.0, 150.0
    width = (hi - lo) / 256.0
    allv = np.concatenate([vals_a, vals_b])
    for grp, data in (("a", vals_a), ("b", vals_b), ("__merged__", allv)):
        for name, q in (("p50_est", 0.5), ("p90_est", 0.9), ("p99_est", 0.99)):
            exact = float(np.quantile(data, q))
            est = rep[grp][name]
            assert abs(est - exact) <= 2 * width + 1e-9, (
                f"{grp}/{name}: est {est} vs exact {exact}"
            )


def test_hist_quantile_constant_column(spark):
    """Degenerate hi == lo: everything lands in bin 0 and every quantile
    estimate equals the constant."""
    from data_transformation_2022_spark.operators.sketches import (
        hist_quantile_report,
    )

    df = spark.createDataFrame(
        [("x", 5.0)] * 40 + [("y", 5.0)] * 10, "grp string, v double"
    )
    rep = hist_quantile_report(df, "grp", "v").collect()
    assert len(rep) == 3
    for r in rep:
        for name in ("p50_est", "p90_est", "p99_est"):
            assert r[name] == 5.0


def test_cms_one_sided_error_and_heavy_hitter(spark):
    """CMS estimates are one-sided (never below the true count), the
    heavy hitter's estimate is tight (collisions add at most the noise
    mass over width cells), and the exact top-N ordering is preserved
    in the probe set."""
    from data_transformation_2022_spark.operators.sketches import cms_topk_report

    heavy = [("hot",)] * 2000
    noise = [(f"u{i}",) for i in range(3000)]
    df = spark.createDataFrame(heavy + noise, "k string")
    rep = cms_topk_report(df, F.col("k"), top_n=5, depth=4, width=1024)
    rows = {r["key"]: r for r in rep.collect()}
    assert "hot" in rows
    for r in rows.values():
        assert r["est"] >= r["n_exact"], "CMS must never underestimate"
    hot = rows["hot"]
    assert hot["n_exact"] == 2000
    # expected collision mass per cell ~ 3000/1024 ≈ 3; min over 4 rows
    # stays far under 5% of the heavy count
    assert hot["est"] - hot["n_exact"] <= 100


def test_ivf_pq_rerank_recall_and_full_shortlist(spark, sf_dir):
    """IVF-PQ-rerank invariants: (a) with every list probed and a
    shortlist covering the whole corpus, the ADC stage cannot drop
    anyone, so the result matches the float-path IVF full probe up to
    rounding ties; (b) at the default pruned settings recall against
    the exact brute force stays above the floor; (c) results are
    invariant to input partitioning (deterministic fits)."""
    from data_transformation_2022_spark.operators.similarity import (
        ivf_pq_topk,
        ivf_topk,
    )
    from data_transformation_2022_spark.sources.readers import load_table

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    exact = cosine_topk_bruteforce(e, q, "vec_id", "embedding", k=5)
    ex: dict[int, set] = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["cand_id"])

    def sets(df):
        out: dict[int, set] = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["cand_id"])
        return out

    def recall(ap):
        return sum(len(ex[k] & ap.get(k, set())) for k in ex) / sum(
            len(s) for s in ex.values()
        )

    n = e.count()
    full = sets(
        ivf_pq_topk(
            e, q, "vec_id", "embedding", k=5,
            n_lists=16, n_probe=16, shortlist=n,
        )
    )
    ivf_full = sets(
        ivf_topk(e, q, "vec_id", "embedding", k=5, n_lists=16, n_probe=16)
    )
    agree = sum(len(full[k] & ivf_full.get(k, set())) for k in full) / sum(
        len(s) for s in full.values()
    )
    assert agree >= 0.98, f"full-shortlist IVF-PQ diverged from IVF: {agree}"

    default = ivf_pq_topk(e, q, "vec_id", "embedding", k=5)
    assert recall(sets(default)) >= 0.5
    repart = sets(
        ivf_pq_topk(e.repartition(7), q, "vec_id", "embedding", k=5)
    )
    assert repart == sets(default), "result depends on input partitioning"


def test_schema_evolution_null_fills_old_batches(spark, sf_dir):
    """mergeSchema must null-fill v1-batch rows for columns that only
    exist in the v2 schema, and the merged scan must still prune to the
    requested columns."""
    from data_transformation_2022_spark.queries import REGISTRY

    df = REGISTRY["io_schema_evolution"].spark(spark, sf_dir)
    rows = {r["lang"]: r for r in df.collect()}
    total = sum(r["n"] for r in rows.values())
    with_src = sum(r["n_with_source"] for r in rows.values())
    assert 0 < with_src < total  # v1 rows really contribute NULL source
    # column pruning survives the merged footer: the scan reads only
    # the aggregated columns, not text
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "text" not in plan.split("ReadSchema")[-1][:400]


def test_variant_get_missing_path_is_null(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([('{"k": 7}',), ('{"other": 1}',)], "props string")
    got = df.select(
        F.variant_get(F.parse_json(F.col("props")), "$.k", "bigint").alias("k")
    ).collect()
    assert sorted([r["k"] for r in got], key=lambda x: (x is None, x)) == [7, None]



# ---------------------------------------------------------------------------
# classifier-based quality filtering (fastText/CCNet/LLaMA leg)
# ---------------------------------------------------------------------------


def test_quality_classifier_separates_good_from_bad(spark):
    """The classifier leg of quality filtering: train on a labeled seed
    of clean prose vs gibberish, and the margins must separate the two
    populations — every known-good doc scores strictly above every
    known-bad doc, and preds match the labels."""
    from pyspark.sql import functions as F

    from data_transformation_2022_spark.functions.text import (
        quality_classifier_scores,
    )

    good_words = "the cat sat on the mat and that dog ran with great joy to be free"
    bad_words = "zxq vrk jjw qqp zzt xkcd wvut plorg znarf blixt qwop vrmt"
    rows = []
    for i in range(40):
        gw = good_words.split()
        bw = bad_words.split()
        rows.append((i, " ".join(gw[i % 5 :] + gw[: i % 5]), 1))
        rows.append((100 + i, " ".join(bw[i % 4 :] + bw[: i % 4]), 0))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, label int")

    out = quality_classifier_scores(
        df, "doc_id", "text", F.col("label") == 1, seed_n=40, epochs=400, lr=5.0
    ).join(df.select("doc_id", "label"), "doc_id")
    got = out.collect()
    assert len(got) == 80
    good_m = [r["margin"] for r in got if r["label"] == 1]
    bad_m = [r["margin"] for r in got if r["label"] == 0]
    assert min(good_m) > max(bad_m), (min(good_m), max(bad_m))
    assert all(r["pred"] == r["label"] for r in got)


def test_classifier_eval_holdout_metrics(spark):
    """classifier_eval (r7 verdict item 6): on the good/bad fixture the
    held-out metrics must be near-perfect — AUC >= 0.95 (documented
    floor), precision/recall >= 0.9 — and the confusion counts must be
    internally consistent (tp+fp+fn+tn == n_holdout == corpus - seed;
    n_pos == tp+fn; n_neg == fp+tn)."""
    from pyspark.sql import functions as F

    from data_transformation_2022_spark.functions.text import classifier_eval

    good_words = "the cat sat on the mat and that dog ran with great joy to be free"
    bad_words = "zxq vrk jjw qqp zzt xkcd wvut plorg znarf blixt qwop vrmt"
    rows = []
    for i in range(60):
        gw = good_words.split()
        bw = bad_words.split()
        rows.append((i, " ".join(gw[i % 5 :] + gw[: i % 5]), 1))
        rows.append((100 + i, " ".join(bw[i % 4 :] + bw[: i % 4]), 0))
    df = spark.createDataFrame(rows, "doc_id bigint, text string, label int")

    r = classifier_eval(
        df, "doc_id", "text", F.col("label") == 1, seed_n=40, epochs=400, lr=5.0
    ).collect()[0]
    assert r["n_holdout"] == 120 - 40
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == r["n_holdout"]
    assert r["n_pos"] == r["tp"] + r["fn"]
    assert r["n_neg"] == r["fp"] + r["tn"]
    assert r["auc"] is not None and r["auc"] >= 0.95, r["auc"]
    assert r["precision"] >= 0.9 and r["recall"] >= 0.9, (r["precision"], r["recall"])


def test_classifier_eval_degenerate_single_class(spark):
    """A holdout with one class present yields NULL AUC (and NULL for
    any ratio with a zero denominator) instead of a divide-by-zero."""
    from pyspark.sql import functions as F

    from data_transformation_2022_spark.functions.text import classifier_eval

    rows = [(i, "the cat sat on the mat with joy", 1) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, label int")
    r = classifier_eval(
        df, "doc_id", "text", F.col("label") == 1, seed_n=10, epochs=50, lr=5.0
    ).collect()[0]
    assert r["n_neg"] == 0
    assert r["auc"] is None
    assert r["recall"] is not None  # tp+fn = n_pos > 0


def test_quality_classifier_deterministic_and_bounded_seed(spark):
    """Same data, two runs → identical margins (deterministic trainer,
    salted-hash seed selection). seed_n smaller than the corpus trains
    on a strict bounded subset yet still scores every document."""
    from pyspark.sql import functions as F

    from data_transformation_2022_spark.functions.text import (
        quality_classifier_scores,
    )

    rows = [
        (i, ("the good and solid text here " * 3) if i % 2 else "blorp zzt qqk vrm", i % 2)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, label int")
    kw = dict(seed_n=16, epochs=300, lr=5.0)
    a = quality_classifier_scores(df, "doc_id", "text", F.col("label") == 1, **kw)
    b = quality_classifier_scores(df, "doc_id", "text", F.col("label") == 1, **kw)
    ra = {r["doc_id"]: (r["n_tokens"], r["margin"], r["pred"]) for r in a.collect()}
    rb = {r["doc_id"]: (r["n_tokens"], r["margin"], r["pred"]) for r in b.collect()}
    assert ra == rb
    assert len(ra) == 60  # every doc scored, not just the seed


def test_zvalue_nd_matches_python_interleave(spark):
    """The N-D Morton key reproduces the reference round-robin
    interleave (and its N=2 case equals the 2-D zvalue layout)."""
    from data_transformation_2022_spark.functions.zorder import zvalue_nd

    def py_z(vals, bits):
        n = len(vals)
        z = 0
        for i in range(bits):
            for j, v in enumerate(vals):
                z |= ((v >> i) & 1) << (i * n + j)
        return z

    triples = [(x, y, w) for x in range(4) for y in range(4) for w in range(4)]
    triples += [(1023, 0, 1023), (512, 256, 7)]
    df = spark.createDataFrame(triples, "x long, y long, w long")
    got = {
        (r["x"], r["y"], r["w"]): r["z"]
        for r in df.select(
            "x", "y", "w",
            zvalue_nd([F.col("x"), F.col("y"), F.col("w")], 10).alias("z"),
        ).collect()
    }
    for t in triples:
        assert got[t] == py_z(list(t), 10), t

    import pytest as _pytest

    with _pytest.raises(ValueError):
        zvalue_nd([F.col("x")] * 7, 10)  # 70 key bits > 62


def test_zorder_nd_buckets_partition_and_localize(spark, sf_dir):
    """3-key z-buckets from the top 6 Morton bits pin 2 high bits of
    EACH dimension: every bucket's box covers at most 1/64 of the 3-D
    grid (1/4 per dimension), and buckets partition the table."""
    from data_transformation_2022_spark.functions.zorder import (
        zorder_extent_report_nd,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rep = zorder_extent_report_nd(
        li, ["l_suppkey", "l_partkey", "l_extendedprice"], bits=10, bucket_bits=6
    ).collect()
    assert sum(r["n"] for r in rep) == li.count()
    cells = 1 << 10
    for r in rep:
        assert 0 <= r["zbucket"] < 64
        assert r["extent_frac"] <= 1.0 / 64 + 1e-9, r
        for j in range(3):  # 2 pinned bits per dim -> extent <= cells/4
            assert r[f"max_c{j}"] - r[f"min_c{j}"] + 1 <= cells // 4, (j, r)


def test_zorder_nd_layout_prunes_3d_box(spark, sf_dir, tmp_path):
    """End-to-end 3-D skipping proof: write lineitem one partition per
    3-key z-bucket, answer a 3-D box predicate reading only buckets
    whose bounding box overlaps the query box — exactly the full-scan
    answer while touching a fraction of the 64 buckets."""
    from data_transformation_2022_spark.functions.zorder import zvalue_nd

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    cols = ["l_suppkey", "l_partkey", "l_extendedprice"]
    bounds = li.agg(
        *[f(c).alias(f"{p}{j}") for j, c in enumerate(cols)
          for p, f in (("lo", F.min), ("hi", F.max))]
    )
    b = li.crossJoin(F.broadcast(bounds))
    cells = 1 << 10
    cs = []
    for j, c in enumerate(cols[:2]):  # integral dims
        cs.append(F.expr(
            f"CAST(({c} - lo{j}) div ((hi{j} - lo{j} + {cells}) div {cells}) AS BIGINT)"
        ))
    cs.append(F.least(
        F.lit(cells - 1).cast("bigint"),
        F.floor((F.col(cols[2]) - F.col("lo2")) * F.lit(float(cells))
                / (F.col("hi2") - F.col("lo2"))).cast("bigint"),
    ))
    keyed = b.withColumn("zbucket", F.shiftright(zvalue_nd(cs, 10), 30 - 6))
    out = str(tmp_path / "zorders3")
    keyed.drop(*[f"lo{j}" for j in range(3)], *[f"hi{j}" for j in range(3)]) \
        .write.partitionBy("zbucket").parquet(out)

    idx = {
        r["zbucket"]: r
        for r in keyed.groupBy("zbucket").agg(
            *[f(c).alias(f"{p}_{c}") for c in cols
              for p, f in (("lo", F.min), ("hi", F.max))]
        ).collect()
    }
    box = {"l_suppkey": (5, 60), "l_partkey": (100, 900),
           "l_extendedprice": (10_000.0, 40_000.0)}
    hit = [
        z for z, r in idx.items()
        if all(not (r[f"hi_{c}"] < lo or r[f"lo_{c}"] > hi)
               for c, (lo, hi) in box.items())
    ]
    assert 0 < len(hit) < len(idx), (len(hit), len(idx))

    pred = None
    for c, (lo, hi) in box.items():
        p = F.col(c).between(lo, hi)
        pred = p if pred is None else pred & p
    agg = lambda d: tuple(d.filter(pred).agg(
        F.count(F.lit(1)),
        F.sum(F.col("l_extendedprice").cast("decimal(18,6)")),
    ).collect()[0])
    pruned = agg(spark.read.parquet(out).filter(F.col("zbucket").isin(hit)))
    assert pruned == agg(li) and pruned[0] > 0


def test_quality_classifier_scoring_plan_shape(spark, sf_dir):
    """Plan gates for the classifier's SCORING path (the part that runs
    over the whole corpus at 100 TB): the weight table joins as a
    broadcast, no row-at-a-time Python UDF anywhere, and the seed
    selection compiles to TakeOrderedAndProject (bounded at any corpus
    size), never a global sort."""
    from data_transformation_2022_spark.functions.text import (
        classifier_seed_hash,
        quality_classifier_scores,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = quality_classifier_scores(
        docs, "doc_id", "text", F.col("lang") == "en", seed_n=64, epochs=50
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan  # no row-wise Python in scoring

    seed = (
        docs.select(
            "doc_id",
            classifier_seed_hash(F.col("doc_id").cast("string")).alias("__h"),
        )
        .orderBy("__h", "doc_id")
        .limit(64)
    )
    seed_plan = seed._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in seed_plan


def test_ppl_bucket_sketch_agrees_with_exact_terciles(spark, sf_dir):
    """The sketch-threshold bucket assignment (fleet form, map-only)
    agrees with the exact NTILE terciles on the vast majority of
    documents — disagreement is confined to bucket boundaries where
    the 256-bin interpolation lands a hair off the exact split — and
    its assignment stage plans with broadcast thresholds and NO sort
    in the scoring branch."""
    from data_transformation_2022_spark.queries import REGISTRY

    exact = {
        r["doc_id"]: r["ppl_bucket"]
        for r in REGISTRY["corpus_ppl_buckets"].spark(spark, sf_dir).collect()
    }
    sk_df = REGISTRY["corpus_ppl_buckets_sketch"].spark(spark, sf_dir)
    sk = {r["doc_id"]: r["ppl_bucket"] for r in sk_df.collect()}
    assert set(sk) == set(exact)
    agree = sum(1 for k in sk if sk[k] == exact[k]) / len(sk)
    assert agree >= 0.9, agree
    # disagreements are never more than one bucket apart
    assert all(abs(sk[k] - exact[k]) <= 1 for k in sk)
    plan = sk_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_cc_auto_escalates_long_chain_to_star(spark):
    """auto must never fail where another engine would succeed: a
    transitive chain longer than max_iters exhausts propagation's
    round budget; auto escalates to star contraction and still returns
    the exact labeling, while an explicit propagation request raises."""
    import pytest

    from data_transformation_2022_spark.operators.dedup import connected_components

    n = 40  # chain 0-1-2-...-39: diameter 39 > max_iters=8
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
    )
    out = connected_components(
        pairs, max_iters=8, algorithm="auto",
        driver_threshold=10, star_threshold=1000,
    ).collect()
    assert len(out) == n and all(r["component"] == 0 for r in out)
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iters=8, algorithm="propagation")


def test_deterministic_shuffle_is_permutation_and_partition_invariant(spark, sf_dir):
    """The shuffle positions are an exact permutation of [0, n), stable
    across repartitionings (retry/cluster-layout independence), and the
    plan has no single-partition global sort."""
    from data_transformation_2022_spark.queries import REGISTRY

    q = REGISTRY["corpus_shuffle_deterministic"].spark
    out = q(spark, sf_dir)
    rows = out.collect()
    n = len(rows)
    assert sorted(r["shuffle_pos"] for r in rows) == list(range(n))
    base = {r["doc_id"]: r["shuffle_pos"] for r in rows}

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(13)
    from data_transformation_2022_spark.functions.order import global_row_number
    from data_transformation_2022_spark.functions.text import md5_prefix_long

    d = docs.select(
        "doc_id",
        md5_prefix_long(
            F.concat(F.col("doc_id").cast("string"), F.lit("|shuffle1")), 15
        ).alias("h"),
    )
    re_rows = global_row_number(d, ["h", "doc_id"], "shuffle_pos", zero_based=True).collect()
    assert {r["doc_id"]: r["shuffle_pos"] for r in re_rows} == base

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_source_quality_keep_rule_edges(spark):
    """Integer keep rule edges: exactly 50% classifier pass keeps
    (>=), exactly 20% duplicated docs keeps (<=), one doc past either
    bound drops — and duplicate counting is within-source only."""
    from pyspark.sql import functions as F

    # synthetic per-doc pred/fingerprint frame, bypassing the trainer:
    # source A: 10 docs, 5 pass, 2 docs sharing one fingerprint (20%)
    # source B: 10 docs, 4 pass (drop), no dups
    # source C: 5 docs, 5 pass, 3 sharing a fingerprint (60% -> drop);
    #   C's dup fingerprint equals A's — cross-source must NOT merge
    rows = []
    for i in range(10):
        rows.append((i, "A", 100 if i < 2 else i, int(i < 5)))
    for i in range(10):
        rows.append((100 + i, "B", 200 + i, int(i < 4)))
    for i in range(5):
        rows.append((200 + i, "C", 100 if i < 3 else 300 + i, 1))
    pred = spark.createDataFrame(
        rows, "doc_id long, source string, fp long, pred int"
    )
    g = pred.groupBy("source", "fp").agg(F.count(F.lit(1)).alias("c"))
    dup = g.groupBy("source").agg(
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).cast("bigint").alias("n_dup_docs"),
        F.sum("c").cast("bigint").alias("n_docs"),
    )
    pr = pred.groupBy("source").agg(F.sum("pred").cast("bigint").alias("n_pass"))
    out = {
        r["source"]: (r["n_docs"], r["n_pass"], r["n_dup_docs"], r["keep"])
        for r in dup.join(pr, "source").select(
            "source", "n_docs", "n_pass", "n_dup_docs",
            ((F.lit(2) * F.col("n_pass") >= F.col("n_docs"))
             & (F.lit(5) * F.col("n_dup_docs") <= F.col("n_docs"))).cast("int").alias("keep"),
        ).collect()
    }
    assert out["A"] == (10, 5, 2, 1)   # both bounds exactly met -> keep
    assert out["B"] == (10, 4, 0, 0)   # 40% pass -> drop
    assert out["C"] == (5, 5, 3, 0)    # 60% dups -> drop, dups not merged with A


def test_fuzzy_decontaminate_flags_near_dup_not_unrelated(spark):
    """A corpus doc that is an exact copy of a benchmark doc and one
    that is a light edit (high shingle Jaccard) are both flagged; an
    unrelated doc is not. Flag counts reflect distinct benchmark
    matches."""
    from data_transformation_2022_spark.operators.dedup import fuzzy_decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    edited = bench_text.replace("today", "tonight")  # 1-word edit
    unrelated = "completely different subject matter about spark shuffles and parquet footers entirely"
    bench = spark.createDataFrame([(1000, bench_text)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, bench_text), (2, edited), (3, unrelated)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["n_bench_matches"]
        for r in fuzzy_decontaminate(
            corpus, bench, "doc_id", "text", threshold_pct=50
        ).collect()
    }
    assert got.get(1) == 1   # exact copy flagged
    assert got.get(2) == 1   # near-dup (Jaccard > 0.5) flagged
    assert 3 not in got      # unrelated doc untouched


def test_fuzzy_decontaminate_nondefault_shingle_consistent(spark):
    """Regression (r7 advice): a non-default shingle size ``n`` must
    reach BOTH the LSH candidate stage (minhash signatures) and the
    exact Jaccard verification — with n=2 the candidate shingles and
    the verification shingles are the same 2-gram space, so an exact
    copy and a 1-word edit are still flagged."""
    from data_transformation_2022_spark.operators.dedup import fuzzy_decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog near the quiet river bank today"
    edited = bench_text.replace("today", "tonight")
    bench = spark.createDataFrame([(1000, bench_text)], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(1, bench_text), (2, edited)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n_bench_matches"]
        for r in fuzzy_decontaminate(
            corpus, bench, "doc_id", "text", n=2, threshold_pct=50
        ).collect()
    }
    assert got.get(1) == 1
    assert got.get(2) == 1


def test_alpha_quotas_properties():
    """Temperature apportionment: quotas sum to the total when no cap
    binds; alpha=1 is proportional; alpha=0 is uniform; caps bind at
    stratum population; largest-remainder ties break lexicographically;
    deterministic across calls."""
    from data_transformation_2022_spark.operators.sampling import alpha_quotas

    counts = {"en": 8000, "de": 1000, "fr": 1000}
    q1 = alpha_quotas(counts, 100, 1.0)
    assert q1 == {"en": 80, "de": 10, "fr": 10}
    q0 = alpha_quotas(counts, 99, 0.0)
    assert sum(q0.values()) == 99 and max(q0.values()) - min(q0.values()) <= 1
    qh = alpha_quotas(counts, 100, 0.5)
    assert sum(qh.values()) == 100
    # temperature flattens: english share drops below proportional,
    # tail languages rise
    assert qh["en"] < 80 and qh["de"] > 10 and qh["fr"] > 10
    # symmetric strata get equal-or-adjacent quotas with deterministic
    # tie order (lexicographically smaller stratum gets the extra unit)
    assert abs(qh["de"] - qh["fr"]) <= 1
    if qh["de"] != qh["fr"]:
        assert qh["de"] > qh["fr"]
    # cap binds: a tiny stratum is kept whole, units not redistributed
    qc = alpha_quotas({"en": 10000, "rare": 3}, 1000, 0.5)
    assert qc["rare"] == 3
    assert qc == alpha_quotas({"en": 10000, "rare": 3}, 1000, 0.5)


def test_alpha_sample_exact_quota_and_determinism(spark):
    """alpha_sample fills each stratum's exact quota with the smallest
    salted hashes: re-running and repartitioning select the identical
    row set, and per-stratum kept counts equal alpha_quotas."""
    from data_transformation_2022_spark.operators.sampling import (
        alpha_quotas,
        alpha_sample,
    )

    rows = [(i, "en" if i % 10 else "de") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    counts = {"en": 900, "de": 100}
    want = alpha_quotas(counts, 120, 0.5)
    out = alpha_sample(df, ["doc_id"], "lang", total=120, alpha=0.5)
    got = out.groupBy("lang").count().collect()
    assert {r["lang"]: r["count"] for r in got} == want
    a = {(r["doc_id"], r["rk"]) for r in out.collect()}
    b = {
        (r["doc_id"], r["rk"])
        for r in alpha_sample(
            df.repartition(7), ["doc_id"], "lang", total=120, alpha=0.5
        ).collect()
    }
    assert a == b


def test_alpha_sample_threshold_floor_huge_stratum(spark, monkeypatch):
    """Regression (r8 self-review): a stratum so large that the
    headroom threshold rounds to 0 must still fill its positive quota —
    the threshold floors at 1 bucket. Simulated by shrinking the bucket
    domain so n > 2*headroom*q*BUCKETS holds on test-sized data."""
    from data_transformation_2022_spark.operators import sampling

    monkeypatch.setattr(sampling, "_BUCKETS", 10)
    rows = [(i, "en") for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    out = sampling.alpha_sample(df, ["doc_id"], "lang", total=2, alpha=0.5)
    assert out.count() == 2


def test_hybrid_rrf_structure_and_arithmetic(spark, sf_dir):
    """sim_hybrid_rrf invariants: 20 fused rows ranked 1..20 without
    gaps in (rrf desc, doc_id) order; every row came from at least one
    leg; and the reported rrf equals the reciprocal-rank arithmetic
    recomputed from the reported leg ranks (absent leg -> 0)."""
    from data_transformation_2022_spark.queries import REGISTRY

    rows = REGISTRY["sim_hybrid_rrf"].spark(spark, sf_dir).collect()
    # pin the top-k size: a regression in either leg's TakeOrdered or in
    # the fused LIMIT that returned fewer rows must fail, not pass
    assert len(rows) == 20
    srt = sorted(rows, key=lambda r: r["fused_rank"])
    assert [r["fused_rank"] for r in srt] == list(range(1, len(srt) + 1))
    prev = None
    for r in srt:
        assert r["lex_rank"] > 0 or r["vec_rank"] > 0
        expect = (1.0 / (60 + r["vec_rank"]) if r["vec_rank"] else 0.0) + (
            1.0 / (60 + r["lex_rank"]) if r["lex_rank"] else 0.0
        )
        assert r["rrf"] == expect, (r["doc_id"], r["rrf"], expect)
        if prev is not None:  # fused order is (rrf desc, doc_id asc)
            assert (prev["rrf"], -prev["doc_id"]) >= (r["rrf"], -r["doc_id"])
        prev = r


def test_alpha_sample_nonstring_strata(spark):
    """The broadcast quota frame inherits the strata column's real type
    (r8 advice: it was hardcoded string), so an integer stratum joins
    without an implicit cast; selection stays deterministic under
    repartitioning and quotas are exactly filled."""
    from data_transformation_2022_spark.operators.sampling import (
        alpha_quotas,
        alpha_sample,
    )

    df = spark.range(200).selectExpr("id", "CAST(id % 3 AS INT) AS grp")
    out = alpha_sample(df, ["id"], "grp", total=30, alpha=0.5)
    assert dict(out.dtypes)["grp"] == "int"
    rows = out.collect()
    per: dict[int, int] = {}
    for r in rows:
        per[r["grp"]] = per.get(r["grp"], 0) + 1
    counts = {0: 67, 1: 67, 2: 66}
    assert per == alpha_quotas(counts, 30, 0.5)
    again = alpha_sample(df.repartition(7, "id"), ["id"], "grp", total=30, alpha=0.5)
    assert sorted(r["id"] for r in rows) == sorted(r["id"] for r in again.collect())


def test_classifier_fit_cache_hygiene(spark, sf_dir, monkeypatch):
    """fit_key memoization (r8 verdict item 3): a repeat call with the
    same key reuses the trained weights (trainer runs ONCE) and returns
    identical margins; a different key or changed fit params refits.
    classifier_eval sees the same cached seed ids, so its holdout stays
    disjoint from training."""
    import data_transformation_2022_spark.functions.text as T

    T._FIT_CACHE.clear()
    calls = {"n": 0}
    real = T.train_quality_classifier

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(T, "train_quality_classifier", counting)
    from data_transformation_2022_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in T.GOPHER_STOPWORDS])
    label = F.arrays_overlap(T.tokens_ws(F.lower(F.col("text"))), stop)

    def run(**kw):
        return {
            r["doc_id"]: r["margin"]
            for r in T.quality_classifier_scores(
                d, "doc_id", "text", label, n_buckets=64, seed_n=50, **kw
            ).collect()
        }

    a = run(fit_key=(sf_dir, "rule"))
    assert calls["n"] == 1
    b = run(fit_key=(sf_dir, "rule"))
    assert calls["n"] == 1, "same key must not refit"
    assert a == b
    run(fit_key=(sf_dir + "/other", "rule"))
    assert calls["n"] == 2, "different data key must refit"
    run(fit_key=(sf_dir, "rule"), epochs=100)
    assert calls["n"] == 3, "changed fit params must refit"
    # eval path: cached seed ids keep the holdout disjoint -> n_holdout
    # equals corpus minus seed regardless of cache state
    ev = T.classifier_eval(
        d, "doc_id", "text", label, n_buckets=64, seed_n=50,
        fit_key=(sf_dir, "rule"),
    ).collect()[0]
    assert calls["n"] == 3, "eval with warm key must not refit"
    assert ev["n_holdout"] == d.count() - 50
    T._FIT_CACHE.clear()


def test_kr_window_hashes_match_direct_definition(spark):
    """The engine's blocked one-pass Karp–Rabin evaluation equals the
    DIRECT per-window fold definition (the spec the DuckDB oracle
    replays) bit-for-bit, across edge lengths: empty, < k, == k,
    one-complete-block boundaries (r = 0), and partial last blocks."""
    import hashlib
    import random

    from pyspark.sql import functions as F

    from data_transformation_2022_spark.operators.dedup import (
        _KR_B1,
        _KR_B2,
        _KR_M1,
        _KR_M2,
        _KR_SHIFT,
        with_kr_window_hashes,
    )

    def direct(toks, k):
        out = []
        for p in range(len(toks) - k + 1):
            h1 = h2 = 0
            for t in toks[p:p + k]:
                v = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
                h1 = (h1 * _KR_B1 + v % _KR_M1) % _KR_M1
                h2 = (h2 * _KR_B2 + v % _KR_M2) % _KR_M2
            out.append(h1 * _KR_SHIFT + h2)
        return out

    rng = random.Random(3)
    k = 20
    cases = [
        (i, " ".join(
            rng.choice(["a", "b", "cc", f"tok{rng.randint(0, 9)}"])
            for _ in range(length)
        ))
        for i, length in enumerate([1, 19, 20, 21, 39, 40, 41, 60, 137])
    ]
    toks = spark.createDataFrame(cases, "id long, text string").select(
        "id", F.split("text", " ").alias("__w")
    )
    got = {
        r["id"]: r["hw"]
        for r in with_kr_window_hashes(toks, "__w", k, "hw").collect()
    }
    for i, t in cases:
        words = t.split(" ")
        want = direct(words, k) if len(words) >= k else []
        assert got[i] == want, (i, len(words))


def test_exact_substring_spans_md5_ab_variant_agrees(spark):
    """The legacy md5 content-hash anchor path (kept for A/B
    benchmarking) finds the same spans as the rolling-hash spec on a
    collision-free corpus — both hashes are stand-ins for k-token
    window EQUALITY."""
    from data_transformation_2022_spark.operators.dedup import (
        exact_substring_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "x x a b c d e y"),
            (3, "a b c d e f g h"),
        ],
        "doc_id long, text string",
    )
    key = lambda r: (r["id_a"], r["id_b"], r["a_start"], r["b_start"], r["n_tokens"])  # noqa: E731
    rolling = sorted(
        map(key, exact_substring_spans(docs, "doc_id", "text", k=3).collect())
    )
    legacy = sorted(
        map(key, exact_substring_spans(
            docs, "doc_id", "text", k=3, anchor_hash="md5"
        ).collect())
    )
    assert rolling == legacy and rolling


def test_exact_substring_spans_hand_checked(spark):
    """Hand-built corpus: d2 shares the 5-token run 'a b c d e'
    starting at its position 3 with d1's position 1; d3 is a verbatim
    copy of d1 (full-length span both ways); within-doc repeats are
    ignored (cross-document only). k=3."""
    from data_transformation_2022_spark.operators.dedup import (
        exact_substring_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "x x a b c d e y"),
            (3, "a b c d e f g h"),
            (4, "q q q q q q"),  # self-repetitive, shares nothing
        ],
        "doc_id long, text string",
    )
    out = {
        (r["id_a"], r["id_b"]): (r["a_start"], r["b_start"], r["n_tokens"])
        for r in exact_substring_spans(docs, "doc_id", "text", k=3).collect()
    }
    assert out[(1, 2)] == (1, 3, 5)  # 'a b c d e' merged from 3 anchors
    assert out[(1, 3)] == (1, 1, 8)  # verbatim copy -> one maximal span
    assert out[(2, 3)] == (3, 1, 5)
    assert len(out) == 3  # d4 pairs with nobody; no within-doc spans


def test_exact_substring_spans_degenerate_bound(spark):
    """Degenerate corpus (every doc the same token repeated): the
    per-anchor occurrence cap bounds the pair blowup — output rows stay
    <= cap^2 regardless of corpus size, and every reported span is
    internally consistent (n_tokens >= k, positions >= 1)."""
    from data_transformation_2022_spark.operators.dedup import (
        exact_substring_spans,
    )

    docs = spark.range(60).selectExpr(
        "id AS doc_id", "repeat('ha ', 40) AS text"
    )
    # every doc has 36 positions of the SAME anchor; cap=80 keeps the
    # first 80 occurrences by (doc_id, pos) -> docs 0 and 1 whole plus
    # 8 positions of doc 2 — everything else is excluded from pairing
    cap = 80
    rows = exact_substring_spans(
        docs, "doc_id", "text", k=5, max_anchor_occ=cap
    ).collect()
    assert rows, "capped participants must still pair"
    assert {r["id_b"] for r in rows} <= {1, 2}, "capped-out docs must not pair"
    # spans per pair are bounded by the diagonal count (<= 2*36-1), so
    # 3 participating pairs bound the output regardless of corpus size
    assert len(rows) <= 3 * (2 * 36 - 1)
    for r in rows:
        assert r["id_a"] < r["id_b"]
        assert r["n_tokens"] >= 5
        assert r["a_start"] >= 1 and r["b_start"] >= 1
    # tighter cap that lands entirely inside doc 0: no cross-doc pairs
    # at all — the blowup is fully suppressed, not just reduced
    none = exact_substring_spans(
        docs, "doc_id", "text", k=5, max_anchor_occ=4
    ).collect()
    assert none == []


def test_exact_substring_spans_matches_bruteforce(spark):
    """Randomized (seeded) equivalence against a naive O(n^2 * len^2)
    reference: tiny alphabet so shared runs are common, uncapped
    anchors — the distributed anchor+diagonal plan must report exactly
    the maximal shared spans the quadratic scan finds."""
    import random

    from data_transformation_2022_spark.operators.dedup import (
        exact_substring_spans,
    )

    def naive(docs, k):
        toks = {i: t.lower().split() for i, t in docs}
        ids = sorted(toks)
        out = {}
        for x, ia in enumerate(ids):
            for ib in ids[x + 1:]:
                a, b = toks[ia], toks[ib]
                by_diag: dict[int, list[int]] = {}
                for pa in range(len(a) - k + 1):
                    for pb in range(len(b) - k + 1):
                        if a[pa:pa + k] == b[pb:pb + k]:
                            by_diag.setdefault(pa - pb, []).append(pa)
                for diag, pas in by_diag.items():
                    pas.sort()
                    run_start, prev = pas[0], pas[0]
                    for p in pas[1:] + [None]:
                        if p is None or p != prev + 1:
                            out[(ia, ib, run_start + 1, run_start - diag + 1)] = (
                                k + (prev - run_start)
                            )
                            if p is not None:
                                run_start = p
                        prev = p if p is not None else prev
        return out

    rng = random.Random(7)
    for trial in range(3):
        docs = [
            (i, " ".join(rng.choice("ab") for _ in range(rng.randint(6, 18))))
            for i in range(6)
        ]
        k = 3
        want = naive(docs, k)
        got = {
            (r["id_a"], r["id_b"], r["a_start"], r["b_start"]): r["n_tokens"]
            for r in exact_substring_spans(
                spark.createDataFrame(docs, "doc_id long, text string"),
                "doc_id", "text", k=k, max_anchor_occ=10_000,
            ).collect()
        }
        assert got == want, (trial, got, want)


def test_scrub_duplicate_spans_hand_checked(spark):
    """Keep-first removal: d1 (lowest id) keeps everything; d2 loses
    exactly its shared 5-token run; d3 (verbatim copy of d1) is fully
    scrubbed to the empty string; d4 shares nothing and is untouched."""
    import hashlib

    from data_transformation_2022_spark.operators.dedup import (
        exact_substring_spans,
        scrub_duplicate_spans,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "x x a b c d e y"),
            (3, "a b c d e f g h"),
            (4, "q q q q q q"),
        ],
        "doc_id long, text string",
    )
    spans = exact_substring_spans(docs, "doc_id", "text", k=3)
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_md5"])
        for r in scrub_duplicate_spans(docs, spans, "doc_id", "text").collect()
    }
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out[1] == (8, 0, md5("a b c d e f g h"))
    assert out[2] == (8, 5, md5("x x y"))
    assert out[3] == (8, 8, md5(""))
    assert out[4] == (6, 0, md5("q q q q q q"))


def test_clear_fit_cache_invalidates(spark, sf_dir, monkeypatch):
    """clear_fit_cache() is the documented invalidation hook for
    regenerated-data-at-same-path: after clearing, the same fit_key
    refits instead of reusing the stale weights."""
    import data_transformation_2022_spark.functions.text as T

    T._FIT_CACHE.clear()
    calls = {"n": 0}
    real = T.train_quality_classifier

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(T, "train_quality_classifier", counting)
    from data_transformation_2022_spark.sources.readers import load_table

    d = load_table(spark, sf_dir, "documents")
    stop = F.array(*[F.lit(s) for s in T.GOPHER_STOPWORDS])
    label = F.arrays_overlap(T.tokens_ws(F.lower(F.col("text"))), stop)

    def run():
        T.quality_classifier_scores(
            d, "doc_id", "text", label, n_buckets=64, seed_n=50,
            fit_key=(sf_dir, "rule"),
        ).collect()

    run()
    run()
    assert calls["n"] == 1
    T.clear_fit_cache()
    run()
    assert calls["n"] == 2, "cleared cache must refit"
    T._FIT_CACHE.clear()


def test_cooccurrence_counts_match_naive(spark):
    """Distributed windowed co-occurrence counts == a naive python
    count over the same window scheme (symmetric, unweighted, offsets
    1..w) — the exact-integer substrate the PPMI embeddings train on."""
    from collections import Counter

    from data_transformation_2022_spark.functions.embeddings import (
        cooccurrence_pairs,
    )

    texts = [
        "red cat sat on the red mat",
        "blue dog ran",
        "cat and dog",
        "",
        None,
        "one",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    w = 3
    got = Counter()
    for r in cooccurrence_pairs(docs, "text", window=w).collect():
        got[(r["center"], r["context"])] += 1
    want = Counter()
    for t in texts:
        toks = (t or "").lower().split()
        for i, a in enumerate(toks):
            for d in range(1, w + 1):
                if i + d < len(toks):
                    want[(a, toks[i + d])] += 1
                    want[(toks[i + d], a)] += 1
    assert got == want and len(want) > 0


def _topic_corpus(spark, n=60):
    """Synthetic two-topic corpus: 'fruit' docs share contexts among
    {apple, banana, mango}; 'metal' docs among {iron, copper, zinc}."""
    fruit = ["apple", "banana", "mango"]
    metal = ["iron", "copper", "zinc"]
    rows = []
    for i in range(n):
        f = [fruit[(i + j) % 3] for j in range(4)]
        m = [metal[(i + j) % 3] for j in range(4)]
        rows.append((2 * i, "sweet ripe " + " ".join(f) + " juice tree"))
        rows.append((2 * i + 1, "hard forged " + " ".join(m) + " ore mine"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_ppmi_svd_deterministic_and_semantic(spark):
    """train_ppmi_svd is partition-invariant and byte-deterministic
    (exact counts -> fixed matrix -> sign-pinned SVD), and embeds the
    two synthetic topics separably: within-topic cosine similarity
    beats cross-topic for every pair."""
    import numpy as np

    from data_transformation_2022_spark.functions.embeddings import (
        train_ppmi_svd,
    )

    docs = _topic_corpus(spark)
    v1 = train_ppmi_svd(docs.repartition(1), "text", vocab_size=50, dim=8)
    v8 = train_ppmi_svd(docs.repartition(8), "text", vocab_size=50, dim=8)
    assert set(v1) == set(v8) and len(v1) >= 10
    for t in v1:
        assert np.array_equal(v1[t], v8[t]), t

    # full naive replay: same vocab rule, window counts (pinning the
    # Arrow pair-counter == cooccurrence_pairs), PPMI, SVD + sign pin —
    # identical matrices give bit-identical vectors
    from collections import Counter

    texts = [r["text"] for r in docs.collect()]
    uni: Counter = Counter(t for s in texts for t in s.lower().split())
    vocab = sorted(
        (t for t, c in uni.items() if c >= 2),
        key=lambda t: (-uni[t], t),
    )[:50]
    idx = {t: i for i, t in enumerate(vocab)}
    M = np.zeros((len(vocab), len(vocab)))
    for s in texts:
        toks = s.lower().split()
        for i, a in enumerate(toks):
            for d in range(1, 6):
                if i + d < len(toks):
                    b = toks[i + d]
                    if a in idx and b in idx:
                        M[idx[a], idx[b]] += 1
                        M[idx[b], idx[a]] += 1
    tot, rows, cols = M.sum(), M.sum(1, keepdims=True), M.sum(0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log((M * tot) / (rows @ cols))
    ppmi = np.where(np.isfinite(pmi) & (pmi > 0), pmi, 0.0)
    u, s_, _ = np.linalg.svd(ppmi, full_matrices=False)
    d = min(8, int((s_ > 1e-12).sum()))
    u, s_ = u[:, :d], s_[:d]
    flips = np.sign(u[np.abs(u).argmax(axis=0), np.arange(d)])
    flips[flips == 0] = 1.0
    naive = (u * flips) * np.sqrt(s_)
    assert set(v1) == set(vocab)
    for t in vocab:
        assert np.allclose(v1[t], naive[idx[t]], atol=1e-10), t

    def cos(a, b):
        va, vb = v1[a], v1[b]
        return float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))

    fruit, metal = ["apple", "banana", "mango"], ["iron", "copper", "zinc"]
    within = [cos(a, b) for g in (fruit, metal) for a in g for b in g if a < b]
    cross = [cos(a, b) for a in fruit for b in metal]
    assert min(within) > max(cross), (min(within), max(cross))


def test_name_embedder_hook_and_fallback(spark):
    """With a corpus-trained NameEmbedder installed, name_distance and
    semantic_name_clusters run on embedding geometry (reference w2v
    role, incl. the shared-UNK rule: two fully-OOV names sit at
    distance 0); with it cleared, the model-free stand-ins return
    exactly their prior values — goldens cannot drift."""
    from data_transformation_2022_spark.functions.embeddings import (
        NameEmbedder,
        set_name_embedder,
        train_ppmi_svd,
    )
    from data_transformation_2022_spark.plans.search import name_distance
    from data_transformation_2022_spark.profiler import semantic_name_clusters

    before = name_distance("apple price", "zinc price")
    vecs = train_ppmi_svd(_topic_corpus(spark), "text", vocab_size=50, dim=8)
    set_name_embedder(NameEmbedder(vecs))
    try:
        d_within = name_distance("apple total", "banana total")
        d_cross = name_distance("apple total", "copper total")
        assert d_within < d_cross
        assert name_distance("qqq1", "zzz9") == 0.0  # shared UNK
        cols = [f"{t} level" for t in
                ("apple", "banana", "mango", "iron", "copper", "zinc")]
        clusters = semantic_name_clusters(cols, eps=0.5, min_samples=2)
        as_sets = [frozenset(c) for c in clusters]
        assert frozenset({"apple level", "banana level", "mango level"}) in as_sets
        assert frozenset({"iron level", "copper level", "zinc level"}) in as_sets
    finally:
        set_name_embedder(None)
    assert name_distance("apple price", "zinc price") == before


def test_embeddings_save_load_and_env_tier(spark, tmp_path, monkeypatch):
    """save/load round-trips the vector table bit-exactly, and the
    SPARK_GRAFT_NAME_EMB env tier auto-installs it on first
    get_name_embedder() — the concrete 'real model when the env
    provides one' hook; clearing restores the stand-in default."""
    import numpy as np

    from data_transformation_2022_spark.functions import embeddings as E

    vecs = E.train_ppmi_svd(_topic_corpus(spark), "text", vocab_size=50, dim=8)
    p = str(tmp_path / "name_vecs.parquet")
    E.save_embeddings(vecs, p)
    back = E.load_embeddings(p)
    assert set(back) == set(vecs)
    for t in vecs:
        assert np.array_equal(back[t], vecs[t]), t

    monkeypatch.setenv(E.NAME_EMB_ENV, p)
    E.set_name_embedder(None)
    E._ENV_TRIED = False  # re-arm (set_name_embedder(None) also does)
    try:
        emb = E.get_name_embedder()
        assert emb is not None
        assert emb.distance("apple total", "banana total") < emb.distance(
            "apple total", "copper total"
        )
        # a broken path degrades loudly to the stand-in, not an error
        E.set_name_embedder(None)
        E._ENV_TRIED = False
        monkeypatch.setenv(E.NAME_EMB_ENV, str(tmp_path / "missing.parquet"))
        assert E.get_name_embedder() is None
    finally:
        monkeypatch.delenv(E.NAME_EMB_ENV, raising=False)
        E.set_name_embedder(None)
        E._ENV_TRIED = True  # leave the suite in the no-env default


def test_ppmi_fit_cache_hygiene(spark, monkeypatch):
    """train_ppmi_svd with a fit_key memoizes the trained table (one
    train job per (data, params) per process — the classifier
    _FIT_CACHE convention, ADVICE r11/verdict r12): a repeat call and
    a same-key call return the cached dict without retraining; a
    DIFFERENT param tuple or key refits; clear_ppmi_cache() refits;
    and no fit_key means no caching."""
    import data_transformation_2022_spark.functions.embeddings as E

    E.clear_ppmi_cache()
    calls = {"n": 0}
    real = E._train_ppmi_svd_impl

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(E, "_train_ppmi_svd_impl", counting)
    docs = _topic_corpus(spark)
    key = ("test-corpus", 0, "ppmi")

    v1 = E.train_ppmi_svd(docs, "text", vocab_size=50, dim=8, fit_key=key)
    v2 = E.train_ppmi_svd(docs, "text", vocab_size=50, dim=8, fit_key=key)
    assert calls["n"] == 1
    # read-only contract is ENFORCED, not just documented (ADVICE r12):
    # each hit gets its own dict (reshaping it can't corrupt the cache)
    # over frozen shared arrays (in-place normalize raises)
    assert v2 is not v1 and v2.keys() == v1.keys()
    tok = next(iter(v1))
    assert v2[tok] is v1[tok]
    with pytest.raises(ValueError):
        v1[tok] *= 2.0
    v2.pop(tok)
    assert tok in E.train_ppmi_svd(docs, "text", vocab_size=50, dim=8, fit_key=key)
    assert calls["n"] == 1

    E.train_ppmi_svd(docs, "text", vocab_size=50, dim=6, fit_key=key)
    assert calls["n"] == 2, "different params must refit"

    E.clear_ppmi_cache()
    E.train_ppmi_svd(docs, "text", vocab_size=50, dim=8, fit_key=key)
    assert calls["n"] == 3, "cleared cache must refit"

    E.train_ppmi_svd(docs, "text", vocab_size=50, dim=8)
    E.train_ppmi_svd(docs, "text", vocab_size=50, dim=8)
    assert calls["n"] == 5, "no fit_key → no caching"
    E.clear_ppmi_cache()


def test_contamination_containment_semantics(spark):
    """Containment = |A∩B|/|A| per document: a benchmark member scores
    1.0 against itself; a doc sharing half its shingles scores by ITS
    OWN shingle mass (asymmetric); sub-n-token docs have no shingles
    and are excluded; zero-overlap docs score 0.0."""
    from data_transformation_2022_spark.operators.dedup import (
        contamination_containment,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),        # 3 distinct 3-grams: abc bcd cde
            (2, "a b c x y"),        # 3-grams: abc bcx cxy -> 1 of 3 in bench
            (3, "p q"),              # < n tokens: excluded
            (4, "z z z z"),          # 3-grams: {zzz} -> 0 hits
        ],
        "doc_id int, text string",
    )
    bench = docs.filter("doc_id = 1")
    out = {
        r["doc_id"]: (r["n_shingles"], r["n_hits"], r["containment"])
        for r in contamination_containment(
            docs, bench, "doc_id", "text", n=3
        ).collect()
    }
    assert out[1] == (3, 3, 1.0)
    assert out[2] == (3, 1, round(1 / 3, 6))
    assert 3 not in out
    assert out[4] == (1, 0, 0.0)
