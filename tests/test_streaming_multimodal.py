"""Streaming pipelines (memory-sink smoke against real event files) and
multimodal column plumbing tests."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from data_transformation_2022_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_image_features,
    media_repartition,
    sample_video_frames,
)
from data_transformation_2022_spark.sources.readers import load_table
from data_transformation_2022_spark.streaming.pipelines import (
    hourly_rollup_agg,
    sessionize_batch,
    stream_hourly_rollup,
)


def test_stream_hourly_rollup_matches_batch(spark, sf_dir):
    streamed = stream_hourly_rollup(spark, sf_dir, query_name="t_rollup")
    batch = hourly_rollup_agg(load_table(spark, sf_dir, "events"), with_watermark=False)
    s = {(r["hour"], r["event_type"]): r["n"] for r in streamed.collect()}
    b = {(r["hour"], r["event_type"]): r["n"] for r in batch.collect()}
    assert s == b and len(s) > 0


def test_sessionize_batch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    sessions = sessionize_batch(ev, gap_minutes=30)
    agg = sessions.agg(
        F.sum("n_events").alias("total"), F.count(F.lit(1)).alias("n_sessions")
    ).collect()[0]
    assert agg["total"] == ev.count()  # every event lands in exactly one session
    assert agg["n_sessions"] >= sessions.select("user_id").distinct().count()
    bad = sessions.filter(F.col("session_end") < F.col("session_start")).count()
    assert bad == 0


def test_sessionize_exact_gap_boundary(spark):
    """Pin the session boundary at a gap of EXACTLY ``gap`` seconds.

    Empirically (Spark 4.1.2): ``session_window`` MERGES an event landing
    exactly at the previous window's end (closed-interval merge), so an
    1800 s gap with a 30-minute window is ONE session; only a strictly
    larger gap splits. The batch twin and the DuckDB oracles therefore
    use the strict predicate ``gap > 1800`` — this test goes red if
    either side's inclusivity ever drifts."""
    import datetime as dt

    t0 = dt.datetime(2022, 1, 1, 0, 0, 0)
    rows = [
        ("u_eq", "e1", t0, 1.0),
        ("u_eq", "e2", t0 + dt.timedelta(seconds=1800), 1.0),  # == gap: merge
        ("u_gt", "e1", t0, 1.0),
        ("u_gt", "e2", t0 + dt.timedelta(seconds=1801), 1.0),  # > gap: split
    ]
    ev = spark.createDataFrame(
        rows, "user_id string, event_id string, ts timestamp, value double"
    )
    native = (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )
    got_native = {r["user_id"]: r["n_sessions"] for r in native.collect()}
    assert got_native == {"u_eq": 1, "u_gt": 2}

    batch = sessionize_batch(ev, gap_minutes=30)
    got_batch = {
        r["user_id"]: r["n_sessions"]
        for r in batch.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .collect()
    }
    assert got_batch == got_native


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", "image/png", b"img-bytes-1", {"src": "a"}),
        (2, "image", "image/png", b"img-bytes-2", {"src": "b"}),
        (3, "audio", "audio/wav", b"audio-bytes", {}),
        (4, "video", "video/mp4", b"video-bytes-xyz", {}),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_image_features_fake_deterministic(media):
    a = decode_image_features(media, dim=8, fake=True).orderBy("media_id").collect()
    b = decode_image_features(media, dim=8, fake=True).orderBy("media_id").collect()
    assert [r["media_id"] for r in a] == [1, 2]
    assert a[0]["embedding"] == b[0]["embedding"]  # hash-seeded → deterministic
    assert len(a[0]["embedding"]) == 8 and a[0]["width"] > 0


def test_image_decode_stub_raises(media):
    with pytest.raises(Exception) as err:
        decode_image_features(media, fake=False).collect()
    assert "NotImplementedError" in str(err.value) or "codec" in str(err.value)


def test_video_frame_sampling(media):
    frames = sample_video_frames(media, every_n=10, fake=True).collect()
    assert all(r["media_id"] == 4 for r in frames)
    assert all(r["frame_idx"] % 10 == 0 for r in frames)
    assert len(frames) >= 1


def test_media_repartition_bytes(media):
    out = media_repartition(media, target_bytes=8)
    assert out.count() == 4  # no rows lost; partitioning is size-driven


def test_stateful_running_totals_match_batch(spark, sf_dir):
    from data_transformation_2022_spark.streaming.pipelines import stream_running_totals

    out = stream_running_totals(spark, sf_dir, query_name="t_running")
    got = {r["user_id"]: (r["n_events"], r["sum_value"]) for r in out.collect()}
    ev = load_table(spark, sf_dir, "events")
    exp = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(exp)
    for u in exp:
        assert got[u][0] == exp[u][0]
        assert abs(got[u][1] - exp[u][1]) < 1e-6 * max(1.0, abs(exp[u][1]))


def test_stream_sink_parquet_exactly_once(spark, sf_dir, tmp_path):
    """The checkpointed file sink commits each source file once: a
    second availableNow run over the same source adds NOTHING, and the
    landed rows equal the batch source exactly."""
    from data_transformation_2022_spark.streaming.pipelines import (
        stream_to_parquet_sink,
    )

    out = str(tmp_path / "sink")
    first = stream_to_parquet_sink(spark, sf_dir, out)
    n1 = first.count()
    src_n = load_table(spark, sf_dir, "events").count()
    assert n1 == src_n
    second = stream_to_parquet_sink(spark, sf_dir, out)
    assert second.count() == src_n  # idempotent restart: no duplicates
    # content equality, not just counts
    batch = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    assert second.exceptAll(batch).count() == 0
    assert batch.exceptAll(second).count() == 0


def test_auto_state_cells_derivation(spark):
    """auto_state_cells: >=4 tasks per core, ~128 buckets per cell as
    the corpus grows (power-of-two), capped. (buckets_per_cell raised
    16 -> 128 in r8: the per-cell python dispatch + state Arrow
    round-trip dominates the rewrite cost of a few-hundred-id state
    row — sf0.1 measured 2048 cells ~14.5s vs 256 cells ~11-12s,
    identical pair sets.)"""
    from data_transformation_2022_spark.streaming.pipelines import auto_state_cells

    par = spark.sparkContext.defaultParallelism
    # tiny corpus -> parallelism floor dominates
    assert auto_state_cells(spark, 4, 10) == 4 * par
    # no hint -> 1024 default (or the floor, whichever is larger)
    assert auto_state_cells(spark, 4, None) == max(1024, 4 * par)
    # growing corpus: buckets-per-cell held ~constant => cells scale
    # linearly (up to pow2 rounding) with docs
    c1 = auto_state_cells(spark, 4, 50_000)
    c2 = auto_state_cells(spark, 4, 500_000)
    assert c1 == 2 ** 11  # 4*50k/128 ~= 1.56k -> 2048
    assert c2 == 2 ** 14  # 4*500k/128 ~= 15.6k -> 16384
    assert auto_state_cells(spark, 4, 10**12) == 1 << 20  # hard cap


def test_state_partitions_nested_scopes_restore_each_level(spark):
    """Regression (r7 advice): nested _state_partitions scopes with
    DIFFERENT n must restore the value observed at each scope's entry —
    after an inner scope exits, the outer scope's n is back in force,
    and the outermost exit restores the pre-scope session value."""
    from data_transformation_2022_spark.streaming.pipelines import _state_partitions

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    try:
        with _state_partitions(spark, 8):
            assert spark.conf.get(key) == "8"
            with _state_partitions(spark, 4):
                assert spark.conf.get(key) == "4"
            # inner exit restores the OUTER scope's n, not `before`
            assert spark.conf.get(key) == "8"
        assert spark.conf.get(key) == before
    finally:
        spark.conf.set(key, before)


def test_state_partitions_out_of_order_exit(spark):
    """Regression (r8 self-review): a zombie scope exiting AFTER a newer
    scope started (bench-timeout-abandoned thread) must not clobber the
    newer scope's live value, and the final unwind must land on the
    pre-scope session value."""
    from data_transformation_2022_spark.streaming.pipelines import _state_partitions

    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    try:
        outer = _state_partitions(spark, 6)
        outer.__enter__()          # zombie scope: n=6
        assert spark.conf.get(key) == "6"
        inner = _state_partitions(spark, 4)
        inner.__enter__()          # newer scope: n=4
        assert spark.conf.get(key) == "4"
        # zombie exits FIRST (out of order): live conf must stay at 4
        outer.__exit__(None, None, None)
        assert spark.conf.get(key) == "4"
        # newer scope's exit restores past the zombie to the true prior
        inner.__exit__(None, None, None)
        assert spark.conf.get(key) == before
    finally:
        spark.conf.set(key, before)


def test_drained_row_count_condition():
    """r13: _drained with a known static row count drains as soon as the
    cumulative committed input reaches it (no empty-batch wait), while
    the legacy data-then-empty inference still works standalone and as
    the belt-and-braces OR."""
    from data_transformation_2022_spark.streaming.pipelines import _drained

    # row-count condition: exact, order-independent, multi-batch-safe
    assert _drained([{"numInputRows": 60}, {"numInputRows": 40}], 100)
    assert not _drained([{"numInputRows": 60}, {"numInputRows": 39}], 100)
    assert _drained([{"numInputRows": 100}], 100)
    assert not _drained([{"numInputRows": 0}], 100)
    # legacy inference unchanged when no count is supplied
    assert _drained([{"numInputRows": 100}, {"numInputRows": 0}])
    assert not _drained([{"numInputRows": 100}])
    assert not _drained([{"numInputRows": 0}])
    # OR composition: an empty batch after data still drains even when
    # the supplied count was never reached (conservative fallback)
    assert _drained([{"numInputRows": 50}, {"numInputRows": 0}], 100)
