"""Reader-layer tests: CSV/JSON ingestion matching the reference's
pd.read_csv/pd.read_json surfaces (spreadsheet.py:22-30), rid
discipline, and fan_out behavior."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from data_transformation_2022_spark.api import EngineSession
from data_transformation_2022_spark.sources.readers import (
    fan_out,
    read_csv,
    read_json,
    with_rid,
)


@pytest.fixture(scope="module")
def csv_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("src") / "t.csv"
    p.write_text("name,score,grade\nalice,90,A\nbob,85,B\ncarol,,A\n")
    return str(p)


@pytest.fixture(scope="module")
def json_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("src") / "t.json"
    rows = [{"name": "alice", "score": 90}, {"name": "bob", "score": 85}]
    p.write_text(json.dumps(rows))
    return str(p)


def test_read_csv_header_and_types(spark, csv_path):
    df = read_csv(spark, csv_path)
    assert set(df.columns) == {"name", "score", "grade"}
    assert dict(df.dtypes)["score"] == "int"
    assert df.count() == 3
    # empty string stays empty, not NaN (keep_default_na=False semantics)
    row = df.filter(F.col("name") == "carol").collect()[0]
    assert row["grade"] == "A"


def test_read_json_multiline(spark, json_path):
    df = read_json(spark, json_path)
    assert df.count() == 2
    assert {r["name"] for r in df.collect()} == {"alice", "bob"}


def test_ingest_csv_via_api(spark, csv_path):
    s = EngineSession(spark, sample_cap=10)
    ret = s.ingest_path(csv_path)
    names = [row[0] for row in ret["columns"]["body"]]
    assert "name" in names and "score" in names


def test_with_rid_dense_unique(spark, csv_path):
    df = with_rid(read_csv(spark, csv_path), order_by=["name"])
    rids = sorted(r["__rid"] for r in df.collect())
    assert rids == [0, 1, 2]


def test_fan_out_noop_on_wide_input(spark):
    df = spark.range(1000).repartition(64)
    assert fan_out(df).rdd.getNumPartitions() == 64  # already wide: untouched
    narrow = spark.range(1000).coalesce(1)
    assert fan_out(narrow).rdd.getNumPartitions() > 1


def test_fan_out_file_source_never_touches_rdd(spark, sf_dir, monkeypatch):
    """On file-sourced plans fan_out must decide from the scan's file
    list, never df.rdd (which re-runs physical planning per call and
    builds a Python-serialized lineage — the round-1 perf nit)."""
    from pyspark.sql import DataFrame

    from data_transformation_2022_spark.sources.readers import load_table

    df = load_table(spark, sf_dir, "nation").select("n_nationkey")

    def boom(self):  # pragma: no cover - called only on regression
        raise AssertionError("fan_out touched df.rdd on a file-sourced plan")

    monkeypatch.setattr(DataFrame, "rdd", property(boom))
    out = fan_out(df)
    monkeypatch.undo()
    assert out.count() == 25


def test_compact_small_files_reduces_count_losslessly(spark, tmp_path):
    from pyspark.sql import functions as F

    from data_transformation_2022_spark.sources.writers import compact_files

    src = str(tmp_path / "frag")
    dst = str(tmp_path / "compact")
    df = spark.range(0, 20_000).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    )
    df.repartition(48).write.parquet(src)
    import os

    n_frag = sum(
        1 for _r, _d, fs in os.walk(src) for f in fs if f.endswith(".parquet")
    )
    assert n_frag == 48
    n_out = compact_files(spark, src, dst, target_bytes=64 * 1024 * 1024)
    assert n_out < n_frag and n_out >= 1
    a = spark.read.parquet(dst).groupBy("g").agg(F.sum("id").alias("s")).collect()
    b = df.groupBy("g").agg(F.sum("id").alias("s")).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_compact_files_raises_on_empty_listing(spark, tmp_path):
    """A source with no parquet bytes must refuse (wrong path or a
    scheme the filesystem cannot list) instead of silently rewriting
    the directory as one file from a total of 0."""
    import pytest

    from data_transformation_2022_spark.sources.writers import compact_files

    empty = tmp_path / "empty_src"
    empty.mkdir()
    with pytest.raises(ValueError, match="no parquet bytes"):
        compact_files(spark, str(empty), str(tmp_path / "dst"))
