"""Sinks: partitioned / bucketed / flat-file writers.

The reference has no write path at all (its only output is chart JSON
over HTTP), but a 100 TB engine lives or dies by table layout. These
writers are the ingest-time knobs that make the read-side fast:

* ``write_partitioned`` — directory partitioning (`partitionBy`): reads
  with an equality/range filter on the partition column scan only the
  matching directories (partition pruning — visible as
  ``PartitionFilters`` in the scan node).
* ``write_bucketed`` — hash bucketing + in-bucket sort (`bucketBy` +
  `sortBy` + `saveAsTable`): two tables bucketed on the same key join
  WITHOUT a shuffle on either side (no Exchange in the plan), the
  single biggest cost lever for repeated large-table joins.
* ``write_csv`` / ``write_json`` — interchange formats mirroring the
  reference's CSV/JSON ingest surface (spreadsheet.py:22-30).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_by: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Write parquet partitioned by the given columns.

    ``maxRecordsPerFile`` caps file size under skewed partition values
    (one giant partition directory otherwise produces one giant file
    per task at cluster scale).
    """
    w = df.write.mode(mode).partitionBy(*partition_by)
    if max_records_per_file is not None:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: list[str],
    n_buckets: int = 8,
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a bucketed (and optionally in-bucket-sorted) table.

    Uses ``saveAsTable`` with an explicit external ``path`` so the data
    location is caller-controlled; the in-memory catalog records the
    bucket spec, which is what lets the planner elide the join shuffle.
    """
    w = df.write.mode(mode).option("path", path).bucketBy(n_buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back through the catalog (required: reading
    the parquet path directly loses the bucket spec and re-shuffles)."""
    return spark.table(table)


def compact_files(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction — the table-maintenance pass every
    long-lived ingest needs: streaming/micro-batch writers and
    over-parallel jobs leave thousands of KB-sized files, and at fleet
    scale each file costs a listing round-trip, a footer read, and a
    scheduler task, so scan cost becomes file-count-bound instead of
    byte-bound.

    Sizing is METADATA work: sum the source file lengths from the
    listing (no data read), divide by ``target_bytes``, round up —
    then one ``repartition(n)`` rewrite. Returns the number of data
    files written. The rewrite is a full shuffle of the data BY DESIGN
    (that is what compaction is); at 100 TB you run it per partition
    directory, not per table, and the per-directory form is this same
    function pointed at one directory.

    Listing goes through the Hadoop FileSystem (sources/fs.py), so
    hdfs:// and s3a:// paths size correctly — an ``os.walk`` would
    silently report 0 bytes for any non-local scheme and rewrite the
    whole directory as one file. An empty source listing raises rather
    than degrading to n_out=1.
    """
    import math

    total = sum(s for _p, s in _list_parquet(spark, src_path))
    if total == 0:
        raise ValueError(
            f"compact_files: no parquet bytes found under {src_path!r} "
            "(wrong path, or a scheme the filesystem cannot list)"
        )
    n_out = max(1, math.ceil(total / target_bytes))
    spark.read.parquet(src_path).repartition(n_out).write.mode("overwrite").parquet(
        dst_path
    )
    return sum(1 for _p, _s in _list_parquet(spark, dst_path))


def _list_parquet(spark: SparkSession, path: str) -> list[tuple[str, int]]:
    """(path, length) of every .parquet file under ``path``, recursive,
    via the Hadoop FileSystem — scheme-correct for file/hdfs/s3a."""
    from .fs import _fs_path

    fs, p, _ = _fs_path(spark, path)
    out: list[tuple[str, int]] = []
    it = fs.listFiles(p, True)  # recursive remote iterator
    while it.hasNext():
        st = it.next()
        name = st.getPath().toString()
        if name.endswith(".parquet"):
            out.append((name, int(st.getLen())))
    return out
