"""Hadoop FileSystem helpers.

Driver-side metadata I/O (index signatures, tiny meta.json files) must
go through the SAME filesystem abstraction as the DataFrame reads and
writes: plain ``os``/``open`` silently treats ``s3a://bucket/...`` as a
weird local directory — meta goes missing, skip logic degrades to
perpetual rebuilds, and a stray local ``s3a:`` tree appears. These
wrappers resolve the scheme through ``Path.getFileSystem`` exactly like
Spark's writers, so they behave identically on file://, hdfs:// and
object stores.
"""

from __future__ import annotations


def _fs_path(spark, path_str: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path_str)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath, jvm


def fs_exists(spark, path_str: str) -> bool:
    fs, p, _ = _fs_path(spark, path_str)
    return bool(fs.exists(p))


def fs_read_text(spark, path_str: str) -> str:
    fs, p, jvm = _fs_path(spark, path_str)
    stream = fs.open(p)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        chunks = []
        line = reader.readLine()
        while line is not None:
            chunks.append(line)
            line = reader.readLine()
        return "\n".join(chunks)
    finally:
        stream.close()


def fs_write_text(spark, path_str: str, text: str) -> None:
    fs, p, _ = _fs_path(spark, path_str)
    out = fs.create(p, True)  # overwrite
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()


def input_file_signature(df) -> list[list]:
    """(path, size, mtime) for every file backing a DataFrame scan —
    the invalidation key for anything derived from the scan (an index, a
    sink): an in-place rewrite keeps the name but changes size/mtime.
    Non-file sources degrade to an empty list (params-only signature)."""
    try:
        files = sorted(df.inputFiles())
    except Exception:
        return []
    spark = df.sparkSession
    out: list[list] = []
    for f in files:
        try:
            fs, p, _ = _fs_path(spark, f)
            st = fs.getFileStatus(p)
            out.append([f, int(st.getLen()), int(st.getModificationTime())])
        except Exception:
            out.append([f, None, None])
    return out
