"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (TPC-H Q1 pricing summary) at
sf0.001. ``queries()`` exposes every implemented operator from
SURVEY.md §2 (plus the LLM-pipeline extensions) as (spark, sf_dir) →
DataFrame callables; ``oracle_sql()`` gives the DuckDB-equivalent SQL
for the correctness gate. Definitions live in
``data_transformation_2022_spark/queries.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from data_transformation_2022_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _q.REGISTRY["tpch_q1"].spark(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
