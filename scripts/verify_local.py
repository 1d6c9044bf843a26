"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and values (columns sorted by name, rows sorted by all columns —
the driver's order-insensitive hash, done as exact equality here).

Usage: python scripts/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

from __spark_entry__ import oracle_sql, queries  # noqa: E402

from data_transformation_2022_spark.session import get_spark  # noqa: E402
from data_transformation_2022_spark.sources.readers import TPCH_TABLES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        return bool(a == b)
    except Exception:
        return False


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if len(spark_pdf) != len(oracle_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} oracle={len(oracle_pdf)}")
    sc, oc = sorted(spark_pdf.columns), sorted(oracle_pdf.columns)
    if sc != oc:
        problems.append(f"columns spark={sc} oracle={oc}")
        return problems
    a, b = canon(spark_pdf), canon(oracle_pdf)
    if len(a) == len(b):
        for col in a.columns:
            av, bv = a[col].tolist(), b[col].tolist()
            bad = sum(0 if values_equal(x, y) else 1 for x, y in zip(av, bv))
            if bad:
                i = next(i for i, (x, y) in enumerate(zip(av, bv)) if not values_equal(x, y))
                problems.append(f"col {col}: {bad} mismatches, first at row {i}: spark={av[i]!r} oracle={bv[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
    only = [a for a in sys.argv[1:] if "/" not in a]

    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark(app_name="verify_local")
    # dynamic oracles (coret_*) fit their literal constants against this dir
    import os

    os.environ["SPARK_GRAFT_ORACLE_SF_DIR"] = sf_dir
    qs, oracles = queries(), oracle_sql()
    names = [n for n in qs if not only or n in only]
    n_pass = n_fail = n_weak = 0
    for name in names:
        t0 = time.time()
        try:
            spdf = qs[name](spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"WEAK  {name}: rows={len(spdf)} (no oracle; rows-only check) [{time.time()-t0:.1f}s]")
            n_weak += 1
            continue
        try:
            opdf = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        problems = compare(spdf, opdf)
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: rows={len(spdf)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_weak} weak (rows-only), {n_fail} fail / {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
