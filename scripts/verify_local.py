"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB over the same parquet tables, then compares row count, column
names, and values (columns sorted by name, rows sorted by all columns —
the driver's order-insensitive hash, done as exact equality here).

STRICT mode (default): the driver hashes *typed* values, so a result
that prints the same but differs in dtype (DuckDB integer SUM → HUGEINT
→ float64 vs Spark bigint → int64) or in float bit pattern (−0.0 vs
0.0) is a driver hash mismatch even though pandas ``==`` forgives it.
We therefore also require (a) identical pandas dtypes per column and
(b) bitwise-identical float64 values (NaN≡NaN, −0.0≢0.0).  Timestamp
resolution (ns vs us) is normalized to ns on both sides — unit is a
transport artifact, not a value difference.

Usage: python scripts/verify_local.py [sf_dir] [--loose] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from __spark_entry__ import oracle_sql, queries  # noqa: E402

from data_transformation_2022_spark.session import get_spark  # noqa: E402
from data_transformation_2022_spark.sources.readers import TPCH_TABLES  # noqa: E402


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # normalize timestamp resolution (pandas2 keeps us from Arrow)
        if str(df[c].dtype).startswith("datetime64") and str(df[c].dtype) != "datetime64[ns]":
            df[c] = df[c].astype("datetime64[ns]")
        # normalize integer WIDTH (not int-vs-float): driver round 2
        # empirically hash-matched spark int32 vs oracle int64
        # (sim_cosine_topk, window_cume_ntile, emb_centroid_by_bucket)
        # while failing int64 vs float64 (io_csv_roundtrip et al.), so
        # its canonical form widens ints but type-tags int/float.
        if str(df[c].dtype) in ("int8", "int16", "int32", "uint8", "uint16", "uint32"):
            df[c] = df[c].astype("int64")
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def strict_col_problem(name: str, a: pd.Series, b: pd.Series) -> str | None:
    """Driver-hash-style typed comparison of one aligned column pair.

    Returns a description of the first strict mismatch, else None.
    """
    if str(a.dtype) != str(b.dtype):
        return f"col {name}: dtype spark={a.dtype} oracle={b.dtype}"
    if a.dtype == np.float64:
        av, bv = a.to_numpy(), b.to_numpy()
        eq = (av.view(np.uint64) == bv.view(np.uint64)) | (np.isnan(av) & np.isnan(bv))
        if not eq.all():
            i = int(np.argmin(eq))
            return (
                f"col {name}: float bits differ at row {i}: "
                f"spark={av[i]!r} ({av[i].hex()}) oracle={bv[i]!r} ({bv[i].hex()})"
            )
        return None
    if a.dtype == object:
        for i, (x, y) in enumerate(zip(a.tolist(), b.tolist())):
            xn = isinstance(x, float) and math.isnan(x) or x is None
            yn = isinstance(y, float) and math.isnan(y) or y is None
            if xn and yn:
                continue
            if type(x) is not type(y):
                return (
                    f"col {name}: value type differs at row {i}: "
                    f"spark={type(x).__name__}({x!r}) oracle={type(y).__name__}({y!r})"
                )
            if isinstance(x, float):
                import struct

                if struct.pack("<d", x) != struct.pack("<d", y):
                    return f"col {name}: float bits differ at row {i}: {x!r} vs {y!r}"
            elif x != y:
                return f"col {name}: value differs at row {i}: {x!r} vs {y!r}"
        return None
    av, bv = a.to_numpy(), b.to_numpy()
    if str(a.dtype).startswith("datetime64"):
        eq = (av == bv) | (pd.isna(av) & pd.isna(bv))
    else:
        eq = av == bv
    if not np.asarray(eq).all():
        i = int(np.argmin(np.asarray(eq)))
        return f"col {name}: value differs at row {i}: spark={av[i]!r} oracle={bv[i]!r}"
    return None


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


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, strict: bool = True) -> list[str]:
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
            if strict:
                p = strict_col_problem(col, a[col], b[col])
                if p:
                    problems.append(p)
                continue
            av, bv = a[col].tolist(), b[col].tolist()
            bad = sum(0 if values_equal(x, y) else 1 for x, y in zip(av, bv))
            if bad:
                i = next(i for i, (x, y) in enumerate(zip(av, bv)) if not values_equal(x, y))
                problems.append(f"col {col}: {bad} mismatches, first at row {i}: spark={av[i]!r} oracle={bv[i]!r}")
    return problems


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--loose"]
    strict = "--loose" not in sys.argv[1:]
    sf_dir = argv[0] if argv and "/" in argv[0] else "/root/testdata/sf0.01"
    only = [a for a in argv if "/" not in a]

    con = duckdb.connect()
    for t in TPCH_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            # directory-shaped table (make_sf1 output, engine-written
            # copies): DuckDB needs the file glob, Spark takes the dir
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}/*.parquet')"
            )
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    spark = get_spark(app_name="verify_local")
    # dynamic oracles (coret_*) fit their literal constants against this dir
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
        problems = compare(spdf, opdf, strict=strict)
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
