"""Dump .explain("formatted") for registry queries to plans/<round>/
(round from SPARK_GRAFT_PLANS_ROUND, default r14).

Usage: python scripts/dump_plans.py <tag> <query_name> [<query_name> ...]

Writes plans/r<round>/ (SPARK_GRAFT_PLANS_ROUND, default r14)
<name>_<tag>.txt for each query. The plan is taken
from the DataFrame the registry callable returns; queries that do their
heavy compute at build time (engine_recommend, pipeline_*) return a
literal result frame, and their file records that fact plus the plan of
the returned frame — the bench numbers, not the final plan, carry their
evidence.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from __spark_entry__ import queries  # noqa: E402

from data_transformation_2022_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="dump_plans")
    qs = queries()
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not in registry", file=sys.stderr)
            continue
        try:
            df = qs[name](spark, sf_dir)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            txt = f"ERROR building {name}: {type(e).__name__}: {e}\n"
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} [{tag}] sf_dir={sf_dir}\n")
            f.write(txt if txt.endswith("\n") else txt + "\n")
        print(f"WROTE {path} ({len(txt)} chars)", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
