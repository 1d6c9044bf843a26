"""Interleaved same-process A/B of runtime SQL confs over registry queries.

Usage:
  python scripts/ab_conf.py --conf spark.sql.join.preferSortMergeJoin=false \
      --rounds 4 q1 q2 ...

Per round each query runs once with the conf(s) applied ("B") and once
with the session default ("A"), alternating which side goes first per
round so this VM's roaming band drift cancels (same methodology as the
BENCH_NOTES round-13 interleaved A/Bs). Each execution is the full noop
sink write (guide §1.4). Reports per-query medians and the per-round
winner pattern.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from __spark_entry__ import queries  # noqa: E402

from data_transformation_2022_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", action="append", default=[], help="key=value")
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    confs = [c.split("=", 1) for c in args.conf]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    spark = get_spark(app_name="ab_conf")
    qs = queries()
    defaults = {k: spark.conf.get(k, None) for k, _ in confs}

    def _set(side: str) -> None:
        for k, v in confs:
            if side == "B":
                spark.conf.set(k, v)
            else:
                d = defaults[k]
                if d is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, d)

    def _run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    results: dict[str, dict[str, list[float]]] = {
        n: {"A": [], "B": []} for n in args.names
    }
    # one untimed warm pass (adjacent-warm convention, bench.py)
    for n in args.names:
        _set("A")
        _run(n)
    for r in range(args.rounds):
        order = ["A", "B"] if r % 2 == 0 else ["B", "A"]
        for n in args.names:
            for side in order:
                _set(side)
                results[n][side].append(_run(n))
    for n in args.names:
        a, b = results[n]["A"], results[n]["B"]
        wins_b = sum(1 for x, y in zip(a, b) if y < x)
        print(
            f"{n}: A(default) median {statistics.median(a):.2f}s "
            f"B(conf) median {statistics.median(b):.2f}s  "
            f"B wins {wins_b}/{len(a)}  "
            f"A={[round(x, 2) for x in a]} B={[round(x, 2) for x in b]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
