"""Interleaved A/B of the driver-side step evaluator (steps_local) on
engine_recommend: rounds of (evaluator ON, evaluator OFF) back to back in
ONE process so VM stall bands hit both sides equally.

Usage: python scripts/ab_local_steps.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, ".")

from data_transformation_2022_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="ab_local_steps")
    spark.conf.set(
        "spark.sql.shuffle.partitions", str(max(8, os.cpu_count() or 8))
    )

    from __spark_entry__ import queries

    fn = queries()["engine_recommend"]

    def run(tag: str) -> float:
        spark.sparkContext.setJobDescription(f"engine_recommend[{tag}]")
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # warm both sides once (profile cache, JIT, fit memos) before timing
    os.environ.pop("SPARK_GRAFT_NO_LOCAL_STEPS", None)
    run("warm-on")
    os.environ["SPARK_GRAFT_NO_LOCAL_STEPS"] = "1"
    run("warm-off")

    # alternate which side runs first: this process shows a monotone
    # downward drift across runs (JIT/page-cache warming), so a fixed
    # order would systematically favor whichever side runs second
    on, off = [], []
    for r in range(rounds):
        def run_on() -> None:
            os.environ.pop("SPARK_GRAFT_NO_LOCAL_STEPS", None)
            on.append(run(f"on-{r}"))

        def run_off() -> None:
            os.environ["SPARK_GRAFT_NO_LOCAL_STEPS"] = "1"
            off.append(run(f"off-{r}"))

        first, second = (run_on, run_off) if r % 2 == 0 else (run_off, run_on)
        first()
        second()
        print(
            f"round {r}: local-steps ON {on[-1]:.2f}s  OFF {off[-1]:.2f}s"
            f"  (order {'ON,OFF' if r % 2 == 0 else 'OFF,ON'})",
            flush=True,
        )
    deltas = sorted(b - a for a, b in zip(on, off))
    print(f"ON  runs: {[round(v, 2) for v in on]}  min {min(on):.2f}")
    print(f"OFF runs: {[round(v, 2) for v in off]}  min {min(off):.2f}")
    print(
        f"per-round OFF-ON deltas (s, +ve = ON faster): "
        f"{[round(d, 2) for d in deltas]}  median {deltas[len(deltas) // 2]:.2f}"
    )


if __name__ == "__main__":
    main()
