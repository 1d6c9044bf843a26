"""Interleaved A/B of the driver-side core-T evaluator (ml/coret_local)
on engine_recommend: rounds of (coret evaluator ON, OFF) back to back in
ONE process so VM stall bands hit both sides equally. The step evaluator
stays ON on both sides — this isolates the core-T twin's marginal effect
(scripts/ab_local_steps.py measures the combined switch).

Usage: python scripts/ab_local_coret.py [sf_dir] [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, ".")

from data_transformation_2022_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark(app_name="ab_local_coret")

    from __spark_entry__ import queries

    fn = queries()["engine_recommend"]

    def run(tag: str) -> float:
        spark.sparkContext.setJobDescription(f"engine_recommend[{tag}]")
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    os.environ.pop("SPARK_GRAFT_NO_LOCAL_CORET", None)
    run("warm-on")
    os.environ["SPARK_GRAFT_NO_LOCAL_CORET"] = "1"
    run("warm-off")

    on, off = [], []
    for r in range(rounds):
        def run_on() -> None:
            os.environ.pop("SPARK_GRAFT_NO_LOCAL_CORET", None)
            on.append(run(f"on-{r}"))

        def run_off() -> None:
            os.environ["SPARK_GRAFT_NO_LOCAL_CORET"] = "1"
            off.append(run(f"off-{r}"))

        first, second = (run_on, run_off) if r % 2 == 0 else (run_off, run_on)
        first()
        second()
        print(
            f"round {r}: on={on[-1]:.2f} off={off[-1]:.2f} "
            f"delta={off[-1] - on[-1]:+.2f}",
            flush=True,
        )
    os.environ.pop("SPARK_GRAFT_NO_LOCAL_CORET", None)
    print("ON :", [round(x, 2) for x in on], "median", round(statistics.median(on), 2))
    print("OFF:", [round(x, 2) for x in off], "median", round(statistics.median(off), 2))


if __name__ == "__main__":
    main()
