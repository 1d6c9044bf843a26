"""Scaling-curve spot check: time representative queries at sf0.1 and
at the locally generated sf1 (scripts/make_sf1.py) and print a markdown
table for BENCH_NOTES.md. min-of-N timings (this VM has heavy external
load spikes; the minimum is the signal).

Usage: python scripts/scale_check.py [n_runs]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from __spark_entry__ import queries  # noqa: E402

from data_transformation_2022_spark.session import get_spark  # noqa: E402

QUERIES = [
    "tpch_q1",
    "agg_group_sum",
    "basic_rank",
    "sort_with_position",
    "profile_wasserstein",
    "dedup_minhash_lsh",
    "dedup_keep_list",
    "dedup_components",
    "corpus_decontaminate",
    "stream_sessionize",
    "sim_ivf_full_probe",
    "coret_pca",
    "coret_tsne",
    "engine_recommend",
]
_env = os.environ.get("SPARK_GRAFT_SCALE_QUERIES")
if _env:
    QUERIES = [q.strip() for q in _env.split(",") if q.strip()]
SFS = [("sf0.1", "/root/testdata/sf0.1"), ("sf1", "/tmp/spark_graft_sf1")]


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = get_spark(app_name="scale_check")
    qs = queries()
    for name in QUERIES:  # warm plan shapes on the small SF
        try:
            qs[name](spark, "/root/testdata/sf0.001").write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception as e:
            print(f"warm {name}: {type(e).__name__}", flush=True)
    # INTERLEAVED repeats (sf0.1, sf1, sf0.1, sf1, ...) per query: this
    # VM's stall bands swing identical code 2-5x across minutes, so
    # consecutive-block timing poisons the RATIO — the table's actual
    # signal — whenever the band moves between the two blocks.
    # Alternation puts both SFs in the same band per repeat; min-of-N
    # then rejects the slow-band repeats on both sides together. A
    # calibration probe (tpch_q6, ~0.3 s clean) brackets the run so a
    # published table carries its own weather report.
    def _cal() -> float:
        t0 = time.time()
        qs["tpch_q6"](spark, "/root/testdata/sf0.1").write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.time() - t0, 2)

    _cal()
    cal_open = _cal()
    print(f"calibration tpch_q6@sf0.1 (warm): {cal_open}s", flush=True)
    results: dict[str, dict[str, float]] = {}
    for name in QUERIES:
        results[name] = {}
        best: dict[str, float | None] = {lbl: None for lbl, _ in SFS}
        for _ in range(n_runs):
            for sf_label, sf_dir in SFS:
                if best[sf_label] == -1.0:
                    continue
                t0 = time.time()
                try:
                    qs[name](spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception as e:
                    print(f"{name}@{sf_label}: ERROR {type(e).__name__}: {e}", flush=True)
                    best[sf_label] = -1.0
                    continue
                dt = time.time() - t0
                prev = best[sf_label]
                best[sf_label] = dt if prev is None else min(prev, dt)
        for sf_label, _ in SFS:
            results[name][sf_label] = round(best[sf_label] or -1.0, 2)
            print(f"{name}@{sf_label}: {results[name][sf_label]}s", flush=True)
    cal_close = _cal()
    print(f"calibration tpch_q6@sf0.1 (close): {cal_close}s", flush=True)

    print(f"\ncalibration open/close: {cal_open}s / {cal_close}s")
    print("\n| query | sf0.1 (s) | sf1 (s) | ratio (10x data) |")
    print("|---|---|---|---|")
    for name in QUERIES:
        a, b = results[name].get("sf0.1"), results[name].get("sf1")
        ratio = round(b / a, 1) if a and b and a > 0 and b > 0 else "-"
        print(f"| {name} | {a} | {b} | {ratio} |")
    with open("/tmp/scale_check.json", "w") as f:
        json.dump(results, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
