"""Generate an sf1-scale working set at /tmp/spark_graft_sf1 by
replicating the driver's sf0.1 parquet 10x with key offsets.

The driver only ships sf{0.001,0.01,0.1}; the scaling-curve evidence in
BENCH_NOTES.md needs one more decade. Replication preserves the column
distributions exactly while keeping keys unique and joins consistent
(every replica joins its own replica: orders/lineitem share the same
orderkey offset scheme). Two deliberate perturbations keep workload
shape honest instead of artificially quadratic:

* documents.text gets a per-replica suffix tag — otherwise every doc
  acquires 9 verbatim clones and the near-dup pair count scales ~100x
  instead of ~10x (a different workload, not a bigger one);
* embeddings get a tiny deterministic per-replica rotation of one
  coordinate, for the same reason.

Usage: python scripts/make_sf1.py [copies] [tables] [dst]
  copies  replication factor (default 10 → sf1 from sf0.1; 100 → sf10)
  tables  comma-separated subset to generate (default: all) — the sf10
          probe only needs documents,embeddings
  dst     output dir (default /tmp/spark_graft_sf1)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_transformation_2022_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1"

# key columns that must stay unique across replicas; offset = replica *
# (1 + global max of the column) so ranges never collide
OFFSETS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey"],
    "customer": ["c_custkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "events": ["event_id", "user_id"],
}
COPY_ONLY = ("region", "nation", "supplier", "part")


def main() -> None:
    global DST
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    if len(sys.argv) > 3:
        DST = sys.argv[3]
    spark = get_spark(app_name="make_sf1")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(DST, exist_ok=True)

    for t in COPY_ONLY:
        if only is not None and t not in only:
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        df.write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        print(f"{t}: copied", flush=True)

    for t, keys in OFFSETS.items():
        if only is not None and t not in only:
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        maxima = df.agg(*[F.max(k).alias(k) for k in keys]).collect()[0]
        rep = spark.range(copies).select(F.col("id").alias("__rep"))
        out = df.crossJoin(F.broadcast(rep))
        for k in keys:
            out = out.withColumn(k, F.col(k) + F.col("__rep") * (int(maxima[k]) + 1))
        if t == "documents":
            if os.environ.get("SF_TOKEN_SALT"):
                # replica-DISJOINT corpus: suffix every token with the
                # replica id, so docs within one replica share exactly
                # the runs the sf0.1 originals shared while replicas
                # share nothing. This is the honest "N x more of the
                # same workload" shape for content-overlap operators
                # (exact-substring/segment dedup): the default
                # end-of-text tag leaves every cross-replica PREFIX
                # duplicated, which at copies=100 turns the corpus into
                # a 100-clone pathology where per-anchor caps bind —
                # the designed degradation, but a different measurement.
                # split on the SAME \s+ regex the engine's tokens_ws
                # uses (ADVICE r10: a single-space split left tokens
                # separated by tabs/newlines unsalted, letting
                # cross-replica shared runs survive); empty chunks from
                # leading/trailing whitespace pick up a bare "·rN"
                # suffix, which tokens_ws treats as an ordinary token —
                # still replica-disjoint, which is all this salter
                # promises
                out = out.withColumn(
                    "text",
                    F.array_join(
                        F.transform(
                            F.split(F.col("text"), r"\s+"),
                            lambda tok: F.concat(
                                tok, F.lit("·r"), F.col("__rep").cast("string")
                            ),
                        ),
                        " ",
                    ),
                )
            else:
                out = out.withColumn(
                    "text",
                    F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                        F.concat(F.col("text"), F.lit(" rep"), F.col("__rep").cast("string"))
                    ),
                )
        if t == "embeddings":
            # perturb element 0 by rep * 1e-3: breaks verbatim clone
            # pairs while leaving the cosine geometry essentially intact
            out = out.withColumn(
                "embedding",
                F.concat(
                    F.array(
                        F.element_at("embedding", 1) + F.col("__rep").cast("float") * F.lit(0.001)
                    ),
                    F.slice("embedding", 2, 10_000),
                ),
            )
        out = out.drop("__rep")
        out.repartition(32).write.mode("overwrite").parquet(f"{DST}/{t}.parquet")
        n = spark.read.parquet(f"{DST}/{t}.parquet").count()
        print(f"{t}: {n} rows", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
