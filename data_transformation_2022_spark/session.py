"""SparkSession factory.

Defaults are tuned for the test environment (single JVM, ``local[N]``)
but every setting is cluster-safe: AQE handles runtime re-planning,
shuffle partitions scale with parallelism, Arrow is on for the pandas
UDF paths, and the session timezone is pinned to UTC so results are
comparable across engines (DuckDB oracle included).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "data-transformation-2022-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with scale-aware defaults.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    On a real cluster, pass ``master=None`` with spark-submit supplying
    the master URL; these configs remain appropriate.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(max(8, n))))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # local[N] runs every executor thread inside the driver JVM, so
        # the driver heap IS the cluster memory: size it like one (an 8g
        # heap under 32 threads GC-thrashes and makes timings swing 5×).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        # keep stdout clean: the bench/driver parse a one-line JSON from
        # stdout and stage progress bars would interleave with it
        .config("spark.ui.showConsoleProgress", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def small_df(spark: SparkSession, rows, schema):
    """Literal DataFrame for METADATA-sized tables (bucket offsets,
    centroids, PQ LUTs, probe plans, classifier seeds) shipped as one
    Arrow batch instead of a Python-RDD.

    ``spark.createDataFrame(list, schema)`` parallelizes the list into
    ``defaultParallelism`` Python-RDD slices, and EVERY evaluation of
    the frame — each broadcast materialization, each action over a plan
    containing it — pays one Python-worker round trip per slice:
    measured 2.1 s vs 0.5 s per broadcast-join action for a 32-row
    table at local[32] (and 5-7 s when a coalesce(1) serializes the
    slices into one task). The pandas+Arrow path converts driver-side
    and ships one batch to the JVM; results are value-identical.

    ``schema`` is a DDL string or StructType. Falls back to the plain
    list path if pandas/Arrow can't represent the rows (exotic types,
    ragged tuples) — semantics are the contract, the transport is not."""
    import pandas as pd
    from pyspark.sql.types import StructType

    rows = list(rows)  # BEFORE the try: a generator consumed by a failed
    # Arrow attempt would leave the fallback a silently EMPTY frame
    try:
        st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
        pdf = pd.DataFrame(rows, columns=st.names)
        return spark.createDataFrame(pdf, st)
    except Exception:
        return spark.createDataFrame(rows, schema)


# Fleet-wide default for iter_checkpoint: set once per deployment and
# every iterative operator (connected components, BPE trainer) switches
# from executor-local lineage truncation to reliable checkpointing.
CHECKPOINT_DIR_ENV = "SPARK_GRAFT_CHECKPOINT_DIR"


def iter_checkpoint(df, checkpoint_dir: str | None = None):
    """Truncate lineage for one round of an iterative fixpoint.

    Iterative operators (connected-components star/propagation rounds,
    BPE merge rounds) MUST sever lineage each round — with ``persist()``
    alone every round's logical plan embeds the previous round's and
    Catalyst re-analysis grows exponentially (measured: dedup_components
    46.8 s → ~3 s in round 3). Two ways to sever it:

    * ``localCheckpoint`` (the default): blocks live on executor-local
      storage. Fast (no DFS write) and correct on ``local[*]``, but NOT
      fault-tolerant — after truncation there is no lineage to recompute
      from, so losing an executor mid-job kills the job unrecoverably.
      Fine locally; a real risk for a multi-hour 100 TB fixpoint on a
      1000-executor fleet where node loss is routine.
    * reliable ``checkpoint()`` (when ``checkpoint_dir`` is given, or
      ``$SPARK_GRAFT_CHECKPOINT_DIR`` is set): blocks are written to the
      given fault-tolerant directory (HDFS/S3 on a cluster); executor
      loss recovers by re-reading the checkpoint. Costs one DFS
      write+read per round — the price of restartability.

    Both modes produce identical results (pytest-pinned on connected
    components and the BPE trainer); the knob trades round latency for
    fault tolerance. Checkpoint files accumulate for the session unless
    ``spark.cleaner.referenceTracking.cleanCheckpoints=true``.
    """
    d = checkpoint_dir or os.environ.get(CHECKPOINT_DIR_ENV)
    if not d:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    # setCheckpointDir appends a per-call UUID subdir, so compare against
    # what WE last set, not getCheckpointDir() (avoids one fresh subdir
    # per round).
    if getattr(sc, "_graft_ckpt_dir", None) != d:
        sc.setCheckpointDir(d)
        sc._graft_ckpt_dir = d
    return df.checkpoint(eager=True)
