"""SparkSession factory with scale-oriented defaults.

Defaults are tuned for correctness on local[N] but chosen to survive a
1000-executor cluster: AQE on (runtime coalesce + skew-join splitting),
Arrow transfer for every pandas UDF, sane shuffle-partition and
max-partition-bytes settings, UTC session timezone so timestamp semantics
match the DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "ecokg-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's standard config.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (fallback ``local[*]``).
    ``shuffle_partitions`` defaults to the local core count — on a real
    cluster this is overridden at submit time (AQE coalesces down anyway).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- adaptive execution: runtime re-plan, partition coalesce, skew-join split
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # --- shuffle sizing (north_rule: partitioning/shuffle handled explicitly)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # --- Arrow everywhere: pandas UDFs are the only Python hot path
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- keep wide aggregates inside whole-stage codegen: the MinHash
        # signature agg is 64 min() functions (~128 fields), which silently
        # falls back to INTERPRETED eval at the default maxFields=100
        # (measured ~5x slower on the signature stage)
        .config("spark.sql.codegen.maxFields", "256")
        # --- determinism for oracle comparison
        .config("spark.sql.session.timeZone", "UTC")
        # keep the UI off in tests/bench (driver-side overhead, port clashes)
        .config("spark.ui.enabled", "false")
        # single-JVM local mode: the driver heap IS the executor heap; size it
        # for the block-manager storage pool (localCheckpoint blocks at bench
        # scale) or stage outputs evict+recompute nondeterministically
        .config("spark.driver.memory", os.environ.get("ECOKG_DRIVER_MEM", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
