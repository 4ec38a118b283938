"""SparkSession factory.

Tuned defaults for the test harness (single-JVM local[N]) that remain correct
on a real cluster: AQE on (runtime re-plan, skew-join splitting, partition
coalescing), explicit shuffle-partition count, Arrow enabled for the few
Pandas-UDF paths, UTC session timezone for deterministic date math.

At 100 TB scale the same config holds — shuffle.partitions is overridden per
deployment (rule of thumb: 2-3× total executor cores, or let AQE coalesce
from a high initial value), and maxPartitionBytes keeps scan tasks ~128 MB.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "us_flight_bigdata_dashboard_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``SPARK_GRAFT_CPUS`` (driver contract) sets local parallelism; defaults
    to local[*].
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)

    # State-API-v2 support: transformWithStateInPandas spawns a DRIVER-side
    # Python worker that only sees the JVM's PYTHONPATH (addPyFile cannot
    # reach it), so when no real protobuf is installed the shim's vendor
    # dir must be on PYTHONPATH BEFORE the JVM launches. No-op if protobuf
    # is installed or the JVM already exists (then the v2 capability gate
    # in streaming/streaks.py reports accordingly and v1 runs instead).
    from us_flight_bigdata_dashboard_spark.streaming import protobuf_compat

    protobuf_compat.ensure_jvm_pythonpath()

    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "33554432")
        # uniform session-wide nanos handling: every TIMESTAMP(NANOS)
        # parquet column surfaces as bigint and is rebuilt by the loader
        # (sources/catalog.load_table) — set here at build time so the
        # behavior is visible and identical for ALL reads, not a session
        # mutation made mid-flight by whichever loader ran first
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # local[N] runs everything in ONE JVM whose default heap is 1g —
        # far too small for 32 concurrent tasks plus cached intermediates,
        # and the dominant GC-pressure source in the bench suite. Honored
        # at JVM launch when the session is built from Python; a no-op if
        # a JVM already exists (e.g. the driver passes us its session).
        # On a real cluster this is superseded by spark-submit's
        # --driver-memory/--executor-memory sizing. Env-overridable so a
        # smaller host can lower it without editing code (extra_conf can't:
        # the builder applies configs in insertion order and the JVM heap
        # is fixed at launch).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
    )
    # Stateful-streaming state store provider. The default (HDFS-backed)
    # provider keeps every key's state on the executor HEAP — fine for the
    # replay harness's bounded test state, but at 100 TB of keyed state
    # (sessionization / dedup / EWMA over billions of keys) heap state
    # causes GC stalls and OOM; the deployment answer is the RocksDB
    # provider (off-heap, spills to local SSD) plus changelog
    # checkpointing (uploads per-batch deltas instead of full snapshots).
    # Env-gated rather than default because the provider is chosen at
    # STREAMING QUERY start from session conf — flip it without code edits:
    #   SPARK_GRAFT_STATESTORE=rocksdb
    if os.environ.get("SPARK_GRAFT_STATESTORE", "").lower() == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        ).config(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled",
            "true",
        )
        # Production memory discipline (r15, guide §5): by default every
        # RocksDB instance on an executor grows its own memtables/block
        # cache unbounded — at hundreds of state partitions per executor
        # that is the classic streaming OOM. One env knob caps the TOTAL
        # RocksDB memory per executor (bounded mode shares one budget
        # across all instances). Local A/B at sf0.1 state sizes measured
        # provider choice and cache size inside host noise (parity), so
        # this stays deployment-only plumbing, off by default:
        #   SPARK_GRAFT_ROCKSDB_MEM_MB=4096
        mem_mb = os.environ.get("SPARK_GRAFT_ROCKSDB_MEM_MB")
        if mem_mb:
            builder = builder.config(
                "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage",
                "true",
            ).config(
                "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB",
                mem_mb,
            )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
