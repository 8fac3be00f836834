"""SparkSession bootstrap tuned for this engine.

The reference's only session-like object is ``DataFrameClient`` holding an
API URL + bearer token (reference ``client.py:45-64``). Here the analogue is
a properly configured SparkSession: AQE on (runtime re-planning subsumes the
reference's fixed 100K-row chunking, ``README.md:21``), Arrow on (fast
pandas ingest, the analogue of the JSON-records wire at ``client.py:114``),
UTC session time so timestamp semantics are stable across engines.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs that query code may rely on; applied to an existing
# session too (the driver hands us its own session).
RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # events.parquet stores TIMESTAMP(NANOS); Spark has no ns timestamp type,
    # so read the raw int64 and convert explicitly (io.Tables normalizes).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Deep composed plans (the d116 crawl pipeline: warc walk → robots
    # windows → lexicon-literal language ID → minhash, all one lineage)
    # produce explain strings big enough that AQE's per-plan-update
    # explainString OOMs a default-heap driver building the string alone.
    # 1 MiB of explain text is plenty for debugging; past it, truncate
    # instead of allocating gigabytes (r10).
    "spark.sql.maxPlanStringLength": str(1024 * 1024),
}


def apply_runtime_confs(spark: SparkSession) -> SparkSession:
    """Set runtime-settable confs on an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime conf on this build; builder path sets it
    return spark


def get_spark(app_name: str = "pandas-db-sdk-spark") -> SparkSession:
    """Build (or reuse) a local session sized from ``SPARK_GRAFT_CPUS``.

    Local mode: one JVM, N threads; ``spark.driver.memory`` is the only
    memory knob. On a real cluster the same code runs unchanged — nothing
    here assumes single-node except the master URL.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return apply_runtime_confs(spark)
