"""Table access helpers for the driver-generated test corpus.

``TESTDATA.md``: one parquet per table under ``/root/testdata/sf*/``.
Reads are plain ``spark.read.parquet`` — Catalyst gets full pushdown:
column pruning + min/max predicate filters reach the scan (an upgrade over
the reference, whose read path returns the whole dataset as JSON records,
``client.py:169-176``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .session import apply_runtime_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


class Tables:
    """Lazy handle over one scale-factor directory of parquet tables."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        apply_runtime_confs(spark)  # UTC + AQE even on a driver-owned session
        self.spark = spark
        self.sf_dir = sf_dir

    def __call__(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
        df = self.spark.read.parquet(os.path.join(self.sf_dir, f"{name}.parquet"))
        if name == "events":
            # events.ts is parquet TIMESTAMP(NANOS): Spark refuses it natively,
            # so we read nanos as long (see apply_runtime_confs) and normalize
            # to a microsecond TimestampType. Integer `div` keeps this exact
            # (double division would lose ns precision at 1e18 magnitudes).
            # DuckDB reads the same file truncated to µs, so both engines see
            # identical instants.
            from pyspark.sql import functions as F

            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df

    def register_views(self) -> None:
        for name in TABLES:
            self(name).createOrReplaceTempView(name)


def tables(spark: SparkSession, sf_dir: str) -> Tables:
    return Tables(spark, sf_dir)
