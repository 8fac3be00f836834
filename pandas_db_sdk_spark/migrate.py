"""Migration bridge to/from the reference's documented storage layout.

The reference stores datasets as gzip-CSV chunk trees
(``README.md:189-218``)::

    bucket/dataframe_name/<partition_column>/<value>/chunk_uuid.csv.gz

with Date values as ``2024-01-01`` dirs and ID values as ``from_X_to_Y``
range dirs. A user switching engines has terabytes in that layout;
``import_reference_layout`` reads it straight into a
:class:`~pandas_db_sdk_spark.engine.DataFrameEngine` dataset, and
``export_reference_layout`` writes a dataset back out byte-compatible
(gzip CSV, ≤100K-row chunks, uuid names — ``README.md:20-21,197``).

Scale shape: both directions are one distributed Spark job over the chunk
files (csv.gz is not splittable, so parallelism = chunk count — which the
reference's own 100K-row chunking guarantees is high). The only driver-side
work is directory listing and renames (metadata ops).
"""

from __future__ import annotations

import glob
import gzip
import os
import shutil
import urllib.parse
import uuid
from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .engine import DataFrameEngine


def import_reference_layout(
    spark: SparkSession,
    root: str,
    partition_column: Optional[str] = None,
    schema: Optional[str] = None,
) -> DataFrame:
    """Read a reference-layout chunk tree into one DataFrame.

    ``root`` is the ``dataframe_name`` directory. The single partition level
    (``README.md:191-207``) is re-derived from each file's path via
    ``input_file_name`` — no listing loop, one distributed read. Partition
    values land in ``partition_column`` (defaults to the directory name the
    reference uses, i.e. the column itself).
    """
    level_dirs = sorted(
        d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d))
    )
    if len(level_dirs) != 1:
        raise ValueError(
            f"expected one partition-column dir under {root!r} "
            f"(README.md:191-207 layout), found {level_dirs}"
        )
    col_dir = level_dirs[0]
    out_col = partition_column or col_dir
    reader = spark.read.option("header", True)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    df = reader.csv(os.path.join(root, col_dir, "*", "*.csv.gz"))
    if out_col in df.columns:
        # chunks already carry the column (our own exports do) — the dir
        # value is redundant; keep the typed in-file values.
        return df
    # .../<col_dir>/<value>/<chunk>.csv.gz → value. ID range dirs carry
    # derived bucket labels (README.md:200-207), Date dirs the date itself.
    part_val = F.regexp_extract(
        F.input_file_name(), f"/{col_dir}/([^/]+)/[^/]+$", 1
    )
    return df.withColumn(out_col, part_val)


def export_reference_layout(
    engine: DataFrameEngine,
    dataframe_name: str,
    dest: str,
    external_key: Optional[str] = None,
    use_last: bool = False,
) -> Dict[str, int]:
    """Write a dataset as the reference's chunk tree (gzip CSV, ≤100K-row
    chunks, ``chunk_<uuid>.csv.gz`` names) so reference-side tooling can
    consume it unchanged.

    Spark writes Hive-style ``<pcol>=<value>/part-*.csv.gz`` dirs in one
    distributed job; the driver then renames dirs/files into the reference's
    ``<column>/<value>/chunk_uuid.csv.gz`` shape — pure metadata ops, linear
    in file count (which ``maxRecordsPerFile`` keeps proportional to data).
    """
    ds = engine._dataset_entry(dataframe_name)
    keys = list(ds["columns_keys"])
    if len(keys) != 1:
        raise ValueError(
            "reference layout has exactly one partition level "
            f"(README.md:189-207); dataset has keys {keys}"
        )
    col = keys[0]
    pcol = f"__p_{col}"
    df = engine.load(dataframe_name, external_key, use_last, drop_internal=False)
    data_cols = [
        c for c in df.columns if not c.startswith("__p_") and c != "__version"
    ]
    staging = dest.rstrip("/") + f".staging.{uuid.uuid4().hex[:8]}"
    (
        df.select(*data_cols, pcol)
        .write.mode("overwrite")
        .option("header", True)
        .option("compression", "gzip")
        .option("maxRecordsPerFile", 100_000)  # README.md:21
        .partitionBy(pcol)
        .csv(staging)
    )
    out_root = os.path.join(dest, col)
    os.makedirs(out_root, exist_ok=True)
    n_chunks = 0
    n_null_skipped = 0
    for d in sorted(glob.glob(os.path.join(staging, f"{pcol}=*"))):
        raw = os.path.basename(d).split("=", 1)[1]
        if raw == "__HIVE_DEFAULT_PARTITION__":
            # NULL partition sentinel: the reference's <value> dirs have no
            # null representation — skip (and report) rather than invent one.
            n_null_skipped += 1
            continue
        # Spark percent-escapes special chars in partition dir names; the
        # reference stores raw values, so unescape before building its path.
        value = urllib.parse.unquote(raw)
        vdir = os.path.join(out_root, value)
        os.makedirs(vdir, exist_ok=True)
        for f_ in sorted(glob.glob(os.path.join(d, "part-*.csv.gz"))):
            os.replace(
                f_, os.path.join(vdir, f"chunk_{uuid.uuid4().hex}.csv.gz")
            )
            n_chunks += 1
    shutil.rmtree(staging, ignore_errors=True)
    return {
        "chunks": n_chunks,
        "partitions": len(os.listdir(out_root)),
        "null_partitions_skipped": n_null_skipped,
    }


def _read_chunk_header(path: str) -> str:
    with gzip.open(path, "rt") as f:
        return f.readline().strip()
