"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``pandas_db_sdk_spark`` (see SURVEY.md §2 for the
operator inventory each query name maps to).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H-Q1-style pricing
    summary (scan → pushed filter → partial+final hash agg → sort)."""
    from pandas_db_sdk_spark.corpus import aggregation

    return aggregation.QUERIES["c23_groupby_agg"](spark, "/root/testdata/sf0.001").orderBy(
        "l_returnflag", "l_linestatus"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from pandas_db_sdk_spark.corpus import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted → rows-only check; see
    corpus module docstrings for which ops are rows-only and why)."""
    from pandas_db_sdk_spark.corpus import all_oracles

    return all_oracles()
