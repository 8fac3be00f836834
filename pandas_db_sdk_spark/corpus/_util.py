"""Shared helpers for the corpus modules."""

from __future__ import annotations

import os

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..io import tables  # re-export for corpus modules

__all__ = ["tables", "dsum", "davg", "registry", "artifacts_dir", "DEC"]

# Exact, associative sum type for double aggregates: decimal arithmetic gives
# identical results regardless of partial-aggregation order, so Spark (partial
# + final hash agg across 32+ partitions) and DuckDB (single-node) agree
# bit-for-bit after the final cast back to double.
DEC = "decimal(18,4)"


def dsum(col) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col) -> Column:
    """Deterministic average: exact decimal sum, then one double division."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


def registry():
    """Per-module (QUERIES, ORACLE, decorator) triple."""
    queries: dict = {}
    oracle: dict = {}

    def q(name: str, sql: str | None = None):
        def deco(fn):
            queries[name] = fn
            if sql is not None:
                oracle[name] = sql
            return fn

        return deco

    return queries, oracle, q


def artifacts_dir() -> str:
    """Scratch dir inside the repo for sink-operator round trips (C2/C3)."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    d = os.path.join(root, ".artifacts")
    os.makedirs(d, exist_ok=True)
    return d
