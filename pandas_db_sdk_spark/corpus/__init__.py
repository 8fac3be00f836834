"""The oracle-checked query corpus — SURVEY.md §2's operator inventory.

Each module contributes ``QUERIES`` (name → ``fn(spark, sf_dir) -> DataFrame``,
the Spark-native implementation) and ``ORACLE`` (name → ANSI SQL DuckDB runs
over the same parquet tables). Names follow SURVEY §2 ids (c05 = row C5…).

Determinism discipline (SURVEY §7 "hash-match discipline"):

* SUMs over doubles go through ``DECIMAL(18,4)`` (exact, associative — immune
  to partial-aggregation order) and are cast back to double at the end.
* Per-row double arithmetic is bit-identical across engines (same IEEE ops on
  the same inputs), so computed columns need no rounding.
* Statistical moments / libm functions are rounded (4–6 dp).
* Dates/timestamps leave queries as strings or epoch integers.
* Arrays/maps/structs never appear in outputs — joined to strings instead.
* Anything order- or seed-dependent (sample, approx sketches, LSH) is
  declared rows-only (no ORACLE entry).
"""

from . import (
    aggregation,
    composite,
    eventtime,
    llm,
    relational,
    scalars,
    sortset,
    udfs,
    windows,
)

_MODULES = (
    relational,
    aggregation,
    windows,
    sortset,
    scalars,
    eventtime,
    udfs,
    llm,
    composite,
)


def all_queries():
    out = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
