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

# Names already hash-verified by the driver in CORRECTNESS_r01.json.  The
# driver's per-round correctness file caps at ~50 entries, so declaration
# order decides which queries get a driver row.  Rotate: queries with no
# driver row yet come FIRST; the r01-green set rides the tail.  (VERDICT.md
# round-1 item #1.)
_R01_VERIFIED = frozenset(
    """c01_scan_parquet c02_scan_csv c02b_scan_json c03_write_partitioned
    c04_ingest_pandas c05_select c06_computed_column c07_rename c08_drop
    c09_filter c10_distinct c11_null_handling c12_cast c13_case_when
    c14_join_inner c15_join_left c15b_join_full c16_join_multikey
    c17_semi_join c18_anti_join c19_cross_join c20_range_join c21_asof_join
    c22_broadcast_join c15c_join_right c20b_scalar_subquery c01b_scan_orc
    c02c_export_jsonl_shards c21b_asof_tolerance c23_groupby_agg
    c24_multi_agg c25_count_distinct c26_approx_count_distinct c27_global_agg
    c28_stats_moments c29_quantiles c29b_approx_quantiles c30_rollup
    c30b_cube c31_pivot c32_unpivot c33_collect_list c34_first_last
    c24b_filtered_agg c28b_corr_covar c30c_grouping_sets c33b_string_agg
    c35_ranking c36_lag_lead c37_cumsum""".split()
)


def _merged(attr):
    out = {}
    for m in _MODULES:
        entries = getattr(m, attr)
        overlap = set(out) & set(entries)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(entries)
    return out


# Within the unchecked block, lead with the D-tier LLM-pipeline ops and the
# TPC-H composites (VERDICT: "getting D-tier rows into CORRECTNESS_r02.json
# is the top next-round item") in case the driver's entry cap is ~50.
_PRIORITY_MODULES = (llm, composite, udfs, eventtime)


def all_queries():
    out = _merged("QUERIES")
    priority_names = [n for m in _PRIORITY_MODULES for n in m.QUERIES]
    rank = {n: i for i, n in enumerate(priority_names)}

    def key(name):
        if name in _R01_VERIFIED:
            return (2, 0)
        return (0, rank[name]) if name in rank else (1, 0)

    names = sorted(out, key=lambda n: (key(n),))
    return {n: out[n] for n in names}


def all_oracles():
    out = {}
    for m in _MODULES:
        out.update(m.ORACLE)
    return out
