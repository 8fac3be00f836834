"""Aggregation — SURVEY §2 C23–C34 (pandas groupby/pivot_table/describe).

All double sums go through decimal (see corpus/_util.py) so Spark's
partial+final hash aggregation over N partitions agrees bit-for-bit with the
single-node oracle. Map-side partial aggregation is what makes these scale:
the shuffle carries one row per (partition × group), not per input row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import DEC, davg, dsum, registry, tables

QUERIES, ORACLE, q = registry()


@q(
    "c23_groupby_agg",
    """SELECT l_returnflag, l_linestatus,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
              CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(l_quantity) AS avg_qty,
              CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(l_discount) AS avg_disc,
              count(*) AS count_order
       FROM lineitem
       WHERE l_shipdate <= TIMESTAMP '2000-09-02'
       GROUP BY l_returnflag, l_linestatus""",
)
def c23(spark, sf_dir):
    """C23/C24: TPC-H-Q1-style pricing summary — the flagship query.

    filter → groupBy → multi-agg; the filter pushes to the parquet scan and
    the agg is partial+final (one shuffle of ~6 groups, not 6M rows).
    """
    li = tables(spark, sf_dir)("lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@q(
    "c24_multi_agg",
    """SELECT o_orderpriority,
              count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
              min(o_totalprice) AS lo,
              max(o_totalprice) AS hi,
              count(DISTINCT o_orderstatus) AS n_status
       FROM orders GROUP BY o_orderpriority""",
)
def c24(spark, sf_dir):
    """C24: multi-expression agg with aliases; min/max on doubles are exact."""
    return (
        tables(spark, sf_dir)("orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            dsum("o_totalprice").alias("total"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.countDistinct("o_orderstatus").alias("n_status"),
        )
    )


@q(
    "c25_count_distinct",
    """SELECT l_returnflag,
              count(DISTINCT l_partkey) AS n_parts,
              count(DISTINCT l_suppkey) AS n_supps,
              count(DISTINCT l_orderkey) AS n_orders
       FROM lineitem GROUP BY l_returnflag""",
)
def c25(spark, sf_dir):
    """C25: exact count distinct (expand + two-phase agg under the hood)."""
    return (
        tables(spark, sf_dir)("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.countDistinct("l_suppkey").alias("n_supps"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


@q("c26_approx_count_distinct")  # rows-only: HLL estimates are engine-specific
def c26(spark, sf_dir):
    """C26: approx_count_distinct (HyperLogLog++) — the scale path for
    cardinality: fixed-size sketch, single shuffle, no expand."""
    return (
        tables(spark, sf_dir)("lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
    )


@q(
    "c27_global_agg",
    """SELECT count(*) AS n_rows,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(l_quantity) AS avg_qty,
              strftime(min(l_shipdate), '%Y-%m-%d') AS first_ship,
              count(DISTINCT l_orderkey) AS n_orders
       FROM lineitem""",
)
def c27(spark, sf_dir):
    """C27: global aggregate, no grouping keys."""
    li = tables(spark, sf_dir)("lineitem")
    return li.agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity").alias("total_qty"),
        davg("l_quantity").alias("avg_qty"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("first_ship"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@q(
    "c28_stats_moments",
    """SELECT l_returnflag,
              round(stddev_samp(l_quantity), 6) AS sd_qty,
              round(var_samp(l_quantity), 6) AS var_qty,
              round(stddev_pop(l_discount), 8) AS sd_disc,
              round(
                avg((l_quantity - m.mu) ** 3) / (avg((l_quantity - m.mu) ** 2) ** 1.5),
                6) AS skew_qty,
              round(
                avg((l_quantity - m.mu) ** 4) / (avg((l_quantity - m.mu) ** 2) ** 2) - 3,
                6) AS kurt_qty
       FROM lineitem,
            (SELECT l_returnflag AS rf, avg(l_quantity) AS mu
             FROM lineitem GROUP BY 1) m
       WHERE l_returnflag = m.rf
       GROUP BY l_returnflag""",
)
def c28(spark, sf_dir):
    """C28: describe-style moments. Spark's skewness/kurtosis are the
    population formulas (m3/m2^1.5, m4/m2^2−3); DuckDB's builtins are the
    bias-corrected sample versions, so the oracle computes the population
    formulas from explicit central moments. Rounded: moment accumulation
    order differs across engines at ~1e-12."""
    li = tables(spark, sf_dir)("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
        F.round(F.stddev_pop("l_discount"), 8).alias("sd_disc"),
        F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
    )


@q(
    "c29_quantiles",
    """SELECT l_linestatus,
              round(median(l_quantity), 6) AS med_qty,
              round(quantile_cont(l_quantity, 0.25), 6) AS q25,
              round(quantile_cont(l_quantity, 0.90), 6) AS q90,
              round(quantile_cont(l_extendedprice, 0.5), 6) AS med_price
       FROM lineitem GROUP BY l_linestatus""",
)
def c29(spark, sf_dir):
    """C29: exact quantiles/median (pandas `quantile`). Spark F.percentile and
    DuckDB quantile_cont share the (n−1)p linear-interpolation definition.
    percentile_approx is the 100TB-scale variant (see c29b)."""
    li = tables(spark, sf_dir)("lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.median("l_quantity"), 6).alias("med_qty"),
        F.round(F.percentile("l_quantity", 0.25), 6).alias("q25"),
        F.round(F.percentile("l_quantity", 0.90), 6).alias("q90"),
        F.round(F.percentile("l_extendedprice", 0.5), 6).alias("med_price"),
    )


@q("c29b_approx_quantiles")  # rows-only: sketch-based, engine-specific
def c29b(spark, sf_dir):
    """C29 scale path: percentile_approx (KLL-style sketch, mergeable across
    partitions — constant memory at any data size)."""
    li = tables(spark, sf_dir)("lineitem")
    return li.groupBy("l_linestatus").agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx_median_price"),
        F.round(F.percentile("l_extendedprice", 0.5), 6).alias("exact_median_price"),
    )


@q(
    "c30_rollup",
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
              COALESCE(l_linestatus, 'ALL') AS ls,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
              count(*) AS n
       FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def c30(spark, sf_dir):
    """C30: rollup — subtotal hierarchy (pivot_table margins)."""
    li = tables(spark, sf_dir)("lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity").alias("sum_qty"), F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "sum_qty",
            "n",
        )
    )


@q(
    "c30b_cube",
    """SELECT COALESCE(o_orderstatus, 'ALL') AS st,
              COALESCE(o_orderpriority, 'ALL') AS pri,
              count(*) AS n
       FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
)
def c30b(spark, sf_dir):
    """C30: cube — all grouping-set combinations."""
    o = tables(spark, sf_dir)("orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("st"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("pri"),
            "n",
        )
    )


@q(
    "c31_pivot",
    """SELECT l_returnflag,
              CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS F,
              CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS O
       FROM lineitem GROUP BY l_returnflag""",
)
def c31(spark, sf_dir):
    """C31: pivot (pandas `pivot_table`) with explicit value list — the
    explicit list avoids the extra distinct-values job at scale."""
    li = tables(spark, sf_dir)("lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double"))
    )


@q(
    "c32_unpivot",
    """SELECT p_partkey, metric, value FROM (
         SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
         UNION ALL
         SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part
       )""",
)
def c32(spark, sf_dir):
    """C32: unpivot/melt — wide → long."""
    p = tables(spark, sf_dir)("part")
    return p.select(
        "p_partkey", F.col("p_size").cast("double").alias("p_size"), "p_retailprice"
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")


@q(
    "c33_collect_list",
    """SELECT o_custkey,
              string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses,
              count(*) AS n
       FROM orders GROUP BY o_custkey""",
)
def c33(spark, sf_dir):
    """C33: collect per group (groupby.apply(list)) — sorted & joined to a
    string so the result is deterministic and hash-comparable."""
    o = tables(spark, sf_dir)("orders")
    return o.groupBy("o_custkey").agg(
        F.array_join(F.array_sort(F.collect_set("o_orderstatus")), ",").alias("statuses"),
        F.count("*").alias("n"),
    )


@q(
    "c34_first_last",
    """SELECT o_custkey,
              arg_max(o_orderstatus, o_orderkey) AS last_status,
              arg_min(o_totalprice, o_orderkey) AS first_price,
              max(o_orderkey) AS last_key
       FROM orders GROUP BY o_custkey""",
)
def c34(spark, sf_dir):
    """C34: first/last per group via min_by/max_by over a unique ordering key
    (o_orderkey) — tie-free, hence deterministic."""
    o = tables(spark, sf_dir)("orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderstatus", "o_orderkey").alias("last_status"),
        F.min_by("o_totalprice", "o_orderkey").alias("first_price"),
        F.max("o_orderkey").alias("last_key"),
    )


@q(
    "c24b_filtered_agg",
    """SELECT l_returnflag,
              CAST(sum(CAST(l_quantity AS DECIMAL(18,4)))
                   FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS qty_hi_disc,
              count(*) FILTER (WHERE l_linestatus = 'F') AS n_finished,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)))
                   FILTER (WHERE l_quantity >= 25) AS DOUBLE) AS price_bulk
       FROM lineitem GROUP BY l_returnflag""",
)
def c24b(spark, sf_dir):
    """C24 variant: conditional/filtered aggregation (pandas
    ``groupby().agg(lambda)`` with masks; SQL ``FILTER (WHERE ...)``).
    Spark expresses the filter as sum(when(cond, x)) — same partial-agg
    shape, one pass, no extra shuffle."""
    li = tables(spark, sf_dir)("lineitem")
    dec = "decimal(18,4)"
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_discount") > 0.05, F.col("l_quantity").cast(dec)))
        .cast("double")
        .alias("qty_hi_disc"),
        F.count(F.when(F.col("l_linestatus") == "F", F.lit(1))).alias("n_finished"),
        F.sum(F.when(F.col("l_quantity") >= 25, F.col("l_extendedprice").cast(dec)))
        .cast("double")
        .alias("price_bulk"),
    )


@q(
    "c28b_corr_covar",
    """SELECT l_returnflag,
              round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
              round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_s,
              round(covar_pop(l_quantity, l_discount), 6) AS cov_p
       FROM lineitem GROUP BY l_returnflag""",
)
def c28b(spark, sf_dir):
    """C28 variant: bivariate statistics (pandas ``corr``/``cov``). Spark's
    corr/covar use a mergeable one-pass co-moment formula (partial-aggregable
    at 100 TB); rounded because float accumulation order differs per engine."""
    li = tables(spark, sf_dir)("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("cov_s"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 6).alias("cov_p"),
    )


@q(
    "c30c_grouping_sets",
    """SELECT coalesce(c_mktsegment, 'ALL') AS seg,
              coalesce(CAST(c_nationkey AS VARCHAR), 'ALL') AS nat,
              count(*) AS n,
              CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
       FROM customer
       GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))""",
)
def c30c(spark, sf_dir):
    """C30 variant: explicit GROUPING SETS (disjoint aggregation levels in
    one pass — Spark expands then partially aggregates; cheaper than two
    scans + union at scale)."""
    tables(spark, sf_dir)("customer").createOrReplaceTempView("customer_gs")
    return spark.sql(
        """SELECT coalesce(c_mktsegment, 'ALL') AS seg,
                  coalesce(CAST(c_nationkey AS STRING), 'ALL') AS nat,
                  count(*) AS n,
                  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
           FROM customer_gs
           GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))"""
    )


@q(
    "c33b_string_agg",
    """SELECT o_custkey,
              string_agg(o_orderstatus, ',' ORDER BY o_orderkey) AS status_seq,
              count(*) AS n
       FROM orders GROUP BY o_custkey""",
)
def c33b(spark, sf_dir):
    """C33 variant: ordered string aggregation (pandas
    ``groupby.apply(','.join)``; SQL listagg/string_agg ORDER BY). Collected
    as (key, value) structs, array_sort gives the deterministic order — the
    unique o_orderkey makes the sort total."""
    o = tables(spark, sf_dir)("orders")
    pairs = F.array_sort(F.collect_list(F.struct("o_orderkey", "o_orderstatus")))
    return o.groupBy("o_custkey").agg(
        F.array_join(
            F.transform(pairs, lambda s: s.getField("o_orderstatus")), ","
        ).alias("status_seq"),
        F.count("*").alias("n"),
    )


@q(
    "c28c_mode",
    """SELECT l_returnflag, mode_qty, cnt FROM (
         SELECT l_returnflag, l_quantity AS mode_qty, count(*) AS cnt,
                row_number() OVER (PARTITION BY l_returnflag
                                   ORDER BY count(*) DESC, l_quantity) AS rn
         FROM lineitem GROUP BY 1, 2) t
       WHERE rn = 1""",
)
def c28c(spark, sf_dir):
    """C28 variant: per-group mode (pandas ``mode``). Spark's F.mode breaks
    ties arbitrarily, so this composes it deterministically: value counts →
    row_number ordered by (count desc, value asc) — same tiebreak both
    engines. Two partial-aggregable shuffles; the window runs over the
    (group × distinct-value) table, which is already tiny."""
    from pyspark.sql import Window

    li = tables(spark, sf_dir)("lineitem")
    counts = li.groupBy("l_returnflag", F.col("l_quantity").alias("mode_qty")).agg(
        F.count("*").alias("cnt")
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.col("cnt").desc(), F.col("mode_qty"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_returnflag", "mode_qty", "cnt")
    )


@q(
    "c28d_freq_items",
    """SELECT item, cnt FROM (
         SELECT l_returnflag AS item, count(*) AS cnt FROM lineitem GROUP BY 1) t
       WHERE cnt > (SELECT count(*) / 3.0 FROM lineitem)""",
)
def c28d(spark, sf_dir):
    """C28 variant: exact heavy hitters — items with frequency > n/k
    (the deterministic contract pandas-style ``freqItems`` approximates;
    Spark's ``df.freqItems`` is partition-order dependent, so the engine
    exposes the exact form: one partial-aggregable count + a 1-row
    threshold broadcast). Item domain is the returnflag (N ≈ 50% clears
    the n/3 bar, A/R ≈ 25% don't) — the uniform l_suppkey domain made
    every threshold either empty or all-pass at any scale."""
    li = tables(spark, sf_dir)("lineitem")
    thresh = li.agg((F.count("*") / 3.0).alias("t"))
    return (
        li.groupBy(F.col("l_returnflag").alias("item"))
        .agg(F.count("*").alias("cnt"))
        .join(thresh)
        .filter(F.col("cnt") > F.col("t"))
        .select("item", "cnt")
    )


@q(
    "c28e_describe",
    """SELECT col,
              n, round(mean, 6) AS mean, round(sd, 6) AS sd,
              min_v, round(q25, 6) AS q25, round(q50, 6) AS q50,
              round(q75, 6) AS q75, max_v
       FROM (
         SELECT 'l_quantity' AS col, count(l_quantity) AS n, avg(l_quantity) AS mean,
                stddev_samp(l_quantity) AS sd, min(l_quantity) AS min_v,
                quantile_cont(l_quantity, 0.25) AS q25, quantile_cont(l_quantity, 0.5) AS q50,
                quantile_cont(l_quantity, 0.75) AS q75, max(l_quantity) AS max_v
         FROM lineitem
         UNION ALL
         SELECT 'l_extendedprice', count(l_extendedprice), avg(l_extendedprice),
                stddev_samp(l_extendedprice), min(l_extendedprice),
                quantile_cont(l_extendedprice, 0.25), quantile_cont(l_extendedprice, 0.5),
                quantile_cont(l_extendedprice, 0.75), max(l_extendedprice)
         FROM lineitem
         UNION ALL
         SELECT 'l_discount', count(l_discount), avg(l_discount),
                stddev_samp(l_discount), min(l_discount),
                quantile_cont(l_discount, 0.25), quantile_cont(l_discount, 0.5),
                quantile_cont(l_discount, 0.75), max(l_discount)
         FROM lineitem) t""",
)
def c28e(spark, sf_dir):
    """C28: full pandas-style ``describe()`` in long format — one row per
    column with (n, mean, sd, min, q25, q50, q75, max). ONE scan: all 27
    aggregates run in a single agg pass, then per-column rows unfold from
    that 1-row result (posexplode of 3 structs — driver-free, shuffle-free
    beyond the global agg's single-row exchange)."""
    li = tables(spark, sf_dir)("lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = []
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__n"),
            F.avg(c).alias(f"{c}__mean"),
            F.stddev_samp(c).alias(f"{c}__sd"),
            F.min(c).alias(f"{c}__min"),
            F.percentile(c, F.lit(0.25)).alias(f"{c}__q25"),
            F.percentile(c, F.lit(0.5)).alias(f"{c}__q50"),
            F.percentile(c, F.lit(0.75)).alias(f"{c}__q75"),
            F.max(c).alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col(f"{c}__n").alias("n"),
                F.round(F.col(f"{c}__mean"), 6).alias("mean"),
                F.round(F.col(f"{c}__sd"), 6).alias("sd"),
                F.col(f"{c}__min").alias("min_v"),
                F.round(F.col(f"{c}__q25"), 6).alias("q25"),
                F.round(F.col(f"{c}__q50"), 6).alias("q50"),
                F.round(F.col(f"{c}__q75"), 6).alias("q75"),
                F.col(f"{c}__max").alias("max_v"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(structs).alias("s")).select("s.*")


@q(
    "c29c_winsorize",
    """WITH q AS (SELECT l_returnflag AS rf,
                         quantile_cont(l_extendedprice, 0.05) AS lo,
                         quantile_cont(l_extendedprice, 0.95) AS hi
                  FROM lineitem GROUP BY 1)
       SELECT l_orderkey, l_linenumber, l_returnflag,
              round(least(greatest(l_extendedprice, lo), hi), 6) AS price_winsor,
              CAST(l_extendedprice < lo OR l_extendedprice > hi AS INT) AS clipped
       FROM lineitem JOIN q ON l_returnflag = q.rf""",
)
def c29c(spark, sf_dir):
    """C29 variant: per-group winsorization (pandas `clip` at the 5th/95th
    percentile) — the outlier-capping step of feature pipelines. The
    per-group quantile table is structurally tiny (one row per group) and
    broadcasts; clipping is per-row arithmetic on the scan."""
    li = tables(spark, sf_dir)("lineitem")
    qs = li.groupBy(F.col("l_returnflag").alias("rf")).agg(
        F.percentile("l_extendedprice", F.lit(0.05)).alias("lo"),
        F.percentile("l_extendedprice", F.lit(0.95)).alias("hi"),
    )
    return (
        li.join(F.broadcast(qs), li.l_returnflag == qs.rf)
        .select(
            "l_orderkey",
            "l_linenumber",
            "l_returnflag",
            F.round(
                F.least(F.greatest(F.col("l_extendedprice"), F.col("lo")), F.col("hi")), 6
            ).alias("price_winsor"),
            (
                (F.col("l_extendedprice") < F.col("lo"))
                | (F.col("l_extendedprice") > F.col("hi"))
            ).cast("int").alias("clipped"),
        )
    )


@q(
    "c28f_histogram",
    """SELECT bucket, count(*) AS n,
              round(min(o_totalprice), 2) AS lo,
              round(max(o_totalprice), 2) AS hi
       FROM (SELECT o_totalprice,
                    CASE WHEN o_totalprice < 0 THEN 0
                         WHEN o_totalprice >= 600000 THEN 13
                         ELSE 1 + CAST(floor(o_totalprice / 50000.0) AS BIGINT)
                    END AS bucket
             FROM orders)
       GROUP BY bucket""",
)
def c28f(spark, sf_dir):
    """C28 variant: fixed-width histogram (pandas `value_counts(bins=...)`
    / numpy `histogram`) — width_bucket + one partial+final count, the
    one-pass distributed histogram."""
    o = tables(spark, sf_dir)("orders")
    return (
        o.select(
            "o_totalprice",
            F.width_bucket("o_totalprice", F.lit(0), F.lit(600000), F.lit(12)).alias("bucket"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("o_totalprice"), 2).alias("lo"),
            F.round(F.max("o_totalprice"), 2).alias("hi"),
        )
    )


@q(
    "c31b_pivot_multi_agg",
    """SELECT l_returnflag,
              CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS F_n,
              CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS F_qty,
              CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS O_n,
              CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,4)) END) AS DOUBLE) AS O_qty
       FROM lineitem GROUP BY l_returnflag""",
)
def c31b(spark, sf_dir):
    """C31 variant: pivot with MULTIPLE aggregates per cell (pandas
    `pivot_table(aggfunc=[...])`) — each pivot value × agg becomes a
    `<value>_<alias>` column, still one partial+final hash agg. Empty
    cells: Spark pivot yields NULL where conditional aggregation yields 0
    for counts — coalesced to match (sums stay NULL on both engines)."""
    li = tables(spark, sf_dir)("lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.count(F.lit(1)).alias("n"),  # count(*) is invalid inside pivot
            F.sum(F.col("l_quantity").cast(DEC)).cast("double").alias("qty"),
        )
    )
    return p.select(
        "l_returnflag",
        F.coalesce("F_n", F.lit(0)).alias("F_n"),
        F.col("F_qty"),
        F.coalesce("O_n", F.lit(0)).alias("O_n"),
        F.col("O_qty"),
    )


@q(
    "c26b_approx_distinct_error",
    """SELECT 'exact_distinct' AS rule,
              CAST(count(DISTINCT l_orderkey) AS BIGINT) AS val
       FROM lineitem
       UNION ALL
       SELECT 'within_3rsd', CAST(1 AS BIGINT)""",
)
def c26b(spark, sf_dir):
    """C26 certification frame: the approximate distinct count itself is
    engine-specific (c26 stays rows-only), but its ERROR BOUND is
    checkable — HLL++ at rsd=0.05 must land within 3·rsd of the exact
    count (far looser than the sketch's actual behavior, so the flag is
    deterministic in practice). The exact count doubles as a value check
    of the same column."""
    li = tables(spark, sf_dir)("lineitem")
    agg = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", 0.05).alias("approx"),
    )
    return agg.select(
        F.expr(
            "stack(2, 'exact_distinct', exact, "
            "'within_3rsd', CAST(abs(approx - exact) <= 3 * 0.05 * exact AS BIGINT)"
            ") AS (rule, val)"
        )
    )


@q(
    "c29d_approx_quantile_error",
    """SELECT 'p50_within_band' AS rule, CAST(1 AS BIGINT) AS ok
       UNION ALL SELECT 'p90_within_band', CAST(1 AS BIGINT)
       UNION ALL SELECT 'p99_within_band', CAST(1 AS BIGINT)""",
)
def c29d(spark, sf_dir):
    """C29 certification frame: approx percentiles are sketch-specific
    (c29b stays rows-only), but Greenwald-Khanna at accuracy=10000
    guarantees rank error <= 1/10000 — so each approx quantile must lie
    within the EXACT [p-1%, p+1%] value band, a 100× looser band than
    the guarantee. Both the approx and exact percentiles compute in one
    aggregate pass; the oracle states the three expected flags."""
    li = tables(spark, sf_dir)("lineitem")
    agg = li.agg(
        F.expr(
            "approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), 10000)"
        ).alias("ap"),
        F.expr(
            "percentile(l_extendedprice, array(0.49, 0.51, 0.89, 0.91, 0.98, 1.0))"
        ).alias("ex"),
    )
    band = lambda i, lo, hi: (
        (F.col("ap")[i] >= F.col("ex")[lo]) & (F.col("ap")[i] <= F.col("ex")[hi])
    ).cast("long")
    return agg.select(
        F.expr("stack(3, 'p50_within_band', CAST(ap[0] >= ex[0] AND ap[0] <= ex[1] AS BIGINT), "
               "'p90_within_band', CAST(ap[1] >= ex[2] AND ap[1] <= ex[3] AS BIGINT), "
               "'p99_within_band', CAST(ap[2] >= ex[4] AND ap[2] <= ex[5] AS BIGINT)) AS (rule, ok)")
    )


@q(
    "c31c_get_dummies",
    """SELECT c_custkey,
              CAST(c_mktsegment = 'AUTOMOBILE' AS INT) AS seg_automobile,
              CAST(c_mktsegment = 'BUILDING' AS INT) AS seg_building,
              CAST(c_mktsegment = 'FURNITURE' AS INT) AS seg_furniture,
              CAST(c_mktsegment = 'HOUSEHOLD' AS INT) AS seg_household,
              CAST(c_mktsegment = 'MACHINERY' AS INT) AS seg_machinery
       FROM customer""",
)
def c31c(spark, sf_dir):
    """C31 variant: pandas `get_dummies` — one-hot indicator columns from
    a categorical. The category list is an explicit parameter (pandas
    CategoricalDtype discipline): no driver-side distinct collect, the
    projection is pure codegen, and unseen categories at serving time
    can't silently widen the schema. Zero shuffle."""
    segs = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
    c = tables(spark, sf_dir)("customer")
    return c.select(
        "c_custkey",
        *[
            (F.col("c_mktsegment") == s).cast("int").alias(f"seg_{s.lower()}")
            for s in segs
        ],
    )


@q(
    "c73_group_regression",
    """WITH r AS (
         SELECT event_type, CAST(value AS DECIMAL(18,4)) AS y,
                row_number() OVER (PARTITION BY event_type ORDER BY event_id) AS x
         FROM events),
       a AS (
         SELECT event_type,
                CAST(count(*) AS DECIMAL(10,0)) AS n,
                CAST(sum(x) AS DECIMAL(19,0)) AS sx,
                CAST(sum(y) AS DECIMAL(19,4)) AS sy,
                CAST(sum(x * y) AS DECIMAL(24,4)) AS sxy,
                CAST(sum(CAST(x AS BIGINT) * x) AS DECIMAL(24,0)) AS sxx
         FROM r GROUP BY 1)
       SELECT event_type, CAST(n AS BIGINT) AS n,
              round(CAST(n*sxy - sx*sy AS DOUBLE)
                    / CAST(n*sxx - sx*sx AS DOUBLE), 6) + 0.0 AS slope,
              round((CAST(sy AS DOUBLE)
                     - CAST(n*sxy - sx*sy AS DOUBLE)
                       / CAST(n*sxx - sx*sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    / CAST(n AS DOUBLE), 6) + 0.0 AS intercept
       FROM a""",
)
def c73(spark, sf_dir):
    """C73 (ext): per-group OLS trend (stats.group_regression) — slope and
    intercept of value against arrival rank, per event type: the "is this
    metric drifting" primitive. Closed-form moments with decimal-exact
    sums (precisions sized so no product clips at decimal(38) — Spark
    silently rounds overflowing products); one window re-key + one agg."""
    from ..stats import group_regression

    e = tables(spark, sf_dir)("events")
    return group_regression(e, "value", "event_id", ["event_type"])


@q(
    "c74_corr_matrix",
    """WITH m AS (
         SELECT CAST(count(*) AS DECIMAL(10,0)) AS n,
                CAST(sum(CAST(l_quantity AS DECIMAL(14,4))) AS DECIMAL(19,4)) AS s_q,
                CAST(sum(CAST(l_quantity AS DECIMAL(19,4))
                         * CAST(l_quantity AS DECIMAL(14,4))) AS DECIMAL(27,8)) AS ss_q,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(14,4))) AS DECIMAL(19,4)) AS s_e,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                         * CAST(l_extendedprice AS DECIMAL(14,4))) AS DECIMAL(27,8)) AS ss_e,
                CAST(sum(CAST(l_discount AS DECIMAL(14,4))) AS DECIMAL(19,4)) AS s_d,
                CAST(sum(CAST(l_discount AS DECIMAL(19,4))
                         * CAST(l_discount AS DECIMAL(14,4))) AS DECIMAL(27,8)) AS ss_d,
                CAST(sum(CAST(l_quantity AS DECIMAL(19,4))
                         * CAST(l_extendedprice AS DECIMAL(14,4))) AS DECIMAL(27,8)) AS sp_q_e,
                CAST(sum(CAST(l_quantity AS DECIMAL(19,4))
                         * CAST(l_discount AS DECIMAL(14,4))) AS DECIMAL(27,8)) AS sp_q_d,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(19,4))
                         * CAST(l_discount AS DECIMAL(14,4))) AS DECIMAL(27,8)) AS sp_e_d
         FROM lineitem)
       SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
              round(CAST(n*sp_q_e - s_q*s_e AS DOUBLE)
                    / sqrt(CAST(n*ss_q - s_q*s_q AS DOUBLE)
                           * CAST(n*ss_e - s_e*s_e AS DOUBLE)), 6) + 0.0 AS corr FROM m
       UNION ALL
       SELECT 'l_quantity', 'l_discount',
              round(CAST(n*sp_q_d - s_q*s_d AS DOUBLE)
                    / sqrt(CAST(n*ss_q - s_q*s_q AS DOUBLE)
                           * CAST(n*ss_d - s_d*s_d AS DOUBLE)), 6) + 0.0 FROM m
       UNION ALL
       SELECT 'l_extendedprice', 'l_discount',
              round(CAST(n*sp_e_d - s_e*s_d AS DOUBLE)
                    / sqrt(CAST(n*ss_e - s_e*s_e AS DOUBLE)
                           * CAST(n*ss_d - s_d*s_d AS DOUBLE)), 6) + 0.0 FROM m""",
)
def c74(spark, sf_dir):
    """C74 (ext): pairwise Pearson correlation matrix in ONE aggregate
    pass (stats.corr_matrix) — all Σx/Σx²/Σxy moments for every pair ride
    the same partial+final agg, so the fact table is scanned once however
    many columns are profiled. Decimal-exact moments → engine-
    deterministic coefficients."""
    from ..stats import corr_matrix

    li = tables(spark, sf_dir)("lineitem")
    return corr_matrix(li, ["l_quantity", "l_extendedprice", "l_discount"])


@q(
    "c75_weighted_median",
    """WITH c AS (
         SELECT l_returnflag,
                l_extendedprice AS v,
                sum(CAST(l_quantity AS DECIMAL(18,4)))
                    OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice
                          RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
                sum(CAST(l_quantity AS DECIMAL(18,4)))
                    OVER (PARTITION BY l_returnflag) AS total
         FROM lineitem)
       SELECT l_returnflag, min(v) AS weighted_median
       FROM c WHERE cum * 2 >= total GROUP BY l_returnflag""",
)
def c75(spark, sf_dir):
    """C75 (ext): exact weighted median (stats.weighted_median) — price
    median weighted by quantity, per return flag. RANGE-frame cumulative
    weights make tie-blocks atomic (no tiebreak column, partition-order
    independent); decimal accumulation makes the threshold compare exact.
    One window re-key + one agg."""
    from ..stats import weighted_median

    li = tables(spark, sf_dir)("lineitem")
    return weighted_median(li, "l_extendedprice", "l_quantity", ["l_returnflag"])


@q(
    "c76_crosstab_margins",
    """SELECT CASE WHEN GROUPING(lang) = 1 THEN 'All' ELSE lang END AS lang,
              CAST(count(*) FILTER (WHERE source = 'src0') AS BIGINT) AS src0,
              CAST(count(*) FILTER (WHERE source = 'src1') AS BIGINT) AS src1,
              CAST(count(*) FILTER (WHERE source = 'src2') AS BIGINT) AS src2,
              CAST(count(*) AS BIGINT) AS All_total
       FROM documents WHERE source IN ('src0', 'src1', 'src2')
       GROUP BY ROLLUP(lang)""",
)
def c76(spark, sf_dir):
    """C31 sibling: pandas ``crosstab(margins=True)`` — a contingency
    table WITH row and column totals, as ONE grouping-sets aggregate
    (rollup adds the 'All' row; the All_total column is the row margin).
    Single partial+final pass, no second scan for the margins."""
    d = tables(spark, sf_dir)("documents").filter(
        F.col("source").isin("src0", "src1", "src2")
    )
    out = d.rollup("lang").agg(
        F.count(F.when(F.col("source") == "src0", 1)).alias("src0"),
        F.count(F.when(F.col("source") == "src1", 1)).alias("src1"),
        F.count(F.when(F.col("source") == "src2", 1)).alias("src2"),
        F.count("*").alias("All_total"),
        # grouping() distinguishes the margin row from a genuine NULL-lang
        # group — coalesce would conflate them on nullable data (must be
        # computed inside the rollup aggregate)
        F.grouping("lang").alias("__g"),
    )
    return out.select(
        F.when(F.col("__g") == 1, F.lit("All")).otherwise(F.col("lang")).alias("lang"),
        "src0", "src1", "src2", "All_total",
    )


@q(
    "c77_qcut",
    """WITH b AS (
         SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
                quantile_cont(l_extendedprice, 0.50) AS q2,
                quantile_cont(l_extendedprice, 0.75) AS q3
         FROM lineitem)
       SELECT l_orderkey, l_linenumber,
              CAST(CASE WHEN l_extendedprice > q3 THEN 3
                        WHEN l_extendedprice > q2 THEN 2
                        WHEN l_extendedprice > q1 THEN 1
                        ELSE 0 END AS INT) AS price_quartile
       FROM lineitem, b""",
)
def c77(spark, sf_dir):
    """C77 (ext): pandas ``qcut(4)`` — quantile binning WITHOUT the global
    percent_rank window (the single-task cliff): exact interpolated
    boundaries come from one 1-row aggregate that broadcasts back (c20b's
    scalar-subquery shape), and the binning itself is a codegen'd CASE
    riding the scan. 100 TB variant: exact ``percentile`` keeps per-group
    state proportional to DISTINCT values — on an unbounded value domain
    swap to ``approx_percentile(col, p, 10000)`` (one line, same boundary
    contract, bounded GK-sketch state; error band certified by c29d).
    Exact is used here because oracle hash-parity requires it."""
    li = tables(spark, sf_dir)("lineitem")
    b = li.agg(
        F.expr("percentile(l_extendedprice, 0.25)").alias("q1"),
        F.expr("percentile(l_extendedprice, 0.50)").alias("q2"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("q3"),
    )
    p = F.col("l_extendedprice")
    return li.crossJoin(F.broadcast(b)).select(
        "l_orderkey",
        "l_linenumber",
        F.when(p > F.col("q3"), 3)
        .when(p > F.col("q2"), 2)
        .when(p > F.col("q1"), 1)
        .otherwise(0)
        .cast("int")
        .alias("price_quartile"),
    )


@q(
    "c80_entropy_by_group",
    """WITH c AS (SELECT user_id, event_type, count(*) AS n
                  FROM events GROUP BY 1, 2),
       t AS (SELECT user_id, sum(n) AS tot FROM c GROUP BY 1)
       SELECT c.user_id,
              CAST(sum(c.n) AS BIGINT) AS n_events,
              CAST(count(*) AS INT) AS n_types,
              round(-sum((c.n::DOUBLE / t.tot) * ln(c.n::DOUBLE / t.tot)), 4)
                  AS entropy
       FROM c JOIN t USING (user_id)
       GROUP BY c.user_id""",
)
def c80(spark, sf_dir):
    """C-ext (r5): Shannon entropy of each user's event-type distribution —
    the behavioral-diversity profile (bots cluster near 0, organic users
    spread). Two stacked aggregations on the SAME key: the per-(user,type)
    counts re-aggregate to per-user without a second fact scan, and the
    totals come from a window over the count table, so the fact table
    shuffles once. Entropy terms are libm ln — rounded 4dp per SURVEY §7."""
    e = tables(spark, sf_dir)("events")
    c = e.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    # window, not a join back: the count table is already user-keyed, so
    # the total is a zero-exchange window over the aggregate output
    from pyspark.sql import Window as W

    tot = F.sum("n").over(W.partitionBy("user_id"))
    p = F.col("n").cast("double") / F.col("tot")
    return (
        c.withColumn("tot", tot)
        .groupBy("user_id")
        .agg(
            F.sum("n").alias("n_events"),
            F.count("*").cast("int").alias("n_types"),
            F.round(-F.sum(p * F.log(p)), 4).alias("entropy"),
        )
    )


@q(
    "c81_benford_digits",
    """WITH d AS (SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
                  FROM orders WHERE o_totalprice >= 1),
       t AS (SELECT count(*) AS tot FROM d)
       SELECT digit,
              CAST(count(*) AS BIGINT) AS n,
              round(count(*)::DOUBLE / t.tot, 6) AS obs_p,
              round(log10(1.0 + 1.0 / digit), 6) AS benford_p
       FROM d, t GROUP BY digit, t.tot""",
)
def c81(spark, sf_dir):
    """C-ext (r5): Benford first-digit audit — observed leading-digit
    distribution of order totals vs the Benford expectation log10(1+1/d)
    (the classic synthetic-data / fraud smoke test; TPC-H prices are
    uniform-ish, so the deviation itself is the signal). Digit extraction
    is integer/string arithmetic (engine-exact); only the two proportions
    are rounded. One aggregate + a 1-row total broadcast back."""
    o = tables(spark, sf_dir)("orders")
    d = o.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("int")
        .alias("digit")
    )
    tot = d.agg(F.count("*").alias("tot"))
    return (
        d.groupBy("digit")
        .agg(F.count("*").alias("n"))
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n",
            F.round(F.col("n").cast("double") / F.col("tot"), 6).alias("obs_p"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_p"),
        )
    )


@q(
    "c85_mad_outliers",
    """WITH med AS (SELECT event_type, round(median(value), 6) AS median
                    FROM events GROUP BY 1),
       dev AS (SELECT e.event_type, abs(e.value - m.median) AS absdev,
                      m.median
               FROM events e JOIN med m USING (event_type)),
       mad AS (SELECT event_type, round(median(absdev), 6) AS mad
               FROM dev GROUP BY 1)
       SELECT d.event_type, CAST(count(*) AS BIGINT) AS n,
              any_value(d.median) AS median, any_value(ma.mad) AS mad,
              CAST(sum(CASE WHEN d.absdev > 3 * 1.4826 * ma.mad
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       FROM dev d JOIN mad ma USING (event_type) GROUP BY 1""",
)
def c85(spark, sf_dir):
    """C28-ext (r6): robust outlier census per event type via Median
    Absolute Deviation (``stats.mad_outliers``) — the heavy-tail-safe
    alternative to c72/d36's mean/stddev moments, which are dragged by
    the very outliers they hunt (50% breakdown point vs 0%). Two exact-
    percentile passes + one counting pass; the per-group median/MAD
    tables are group-cardinality-sized and broadcast back, so nothing
    but the group key ever shuffles. Medians and MADs round to 6 dp
    BEFORE the threshold compare, pinning the outlier decision
    cross-engine (the c29 interpolated-percentile parity)."""
    from .. import stats

    e = tables(spark, sf_dir)("events")
    return stats.mad_outliers(e, "event_type", "value", scale=1.4826, k=3.0)


@q(
    "c86_acf_daily_revenue",
    """WITH rev AS (
         SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS r
         FROM orders GROUP BY 1)
       SELECT l.lag AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
              round(corr(a.r, b.r), 6) AS acf
       FROM (SELECT unnest(range(1, 8)) AS lag) l
       JOIN rev a ON true
       JOIN rev b ON b.day = a.day + l.lag
       GROUP BY l.lag""",
)
def c86(spark, sf_dir):
    """C28-ext (r6): autocorrelation function of the daily-revenue series at
    lags 1..7 — the seasonality/persistence probe that picks c84's seasonal
    period and validates x28's forecasting features. The fact table collapses
    to one DECIMAL-exact row per calendar day FIRST (one shuffle, map-side
    partial agg), so the lag self-join runs on a calendar-bounded series
    (days, not rows — ~2.5k rows for 7 years at ANY corpus scale) and
    broadcasts; corr is Spark's mergeable co-moment aggregate, rounded 6 dp
    per the c28b parity. Scale story: 100 TB of orders still produces the
    same ~2.5k-row series; only the first aggregation touches data-sized
    input."""
    from .._scratch import scratch_persist

    o = tables(spark, sf_dir)("orders")
    # the calendar-bounded series feeds both sides of the lag join —
    # persist so the data-sized aggregation runs once
    rev = scratch_persist(
        o.groupBy(
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day")
        ).agg(dsum("o_totalprice").alias("r")),
        "c86/daily_revenue",
    )
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = rev.select(F.col("day").alias("a_day"), F.col("r").alias("a_r"))
    b = rev.select(F.col("day").alias("b_day"), F.col("r").alias("b_r"))
    return (
        a.crossJoin(F.broadcast(lags))
        .join(
            F.broadcast(b),
            F.col("b_day") == F.col("a_day") + F.col("lag"),
        )
        .groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.corr("a_r", "b_r"), 6).alias("acf"),
        )
    )


@q(
    "c87_welch_ttest",
    """WITH g AS (
         SELECT CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 'AUTOMOBILE'
                     ELSE 'OTHER' END AS grp,
                CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS mean,
                round(var_samp(c_acctbal), 2) AS var
         FROM customer GROUP BY 1),
       w AS (SELECT a.n AS n1, a.mean AS m1, a.var AS v1,
                    b.n AS n2, b.mean AS m2, b.var AS v2
             FROM g a, g b WHERE a.grp = 'AUTOMOBILE' AND b.grp = 'OTHER')
       SELECT n1, n2, round(m1 - m2, 6) AS mean_diff,
              round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat,
              round(pow(v1 / n1 + v2 / n2, 2)
                    / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)),
                    2) AS welch_df
       FROM w""",
)
def c87(spark, sf_dir):
    """C28-ext (r6): Welch's unequal-variance t-test — AUTOMOBILE-segment
    account balances vs the rest, the A/B-significance primitive every
    experimentation pipeline runs. One map-side-combinable aggregation
    produces both groups' sufficient statistics (n, DECIMAL-exact mean,
    var_samp rounded 6 dp BEFORE the t arithmetic so the statistic is
    engine-exact); the 2-row stats frame self-joins driver-free. t and the
    Welch–Satterthwaite df are pure scalar arithmetic on the rounded
    moments. Scale: the shuffle carries 2 rows regardless of corpus size."""
    c = tables(spark, sf_dir)("customer")
    g = (
        c.groupBy(
            F.when(F.col("c_mktsegment") == "AUTOMOBILE", "AUTOMOBILE")
            .otherwise("OTHER")
            .alias("grp")
        )
        .agg(
            F.count("*").cast("long").alias("n"),
            davg("c_acctbal").alias("mean"),
            F.round(F.var_samp("c_acctbal"), 2).alias("var"),
        )
    )
    a = g.filter(F.col("grp") == "AUTOMOBILE").select(
        F.col("n").alias("n1"), F.col("mean").alias("m1"), F.col("var").alias("v1")
    )
    b = g.filter(F.col("grp") == "OTHER").select(
        F.col("n").alias("n2"), F.col("mean").alias("m2"), F.col("var").alias("v2")
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    return a.crossJoin(b).select(
        "n1",
        "n2",
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 4).alias("t_stat"),
        F.round(
            F.pow(se2, 2)
            / (
                F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
                + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
            ),
            2,
        ).alias("welch_df"),
    )


@q(
    "c88_chi_square_independence",
    """WITH obs AS (
         SELECT c_nationkey AS nat, c_mktsegment AS seg,
                CAST(count(*) AS DOUBLE) AS o
         FROM customer GROUP BY 1, 2),
       rt AS (SELECT nat, sum(o) AS r FROM obs GROUP BY 1),
       ct AS (SELECT seg, sum(o) AS c FROM obs GROUP BY 1),
       n AS (SELECT sum(o) AS n FROM obs)
       SELECT round(sum(pow(obs.o - rt.r * ct.c / n.n, 2)
                        / (rt.r * ct.c / n.n)), 4) AS chi2,
              CAST((count(DISTINCT obs.nat) - 1)
                   * (count(DISTINCT obs.seg) - 1) AS BIGINT) AS dof
       FROM obs JOIN rt USING (nat) JOIN ct USING (seg) CROSS JOIN n""",
)
def c88(spark, sf_dir):
    """C28-ext (r6): chi-square test of independence between nation and
    market segment — the categorical-association probe behind segmentation
    sanity checks and d57-style drift alarms. The observed contingency
    table is category-bounded (25 nations x 5 segments), so after ONE
    data-sized aggregation everything is arithmetic on a 125-row frame with
    broadcast marginals. Counts are integers in doubles (exact below 2^53),
    expected counts are single divisions — deterministic cross-engine; only
    the final statistic rounds (4 dp)."""
    from .._scratch import scratch_persist

    c = tables(spark, sf_dir)("customer")
    # the category-bounded contingency table feeds both marginals, the
    # total, and the statistic — persist so the data-sized agg runs once
    obs = scratch_persist(
        c.groupBy(
            F.col("c_nationkey").alias("nat"), F.col("c_mktsegment").alias("seg")
        ).agg(F.count("*").cast("double").alias("o")),
        "c88/contingency",
    )
    rt = obs.groupBy("nat").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("seg").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    exp = F.col("r") * F.col("c") / F.col("n")
    return (
        obs.join(F.broadcast(rt), "nat")
        .join(F.broadcast(ct), "seg")
        .crossJoin(F.broadcast(n))
        .agg(
            F.round(F.sum(F.pow(F.col("o") - exp, 2) / exp), 4).alias("chi2"),
            (
                (F.count_distinct(F.col("nat")) - 1)
                * (F.count_distinct(F.col("seg")) - 1)
            )
            .cast("long")
            .alias("dof"),
        )
    )


@q(
    "c89_mann_whitney",
    """WITH g AS (
         SELECT round(c_acctbal, 2) AS v,
                CASE WHEN c_mktsegment = 'AUTOMOBILE' THEN 1 ELSE 0 END AS isa
         FROM customer),
       grid AS (SELECT v, CAST(sum(isa) AS BIGINT) AS na,
                       CAST(sum(1 - isa) AS BIGINT) AS nb
                FROM g GROUP BY 1),
       cum AS (SELECT v, na, nb,
                      sum(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - nb
                          AS cumb
               FROM grid),
       u AS (SELECT CAST(sum(CAST(na * cumb + 0.5 * na * nb
                                  AS DECIMAL(28,1))) AS DOUBLE) AS u_stat,
                    CAST(sum(na) AS BIGINT) AS n1,
                    CAST(sum(nb) AS BIGINT) AS n2
             FROM cum)
       SELECT n1, n2, u_stat,
              round((u_stat - n1 * n2 / 2.0)
                    / sqrt(n1 * n2 * (n1 + n2 + 1.0) / 12.0), 4) AS z
       FROM u""",
)
def c89(spark, sf_dir):
    """C28-ext (r6c): Mann–Whitney U rank-sum test (AUTOMOBILE balances vs
    the rest) — the nonparametric companion to c87's Welch t, immune to the
    heavy tails that drag moment-based tests. NO global ranking of the
    corpus: the data collapses to one row per DISTINCT 2-dp balance — a
    VALUE-GRID-bounded frame (~1.1M cells max at any corpus size) — and
    U = sum(nA·cumB(<v) + ½·nA·nB) over that grid via one cumulative
    window (single-partition safe by grid boundedness). Every term is a
    half-integer, exact in DECIMAL(28,1); z uses the no-tie-correction
    normal approximation (documented; both engines share the formula).
    Scale: the only data-sized operation is the first groupBy."""
    from pyspark.sql import Window as W

    c = tables(spark, sf_dir)("customer")
    g = c.select(
        F.round("c_acctbal", 2).alias("v"),
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", 1).otherwise(0).alias("isa"),
    )
    grid = g.groupBy("v").agg(
        F.sum("isa").cast("long").alias("na"),
        F.sum(1 - F.col("isa")).cast("long").alias("nb"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = grid.withColumn("cumb", F.sum("nb").over(w) - F.col("nb"))
    u = cum.agg(
        F.sum(
            (
                F.col("na") * F.col("cumb")
                + 0.5 * F.col("na") * F.col("nb")
            ).cast("decimal(28,1)")
        )
        .cast("double")
        .alias("u_stat"),
        F.sum("na").cast("long").alias("n1"),
        F.sum("nb").cast("long").alias("n2"),
    )
    return u.select(
        "n1",
        "n2",
        "u_stat",
        F.round(
            (F.col("u_stat") - F.col("n1") * F.col("n2") / 2.0)
            / F.sqrt(
                F.col("n1") * F.col("n2") * (F.col("n1") + F.col("n2") + 1.0) / 12.0
            ),
            4,
        ).alias("z"),
    )


@q(
    "c91_ks_test",
    """WITH g AS (SELECT CASE WHEN c_mktsegment = 'AUTOMOBILE'
                              THEN 'AUTOMOBILE' ELSE 'OTHER' END AS grp,
                        c_acctbal AS v FROM customer),
       wide AS (SELECT v,
                       sum(CASE WHEN grp = 'AUTOMOBILE' THEN 1 ELSE 0 END) AS c1,
                       sum(CASE WHEN grp = 'OTHER' THEN 1 ELSE 0 END) AS c2
                FROM g GROUP BY 1),
       tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                      CAST(sum(c2) AS BIGINT) AS n2 FROM wide),
       cum AS (SELECT v,
                      sum(c1) OVER (ORDER BY v) AS a1,
                      sum(c2) OVER (ORDER BY v) AS a2 FROM wide),
       d AS (SELECT v, round(abs(a1::DOUBLE / t.n1 - a2::DOUBLE / t.n2), 9) AS dd
             FROM cum, tot t),
       mx AS (SELECT max(dd) AS m FROM d)
       SELECT t.n1, t.n2, round(mx.m, 6) AS ks_stat, min(d.v) AS ks_at
       FROM d, mx, tot t WHERE d.dd = mx.m GROUP BY 1, 2, 3""",
)
def c91(spark, sf_dir):
    """C28-ext (r7): two-sample Kolmogorov–Smirnov statistic — the
    DISTRIBUTION-SHAPE shift test completing the r6 significance tier
    (c87 Welch compares means, c89 Mann–Whitney ranks; KS sees any shape
    difference). ``stats.ks_two_sample``: one groupBy collapses rows to
    per-distinct-value counts (value-domain-sized), ``scale.global_cumsum``
    builds the ECDF numerators with range-partitioned prefix sums — no
    single-task global window — and one max + broadcast-filter pass finds
    the sup and its earliest location. ECDF steps are exact integer
    ratios, so the statistic itself hash-certifies (9-dp snap before the
    max, 6-dp report; the c86 corr treatment)."""
    from .. import stats

    c = tables(spark, sf_dir)("customer")
    return stats.ks_two_sample(
        c,
        F.when(F.col("c_mktsegment") == "AUTOMOBILE", "AUTOMOBILE").otherwise(
            "OTHER"
        ),
        "c_acctbal",
    )


@q(
    "c92_lead_lag_xcorr",
    """WITH daily AS (
         SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day,
                CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
         FROM orders GROUP BY 1)
       SELECT l.lag AS lag, CAST(count(*) AS BIGINT) AS n_pairs,
              round(corr(a.n_orders, b.rev), 6) AS xcorr
       FROM (SELECT unnest(range(-7, 8)) AS lag) l
       JOIN daily a ON true
       JOIN daily b ON b.day = a.day + l.lag
       GROUP BY 1""",
)
def c92(spark, sf_dir):
    """C28-ext (r7): lead–lag CROSS-correlation between the daily order
    count and daily revenue at lags −7..+7 — the "which series leads"
    probe that c86's single-series ACF cannot answer. Same scale shape
    as c86: the fact table collapses to one calendar-bounded daily row
    FIRST (~2.5k rows at ANY corpus scale), the 15-lag × series join
    broadcasts, corr is Spark's mergeable co-moment aggregate rounded
    6 dp."""
    from .._scratch import scratch_persist

    o = tables(spark, sf_dir)("orders")
    daily = scratch_persist(
        o.groupBy(
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day")
        ).agg(
            F.count("*").cast("long").alias("n_orders"),
            dsum("o_totalprice").alias("rev"),
        ),
        "c92/daily",
    )
    lags = spark.range(-7, 8).select(F.col("id").alias("lag"))
    a = daily.select(F.col("day").alias("a_day"), F.col("n_orders").alias("a_n"))
    b = daily.select(F.col("day").alias("b_day"), F.col("rev").alias("b_rev"))
    return (
        a.crossJoin(F.broadcast(lags))
        .join(F.broadcast(b), F.col("b_day") == F.col("a_day") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(F.corr("a_n", "b_rev"), 6).alias("xcorr"),
        )
    )


@q(
    "c93_changepoint_cusum",
    """WITH rev AS (
         SELECT CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS day,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DECIMAL(28,4)) AS r
         FROM orders GROUP BY 1),
       ns AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(r) AS DECIMAL(27,6)) AS s FROM rev),
       cum AS (SELECT day,
                      CAST(sum(r) OVER (ORDER BY day) AS DECIMAL(27,6)) AS cx,
                      CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS ck
               FROM rev),
       u AS (SELECT day,
                    abs(CAST(ns.n AS DECIMAL(10,0)) * cx
                        - CAST(ck AS DECIMAL(10,0)) * ns.s) AS uu
             FROM cum, ns),
       mx AS (SELECT max(uu) AS m FROM u)
       SELECT min(u.day) AS change_at, ns.n AS n_points,
              round(CAST(mx.m AS DOUBLE) / ns.n, 6) AS max_abs_cusum,
              round(CAST(ns.s AS DOUBLE) / ns.n, 6) AS mean
       FROM u, mx, ns WHERE u.uu = mx.m GROUP BY 2, 3, 4""",
)
def c93(spark, sf_dir):
    """C28-ext (r7): most-likely mean-shift changepoint of the daily
    revenue series by the CUSUM criterion (argmax |Σ(x−x̄)|) — the "when
    did this metric move" primitive behind drift alarms
    (``timeseries.cusum_changepoint``). The criterion is evaluated
    MULTIPLIED THROUGH by n (U_t = n·cum − t·Σ, same argmax, no
    division), so every comparison happens on EXACT decimals and the
    argmax hash-certifies; the running sum is ``scale.global_cumsum``
    (range-partitioned prefix sums — no single-task window over data-
    sized input; the series itself is calendar-bounded)."""
    from .. import timeseries

    o = tables(spark, sf_dir)("orders")
    rev = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day")
    ).agg(F.sum(F.col("o_totalprice").cast(DEC)).cast("decimal(28,4)").alias("r"))
    out = timeseries.cusum_changepoint(rev, "day", "r")
    return out.select(
        F.col("change_at").cast("long").alias("change_at"),
        "n_points",
        "max_abs_cusum",
        "mean",
    )


@q(
    "c94_cramers_v",
    """WITH obs AS (
         SELECT o_orderpriority AS pri, o_orderstatus AS st,
                CAST(count(*) AS DOUBLE) AS o
         FROM orders GROUP BY 1, 2),
       rt AS (SELECT pri, sum(o) AS r FROM obs GROUP BY 1),
       ct AS (SELECT st, sum(o) AS c FROM obs GROUP BY 1),
       n AS (SELECT sum(o) AS n FROM obs),
       x AS (SELECT round(sum(pow(obs.o - rt.r * ct.c / n.n, 2)
                              / (rt.r * ct.c / n.n)), 4) AS chi2,
                    count(DISTINCT obs.pri) AS nr,
                    count(DISTINCT obs.st) AS nc,
                    any_value(n.n) AS n
             FROM obs JOIN rt USING (pri) JOIN ct USING (st) CROSS JOIN n)
       SELECT chi2,
              CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
              CAST(n AS BIGINT) AS n,
              round(sqrt(chi2 / (n * least(nr - 1, nc - 1))), 6) AS cramers_v
       FROM x""",
)
def c94(spark, sf_dir):
    """C28-ext (r7): Cramér's V — the [0,1]-normalized effect size that
    makes c88's chi-square comparable across tables of different
    dimensions (chi2 grows with n; V = sqrt(chi2 / (n·min(r−1,c−1)))
    does not), here over order priority × order status. Same scale shape
    as c88: one data-sized aggregation collapses to a category-bounded
    contingency frame (5×3), broadcast marginals, pure arithmetic after;
    V derives from the 4-dp-rounded chi2 so the sqrt is pinned
    cross-engine."""
    from .._scratch import scratch_persist

    o = tables(spark, sf_dir)("orders")
    obs = scratch_persist(
        o.groupBy(
            F.col("o_orderpriority").alias("pri"),
            F.col("o_orderstatus").alias("st"),
        ).agg(F.count("*").cast("double").alias("o")),
        "c94/contingency",
    )
    rt = obs.groupBy("pri").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("st").agg(F.sum("o").alias("c"))
    n = obs.agg(F.sum("o").alias("n"))
    exp = F.col("r") * F.col("c") / F.col("n")
    x = (
        obs.join(F.broadcast(rt), "pri")
        .join(F.broadcast(ct), "st")
        .crossJoin(F.broadcast(n))
        .agg(
            F.round(F.sum(F.pow(F.col("o") - exp, 2) / exp), 4).alias("chi2"),
            F.count_distinct("pri").alias("nr"),
            F.count_distinct("st").alias("nc"),
            F.first("n").alias("n"),
        )
    )
    return x.select(
        "chi2",
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("long").alias("dof"),
        F.col("n").cast("long").alias("n"),
        F.round(
            F.sqrt(
                F.col("chi2") / (F.col("n") * F.least(F.col("nr") - 1, F.col("nc") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


@q(
    "c95_monthly_psi",
    """WITH v AS (SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
                         o_totalprice AS val FROM orders),
       ed AS (SELECT quantile_cont(val, [0.1, 0.2, 0.3, 0.4, 0.5,
                                         0.6, 0.7, 0.8, 0.9]) AS es FROM v),
       b AS (SELECT month,
                    len(list_filter(ed.es, x -> x < val)) AS bk
             FROM v, ed),
       ref AS (SELECT bk, count(*) AS rc FROM b GROUP BY 1),
       rt AS (SELECT count(*) AS rt FROM b),
       per AS (SELECT month, bk, count(*) AS pc FROM b GROUP BY 1, 2),
       pt AS (SELECT month, count(*) AS pt FROM b GROUP BY 1),
       grid AS (SELECT pt.month, pt.pt,
                       coalesce(per.pc, 0)::DOUBLE / pt.pt AS pm,
                       ref.rc::DOUBLE / rt.rt AS pr
                FROM pt CROSS JOIN ref
                LEFT JOIN per ON per.month = pt.month AND per.bk = ref.bk
                CROSS JOIN rt)
       SELECT month,
              CAST(any_value(pt) AS BIGINT) AS n,
              round(CAST(sum(CAST(round((pm - pr) * ln((pm + 0.000001)
                                                       / (pr + 0.000001)), 12)
                                  AS DECIMAL(24,12))) AS DOUBLE), 6) AS psi
       FROM grid GROUP BY 1""",
)
def c95(spark, sf_dir):
    """C28-ext (r7): monthly Population Stability Index of the order-value
    distribution against the whole-corpus decile reference
    (``stats.psi_report``) — the model-monitoring drift score, and the
    BATCH-certified math behind ``streaming.drift_monitor_into_engine``'s
    per-epoch alarm. Bucket index is a codegen fold over the broadcast
    9-edge array; missing month×bucket cells enter as pm=0 terms (the
    explicit grid — dropping them understates drift exactly where it's
    strongest); each PSI term 12-dp-snaps then DECIMAL-sums so the
    per-month total is aggregation-order-independent and hash-certified."""
    from .. import stats

    o = tables(spark, sf_dir)("orders")
    src = o.select(
        F.date_format(F.to_date("o_orderdate"), "yyyy-MM").alias("month"),
        "o_totalprice",
    )
    return stats.psi_report(src, "month", "o_totalprice", n_buckets=10)
