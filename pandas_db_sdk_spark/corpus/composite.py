"""Composite analytics queries — TPC-H-shaped multi-join pipelines.

The single-operator corpus proves each §2 row in isolation; these prove the
operators COMPOSE the way a user's real analytics do: 3–6 table joins with
selective filters, decimal-disciplined revenue aggregates, and top-k output.
Shapes follow TPC-H Q3/Q5/Q10 adapted to the fixture schema
(`o_orderpriority` stands in for `o_shippriority`; see FIXTURES.md).

Scale notes: every join key is the tables' natural key, so Catalyst picks
broadcast for dims (region/nation/customer at their relative sizes) and
shuffled hash/sort-merge for fact×fact; AQE re-plans at runtime. Filters sit
directly on the scans (pushed to parquet); aggregates are partial+final.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import davg, registry, tables
from .._localrel import local_rows_df

QUERIES, ORACLE, q = registry()

REV_DEC = "decimal(18,4)"


def _revenue():
    return (
        F.col("l_extendedprice").cast(REV_DEC)
        * (F.lit(1).cast(REV_DEC) - F.col("l_discount").cast(REV_DEC))
    )


@q(
    "x01_shipping_priority",
    """SELECT l.l_orderkey,
              CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                       * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                  AS revenue,
              strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
              o.o_orderpriority
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE c.c_mktsegment = 'BUILDING'
         AND o.o_orderdate < TIMESTAMP '1998-03-15'
         AND l.l_shipdate > TIMESTAMP '1998-03-15'
       GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
       ORDER BY revenue DESC, l.l_orderkey
       LIMIT 10""",
)
def x01(spark, sf_dir):
    """TPC-H Q3 shape: segment filter → 3-way join → revenue agg → top-10.
    Both date filters push to the parquet scans; customer (filtered) is
    broadcast-sized relative to the fact chain."""
    t = tables(spark, sf_dir)
    c = t("customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t("orders").filter(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    l = t("lineitem").filter(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@q(
    "x02_local_supplier_volume",
    """SELECT n.n_name,
              CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                       * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                  AS revenue
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey
       WHERE r.r_name = 'ASIA'
         AND o.o_orderdate >= TIMESTAMP '1996-01-01'
         AND o.o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY n.n_name
       ORDER BY revenue DESC""",
)
def x02(spark, sf_dir):
    """TPC-H Q5 shape: 6-table join with a same-nation (customer=supplier)
    correlation and a region filter that prunes before the big joins.
    region/nation (fixed-size at ANY scale factor) carry broadcast hints;
    the supplier side is UNHINTED — it scales with SF, so AQE broadcasts
    while it fits (at fixture scale the planner still picks BHJ)."""
    t = tables(spark, sf_dir)
    r = t("region").filter(F.col("r_name") == "ASIA")
    n = t("nation").join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    s = t("supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    )
    o = t("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = t("customer")
    l = t("lineitem")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc())
    )


@q(
    "x03_returned_items",
    """SELECT c.c_custkey, c.c_name, n.n_name,
              CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                       * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                  AS revenue,
              count(*) AS n_items
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       WHERE l.l_returnflag = 'R'
         AND o.o_orderdate >= TIMESTAMP '1997-01-01'
         AND o.o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY c.c_custkey, c.c_name, n.n_name
       ORDER BY revenue DESC, c.c_custkey
       LIMIT 20""",
)
def x03(spark, sf_dir):
    """TPC-H Q10 shape: lost-revenue-by-customer over returned items; the
    returnflag filter pushes into the lineitem scan, nation broadcasts,
    top-20 plans as TakeOrderedAndProject."""
    t = tables(spark, sf_dir)
    o = t("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = t("lineitem").filter(F.col("l_returnflag") == "R")
    return (
        t("customer")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t("nation")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_revenue()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@q(
    "x04_large_volume_customers",
    """WITH big AS (
         SELECT l_orderkey
         FROM lineitem GROUP BY l_orderkey
         HAVING sum(l_quantity) > 150)
       SELECT c.c_custkey, c.c_name, o.o_orderkey,
              strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
              o.o_totalprice,
              CAST(sum(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty
       FROM customer c
       JOIN orders o ON c.c_custkey = o.o_custkey
       JOIN lineitem l ON o.o_orderkey = l.l_orderkey
       JOIN big b ON b.l_orderkey = o.o_orderkey
       GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
       ORDER BY o.o_totalprice DESC, o.o_orderkey
       LIMIT 25""",
)
def x04(spark, sf_dir):
    """TPC-H Q18 shape: HAVING-filtered aggregate subquery (orders above a
    quantity threshold) semi-filtering a 3-way join, re-aggregated, top-25.
    The `big` aggregate reduces lineitem to qualifying orderkeys BEFORE the
    wide join — at scale this is the difference between joining 100 TB of
    lineitem twice and joining it against a thin key set once."""
    t = tables(spark, sf_dir)
    l = t("lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(REV_DEC)).alias("__q"))
        .filter(F.col("__q") > 150)
        .select("l_orderkey")
    )
    o = t("orders")
    return (
        t("customer")
        .join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l.select("l_orderkey", "l_quantity"), F.col("o_orderkey") == l.l_orderkey)
        .join(big.withColumnRenamed("l_orderkey", "__bk"), F.col("o_orderkey") == F.col("__bk"), "left_semi")
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(REV_DEC)).cast("double").alias("total_qty"))
        .select(
            "c_custkey", "c_name", "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(25)
    )


@q(
    "x05_late_shipments",
    """SELECT o.o_orderpriority,
              CAST(sum(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                       THEN 1 ELSE 0 END) AS BIGINT) AS late_items,
              count(*) AS total_items
       FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
       WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
         AND o.o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY o.o_orderpriority
       ORDER BY o.o_orderpriority""",
)
def x05(spark, sf_dir):
    """TPC-H Q12 shape (shipmode → lateness, fixture has no shipmode):
    order-vs-ship date lag classified per priority class. One fact×fact
    join re-key + conditional partial+final agg; the date filter pushes to
    the orders scan and prunes the join's build side."""
    t = tables(spark, sf_dir)
    o = t("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    l = t("lineitem")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"), 1
    ).otherwise(0)
    return (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.sum(late).alias("late_items"),
            F.count("*").alias("total_items"),
        )
        .orderBy("o_orderpriority")
    )


@q(
    "x06_promo_revenue",
    """SELECT round(
              100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                        THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                             * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
              / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                         * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE),
              6) AS promo_pct
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
         AND l.l_shipdate < TIMESTAMP '1997-07-01'""",
)
def x06(spark, sf_dir):
    """TPC-H Q14 shape: promo revenue share over a ship-date window. part
    broadcasts (dimension), the filter pushes into the lineitem scan, and
    both conditional sums ride one partial+final agg — a single pass over
    the qualifying rows."""
    t = tables(spark, sf_dir)
    l = t("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(
        F.lit(0).cast(REV_DEC)
    )
    return (
        l.join(t("part"), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(_revenue()).cast("double"),
                6,
            ).alias("promo_pct")
        )
    )


@q(
    "x07_disjunctive_revenue",
    """SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                       * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                  AS revenue,
              count(*) AS n_items
       FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
       WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15
              AND l.l_quantity >= 1 AND l.l_quantity <= 30)
          OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 10 AND 30
              AND l.l_quantity >= 10 AND l.l_quantity <= 40)
          OR (p.p_brand = 'Brand#7' AND p.p_size BETWEEN 25 AND 50
              AND l.l_quantity >= 20 AND l.l_quantity <= 50)""",
)
def x07(spark, sf_dir):
    """TPC-H Q19 shape: disjunctive multi-attribute predicate spanning both
    join sides. Catalyst CNF-converts the OR so the part-only conjuncts
    (brand ∈ {...}, size range) still prune the broadcast build side, and
    the quantity bounds still push to the lineitem scan."""
    t = tables(spark, sf_dir)
    l = t("lineitem")
    p = t("part")
    j = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#7")
            & F.col("p_size").between(25, 50)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(cond).agg(
        F.sum(_revenue()).cast("double").alias("revenue"),
        F.count("*").alias("n_items"),
    )


@q(
    "x08_supplier_part_counts",
    """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
       bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       SELECT p.p_brand, p.p_type, p.p_size,
              count(DISTINCT ps.l_suppkey) AS supplier_cnt
       FROM ps
       JOIN part p ON p.p_partkey = ps.l_partkey
       WHERE p.p_brand <> 'Brand#1'
         AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM bad)
       GROUP BY p.p_brand, p.p_type, p.p_size
       ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
       LIMIT 30""",
)
def x08(spark, sf_dir):
    """TPC-H Q16 shape: distinct part-supplier relation (distilled from
    lineitem — the fixture has no partsupp), an anti-join excluding
    complained-about suppliers, per-(brand,type,size) distinct-supplier
    counts, deterministic top-30. The anti-join side is tiny (negative-
    balance suppliers) and broadcasts."""
    t = tables(spark, sf_dir)
    ps = t("lineitem").select("l_partkey", "l_suppkey").distinct()
    bad = t("supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        ps.join(bad, ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(
            t("part").filter(F.col("p_brand") != "Brand#1"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(30)
    )


# ---------------------------------------------------------------------------
# Round 3: the remaining TPC-H shapes (Q2,4,6,7,8,9,11,13,15,17,20,21,22),
# adapted to the fixture schema — no partsupp table (the distinct
# (l_partkey, l_suppkey) relation from lineitem stands in, as in x08), no
# commit/receipt dates (ship-vs-order-date lag stands in for lateness, as
# in x05), p_retailprice stands in for ps_supplycost.  Determinism: revenue
# sums ride DECIMAL(18,4) (associative — partial-agg order can't change
# them); per-row double arithmetic (unit costs, thresholds) is identical
# IEEE ops in both engines; ratios are rounded.


@q(
    "x09_min_cost_supplier",
    """WITH ps AS (
         SELECT l_partkey, l_suppkey,
                min(l_extendedprice / l_quantity) AS unit_cost
         FROM lineitem GROUP BY l_partkey, l_suppkey),
       best AS (
         SELECT l_partkey, min(unit_cost) AS min_cost
         FROM ps GROUP BY l_partkey)
       SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
              round(ps.unit_cost, 6) AS unit_cost
       FROM ps
       JOIN best b ON ps.l_partkey = b.l_partkey AND ps.unit_cost = b.min_cost
       JOIN part p ON p.p_partkey = ps.l_partkey
       JOIN supplier s ON s.s_suppkey = ps.l_suppkey
       JOIN nation n ON n.n_nationkey = s.s_nationkey
       JOIN region r ON r.r_regionkey = n.n_regionkey
       WHERE p.p_size BETWEEN 10 AND 30 AND p.p_type = 'STANDARD'
         AND r.r_name = 'EUROPE'
       ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
       LIMIT 20""",
)
def x09(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier): the correlated-min subquery
    becomes a per-part min over the distilled part-supplier cost relation,
    joined back on (part, cost) equality.  Both "joins back" reuse the same
    shuffled ps relation (one scan of lineitem); part/supplier/nation/
    region all broadcast.  min() over identically-computed doubles is
    bit-exact, so the float equality join is deterministic."""
    t = tables(spark, sf_dir)
    ps = (
        t("lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
    )
    best = ps.groupBy(F.col("l_partkey").alias("__pk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = t("part").filter(
        F.col("p_size").between(10, 30) & (F.col("p_type") == "STANDARD")
    )
    r = t("region").filter(F.col("r_name") == "EUROPE")
    n = t("nation").join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    s = t("supplier").join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    return (
        ps.join(
            best,
            (ps.l_partkey == best.__pk) & (ps.unit_cost == best.min_cost),
        )
        .join(p, F.col("p_partkey") == ps.l_partkey)
        .join(s, F.col("s_suppkey") == ps.l_suppkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@q(
    "x10_order_priority_check",
    """SELECT o.o_orderpriority, count(*) AS order_count
       FROM orders o
       WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
         AND o.o_orderdate < TIMESTAMP '1997-10-01'
         AND EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_shipdate > o.o_orderdate + INTERVAL 80 DAY)
       GROUP BY o.o_orderpriority
       ORDER BY o.o_orderpriority""",
)
def x10(spark, sf_dir):
    """TPC-H Q4 shape: EXISTS with a cross-table predicate (a lineitem
    shipped >80 days after its order date) → left-semi join with the
    composite condition; the date window pushes into the orders scan and
    prunes before the join."""
    t = tables(spark, sf_dir)
    o = t("orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    l = t("lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            l,
            (F.col("o_orderkey") == F.col("l_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 80 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@q(
    "x11_forecast_revenue",
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
              count(*) AS n_items
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1997-01-01'
         AND l_shipdate < TIMESTAMP '1998-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)
def x11(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-aggregate — every predicate pushes
    to the parquet scan (date + two numeric ranges), no join, one
    partial+final agg.  The canary for predicate pushdown staying intact."""
    t = tables(spark, sf_dir)
    return (
        t("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast(REV_DEC)
                * F.col("l_discount").cast(REV_DEC)
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@q(
    "x12_nation_volume",
    """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
              year(l.l_shipdate) AS l_year,
              CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                       * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                  AS revenue
       FROM lineitem l
       JOIN orders o ON o.o_orderkey = l.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
       JOIN supplier s ON s.s_suppkey = l.l_suppkey
       JOIN nation sn ON sn.n_nationkey = s.s_nationkey
       JOIN nation cn ON cn.n_nationkey = c.c_nationkey
       WHERE ((sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
           OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3'))
         AND l.l_shipdate >= TIMESTAMP '1996-01-01'
         AND l.l_shipdate < TIMESTAMP '1998-01-01'
       GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
       ORDER BY supp_nation, cust_nation, l_year""",
)
def x12(spark, sf_dir):
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.
    The disjunctive nation-pair predicate lands after both dimension chains
    join in; supplier+nation broadcast, the orders→customer chain shuffles
    once on the fact keys."""
    t = tables(spark, sf_dir)
    n = t("nation").select("n_nationkey", "n_name")
    s = t("supplier").join(
        F.broadcast(n.withColumnRenamed("n_name", "supp_nation")),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    c = t("customer").join(
        F.broadcast(n.withColumnRenamed("n_name", "cust_nation")),
        F.col("c_nationkey") == F.col("n_nationkey"),
    ).select("c_custkey", "cust_nation")
    l = t("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        l.join(t("orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@q(
    "x13_market_share",
    """SELECT year(o.o_orderdate) AS o_year,
              round(
                CAST(sum(CASE WHEN sn.n_name = 'NATION_3'
                         THEN CAST(l.l_extendedprice AS DECIMAL(18,4))
                              * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
                         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                / CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                           * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE),
                6) AS mkt_share
       FROM lineitem l
       JOIN orders o ON o.o_orderkey = l.l_orderkey
       JOIN customer c ON c.c_custkey = o.o_custkey
       JOIN nation cn ON cn.n_nationkey = c.c_nationkey
       JOIN region r ON r.r_regionkey = cn.n_regionkey
       JOIN supplier s ON s.s_suppkey = l.l_suppkey
       JOIN nation sn ON sn.n_nationkey = s.s_nationkey
       JOIN part p ON p.p_partkey = l.l_partkey
       WHERE r.r_name = 'AMERICA' AND p.p_type = 'PROMO'
         AND o.o_orderdate >= TIMESTAMP '1996-01-01'
         AND o.o_orderdate < TIMESTAMP '1998-01-01'
       GROUP BY year(o.o_orderdate)
       ORDER BY o_year""",
)
def x13(spark, sf_dir):
    """TPC-H Q8 shape: one nation's share of a region's market for one part
    type, by year — conditional-sum ÷ total-sum in a single partial+final
    agg (one pass, no self-join).  All dimensions broadcast; the region and
    part-type filters prune their chains before touching the fact."""
    t = tables(spark, sf_dir)
    r = t("region").filter(F.col("r_name") == "AMERICA")
    cn = t("nation").join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    c = t("customer").join(
        F.broadcast(cn), F.col("c_nationkey") == F.col("n_nationkey")
    ).select("c_custkey")
    sn = t("nation").select(
        F.col("n_nationkey").alias("__snk"), F.col("n_name").alias("supp_nation")
    )
    s = t("supplier").join(
        F.broadcast(sn), F.col("s_nationkey") == F.col("__snk")
    ).select("s_suppkey", "supp_nation")
    p = t("part").filter(F.col("p_type") == "PROMO").select("p_partkey")
    o = t("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    nation_rev = F.when(F.col("supp_nation") == "NATION_3", _revenue()).otherwise(
        F.lit(0).cast(REV_DEC)
    )
    return (
        t("lineitem")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(nation_rev).cast("double") / F.sum(_revenue()).cast("double"), 6
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@q(
    "x14_product_profit",
    """SELECT n.n_name, year(o.o_orderdate) AS o_year,
              CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                            - 0.6 * l.l_quantity * p.p_retailprice
                            AS DECIMAL(18,4))) AS DOUBLE) AS profit
       FROM lineitem l
       JOIN orders o ON o.o_orderkey = l.l_orderkey
       JOIN supplier s ON s.s_suppkey = l.l_suppkey
       JOIN nation n ON n.n_nationkey = s.s_nationkey
       JOIN part p ON p.p_partkey = l.l_partkey
       WHERE p.p_name LIKE '%widget'
       GROUP BY n.n_name, year(o.o_orderdate)
       ORDER BY n.n_name, o_year""",
)
def x14(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit): per-row profit = revenue minus
    a 0.6×qty×retailprice cost stand-in (no ps_supplycost in the fixture),
    computed in DOUBLE per row (identical IEEE ops both engines), cast to
    DECIMAL(18,4) only for the associative sum.  The name-suffix LIKE
    prunes part before it broadcasts."""
    t = tables(spark, sf_dir)
    p = t("part").filter(F.col("p_name").like("%widget")).select(
        "p_partkey", "p_retailprice"
    )
    profit = (
        F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
        - F.lit(0.6) * F.col("l_quantity") * F.col("p_retailprice")
    ).cast(REV_DEC)
    return (
        t("lineitem")
        .join(t("orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(t("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(t("nation")), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(profit).cast("double").alias("profit"))
        .orderBy("n_name", "o_year")
    )


@q(
    "x15_important_parts",
    """WITH val AS (
         SELECT l_partkey,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                         * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                    AS part_value
         FROM lineitem GROUP BY l_partkey),
       tot AS (SELECT CAST(sum(CAST(part_value AS DECIMAL(18,4))) AS DOUBLE)
                          AS total,
                      CAST(count(*) AS DOUBLE) AS n
               FROM val)
       SELECT v.l_partkey, round(v.part_value, 4) AS part_value
       FROM val v, tot
       WHERE v.part_value > 1.6 * tot.total / tot.n
       ORDER BY round(v.part_value, 4) DESC, v.l_partkey
       LIMIT 30""",
)
def x15(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-part value filtered against
    the GLOBAL mean part value — the scalar subquery is a 1-row global
    agg crossJoin-broadcast against the per-part aggregate, so the fact
    scans once and nothing collects to the driver.

    The threshold is RELATIVE (1.6× the mean part value), not TPC-H's
    fixed fraction of the total: Q11's ``0.0001/SF`` is scale-dependent
    by spec, and a frozen fraction degenerates as |parts| grows — at
    sf0.1 no single part reaches 0.08% of the corpus total and the old
    form returned 0 rows (caught by the r6 empty-result guard). The mean
    form is scale-free: a constant fraction of parts clears 1.6× mean at
    any SF. Exactness: both engines build per-part values from exact
    decimal sums, re-sum THOSE through the same decimal lattice for the
    total (order-free across partitions), and compare the identical
    doubles against the identically-ordered expression (1.6·total)/n —
    so the predicate can't flip between engines; the ORDER BY ranks the
    4-dp-rounded value in both, tie-broken by partkey (a total order),
    so the LIMIT boundary is deterministic too."""
    t = tables(spark, sf_dir)
    val = (
        t("lineitem")
        .groupBy("l_partkey")
        .agg(F.sum(_revenue()).cast("double").alias("part_value"))
    )
    # decimal re-sum of the per-part doubles keeps the global total
    # associative too (Spark reduces across partitions, DuckDB serially)
    tot = val.agg(
        F.sum(F.col("part_value").cast(REV_DEC)).cast("double").alias("total"),
        F.count("*").cast("double").alias("n"),
    )
    return (
        val.crossJoin(F.broadcast(tot))
        .filter(
            F.col("part_value") > F.lit(1.6) * F.col("total") / F.col("n")
        )
        .select("l_partkey", F.round("part_value", 4).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
        .limit(30)
    )


@q(
    "x16_customer_distribution",
    """SELECT c_count, count(*) AS custdist
       FROM (SELECT c.c_custkey, count(o.o_orderkey) AS c_count
             FROM customer c
             LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                  AND o.o_orderpriority <> '1-URGENT'
             GROUP BY c.c_custkey) counts
       GROUP BY c_count
       ORDER BY custdist DESC, c_count DESC""",
)
def x16(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): left join with
    an extra join-side predicate (the filter belongs in the ON clause, not
    WHERE — a WHERE would silently drop zero-order customers), count per
    customer including the nulls, then a second tiny agg over the counts."""
    t = tables(spark, sf_dir)
    o = t("orders").filter(F.col("o_orderpriority") != "1-URGENT").select(
        "o_custkey", "o_orderkey"
    )
    return (
        t("customer")
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@q(
    "x17_top_supplier",
    """WITH rev AS (
         SELECT l_suppkey,
                CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))
                         * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                    AS total_revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1997-04-01'
         GROUP BY l_suppkey)
       SELECT s.s_suppkey, s.s_name, r.total_revenue
       FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
       WHERE r.total_revenue = (SELECT max(total_revenue) FROM rev)
       ORDER BY s.s_suppkey""",
)
def x17(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): quarterly revenue per supplier, keep
    the one(s) hitting the scalar max.  The rev CTE computes once and feeds
    both the max and the final filter (Spark: same DataFrame object reused;
    AQE dedups the exchange).  Decimal sums make the double equality
    deterministic in both engines."""
    t = tables(spark, sf_dir)
    rev = (
        t("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_revenue()).cast("double").alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(t("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@q(
    "x18_small_quantity_revenue",
    """WITH pa AS (
         SELECT l_partkey,
                CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                  / count(*) AS avg_qty
         FROM lineitem GROUP BY l_partkey)
       SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
                AS avg_yearly,
              count(*) AS n_items
       FROM lineitem l
       JOIN part p ON p.p_partkey = l.l_partkey
       JOIN pa ON pa.l_partkey = l.l_partkey
       WHERE p.p_brand = 'Brand#13' AND p.p_size <= 25
         AND l.l_quantity < 0.2 * pa.avg_qty""",
)
def x18(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity orders): the correlated per-part
    average becomes a grouped aggregate joined back to the fact; the
    brand/size filter prunes part before broadcast.  avg is an exact
    decimal sum over one double division — identical in both engines, so
    the 0.2×avg threshold compares bitwise."""
    t = tables(spark, sf_dir)
    pa = (
        t("lineitem")
        .groupBy(F.col("l_partkey").alias("__pk"))
        .agg(
            (
                F.sum(F.col("l_quantity").cast(REV_DEC)).cast("double")
                / F.count("*")
            ).alias("avg_qty")
        )
    )
    p = t("part").filter((F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 25))
    return (
        t("lineitem")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(pa, F.col("__pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(REV_DEC)).cast("double") / F.lit(7.0)
            ).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@q(
    "x19_part_promotion_suppliers",
    """WITH shipped AS (
         SELECT l_suppkey, l_partkey, sum(l_quantity) AS qty
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1997-01-01'
           AND l_shipdate < TIMESTAMP '1998-01-01'
         GROUP BY l_suppkey, l_partkey)
       SELECT s.s_name, s.s_acctbal
       FROM supplier s
       JOIN nation n ON n.n_nationkey = s.s_nationkey
       JOIN region r ON r.r_regionkey = n.n_regionkey
       WHERE r.r_name = 'ASIA'
         AND EXISTS (SELECT 1 FROM shipped sh
                     JOIN part p ON p.p_partkey = sh.l_partkey
                     WHERE sh.l_suppkey = s.s_suppkey
                       AND p.p_name LIKE '%widget' AND sh.qty > 50)
       ORDER BY s.s_name""",
)
def x19(spark, sf_dir):
    """TPC-H Q20 shape (part-promotion suppliers): nested EXISTS chain —
    suppliers in one region who shipped >50 units of a name-matched part
    family in a year.  The inner aggregate reduces lineitem to per-
    (supplier, part) quantities BEFORE any join; the part-name filter
    broadcasts into it; the outer EXISTS is a left-semi on the thin
    qualifying-supplier set."""
    t = tables(spark, sf_dir)
    shipped = (
        t("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
    )
    p = t("part").filter(F.col("p_name").like("%widget")).select("p_partkey")
    qualifying = shipped.join(
        p, F.col("p_partkey") == F.col("l_partkey"), "left_semi"
    ).select("l_suppkey")
    r = t("region").filter(F.col("r_name") == "ASIA")
    n = t("nation").join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
    return (
        t("supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@q(
    "x20_waiting_suppliers",
    """WITH late AS (
         SELECT l.l_orderkey, l.l_suppkey
         FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
         WHERE o.o_orderstatus = 'F'
           AND l.l_shipdate > o.o_orderdate + INTERVAL 100 DAY)
       SELECT s.s_name, count(*) AS numwait
       FROM late l1
       JOIN supplier s ON s.s_suppkey = l1.l_suppkey
       WHERE EXISTS (SELECT 1 FROM lineitem l2
                     WHERE l2.l_orderkey = l1.l_orderkey
                       AND l2.l_suppkey <> l1.l_suppkey)
         AND NOT EXISTS (SELECT 1 FROM late l3
                         WHERE l3.l_orderkey = l1.l_orderkey
                           AND l3.l_suppkey <> l1.l_suppkey)
       GROUP BY s.s_name
       ORDER BY numwait DESC, s.s_name
       LIMIT 20""",
)
def x20(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the sole late
    supplier on multi-supplier finished orders.  EXISTS → left-semi with a
    suppkey-inequality condition; NOT EXISTS → left-anti against the same
    late relation it feeds (computed once, reused — one lineitem×orders
    join for both sides)."""
    t = tables(spark, sf_dir)
    o = t("orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    late = (
        t("lineitem")
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 100 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    l2 = t("lineitem").select(
        F.col("l_orderkey").alias("__ok2"), F.col("l_suppkey").alias("__sk2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("__ok3"), F.col("l_suppkey").alias("__sk3")
    )
    return (
        late.join(
            l2,
            (F.col("__ok2") == F.col("l_orderkey"))
            & (F.col("__sk2") != F.col("l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("__ok3") == F.col("l_orderkey"))
            & (F.col("__sk3") != F.col("l_suppkey")),
            "left_anti",
        )
        .join(t("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@q(
    "x21_dormant_customers",
    """WITH avg_bal AS (
         SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / count(*)
                  AS ab
         FROM customer WHERE c_acctbal > 0)
       SELECT right(c.c_name, 1) AS code,
              count(*) AS numcust,
              CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
       FROM customer c, avg_bal
       WHERE c.c_acctbal > avg_bal.ab
         AND NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderdate >= TIMESTAMP '2000-01-01')
       GROUP BY right(c.c_name, 1)
       ORDER BY code""",
)
def x21(spark, sf_dir):
    """TPC-H Q22 shape (global sales opportunity): above-average-balance
    customers with no recent orders, grouped by a name-derived code.  The
    scalar average crossJoin-broadcasts; NOT EXISTS is a left-anti against
    the date-filtered orders (filter pushed to the scan); exact decimal
    average makes the threshold deterministic."""
    t = tables(spark, sf_dir)
    avg_bal = (
        t("customer")
        .filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast(REV_DEC)).cast("double") / F.count("*")
            ).alias("ab")
        )
    )
    recent = t("orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    ).select("o_custkey")
    return (
        t("customer")
        .crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy(F.col("c_name").substr(F.length("c_name"), F.lit(1)).alias("code"))
        .agg(
            F.count("*").alias("numcust"),
            F.sum(F.col("c_acctbal").cast(REV_DEC)).cast("double").alias("totacctbal"),
        )
        .orderBy("code")
    )


# ---------------------------------------------------------------------------
# Event-analytics composites over the events table — the funnel/retention
# queries the reference's time-series users (README.md:92-101) actually run.


@q(
    "x22_conversion_funnel",
    """WITH first_signup AS (
         SELECT user_id, min(ts) AS signup_ts
         FROM events WHERE event_type = 'signup' GROUP BY user_id),
       first_purchase AS (
         SELECT f.user_id, min(e.ts) AS purchase_ts
         FROM first_signup f
         JOIN events e ON e.user_id = f.user_id
              AND e.event_type = 'purchase' AND e.ts > f.signup_ts
         GROUP BY f.user_id)
       SELECT f.user_id,
              epoch_us(f.signup_ts) AS signup_us,
              CAST(p.user_id IS NOT NULL AS INT) AS converted,
              CAST(CASE WHEN p.user_id IS NOT NULL
                   THEN (epoch_us(p.purchase_ts) - epoch_us(f.signup_ts)) // 60000000
                   END AS BIGINT) AS minutes_to_convert
       FROM first_signup f LEFT JOIN first_purchase p ON f.user_id = p.user_id
       ORDER BY f.user_id""",
)
def x22(spark, sf_dir):
    """Conversion funnel: first signup → first subsequent purchase per
    user.  Two aggregates over one events re-key (both stages group by
    user_id, so AQE reuses the partitioning); the conditional-min pattern
    avoids any self-join of the raw fact."""
    t = tables(spark, sf_dir)
    e = t("events")
    first_signup = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    first_purchase = (
        e.filter(F.col("event_type") == "purchase")
        .join(first_signup, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        first_signup.join(
            first_purchase.withColumnRenamed("user_id", "__pu"),
            F.col("user_id") == F.col("__pu"),
            "left",
        )
        .select(
            "user_id",
            F.unix_micros("signup_ts").alias("signup_us"),
            F.col("__pu").isNotNull().cast("int").alias("converted"),
            F.floor(
                (F.unix_micros("purchase_ts") - F.unix_micros("signup_ts"))
                / F.lit(60_000_000)
            ).cast("long").alias("minutes_to_convert"),
        )
        .orderBy("user_id")
    )


@q(
    "x23_cohort_retention",
    """WITH cohort AS (
         SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
         FROM events GROUP BY user_id),
       activity AS (
         SELECT DISTINCT e.user_id, c.cohort_day,
                datediff('day', c.cohort_day, CAST(e.ts AS DATE)) AS day_offset
         FROM events e JOIN cohort c ON e.user_id = c.user_id)
       SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
              day_offset,
              count(*) AS active_users
       FROM activity
       GROUP BY cohort_day, day_offset
       ORDER BY cohort_day, day_offset""",
)
def x23(spark, sf_dir):
    """Cohort retention: users grouped by first-seen day, counted on each
    subsequent active day.  cohort assignment and the distinct-activity
    re-key both group on user_id; the final (cohort, offset) aggregate is
    tiny (days²).  The broadcast of the per-user cohort table is
    AQE-decided (user dimension scales with the corpus)."""
    t = tables(spark, sf_dir)
    e = t("events")
    cohort = e.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    activity = (
        e.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_day", "day_offset")
        .agg(F.count("*").alias("active_users"))
        .select(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            "day_offset",
            "active_users",
        )
        .orderBy("cohort_day", "day_offset")
    )


@q(
    "x24_market_basket",
    """WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
       SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
              count(*) AS n_orders
       FROM items a JOIN items b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY a.l_partkey, b.l_partkey
       HAVING count(*) >= 2
       ORDER BY n_orders DESC, part_a, part_b
       LIMIT 30""",
)
def x24(spark, sf_dir):
    """Market-basket co-occurrence: part pairs appearing in the same order
    at least twice, top-30.  The self-join is keyed on the order — pair
    volume is Σ order-size² (orders hold ~4-7 items), never corpus²; the
    distinct pass first collapses duplicate (order, part) lines so a part
    repeated within one order can't inflate its own pair count."""
    t = tables(spark, sf_dir)
    items = t("lineitem").select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey"), F.col("l_partkey").alias("part_a"))
    b = items.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("part_b")
    )
    return (
        a.join(b, (F.col("l_orderkey") == F.col("__ok")) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(30)
    )


@q(
    "x25_order_gap",
    """WITH g AS (
         SELECT o_custkey,
                datediff('day',
                         lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                ORDER BY o_orderdate, o_orderkey),
                         o_orderdate) AS gap
         FROM orders)
       SELECT o_custkey,
              CAST(count(gap) AS BIGINT) AS n_gaps,
              round(CAST(sum(gap) AS BIGINT) / count(gap), 6) AS avg_gap_days,
              CAST(max(gap) AS BIGINT) AS max_gap_days
       FROM g WHERE gap IS NOT NULL GROUP BY o_custkey""",
)
def x25(spark, sf_dir):
    """Composite: inter-purchase cadence — per customer, the average and
    maximum day gap between consecutive orders (churn-signal staple).
    One window re-key on custkey + the reuse of that partitioning by the
    final aggregate; integer day arithmetic keeps the average exact."""
    from pyspark.sql import Window as W

    o = tables(spark, sf_dir)("orders")
    prev = F.lag("o_orderdate").over(
        W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    )
    g = o.select(
        "o_custkey", F.datediff(F.col("o_orderdate"), prev).alias("gap")
    ).filter(F.col("gap").isNotNull())
    return g.groupBy("o_custkey").agg(
        F.count("gap").alias("n_gaps"),
        F.round(F.sum(F.col("gap").cast("long")) / F.count("gap"), 6).alias("avg_gap_days"),
        F.max("gap").cast("long").alias("max_gap_days"),
    )


@q(
    "x26_revenue_concentration",
    """WITH r AS (SELECT o_custkey,
                         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS rev
                  FROM orders GROUP BY o_custkey),
         ranked AS (SELECT o_custkey, rev,
                           ntile(10) OVER (ORDER BY rev DESC, o_custkey) AS decile
                    FROM r)
       SELECT decile, CAST(count(*) AS BIGINT) AS n_customers,
              CAST(sum(CAST(rev AS DECIMAL(18,4))) AS DOUBLE) AS decile_revenue
       FROM ranked GROUP BY decile""",
)
def x26(spark, sf_dir):
    """Composite: revenue concentration (Pareto) — customers ranked into
    deciles by lifetime revenue, revenue mass per decile, via
    ``scale.exact_ntile``'s auto-switch (VERDICT r5 #7): at fixture scale
    the customer aggregate fits one window task, so the tier IS the SQL
    oracle's global ntile; above the bound it composes
    ``scale.global_row_index`` + closed-form bucket arithmetic — same
    membership, no unbounded single-partition window (plan-pinned in
    tests/test_plans.py). If exact decile MEMBERSHIP is not required, the
    cheapest 100 TB form remains approx_percentile boundary binning
    (c77's pattern). Revenue is decimal-exact so decile boundaries are
    engine-independent."""
    from .. import scale

    o = tables(spark, sf_dir)("orders")
    r = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(REV_DEC)).cast("double").alias("rev")
    )
    ranked = scale.exact_ntile(
        r, [F.col("rev").desc(), F.col("o_custkey")], 10, bucket_col="decile"
    )
    return ranked.groupBy("decile").agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("rev").cast(REV_DEC)).cast("double").alias("decile_revenue"),
    )


@q(
    "x27_event_paths",
    """WITH seq AS (
         SELECT user_id, event_type,
                lead(event_type, 1) OVER w AS e2,
                lead(event_type, 2) OVER w AS e3
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT event_type || '>' || e2 || '>' || e3 AS path, count(*) AS n
       FROM seq WHERE e3 IS NOT NULL
       GROUP BY 1 ORDER BY n DESC, path LIMIT 20""",
)
def x27(spark, sf_dir):
    """Event-analytics composite: top 20 three-step behavior paths — the
    clickstream n-gram census behind funnel discovery. One window re-key by
    user (lead ×2, deterministic ts+event_id order), then a partial+final
    count agg and a TakeOrdered 20-row driver merge — no global sort, two
    exchanges total at any scale."""
    from pyspark.sql import Window as W

    e = tables(spark, sf_dir)("events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        seq.select(F.concat_ws(">", "event_type", "e2", "e3").alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(20)
    )


@q(
    "x28_brand_revenue_trend",
    """WITH monthly AS (
         SELECT p.p_type AS brand,
                date_trunc('month', o.o_orderdate) AS mon,
                CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount)
                              AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
                         JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1, 2),
       r AS (SELECT brand, CAST(revenue AS DECIMAL(18,4)) AS y,
                    row_number() OVER (PARTITION BY brand ORDER BY mon) AS x
             FROM monthly),
       a AS (SELECT brand,
                    CAST(count(*) AS DECIMAL(10,0)) AS n,
                    CAST(sum(x) AS DECIMAL(19,0)) AS sx,
                    CAST(sum(y) AS DECIMAL(19,4)) AS sy,
                    CAST(sum(x * y) AS DECIMAL(24,4)) AS sxy,
                    CAST(sum(CAST(x AS BIGINT) * x) AS DECIMAL(24,0)) AS sxx
             FROM r GROUP BY 1)
       SELECT brand, CAST(n AS BIGINT) AS n,
              round(CAST(n*sxy - sx*sy AS DOUBLE)
                    / CAST(n*sxx - sx*sx AS DOUBLE), 6) + 0.0 AS slope,
              round((CAST(sy AS DOUBLE)
                     - CAST(n*sxy - sx*sy AS DOUBLE)
                       / CAST(n*sxx - sx*sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    / CAST(n AS DOUBLE), 6) + 0.0 AS intercept
       FROM a""",
)
def x28(spark, sf_dir):
    """Composite: which product types are trending? Monthly revenue per
    p_type (3-table join, decimal-exact sum), then stats.group_regression
    over the month sequence — the operator-composition story: a corpus
    operator consumed by another operator, dims broadcast, one row per
    brand out."""
    from ..stats import group_regression

    t = tables(spark, sf_dir)
    li, o, p = t("lineitem"), t("orders"), t("part")
    monthly = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            F.col("p_type").alias("brand"),
            F.date_trunc("month", "o_orderdate").alias("mon"),
        )
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue")
        )
    )
    return group_regression(monthly, "revenue", "mon", ["brand"])


@q(
    "x29_customer_rfm",
    """WITH base AS (
         SELECT o_custkey AS custkey,
                date_diff('day', DATE '1970-01-01', max(o_orderdate)) AS recency_days,
                count(*) AS frequency,
                CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS monetary
         FROM orders GROUP BY 1),
       b AS (
         SELECT quantile_cont(recency_days, 0.25) AS r1,
                quantile_cont(recency_days, 0.50) AS r2,
                quantile_cont(recency_days, 0.75) AS r3,
                quantile_cont(frequency, 0.25) AS f1,
                quantile_cont(frequency, 0.50) AS f2,
                quantile_cont(frequency, 0.75) AS f3,
                quantile_cont(monetary, 0.25) AS m1,
                quantile_cont(monetary, 0.50) AS m2,
                quantile_cont(monetary, 0.75) AS m3
         FROM base)
       SELECT custkey, frequency, round(monetary, 4) AS monetary,
              CAST(CASE WHEN recency_days > r3 THEN 4
                        WHEN recency_days > r2 THEN 3
                        WHEN recency_days > r1 THEN 2 ELSE 1 END AS INT) AS r_score,
              CAST(CASE WHEN frequency > f3 THEN 4
                        WHEN frequency > f2 THEN 3
                        WHEN frequency > f1 THEN 2 ELSE 1 END AS INT) AS f_score,
              CAST(CASE WHEN monetary > m3 THEN 4
                        WHEN monetary > m2 THEN 3
                        WHEN monetary > m1 THEN 2 ELSE 1 END AS INT) AS m_score
       FROM base, b""",
)
def x29(spark, sf_dir):
    """Composite: RFM customer segmentation — quartile-BOUNDARY scores
    (4 = best), NOT global ntile windows: three ntile(4)s over the
    per-customer aggregate would funnel every customer through ONE task's
    sort (TPC-H sf100k has ~15B customers — unbounded). Instead the c77
    pattern: one 1-row percentile aggregate broadcasts the nine quartile
    boundaries back and the scoring is a codegen'd CASE riding the agg
    output — zero extra shuffles, no single-partition Window. (At 100 TB
    swap percentile → approx_percentile: exact quantile state grows with
    distinct values; the boundary contract stays the same.)"""
    from .._scratch import scratch_persist

    o = tables(spark, sf_dir)("orders")
    base = scratch_persist(
        o.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.datediff(F.max("o_orderdate"), F.lit("1970-01-01")).alias("recency_days"),
            F.count("*").alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("monetary"),
        ),
        "x29/base",  # feeds both the boundary agg and the scored output — persist or the orders agg shuffles twice
    )
    b = base.agg(
        *[
            F.expr(f"percentile({c}, {p})").alias(f"{c[0]}{i}")
            for c in ("recency_days", "frequency", "monetary")
            for i, p in ((1, 0.25), (2, 0.50), (3, 0.75))
        ]
    )

    def score(col, pfx):
        v = F.col(col)
        return (
            F.when(v > F.col(f"{pfx}3"), 4)
            .when(v > F.col(f"{pfx}2"), 3)
            .when(v > F.col(f"{pfx}1"), 2)
            .otherwise(1)
            .cast("int")
        )

    return base.crossJoin(F.broadcast(b)).select(
        "custkey",
        "frequency",
        F.round("monetary", 4).alias("monetary"),
        score("recency_days", "r").alias("r_score"),
        score("frequency", "f").alias("f_score"),
        score("monetary", "m").alias("m_score"),
    )


@q(
    "x30_supplier_scorecard",
    """WITH base AS (
         SELECT l_suppkey,
                CAST(sum(CAST(l_extendedprice * (1 - l_discount)
                              AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
                count(*) AS n_lines,
                CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
                    AS n_returned
         FROM lineitem GROUP BY 1)
       SELECT s.s_name, round(b.revenue, 4) AS revenue, b.n_lines,
              round(CAST(b.n_returned AS DOUBLE) / b.n_lines, 6) AS return_rate,
              rank() OVER (ORDER BY b.revenue DESC, s.s_name) AS revenue_rank
       FROM base b JOIN supplier s ON b.l_suppkey = s.s_suppkey
       ORDER BY revenue_rank LIMIT 25""",
)
def x30(spark, sf_dir):
    """Composite: supplier scorecard — revenue, line volume, return rate,
    revenue rank in one frame (the multi-metric entity-health report).
    Fact aggregates ONCE (all three metrics share the partial+final agg);
    the supplier join is UNHINTED — supplier scales with SF, so AQE
    broadcasts while it fits and shuffle-joins beyond (the d05_tfidf
    convention; a mandatory hint is a driver OOM at 100×). The rank is computed AFTER the top-25 cut:
    (revenue DESC, s_name) is a total order, so rank()==row_number() and
    ranking the TakeOrdered 25 equals ranking everything first — a global
    rank window over the supplier dimension would single-task a sort that
    is NOT bounded at 100× (TPC-H sf100k ≈ 1B suppliers; same class as
    x29's ntile fix). The only single-partition work is over 25 rows."""
    from pyspark.sql import Window as W

    t = tables(spark, sf_dir)
    li, s = t("lineitem"), t("supplier")
    base = li.groupBy("l_suppkey").agg(
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_lines"),
        F.count(F.when(F.col("l_returnflag") == "R", 1)).alias("n_returned"),
    )
    j = base.join(s, base.l_suppkey == s.s_suppkey)
    top = (
        j.select(
            "s_name",
            F.round("revenue", 4).alias("revenue"),
            "n_lines",
            F.round(F.col("n_returned").cast("double") / F.col("n_lines"), 6).alias(
                "return_rate"
            ),
        )
        .orderBy(F.col("revenue").desc(), "s_name")
        .limit(25)  # TakeOrderedAndProject — k-row driver merge, no global sort
    )
    return top.withColumn(
        "revenue_rank",
        F.rank().over(W.orderBy(F.col("revenue").desc(), "s_name")),
    )


@q(
    "x31_reorder_rate",
    """WITH pur AS (
         SELECT o.o_custkey, l.l_partkey, count(DISTINCT l.l_orderkey) AS n_orders
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
         GROUP BY 1, 2),
       pb AS (SELECT p_partkey, p_brand FROM part)
       SELECT pb.p_brand,
              CAST(count(*) AS BIGINT) AS n_cust_part_pairs,
              CAST(count(*) FILTER (WHERE pur.n_orders >= 2) AS BIGINT) AS n_repeat,
              round(count(*) FILTER (WHERE pur.n_orders >= 2)::DOUBLE / count(*), 6)
                  AS reorder_rate
       FROM pur JOIN pb ON pur.l_partkey = pb.p_partkey
       GROUP BY pb.p_brand""",
)
def x31(spark, sf_dir):
    """Composite (r5): repeat-purchase rate per brand — fraction of
    (customer, part) pairs ordered in ≥2 distinct orders (the retention
    metric behind replenishment forecasting). The fact join re-keys
    lineitem on orderkey once (orders carries only custkey), the
    (cust, part) aggregate is the only corpus-sized shuffle; the part
    join is UNHINTED (part scales with SF — AQE decides)."""
    t = tables(spark, sf_dir)
    li, o, p = t("lineitem"), t("orders"), t("part")
    pur = (
        li.join(o.select("o_orderkey", "o_custkey"), li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey", "l_partkey")
        .agg(F.countDistinct("l_orderkey").alias("n_orders"))
    )
    repeat = F.count(F.when(F.col("n_orders") >= 2, 1))
    return (
        pur.join(p.select("p_partkey", "p_brand"),
                 pur.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_cust_part_pairs"),
            repeat.alias("n_repeat"),
            F.round(repeat.cast("double") / F.count("*"), 6).alias("reorder_rate"),
        )
    )


@q(
    "x32_supplier_lead_time",
    """WITH lt AS (
         SELECT l.l_suppkey,
                date_diff('day', o.o_orderdate, l.l_shipdate) AS lead_days
         FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
       SELECT s.s_name,
              CAST(count(*) AS BIGINT) AS n_shipments,
              CAST(sum(CAST(lead_days AS DECIMAL(18,4))) AS DOUBLE) / count(*)
                  AS avg_lead_days,
              CAST(min(lead_days) AS BIGINT) AS min_lead_days,
              CAST(max(lead_days) AS BIGINT) AS max_lead_days
       FROM lt JOIN supplier s ON lt.l_suppkey = s.s_suppkey
       GROUP BY s.s_name""",
)
def x32(spark, sf_dir):
    """Composite (r5): supplier lead time — order-to-ship days per supplier
    (the logistics-health scorecard metric). One orderkey re-key join
    (orders projected to two columns), partial+final agg on suppkey, dim
    broadcast for the name; day arithmetic is integer datediff, the mean
    an exact decimal sum over integers."""
    t = tables(spark, sf_dir)
    li, o, s = t("lineitem"), t("orders"), t("supplier")
    lt = li.join(
        o.select("o_orderkey", "o_orderdate"), li.l_orderkey == o.o_orderkey
    ).select(
        "l_suppkey",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lead_days"),
    )
    return (
        lt.groupBy("l_suppkey")
        .agg(
            F.count("*").alias("n_shipments"),
            davg("lead_days").alias("avg_lead_days"),
            F.min("lead_days").cast("long").alias("min_lead_days"),
            F.max("lead_days").cast("long").alias("max_lead_days"),
        )
        .join(s.select("s_suppkey", "s_name"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_name", "n_shipments", "avg_lead_days", "min_lead_days", "max_lead_days")
    )


@q(
    "x33_overlapping_shipments",
    """WITH iv AS (
         SELECT DISTINCT l_suppkey, l_orderkey, l_linenumber,
                date_diff('day', DATE '1970-01-01', l_shipdate) AS ship_d,
                date_diff('day', DATE '1970-01-01', l_shipdate)
                  + 10 + l_partkey % 20 AS receipt_d
         FROM lineitem)
       SELECT s.s_name,
              CAST(count(DISTINCT (a.l_orderkey, a.l_linenumber, a.ship_d, a.receipt_d))
                   AS BIGINT) AS n_intervals,
              CAST(count(*) FILTER (WHERE a.ship_d <= b.receipt_d
                                      AND b.ship_d <= a.receipt_d
                                      AND (a.l_orderkey, a.l_linenumber, a.ship_d, a.receipt_d)
                                          < (b.l_orderkey, b.l_linenumber, b.ship_d, b.receipt_d))
                   AS BIGINT) AS n_overlapping_pairs
       FROM iv a JOIN iv b ON a.l_suppkey = b.l_suppkey
       JOIN supplier s ON a.l_suppkey = s.s_suppkey
       GROUP BY s.s_name""",
)
def x33(spark, sf_dir):
    """Composite (r5): shipment-concurrency report — per supplier, how
    many pairs of its lineitems were in transit simultaneously (closed
    [ship day, ship day + deterministic transit] overlap — the fixture
    carries no receiptdate, so transit = 10 + partkey %% 20 days derives
    one engine-independently). SWEEP-LINE, not a pair join: the
    oracle performs the O(n²) per-supplier self-join; the engine counts
    the identical pairs with one supplier-keyed event window (+1 at ship,
    −1 after receipt — every start sees the already-active count) — one
    exchange, no pair ever materialized, O(n log n) per supplier at any
    scale."""
    from .. import timeseries

    t = tables(spark, sf_dir)
    ship_d = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01")).cast("long")
    # DISTINCT interval tuples: the fixture's (orderkey, linenumber) is
    # NOT unique per supplier, and duplicate tuples would make the
    # oracle's strict-< pair identity undefined — both engines count
    # pairs of distinct (id, interval) rows
    li = t("lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        ship_d.alias("ship_d"),
        (ship_d + 10 + F.col("l_partkey") % 20).alias("receipt_d"),
    ).distinct()
    out = timeseries.overlapping_interval_pairs(
        li, "l_suppkey", "ship_d", "receipt_d",
        id_cols=["l_orderkey", "l_linenumber"],
    )
    return (
        out.join(t("supplier").select("s_suppkey", "s_name"),
                 out.l_suppkey == F.col("s_suppkey"))
        .select("s_name", "n_intervals", "n_overlapping_pairs")
    )


@q(
    "x34_retention_cohorts",
    """WITH a AS (SELECT DISTINCT user_id,
                         (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk
                  FROM events),
       c AS (SELECT user_id, min(wk) AS cohort FROM a GROUP BY 1),
       act AS (SELECT DISTINCT a.user_id, c.cohort, a.wk - c.cohort AS week_offset
               FROM a JOIN c USING (user_id)),
       r AS (SELECT cohort, week_offset, count(*) AS n_active
             FROM act GROUP BY 1, 2),
       s AS (SELECT cohort, n_active AS cohort_size FROM r WHERE week_offset = 0)
       SELECT r.cohort AS cohort_week, CAST(r.week_offset AS BIGINT) AS week_offset,
              CAST(r.n_active AS BIGINT) AS n_active,
              round(r.n_active::DOUBLE / s.cohort_size, 6) AS retention
       FROM r JOIN s USING (cohort)""",
)
def x34(spark, sf_dir):
    """Composite (r6): weekly retention cohorts over the event stream —
    the product-analytics staple: users grouped by first-active week,
    retention = fraction of the cohort active again k weeks later. Week
    index is epoch-day // 7 (pure integer arithmetic — date_trunc('week')
    origins differ between engines). Three aggregations on user/cohort
    keys; the (cohort, offset) matrix and the cohort-size table are
    calendar-bounded (weeks², not data-sized), so the final stitch
    broadcasts at any corpus scale."""
    from .._scratch import scratch_persist

    e = tables(spark, sf_dir)("events")
    wk = F.floor(
        F.datediff(F.to_date("ts"), F.to_date(F.lit("1970-01-01"))) / 7
    ).cast("long")
    # the distinct user-week table feeds the cohort agg AND the activity
    # join; the cohort matrix feeds the size table AND the final stitch —
    # persist both so each subtree's shuffle runs once
    a = scratch_persist(
        e.select("user_id", wk.alias("wk")).distinct(), "x34/user_weeks"
    )
    cohort = a.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    act = (
        a.join(cohort, "user_id")
        .select("user_id", "cohort", (F.col("wk") - F.col("cohort")).alias("week_offset"))
        .distinct()
    )
    r = scratch_persist(
        act.groupBy("cohort", "week_offset").agg(F.count("*").alias("n_active")),
        "x34/cohort_matrix",
    )
    s = r.filter(F.col("week_offset") == 0).select(
        "cohort", F.col("n_active").alias("__size")
    )
    return r.join(F.broadcast(s), "cohort").select(
        F.col("cohort").alias("cohort_week"),
        F.col("week_offset").cast("long").alias("week_offset"),
        F.col("n_active").cast("long").alias("n_active"),
        F.round(F.col("n_active") / F.col("__size"), 6).alias("retention"),
    )


@q(
    "x35_survival_km",
    """WITH life AS (
         SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS first_d,
                max(CAST(o_orderdate AS DATE)) AS last_d
         FROM orders GROUP BY 1),
       m AS (SELECT max(last_d) AS horizon FROM life),
       obs AS (SELECT CAST(l.last_d - l.first_d AS BIGINT) AS duration,
                      CASE WHEN l.last_d < m.horizon - INTERVAL 365 DAY
                           THEN 1 ELSE 0 END AS ev
               FROM life l CROSS JOIN m),
       t AS (SELECT duration,
                    CAST(sum(ev) AS BIGINT) AS d,
                    CAST(sum(1 - ev) AS BIGINT) AS c
             FROM obs GROUP BY 1),
       n AS (SELECT count(*) AS total FROM obs),
       r AS (SELECT t.duration, t.d, t.c,
                    n.total - (sum(t.d + t.c) OVER w - (t.d + t.c)) AS n_risk,
                    CASE WHEN t.d >= n.total - (sum(t.d + t.c) OVER w
                                                - (t.d + t.c))
                         THEN 1 ELSE 0 END AS dies_out,
                    CAST(round(ln(greatest(
                        1.0 - t.d::DOUBLE / (n.total - (sum(t.d + t.c) OVER w
                                                        - (t.d + t.c))),
                        1e-300)), 12) AS DECIMAL(28,12)) AS lnterm
             FROM t CROSS JOIN n
             WINDOW w AS (ORDER BY t.duration
                          ROWS UNBOUNDED PRECEDING))
       SELECT duration, CAST(n_risk AS BIGINT) AS n_risk, d AS n_events,
              c AS n_censored,
              CASE WHEN max(dies_out) OVER (ORDER BY duration
                                            ROWS UNBOUNDED PRECEDING) = 1
                   THEN 0.0
                   ELSE round(exp(CAST(sum(lnterm)
                        OVER (ORDER BY duration ROWS UNBOUNDED PRECEDING)
                        AS DOUBLE)), 6)
              END AS survival
       FROM r""",
)
def x35(spark, sf_dir):
    """Composite (r6): Kaplan–Meier survival estimator over customer
    lifetimes — duration = days between first and last order, an
    observation is a churn EVENT if the customer's last order predates the
    global horizon by >365 days, else right-censored. The product-limit
    estimator S(t) = prod(1 - d_i/n_i) runs as exp(cumsum(ln)) with each ln
    term rounded 12 dp into a DECIMAL accumulator (the d65 PageRank
    discipline — exact, association-free), so Spark's window and the
    oracle's agree bit-for-bit; a cumulative dies-out flag handles the
    S=0 terminal row without ln(0) (Spark nulls non-positive logs, DuckDB
    returns -inf). Scale: the fact scan collapses to one row per customer
    (one shuffle), then to one row per DISTINCT duration — calendar-bounded
    (~2.5k rows at ANY corpus scale), so the ordered cumulative window runs
    on a fixed-size frame; documented single-partition by boundedness."""
    from pyspark.sql import Window as W

    from .._scratch import scratch_persist

    t = tables(spark, sf_dir)
    # per-customer lifetimes feed the horizon scalar AND the duration
    # table; durations feed the event counts AND the risk-set total —
    # persist both so each data-sized shuffle runs once
    life = scratch_persist(
        t("orders").groupBy("o_custkey").agg(
            F.min(F.to_date("o_orderdate")).alias("first_d"),
            F.max(F.to_date("o_orderdate")).alias("last_d"),
        ),
        "x35/lifetimes",
    )
    m = life.agg(F.max("last_d").alias("horizon"))
    obs = scratch_persist(
        life.crossJoin(F.broadcast(m)).select(
            F.datediff("last_d", "first_d").cast("long").alias("duration"),
            F.when(
                F.col("last_d") < F.date_sub(F.col("horizon"), 365), 1
            ).otherwise(0).alias("ev"),
        ),
        "x35/observations",
    )
    tt = obs.groupBy("duration").agg(
        F.sum("ev").cast("long").alias("d"),
        F.sum(1 - F.col("ev")).cast("long").alias("c"),
    )
    n = obs.agg(F.count("*").alias("total"))
    w = W.orderBy("duration").rowsBetween(W.unboundedPreceding, W.currentRow)
    r = tt.crossJoin(F.broadcast(n)).withColumn(
        "n_risk",
        F.col("total")
        - (F.sum(F.col("d") + F.col("c")).over(w) - (F.col("d") + F.col("c"))),
    )
    r = r.withColumn(
        "dies_out", F.when(F.col("d") >= F.col("n_risk"), 1).otherwise(0)
    ).withColumn(
        "lnterm",
        F.round(
            F.log(
                F.greatest(
                    F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"),
                    F.lit(1e-300),
                )
            ),
            12,
        ).cast("decimal(28,12)"),
    )
    return r.select(
        "duration",
        F.col("n_risk").cast("long").alias("n_risk"),
        F.col("d").alias("n_events"),
        F.col("c").alias("n_censored"),
        F.when(F.max("dies_out").over(w) == 1, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.sum("lnterm").over(w).cast("double")), 6)
        )
        .alias("survival"),
    )


@q(
    "x36_revenue_concentration",
    """WITH rev AS (
         SELECT s.s_nationkey, l.l_suppkey,
                CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))
                         * (CAST(1 AS DECIMAL(18,4))
                            - CAST(l.l_discount AS DECIMAL(18,4)))) AS DOUBLE)
                    AS r
         FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
         GROUP BY 1, 2),
       ranked AS (
         SELECT s_nationkey, r,
                row_number() OVER (PARTITION BY s_nationkey
                                   ORDER BY r, l_suppkey) AS i
         FROM rev),
       g AS (SELECT s_nationkey, count(*) AS n,
                    CAST(sum(CAST(r AS DECIMAL(18,4))) AS DOUBLE) AS tot,
                    CAST(sum(CAST(i AS DECIMAL(18,4)) * CAST(r AS DECIMAL(18,4)))
                         AS DOUBLE) AS iw
             FROM ranked GROUP BY 1),
       h AS (SELECT rev.s_nationkey,
                    round(sum(pow(rev.r / g.tot, 2)), 6) AS hhi
             FROM rev JOIN g USING (s_nationkey) GROUP BY 1, g.tot)
       SELECT nn.n_name, CAST(g.n AS BIGINT) AS n_suppliers,
              round(2.0 * g.iw / (g.n * g.tot)
                    - (g.n + 1.0) / g.n, 6) AS gini,
              h.hhi
       FROM g JOIN h USING (s_nationkey)
       JOIN nation nn ON g.s_nationkey = nn.n_nationkey""",
)
def x36(spark, sf_dir):
    """Composite (r6): revenue-concentration audit per nation — Gini
    coefficient (rank-weighted form: 2*sum(i*x_i)/(n*sum x) - (n+1)/n over
    ascending ranks) and Herfindahl–Hirschman index of supplier revenue
    shares. The data-sized work is ONE supplier-keyed aggregation; ranking
    is a nation-partitioned window over the supplier-sized frame (keyed —
    never single-partition), and both statistics come from DECIMAL-exact
    weighted sums, so no rounding is needed until the final 6 dp. The
    per-supplier revenue table feeds the rank agg and the HHI agg —
    scratch-persisted so its shuffle runs once. Scale: suppliers/nation is
    corpus-proportional but the window is keyed on 25 nations; at extreme
    skew the gini sum is still a one-pass partial aggregate."""
    from pyspark.sql import Window as W

    from .._scratch import scratch_persist

    t = tables(spark, sf_dir)
    li = t("lineitem").select("l_suppkey", _revenue().alias("rv"))
    s = t("supplier").select("s_suppkey", "s_nationkey")
    rev = scratch_persist(
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum("rv").cast("double").alias("r")),
        "x36/supplier_revenue",
    )
    ranked = rev.withColumn(
        "i",
        F.row_number().over(
            W.partitionBy("s_nationkey").orderBy("r", "l_suppkey")
        ),
    )
    g = ranked.groupBy("s_nationkey").agg(
        F.count("*").alias("n"),
        F.sum(F.col("r").cast(REV_DEC)).cast("double").alias("tot"),
        F.sum(F.col("i").cast(REV_DEC) * F.col("r").cast(REV_DEC))
        .cast("double")
        .alias("iw"),
    )
    h = (
        rev.join(F.broadcast(g.select("s_nationkey", "tot")), "s_nationkey")
        .groupBy("s_nationkey")
        .agg(F.round(F.sum(F.pow(F.col("r") / F.col("tot"), 2)), 6).alias("hhi"))
    )
    nn = t("nation").select("n_nationkey", "n_name")
    return (
        g.join(h, "s_nationkey")
        .join(F.broadcast(nn), g.s_nationkey == nn.n_nationkey)
        .select(
            "n_name",
            F.col("n").cast("long").alias("n_suppliers"),
            F.round(
                2.0 * F.col("iw") / (F.col("n") * F.col("tot"))
                - (F.col("n") + 1.0) / F.col("n"),
                6,
            ).alias("gini"),
            "hhi",
        )
    )


@q(
    "x37_multitouch_attribution",
    """WITH p AS (SELECT event_id, user_id, ts, value FROM events
                  WHERE event_type = 'purchase'),
       v AS (SELECT event_id, user_id, ts FROM events
             WHERE event_type = 'view'),
       pairs AS (
         SELECT p.event_id AS pid, p.value, v.ts AS v_ts
         FROM p JOIN v ON p.user_id = v.user_id
         WHERE v.ts <= p.ts AND v.ts > p.ts - INTERVAL 7 DAY),
       attr AS (
         SELECT v_ts, value / count(*) OVER (PARTITION BY pid) AS a
         FROM pairs)
       SELECT CAST(CAST(v_ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
              CAST(count(*) AS BIGINT) AS n_touches,
              CAST(sum(CAST(a AS DECIMAL(18,4))) AS DOUBLE) AS attributed
       FROM attr GROUP BY 1""",
)
def x37(spark, sf_dir):
    """Composite (r6): linear multi-touch attribution — every purchase's
    value splits equally across the same user's 'view' events in the
    preceding 7 days; output is attributed revenue per view-day (the
    marketing-analytics counterpart of c58's last-touch interval join).
    ONE user-keyed equi-join produces exactly the attribution pairs (the
    output workload — no blow-up beyond the answer itself); the per-purchase
    touch count is a purchase-keyed window on that pair frame; the final
    day rollup is DECIMAL-summed. Per-row division is IEEE-identical
    cross-engine; the 4-dp DECIMAL cast is tie-free (no double is exactly
    on a 10^-4 half-grid point). Scale: pair volume is bounded by actual
    view→purchase adjacency within the window, per-user-keyed — AQE handles
    power-user skew; nothing global, no cartesian."""
    from pyspark.sql import Window as W

    e = tables(spark, sf_dir)("events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    pairs = p.join(v, "user_id").filter(
        (F.col("v_ts") <= F.col("p_ts"))
        & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    attr = pairs.select(
        "v_ts",
        (F.col("value") / F.count("*").over(W.partitionBy("pid"))).alias("a"),
    )
    return attr.groupBy(
        F.datediff(F.to_date("v_ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day")
    ).agg(
        F.count("*").cast("long").alias("n_touches"),
        F.sum(F.col("a").cast(REV_DEC)).cast("double").alias("attributed"),
    )


@q(
    "x38_supplier_skyline",
    """WITH m AS (
         SELECT s.s_nationkey, l.l_suppkey,
                round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                      / count(*), 6) AS avg_price,
                round(CAST(sum(CAST(l.l_discount AS DECIMAL(18,4))) AS DOUBLE)
                      / count(*), 6) AS avg_disc
         FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
         GROUP BY 1, 2),
       pts AS (SELECT DISTINCT s_nationkey, avg_price, avg_disc FROM m),
       sky AS (SELECT p.* FROM pts p
               WHERE NOT EXISTS (
                 SELECT 1 FROM pts q
                 WHERE q.s_nationkey = p.s_nationkey
                   AND q.avg_price <= p.avg_price
                   AND q.avg_disc >= p.avg_disc
                   AND (q.avg_price < p.avg_price OR q.avg_disc > p.avg_disc)))
       SELECT n.n_name, sky.avg_price, sky.avg_disc
       FROM sky JOIN nation n ON sky.s_nationkey = n.n_nationkey""",
)
def x38(spark, sf_dir):
    """Composite (r6c): per-nation Pareto frontier (SKYLINE operator —
    Börzsönyi et al. ICDE'01) of supplier offers: minimize average price,
    maximize average discount; a point survives iff nothing is at least as
    good on both axes and strictly better on one. Spark has no skyline
    node; the 2-D case collapses to sorted-order arithmetic — per (nation,
    price) keep the best discount, then one NATION-KEYED window ordered by
    price keeps rows beating the strict-prefix cummax of discount. That is
    O(n log n) per nation with ZERO pair comparisons, while the oracle pays
    the O(n²) NOT-EXISTS dominance join — the sweep-line-vs-pair-join
    shape of x33. Metrics are decimal-exact means rounded 6 dp at birth,
    so the dominance decisions are engine-exact."""
    from pyspark.sql import Window as W

    t = tables(spark, sf_dir)
    li = t("lineitem").select("l_suppkey", "l_extendedprice", "l_discount")
    s = t("supplier").select("s_suppkey", "s_nationkey")
    m = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.round(davg("l_extendedprice"), 6).alias("avg_price"),
            F.round(davg("l_discount"), 6).alias("avg_disc"),
        )
    )
    pts = m.select("s_nationkey", "avg_price", "avg_disc").distinct()
    best = pts.groupBy("s_nationkey", "avg_price").agg(
        F.max("avg_disc").alias("avg_disc")
    )
    w = (
        W.partitionBy("s_nationkey")
        .orderBy("avg_price")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    sky = best.withColumn("prefix_best", F.max("avg_disc").over(w)).filter(
        F.col("prefix_best").isNull()
        | (F.col("avg_disc") > F.col("prefix_best"))
    )
    nn = t("nation").select("n_nationkey", "n_name")
    return sky.join(
        F.broadcast(nn), sky.s_nationkey == nn.n_nationkey
    ).select("n_name", "avg_price", "avg_disc")


@q(
    "x39_order_velocity",
    """WITH o AS (SELECT o_orderkey, o_custkey,
                         CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS d,
                         o_totalprice
                  FROM orders)
       SELECT o_orderkey,
              CAST(count(*) OVER w AS BIGINT) AS n_prior_90d,
              CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER w,
                            0) AS DOUBLE) AS spend_prior_90d
       FROM o
       WINDOW w AS (PARTITION BY o_custkey ORDER BY d
                    RANGE BETWEEN 90 PRECEDING AND 1 PRECEDING)""",
)
def x39(spark, sf_dir):
    """Composite (r6c): order-velocity features — for every order, the
    customer's trailing-90-day order count and spend EXCLUDING the current
    day (the fraud/credit feature-engineering staple). One customer-keyed
    RANGE-frame window on integer epoch days (c39's range-window mechanics
    on a real feature shape); the decimal sum keeps the trailing spend
    exact under any partitioning. Same-day orders share a frame boundary,
    so the 1-PRECEDING exclusion is deterministic (no intra-day ordering
    dependence). Scale: one shuffle on the customer key, frames bounded by
    per-customer 90-day history."""
    from pyspark.sql import Window as W

    o = tables(spark, sf_dir)("orders").select(
        "o_orderkey",
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .alias("d"),
        "o_totalprice",
    )
    w = (
        W.partitionBy("o_custkey")
        .orderBy("d")
        .rangeBetween(-90, -1)
    )
    return o.select(
        "o_orderkey",
        F.count("*").over(w).cast("long").alias("n_prior_90d"),
        F.coalesce(
            F.sum(F.col("o_totalprice").cast(REV_DEC)).over(w), F.lit(0)
        )
        .cast("double")
        .alias("spend_prior_90d"),
    )


@q(
    "x40_cohort_ltv",
    """WITH o AS (SELECT o_custkey,
                         (year(o_orderdate) * 12 + month(o_orderdate)) AS m,
                         o_totalprice
                  FROM orders),
       c AS (SELECT o_custkey, min(m) AS cohort FROM o GROUP BY 1),
       sz AS (SELECT cohort, count(*) AS n_customers FROM c GROUP BY 1),
       r AS (SELECT c.cohort, o.m - c.cohort AS offset_m,
                    CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                        AS rev
             FROM o JOIN c USING (o_custkey) GROUP BY 1, 2),
       cum AS (SELECT cohort, offset_m, rev,
                      CAST(sum(CAST(rev AS DECIMAL(18,4)))
                           OVER (PARTITION BY cohort ORDER BY offset_m
                                 ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                          AS cum_rev
               FROM r)
       SELECT cum.cohort AS cohort_month,
              CAST(cum.offset_m AS BIGINT) AS month_offset,
              CAST(sz.n_customers AS BIGINT) AS n_customers,
              cum.rev AS revenue, cum.cum_rev AS cum_revenue,
              round(cum.cum_rev / sz.n_customers, 6) AS ltv_per_customer
       FROM cum JOIN sz USING (cohort)""",
)
def x40(spark, sf_dir):
    """Composite (r6c): cohort LTV curves — cumulative revenue per
    acquisition cohort (first-order month) by months-since-acquisition,
    normalized per cohort head — x34's retention matrix with money on it,
    the other half of the product-analytics pair. Cohort month is pure
    integer arithmetic (year*12+month — no date_trunc origin skew). Two
    customer-keyed aggs + one cohort-keyed cumulative window over the
    calendar-bounded (cohort × offset) matrix; revenue rides DECIMAL both
    in the monthly cells and the running sum, so the curve is exact at
    any partitioning. The per-customer lifetimes frame is scratch-
    persisted (feeds the size table and the offset join)."""
    from pyspark.sql import Window as W

    from .._scratch import scratch_persist

    o = tables(spark, sf_dir)("orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        "o_totalprice",
    )
    c = scratch_persist(
        o.groupBy("o_custkey").agg(F.min("m").alias("cohort")), "x40/cohorts"
    )
    sz = c.groupBy("cohort").agg(F.count("*").alias("n_customers"))
    r = (
        o.join(c, "o_custkey")
        .groupBy("cohort", (F.col("m") - F.col("cohort")).alias("offset_m"))
        .agg(
            F.sum(F.col("o_totalprice").cast(REV_DEC))
            .cast("double")
            .alias("rev")
        )
    )
    w = (
        W.partitionBy("cohort")
        .orderBy("offset_m")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = r.withColumn(
        "cum_rev",
        F.sum(F.col("rev").cast(REV_DEC)).over(w).cast("double"),
    )
    return cum.join(F.broadcast(sz), "cohort").select(
        F.col("cohort").alias("cohort_month"),
        F.col("offset_m").cast("long").alias("month_offset"),
        F.col("n_customers").cast("long").alias("n_customers"),
        F.col("rev").alias("revenue"),
        F.col("cum_rev").alias("cum_revenue"),
        F.round(F.col("cum_rev") / F.col("n_customers"), 6).alias(
            "ltv_per_customer"
        ),
    )


@q(
    "x41_shipment_coverage",
    """WITH iv AS (
         SELECT l_suppkey,
                date_diff('day', DATE '1970-01-01', l_shipdate) AS s,
                date_diff('day', DATE '1970-01-01', l_shipdate)
                  + 10 + l_partkey % 20 AS e
         FROM lineitem),
       o AS (SELECT l_suppkey, s, e,
                    CASE WHEN s > coalesce(max(e) OVER (
                           PARTITION BY l_suppkey ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), s) + 1
                         THEN 1 ELSE 0 END AS brk
             FROM iv),
       isl AS (SELECT l_suppkey, s, e,
                      sum(brk) OVER (PARTITION BY l_suppkey ORDER BY s, e
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
               FROM o),
       agg AS (SELECT l_suppkey, island, count(*) AS n,
                      max(e) - min(s) + 1 AS len,
                      min(s) AS s0, max(e) AS e1
               FROM isl GROUP BY 1, 2)
       SELECT sup.s_name,
              CAST(sum(n) AS BIGINT) AS n_intervals,
              CAST(sum(len) AS BIGINT) AS covered_days,
              CAST(max(e1) - min(s0) + 1 AS BIGINT) AS span_days
       FROM agg JOIN supplier sup ON agg.l_suppkey = sup.s_suppkey
       GROUP BY 1""",
)
def x41(spark, sf_dir):
    """Composite (r7): shipment-coverage report — per supplier, how many
    DISTINCT calendar days it had anything in transit (union length of
    its [ship, ship + deterministic transit] intervals, the x33 transit
    derivation) vs its total active span — the utilization complement to
    x33's concurrency count. ``timeseries.interval_coverage``: classic
    gaps-and-islands on ONE supplier-keyed window (running max end marks
    island breaks, break-count numbers islands) + two keyed aggregates —
    one exchange, O(n log n) per supplier, never a pair join; identical
    in both engines, so fully hash-certified."""
    from .. import timeseries

    t = tables(spark, sf_dir)
    ship_d = F.datediff(F.col("l_shipdate"), F.lit("1970-01-01")).cast("long")
    li = t("lineitem").select(
        "l_suppkey",
        ship_d.alias("ship_d"),
        (ship_d + 10 + F.col("l_partkey") % 20).alias("receipt_d"),
    )
    out = timeseries.interval_coverage(li, "l_suppkey", "ship_d", "receipt_d")
    return (
        out.join(
            t("supplier").select("s_suppkey", "s_name"),
            out.l_suppkey == F.col("s_suppkey"),
        )
        .select("s_name", "n_intervals", "covered_days", "span_days")
    )


@q(
    "x42_cleaning_funnel",
    """WITH clean AS (
         SELECT doc_id, text FROM documents
         WHERE doc_id % 7 <> 0 AND doc_id % 11 <> 0
           AND doc_id % 13 <> 0 AND doc_id % 17 <> 0),
       w AS (SELECT doc_id, string_split(text, ' ') AS w FROM clean),
       ch AS (SELECT doc_id, (s - 1) // 8 AS i,
                     array_to_string(w[s : s + 7], ' ') AS chunk
              FROM w, LATERAL (
                SELECT unnest(range(1, greatest(len(w), 1) + 1, 8)) AS s)),
       ln AS (SELECT doc_id, i,
                CASE (doc_id * 7 + i) % 4
                  WHEN 0 THEN chunk || '.'
                  WHEN 1 THEN chunk || '!'
                  WHEN 2 THEN chunk
                  ELSE 'javascript ' || chunk || '.' END AS line
              FROM ch),
       kept_ln AS (SELECT doc_id, i, line FROM ln
              WHERE regexp_matches(line, '[.!?"]$')
                AND len(string_split(line, ' ')) >= 5
                AND NOT contains(lower(line), 'javascript')),
       dt AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS dtext
              FROM ln GROUP BY 1),
       pages AS (SELECT k.doc_id, count(*) AS n_kept
                 FROM kept_ln k JOIN dt ON dt.doc_id = k.doc_id
                 WHERE NOT contains(lower(dt.dtext), 'lorem ipsum')
                   AND NOT contains(dt.dtext, '{')
                 GROUP BY 1 HAVING count(*) >= 3),
       surv_ln AS (SELECT k.doc_id, k.i, k.line FROM kept_ln k
                   JOIN pages p ON p.doc_id = k.doc_id),
       dd AS (SELECT doc_id, i, line,
                row_number() OVER (PARTITION BY line
                                   ORDER BY doc_id, i) AS rn
              FROM surv_ln),
       per_doc AS (SELECT p.doc_id,
                     count(*) FILTER (WHERE dd.rn = 1) AS n_kept
                   FROM pages p LEFT JOIN dd ON dd.doc_id = p.doc_id
                   GROUP BY 1)
       SELECT 'input' AS stage,
              CAST((SELECT count(*) FROM documents) AS BIGINT) AS n
       UNION ALL
       SELECT 'encoding_clean', CAST((SELECT count(*) FROM clean) AS BIGINT)
       UNION ALL
       SELECT 'c4_kept', CAST((SELECT count(*) FROM pages) AS BIGINT)
       UNION ALL
       SELECT 'line_dedup_nonhollow',
              CAST((SELECT count(*) FROM per_doc WHERE n_kept > 0) AS BIGINT)
       UNION ALL
       SELECT 'unique_lines',
              CAST((SELECT coalesce(sum(n_kept), 0) FROM per_doc) AS BIGINT)""",
)
def x42(spark, sf_dir):
    """Capstone composite (r11): the end-to-end CLEANING FUNNEL as ONE
    certified program — the cleaning_ladder example's driver-checkable
    twin: encoding audit (d146's planted damage gates every
    7/11/13/17th doc out) -> C4 line/page rules (d138's decoration) ->
    corpus-wide line dedup over the surviving lines (d139's keep-first)
    — reported as stage containment counts, the retention-audit shape a
    production pipeline dashboards.  Every stage reuses the CERTIFIED
    operator (encoding_quality / c4_line_filter / dedup_lines_corpus)
    unchanged; the oracle replays plants, rules, and the keep-first
    window end to end.  All five counts compute in one job (tiny
    single-row aggregates unioned)."""
    from .. import text as _text

    d = tables(spark, sf_dir)("documents")
    idc = F.col("doc_id")
    poison = F.concat(
        F.when(idc % 7 == 0, F.lit(" Caf\u00c3\u00a9")).otherwise(F.lit("")),
        F.when(idc % 11 == 0, F.lit(" don\u00e2\u20ac\u2122t")).otherwise(
            F.lit("")
        ),
        F.when(idc % 13 == 0, F.lit(" \ufffd")).otherwise(F.lit("")),
        F.when(idc % 17 == 0, F.lit(" \u0085ok")).otherwise(F.lit("")),
    )
    enc = _text.encoding_quality(
        d.select("doc_id", F.concat(F.col("text"), poison).alias("text"))
    )
    clean = d.join(
        enc.filter(~F.col("is_suspect")).select("doc_id"), "doc_id", "left_semi"
    )
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(8)
    )

    def decorate(s):
        chunk = F.array_join(F.slice(toks, s, 8), " ")
        i = F.floor((s - 1) / 8).cast("long")
        m = (F.col("doc_id") * 7 + i) % 4
        return (
            F.when(m == 0, F.concat(chunk, F.lit(".")))
            .when(m == 1, F.concat(chunk, F.lit("!")))
            .when(m == 2, chunk)
            .otherwise(F.concat(F.lit("javascript "), chunk, F.lit(".")))
        )

    decorated = clean.select(
        "doc_id",
        F.array_join(F.transform(starts, decorate), "\n").alias("text"),
    )
    c4 = _text.c4_line_filter(decorated, "doc_id", "text")
    kept = c4.filter(F.col("doc_kept")).select("doc_id", "clean_text")
    lines = kept.select(
        "doc_id",
        F.posexplode(F.split("clean_text", "\n")).alias("line_no", "line"),
    )
    ded = _text.dedup_lines_corpus(lines, "doc_id", "line_no", "line")

    out = (
        d.agg(F.lit("input").alias("stage"), F.count("*").cast("long").alias("n"))
        .unionAll(
            clean.agg(
                F.lit("encoding_clean").alias("stage"),
                F.count("*").cast("long").alias("n"),
            )
        )
        .unionAll(
            kept.agg(
                F.lit("c4_kept").alias("stage"),
                F.count("*").cast("long").alias("n"),
            )
        )
        .unionAll(
            ded.filter(F.col("n_kept_lines") > 0).agg(
                F.lit("line_dedup_nonhollow").alias("stage"),
                F.count("*").cast("long").alias("n"),
            )
        )
        .unionAll(
            ded.agg(
                F.lit("unique_lines").alias("stage"),
                F.coalesce(F.sum("n_kept_lines"), F.lit(0))
                .cast("long")
                .alias("n"),
            )
        )
    )
    return out


@q(
    "x43_crawl_ops_funnel",
    """WITH m AS (SELECT DISTINCT doc_id % 260 AS m260 FROM documents),
       kt AS (SELECT m260, m260 % 5 AS k FROM m WHERE m260 % 5 <= 2),
       due AS (SELECT k,
                 least(CAST(floor(30.0 / (k + 1)) AS BIGINT) + 1,
                       count(*)) AS d
               FROM kt GROUP BY k)
       SELECT 'frontier' AS stage,
              CAST((SELECT count(*) FROM m) AS BIGINT) AS n
       UNION ALL SELECT 'blocklist_kept',
              CAST((SELECT count(*) FROM kt) AS BIGINT)
       UNION ALL SELECT 'scheduled',
              CAST((SELECT count(*) FROM kt) AS BIGINT)
       UNION ALL SELECT 'due_in_30s',
              CAST((SELECT sum(d) FROM due) AS BIGINT)
       UNION ALL SELECT 'fetched_200',
              CAST((SELECT count(*) FROM kt) AS BIGINT)
       UNION ALL SELECT 'wet_roundtrip_ok',
              CAST((SELECT count(*) FROM kt) AS BIGINT)""",
)
def x43(spark, sf_dir):
    """Capstone composite (r12, VERDICT r11 #4): the CRAWL-OPERATIONS
    loop as ONE certified lazy program — discover → blocklist →
    politeness-schedule → fetch-through-the-CDX-index → WET — each
    stage the CERTIFIED operator unchanged (d133's robots→sitemap
    chain, d147's suffix blocklist, d136's politeness slots, d135's
    index write + independent-inflate fetch, d152's WET roundtrip),
    reported as the stage-containment funnel a crawl dashboard shows
    (the x42 pattern applied to examples/crawl_pipeline.py's
    operations half).  Data-derived pins: the frontier count (the
    sitemap universe), the blocklist survivor count (domains 3/4 die —
    one by exact host, one by suffix), the schedule's
    count-conservation, the 30-second due-slot arithmetic
    (Σ_host min(⌊30/delay⌋+1, bucket)), and two guarantee counts
    recomputed from real verification (every scheduled URL's WARC
    member fetches HTTP-200 through its index geometry; every fetched
    page WET-roundtrips byte-exactly).  The streaming form (same
    stages per micro-batch, kill/replay-convergent) is pinned in
    tests/test_streaming.py."""
    from .. import multimodal
    from .. import text as _text
    from .._scratch import scratch_persist

    d = tables(spark, sf_dir)("documents")

    # --- discover: robots names the sitemap; the sitemap names the URLs
    k = F.col("k")
    robots = (
        d.select((F.col("doc_id") % 5).alias("k"))
        .distinct()
        .select(
            F.concat(
                F.lit("www.site"), k.cast("string"), F.lit(".com")
            ).alias("domain"),
            F.concat(
                F.lit("User-agent: *\nDisallow: /private/\n"),
                F.lit("Crawl-delay: "), (k + 1).cast("string"), F.lit("\n"),
                F.lit("Sitemap: https://www.site"), k.cast("string"),
                F.lit(".com/sitemap"), (k % 2).cast("string"),
                F.lit(".xml\n"),
            ).alias("robots_txt"),
        )
    )
    dirs = scratch_persist(
        _text.robots_directives(robots, "robots_txt", "domain"),
        "x43/robots_directives",
    )
    discovered = dirs.filter(F.col("directive") == "sitemap").select(
        "domain", F.col("value").alias("sitemap_url")
    )
    delays = dirs.filter(F.col("directive") == "crawl-delay").select(
        "domain", F.col("value").cast("double").alias("crawl_delay_s")
    )
    m260 = (F.col("doc_id") % 260).alias("m260")
    uni = d.select(m260).distinct()
    entry = F.concat(
        F.lit("<url><loc>https://www.site"),
        (F.col("m260") % 5).cast("string"),
        F.lit(".com/Docs/"), (F.col("m260") % 13).cast("string"),
        F.lit("/doc"), F.col("m260").cast("string"), F.lit("</loc></url>"),
    )
    per_domain = (
        uni.select(
            (F.col("m260") % 5).alias("k"), F.col("m260"), entry.alias("e")
        )
        .groupBy("k")
        .agg(
            F.concat(
                F.lit("<urlset>"),
                F.concat_ws(
                    "",
                    F.array_sort(F.collect_list(F.struct("m260", "e")))
                    .getField("e"),
                ),
                F.lit("</urlset>"),
            ).alias("xml")
        )
    )
    variants = per_domain.select(
        "k", "xml", F.explode(F.array(F.lit(0), F.lit(1))).alias("v")
    ).select(
        F.concat(
            F.lit("https://www.site"), F.col("k").cast("string"),
            F.lit(".com/sitemap"), F.col("v").cast("string"),
            F.lit(".xml"),
        ).alias("sitemap_url"),
        F.col("xml").alias("sitemap_xml"),
    )
    chosen = discovered.join(F.broadcast(variants), "sitemap_url")
    frontier = scratch_persist(
        _text.sitemap_entries(
            chosen.select("domain", "sitemap_xml"), "sitemap_xml", "domain"
        ).select("domain", "loc"),
        "x43/frontier",
    )

    # --- blocklist: site3 dies by exact host, site4 by dot-suffix
    bl = local_rows_df(spark,
        [("www.site3.com", "ads"), ("site4.com", "malware")],
        "pattern string, category string",
    )
    kept_urls = (
        _text.url_blocklist_filter(frontier, bl, url_col="loc")
        .filter(~F.col("blocked"))
        .select(F.col("url").alias("loc"))
    )
    kept = scratch_persist(
        frontier.join(kept_urls, "loc", "left_semi"), "x43/kept"
    )

    # --- politeness schedule over the surviving frontier
    sched = scratch_persist(
        _text.politeness_schedule(
            kept, delays, host_col="domain", url_col="loc"
        ),
        "x43/sched",
    )
    due = sched.filter(F.col("scheduled_offset_s") <= 30.0)

    # --- fetch: one representative page per URL, through the CDX index
    reps = d.groupBy((F.col("doc_id") % 260).alias("m260")).agg(
        F.min(F.struct("doc_id", "text")).alias("__w")
    ).select("m260", F.col("__w.text").alias("text"))
    targets = kept.select(
        "loc",
        F.regexp_extract("loc", r"/doc(\d+)$", 1).cast("long").alias("m260"),
    )
    html = F.concat(
        F.lit("<html><head><title>page "), F.col("m260").cast("string"),
        F.lit("</title><script>var x=1;</script></head><body>"),
        F.lit('<nav><a href="/">home</a></nav><div class="main"><p>'),
        F.col("text"),
        F.lit("</p></div><footer>(c) corpus</footer></body></html>"),
    )
    src = targets.join(reps, "m260").select(
        F.col("m260").alias("doc_id"), html.alias("html"),
        F.col("loc").alias("uri"),
    )
    files = scratch_persist(
        multimodal.synth_warc_gz(src, "html", "uri", "doc_id"), "x43/warc"
    )
    idx = multimodal.warc_gz_cdx_index(files).filter(
        F.col("warc_type") == "response"
    )
    fetched = multimodal.warc_gz_indexed_fetch(
        files.join(idx.select("doc_id", "offset", "length"), "doc_id")
    )
    fetched_200 = fetched.filter(
        (F.col("fetch_ok") == 1) & (F.col("http_status") == 200)
    )

    # --- WET conversion of the fetched bodies, roundtrip-verified
    parsed = multimodal.parse_warc(files, "payload", "doc_id")
    txt = _text.html_main_text(F.col("body"))
    wet_str = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        F.col("target_uri"),
        F.lit("\r\nWARC-Record-ID: <urn:sha256:"), F.sha2(txt, 256),
        F.lit(">\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.octet_length(txt).cast("string"),
        F.lit("\r\n\r\n"), txt, F.lit("\r\n\r\n"),
    )
    wet = parsed.select(
        "doc_id",
        F.encode(wet_str, "utf-8").alias("payload"),
        txt.alias("__orig"),
    )
    rewet = multimodal.parse_wet(
        wet.select("doc_id", "payload"), "payload", "doc_id"
    )
    wet_ok = rewet.join(wet.select("doc_id", "__orig"), "doc_id").filter(
        (F.col("text") == F.col("__orig"))
        & (F.octet_length("text") == F.col("content_length"))
    )

    def stage(name, frame):
        return frame.agg(
            F.lit(name).alias("stage"), F.count("*").cast("long").alias("n")
        )

    return (
        stage("frontier", frontier)
        .unionAll(stage("blocklist_kept", kept))
        .unionAll(stage("scheduled", sched))
        .unionAll(stage("due_in_30s", due))
        .unionAll(stage("fetched_200", fetched_200))
        .unionAll(stage("wet_roundtrip_ok", wet_ok))
    )
