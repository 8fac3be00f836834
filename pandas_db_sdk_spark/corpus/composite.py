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

from ._util import dsum, registry, tables

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
    region→nation→supplier chain broadcasts end to end."""
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
            F.broadcast(s),
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
        l.join(F.broadcast(t("part")), F.col("l_partkey") == F.col("p_partkey"))
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
    j = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
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
        ps.join(F.broadcast(bad), ps.l_suppkey == bad.s_suppkey, "left_anti")
        .join(
            F.broadcast(t("part").filter(F.col("p_brand") != "Brand#1")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
        .limit(30)
    )
