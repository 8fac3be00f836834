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
