"""Sources/sinks, projection/filter, joins — SURVEY §2 C1–C22.

This is the relational core the reference presupposes (its SDK returns whole
pandas frames for client-side querying, ``client.py:176``); here every op is
a distributed Spark plan with pushdown/pruning/broadcast handled by Catalyst.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ._util import artifacts_dir, dsum, registry, tables
from .._localrel import local_rows_df

QUERIES, ORACLE, q = registry()


# --------------------------------------------------------------- sources / sinks


@q(
    "c01_scan_parquet",
    "SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem",
)
def c01(spark, sf_dir):
    """C1: parquet scan with column pruning — ReadSchema carries 3 of 11 cols."""
    return tables(spark, sf_dir)("lineitem").select(
        "l_orderkey", "l_linenumber", "l_returnflag"
    )


@q("c02_scan_csv", "SELECT * FROM nation")
def c02(spark, sf_dir):
    """C2: csv.gz round trip — the reference's storage format (README.md:20).

    Writes `nation` as gzip CSV (engine export fidelity), reads it back with
    an explicit schema (no inference pass — one job, not two).
    """
    t = tables(spark, sf_dir)
    path = os.path.join(artifacts_dir(), "nation_csv")
    t("nation").write.mode("overwrite").option("header", True).option(
        "compression", "gzip"
    ).csv(path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    return spark.read.schema(schema).option("header", True).csv(path)


@q("c02b_scan_json", "SELECT * FROM nation")
def c02b(spark, sf_dir):
    """C2: JSON-lines round trip — the reference's wire format
    (client.py:114 serializes frames as JSON records). Explicit schema on
    read: no inference pass, and types survive exactly (the upgrade over the
    reference, which lets JSON degrade them — SURVEY §1.3)."""
    t = tables(spark, sf_dir)
    path = os.path.join(artifacts_dir(), "nation_json")
    t("nation").write.mode("overwrite").json(path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    return spark.read.schema(schema).json(path)


@q(
    "c03_write_partitioned",
    """SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
              count(*) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
       FROM orders GROUP BY 1""",
)
def c03(spark, sf_dir):
    """C3: partitioned write (reference Date partition keys, README.md:191-198)
    then a partition-pruned read-back aggregation."""
    t = tables(spark, sf_dir)
    path = os.path.join(artifacts_dir(), "orders_by_year")
    (
        t("orders")
        .withColumn("o_year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("o_year")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    return back.groupBy(F.col("o_year").cast("int").alias("o_year")).agg(
        F.count("*").alias("n_orders"), dsum("o_totalprice").alias("total")
    )


@q(
    "c04_ingest_pandas",
    """SELECT grp, CAST(sum(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS total, count(*) AS n
       FROM (VALUES ('a', 1.5), ('a', 2.25), ('b', 3.0), ('b', -1.75), ('c', 0.5))
            AS t(grp, val)
       GROUP BY grp""",
)
def c04(spark, sf_dir):
    """C4: pandas → engine ingest via Arrow (`client.py:99` analogue)."""
    import pandas as pd

    pdf = pd.DataFrame(
        {"grp": ["a", "a", "b", "b", "c"], "val": [1.5, 2.25, 3.0, -1.75, 0.5]}
    )
    df = spark.createDataFrame(pdf)
    return df.groupBy("grp").agg(dsum("val").alias("total"), F.count("*").alias("n"))


# --------------------------------------------------------------- projection / filter


@q("c05_select", "SELECT c_custkey, c_name, c_mktsegment FROM customer")
def c05(spark, sf_dir):
    """C5: column select/reorder (pandas `df[[...]]`)."""
    return tables(spark, sf_dir)("customer").select("c_custkey", "c_name", "c_mktsegment")


@q(
    "c06_computed_column",
    """SELECT l_orderkey, l_linenumber,
              l_extendedprice * (1 - l_discount) AS revenue,
              l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
       FROM lineitem""",
)
def c06(spark, sf_dir):
    """C6: computed columns (pandas `assign`). Per-row IEEE double arithmetic
    is bit-identical across engines — no rounding needed."""
    li = tables(spark, sf_dir)("lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        rev.alias("revenue"),
        (rev * (1 + F.col("l_tax"))).alias("charged"),
    )


@q(
    "c07_rename",
    "SELECT c_custkey AS customer_id, c_name AS customer_name FROM customer",
)
def c07(spark, sf_dir):
    """C7: rename (pandas `rename`)."""
    return (
        tables(spark, sf_dir)("customer")
        .select("c_custkey", "c_name")
        .withColumnRenamed("c_custkey", "customer_id")
        .withColumnRenamed("c_name", "customer_name")
    )


@q("c08_drop", "SELECT p_partkey, p_brand, p_type, p_size FROM part")
def c08(spark, sf_dir):
    """C8: drop columns (pandas `drop`)."""
    return tables(spark, sf_dir)("part").drop("p_name", "p_retailprice")


@q(
    "c09_filter",
    """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
       FROM lineitem
       WHERE l_quantity BETWEEN 10 AND 20
         AND l_returnflag IN ('A', 'R')
         AND l_shipdate >= TIMESTAMP '1997-01-01'
         AND NOT (l_discount < 0.02)
         AND l_tax IS NOT NULL""",
)
def c09(spark, sf_dir):
    """C9: row filters — comparison, boolean algebra, isin, between, null test.
    All predicates push to the parquet scan (PushedFilters in the plan)."""
    li = tables(spark, sf_dir)("lineitem")
    return li.filter(
        F.col("l_quantity").between(10, 20)
        & F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & ~(F.col("l_discount") < 0.02)
        & F.col("l_tax").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


@q(
    "c10_distinct",
    "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def c10(spark, sf_dir):
    """C10: distinct rows (pandas `drop_duplicates`)."""
    return tables(spark, sf_dir)("orders").select("o_orderstatus", "o_orderpriority").distinct()


@q(
    "c11_null_handling",
    """SELECT c_custkey,
              COALESCE(CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END, 0.0) AS bal_filled,
              CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END IS NULL AS was_null
       FROM customer""",
)
def c11(spark, sf_dir):
    """C11: fillna/isnull (pandas `fillna`/`isna`). The synthetic tables carry
    no nulls, so nulls are manufactured from negative balances first."""
    c = tables(spark, sf_dir)("customer")
    nulled = F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal"))
    return c.select(
        "c_custkey",
        F.coalesce(nulled, F.lit(0.0)).alias("bal_filled"),
        nulled.isNull().alias("was_null"),
    )


@q(
    "c12_cast",
    """SELECT CAST(l_orderkey AS VARCHAR) AS key_str,
              CAST(l_quantity AS INTEGER) AS qty_int,
              CAST(l_linenumber AS BIGINT) AS line_long,
              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) AS VARCHAR) AS price_dec
       FROM lineitem""",
)
def c12(spark, sf_dir):
    """C12: type casts (pandas `astype`)."""
    li = tables(spark, sf_dir)("lineitem")
    return li.select(
        F.col("l_orderkey").cast("string").alias("key_str"),
        F.col("l_quantity").cast("int").alias("qty_int"),
        F.col("l_linenumber").cast("long").alias("line_long"),
        # decimal → string at the boundary: pandas renders Spark decimals as
        # Decimal objects but DuckDB decimals as floats, so the comparable
        # form is the canonical string.
        F.col("l_extendedprice").cast("decimal(18,2)").cast("string").alias("price_dec"),
    )


@q(
    "c13_case_when",
    """SELECT o_orderkey,
              CASE WHEN o_totalprice >= 300000 THEN 'large'
                   WHEN o_totalprice >= 100000 THEN 'medium'
                   ELSE 'small' END AS size_class
       FROM orders""",
)
def c13(spark, sf_dir):
    """C13: conditional expression (np.where / CASE WHEN)."""
    o = tables(spark, sf_dir)("orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
    )


# --------------------------------------------------------------- joins


@q(
    "c14_join_inner",
    """SELECT c_mktsegment,
              count(*) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       FROM orders JOIN customer ON o_custkey = c_custkey
       GROUP BY c_mktsegment""",
)
def c14(spark, sf_dir):
    """C14: inner equi-join. Catalyst/AQE picks broadcast for the small side."""
    t = tables(spark, sf_dir)
    return (
        t("orders")
        .join(t("customer"), F.col("o_custkey") == F.col("c_custkey"), "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), dsum("o_totalprice").alias("revenue"))
    )


@q(
    "c15_join_left",
    """SELECT c_custkey, count(o_orderkey) AS n_orders,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS spend
       FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       GROUP BY c_custkey""",
)
def c15(spark, sf_dir):
    """C15: left outer join — customers with zero orders kept (NULL-safe count)."""
    t = tables(spark, sf_dir)
    return (
        t("customer")
        .join(t("orders"), F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"), dsum("o_totalprice").alias("spend"))
    )


@q(
    "c15b_join_full",
    """WITH big_cust AS (SELECT o_custkey, count(*) AS n
                         FROM orders GROUP BY o_custkey HAVING count(*) > 12)
       SELECT c.c_custkey, b.o_custkey AS big_key,
              c.c_custkey IS NULL AS left_missing,
              b.o_custkey IS NULL AS right_missing
       FROM (SELECT c_custkey FROM customer WHERE c_acctbal > 0) c
       FULL JOIN big_cust b ON c.c_custkey = b.o_custkey""",
)
def c15b(spark, sf_dir):
    """C15: full outer join with unmatched rows on both sides."""
    t = tables(spark, sf_dir)
    left = t("customer").filter(F.col("c_acctbal") > 0).select("c_custkey")
    right = (
        t("orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 12)
        .select("o_custkey")
    )
    j = left.join(right, left.c_custkey == right.o_custkey, "outer")
    return j.select(
        "c_custkey",
        F.col("o_custkey").alias("big_key"),
        F.col("c_custkey").isNull().alias("left_missing"),
        F.col("o_custkey").isNull().alias("right_missing"),
    )


@q(
    "c16_join_multikey",
    """WITH dim AS (SELECT o_orderstatus, o_orderpriority, count(*) AS grp_n
                    FROM orders GROUP BY 1, 2)
       SELECT o.o_orderstatus, o.o_orderpriority,
              count(*) AS n, max(dim.grp_n) AS dim_n
       FROM orders o
       JOIN dim ON o.o_orderstatus = dim.o_orderstatus
                AND o.o_orderpriority = dim.o_orderpriority
       GROUP BY 1, 2""",
)
def c16(spark, sf_dir):
    """C16: multi-key equi-join (compound ON)."""
    o = tables(spark, sf_dir)("orders")
    dim = o.groupBy("o_orderstatus", "o_orderpriority").agg(F.count("*").alias("grp_n"))
    return (
        o.join(dim, ["o_orderstatus", "o_orderpriority"])
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"), F.max("grp_n").alias("dim_n"))
    )


@q(
    "c17_semi_join",
    """SELECT c_custkey, c_mktsegment FROM customer c
       WHERE EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)""",
)
def c17(spark, sf_dir):
    """C17: left semi join (the pandas `isin` idiom, distributed)."""
    t = tables(spark, sf_dir)
    big = t("orders").filter(F.col("o_totalprice") > 400000)
    return (
        t("customer")
        .join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi")
        .select("c_custkey", "c_mktsegment")
    )


@q(
    "c18_anti_join",
    """SELECT c_custkey, c_name FROM customer c
       WHERE NOT EXISTS (SELECT 1 FROM orders o
                         WHERE o.o_custkey = c.c_custkey
                           AND o.o_orderpriority = '1-URGENT')""",
)
def c18(spark, sf_dir):
    """C18: left anti join — customers with no URGENT order. (The
    unfiltered "no orders at all" form is EMPTY on this fixture — every
    customer has orders — which would certify nothing; the priority
    filter keeps the anti-join semantics and a non-trivial result at
    every scale.)"""
    t = tables(spark, sf_dir)
    urgent = t("orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        t("customer")
        .join(urgent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@q(
    "c19_cross_join",
    """SELECT r1.r_name AS from_region, r2.r_name AS to_region
       FROM region r1 CROSS JOIN region r2 WHERE r1.r_regionkey <> r2.r_regionkey""",
)
def c19(spark, sf_dir):
    """C19: cross join (tiny × tiny only — never the scale path)."""
    r = tables(spark, sf_dir)("region")
    r1 = r.select(F.col("r_regionkey").alias("k1"), F.col("r_name").alias("from_region"))
    r2 = r.select(F.col("r_regionkey").alias("k2"), F.col("r_name").alias("to_region"))
    return (
        r1.crossJoin(r2).filter(F.col("k1") != F.col("k2")).select("from_region", "to_region")
    )


@q(
    "c20_range_join",
    """WITH bands AS (
         SELECT * FROM (VALUES ('tiny', 0.0, 50000.0), ('mid', 50000.0, 200000.0),
                               ('big', 200000.0, 1000000.0)) AS t(band, lo, hi))
       SELECT band, count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
       FROM orders JOIN bands ON o_totalprice >= lo AND o_totalprice < hi
       GROUP BY band""",
)
def c20(spark, sf_dir):
    """C20: theta/range join — broadcast nested loop against a tiny band table.
    At scale the band table is always the broadcast side."""
    o = tables(spark, sf_dir)("orders")
    bands = local_rows_df(
        spark,
        [("tiny", 0.0, 50000.0), ("mid", 50000.0, 200000.0), ("big", 200000.0, 1000000.0)],
        "band string, lo double, hi double",
    )
    cond = (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi"))
    return (
        o.join(F.broadcast(bands), cond)
        .groupBy("band")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total"))
    )


@q(
    "c21_asof_join",
    """SELECT p.event_id, p.user_id, p.value AS purchase_value,
              s.ts_us AS signup_ts_us, s.value AS signup_value
       FROM (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us
             FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN
            (SELECT user_id, value, epoch_us(ts) AS ts_us
             FROM events WHERE event_type = 'signup') s
       ON p.user_id = s.user_id AND p.ts_us >= s.ts_us""",
)
def c21(spark, sf_dir):
    """C21: as-of join (pandas `merge_asof`) — each purchase matched to the
    latest signup at-or-before it, per user.

    Scale-path implementation: NO range join, NO per-key blowup. Union both
    sides, one window `last(ignorenulls)` ordered by event time — a single
    shuffle on user_id regardless of per-user event counts.
    """
    e = tables(spark, sf_dir)("events").withColumn("ts_us", F.unix_micros("ts"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value", "ts_us"
    )
    signups = e.filter(F.col("event_type") == "signup").select("user_id", "value", "ts_us")

    from pyspark.sql import Window as W

    unioned = purchases.withColumn("side", F.lit(1)).unionByName(
        signups.select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id",
            "value",
            "ts_us",
            F.lit(0).alias("side"),
        )
    )
    # signups sort before purchases at equal ts (side 0 < 1) → ties are matched,
    # same as DuckDB's `ON p.ts >= s.ts`.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "side")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    s_ts = F.when(F.col("side") == 0, F.col("ts_us"))
    s_val = F.when(F.col("side") == 0, F.col("value"))
    enriched = unioned.withColumn("signup_ts_us", F.last(s_ts, ignorenulls=True).over(w)).withColumn(
        "signup_value", F.last(s_val, ignorenulls=True).over(w)
    )
    return enriched.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.col("value").alias("purchase_value"),
        "signup_ts_us",
        "signup_value",
    )


@q(
    "c22_broadcast_join",
    """SELECT p_brand, count(*) AS n_items,
              CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS volume
       FROM lineitem JOIN part ON l_partkey = p_partkey
       GROUP BY p_brand""",
)
def c22(spark, sf_dir):
    """C22: explicit broadcast-hint join — `part` ships to every executor, the
    100×-bigger lineitem never shuffles."""
    t = tables(spark, sf_dir)
    return (
        t("lineitem")
        .join(F.broadcast(t("part")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(F.count("*").alias("n_items"), dsum("l_extendedprice").alias("volume"))
    )


@q(
    "c15c_join_right",
    """SELECT o.o_orderkey, c.c_custkey, c.c_name
       FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey""",
)
def c15c(spark, sf_dir):
    """C15 variant: right outer join — every customer survives, orderless
    customers carry NULL o_orderkey. Spark flips this to a left join at
    planning; with AQE the small build side broadcasts."""
    t = tables(spark, sf_dir)
    return (
        t("orders")
        .join(t("customer"), F.col("o_custkey") == F.col("c_custkey"), "right")
        .select("o_orderkey", "c_custkey", "c_name")
    )


@q(
    "c20b_scalar_subquery",
    """SELECT c_custkey, c_nationkey, c_acctbal
       FROM customer c
       WHERE c_acctbal > (
           SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                  / count(c_acctbal)
           FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)""",
)
def c20b(spark, sf_dir):
    """C20 variant: correlated scalar subquery (customers above their
    nation's average balance). De-correlated by hand into agg + broadcast
    join — the exact rewrite Catalyst applies to the SQL form; the per-nation
    aggregate is tiny at any scale, so the join never shuffles the fact
    side. Decimal-sum/count division keeps the threshold bit-identical."""
    c = tables(spark, sf_dir)("customer")
    nation_avg = c.groupBy(F.col("c_nationkey").alias("nk")).agg(
        (F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double")
         / F.count("c_acctbal")).alias("nation_avg")
    )
    return (
        c.join(F.broadcast(nation_avg), F.col("c_nationkey") == F.col("nk"))
        .filter(F.col("c_acctbal") > F.col("nation_avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )


@q("c01b_scan_orc", "SELECT * FROM nation")
def c01b(spark, sf_dir):
    """C1/C2 variant: ORC round trip — the second columnar format Spark
    ships a vectorized reader for (pushdown + pruning work the same as
    parquet). Written from `nation`, read back with its own schema."""
    t = tables(spark, sf_dir)
    path = os.path.join(artifacts_dir(), "nation_orc")
    t("nation").write.mode("overwrite").orc(path)
    return spark.read.orc(path)


@q(
    "c02c_export_jsonl_shards",
    "SELECT doc_id, text, lang, source, n_chars FROM documents",
)
def c02c(spark, sf_dir):
    """C2/C3 variant: sharded JSON-lines export — the sink a training job
    consumes (one shard per task, `maxRecordsPerFile` bounds shard size,
    matching the reference's 100K-row chunking, README.md:21). Read back
    with an explicit schema to prove lossless round trip for JSON-safe
    types."""
    t = tables(spark, sf_dir)
    path = os.path.join(artifacts_dir(), "documents_jsonl")
    (
        t("documents")
        .write.mode("overwrite")
        .option("maxRecordsPerFile", 100_000)
        .json(path)
    )
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    )
    return spark.read.schema(schema).json(path)


@q(
    "c21b_asof_tolerance",
    """WITH p AS (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us
                  FROM events WHERE event_type = 'purchase'),
            s AS (SELECT user_id, value AS signup_value, epoch_us(ts) AS ts_us
                  FROM events WHERE event_type = 'signup'),
            j AS (SELECT p.event_id, p.user_id, p.value AS purchase_value, p.ts_us,
                         s.ts_us AS m_ts, s.signup_value
                  FROM p ASOF LEFT JOIN s
                  ON p.user_id = s.user_id AND p.ts_us >= s.ts_us)
       SELECT event_id, user_id, purchase_value, ts_us,
              CASE WHEN ts_us - m_ts <= 3600000000 THEN m_ts END AS ts_us_right,
              CASE WHEN ts_us - m_ts <= 3600000000 THEN signup_value END AS signup_value
       FROM j""",
)
def c21b(spark, sf_dir):
    """C21 variant: merge_asof with tolerance (pandas
    ``merge_asof(tolerance=...)``) via the generalized
    ``timeseries.asof_join`` — matches beyond 1 hour are nulled, exact-match
    ties taken. Same single-shuffle union+window plan as c21; the tolerance
    is a post-window projection, costing nothing extra."""
    from .. import timeseries

    e = tables(spark, sf_dir)("events").withColumn("ts_us", F.unix_micros("ts"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("value").alias("purchase_value"), "ts_us"
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("value").alias("signup_value"), "ts_us"
    )
    out = timeseries.asof_join(
        purchases,
        signups,
        on="ts_us",
        by=["user_id"],
        direction="backward",
        tolerance=3_600_000_000,  # 1 hour in µs
    )
    return out.select(
        "event_id", "user_id", "purchase_value", "ts_us", "ts_us_right", "signup_value"
    )


@q(
    "c02d_ref_chunk_source",
    """SELECT c_mktsegment, count(*) AS n,
              CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS bal
       FROM customer GROUP BY c_mktsegment""",
)
def c02d(spark, sf_dir):
    """C2 variant: the reference's chunk-tree layout
    (<name>/<col>/<value>/chunk_<uuid>.csv.gz, reference README.md:189-218)
    read back through the `pandas_db_ref` Spark 4 Python DataSource — one
    task per chunk, partition column from the dir name.

    The tree is built by the SCALE-SAFE path (VERDICT r3 item #5): customer
    lands in the engine as an ID-range-bucketed dataset, and
    ``migrate.export_reference_layout`` writes the chunk tree in one
    distributed Spark job (gzip CSV, ≤100K-row chunks, uuid names) — no
    ``.toPandas()`` driver loop anywhere; the driver only renames files.
    The repartition(4) makes each bucket dir hold multiple chunks, so the
    read-back exercises multi-chunk partitions."""
    import shutil as _sh

    from .. import migrate, refsource
    from ..engine import DataFrameEngine

    t = tables(spark, sf_dir)
    root = os.path.join(artifacts_dir(), "ref_chunk_tree")
    wh = os.path.join(artifacts_dir(), "ref_chunk_wh")
    _sh.rmtree(root, ignore_errors=True)
    _sh.rmtree(wh, ignore_errors=True)
    eng = DataFrameEngine(spark, wh)
    cust = (
        t("customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .repartition(4)
    )
    eng.save(cust, "ref_export/customer", columns_keys={"c_custkey": "ID"})
    migrate.export_reference_layout(eng, "ref_export/customer", root, use_last=True)

    refsource.register(spark)
    back = spark.read.format("pandas_db_ref").option("path", root).load()
    return back.groupBy("c_mktsegment").agg(
        F.count("*").alias("n"), dsum("c_acctbal").alias("bal")
    )


@q(
    "c16b_nullsafe_join",
    """WITH l AS (SELECT c_custkey,
                         CASE WHEN c_custkey % 7 = 0 THEN NULL
                              ELSE c_mktsegment END AS seg
                  FROM customer),
            r AS (SELECT DISTINCT CASE WHEN c_custkey % 11 = 0 THEN NULL
                                       ELSE c_mktsegment END AS seg
                  FROM customer)
       SELECT l.c_custkey, l.seg
       FROM l JOIN r ON l.seg IS NOT DISTINCT FROM r.seg""",
)
def c16b(spark, sf_dir):
    """C16 variant: null-safe equality join (`<=>` / IS NOT DISTINCT FROM —
    pandas merges NaN keys to NaN keys). Stays a hash-joinable equi-key:
    Catalyst treats null-safe equality as a join key, never a nested
    loop."""
    c = tables(spark, sf_dir)("customer")
    left = c.select(
        "c_custkey",
        F.when(F.col("c_custkey") % 7 == 0, None).otherwise(F.col("c_mktsegment")).alias("seg"),
    )
    right = c.select(
        F.when(F.col("c_custkey") % 11 == 0, None).otherwise(F.col("c_mktsegment")).alias("seg")
    ).distinct()
    return left.join(right, left["seg"].eqNullSafe(right["seg"])).select(
        left["c_custkey"], left["seg"]
    )


@q(
    "c69_data_checks",
    """WITH base AS (SELECT count(*) AS n,
                CAST(sum(CASE WHEN l_quantity > 0 THEN 0 ELSE 1 END) AS BIGINT) AS v_qty,
                CAST(sum(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 0 ELSE 1 END) AS BIGINT) AS v_disc,
                CAST(sum(CASE WHEN l_shipdate IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS v_ship,
                CAST(sum(CASE WHEN l_extendedprice >= l_quantity THEN 0 ELSE 1 END) AS BIGINT) AS v_price
         FROM lineitem)
       SELECT 'qty_positive' AS rule, n AS n_rows, v_qty AS n_violations,
              round(1.0 - v_qty / greatest(n, 1), 6) AS pass_rate FROM base
       UNION ALL
       SELECT 'discount_range', n, v_disc, round(1.0 - v_disc / greatest(n, 1), 6) FROM base
       UNION ALL
       SELECT 'shipdate_set', n, v_ship, round(1.0 - v_ship / greatest(n, 1), 6) FROM base
       UNION ALL
       SELECT 'price_ge_qty', n, v_price, round(1.0 - v_price / greatest(n, 1), 6) FROM base""",
)
def c69(spark, sf_dir):
    """C69 (ext): declarative data-quality checks — N expectations evaluated
    as conditional counts in ONE aggregate pass (`checks.check`); the
    ingest gate a 100 TB pipeline runs before committing a version."""
    from ..checks import check

    li = tables(spark, sf_dir)("lineitem")
    return check(
        li,
        {
            "qty_positive": F.col("l_quantity") > 0,
            "discount_range": F.col("l_discount").between(0, 0.1),
            "shipdate_set": F.col("l_shipdate").isNotNull(),
            "price_ge_qty": F.col("l_extendedprice") >= F.col("l_quantity"),
        },
    )


@q(
    "c14b_bucketed_join",
    """SELECT o_orderpriority,
              count(*) AS n,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
       FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
       WHERE c.c_mktsegment = 'BUILDING'
       GROUP BY o_orderpriority""",
)
def c14b(spark, sf_dir):
    """C14 variant: shuffle-free co-located join over hash-BUCKETED tables
    (`DataFrameEngine.save_bucketed`) — both sides bucketed on the join key
    with the same bucket count, so Spark reads bucket i of each side into
    one task and the join needs NO exchange on either side (asserted in
    tests/test_storage.py::test_bucketed_join_elides_shuffle). The
    repeated-big-big-join path where neither side broadcasts."""
    from ..engine import DataFrameEngine

    t = tables(spark, sf_dir)
    eng = DataFrameEngine(spark, os.path.join(artifacts_dir(), "bucket_wh"))
    eng.save_bucketed(t("orders"), "bkq/orders", bucket_by="o_custkey", n_buckets=8, sort_by="o_custkey")
    eng.save_bucketed(t("customer"), "bkq/customer", bucket_by="c_custkey", n_buckets=8, sort_by="c_custkey")
    o = eng.load_bucketed("bkq/orders")
    c = eng.load_bucketed("bkq/customer").filter(F.col("c_mktsegment") == "BUILDING")
    return (
        o.join(c.hint("merge"), o.o_custkey == c.c_custkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"), dsum("o_totalprice").alias("total"))
    )


@q(
    "c11b_replace_values",
    """SELECT c_custkey,
              CASE c_mktsegment
                   WHEN 'BUILDING' THEN 'CONSTRUCTION'
                   WHEN 'AUTOMOBILE' THEN 'AUTO'
                   ELSE c_mktsegment END AS segment,
              CASE WHEN c_nationkey = 0 THEN 99 ELSE c_nationkey END AS nation_recoded
       FROM customer""",
)
def c11b(spark, sf_dir):
    """C11 variant: value recoding (pandas ``replace`` with a mapping) —
    ``df.replace`` compiles to the same CASE chain a hand-written
    when/otherwise would, staying pure codegen."""
    c = tables(spark, sf_dir)("customer")
    return c.replace(
        {"BUILDING": "CONSTRUCTION", "AUTOMOBILE": "AUTO"}, subset=["c_mktsegment"]
    ).replace({0: 99}, subset=["c_nationkey"]).select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.col("c_nationkey").alias("nation_recoded"),
    )


@q(
    "c15d_combine_first",
    """WITH a AS (SELECT c_custkey,
                        CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal,
                        c_name
                 FROM customer),
       b AS (SELECT c_custkey, 0.0 - c_acctbal AS bal_b FROM customer WHERE c_acctbal < 500)
       SELECT a.c_custkey, a.c_name,
              COALESCE(a.bal, b.bal_b) AS bal
       FROM a LEFT JOIN b ON a.c_custkey = b.c_custkey""",
)
def c15d(spark, sf_dir):
    """C15 variant: pandas ``combine_first`` — patch one frame's nulls from
    another keyed frame: full/left join + per-column COALESCE, the
    idiomatic Spark spelling (one hash join, no row-wise Python)."""
    c = tables(spark, sf_dir)("customer")
    a = c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, None).otherwise(F.col("c_acctbal")).alias("bal"),
        "c_name",
    )
    b = c.filter(F.col("c_acctbal") < 500).select(
        "c_custkey", (F.lit(0.0) - F.col("c_acctbal")).alias("bal_b")
    )
    return a.join(b, "c_custkey", "left").select(
        "c_custkey", "c_name", F.coalesce("bal", "bal_b").alias("bal")
    )


@q(
    "c21c_asof_forward",
    """SELECT p.event_id, p.user_id, p.value AS purchase_value, p.ts_us,
              s.ts_us AS ts_us_right, s.value AS signup_value
       FROM (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us
             FROM events WHERE event_type = 'purchase') p
       ASOF LEFT JOIN
            (SELECT user_id, value, epoch_us(ts) AS ts_us
             FROM events WHERE event_type = 'signup') s
       ON p.user_id = s.user_id AND p.ts_us <= s.ts_us""",
)
def c21c(spark, sf_dir):
    """C21 variant: FORWARD as-of join (pandas
    `merge_asof(direction='forward')`) — each purchase matched to the
    EARLIEST signup at-or-after it, per user. Same union + single ordered
    window pass as backward (`timeseries.asof_join`): one shuffle on the
    by-key, `first(ignorenulls)` over the following frame instead of
    `last` over the preceding one; exact-ts matches taken on both
    engines."""
    from .. import timeseries

    e = tables(spark, sf_dir)("events").withColumn("ts_us", F.unix_micros("ts"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("value").alias("purchase_value"), "ts_us"
    )
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("value").alias("signup_value"), "ts_us"
    )
    out = timeseries.asof_join(
        purchases, signups, on="ts_us", by=["user_id"], direction="forward"
    )
    return out.select(
        "event_id", "user_id", "purchase_value", "ts_us", "ts_us_right", "signup_value"
    )


@q(
    "c12b_try_cast",
    """SELECT c_custkey,
              TRY_CAST(c_name AS DOUBLE) AS name_num,
              TRY_CAST(right(c_name, 3) AS INTEGER) AS name_tail_num,
              TRY_CAST(c_acctbal AS VARCHAR) IS NOT NULL AS bal_ok
       FROM customer""",
)
def c12b(spark, sf_dir):
    """C12 variant: TRY_CAST — invalid conversions yield NULL instead of
    failing the job (pandas `to_numeric(errors='coerce')`). Under Spark
    4's default ANSI mode plain CAST throws on malformed input, so this
    is the production-safe ingestion cast; semantics match DuckDB's
    TRY_CAST exactly."""
    c = tables(spark, sf_dir)("customer")
    return c.select(
        "c_custkey",
        F.col("c_name").try_cast("double").alias("name_num"),
        F.substring(F.col("c_name"), -3, 3).try_cast("int").alias("name_tail_num"),
        F.col("c_acctbal").try_cast("string").isNotNull().alias("bal_ok"),
    )


@q("c02e_scan_xml", "SELECT * FROM nation")
def c02e(spark, sf_dir):
    """C2 variant: XML round trip via Spark 4's NATIVE xml data source
    (the spark-xml package absorbed into core) — write `nation` as XML
    rows, read back with an explicit schema (no inference pass). Rounds
    out the format matrix: parquet/ORC/csv.gz/JSON/JSONL/XML/text/binary
    + the reference chunk tree."""
    t = tables(spark, sf_dir)
    path = os.path.join(artifacts_dir(), "nation_xml")
    (
        t("nation").write.mode("overwrite").format("xml")
        .option("rootTag", "nations").option("rowTag", "nation")
        .save(path)
    )
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    return (
        spark.read.schema(schema).format("xml").option("rowTag", "nation").load(path)
    )


@q("c02f_scan_text", "SELECT n_name AS value FROM nation")
def c02f(spark, sf_dir):
    """C2 variant: line-oriented text source — one value per line written
    and read back distributed (`spark.read.text`), the rawest ingestion
    tier (log files, token lists) below CSV/JSON."""
    t = tables(spark, sf_dir)
    path = os.path.join(artifacts_dir(), "nation_text")
    t("nation").select("n_name").write.mode("overwrite").text(path)
    return spark.read.text(path)


@q(
    "d07b_binary_file_source",
    """SELECT 'reg_' || r_regionkey || '.bin' AS name,
              CAST(10 + r_regionkey AS BIGINT) AS length,
              sha256(repeat(chr(65 + r_regionkey), 10 + r_regionkey)) AS sha
       FROM region""",
)
def d07b(spark, sf_dir):
    """D7 variant: raw-asset ingestion through the `binaryFile` source —
    the first step of every multimodal pipeline (image/audio files land
    as (path, length, content BINARY) rows, one task per file, no driver
    byte-shuffling; contents then flow into the d07 mapInPandas decode
    plumbing). The 5-file fixture is deterministic ASCII derived from the
    region table, so name/length/sha256 are oracle-checkable end to end.
    At 100 TB this scan is bounded by `maxPartitionBytes` file batching,
    and the content column prunes away when untouched (here it feeds the
    hash)."""
    t = tables(spark, sf_dir)
    path = os.path.join(artifacts_dir(), "bin_assets")
    os.makedirs(path, exist_ok=True)
    # fixture construction: 5 tiny deterministic files (the operator
    # under test is the distributed binaryFile SCAN, not this setup)
    for r in t("region").select("r_regionkey").collect():
        k = r[0]
        with open(os.path.join(path, f"reg_{k}.bin"), "wb") as f:
            f.write(bytes([65 + k] * (10 + k)))
    bf = spark.read.format("binaryFile").load(path)
    return bf.select(
        F.element_at(F.split("path", "/"), -1).alias("name"),
        F.col("length"),
        F.sha2("content", 256).alias("sha"),
    )


@q(
    "c15e_merge_indicator",
    """SELECT c.c_custkey, o.o_custkey AS o_key,
              CASE WHEN c.c_custkey IS NULL THEN 'right_only'
                   WHEN o.o_custkey IS NULL THEN 'left_only'
                   ELSE 'both' END AS merge_src
       FROM customer c
       FULL JOIN (SELECT DISTINCT o_custkey FROM orders) o
         ON c.c_custkey = o.o_custkey""",
)
def c15e(spark, sf_dir):
    """C15 variant: pandas `merge(indicator=True)` — full outer join with
    the provenance column (`both`/`left_only`/`right_only`) pandas users
    audit joins with. Distinct-reduce the fact side first (key set, not
    fact rows), then one sort-merge full outer on the key."""
    t = tables(spark, sf_dir)
    c = t("customer").select("c_custkey")
    o = t("orders").select(F.col("o_custkey")).distinct()
    j = c.join(o, c.c_custkey == o.o_custkey, "full_outer")
    return j.select(
        "c_custkey",
        F.col("o_custkey").alias("o_key"),
        F.when(F.col("c_custkey").isNull(), "right_only")
        .when(F.col("o_custkey").isNull(), "left_only")
        .otherwise("both")
        .alias("merge_src"),
    )


@q(
    "c10b_duplicated_flag",
    """SELECT doc_id,
              CAST(count(*) OVER (PARTITION BY text) > 1 AS INT) AS is_dup,
              CAST(row_number() OVER (PARTITION BY text ORDER BY doc_id) = 1 AS INT)
                  AS is_first
       FROM documents""",
)
def c10b(spark, sf_dir):
    """C10 variant: pandas `duplicated()` / `duplicated(keep='first')` as
    FLAGS rather than a drop — the audit view of dedup. The window
    partitions on sha2(text) so the shuffle carries 32-byte keys, never
    document text (same contract as d01); the oracle partitions on the
    text itself — identical grouping, engine-appropriate key."""
    from pyspark.sql import Window as W

    d = tables(spark, sf_dir)("documents")
    w = W.partitionBy(F.sha2(F.col("text"), 256))
    return d.select(
        "doc_id",
        (F.count("*").over(w) > 1).cast("int").alias("is_dup"),
        (F.row_number().over(w.orderBy("doc_id")) == 1).cast("int").alias("is_first"),
    )


@q(
    "c70_profile_table",
    """SELECT 'c_custkey' AS col_name, count(c_custkey) AS n_nonnull,
              count(DISTINCT c_custkey) AS n_distinct,
              round(CAST(min(c_custkey) AS DOUBLE), 4) AS min_num,
              round(CAST(max(c_custkey) AS DOUBLE), 4) AS max_num
       FROM customer
       UNION ALL
       SELECT 'c_name', count(c_name), count(DISTINCT c_name),
              CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM customer
       UNION ALL
       SELECT 'c_nationkey', count(c_nationkey), count(DISTINCT c_nationkey),
              round(CAST(min(c_nationkey) AS DOUBLE), 4),
              round(CAST(max(c_nationkey) AS DOUBLE), 4) FROM customer
       UNION ALL
       SELECT 'c_acctbal', count(c_acctbal), count(DISTINCT c_acctbal),
              round(CAST(min(c_acctbal) AS DOUBLE), 4),
              round(CAST(max(c_acctbal) AS DOUBLE), 4) FROM customer
       UNION ALL
       SELECT 'c_mktsegment', count(c_mktsegment), count(DISTINCT c_mktsegment),
              CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE) FROM customer""",
)
def c70(spark, sf_dir):
    """C69 sibling: one-pass any-width column profiler (checks.profile) —
    per column non-null count, exact distinct count, numeric min/max. The
    table is stack-unpivoted inside the scan stage (Generate, no shuffle)
    and ONE groupBy over len(columns) keys computes every stat: the scan
    happens once however many columns the table has, where the naive
    per-column loop (and this oracle) re-reads it N times."""
    from ..checks import profile

    return profile(tables(spark, sf_dir)("customer"))


@q(
    "c71_skew_report",
    """WITH counts AS (
           SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id)
       SELECT count(*) AS n_keys,
              CAST(sum(cnt) AS BIGINT) AS total_rows,
              CAST(max(cnt) AS BIGINT) AS max_cnt,
              round(quantile_cont(cnt, 0.5), 4) AS p50_cnt,
              round(quantile_cont(cnt, 0.99), 4) AS p99_cnt,
              round(CAST(max(cnt) AS DOUBLE) / sum(cnt), 6) AS top_share
       FROM counts""",
)
def c71(spark, sf_dir):
    """C70 sibling: key-skew diagnostic (scale.skew_report) — the one-row
    frame you read before choosing salting / broadcast / AQE-skew handling
    for a join or agg on this key. One count agg over keys + one global
    agg over the per-key counts."""
    from ..scale import skew_report

    return skew_report(tables(spark, sf_dir)("events"), "user_id")
