"""Sort / limit / sample / set operations — SURVEY §2 C41–C47.

Limits are always paired with a total order (unique tiebreak) — an unordered
LIMIT is nondeterministic on any engine, and at scale Spark turns
ORDER BY + LIMIT into TakeOrderedAndProject (no full sort, no single-node
shuffle of the whole table).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ._util import registry, tables
from .._localrel import local_rows_df

QUERIES, ORACLE, q = registry()


@q(
    "c41_sort",
    """SELECT o_orderkey, o_orderstatus, o_totalprice
       FROM orders
       ORDER BY o_orderstatus DESC, o_totalprice ASC, o_orderkey
       LIMIT 500""",
)
def c41(spark, sf_dir):
    """C41: multi-key sort (desc/asc mix); LIMIT makes ordering observable
    under the driver's order-insensitive hash."""
    o = tables(spark, sf_dir)("orders")
    return (
        o.orderBy(
            F.col("o_orderstatus").desc_nulls_last(),
            F.col("o_totalprice").asc_nulls_first(),
            "o_orderkey",
        )
        .limit(500)
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    )


@q(
    "c42_limit",
    "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 50",
)
def c42(spark, sf_dir):
    """C42: limit/head over a deterministic order."""
    o = tables(spark, sf_dir)("orders")
    return o.orderBy("o_orderkey").limit(50).select("o_orderkey", "o_totalprice")


@q(
    "c43_topk",
    """SELECT o_orderkey, o_custkey, o_totalprice
       FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
)
def c43(spark, sf_dir):
    """C43: global top-k (pandas `nlargest`) — TakeOrderedAndProject: each
    partition keeps k rows, driver merges k·p rows, never the full table."""
    o = tables(spark, sf_dir)("orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


@q("c44_sample")  # rows-only: sampling algorithms differ across engines
def c44(spark, sf_dir):
    """C44: Bernoulli sample with a fixed seed (reproducible within Spark)."""
    li = tables(spark, sf_dir)("lineitem")
    return li.sample(fraction=0.1, seed=42).select("l_orderkey", "l_linenumber")


@q(
    "c45_union_all",
    """SELECT o_orderkey, o_totalprice, 'high' AS bucket FROM orders WHERE o_totalprice > 300000
       UNION ALL
       SELECT o_orderkey, o_totalprice, 'low' AS bucket FROM orders WHERE o_totalprice < 10000""",
)
def c45(spark, sf_dir):
    """C45: union all by name (pandas `concat`)."""
    o = tables(spark, sf_dir)("orders")
    hi = o.filter(F.col("o_totalprice") > 300000).select(
        "o_orderkey", "o_totalprice", F.lit("high").alias("bucket")
    )
    lo = o.filter(F.col("o_totalprice") < 10000).select(
        "o_orderkey", "o_totalprice", F.lit("low").alias("bucket")
    )
    return hi.unionByName(lo)


@q(
    "c46_union_distinct",
    """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 9000
       UNION
       SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 400000""",
)
def c46(spark, sf_dir):
    """C46: union distinct."""
    t = tables(spark, sf_dir)
    a = t("customer").filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("custkey")
    )
    b = t("orders").filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.union(b).distinct()


@q(
    "c47_intersect",
    """SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
       INTERSECT
       SELECT o_custkey FROM orders""",
)
def c47(spark, sf_dir):
    """C47: intersect (distinct semantics)."""
    t = tables(spark, sf_dir)
    a = t("customer").filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    b = t("orders").select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b)


@q(
    "c47b_except",
    """SELECT c_custkey AS custkey FROM customer
       EXCEPT
       SELECT o_custkey FROM orders WHERE o_totalprice > 100000""",
)
def c47b(spark, sf_dir):
    """C47: except (distinct semantics)."""
    t = tables(spark, sf_dir)
    a = t("customer").select(F.col("c_custkey").alias("custkey"))
    b = t("orders").filter(F.col("o_totalprice") > 100000).select(
        F.col("o_custkey").alias("custkey")
    )
    return a.subtract(b)  # subtract == EXCEPT DISTINCT


@q(
    "c47c_except_all",
    """SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0
       EXCEPT ALL
       SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0""",
)
def c47c(spark, sf_dir):
    """C47 variant: EXCEPT ALL (bag semantics — multiplicities subtract,
    unlike the distinct-set c47b). Spark plans a left-anti-style hash
    aggregate on counts; fully partial-aggregable."""
    o = tables(spark, sf_dir)("orders")
    a = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderstatus", "o_orderpriority")
    b = o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderstatus", "o_orderpriority")
    return a.exceptAll(b)


@q(
    "c47d_intersect_all",
    """SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 3 = 0
       INTERSECT ALL
       SELECT o_orderstatus, o_orderpriority FROM orders WHERE o_orderkey % 2 = 0""",
)
def c47d(spark, sf_dir):
    """C47 variant: INTERSECT ALL (bag semantics — min of multiplicities)."""
    o = tables(spark, sf_dir)("orders")
    a = o.filter(F.col("o_orderkey") % 3 == 0).select("o_orderstatus", "o_orderpriority")
    b = o.filter(F.col("o_orderkey") % 2 == 0).select("o_orderstatus", "o_orderpriority")
    return a.intersectAll(b)


@q(
    "c45b_union_missing_columns",
    """SELECT * FROM (
         SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 100 = 0
         UNION ALL BY NAME
         SELECT o_orderkey, o_orderpriority FROM orders WHERE o_orderkey % 100 = 1)""",
)
def c45b(spark, sf_dir):
    """C45 variant: union by name with missing columns (pandas `concat` of
    heterogeneous frames) — absent columns NULL-pad per side."""
    o = tables(spark, sf_dir)("orders")
    a = o.filter(F.col("o_orderkey") % 100 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    b = o.filter(F.col("o_orderkey") % 100 == 1).select("o_orderkey", "o_orderpriority")
    return a.unionByName(b, allowMissingColumns=True)


@q(
    "c42b_offset_pagination",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey
       LIMIT 50 OFFSET 100""",
)
def c42b(spark, sf_dir):
    """C42 variant: LIMIT/OFFSET pagination over a total order (page 3 of a
    leaderboard). Spark plans offset+limit as a single top-(offset+limit)
    with the prefix dropped — no full sort."""
    o = tables(spark, sf_dir)("orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .offset(100)
        .limit(50)
    )


@q(
    "c41b_global_row_index",
    """SELECT o_orderkey, o_custkey,
              row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS row_index
       FROM orders""",
)
def c41b(spark, sf_dir):
    """C41 variant: deterministic global row numbering without the
    single-task global window (scale.global_row_index: range partition ->
    local rank -> tiny offset table; the only converging data is one count
    row per partition). Oracle states the semantics as the naive
    OVER (ORDER BY ...); the engine computes identical numbers with
    bounded per-task state."""
    from ..scale import global_row_index

    o = tables(spark, sf_dir)("orders").select("o_orderkey", "o_custkey", "o_totalprice")
    out = global_row_index(
        o,
        [F.col("o_totalprice").desc(), F.col("o_orderkey")],
        index_col="row_index",
        n_partitions=8,
    )
    return out.select("o_orderkey", "o_custkey", "row_index")


@q(
    "c44b_sample_invariants",
    """SELECT 'rows_not_in_source' AS rule, CAST(0 AS BIGINT) AS val
       UNION ALL
       SELECT 'size_within_5_sigma', CAST(1 AS BIGINT)
       UNION ALL
       SELECT 'oversampled_keys', CAST(0 AS BIGINT)""",
)
def c44b(spark, sf_dir):
    """C44 certification frame: the sampled row SET is seed/partitioning-
    specific (c44 stays rows-only), but the sampling CONTRACT is
    checkable — every sampled row exists in the source, the sample size
    sits within 5σ of n·p (Bernoulli sampling; 5σ makes the flag
    deterministic in practice), and without-replacement sampling never
    takes a key MORE times than the source holds it (the fixture's
    (orderkey, linenumber) is not unique, so the check compares per-key
    multiplicities, not uniqueness)."""
    li = tables(spark, sf_dir)("lineitem")
    p = 0.1
    s = li.sample(fraction=p, seed=42)
    n = li.count()
    keys = ["l_orderkey", "l_linenumber"]
    not_in_source = s.join(li, keys, "left_anti").count()
    oversampled = (
        s.groupBy(*keys).agg(F.count("*").alias("ns"))
        .join(li.groupBy(*keys).agg(F.count("*").alias("nsrc")), keys)
        .filter(F.col("ns") > F.col("nsrc"))
        .count()
    )
    ns = s.count()
    import math

    sigma = math.sqrt(n * p * (1 - p))
    within = 1 if abs(ns - n * p) <= 5 * sigma else 0
    rows = [
        ("rows_not_in_source", not_in_source),
        ("size_within_5_sigma", within),
        ("oversampled_keys", oversampled),
    ]
    return local_rows_df(spark, rows, "rule string, val long")


@q(
    "c44c_deterministic_sample",
    """SELECT doc_id, lang, source FROM documents
       ORDER BY md5(doc_id::VARCHAR) LIMIT 100""",
)
def c44c(spark, sf_dir):
    """C44 variant: exact-n DETERMINISTIC pseudo-random sample — order by
    an id hash, take n. Engine/layout/re-run independent (the auditable
    counterpart of seeded `sample`, which the driver can only rows-check),
    uniform because md5 order is independent of any data order. Plans as
    TakeOrderedAndProject: per-partition top-n, n-row driver merge — no
    global sort shuffle."""
    d = tables(spark, sf_dir)("documents")
    return (
        d.select("doc_id", "lang", "source")
        .orderBy(F.md5(F.col("doc_id").cast("string")))
        .limit(100)
    )
