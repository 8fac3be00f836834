"""Window functions — SURVEY §2 C35–C40 (pandas rank/shift/cumsum/rolling).

Every window partitions by a real key (never a global single-partition
window), so state stays bounded per executor at any scale. Orderings always
include a unique tiebreaker column — determinism under ties is what makes
these hash-comparable (SURVEY §7 discipline).
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ._util import registry, tables

QUERIES, ORACLE, q = registry()


@q(
    "c35_ranking",
    """SELECT c_custkey, c_nationkey,
              row_number() OVER w AS rn,
              rank()       OVER w AS rnk,
              dense_rank() OVER w AS drnk,
              ntile(4)     OVER w AS quartile,
              round(percent_rank() OVER w, 8) AS pct
       FROM customer
       WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)""",
)
def c35(spark, sf_dir):
    """C35: ranking family over (nation, balance) with custkey tiebreak."""
    c = tables(spark, sf_dir)("customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 8).alias("pct"),
    )


@q(
    "c36_lag_lead",
    """SELECT event_id, user_id,
              lag(value)  OVER w AS prev_value,
              lead(value) OVER w AS next_value,
              value - lag(value, 1, 0.0) OVER w AS delta
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY event_id)""",
)
def c36(spark, sf_dir):
    """C36: lag/lead (pandas `shift`) per user in event order."""
    e = tables(spark, sf_dir)("events")
    w = W.partitionBy("user_id").orderBy("event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - F.lag("value", 1, 0.0).over(w)).alias("delta"),
    )


@q(
    "c37_cumsum",
    """SELECT o_custkey, o_orderkey,
              CAST(sum(CAST(o_totalprice AS DECIMAL(18,4)))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend,
              count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
                             ROWS UNBOUNDED PRECEDING) AS running_n
       FROM orders""",
)
def c37(spark, sf_dir):
    """C37: cumulative agg (pandas `cumsum`) — decimal running sum so the
    prefix order is the only order that matters (exact arithmetic)."""
    o = tables(spark, sf_dir)("orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).over(w).cast("double").alias(
            "running_spend"
        ),
        F.count("*").over(w).alias("running_n"),
    )


@q(
    "c38_rolling",
    """SELECT event_id, user_id,
              round(CAST(sum(CAST(value AS DECIMAL(18,4)))
                         OVER w AS DOUBLE) / count(value) OVER w, 6) AS rolling_avg3,
              min(value) OVER w AS rolling_min3
       FROM events
       WINDOW w AS (PARTITION BY user_id ORDER BY event_id
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""",
)
def c38(spark, sf_dir):
    """C38: fixed-size rolling window (pandas `rolling(3)`)."""
    e = tables(spark, sf_dir)("events")
    w = W.partitionBy("user_id").orderBy("event_id").rowsBetween(-2, 0)
    dec_sum = F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double")
    return e.select(
        "event_id",
        "user_id",
        F.round(dec_sum / F.count("value").over(w), 6).alias("rolling_avg3"),
        F.min("value").over(w).alias("rolling_min3"),
    )


@q(
    "c39_range_window",
    """SELECT event_id, user_id,
              count(*) OVER w AS n_10min,
              CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_10min
       FROM (SELECT event_id, user_id, value, epoch_us(ts) AS ts_us FROM events)
       WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                    RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)""",
)
def c39(spark, sf_dir):
    """C39: time-based range frame (pandas `rolling('10min')`) over epoch µs."""
    e = tables(spark, sf_dir)("events").withColumn("ts_us", F.unix_micros("ts"))
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-600_000_000, 0)  # 10 minutes in µs
    )
    return e.select(
        "event_id",
        "user_id",
        F.count("*").over(w).alias("n_10min"),
        F.sum(F.col("value").cast("decimal(18,4)")).over(w).cast("double").alias("sum_10min"),
    )


@q(
    "c40_topk_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders)
       WHERE rn <= 3""",
)
def c40(spark, sf_dir):
    """C40: top-k per group (pandas groupby.nlargest) — rank + filter; Spark
    pushes the k-limit into the window sort (WindowGroupLimit)."""
    o = tables(spark, sf_dir)("orders")
    w = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@q(
    "c35b_value_windows",
    """SELECT o_orderkey, o_custkey,
              first_value(o_orderstatus) OVER w AS first_status,
              last_value(o_orderstatus)  OVER w AS last_status,
              nth_value(o_orderstatus, 2) OVER w AS second_status,
              round(cume_dist() OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 8) AS cd
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""",
)
def c35b(spark, sf_dir):
    """C35 variant: value window functions (first/last/nth_value, cume_dist).
    The frame is pinned to the full partition explicitly — last_value under
    the default frame is the current row on every engine, a classic
    cross-engine trap this query documents by avoiding."""
    o = tables(spark, sf_dir)("orders")
    wfull = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    wcd = W.partitionBy("o_custkey").orderBy("o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first("o_orderstatus").over(wfull).alias("first_status"),
        F.last("o_orderstatus").over(wfull).alias("last_status"),
        F.nth_value("o_orderstatus", 2).over(wfull).alias("second_status"),
        F.round(F.cume_dist().over(wcd), 8).alias("cd"),
    )


@q(
    "c37b_cummax_pct_change",
    """SELECT o_custkey, o_orderkey,
              max(o_totalprice) OVER w AS running_max,
              min(o_totalprice) OVER w AS running_min,
              round(CASE WHEN lag(o_totalprice) OVER
                              (PARTITION BY o_custkey ORDER BY o_orderkey) IS NULL
                         THEN NULL
                         ELSE o_totalprice
                              / lag(o_totalprice) OVER
                                (PARTITION BY o_custkey ORDER BY o_orderkey) - 1
                    END, 6) AS pct_change
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS UNBOUNDED PRECEDING)""",
)
def c37b(spark, sf_dir):
    """C37 variant: pandas `cummax`/`cummin`/`pct_change` — running
    extremes (exact on doubles) and per-row relative change, same single
    window re-key as c37."""
    o = tables(spark, sf_dir)("orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wl = W.partitionBy("o_custkey").orderBy("o_orderkey")
    prev = F.lag("o_totalprice").over(wl)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.max("o_totalprice").over(w).alias("running_max"),
        F.min("o_totalprice").over(w).alias("running_min"),
        F.round(F.col("o_totalprice") / prev - 1, 6).alias("pct_change"),
    )


@q(
    "c36b_diff",
    """SELECT event_id, user_id,
              round(value - lag(value) OVER (PARTITION BY user_id
                                             ORDER BY epoch_us(ts), event_id), 6) AS diff
       FROM events""",
)
def c36b(spark, sf_dir):
    """C36 variant: pandas `diff()` — per-user first difference of the
    event value in time order (event_id tie-break for determinism). Same
    single window re-key as c36; the subtraction is one IEEE op on
    identical inputs, rounded only as belt-and-braces."""
    e = tables(spark, sf_dir)("events")
    w = W.partitionBy("user_id").orderBy(F.unix_micros("ts"), "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("diff"),
    )
