"""Explicit skew-mitigation operators — the 100 TB toolbox.

AQE's skew-join splitting handles most runtime skew automatically
(session.py turns it on), but two patterns still need the query author:
a *salted aggregation* when one group key carries a disproportionate share
of rows, and a *salted join* when a skewed fact key meets a small-but-not-
broadcastable dimension. Both are pure DataFrame compositions.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over salted keys.

    Phase 1 groups by (keys…, salt) so a hot key's rows spread over n_salts
    reducers; phase 2 merges the partials by the real keys. Supported aggs
    (value per output column name): ("sum", col), ("count",), ("min", col),
    ("max", col) — the merge of each is itself (sum of sums, sum of counts,
    min of mins, max of maxes), which is what makes two-phase legal.

    Spark's partial aggregation already does this *within* a partition; the
    salt extends it *across* reducers, which matters when one key exceeds a
    single reducer's share — at 1000 executors a key holding 1% of 100 TB
    is 1 TB on one reducer without it.
    """
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id(), F.lit(n_salts)))
    phase1 = []
    merge = []
    for out_name, spec in aggs.items():
        op = spec[0]
        if op == "sum":
            phase1.append(F.sum(spec[1]).alias(out_name))
            merge.append(F.sum(out_name).alias(out_name))
        elif op == "count":
            phase1.append(F.count("*").alias(out_name))
            merge.append(F.sum(out_name).alias(out_name))
        elif op == "min":
            phase1.append(F.min(spec[1]).alias(out_name))
            merge.append(F.min(out_name).alias(out_name))
        elif op == "max":
            phase1.append(F.max(spec[1]).alias(out_name))
            merge.append(F.max(out_name).alias(out_name))
        else:
            raise ValueError(f"unsupported two-phase agg {op!r}")
    partial = salted.groupBy(*keys, "__salt").agg(*phase1)
    return partial.groupBy(*keys).agg(*merge)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the fact side salted and the dimension side replicated.

    Each fact row gets a random-ish salt (deterministic: hash of all its
    columns), each dim row is exploded n_salts times, and the join key
    becomes (key, salt) — a hot fact key now lands on n_salts reducers
    instead of one. Use when the dim is too big to broadcast but small
    enough to replicate n_salts×; otherwise prefer AQE's skew handling.
    """
    f = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*fact.columns), F.lit(n_salts)).cast("int")
    )
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return f.join(d, [on, "__salt"], how).drop("__salt")


def global_row_index(
    df: DataFrame,
    order_by: Sequence[str],
    index_col: str = "row_index",
    n_partitions: int | None = None,
) -> DataFrame:
    """Deterministic 1-based global row number in ``order_by`` order WITHOUT
    a single-partition window (pandas ``reset_index`` / ``RANK()`` over the
    whole table).

    A bare ``row_number().OVER (ORDER BY …)`` funnels the entire dataset
    through ONE task — the classic 100 TB cliff. This does it in three
    bounded steps: range-repartition on the order keys (each partition owns
    a contiguous key range), rank within partitions, then add per-partition
    offsets computed from a partition-count table that is `n_partitions`
    rows — the only data that ever converges. Requires ``order_by`` to be a
    total order (include a unique tiebreak column) for a deterministic
    result.
    """
    from pyspark.sql import Window

    from pyspark import StorageLevel
    from pyspark.sql import Column

    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism
    cols = [c if isinstance(c, Column) else F.col(c) for c in order_by]
    # persist pins ONE range-partitioner sampling: the rank branch and the
    # offset branch below both read this materialization. Without it each
    # action re-samples boundaries independently and partition assignments
    # diverge between the two branches — indexes duplicate/skip. (Repeated
    # invocations dedupe through Spark's CacheManager plan matching.)
    ranged = (
        df.repartitionByRange(n_partitions, *cols)
        .withColumn("__pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    w_in = Window.partitionBy("__pid").orderBy(*cols)
    ranked = ranged.withColumn("__rn", F.row_number().over(w_in))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy("__pid")
        .count()
        .withColumn("__offset", F.coalesce(F.sum("count").over(w_off), F.lit(0)))
        .select("__pid", "__offset")
    )
    return (
        ranked.join(F.broadcast(offsets), "__pid")
        .withColumn(index_col, (F.col("__rn") + F.col("__offset")).cast("long"))
        .drop("__pid", "__rn", "__offset")
    )


def exact_ntile(
    df: DataFrame,
    order_by: Sequence,
    n: int,
    bucket_col: str = "bucket",
    max_single_task_rows: int | None = 2_000_000,
    n_partitions: int | None = None,
) -> DataFrame:
    """Exact SQL ``ntile(n)`` membership WITHOUT an unbounded
    single-partition window (VERDICT r5 #7 — x26's documented scale path,
    promoted to code).

    Two tiers, the ``pq_topk`` treatment: when the frame fits one window
    task (``count() <= max_single_task_rows``) this IS ``F.ntile`` over a
    global window — cheapest at small cardinality and bit-identical to the
    SQL oracle. Above the bound (or with ``max_single_task_rows=None``)
    it composes :func:`global_row_index` (range repartition + per-partition
    rank + broadcast offsets — no task ever sees more than its key range)
    with closed-form bucket arithmetic: for N rows, q = N div n, r = N mod
    n, the first r buckets take q+1 rows — exactly SQL ntile's split —
    so membership needs only the row index and a 1-row total broadcast to
    compute, never a global sort on one task. Requires ``order_by`` to be
    a total order (unique tiebreak) for a deterministic result.
    """
    from pyspark.sql import Window

    if max_single_task_rows is not None and df.count() <= max_single_task_rows:
        return df.withColumn(
            bucket_col, F.ntile(n).over(Window.orderBy(*order_by))
        )
    idx = global_row_index(df, order_by, "__gidx", n_partitions)
    tot = idx.agg(F.count("*").alias("__N"))
    q = F.floor(F.col("__N") / n)
    r = F.col("__N") % n
    big = r * (q + 1)  # rows covered by the first r (size q+1) buckets
    bucket = F.when(
        F.col("__gidx") <= big, F.floor((F.col("__gidx") - 1) / (q + 1)) + 1
    ).otherwise(r + F.floor((F.col("__gidx") - big - 1) / q) + 1)
    # 1-row total: broadcast nested-loop by construction (the x29/c77 shape)
    return (
        idx.crossJoin(F.broadcast(tot))
        .withColumn(bucket_col, bucket.cast("int"))
        .drop("__gidx", "__N")
    )


def zorder(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 6,
    n_partitions: int | None = None,
) -> DataFrame:
    """Z-order (Morton-curve) layout for multi-dimensional data skipping —
    the OPTIMIZE ZORDER BY pattern, as a pure DataFrame transform.

    Parquet prunes row groups/files from column min/max statistics; a
    layout sorted on one column gives tight stats for that column only.
    Interleaving the bits of rank-bucketed columns clusters rows so EVERY
    z-ordered column's min/max range per file is ~domain/√files (2-D) —
    point/range predicates on any of the columns skip most files.

    Mechanics (all codegen'd, no Python in the row path):

    1. per column: 2^bits quantile boundaries via one approx-quantile
       aggregate (a bounded sketch — the only data reaching the driver);
    2. bucket = #boundaries ≤ value, via a broadcast boundary array and a
       filter/size HOF (rank-based, so skewed distributions still spread
       across buckets);
    3. z-value = bitwise interleave of the bucket bits (shift/or —
       ANSI-safe, no overflow);
    4. ``repartitionByRange(z)`` + ``sortWithinPartitions(z)`` — each
       output file covers one compact z-range.

    ``bits`` trades bucket-search cost (the boundary array scan is
    O(2^bits) per row per column) against cell granularity; the default
    64 buckets/column (4096 cells in 2-D) out-resolves any practical
    file count — skipping happens at file/row-group granularity, so
    extra bits past ~4× the file count buy nothing.

    Write the result with ``DataFrameEngine.save`` (order is preserved
    within partitions) and filters on any clustered column prune at plan
    time. The helper column is dropped; only layout changes.
    """
    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism
    return (
        with_zvalue(df, cols, bits=bits, z_col="__z")
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )


def with_zvalue(
    df: DataFrame, cols: Sequence[str], bits: int = 6, z_col: str = "__z"
) -> DataFrame:
    """Append the Morton z-value column ``zorder`` clusters by, without the
    relayout — for callers that fold z-clustering into their own shuffle
    (``DataFrameEngine.compact(zorder_by=…)`` sorts by it WITHIN partition
    dirs so row groups inside each file take compact z-ranges)."""
    if not cols:
        raise ValueError("zorder requires at least one column")
    if bits * len(cols) > 62:
        raise ValueError("bits × columns must fit in a signed 64-bit z-value")
    n_buckets = 1 << bits
    # one pass: approx quantiles for every clustered column together
    qs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.agg(
        *[
            F.percentile_approx(F.col(c).cast("double"), qs, 10_000).alias(c)
            for c in cols
        ]
    ).first()
    z = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        barr = F.array(*[F.lit(float(b)) for b in bounds[ci]])
        bucket = F.size(
            F.filter(barr, lambda b: b <= F.col(c).cast("double"))
        ).cast("long")
        # interleave: bit i of this column lands at z-bit (i*len(cols)+ci)
        for i in range(bits):
            bit = F.shiftrightunsigned(bucket, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * len(cols) + ci))
    return df.withColumn(z_col, z)


def global_cumsum(
    df: DataFrame,
    order_by: Sequence[str],
    sums: dict[str, str],
    n_partitions: int | None = None,
) -> DataFrame:
    """Running totals in global ``order_by`` order WITHOUT the single-task
    ``OVER (ORDER BY …)`` window — the prefix-sum sibling of
    ``global_row_index`` (same three bounded steps: range-repartition,
    within-partition running sums, broadcast per-partition offsets; the
    only converging data is one totals row per partition).

    ``sums`` maps output column → input column: ``{"cum_tokens":
    "n_tokens"}`` adds a ``cum_tokens`` running total of ``n_tokens``.
    ``order_by`` must be a total order for a deterministic result.
    """
    from pyspark.sql import Column, Window

    if n_partitions is None:
        n_partitions = df.sparkSession.sparkContext.defaultParallelism
    cols = [c if isinstance(c, Column) else F.col(c) for c in order_by]
    from ._scratch import scratch_persist

    # persist pins ONE range-partitioner sampling shared by the running-sum
    # and offsets branches (same contract as global_row_index); the slot-
    # pooled scratch bounds cached generations instead of leaking one
    # MEMORY_AND_DISK copy per call
    ranged = scratch_persist(
        df.repartitionByRange(n_partitions, *cols).withColumn(
            "__pid", F.spark_partition_id()
        ),
        "scale/global_cumsum",
    )
    w_in = (
        Window.partitionBy("__pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = ranged
    for dst, src in sums.items():
        out = out.withColumn(dst, F.sum(src).over(w_in))
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = ranged.groupBy("__pid").agg(
        *[F.sum(src).alias(f"__t_{dst}") for dst, src in sums.items()]
    )
    for dst in sums:
        offsets = offsets.withColumn(
            f"__o_{dst}", F.coalesce(F.sum(f"__t_{dst}").over(w_off), F.lit(0))
        )
    offsets = offsets.select("__pid", *[f"__o_{d}" for d in sums])
    out = out.join(F.broadcast(offsets), "__pid")
    for dst in sums:
        out = out.withColumn(dst, F.col(dst) + F.col(f"__o_{dst}"))
    return out.drop("__pid", *[f"__o_{d}" for d in sums])


def skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Pre-join/agg skew diagnostic: one row describing the key-frequency
    distribution of ``key_col`` — distinct keys, total rows, hottest-key
    count, p50/p99 per-key counts (exact interpolated percentiles), and
    the hottest key's share of all rows. Reading it answers the 100 TB
    planning questions: does this key need salting (`salted_agg`/
    `salted_join`)? will AQE's skew-join threshold trigger?

    Movement: one partial+final count agg over the keys, then a single
    global agg whose input is one row PER KEY (counts, not rows); the
    report frame is 1 row.
    """
    counts = df.groupBy(F.col(key_col).alias("k")).agg(F.count("*").alias("cnt"))
    return (
        counts.agg(
            F.count("*").alias("n_keys"),
            F.sum("cnt").alias("total_rows"),
            F.max("cnt").alias("max_cnt"),
            F.round(F.expr("percentile(cnt, 0.5)"), 4).alias("p50_cnt"),
            F.round(F.expr("percentile(cnt, 0.99)"), 4).alias("p99_cnt"),
        )
        .withColumn(
            "top_share", F.round(F.col("max_cnt") / F.col("total_rows"), 6)
        )
    )
