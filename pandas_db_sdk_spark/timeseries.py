"""Time-series operators — the reference's time-series use case
(reference README.md:92-101: date-keyed tables), given the pandas surface
users actually reach for: resample, forward/backward fill, and a general
as-of join (`merge_asof`).

All window-based: one shuffle on the series key, then ordered in-partition
passes — per-key series length never limits scale, key cardinality does
(the right axis: billions of short series parallelize perfectly).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample(
    df: DataFrame,
    ts_col: str,
    every: str,
    keys: Sequence[str] = (),
    aggs: Optional[dict] = None,
) -> DataFrame:
    """pandas `resample(every).agg(...)`: bucket event time with
    `date_trunc`-style windows and aggregate per (keys…, bucket).

    `every` is a Spark window duration ('5 minutes', '1 hour', '1 day').
    Emits `bucket_start` (timestamp). Buckets with no rows are absent, as
    in a grouped aggregation (use ffill after a calendar join if a dense
    axis is needed).
    """
    aggs = aggs or {"n": F.count("*")}
    exprs = [v.alias(k) for k, v in aggs.items()]
    return (
        df.groupBy(*keys, F.window(ts_col, every).alias("__w"))
        .agg(*exprs)
        .withColumn("bucket_start", F.col("__w.start"))
        .drop("__w")
    )


def ffill(
    df: DataFrame,
    cols: Sequence[str],
    order_col: str,
    keys: Sequence[str] = (),
) -> DataFrame:
    """pandas `groupby(keys).ffill()`: replace NULLs with the last non-null
    value at-or-before the row, per key, ordered by order_col."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def bfill(
    df: DataFrame,
    cols: Sequence[str],
    order_col: str,
    keys: Sequence[str] = (),
) -> DataFrame:
    """pandas `groupby(keys).bfill()`: the mirrored window (first non-null
    at-or-after the row)."""
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.first(c, ignorenulls=True).over(w))
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Sequence[str] = (),
    direction: str = "backward",
    tolerance: Optional[int] = None,
    right_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """pandas `merge_asof`: for each left row, the nearest right row at-or-
    before (`backward`) or at-or-after (`forward`) it on `on`, per `by`
    group, optionally within `tolerance` (same units as `on`).

    Implemented as union + one ordered window pass — a single shuffle on
    the `by` keys, no range join, no per-key row blowup (SURVEY §7 names
    this the hard part of C21; this is the scale-shaped answer).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = list(by)
    right_cols = list(
        right_cols
        if right_cols is not None
        else [c for c in right.columns if c != on and c not in by]
    )

    l = left.withColumn("__side", F.lit(1))
    r = right.select(
        *by, F.col(on), *[F.col(c) for c in right_cols]
    ).withColumn("__side", F.lit(0))
    for c in left.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_cols:
        if c not in l.columns:
            l = l.withColumn(c, F.lit(None).cast(dict(r.dtypes)[c]))
    unioned = l.select(r.columns).unionByName(r)

    # right rows sort before left at equal `on` so exact matches are taken,
    # in both directions (mirrors merge_asof's allow_exact_matches=True)
    if direction == "backward":
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = F.last
    else:
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col(on).asc(), F.col("__side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = F.first

    matched_on = pick(F.when(F.col("__side") == 0, F.col(on)), ignorenulls=True).over(w)
    out = unioned.withColumn("__m_on", matched_on)
    for c in right_cols:
        out = out.withColumn(
            c, pick(F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True).over(w)
        )
    out = out.filter(F.col("__side") == 1)
    if tolerance is not None:
        gap = (
            (F.col(on) - F.col("__m_on"))
            if direction == "backward"
            else (F.col("__m_on") - F.col(on))
        )
        within = F.col("__m_on").isNotNull() & (gap <= tolerance)
        for c in right_cols:
            out = out.withColumn(c, F.when(within, F.col(c)))
        out = out.withColumn("__m_on", F.when(within, F.col("__m_on")))
    return out.drop("__side").withColumnRenamed("__m_on", f"{on}_right")


def interpolate_linear(
    df: DataFrame,
    value_col: str,
    ts_col: str,
    keys: Sequence[str] = (),
    out_col: Optional[str] = None,
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """pandas ``interpolate(method='index')`` per key: nulls between two
    known points take the time-weighted linear value; trailing nulls carry
    the last known value; leading nulls stay null (pandas' default
    limit_direction='forward' behavior).

    Two ordered window passes over one per-key shuffle — the neighbor
    scan pattern: last-known (value, time) forward, first-known backward,
    then pure per-row arithmetic. No Python, no extra shuffle beyond the
    key re-partition. Pass ``tiebreak`` columns (e.g. a unique id) to make
    neighbor choice deterministic when timestamps repeat within a key.
    """
    out_col = out_col or f"{value_col}_interp"
    v, t = F.col(value_col), F.col(ts_col).cast("double")
    order = [ts_col, *tiebreak]
    wp = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wn = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    prev_v = F.last(v, ignorenulls=True).over(wp)
    next_v = F.first(v, ignorenulls=True).over(wn)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(wp)
    next_t = F.first(F.when(v.isNotNull(), t), ignorenulls=True).over(wn)
    frac = (t - prev_t) / (next_t - prev_t)
    interp = (
        F.when(v.isNotNull(), v.cast("double"))
        .when(prev_v.isNull(), F.lit(None).cast("double"))  # leading gap
        .when(next_v.isNull(), prev_v.cast("double"))       # trailing gap
        .otherwise(prev_v.cast("double") + (next_v.cast("double") - prev_v.cast("double")) * frac)
    )
    return df.withColumn(out_col, F.round(interp, 6))


def rolling_zscore(
    df: DataFrame,
    value_col: str,
    order_col: str,
    keys: list[str],
    window: int = 50,
    min_n: int = 10,
    threshold: float = 3.0,
) -> DataFrame:
    """Rolling z-score anomaly flags: each row scored against the mean/std
    of the PRECEDING ``window`` rows in its key group (the current row is
    excluded from its own baseline — no self-masking). Rows with fewer
    than ``min_n`` preceding observations, or a zero-variance baseline,
    get a NULL score.

    Determinism across engines: the two moments use exact decimal sums
    (order-independent partial aggregation), and everything after —
    subtract, divide, sqrt — is correctly-rounded IEEE double arithmetic,
    identical on any engine. One window re-key; per-task state is the
    window frame.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(order_col)
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col)
    n = F.count(value_col).over(w)
    s1 = F.sum(v.cast("decimal(18,4)")).over(w).cast("double")
    s2 = F.sum((v * v).cast("decimal(24,4)")).over(w).cast("double")
    mean = s1 / n
    # decimal squares round per row, so var can come out slightly NEGATIVE
    # for a constant window — gate on var > 0 BEFORE sqrt (sqrt(-x) is NaN
    # here, an engine-dependent error elsewhere)
    var = (s2 - s1 * s1 / n) / (n - 1)
    z = F.when(
        (n >= min_n) & (var > 0),
        F.round((v - mean) / F.sqrt(var), 6) + F.lit(0.0),
    )
    return df.withColumn("n_prev", n).withColumn("z", z).withColumn(
        "is_anomaly", F.coalesce(F.abs(F.col("z")) > threshold, F.lit(False))
    )


def overlapping_interval_pairs(
    df: DataFrame,
    group_col: str,
    start_col: str,
    end_col: str,
    id_cols: list | None = None,
) -> DataFrame:
    """Per group, the COUNT of interval pairs that overlap (closed
    intervals: touching endpoints overlap) — concurrency analysis
    (simultaneous shipments/sessions/jobs) without materializing a single
    pair: the SWEEP-LINE formulation. Each interval contributes a +1
    event at its start and a -1 after its end; walking events in time
    order, every start sees ``running-1`` already-active intervals — the
    pairs it completes — and the per-group total is one SUM.

    One group-keyed window + the same-keyed aggregate = one exchange, and
    the work is O(n log n) per group vs the O(n²) pair join the naive
    form (and the single-node oracle) performs. Ties: starts sort before
    ends at the same timestamp (closed-interval touching counts), and the
    pair total is invariant to the order among equal starts.
    """
    from pyspark.sql import Window as W

    id_cols = id_cols or []
    starts = df.select(
        F.col(group_col).alias("g"),
        F.col(start_col).alias("t"),
        F.lit(0).alias("typ"),
        F.lit(1).alias("delta"),
        *[F.col(c) for c in id_cols],
    )
    ends = df.select(
        F.col(group_col).alias("g"),
        F.col(end_col).alias("t"),
        F.lit(1).alias("typ"),
        F.lit(-1).alias("delta"),
        *[F.col(c) for c in id_cols],
    )
    events = starts.union(ends)
    w = (
        W.partitionBy("g")
        .orderBy("t", "typ", *id_cols)
        .rowsBetween(W.unboundedPreceding, 0)
    )
    swept = events.withColumn("running", F.sum("delta").over(w))
    return (
        swept.filter(F.col("typ") == 0)
        .groupBy(F.col("g").alias(group_col))
        .agg(
            F.count("*").alias("n_intervals"),
            F.sum(F.col("running") - 1).alias("n_overlapping_pairs"),
        )
    )


def ewma(
    df: DataFrame,
    key_cols,
    order_cols,
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponentially weighted moving average — the recursion
    y_0 = x_0, y_t = (1-α)·y_{t-1} + α·x_t (pandas ``ewm(adjust=False)``).

    This is the canonical NON-associative scan: no window-function algebra
    expresses it (every prefix depends on the full prefix), and the
    algebraic rewrite Σ α(1-α)^{t-j}x_j needs (1-α)^{-j} factors that
    overflow past ~800 rows — so this is the sanctioned Arrow path:
    ``applyInPandas`` per key with a numpy scan replaying the literal
    recurrence ``y = (1-α)·y + α·x`` in that exact float-op order. NOT
    pandas' ``ewm(adjust=False)`` C kernel: that one normalizes by
    ``(1-α)+α``, which is not 1.0 in IEEE double (0.7+0.3 ≈ 1-5.6e-17),
    so over 10⁴-row series its ulp drift diverges from a RECURSIVE-CTE
    replay of the recurrence and crosses 6-dp rounding boundaries (seen
    at sf0.1: 6 rows). The scan multiplies by the computed complement
    ``1.0 - α`` — any SQL oracle must spell the coefficient the same way
    (``(1.0 - 0.3)``, not the literal ``0.7``, a DIFFERENT double).
    State is one float per key; group rows stream through Arrow batches;
    the only shuffle is the key re-partition every stateful per-key op
    pays. Output carries the key, order and value columns plus
    ``out_col``.
    """
    import numpy as np

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    orders = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    sub = df.select(*keys, *orders, value_col)
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sub.schema.fields
    )
    comp = 1.0 - alpha

    def fn(pdf):
        pdf = pdf.sort_values(orders, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=float)
        y = np.empty_like(x)
        if len(x):
            prev = x[0]
            y[0] = prev
            for t in range(1, len(x)):
                prev = comp * prev + alpha * x[t]
                y[t] = prev
        pdf[out_col] = y
        return pdf

    return sub.groupBy(*keys).applyInPandas(fn, f"{fields}, {out_col} double")


def seasonal_decompose(
    df: DataFrame,
    key_cols,
    day_col: str,
    value_col: str,
    period: int = 7,
) -> DataFrame:
    """Classical additive seasonal decomposition per key series
    (statsmodels ``seasonal_decompose(model='additive')`` over a daily
    series): value = trend + seasonal + residual.

    * ``trend`` — centered moving average over ``period`` ROWS (the
      ±period//2 frame), defined only where the frame is full (series
      edges yield null, the statsmodels convention); requires odd period.
    * ``seasonal`` — the per-phase mean of the detrended series
      (phase = days-since-epoch mod period — pure integer arithmetic, so
      it is identical in any SQL engine, unlike dayofweek whose origin
      differs between Spark and DuckDB), re-centered to sum to zero per
      key so the seasonal term carries no level.
    * ``resid`` — value - trend - seasonal where trend is defined.

    Every window is PARTITIONED BY the key columns — a series is one
    key's calendar, bounded by elapsed time (10³–10⁴ rows) regardless of
    corpus size, so the per-key sort never becomes the single-task
    global-window cliff; the trend frames and phase means all ride exact
    decimal accumulators, so the decomposition is independent of both
    partitioning and the engine's window-evaluation order.

    Returns (*keys, day_col, value, trend, seasonal, resid), components
    rounded to 6 dp.
    """
    if period % 2 == 0:
        raise ValueError("seasonal_decompose requires an odd period")
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    half = period // 2
    w = (
        Window.partitionBy(*keys)
        .orderBy(day_col)
        .rowsBetween(-half, half)
    )
    base = df.select(
        *keys,
        day_col,
        F.col(value_col).alias("value"),
        F.pmod(
            F.datediff(F.col(day_col), F.to_date(F.lit("1970-01-01"))),
            F.lit(period),
        ).alias("__phase"),
    ).withColumn(
        # decimal window sum, not avg-over-doubles: DuckDB evaluates sliding
        # frames with a segment tree (different summation order than Spark's
        # frame scan), and exact decimal addition is the only order-free sum
        "trend",
        F.when(
            F.count("value").over(w) == period,
            F.round(
                F.sum(F.col("value").cast("decimal(28,10)")).over(w).cast("double")
                / period,
                6,
            ),
        ),
    )
    phase_means = (
        base.filter(F.col("trend").isNotNull())
        .groupBy(*keys, "__phase")
        .agg(
            (
                F.sum((F.col("value") - F.col("trend")).cast("decimal(28,10)")).cast(
                    "double"
                )
                / F.count("*")
            ).alias("__pm")
        )
    )
    centered = phase_means.withColumn(
        "seasonal",
        F.round(
            F.col("__pm")
            - F.sum(F.col("__pm").cast("decimal(28,10)")).over(
                Window.partitionBy(*keys)
            ).cast("double")
            / F.count("*").over(Window.partitionBy(*keys)),
            6,
        ),
    ).select(*keys, "__phase", "seasonal")
    return (
        base.join(centered, [*keys, "__phase"], "left")
        .select(
            *keys,
            day_col,
            "value",
            "trend",
            "seasonal",
            F.round(
                F.col("value") - F.col("trend") - F.col("seasonal"), 6
            ).alias("resid"),
        )
    )


def holt_linear(
    df: DataFrame,
    key_cols,
    order_cols,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
) -> DataFrame:
    """Per-key Holt double exponential smoothing (level + trend) — the
    forecasting step up from ``ewma`` when series drift:

        l_t = α·x_t + (1-α)·(l_{t-1} + b_{t-1})
        b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1},   l_0 = x_0, b_0 = 0

    Like ewma this is a NON-associative scan (the [l, b] state is a
    2-vector affine recurrence), so it runs on the sanctioned Arrow path:
    ``applyInPandas`` per key with a numpy loop over the group — state is
    two floats per key, group size is bounded by per-key history, and the
    only shuffle is the key re-partition. The same float-op order as a
    RECURSIVE CTE replay makes it oracle-exact to 6 dp — provided the
    oracle spells the complements as computed ``(1.0 - α)`` / ``(1.0 -
    β)``, not literal 0.7/0.9 (1-ulp-different doubles; see ``ewma``).

    Returns (*keys, *orders, value, level, trend, forecast) where
    ``forecast`` is the one-step-ahead prediction l_t + b_t.
    """
    import numpy as np

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    orders = [order_cols] if isinstance(order_cols, str) else list(order_cols)
    sub = df.select(*keys, *orders, value_col)
    fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in sub.schema.fields
    )

    def fn(pdf):
        pdf = pdf.sort_values(orders, kind="mergesort")
        x = pdf[value_col].to_numpy(dtype=float)
        lev = np.empty_like(x)
        tr = np.empty_like(x)
        l_p, b_p = x[0], 0.0
        lev[0], tr[0] = l_p, b_p
        for t in range(1, len(x)):
            l_t = alpha * x[t] + (1.0 - alpha) * (l_p + b_p)
            b_t = beta * (l_t - l_p) + (1.0 - beta) * b_p
            lev[t], tr[t] = l_t, b_t
            l_p, b_p = l_t, b_t
        pdf["level"] = lev
        pdf["trend"] = tr
        pdf["forecast"] = lev + tr
        return pdf

    return sub.groupBy(*keys).applyInPandas(
        fn, f"{fields}, level double, trend double, forecast double"
    )


def interval_coverage(
    df: DataFrame,
    group_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per group, the UNION length of its (closed, integer-day) intervals:
    merge overlapping/touching intervals and sum the merged spans — "how
    many distinct days was this supplier actually shipping", the
    utilization/coverage complement to ``overlapping_interval_pairs``'s
    concurrency count.

    Classic gaps-and-islands on a group-keyed window: an interval starts
    a new island iff its start exceeds the running max end of everything
    earlier (closed intervals: start = max_end + 1 still touches via day
    granularity only when start <= max_end + 1 — strictly greater by >1
    opens a gap); the island id is the running count of such breaks, and
    each island contributes max(end) - min(start) + 1 days. One exchange
    (everything keyed by group), O(n log n) per group — never a pair
    join.

    Returns (group, n_intervals bigint, covered_days bigint,
    span_days bigint).
    """
    from pyspark.sql import Window as W

    w_order = W.partitionBy("__g").orderBy("__s", "__e")
    prev_max_end = F.max("__e").over(w_order.rowsBetween(W.unboundedPreceding, -1))
    base = (
        df.select(
            F.col(group_col).alias("__g"),
            F.col(start_col).alias("__s"),
            F.col(end_col).alias("__e"),
        )
        .withColumn(
            "__break",
            (
                F.col("__s")
                > F.coalesce(prev_max_end, F.col("__s")) + 1
            ).cast("int")
            # the first row of a group has no predecessor: coalesce makes
            # its break flag 0 so island ids start at 0
        )
        .withColumn(
            "__island",
            F.sum("__break").over(w_order.rowsBetween(W.unboundedPreceding, 0)),
        )
    )
    islands = base.groupBy("__g", "__island").agg(
        F.count("*").alias("n"),
        (F.max("__e") - F.min("__s") + 1).alias("len"),
        F.min("__s").alias("s0"),
        F.max("__e").alias("e1"),
    )
    return (
        islands.groupBy(F.col("__g").alias(group_col))
        .agg(
            F.sum("n").cast("long").alias("n_intervals"),
            F.sum("len").cast("long").alias("covered_days"),
            (F.max("e1") - F.min("s0") + 1).cast("long").alias("span_days"),
        )
    )


def cusum_changepoint(
    series: DataFrame,
    order_col: str,
    value_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Single most-likely mean-shift changepoint of a series by the CUSUM
    criterion: with S_t = Σ_{i<=t} (x_i - x̄), the changepoint is the t
    maximizing |S_t| (the exact argmax of the squared-error split
    criterion for one mean shift). The "when did this metric move"
    primitive behind drift alarms and incident timelines.

    Distributed shape: the running sum is ``scale.global_cumsum``
    (range-partitioned prefix sums — no single-task global window); the
    criterion is evaluated MULTIPLIED THROUGH by n — U_t = n·cum_x(t) −
    t·Σx, the same argmax as |S_t| since n > 0 — so every comparison
    happens on EXACT decimals (no division, whose result type differs
    between engines) and the argmax is hash-certifiable bit-for-bit.
    The single division |U|/n back to S-units happens once, in double,
    on the final 1-row result. One max-aggregate + one broadcast-filter
    pass finds the earliest t attaining the max (deterministic
    tie-break).

    Returns one row: (change_at, n_points bigint, max_abs_cusum double,
    mean double).
    """
    from decimal import Decimal

    from .scale import global_cumsum

    dec = "decimal(28,6)"
    # Bounded 1-row collect (the ks_two_sample arity-check discipline):
    # the totals feed BOTH the broadcast stitch below and an explicit
    # magnitude assertion.  Under non-ANSI Spark a decimal(38,6) overflow
    # in n·cum − t·Σx casts to NULL, which would silently DROP rows from
    # the argmax instead of failing; |cum| ≤ Σ|x| and t ≤ n bound every
    # product by n·Σ|x|, so checking that here turns the silent skew into
    # a raise.  Σ|x| must also fit the decimal(27,6) operand cast.
    totals = series.agg(
        F.count("*").cast("long").alias("__n"),
        F.sum(F.col(value_col).cast(dec)).cast(dec).alias("__sum"),
        F.sum(F.abs(F.col(value_col)).cast(dec)).cast(dec).alias("__abs"),
        # per-value overflow probe: a SINGLE |x| >= 1e22 NULLs out of the
        # decimal(28,6) cast under non-ANSI Spark, silently UNDERSTATING
        # sum|x| — so the envelope check below would pass while rows still
        # drop from the argmax.  max(|x|) in double (never NULLs) bounds
        # every individual value under the cast's capacity.
        F.max(F.abs(F.col(value_col).cast("double"))).alias("__max_abs"),
    )
    try:
        totals = totals.collect()[0]
    except Exception as e:  # ANSI mode: the per-value cast raises here
        # Match the error CLASS as well as the message (ADVICE r9): a
        # Spark version that reports the cast overflow with an error-
        # class-only message ("CAST_OVERFLOW" / "NUMERIC_VALUE_OUT_OF_
        # RANGE") and no "decimal" substring should still get the
        # curated guidance, not the raw exception.
        cls = ""
        for probe in ("getCondition", "getErrorClass"):
            try:
                cls = getattr(e, probe)() or ""
                break
            except Exception:
                continue
        marker = str(e) + " " + cls
        if (
            "ecimal" not in marker
            and "OVERFLOW" not in marker
            and "OUT_OF_RANGE" not in marker
        ):
            raise
        raise ValueError(
            "cusum_changepoint: a value's magnitude exceeds the exact-"
            "decimal envelope (decimal(28,6) cast overflow); every |x| "
            "must stay below 1e21 — rescale the series"
        ) from e
    n_rows, total, total_abs = totals["__n"], totals["__sum"], totals["__abs"]
    max_abs = totals["__max_abs"]
    if max_abs is not None and max_abs >= 1e21:
        raise ValueError(
            "cusum_changepoint: a value's magnitude exceeds the exact-"
            f"decimal envelope (max|x|={max_abs!r}); every |x| must stay "
            "below 1e21 — rescale the series"
        )
    if total_abs is not None:
        if total_abs >= Decimal(10) ** 21 or n_rows * total_abs >= Decimal(10) ** 32:
            raise ValueError(
                "cusum_changepoint: series magnitude exceeds the exact-"
                f"decimal envelope (n={n_rows}, sum|x|={total_abs}); "
                "n*sum|x| must stay below 1e32 — rescale the series"
            )
    spark = series.sparkSession
    n_sum = spark.range(1).select(
        F.lit(n_rows).cast("long").alias("__n"),
        (F.lit(str(total)) if total is not None else F.lit(None))
        .cast(dec)
        .alias("__sum"),
    )
    base = series.select(
        F.col(order_col).alias("__t"),
        F.col(value_col).cast(dec).alias("__x"),
        F.lit(1).alias("__one"),
    )
    cum = global_cumsum(base, ["__t"], {"__cx": "__x", "__ck": "__one"})
    scored = cum.crossJoin(F.broadcast(n_sum)).select(
        "__t",
        "__n",
        "__sum",
        # decimal(10,0) × decimal(27,6) → decimal(38,6): inside both
        # engines' 38-digit ceiling, exact for any calendar-bounded n
        F.abs(
            F.col("__n").cast("decimal(10,0)")
            * F.col("__cx").cast("decimal(27,6)")
            - F.col("__ck").cast("decimal(10,0)")
            * F.col("__sum").cast("decimal(27,6)")
        ).alias("__u"),
    )
    top = scored.agg(F.max("__u").alias("__m"))
    return (
        scored.join(F.broadcast(top), scored["__u"] == top["__m"])
        .groupBy("__n", "__sum", "__m")
        .agg(F.min("__t").alias("change_at"))
        .select(
            "change_at",
            F.col("__n").alias("n_points"),
            F.round(
                F.col("__m").cast("double") / F.col("__n"), ndigits
            ).alias("max_abs_cusum"),
            F.round(
                F.col("__sum").cast("double") / F.col("__n"), ndigits
            ).alias("mean"),
        )
    )


def znorm_query_topk(
    series: DataFrame,
    query: DataFrame,
    entity_col: str = "entity",
    t_col: str = "t",
    v_col: str = "v",
    k: int = 5,
) -> DataFrame:
    """Time-series similarity SEARCH (the pattern-query tier of the
    distributed data-series literature — REPOSE/Odyssey's problem,
    solved exactly for one query): find the k series most similar to a
    query series under Z-NORMALIZED Euclidean distance, the standard
    shape-matching metric (offset- and scale-invariant).

    Uses the textbook identity dist² = 2·n·(1 − ρ) — z-normalized
    Euclidean distance IS Pearson correlation — so the whole search is
    ONE mergeable co-moment aggregate per series over the query-aligned
    grid: join the (broadcast, series-length-sized) query on the time
    key, per entity compute (n, corr), derive the distance.  ρ rounds
    to 6 dp BEFORE the distance composition (the c86/c28b cross-engine
    corr parity), so the result is oracle-exact.  Series with fewer
    than 2 common points (or zero variance → NULL ρ) are excluded —
    their z-norm is undefined.

    Returns the top-k (entity, n_common, rho, znorm_dist), distance
    ascending with entity tie-break — a TakeOrdered plan, no global
    sort.  The query grid must be UNIQUE on the time key (a duplicate
    t would double-join its point into every series' moments and
    silently skew every distance) — raises ValueError otherwise;
    pre-aggregate the query series if it isn't.  The uniqueness probe
    is one aggregate over the (tiny, broadcast-sized by contract)
    query side only — never the corpus.  Scale: linear in the fact
    table (one partial+final agg per entity); a million-series corpus
    needs no pair explosion because the query side is ONE broadcast
    series; for many-query workloads compose per query or block with
    PAA/SAX upstream (:func:`sax_words`)."""
    q = query.select(F.col(t_col).alias("__qt"), F.col(v_col).alias("__qv"))
    chk = q.agg(
        F.count("*").alias("__n"),
        F.count_distinct("__qt").alias("__nd"),
    ).first()
    if chk["__n"] != chk["__nd"]:
        raise ValueError(
            "znorm_query_topk: query time grid has duplicate "
            f"{t_col!r} keys ({chk['__n']} rows, {chk['__nd']} distinct) "
            "— a duplicate key double-joins into every series' moments; "
            "pre-aggregate the query series first"
        )
    j = series.join(F.broadcast(q), series[t_col] == q["__qt"])
    # corr via try_divide(covar, sd*sd): identical co-moments, but a
    # zero-variance (constant) series yields NULL instead of ANSI's
    # DIVIDE_BY_ZERO raise inside corr — constants must DROP, not kill
    # the search (pinned in tests)
    rho = F.round(
        F.try_divide(
            F.covar_samp(v_col, "__qv"),
            F.stddev_samp(v_col) * F.stddev_samp("__qv"),
        ),
        6,
    )
    agg = j.groupBy(entity_col).agg(
        F.count("*").cast("long").alias("n_common"), rho.alias("rho")
    )
    dist = F.round(
        F.sqrt(
            F.greatest(
                2 * F.col("n_common") * (1 - F.col("rho")), F.lit(0.0)
            )
        ),
        6,
    )
    return (
        agg.filter((F.col("n_common") >= 2) & F.col("rho").isNotNull())
        .select(entity_col, "n_common", "rho", dist.alias("znorm_dist"))
        .orderBy(F.col("znorm_dist").asc(), F.col(entity_col).asc())
        .limit(k)
    )


def sax_words(
    series: DataFrame,
    entity_col: str = "entity",
    t_col: str = "t",
    v_col: str = "v",
    segments: int = 4,
) -> DataFrame:
    """SAX blocking for ALL-PAIRS series similarity — the scale path
    :func:`znorm_query_topk` (one query) doesn't need but a million×
    million series search does (the iSAX family of the data-series
    literature): z-normalize each series over the GLOBAL time grid
    (absent points read as 0 — "no activity", so sparse and dense
    series stay comparable), average into ``segments`` PAA segments,
    quantize each segment mean against the standard N(0,1) breakpoints
    for a 4-letter alphabet (−0.6745, 0, 0.6745), and emit the
    concatenated SAX word.  Series with equal words are each other's
    candidate neighbors: pair volume is Σ bucket², never corpus² —
    exactly the MinHash-band economics, in shape space.

    Returns (entity, sax_word, bucket_size).  Candidate pairs group on
    ``sax_word``; the exact verify tier is ``znorm_query_topk``'s
    distance on the survivors.

    Cross-engine determinism: PAA means round to 4 dp BEFORE the
    breakpoint compare (the c86 corr-parity discipline), and the global
    grid bounds come from one broadcast min/max aggregate.  Every
    entity emits the FULL per-entity segment grid (a totally-inactive
    segment z-scores from its zero-filled sums — ADVICE r11), so words
    are always exactly ``segments`` letters and comparable across
    buckets regardless of sparsity.  Scale: one (entity, segment)
    partial agg + one entity-distinct grid join + one entity agg + one
    word-count agg — all state entity-sized."""
    bounds = series.agg(
        F.min(F.col(t_col)).alias("__tmin"),
        F.max(F.col(t_col)).alias("__tmax"),
    )
    words = _sax_word_per_entity(
        series, bounds, entity_col, t_col, v_col, segments
    )
    from pyspark.sql import Window

    return words.select(
        F.col("__e").alias(entity_col),
        "sax_word",
        F.count("*")
        .over(Window.partitionBy("sax_word"))
        .cast("long")
        .alias("bucket_size"),
    )


def _sax_word_per_entity(
    series: DataFrame,
    bounds: DataFrame,
    entity_col: str,
    t_col: str,
    v_col: str,
    segments: int,
) -> DataFrame:
    """:func:`sax_words`' core on an EXTERNALLY supplied grid-bounds
    frame (one row, __tmin/__tmax) — shared by :func:`ts_similarity_join`
    so corpus and query sides quantize against the SAME grid (words
    from different grids are not comparable).  Returns (__e, sax_word)."""
    ent, t, v = F.col(entity_col), F.col(t_col), F.col(v_col)
    s = series.crossJoin(F.broadcast(bounds))
    width = F.col("__tmax") - F.col("__tmin") + 1
    seg = ((t - F.col("__tmin")) * segments / width).cast("int")
    # per (entity, segment): sum of present values + the segment's POINT
    # CAPACITY from the grid (absent points count as zeros in mean/sd)
    seg_pts = (
        ((F.col("__s") + 1) * width / segments).cast("long")
        - (F.col("__s") * width / segments).cast("long")
    )
    present = s.groupBy(ent.alias("__e"), seg.alias("__s")).agg(
        F.sum(v).alias("__sv"),
        F.sum(v * v).alias("__svv"),
    )
    # full grid: entities x range(segments), sums coalesced to 0, so a
    # sparse series still emits one letter per segment
    grid = present.select("__e").distinct().select(
        "__e",
        F.explode(
            F.sequence(F.lit(0).cast("int"), F.lit(segments - 1).cast("int"))
        ).alias("__s"),
    )
    per_seg = (
        grid.join(present, ["__e", "__s"], "left")
        .withColumn("__sv", F.coalesce(F.col("__sv"), F.lit(0)))
        .withColumn("__svv", F.coalesce(F.col("__svv"), F.lit(0)))
        .crossJoin(F.broadcast(bounds))
        .withColumn("__n", seg_pts)
    )
    per_ent = per_seg.groupBy("__e").agg(
        F.sum("__sv").alias("__tot"),
        F.sum("__svv").alias("__tot2"),
        F.sum("__n").alias("__w"),
    )
    j = per_seg.join(per_ent, "__e")
    # totals may arrive DECIMAL-exact (the caller's parity lever: decimal
    # sums are associative, so partial aggregation order can't perturb
    # them); all MOMENT arithmetic happens in double from the exact totals
    mean = F.col("__tot").cast("double") / F.col("__w")
    var = F.col("__tot2").cast("double") / F.col("__w") - mean * mean
    sd = F.sqrt(F.greatest(var, F.lit(0.0)))
    paa = F.round(
        F.try_divide(
            F.try_divide(F.col("__sv").cast("double"), F.col("__n")) - mean,
            sd,
        ),
        4,
    )
    letter = (
        F.when(paa.isNull(), F.lit("a"))  # flat series: all segments 'a'
        .when(paa < -0.6745, F.lit("a"))
        .when(paa < 0.0, F.lit("b"))
        .when(paa < 0.6745, F.lit("c"))
        .otherwise(F.lit("d"))
    )
    return (
        j.select(F.col("__e"), F.col("__s"), letter.alias("__l"))
        .groupBy("__e")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__s"), F.col("__l")))
                    ),
                    lambda r: r["__l"],
                ),
                "",
            ).alias("sax_word")
        )
    )


def ts_similarity_join(
    series: DataFrame,
    queries: DataFrame,
    entity_col: str = "entity",
    t_col: str = "t",
    v_col: str = "v",
    qid_col: str = "qid",
    segments: int = 4,
    k: int = 5,
) -> DataFrame:
    """MULTI-QUERY time-series similarity search (d157) — the composed
    scale path :func:`znorm_query_topk` points at for many-query
    workloads: SAX-block BOTH sides against one shared grid
    (:func:`sax_words`' quantization — the d02 banding pattern in shape
    space), then znorm-VERIFY only within blocks, then top-k per query.

    Candidate volume is Σ_word (query-bucket × corpus-bucket), never
    queries × corpus; each candidate pair verifies with the exact
    dist² = 2n(1−ρ) identity over the pair's common time keys (ρ
    rounds 6 dp before composition — the d149 parity discipline).
    Blocking is LOSSY by design (a true neighbor in a different SAX
    bucket is unseen — the d02/LSH recall trade); the self-retrieval
    guarantee (a query identical to a corpus series always shares its
    word and verifies at distance 0) is pinned by the d157b twin.

    Returns (qid, entity, n_common, rho, znorm_dist, rank) with
    rank = 1..k per query, distance ascending, entity tie-break.
    Raises on a query side with duplicate (qid, t) keys — a duplicate
    point double-joins into every candidate's moments (the
    znorm_query_topk guard, grouped).

    Scale: two SAX passes (entity-sized state) + one word equi-join +
    two fact equi-joins + one partial+final co-moment agg per pair +
    a per-query WindowGroupLimit (no global sort).  Both inputs'
    slim (key, t, v) projections are persisted internally — the corpus
    side feeds three consumers (grid bounds, SAX pass, verify join)
    and would otherwise re-run its upstream lineage three times."""
    q_t, q_v = F.col(t_col), F.col(v_col)
    from ._scratch import scratch_persist

    series = scratch_persist(
        series.select(entity_col, t_col, v_col), "ts_similarity_join/series"
    )
    queries = scratch_persist(
        queries.select(qid_col, t_col, v_col), "ts_similarity_join/queries"
    )
    # ONE eager job over the (broadcast-small by contract) query side
    # serves both the duplicate-key guard and the query-side grid
    # bounds — the series side stays a lazy corpus aggregate.  The
    # collect is a SINGLE scalar row (never one row per qid — a large
    # query side must not be able to OOM the driver); the offending
    # qid for the duplicate message is fetched with limit(1) only on
    # the error path.
    per_qid = queries.groupBy(qid_col).agg(
        (F.count("*") - F.count_distinct(q_t)).alias("__dups"),
        F.min(q_t).alias("__qmin"),
        F.max(q_t).alias("__qmax"),
    )
    qrow = per_qid.agg(
        F.count("*").alias("__nq"),
        F.sum("__dups").alias("__total_dups"),
        F.min("__qmin").alias("__qmin"),
        F.max("__qmax").alias("__qmax"),
    ).collect()[0]
    if qrow["__nq"] == 0:
        raise ValueError("ts_similarity_join: empty query side")
    if qrow["__total_dups"] and qrow["__total_dups"] > 0:
        dup = (
            per_qid.filter(F.col("__dups") > 0)
            .select(qid_col)
            .limit(1)
            .collect()[0]
        )
        raise ValueError(
            f"ts_similarity_join: query {dup[qid_col]!r} has duplicate "
            f"{t_col!r} keys — pre-aggregate the query series first"
        )
    qmin = qrow["__qmin"]
    qmax = qrow["__qmax"]
    # one shared grid: words quantized on different grids don't compare
    bounds = series.agg(
        F.least(F.min(q_t), F.lit(qmin)).alias("__tmin"),
        F.greatest(F.max(q_t), F.lit(qmax)).alias("__tmax"),
    )
    bounds = scratch_persist(bounds, "ts_similarity_join/bounds")
    cw = _sax_word_per_entity(
        series, bounds, entity_col, t_col, v_col, segments
    ).select(F.col("__e").alias("__ce"), "sax_word")
    qw = _sax_word_per_entity(
        queries, bounds, qid_col, t_col, v_col, segments
    ).select(F.col("__e").alias("__qe"), "sax_word")
    cand = qw.join(cw, "sax_word").select("__qe", "__ce")
    # verify: route each candidate pair's common grid through two
    # equi-joins (query side first — queries are the small side)
    qp = queries.select(
        F.col(qid_col).alias("__qe"),
        q_t.alias("__qt"),
        q_v.cast("double").alias("__qv"),
    )
    cp = series.select(
        F.col(entity_col).alias("__ce2"),
        F.col(t_col).alias("__ct"),
        F.col(v_col).cast("double").alias("__cv"),
    )
    j = cand.join(qp, "__qe").join(
        cp, (F.col("__ce") == F.col("__ce2")) & (F.col("__qt") == F.col("__ct"))
    )
    rho = F.round(
        F.try_divide(
            F.covar_samp("__cv", "__qv"),
            F.stddev_samp("__cv") * F.stddev_samp("__qv"),
        ),
        6,
    )
    agg = (
        j.groupBy("__qe", "__ce")
        .agg(F.count("*").cast("long").alias("n_common"), rho.alias("rho"))
        .filter((F.col("n_common") >= 2) & F.col("rho").isNotNull())
    )
    dist = F.round(
        F.sqrt(
            F.greatest(2 * F.col("n_common") * (1 - F.col("rho")), F.lit(0.0))
        ),
        6,
    )
    from pyspark.sql import Window

    ranked = agg.select(
        F.col("__qe").alias(qid_col),
        F.col("__ce").alias(entity_col),
        "n_common",
        "rho",
        dist.alias("znorm_dist"),
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy(qid_col).orderBy(
                F.col("znorm_dist").asc(), F.col(entity_col).asc()
            )
        ),
    )
    return ranked.filter(F.col("rank") <= k)
