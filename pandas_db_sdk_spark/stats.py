"""Distributed statistics: per-group OLS trend and one-pass correlation.

Both compute classical closed-form moments with EXACT decimal sums, so the
results are independent of partial-aggregation order (any partition count,
any engine) — the same determinism contract as the corpus aggregates
(`corpus/_util.py` DEC). Only the final scalar arithmetic (subtract,
multiply, divide, sqrt) happens in IEEE double, which is correctly rounded
everywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from ._localrel import (
    local_rows_df,
    require_unicode_literals as _require_unicode_literals,
    sql_ident as _sql_ident,
    sql_literal as _sql_str,
)

__all__ = [
    "group_regression",
    "corr_matrix",
    "weighted_median",
    "mad_outliers",
    "ks_two_sample",
    "psi_report",
    "logistic_regression_gd",
]


def group_regression(
    df: DataFrame,
    y_col: str,
    order_col: str,
    keys: Sequence[str],
    ndigits: int = 6,
) -> DataFrame:
    """Per-group OLS trend of ``y`` against its 1-based rank in
    ``order_col`` order: slope + intercept per key group (the "is this
    metric drifting" primitive). Using the rank as the regressor makes
    every sum integer/decimal-exact; slope and intercept come out of the
    closed form with no iterative fitting.

    Movement: one window re-key (rank) sharing the groupBy's partitioning,
    then one partial+final agg — the output is one row per group.
    """
    w = Window.partitionBy(*keys).orderBy(order_col)
    x = F.row_number().over(w)
    y = F.col(y_col).cast("decimal(18,4)")
    base = df.select(
        *keys,
        x.alias("__x"),
        y.alias("__y"),
        (x * y).alias("__xy"),
        # decimal per-row square: a LongType sum of x² overflows int64
        # (ANSI abort) once a group passes ~3M rows — the moment sums
        # must stay exact at any group size
        (x.cast("decimal(12,0)") * x.cast("decimal(12,0)")).alias("__xx"),
    )
    # precisions chosen so every product below stays UNDER decimal(38,_)
    # in BOTH Spark and DuckDB (Spark clips overflowing products with
    # precision loss — silent rounding — so exactness requires headroom)
    agg = base.groupBy(*keys).agg(
        F.count("*").cast("decimal(10,0)").alias("n"),
        F.sum("__x").cast("decimal(18,0)").alias("sx"),
        F.sum("__y").cast("decimal(18,4)").alias("sy"),
        F.sum("__xy").cast("decimal(24,4)").alias("sxy"),
        F.sum("__xx").cast("decimal(24,0)").alias("sxx"),
    )
    # decimal-exact numerators/denominator, THEN one double division
    n = F.col("n")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    # n=1 groups have a zero denominator; double÷0 is engine-dependent
    # (Spark NULL, IEEE inf elsewhere) — make the undefined fit NULL everywhere
    slope = F.when(den != 0, num / den)
    intercept = (F.col("sy").cast("double") - slope * F.col("sx").cast("double")) / n
    return agg.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        (F.round(slope, ndigits) + F.lit(0.0)).alias("slope"),
        (F.round(intercept, ndigits) + F.lit(0.0)).alias("intercept"),
    )


def corr_matrix(
    df: DataFrame,
    cols: Sequence[str],
    ndigits: int = 6,
) -> DataFrame:
    """Pairwise Pearson correlations of ``cols`` in ONE aggregate pass:
    every Σx, Σx², Σxy accumulates in the same partial+final agg, so the
    table is scanned once however many columns are profiled (k columns →
    k(k-1)/2 output rows) — vs calling ``corr`` per pair, which re-scans
    per coefficient.
    """
    # k² expressions built as TWO server-side parses instead of ~1,700
    # py4j Column calls (guide §1.2 step 2); identical casts/rounding, so
    # every coefficient is bit-identical to the Column-built form.
    # Identifiers go through sql_ident (backtick-escaped, ADVICE r14).
    _require_unicode_literals(df.sparkSession)
    _bi = _sql_ident
    aggs = ["CAST(count(*) AS DECIMAL(10,0)) AS n"]
    for c in cols:
        v = f"CAST({_bi(c)} AS DECIMAL(14,4))"
        aggs.append(f"CAST(sum({v}) AS DECIMAL(18,4)) AS {_bi(f's_{c}')}")
        aggs.append(f"CAST(sum({v} * {v}) AS DECIMAL(27,8)) AS {_bi(f'ss_{c}')}")
    pairs = [(a, b) for i, a in enumerate(cols) for b in cols[i + 1 :]]
    for a, b in pairs:
        va = f"CAST({_bi(a)} AS DECIMAL(14,4))"
        vb = f"CAST({_bi(b)} AS DECIMAL(14,4))"
        aggs.append(
            f"CAST(sum({va} * {vb}) AS DECIMAL(27,8)) AS {_bi(f'sp_{a}_{b}')}"
        )
    m = df.agg(*[F.expr(e) for e in aggs])

    def corr_sql(a: str, b: str) -> str:
        sp, sa, sb = _bi(f"sp_{a}_{b}"), _bi(f"s_{a}"), _bi(f"s_{b}")
        ssa, ssb = _bi(f"ss_{a}"), _bi(f"ss_{b}")
        num = f"CAST(n * {sp} - {sa} * {sb} AS DOUBLE)"
        da = f"CAST(n * {ssa} - {sa} * {sa} AS DOUBLE)"
        db = f"CAST(n * {ssb} - {sb} * {sb} AS DOUBLE)"
        # a zero-variance column makes the coefficient undefined — NULL, not
        # an engine-dependent div-by-zero artifact; `+ 0.0` canonicalizes
        # round()'s preserved IEEE -0.0
        return (
            f"round(CASE WHEN {da} * {db} > 0 THEN {num} / sqrt({da} * {db}) "
            f"END, {ndigits}) + 0.0d"
        )

    rows = ", ".join(
        f"struct({_sql_str(a)} AS col_a, {_sql_str(b)} AS col_b, "
        f"{corr_sql(a, b)} AS corr)"
        for a, b in pairs
    )
    return m.select(F.expr(f"explode(array({rows}))").alias("r")).select("r.*")


def weighted_median(
    df: DataFrame,
    value_col: str,
    weight_col: str,
    keys: Sequence[str],
) -> DataFrame:
    """Exact weighted median per key group: the smallest value whose
    cumulative weight reaches half the group's total weight (type-7-style
    lower median, weights need not be integers).

    Determinism without a total order: the cumulative sum uses a RANGE
    frame on the value itself, so every tie-block accumulates atomically —
    no unique tiebreak column is needed and intra-tie partition order
    can't change the result. Weights accumulate as exact decimals, so the
    ``2·cum ≥ total`` threshold compare is exact in any engine.

    Movement: one window re-key on the group keys (the group-total window
    shares it), then one partial+final agg — one row per group out.
    """
    wr = (
        Window.partitionBy(*keys)
        .orderBy(value_col)
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy(*keys)
    wd = F.col(weight_col).cast("decimal(18,4)")
    cum = F.sum(wd).over(wr)
    total = F.sum(wd).over(wt)
    return (
        df.select(
            *keys,
            F.col(value_col).alias("__v"),
            cum.alias("__cum"),
            total.alias("__total"),
        )
        .filter(F.col("__cum") * 2 >= F.col("__total"))
        .groupBy(*keys)
        .agg(F.min("__v").alias("weighted_median"))
    )


def mad_outliers(
    df: DataFrame,
    keys,
    value_col: str,
    scale: float = 1.4826,
    k: float = 3.0,
) -> DataFrame:
    """Robust outlier census per group via Median Absolute Deviation —
    the heavy-tail-safe alternative to z-scores (c72/d36's mean/stddev
    moments are themselves dragged by the outliers they hunt; the median
    and MAD have a 50% breakdown point). scale=1.4826 makes MAD a
    consistent σ estimator under normality, so k=3 reads as "3 robust
    sigmas".

    Two exact-percentile passes (group medians, then medians of absolute
    deviations) and one counting pass; each per-group result table is
    group-cardinality-sized and broadcasts back, so the data never
    shuffles on anything but the group key and the plan shape is
    identical at any corpus size. Medians and MADs are ROUNDED to 6 dp
    before the threshold compare, pinning the outlier decision to the
    same values in any engine (the c29 exact-interpolated-percentile
    parity).

    Returns (*keys, n bigint, median double, mad double,
    n_outliers bigint).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    v = F.col(value_col)
    med = df.groupBy(*keys).agg(
        F.round(F.percentile(v, F.lit(0.5)), 6).alias("median")
    )
    dev = df.join(F.broadcast(med), keys).withColumn(
        "__absdev", F.abs(v - F.col("median"))
    )
    mad = dev.groupBy(*keys).agg(
        F.round(F.percentile(F.col("__absdev"), F.lit(0.5)), 6).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), keys)
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n"),
            F.first("median").alias("median"),
            F.first("mad").alias("mad"),
            F.sum(
                (F.col("__absdev") > k * scale * F.col("mad")).cast("long")
            ).alias("n_outliers"),
        )
        .select(*keys, "n", "median", "mad", "n_outliers")
    )


def ks_two_sample(
    df: DataFrame,
    group_col,
    value_col: str,
    ndigits: int = 6,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic: sup over x of
    |F1(x) - F2(x)| between the two groups ``group_col`` splits the rows
    into — the distribution-shift test that sees SHAPE differences the
    mean-based tests (Welch t, Mann–Whitney) integrate away.

    ``group_col`` must be a two-valued column/Column expression; the
    lexicographically smaller label is sample 1. Distributed shape: one
    groupBy collapses the data to per-DISTINCT-VALUE counts (value-domain
    -sized, not row-count-sized), ``scale.global_cumsum`` turns them into
    ECDF numerators WITHOUT a single-task global window (range-partitioned
    prefix sums; the only converging data is one totals row per
    partition), and one max-aggregate finds the sup. ECDF steps are exact
    integer/long ratios, so both engines compute bit-identical doubles
    and the statistic itself is hash-certifiable.

    Returns one row: (n1, n2, ks_stat, ks_at) — ks_at the smallest value
    attaining the sup (deterministic tie-break).
    """
    from .scale import global_cumsum

    g = F.col(group_col) if isinstance(group_col, str) else group_col
    # ECDFs are over NON-NULL values only: engines disagree on where NULL
    # sorts in a cumulative window, and F(x) has no null point anyway.
    # A NULL group is excluded BEFORE the arity check — otherwise it
    # counts as a label there while `__g == label` never matches it, so
    # one real label + nulls would silently collapse a sample to 0 rows
    # instead of raising the friendly arity error.
    per_value = (
        df.filter(F.col(value_col).isNotNull() & g.isNotNull())
        .groupBy(F.col(value_col).alias("v"), g.alias("__g"))
        .agg(F.count("*").alias("c"))
    )
    # ONE label-cardinality aggregate yields the arity check AND the two
    # sample sizes (previously a distinct-labels collect plus a separate
    # totals aggregate + broadcast crossJoin): the collect is bounded at
    # 3 rows, n1/n2 become plan literals, and one whole pass over the
    # per-value counts disappears (guide §1.2 step 1)
    lab_rows = (
        per_value.groupBy("__g")
        .agg(F.sum("c").cast("long").alias("n"))
        .orderBy("__g")
        .limit(3)
        .collect()
    )
    labels = [r["__g"] for r in lab_rows]
    if len(labels) != 2:
        raise ValueError(f"ks_two_sample needs exactly 2 groups, got {labels}")
    n1, n2 = int(lab_rows[0]["n"]), int(lab_rows[1]["n"])
    wide = per_value.groupBy("v").agg(
        F.sum(F.when(F.col("__g") == labels[0], F.col("c")).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("__g") == labels[1], F.col("c")).otherwise(0)).alias("c2"),
    )
    cum = global_cumsum(wide, ["v"], {"a1": "c1", "a2": "c2"})
    from ._scratch import scratch_persist

    # the ECDF-difference frame feeds BOTH the sup aggregate and the
    # argmin filter join — persist the value-domain-sized frame once
    # instead of re-running the cumsum windows + offsets join per branch
    d = scratch_persist(
        cum.select(
            "v",
            F.lit(n1).cast("long").alias("n1"),
            F.lit(n2).cast("long").alias("n2"),
            F.round(
                F.abs(
                    F.col("a1").cast("double") / F.lit(n1).cast("long")
                    - F.col("a2").cast("double") / F.lit(n2).cast("long")
                ),
                ndigits + 3,
            ).alias("__d"),
        ),
        "stats/ks_two_sample/d",
    )
    top = d.agg(F.max("__d").alias("__dmax"))
    return (
        d.join(F.broadcast(top), d["__d"] == top["__dmax"])
        .groupBy("n1", "n2")
        .agg(
            F.round(F.min("__dmax"), ndigits).alias("ks_stat"),
            F.min("v").alias("ks_at"),
        )
        .select("n1", "n2", "ks_stat", "ks_at")
    )


def psi_report(
    df: DataFrame,
    period_col,
    value_col: str,
    n_buckets: int = 10,
    eps: float = 1e-6,
    ndigits: int = 6,
) -> DataFrame:
    """Population Stability Index of ``value_col`` per period against the
    whole-frame reference — the model-monitoring staple (PSI < 0.1 stable,
    0.1–0.2 shifting, > 0.2 drifted), and the BATCH-certified sibling of
    ``streaming.drift_monitor_into_engine``'s per-epoch PSI.

    Buckets are the reference's own ``n_buckets`` equi-depth cells
    (exact-interpolated percentile edges — the c29 cross-engine parity),
    so every reference bucket is non-empty by construction and every
    value lands in a cell; a period missing a bucket contributes a
    pm=0 term (the grid is completed explicitly — dropping it would
    understate drift exactly where it's strongest). Bucket index is a
    codegen fold over the broadcast edge array (count of edges below the
    value), PSI terms are IEEE arithmetic on exact integer ratios + one
    libm ln, each term 12-dp-snapped and DECIMAL-summed so the per-period
    total is aggregation-order-independent and hash-certifiable.

    Returns (period, n bigint, psi double).
    """
    p = F.col(period_col) if isinstance(period_col, str) else period_col
    vals = df.filter(F.col(value_col).isNotNull()).select(
        p.alias("__p"), F.col(value_col).alias("__v")
    )
    fracs = [i / n_buckets for i in range(1, n_buckets)]
    edges = vals.agg(
        F.percentile(F.col("__v"), F.array(*[F.lit(f) for f in fracs])).alias("__es")
    )
    bucketed = vals.crossJoin(F.broadcast(edges)).select(
        "__p",
        F.aggregate(
            "__es", F.lit(0), lambda acc, e: acc + (F.col("__v") > e).cast("int")
        ).alias("__b"),
    )
    from ._scratch import scratch_persist

    bucketed = scratch_persist(bucketed, "psi_report/bucketed")
    ref = bucketed.groupBy("__b").agg(F.count("*").alias("__rc"))
    ref_tot = bucketed.agg(F.count("*").alias("__rt"))
    per = bucketed.groupBy("__p", "__b").agg(F.count("*").alias("__pc"))
    per_tot = bucketed.groupBy("__p").agg(F.count("*").alias("__pt"))
    grid = (
        per_tot.crossJoin(F.broadcast(ref))
        .join(per, ["__p", "__b"], "left")
        .crossJoin(F.broadcast(ref_tot))
        .select(
            "__p",
            "__pt",
            (F.coalesce("__pc", F.lit(0)) / F.col("__pt")).alias("__pm"),
            (F.col("__rc") / F.col("__rt")).alias("__pr"),
        )
    )
    term = (F.col("__pm") - F.col("__pr")) * F.log(
        (F.col("__pm") + F.lit(eps)) / (F.col("__pr") + F.lit(eps))
    )
    return (
        grid.groupBy(F.col("__p").alias(period_col if isinstance(period_col, str) else "period"))
        .agg(
            F.first("__pt").cast("long").alias("n"),
            F.round(
                F.sum(F.round(term, 12).cast("decimal(24,12)")).cast("double"),
                ndigits,
            ).alias("psi"),
        )
    )


def logistic_regression_gd(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    lr: float = 1.0,
    steps: int = 3,
    term_dp: int = 12,
) -> DataFrame:
    """Full-batch logistic-regression training by gradient descent — the
    iterative SUPERVISED-training evidence class next to k-means (d31),
    PageRank (d65), label propagation (d94) and BPE (d98): the loop that
    trains fastText-style quality/language gates from corpus features.

    Update rule (from w = 0): w ← w + lr/n · Σᵢ (yᵢ − σ(wᵀxᵢ)) xᵢ, with a
    constant bias feature. Hash-certification discipline (the PSI/ln
    precedent for libm): every per-row gradient term snaps to ``term_dp``
    decimals BEFORE the DECIMAL sum, so partial-aggregation order cannot
    move the total and the only cross-engine freedom — one σ = 1/(1+exp)
    ulp — is 3 orders of magnitude below the snap; weights round to
    ``term_dp`` after each step, so step k+1's inputs are engine-exact.
    Step 1 is libm-free outright (σ(0) = 1/2 exactly).

    Scale shape: each step is ONE map-side-combined aggregate over the
    corpus producing k+2 cells (k+1 gradient sums + the row count); the
    driver holds only the weight vector — the textbook distributed
    full-batch GD. ``steps`` is small by design (a feature-gate trains in
    a handful of sweeps); per-example SGD is deliberately NOT offered —
    its sequential dependence cannot scale out or certify.

    Returns one row per step: (step int, w_bias + one ``w_<col>`` per
    feature — the weights AFTER that step, ``term_dp``-rounded — plus
    accuracy double(6) of the PRE-step weights and n bigint). Accuracy is
    the exact sign test (wᵀx > 0) == y, so it certifies bit-for-bit.
    """
    feats = [F.lit(1.0).alias("__x0")] + [
        F.col(c).cast("double").alias(f"__x{i+1}")
        for i, c in enumerate(feature_cols)
    ]
    base = df.select(
        F.col(label_col).cast("int").alias("__y"), *feats
    )
    from ._scratch import scratch_persist

    base = scratch_persist(base, "logreg_gd/features")
    k = len(feature_cols) + 1
    dec = f"decimal(30,{term_dp})"
    w = [0.0] * k
    rows = []
    for step in range(1, steps + 1):
        z = F.lit(w[0]) * F.col("__x0")
        for j in range(1, k):
            z = z + F.lit(w[j]) * F.col(f"__x{j}")
        sigma = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        aggs = [F.count("*").cast("long").alias("__n")]
        for j in range(k):
            aggs.append(
                F.sum(
                    F.round(
                        (F.col("__y") - sigma) * F.col(f"__x{j}"), term_dp
                    ).cast(dec)
                )
                .cast("double")
                .alias(f"__g{j}")
            )
        aggs.append(
            F.sum(
                (((z > 0).cast("int")) == F.col("__y")).cast("int")
            ).cast("long").alias("__ok")
        )
        got = base.agg(*aggs).collect()[0]  # k+2 cells — bounded driver state
        n = int(got["__n"])
        if n == 0:
            raise ValueError("logistic_regression_gd: empty input")
        acc = round(int(got["__ok"]) / n, 6)
        w = [
            round(w[j] + lr * float(got[f"__g{j}"]) / n, term_dp)
            for j in range(k)
        ]
        rows.append((step, *w, acc, n))
    spark = df.sparkSession
    cols = ", ".join(
        ["step int", "w_bias double"]
        + [f"w_{c} double" for c in feature_cols]
        + ["accuracy double", "n long"]
    )
    return local_rows_df(spark, rows, cols)


def softmax_regression_gd(
    df: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    n_classes: int = 3,
    lr: float = 1.0,
    steps: int = 3,
    term_dp: int = 12,
) -> DataFrame:
    """Full-batch MULTI-CLASS (softmax) regression by gradient descent —
    the C-class generalization of :func:`logistic_regression_gd`
    (VERDICT r8 #6): the loop that trains a language-ID head / C-way
    quality gate from corpus features.

    Update rule (from W = 0): W[c][j] ← W[c][j] + lr/n ·
    Σᵢ (1[yᵢ=c] − p_c(xᵢ)) x_j with p_c = exp(z_c)/Σ_d exp(z_d),
    z_c = W[c]·x, and a constant bias feature. Same hash-certification
    discipline as the binary trainer: every per-row gradient term snaps
    to ``term_dp`` decimals BEFORE the DECIMAL sum (partial-aggregation
    order cannot move the total; the C exp ulps sit 3 orders below the
    snap), weights round to ``term_dp`` between steps so step k+1's
    inputs are engine-exact, and step 1 is libm-free outright
    (z = 0 ⇒ p_c = 1/C exactly). Accuracy is the exact argmax test with
    first-class-wins tie-break (z_c ≥ z_d for d > c — nested CASE, the
    same comparison tree the oracle replays), over the PRE-step weights.

    Scale shape: each step is ONE map-side-combined aggregate over the
    corpus producing C·k + 2 cells; the driver holds only the C×k weight
    matrix. ``steps`` small by design — see the binary trainer's note.

    Returns one row per step: (step int, w_c{c}_bias + one
    ``w_c{c}_<col>`` per (class, feature) — the weights AFTER that step
    — plus accuracy double(6) and n bigint).
    """
    feats = [F.lit(1.0).alias("__x0")] + [
        F.col(c).cast("double").alias(f"__x{i+1}")
        for i, c in enumerate(feature_cols)
    ]
    base = df.select(F.col(label_col).cast("int").alias("__y"), *feats)
    from ._scratch import scratch_persist

    base = scratch_persist(base, "softmax_gd/features")
    k = len(feature_cols) + 1
    C = n_classes
    dec = f"decimal(30,{term_dp})"
    W = [[0.0] * k for _ in range(C)]
    rows = []
    for step in range(1, steps + 1):
        zs = []
        for c in range(C):
            z = F.lit(W[c][0]) * F.col("__x0")
            for j in range(1, k):
                z = z + F.lit(W[c][j]) * F.col(f"__x{j}")
            zs.append(z)
        exps = [F.exp(z) for z in zs]
        den = exps[0]
        for e in exps[1:]:
            den = den + e
        aggs = [F.count("*").cast("long").alias("__n")]
        for c in range(C):
            ind = (F.col("__y") == c).cast("double")
            for j in range(k):
                aggs.append(
                    F.sum(
                        F.round(
                            (ind - exps[c] / den) * F.col(f"__x{j}"), term_dp
                        ).cast(dec)
                    )
                    .cast("double")
                    .alias(f"__g{c}_{j}")
                )
        # argmax with first-class-wins tie-break: class c is predicted
        # iff z_c >= z_d for every d > c (an earlier class already won
        # any tie with c) — the nested CASE the oracle replays verbatim
        pred = F.lit(C - 1)
        for c in range(C - 2, -1, -1):
            cond = F.lit(True)
            for d in range(c + 1, C):
                cond = cond & (zs[c] >= zs[d])
            pred = F.when(cond, F.lit(c)).otherwise(pred)
        aggs.append(
            F.sum((pred == F.col("__y")).cast("int")).cast("long").alias("__ok")
        )
        got = base.agg(*aggs).collect()[0]  # C*k + 2 cells — bounded
        n = int(got["__n"])
        if n == 0:
            raise ValueError("softmax_regression_gd: empty input")
        acc = round(int(got["__ok"]) / n, 6)
        W = [
            [
                round(W[c][j] + lr * float(got[f"__g{c}_{j}"]) / n, term_dp)
                for j in range(k)
            ]
            for c in range(C)
        ]
        rows.append((step, *[w for wc in W for w in wc], acc, n))
    spark = df.sparkSession
    names = ["step int"]
    for c in range(C):
        names.append(f"w_c{c}_bias double")
        names.extend(f"w_c{c}_{col} double" for col in feature_cols)
    names += ["accuracy double", "n long"]
    return local_rows_df(spark, rows, ", ".join(names))
