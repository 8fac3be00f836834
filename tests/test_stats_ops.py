"""Behavioral invariants for the round-6c statistics/survival/attribution
operators — properties the DuckDB hash parity can't express: estimator
shape (KM monotonicity), conservation laws (attribution mass), and
numpy agreement (covariance)."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from pandas_db_sdk_spark.corpus import all_queries

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def queries():
    return all_queries()


def test_km_survival_monotone_nonincreasing(spark, queries):
    rows = (
        queries["x35_survival_km"](spark, SF).orderBy("duration").collect()
    )
    assert rows, "empty KM curve"
    prev = 1.0 + 1e-12
    total = rows[0]["n_risk"]
    seen = 0
    for r in rows:
        assert 0.0 <= r["survival"] <= prev + 1e-9, r
        prev = r["survival"]
        # risk set at t = everyone not yet dead/censored before t
        assert r["n_risk"] == total - seen, r
        seen += r["n_events"] + r["n_censored"]
    assert seen == total


def test_attribution_conserves_touched_purchase_value(spark, queries):
    """Linear attribution must redistribute, never create or destroy,
    the value of purchases that have >=1 view in their 7-day window."""
    from pandas_db_sdk_spark.io import tables

    out = queries["x37_multitouch_attribution"](spark, SF)
    attributed = out.agg(F.sum("attributed")).collect()[0][0]
    e = tables(spark, SF)("events")
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"), "user_id", F.col("ts").alias("p_ts"), "value"
    )
    v = e.filter(F.col("event_type") == "view").select(
        "user_id", F.col("ts").alias("v_ts")
    )
    touched = (
        p.join(v, "user_id")
        .filter(
            (F.col("v_ts") <= F.col("p_ts"))
            & (F.col("v_ts") > F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
        )
        .select("pid", "value")
        .distinct()
        .agg(F.sum("value"))
        .collect()[0][0]
    )
    assert attributed == pytest.approx(touched, abs=0.05)


def test_embedding_covariance_matches_numpy(spark, queries):
    out = {
        (r["i"], r["j"]): r["cov"]
        for r in queries["d88_embedding_covariance"](spark, SF).collect()
    }
    assert len(out) == 36  # upper triangle of 8x8
    from pandas_db_sdk_spark.io import tables

    X = np.array(
        tables(spark, SF)("embeddings")
        .select(F.expr("slice(cast(embedding as array<double>), 1, 8)").alias("v"))
        .toPandas()["v"]
        .tolist()
    )
    C = np.cov(X, rowvar=False, bias=True)
    for (i, j), cov in out.items():
        assert cov == pytest.approx(C[i - 1, j - 1], abs=1e-6)
    for i in range(1, 9):
        assert out[(i, i)] >= 0.0


def test_concentration_indices_in_range(spark, queries):
    for r in queries["x36_revenue_concentration"](spark, SF).collect():
        n = r["n_suppliers"]
        assert 0.0 <= r["gini"] < 1.0, r
        assert 1.0 / n - 1e-9 <= r["hhi"] <= 1.0 + 1e-9, r


def test_chi_square_zero_on_perfectly_independent_table(spark):
    """Construct an exactly independent nation x segment table and run the
    same statistic pipeline: chi2 must be 0."""
    from pandas_db_sdk_spark.corpus.aggregation import QUERIES
    import os
    import tempfile

    rows = [(n, s) for n in range(4) for s in ("A", "B") for _ in range(5)]
    df = spark.createDataFrame(rows, "c_nationkey int, c_mktsegment string")
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "customer.parquet"))
    out = QUERIES["c88_chi_square_independence"](spark, d).collect()[0]
    assert out["chi2"] == pytest.approx(0.0, abs=1e-9)
    assert out["dof"] == 3


def test_source_kl_nonnegative_and_zero_for_identical_sources(spark):
    from pandas_db_sdk_spark.text import source_kl_divergence

    out = {
        r["source"]: r["kl_vs_corpus"]
        for r in source_kl_divergence(
            spark.createDataFrame(
                [("a", "x y z"), ("b", "x y z"), ("c", "x x q")],
                "source string, text string",
            )
        ).collect()
    }
    # a and b share the corpus-identical distribution only if the corpus
    # equals theirs — it doesn't (c skews it), but KL is still >= 0
    assert all(v >= 0.0 for v in out.values()), out
    # two identical single-source corpora -> KL exactly 0
    out2 = {
        r["source"]: r["kl_vs_corpus"]
        for r in source_kl_divergence(
            spark.createDataFrame(
                [("a", "x y"), ("a", "z"), ("b", "x y"), ("b", "z")],
                "source string, text string",
            )
        ).collect()
    }
    assert out2 == {"a": 0.0, "b": 0.0}


def test_mann_whitney_matches_bruteforce_pair_count(spark, queries):
    row = queries["c89_mann_whitney"](spark, SF).collect()[0]
    from pandas_db_sdk_spark.io import tables

    pdf = (
        tables(spark, SF)("customer")
        .select(F.round("c_acctbal", 2).alias("v"), "c_mktsegment")
        .toPandas()
    )
    a = sorted(pdf[pdf.c_mktsegment == "AUTOMOBILE"].v)
    b = sorted(pdf[pdf.c_mktsegment != "AUTOMOBILE"].v)
    u = sum((1.0 if x > y else 0.5 if x == y else 0.0) for x in a for y in b)
    assert row["n1"] == len(a) and row["n2"] == len(b)
    assert row["u_stat"] == pytest.approx(u, abs=1e-9)


def test_skyline_is_exactly_the_nondominated_set(spark, queries):
    sky = {
        (r["n_name"], r["avg_price"], r["avg_disc"])
        for r in queries["x38_supplier_skyline"](spark, SF).collect()
    }
    from pandas_db_sdk_spark.io import tables

    t = tables(spark, SF)
    li = t("lineitem")
    s = t("supplier")
    n = t("nation")
    pts = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / F.count("*"),
                6,
            ).alias("p"),
            F.round(
                F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("double")
                / F.count("*"),
                6,
            ).alias("d"),
        )
        .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "p", "d")
        .distinct()
        .collect()
    )
    by_nation = {}
    for r in pts:
        by_nation.setdefault(r["n_name"], []).append((r["p"], r["d"]))
    want = set()
    for nation, ps in by_nation.items():
        for p, d in ps:
            dominated = any(
                (q <= p and e >= d and (q < p or e > d)) for q, e in ps
            )
            if not dominated:
                want.add((nation, p, d))
    assert sky == want


def test_kmv_set_ops_exact_when_unsaturated_and_bounded(spark):
    """With < k distinct values per group the sketches are complete, so
    the 'estimates' must equal the exact values; intersection can never
    exceed either side."""
    from pandas_db_sdk_spark.sketches import kmv_set_ops

    rows = [(1, v) for v in range(10)] + [(2, v) for v in range(5, 20)]
    df = spark.createDataFrame(rows, "g int, v long")
    out = kmv_set_ops(df, "g", "v", k=64).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["group_a"], r["group_b"]) == (1, 2)
    assert r["exact_a"] == 10 and r["exact_b"] == 15
    assert r["exact_intersection"] == 5 and r["exact_union"] == 20
    assert r["est_union"] == 20.0
    assert r["est_intersection"] == 5.0
    assert r["est_jaccard"] == pytest.approx(0.25)


def test_kmv_set_ops_estimates_track_truth_on_fixture(spark, queries):
    for r in queries["d90_kmv_set_ops"](spark, SF).collect():
        assert r["est_union"] > 0
        # bottom-64 sketch: loose 50% band is enough to catch a broken
        # estimator while staying deterministic
        assert abs(r["est_union"] / r["exact_union"] - 1) < 0.5, r
        if r["exact_intersection"] > 0:
            assert r["est_intersection"] >= 0


def test_ks_two_sample_hand_computed(spark):
    """KS on a 4-vs-4 fixture with a known sup: F1 jumps at {1,2,3,4},
    F2 at {3,4,5,6}; the max gap is 0.5 at value 2 (F1=0.5, F2=0)."""
    from pandas_db_sdk_spark import stats

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 4.0),
         ("b", 3.0), ("b", 4.0), ("b", 5.0), ("b", 6.0)],
        "grp string, v double",
    )
    row = stats.ks_two_sample(df, "grp", "v").collect()[0]
    assert row.n1 == 4 and row.n2 == 4
    assert abs(row.ks_stat - 0.5) < 1e-12
    assert row.ks_at == 2.0


def test_ks_two_sample_identical_groups_is_zero(spark):
    from pandas_db_sdk_spark import stats

    df = spark.createDataFrame(
        [("a", float(i % 5)) for i in range(20)]
        + [("b", float(i % 5)) for i in range(20)],
        "grp string, v double",
    )
    row = stats.ks_two_sample(df, "grp", "v").collect()[0]
    assert row.ks_stat == 0.0


def test_ks_two_sample_rejects_arity(spark):
    import pytest as _pytest

    from pandas_db_sdk_spark import stats

    df = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "grp string, v double"
    )
    with _pytest.raises(ValueError, match="exactly 2 groups"):
        stats.ks_two_sample(df, "grp", "v")


def test_ks_two_sample_null_group_not_a_label(spark):
    """ADVICE r7: NULL group rows are excluded before the arity check —
    one real label + nulls raises the friendly error instead of silently
    collapsing a sample to zero; two real labels + nulls still works."""
    import pytest as _pytest

    from pandas_db_sdk_spark import stats

    one_label = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), (None, 3.0)], "grp string, v double"
    )
    with _pytest.raises(ValueError, match="exactly 2 groups"):
        stats.ks_two_sample(one_label, "grp", "v")

    with_nulls = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 1.0), ("b", 2.0), (None, 99.0)],
        "grp string, v double",
    )
    row = stats.ks_two_sample(with_nulls, "grp", "v").collect()[0]
    assert row.n1 == 2 and row.n2 == 2 and row.ks_stat == 0.0


def test_logistic_regression_gd_matches_numpy_replay(spark):
    """The distributed GD loop == a numpy replay of the same recurrence
    (same per-term 12-dp snaps, same weight rounding): weights agree to
    1e-9 per step, accuracy is the exact pre-step sign test, and on a
    linearly separable set accuracy reaches 1.0 within a few steps."""
    import numpy as np

    from pandas_db_sdk_spark import stats

    rng = np.random.RandomState(3)
    x1 = rng.uniform(-2, 2, 200)
    x2 = rng.uniform(-2, 2, 200)
    y = (x1 + 2 * x2 > 0).astype(int)  # separable through the origin
    df = spark.createDataFrame(
        [(float(a), float(b), int(c)) for a, b, c in zip(x1, x2, y)],
        "f1 double, f2 double, y int",
    )
    got = stats.logistic_regression_gd(df, ["f1", "f2"], "y", lr=2.0, steps=4)
    rows = {r.step: r for r in got.collect()}
    assert sorted(rows) == [1, 2, 3, 4]

    X = np.column_stack([np.ones_like(x1), x1, x2])
    w = np.zeros(3)
    for step in range(1, 5):
        z = X @ w
        acc = round(float(((z > 0).astype(int) == y).mean()), 6)
        terms = np.round((y - 1 / (1 + np.exp(-z)))[:, None] * X, 12)
        w = np.round(w + 2.0 * terms.sum(0) / len(y), 12)
        r = rows[step]
        assert r.accuracy == acc and r.n == 200
        for jw, wname in zip(w, ("w_bias", "w_f1", "w_f2")):
            assert abs(getattr(r, wname) - jw) < 1e-9, (step, wname)
    assert rows[4].accuracy >= 0.97  # pre-step-4 weights already separate


def test_logistic_regression_gd_empty_raises(spark):
    import pytest as _pytest

    from pandas_db_sdk_spark import stats

    empty = spark.createDataFrame([], "f1 double, y int")
    with _pytest.raises(ValueError, match="empty input"):
        stats.logistic_regression_gd(empty, ["f1"], "y", steps=1)


def test_softmax_regression_gd_matches_numpy_replay(spark):
    """The C=3 trainer matches a numpy replay of the same snapped
    recurrence; step 1 is libm-free (p_c = 1/3 exactly from W = 0),
    accuracy is the exact first-class-wins argmax, and a separable
    3-class set is classified perfectly within a few steps."""
    import numpy as np

    from pandas_db_sdk_spark import stats

    rng = np.random.RandomState(7)
    x1 = rng.uniform(-2, 2, 300)
    x2 = rng.uniform(-2, 2, 300)
    y = np.where(x1 + x2 > 0.7, 0, np.where(x1 - x2 > 0.2, 1, 2))
    df = spark.createDataFrame(
        [(float(a), float(b), int(c)) for a, b, c in zip(x1, x2, y)],
        "f1 double, f2 double, y int",
    )
    got = stats.softmax_regression_gd(
        df, ["f1", "f2"], "y", n_classes=3, lr=2.0, steps=4
    )
    rows = {r.step: r for r in got.collect()}
    assert sorted(rows) == [1, 2, 3, 4]

    X = np.column_stack([np.ones_like(x1), x1, x2])
    W = np.zeros((3, 3))
    for step in range(1, 5):
        Z = X @ W.T                      # (n, 3)
        # first-class-wins argmax (numpy argmax already ties to lowest)
        acc = round(float((Z.argmax(axis=1) == y).mean()), 6)
        E = np.exp(Z)
        P = E / E.sum(axis=1, keepdims=True)
        for c in range(3):
            terms = np.round(((y == c).astype(float) - P[:, c])[:, None] * X, 12)
            W[c] = np.round(W[c] + 2.0 * terms.sum(0) / len(y), 12)
        r = rows[step]
        assert r.accuracy == acc and r.n == 300
        for c in range(3):
            for jw, wname in zip(
                W[c], (f"w_c{c}_bias", f"w_c{c}_f1", f"w_c{c}_f2")
            ):
                assert abs(getattr(r, wname) - jw) < 1e-9, (step, wname)
    assert rows[4].accuracy >= 0.9


def test_softmax_regression_gd_empty_raises(spark):
    import pytest as _pytest

    from pandas_db_sdk_spark import stats

    empty = spark.createDataFrame([], "f1 double, y int")
    with _pytest.raises(ValueError, match="empty input"):
        stats.softmax_regression_gd(empty, ["f1"], "y", steps=1)
