"""Bloom semi-join and Misra–Gries heavy hitters — contracts and plans.

The oracle suite already proves both are value-exact at sf0.01; these pin
the guarantees that make them sketches worth shipping: no false negatives
in the bitmap probe, exactness under adversarial skew, determinism of the
bitmap bytes, and the plan shape (probe filter BEFORE the shuffle join;
candidate recount is a broadcast, not a full-domain shuffle).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_db_sdk_spark import sketches

SF = "/root/testdata/sf0.01"


def test_bloom_semi_join_equals_plain_semi_join_string_keys(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    small = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("text").alias("t")
    )
    got = sketches.bloom_semi_join(docs, small, "text", "t", num_bits=1 << 16)
    want = docs.join(
        small.select(F.col("t").alias("text")).distinct(), "text", "left_semi"
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_bloom_semi_join_empty_small_side(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(F.lit(False))
    out = sketches.bloom_semi_join(li, o, "l_orderkey", "o_orderkey")
    assert out.count() == 0


def test_bloom_bitmap_deterministic_and_order_insensitive(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet").select("o_orderkey")
    a = sketches.build_bloom_bitmap(o, "o_orderkey", num_bits=1 << 14)
    b = sketches.build_bloom_bitmap(
        o.repartition(7), "o_orderkey", num_bits=1 << 14
    )
    # OR is commutative/associative: bitmap bytes are partitioning-invariant
    assert a == b
    assert len(a) == 8 + (1 << 14) // 8  # 8-byte (bits, hashes) header


def test_bloom_tiny_bitmap_still_exact(spark):
    """A deliberately undersized bitmap (high fp-rate) must still return the
    exact semi join — false positives only feed the verify join."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_totalprice") > 500000
    )
    got = sketches.bloom_semi_join(li, o, "l_orderkey", "o_orderkey", num_bits=256)
    want = li.join(
        o.select(F.col("o_orderkey").alias("l_orderkey")).distinct(),
        "l_orderkey",
        "left_semi",
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_heavy_hitters_adversarial_skew_exact(spark):
    """One key holds ~40% of rows, a band of keys sits just above and just
    below threshold; MG candidates + exact recount must match the naive
    groupBy exactly — including excluding the at-threshold key."""
    n = 20000
    base = spark.range(n)
    # key 'hot' ~ 40%; keys m0..m9 ~1.2% each; tail unique
    df = base.select(
        F.when(F.col("id") % 5 <= 1, F.lit("hot"))
        .when(F.col("id") % 83 == 0, F.concat(F.lit("m"), (F.col("id") % 10)))
        .otherwise(F.concat(F.lit("u"), F.col("id")))
        .alias("item")
    ).repartition(16)
    got = sketches.heavy_hitters(df, "item", 0.01).toPandas()
    total = df.count()
    want = (
        df.groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 0.01 * total)
        .toPandas()
    )
    g = got.sort_values("item").reset_index(drop=True)
    w = want.sort_values("item").reset_index(drop=True)
    assert g.equals(w), (g, w)
    assert "hot" in set(g["item"])


def test_heavy_hitters_threshold_is_strict(spark):
    """Exactly-at-threshold frequency is excluded (matches HAVING cnt > t*N)."""
    rows = [("a",)] * 10 + [("b",)] * 5 + [("c",)] * 85
    df = spark.createDataFrame(rows, ["item"])
    got = {r["item"] for r in sketches.heavy_hitters(df, "item", 0.10).collect()}
    assert got == {"c"}  # 'a' is exactly 10% — excluded by strict >


def test_bloom_probe_filters_before_join(spark):
    """The Arrow probe must sit UPSTREAM of the verify join: at 100 TB the
    point is that pruned rows never reach the exchange."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_totalprice") > 400000
    )
    out = sketches.bloom_semi_join(li, o, "l_orderkey", "o_orderkey")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # vectorized probe, not BatchEvalPython
    assert "BatchEvalPython" not in plan
    probe_pos = plan.index("ArrowEvalPython")
    join_pos = min(
        p for p in (plan.find("SortMergeJoin"), plan.find("ShuffledHashJoin"), plan.find("BroadcastHashJoin"))
        if p >= 0
    )
    # executedPlan prints top-down: the join node appears BEFORE (above) the
    # probe in the string iff the probe is its child — i.e. runs first.
    assert join_pos < probe_pos, "probe does not feed the verify join"


def test_heavy_hitters_recount_is_broadcast(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    toks = docs.select(F.explode(F.split("text", " ")).alias("token"))
    out = sketches.heavy_hitters(toks, "token", 0.002)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # candidate semi join broadcasts the bounded candidate set
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_bloom_semi_join_mixed_key_widths(spark):
    """xxhash64 is type-sensitive; the canonical string hash image must make
    an int32 big-side key match an int64 small-side key (as a plain join
    would via coercion)."""
    from pyspark.sql import functions as F

    big = spark.range(1000).select(F.col("id").cast("int").alias("k"))
    small = spark.range(0, 1000, 7).select(F.col("id").alias("k"))  # bigint
    got = sketches.bloom_semi_join(big, small, "k", num_bits=1 << 14)
    assert got.count() == 143  # ceil(1000/7)


def test_bloom_semi_join_prebuilt_bitmap_reuse(spark):
    """A bitmap built once must be reusable across queries with identical
    results; a wrong-sized bitmap is rejected loudly."""
    import pytest

    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet").filter(
        F.col("o_totalprice") > 400000
    )
    keys = o.select(F.col("o_orderkey").alias("l_orderkey")).distinct()
    bm = sketches.build_bloom_bitmap(keys, "l_orderkey", num_bits=1 << 16)
    got = sketches.bloom_semi_join(
        li, o, "l_orderkey", "o_orderkey", num_bits=1 << 16, bitmap=bm
    )
    want = li.join(keys, "l_orderkey", "left_semi")
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    # args that disagree with the header are overridden by it, not trusted
    got2 = sketches.bloom_semi_join(
        li, o, "l_orderkey", "o_orderkey", num_bits=1 << 20, num_hashes=9, bitmap=bm
    )
    assert got2.count() == want.count()
    with pytest.raises(ValueError, match="corrupt"):
        sketches.bloom_semi_join(
            li, o, "l_orderkey", "o_orderkey", bitmap=bm[:-4]
        )


def test_bloom_fp_rate_within_theory(spark):
    """Realized probe false-positive rate must sit near the textbook
    (1 - e^{-kn/m})^k — the sizing formula SCALE.md tells operators to
    use. Measured on keys guaranteed absent from the build set."""
    import math

    from pyspark.sql import functions as F

    n, m, k = 20_000, 1 << 18, 5
    members = spark.range(n).select((F.col("id") * 2).alias("k"))  # evens
    bm = sketches.build_bloom_bitmap(members, "k", num_bits=m, num_hashes=k)
    probes = spark.range(n).select((F.col("id") * 2 + 1).alias("k"))  # odds
    hits = sketches.bloom_semi_join(
        # verify join against members would erase fps; probe-only effect is
        # observable by joining against the PROBE side (all survive verify)
        probes, probes, "k", num_bits=m, num_hashes=k, bitmap=bm
    ).count()
    fp_rate = hits / n
    theory = (1 - math.exp(-k * n / m)) ** k
    assert fp_rate <= max(3 * theory, 0.005), (fp_rate, theory)


def test_kmv_distinct_exact_below_k_and_estimates_above(spark):
    """Below k distinct values the sketch IS the exact count (rel_err 0);
    above, the estimate lands within the ~1/sqrt(k) KMV error band."""
    from pandas_db_sdk_spark import sketches

    small = spark.range(40).select(
        F.lit("s").alias("g"), (F.col("id") % 10).alias("v")
    )
    big = spark.range(20000).select(
        F.lit("b").alias("g"), (F.col("id") % 5000).alias("v")
    )
    out = {
        r.g: r
        for r in sketches.kmv_distinct(
            small.unionAll(big), "g", "v", k=128
        ).collect()
    }
    assert out["s"].est_distinct == 10.0 and out["s"].rel_err == 0.0
    assert out["b"].n_exact == 5000
    assert abs(out["b"].rel_err) < 3 / (128 ** 0.5)  # 3σ KMV band


def test_count_min_never_undercounts_and_is_exact_when_sparse(spark):
    """CMS one-sided guarantee: est >= true for EVERY probe (collisions
    only add); with width far above the domain, collisions vanish and
    every estimate is exact."""
    from pandas_db_sdk_spark import sketches

    df = spark.range(3000).select((F.col("id") % 30).alias("v"))
    probes = spark.range(30).select(F.col("id").alias("v"))
    crowded = {
        r.v: r
        for r in sketches.count_min_frequency(
            df, "v", probes, "v", depth=4, width=8
        ).collect()
    }
    assert len(crowded) == 30
    for v, r in crowded.items():
        assert r.true_count == 100
        assert r.est_count >= 100 and r.overcount == r.est_count - 100
    sparse = sketches.count_min_frequency(
        df, "v", probes, "v", depth=4, width=4096
    ).collect()
    assert all(r.overcount == 0 for r in sparse)


def test_count_min_absent_probe_estimates_zero_or_collision(spark):
    """A probe never seen in the stream has true_count 0; its estimate is
    whatever mass collided into its buckets — still >= 0 and one-sided."""
    from pandas_db_sdk_spark import sketches

    df = spark.range(100).select((F.col("id") % 10).alias("v"))
    probes = spark.createDataFrame([(999,)], "v long")
    (r,) = sketches.count_min_frequency(
        df, "v", probes, "v", depth=4, width=4096
    ).collect()
    assert r.true_count == 0 and r.est_count >= 0 and r.overcount == r.est_count


def test_count_min_mults_pairwise_distinct_for_any_caller_mult(spark):
    """ADVICE r7: a caller-supplied mult equal to a table value must not
    duplicate that hash row — rows 1+ substitute the spare so the depth
    multipliers stay pairwise distinct (the e^-depth bound's premise)."""
    from pandas_db_sdk_spark import sketches

    for m in sketches._CMS_MULTS + (12345,):
        mults = sketches._cms_mults_for(m)
        assert mults[0] == m
        assert len(set(mults)) == len(mults)
        assert len(mults) >= len(sketches._CMS_MULTS)
    # default path is byte-identical to the table (oracle-parity pin)
    assert sketches._cms_mults_for(sketches._CMS_MULTS[0]) == sketches._CMS_MULTS
    # and the sketch still runs one-sided with a table-valued mult
    df = spark.range(300).select((F.col("id") % 10).alias("v"))
    probes = spark.range(10).select(F.col("id").alias("v"))
    rows = sketches.count_min_frequency(
        df, "v", probes, "v", depth=4, width=4096, mult=sketches._CMS_MULTS[1]
    ).collect()
    assert all(r.true_count == 30 and r.est_count >= 30 for r in rows)
