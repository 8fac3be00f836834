"""Scratch-persist pool behavior — VERDICT r3 item #8 + ADVICE r3.

Pins the two properties the pool exists for (previously asserted only in
its docstring): identical re-invocation REUSES the cached generation
(warm-path hit, no new blocks), and a parameter/input change EVICTS the
stale generation first (storage memory bounded at one generation per
slot). Plus the ADVICE hash-collision guard: a 32-bit semanticHash match
alone must not hand back a cached frame for a different plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pandas_db_sdk_spark import _scratch
from pandas_db_sdk_spark._scratch import reclaim, scratch_persist

SLOT = "test_scratch/slot"


def _fresh(spark, n=100, thresh=50):
    return spark.range(n).filter(F.col("id") < thresh).select(
        F.col("id"), (F.col("id") * 2).alias("x")
    )


def test_identical_reinvocation_reuses_cached_frame(spark):
    reclaim(spark, "test_scratch/")
    a = scratch_persist(_fresh(spark), SLOT)
    a.count()  # materialize the cache
    assert a.storageLevel.useMemory
    # a NEW but semantically identical plan resolves to the SAME handle —
    # no second generation of blocks
    b = scratch_persist(_fresh(spark), SLOT)
    assert b is a
    reclaim(spark, "test_scratch/")


def test_parameter_change_evicts_stale_generation(spark):
    reclaim(spark, "test_scratch/")
    old = scratch_persist(_fresh(spark, thresh=50), SLOT)
    old.count()
    assert old.storageLevel.useMemory
    new = scratch_persist(_fresh(spark, thresh=60), SLOT)  # changed param
    assert new is not old
    # the stale generation's blocks are released (unpersist resets the
    # storage level), the new one is registered
    assert not old.storageLevel.useMemory
    assert new.storageLevel.useMemory
    assert new.count() == 60
    reclaim(spark, "test_scratch/")


def test_semantic_hash_collision_never_returns_wrong_frame(spark):
    """ADVICE r3: semanticHash is 32-bit; equality alone would return a
    cached frame for DIFFERENT input on collision. Simulate one by
    planting the new plan's hash against the OLD frame — sameSemantics
    must reject it and persist the new frame instead."""
    reclaim(spark, "test_scratch/")
    old = scratch_persist(_fresh(spark, thresh=50), SLOT).persist()
    old.count()

    new_plan = _fresh(spark, thresh=60)
    h_new = new_plan._jdf.queryExecution().analyzed().semanticHash()
    key = (spark.sparkContext.applicationId, SLOT)
    _scratch._POOL[key] = (h_new, old)  # forged collision

    got = scratch_persist(new_plan, SLOT)
    assert got is not old
    assert got.count() == 60
    reclaim(spark, "test_scratch/")


# ---------------------------------------------------------------- model cache


def test_cached_model_reuses_and_rebuilds(spark):
    from pandas_db_sdk_spark import _models

    _models.invalidate(spark, "t/")
    calls = []

    def build(tag):
        def _b():
            calls.append(tag)
            return {"model": tag}
        return _b

    df = spark.range(100)
    a = _models.cached_model(df, "t/m", ("p", 1), build("first"))
    b = _models.cached_model(spark.range(100), "t/m", ("p", 1), build("second"))
    assert b is a and calls == ["first"]  # identical plan+params → no rebuild
    c = _models.cached_model(df, "t/m", ("p", 2), build("third"))
    assert c == {"model": "third"}  # param change → rebuild (own slot)
    d = _models.cached_model(spark.range(200), "t/m", ("p", 1), build("fourth"))
    assert d == {"model": "fourth"}  # input change → rebuild
    _models.invalidate(spark, "t/")


def test_cached_model_hash_collision_never_serves_wrong_model(spark):
    """Same two-gate identity as the scratch pool: a forged semanticHash
    match with a DIFFERENT stored plan must fail sameSemantics and
    rebuild."""
    from pandas_db_sdk_spark import _models

    _models.invalidate(spark, "t/")
    old_df = spark.range(100)
    _models.cached_model(old_df, "t/c", (), lambda: "OLD")
    new_df = spark.range(300)
    h_new = new_df._jdf.queryExecution().analyzed().semanticHash()
    key = (spark.sparkContext.applicationId, "t/c/()")
    _models._POOL[key] = (h_new, old_df, "OLD")  # forged collision
    got = _models.cached_model(new_df, "t/c", (), lambda: "NEW")
    assert got == "NEW"
    _models.invalidate(spark, "t/")


def test_scratch_repersists_after_external_clearcache(spark):
    """spark.catalog.clearCache() drops pooled blocks behind the pool's
    back; a subsequent slot hit must re-register the persist instead of
    handing back a permanently-uncached handle."""
    from pyspark.sql import functions as F

    from pandas_db_sdk_spark._scratch import scratch_persist

    df = spark.range(100).select(F.col("id") * 3)
    a = scratch_persist(df, "test/clearcache")
    a.count()
    spark.catalog.clearCache()
    b = scratch_persist(spark.range(100).select(F.col("id") * 3), "test/clearcache")
    assert b.storageLevel.useMemory or b.storageLevel.useDisk
