"""Distributed sketches: Bloom-filter join pruning and exact heavy hitters.

The reference SDK (`/root/reference/src/pandas_db_sdk/client.py`, 216 lines)
exposes no sketch surface; these are the scale-path operators a 100 TB
training-data pipeline leans on:

- ``bloom_semi_join`` — the runtime-filter pattern (Spark's own
  ``spark.sql.optimizer.runtime.bloomFilter`` applies it only inside one
  query): build a Bloom bitmap over the SMALL side's join keys with a
  tree-reduce of per-partition bitmaps, broadcast the final compact
  bitmap (128 KiB at the default 2^20 bits), and drop non-matching big-side rows BEFORE the shuffle join. The
  exact verify join afterwards makes the result identical to a plain
  left-semi join (false positives only cost shuffle bytes, never
  correctness), so the operator stays oracle-checkable.

- ``heavy_hitters`` — exact frequent items without a full groupBy over
  every distinct key: a per-partition Misra–Gries pass (bounded counters,
  mapInPandas) nominates candidates — guaranteed to include every item
  with global frequency > N/k — then one exact recount of ONLY the
  candidates (a broadcast semi join; candidate count is bounded by
  partitions × k) yields exact counts. The expensive groupBy touches a
  bounded key set instead of the full distinct domain.

Both sketches hash on the JVM side (``xxhash64``) so Python only does
vectorized numpy arithmetic on int64 columns — no Python-side string
hashing in the hot path.
"""

from __future__ import annotations

import math
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["bloom_semi_join", "build_bloom_bitmap", "heavy_hitters"]

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain constants). Input and
    output are uint64 arrays; numpy unsigned arithmetic wraps mod 2^64."""
    z = x + _U64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _bit_positions(h64: np.ndarray, num_bits: int, num_hashes: int) -> np.ndarray:
    """(n, k) bit indexes via double hashing: h1 + i*h2 mod m. ``num_bits``
    must be a power of two so the mod is a mask (and uniform)."""
    mask = _U64(num_bits - 1)
    h1 = _splitmix64(h64)
    h2 = _splitmix64(h64 ^ _U64(0xA5A5A5A5A5A5A5A5)) | _U64(1)
    i = np.arange(num_hashes, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) & mask).astype(np.int64)


def _or_reduce_bitmaps(pdf_iter, n_words: int):
    bm = np.zeros(n_words, dtype=np.uint64)
    saw = False
    for pdf in pdf_iter:
        for buf in pdf["bitmap"]:
            bm |= np.frombuffer(buf, dtype=np.uint64)
            saw = True
    return bm, saw


def build_bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    fanin: int = 16,
) -> bytes:
    """Bloom bitmap (little-endian uint64 words) over ``keys[key_col]``.

    Scale posture: every input partition reduces to ONE ``num_bits/8``-byte
    row (mapInPandas, streaming over Arrow batches — per-task state is the
    bitmap, not the keys), then a two-level OR tree (``fanin`` groups →
    one row) bounds what any single reducer sees at ``max(P/fanin, fanin)``
    bitmaps. Only the final single bitmap reaches the driver — at the
    default 1 Mib that is broadcast-sized regardless of key count.
    """
    if num_bits & (num_bits - 1):
        raise ValueError(f"num_bits must be a power of two, got {num_bits}")
    n_words = num_bits // 64

    # canonical hash image: xxhash64 is TYPE-sensitive (int32 5 and int64 5
    # hash differently), so an int/bigint key-width mismatch between build
    # and probe would silently drop every row — hash the string image on
    # both sides instead (a plain join would coerce; so must we)
    hashed = keys.select(F.xxhash64(F.col(key_col).cast("string")).alias("h"))

    def partition_bitmap(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bm = np.zeros(n_words, dtype=np.uint64)
        saw = False
        for pdf in it:
            if len(pdf):
                saw = True
                pos = _bit_positions(
                    pdf["h"].to_numpy(dtype=np.int64).view(np.uint64),
                    num_bits,
                    num_hashes,
                )
                words, bits = pos >> 6, pos & 63
                np.bitwise_or.at(bm, words.ravel(), _U64(1) << bits.ravel().astype(np.uint64))
        if saw:
            yield pd.DataFrame({"bitmap": [bm.tobytes()]})

    def or_group(pdf: pd.DataFrame) -> pd.DataFrame:
        bm, _ = _or_reduce_bitmaps([pdf], n_words)
        return pd.DataFrame({"bitmap": [bm.tobytes()]})

    partial = hashed.mapInPandas(partition_bitmap, "bitmap binary")
    merged = (
        partial.withColumn("g", F.pmod(F.xxhash64(F.col("bitmap")), F.lit(fanin)))
        .groupBy("g")
        .applyInPandas(lambda pdf: or_group(pdf), "bitmap binary")
        .withColumn("g", F.lit(0))
        .groupBy("g")
        .applyInPandas(lambda pdf: or_group(pdf), "bitmap binary")
    )
    header = struct.pack("<II", num_bits, num_hashes)
    rows = merged.collect()
    if not rows:  # empty key set: nothing can match
        return header + bytes(num_bits // 8)
    return header + bytes(rows[0]["bitmap"])


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    small_key: str | None = None,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
    bitmap: bytes | None = None,
) -> DataFrame:
    """``big ⋉ small`` with a Bloom prefilter on the big side.

    Result is EXACTLY ``big.join(small_keys, 'left_semi')`` — the bitmap
    probe only discards rows that provably cannot match (no false
    negatives: a key present in ``small`` always has all its bits set);
    survivors still go through the exact semi join, so Bloom false
    positives cost shuffle bytes, not correctness.

    Why it matters at 100 TB: with a selective small side, the shuffle for
    the semi join moves only the ~fp-rate fraction of the big table that
    survives the probe instead of every row. The probe itself is a
    broadcast of one ``num_bits/8``-byte bitmap plus a vectorized Arrow
    batch filter — no per-row Python, no driver-side key set. Pass a
    prebuilt ``bitmap`` (from ``build_bloom_bitmap`` over the same key
    domain and parameters) to amortize the build across many queries —
    unlike Spark's per-query runtime bloomFilter, the bitmap is a value
    you can keep, ship, and reuse; correctness still holds because the
    verify join is exact (a stale bitmap that MISSES new small-side keys
    would drop rows, so rebuild on small-side growth — supersets are
    always safe).
    """
    small_key = small_key or key
    keys = small.select(F.col(small_key).alias(key)).distinct()
    if bitmap is None:
        bitmap = build_bloom_bitmap(
            keys, key, num_bits=num_bits, num_hashes=num_hashes
        )
    # the bitmap is self-describing (8-byte header): a build/probe mismatch
    # in EITHER parameter would silently drop matching rows before the
    # verify join, so adopt the header's values instead of trusting args
    num_bits, num_hashes = struct.unpack("<II", bitmap[:8])
    if len(bitmap) != 8 + num_bits // 8:
        raise ValueError(
            f"corrupt bloom bitmap: header says {num_bits} bits "
            f"({num_bits // 8} bytes) but body is {len(bitmap) - 8}"
        )
    bc = big.sparkSession.sparkContext.broadcast(bitmap[8:])

    @pandas_udf("boolean")
    def probe(h: pd.Series) -> pd.Series:
        bm = np.frombuffer(bc.value, dtype=np.uint64)
        pos = _bit_positions(
            h.to_numpy(dtype=np.int64).view(np.uint64), num_bits, num_hashes
        )
        hit = (bm[pos >> 6] >> (pos & 63).astype(np.uint64)) & _U64(1)
        return pd.Series(hit.all(axis=1))

    pruned = big.filter(probe(F.xxhash64(F.col(key).cast("string"))))
    return pruned.join(keys, key, "left_semi")


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold_frac: float,
    extra_counters: int = 8,
) -> DataFrame:
    """Exact items with frequency > ``threshold_frac`` of total rows.

    Two passes:

    1. Per-partition Misra–Gries with k = ceil(1/threshold_frac) +
       ``extra_counters`` counters (mapInPandas; per-task state is k
       dict entries, independent of partition size). An item the pass
       drops in EVERY partition has per-partition count ≤ n_p/k, hence
       global count ≤ N/k ≤ threshold·N — so the candidate union
       provably contains every true heavy hitter.
    2. Exact recount of candidates only: broadcast the candidate set
       (≤ partitions × k rows by construction), left-semi the source,
       groupBy over that bounded key domain, filter by the exact global
       threshold (1-row count table, broadcast BNLJ).

    Returns ``(item, cnt)`` — deterministic and oracle-equal to the plain
    ``GROUP BY ... HAVING cnt > frac*N``, but the full-table groupBy never
    materializes the unbounded distinct domain. NULL items are excluded
    (equi-join semantics drop them in the recount; the total N still
    counts every row), so a mostly-NULL column reports no NULL hitter —
    filter NULLs out or fill them first if NULL frequency matters.
    """
    k = int(math.ceil(1.0 / threshold_frac)) + extra_counters
    vals = df.select(F.col(col).alias("item"))
    typ = vals.schema["item"].dataType.simpleString()

    def mg_partition(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = pd.Series(dtype="int64")
        for pdf in it:
            # vectorized merge: no per-item Python loop in the hot path
            acc = acc.add(pdf["item"].value_counts(), fill_value=0)
            if len(acc) > k:
                # batched decrement: subtracting the (len-k)-th smallest
                # count from every counter removes equal occurrences of
                # distinct items — the classic MG step, amortized per batch.
                cut = np.partition(acc.to_numpy(), len(acc) - k - 1)[len(acc) - k - 1]
                acc = acc[acc > cut] - cut
        yield pd.DataFrame({"item": acc.index})

    candidates = vals.mapInPandas(mg_partition, f"item {typ}").distinct()
    total = df.select(F.count("*").alias("n_total"))
    return (
        vals.join(F.broadcast(candidates), "item", "left_semi")
        .groupBy("item")
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("cnt") > threshold_frac * F.col("n_total"))
        .select("item", "cnt")
    )


def kmv_distinct(
    df: DataFrame,
    keys,
    value_col: str,
    k: int = 64,
    mult: int = 1_327_217_885,
    modulus: int = 2_147_483_647,
) -> DataFrame:
    """K-minimum-values distinct sketch per key group: bounded-state
    cardinality estimation with FULL oracle parity.

    The classic KMV/bottom-k estimator: hash every value, keep each
    group's k smallest distinct hashes; if fewer than k exist the count
    is exact, otherwise estimate (k-1) * modulus / kth_smallest. State
    per group is k values at every stage — the WindowGroupLimit rank
    filter pushes the k-limit map-side, so the shuffle carries at most
    k rows per (task, group), never the distinct domain (the same
    mergeability that lets per-partition sketches OR together at 100 TB;
    contrast c25's exact count-distinct, whose first phase shuffles every
    distinct pair).

    The hash is the modular permutation x*⌊p/φ⌋ mod p (p = 2^31-1, the
    golden-ratio multiplier): a BIJECTION, so distinct hashes == distinct
    values (no collision error term), and dense SEQUENTIAL id ranges —
    the common case for surrogate keys — scatter across the full hash
    space (a small multiplier like Lehmer's 48271 maps [0, n) linearly
    into a 48271n-wide prefix and inflates estimates ~p/(48271·n)-fold).
    Unlike xxhash64, both Spark and DuckDB compute it with plain integer
    arithmetic, which is what makes the ESTIMATE itself hash-certifiable
    against the SQL oracle (d78). Two distinct value bounds apply:
    the BIJECTION (no-collision) guarantee holds only below the modulus
    (v and v+p collide mod p), i.e. values < 2_147_483_646; between that
    and the 2^63/mult ≈ 6.9e9 int64-overflow bound the sketch still runs
    but aliased values silently deflate n_seen/est_distinct. Cast wider
    domains down with pmod first (documented trade: that reintroduces
    the same collision term).

    Returns one row per key group: (*keys, est_distinct double,
    n_exact bigint, rel_err double).
    """
    from pyspark.sql import Window

    keys = [keys] if isinstance(keys, str) else list(keys)
    h = F.pmod(F.col(value_col).cast("long") * mult, F.lit(modulus))
    hashed = df.select(*keys, h.alias("__h"))
    w = Window.partitionBy(*keys).orderBy("__h")
    kmins = (
        hashed.withColumn("__rk", F.dense_rank().over(w))
        .filter(F.col("__rk") <= k)
        .groupBy(*keys)
        .agg(
            F.countDistinct("__h").alias("__n_seen"),
            F.max("__h").alias("__kth"),
        )
    )
    exact = df.groupBy(*keys).agg(
        F.countDistinct(value_col).alias("n_exact")
    )
    est = F.when(
        F.col("__n_seen") < k, F.col("__n_seen").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1)) * modulus / F.col("__kth"), 4)
    )
    return (
        kmins.join(exact, keys)
        .withColumn("est_distinct", est)
        .withColumn(
            "rel_err",
            F.round(F.col("est_distinct") / F.col("n_exact") - 1, 4),
        )
        .select(*keys, "est_distinct", "n_exact", "rel_err")
    )


# Classic full-period Lehmer/MCG multipliers mod 2^31-1 — one PER CMS ROW
# (row 0 keeps the kmv/d78 golden-ratio multiplier). Distinct multipliers
# make the rows distinct permutations, not affine shifts of one another.
_CMS_MULTS = (
    1_327_217_885,  # ⌊p/φ⌋, the kmv/d78 seed
    48_271,         # Park–Miller revised
    16_807,         # Lewis–Goodman–Miller
    69_621,         # L'Ecuyer
    630_360_016,    # Payne–Rabung–Bogyo
    397_204_094,    # SAS/IMSL
    950_706_376,    # Fishman–Moore
    62_089_911,     # L'Ecuyer table
)


def _cms_mults_for(mult: int):
    """Row multipliers with row 0 honouring the caller's ``mult``.
    Excluding ``mult`` from the table pool keeps the rows PAIRWISE
    DISTINCT even when the caller picks one of the table's own values —
    a duplicate row would re-correlate cross-row collisions, silently
    reinstating the exact weakness the table exists to fix; when that
    happens ``_CMS_MULTS[0]`` serves as the spare, so depth ≤
    len(_CMS_MULTS) rows are always available."""
    return (mult,) + tuple(m for m in _CMS_MULTS if m != mult)


def count_min_frequency(
    df: DataFrame,
    value_col: str,
    probe_df: DataFrame,
    probe_col: str,
    depth: int = 4,
    width: int = 1024,
    mult: int = 1_327_217_885,
    modulus: int = 2_147_483_647,
) -> DataFrame:
    """Count-Min Sketch point queries with FULL oracle parity: estimate
    the frequency of each probe key from a fixed depth x width counter
    grid instead of a groupBy over the full key domain.

    The sketch is ``depth`` pairwise-distinct hash rows of ``width``
    counters — each row uses its OWN Lehmer multiplier (``_CMS_MULTS``),
    so for any value pair the bucket deltas (u-v)*m_j mod p differ per
    row and cross-row collisions decorrelate; a single shared multiplier
    with affine shifts ((v+j)*m) makes every row a translate of row 0,
    correlating collisions and voiding the e^-depth bound on regular or
    adversarial key sets (only the one-sided est >= true guarantee would
    survive). ``mult`` seeds row 0 for compatibility;
    an item increments one counter per row and its estimate is the MIN
    over its ``depth`` counters — always >= the true count (collisions
    only ever ADD), with the classic (eps = e/width, delta = e^-depth)
    overcount guarantee. Build is one explode -> groupBy(j, bucket):
    map-side partial aggregation collapses every task's contribution to
    at most depth*width cells before the shuffle, so the exchange volume
    is sketch-sized regardless of input rows — the mergeability that
    lets 100 TB of per-task grids sum into one 4 KiB-row table (contrast
    an exact per-key count, whose shuffle carries the distinct domain).
    The probe side broadcasts the finished sketch (depth*width rows)
    and takes the row-wise min.

    Hashes are the d78/kmv modular-permutation family ((v + j) * m_j
    mod p mod width — plain integer arithmetic in both Spark and DuckDB,
    so the ESTIMATES themselves hash-certify against a SQL oracle; no
    error-band indirection). Values must stay below 2^63/mult ~ 6.9e9;
    pmod wider domains down first.

    Returns one row per distinct probe key: (probe_col, est_count
    bigint, true_count bigint, overcount bigint >= 0).
    """
    if depth > len(_CMS_MULTS):
        raise ValueError(
            f"depth {depth} exceeds the {len(_CMS_MULTS)} independent hash rows"
        )
    mults = _cms_mults_for(mult)
    v = F.col(value_col).cast("long")
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("__j"),
                        F.pmod(F.pmod((v + j) * mults[j], F.lit(modulus)), F.lit(width)).alias(
                            "__b"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__e")
    )
    sketch = cells.groupBy(
        F.col("__e.__j").alias("__j"), F.col("__e.__b").alias("__b")
    ).agg(F.count("*").alias("__c"))

    probes = probe_df.select(F.col(probe_col).alias("__v")).distinct()
    pv = F.col("__v").cast("long")
    probe_cells = probes.select(
        "__v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("__j"),
                        F.pmod(F.pmod((pv + j) * mults[j], F.lit(modulus)), F.lit(width)).alias(
                            "__b"
                        ),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("__e"),
    ).select("__v", F.col("__e.__j").alias("__j"), F.col("__e.__b").alias("__b"))
    est = (
        probe_cells.join(F.broadcast(sketch), ["__j", "__b"], "left")
        .groupBy("__v")
        .agg(F.min(F.coalesce(F.col("__c"), F.lit(0))).alias("est_count"))
    )
    true_ = (
        df.select(v.alias("__v"))
        .join(F.broadcast(probes), "__v", "left_semi")
        .groupBy("__v")
        .agg(F.count("*").alias("true_count"))
    )
    # both sides of the final stitch are probe-bounded (one row per
    # distinct probe key) — broadcast instead of shuffling est AND true_
    return (
        est.join(F.broadcast(true_), "__v", "left")
        .select(
            F.col("__v").alias(probe_col),
            F.col("est_count").cast("long").alias("est_count"),
            F.coalesce(F.col("true_count"), F.lit(0)).cast("long").alias("true_count"),
            (F.col("est_count") - F.coalesce(F.col("true_count"), F.lit(0)))
            .cast("long")
            .alias("overcount"),
        )
    )


def kmv_set_ops(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = 64,
    mult: int = 1_327_217_885,
    modulus: int = 2_147_483_647,
) -> DataFrame:
    """Sketch ALGEBRA over KMV sketches — for every consecutive integer
    group pair (g, g+1): estimated |A∪B|, |A∩B| and Jaccard, plus the
    exact values for the rel-err audit. This is the mergeability story
    that makes bottom-k sketches the 100 TB tool: two groups' sketches
    combine into the union's sketch by keeping the k smallest of their
    (≤2k) hashes — no second pass over data — and ρ = |union-sketch ∩
    A-sketch ∩ B-sketch| / |union-sketch| estimates Jaccard, so
    |A∩B| ≈ ρ·|A∪B| (Beyer et al., SIGMOD'07).

    The ONLY data-sized operation is the first distinct collapse; every
    later frame is k-bounded per group. The ``kmv_distinct`` modular-
    permutation hash (a bijection, plain integer arithmetic in any
    engine) makes the estimates themselves oracle-certifiable, and when a
    pair's union sketch is unsaturated (< k hashes) the "estimates"
    are exact by construction.
    """
    from pyspark.sql import Window

    from ._scratch import scratch_persist

    h = F.pmod(F.col(value_col).cast("long") * mult, F.lit(modulus))
    dist = df.select(F.col(group_col).alias("g"), h.alias("__h")).distinct()
    w = Window.partitionBy("g").orderBy("__h")
    sk = scratch_persist(
        dist.withColumn("__rk", F.row_number().over(w)).filter(F.col("__rk") <= k),
        "kmvset/group_sketches",
    )
    sizes = dist.groupBy("g").agg(F.count("*").alias("nd"))

    a = sk.select(F.col("g").alias("pair"), "__h")
    b = sk.select((F.col("g") - 1).alias("pair"), "__h")
    wu = Window.partitionBy("pair").orderBy("__h")
    un = scratch_persist(
        a.unionByName(b)
        .distinct()
        .withColumn("__rk", F.row_number().over(wu))
        .filter(F.col("__rk") <= k),
        "kmvset/union_sketches",
    )
    ustat = un.groupBy("pair").agg(
        F.count("*").alias("u_seen"), F.max("__h").alias("u_kth")
    )
    both = (
        un.join(a, ["pair", "__h"])
        .join(b, ["pair", "__h"])
        .groupBy("pair")
        .agg(F.count("*").alias("n_both"))
    )

    # exact pair truth: distinct values per group, year-keyed equi joins
    vals = scratch_persist(
        df.select(F.col(group_col).alias("g"), F.col(value_col).alias("v")).distinct(),
        "kmvset/group_values",
    )
    ex_int = (
        vals.alias("l")
        .join(
            vals.select((F.col("g") - 1).alias("g"), "v").alias("r"),
            ["g", "v"],
        )
        .groupBy("g")
        .agg(F.count("*").alias("exact_int"))
        .withColumnRenamed("g", "pair")
    )

    est_u = F.when(F.col("u_seen") < k, F.col("u_seen").cast("double")).otherwise(
        F.round(F.lit(float(k - 1)) * modulus / F.col("u_kth"), 4)
    )
    out = (
        ustat.join(
            F.broadcast(sizes.select(F.col("g").alias("pair"), F.col("nd").alias("n_a"))),
            "pair",
        )
        .join(
            F.broadcast(
                sizes.select((F.col("g") - 1).alias("pair"), F.col("nd").alias("n_b"))
            ),
            "pair",
        )
        .join(F.broadcast(both), "pair", "left")
        .join(F.broadcast(ex_int), "pair", "left")
        .fillna({"n_both": 0, "exact_int": 0})
    )
    jac = F.col("n_both") / F.col("u_seen")
    return out.select(
        F.col("pair").alias("group_a"),
        (F.col("pair") + 1).alias("group_b"),
        F.col("n_a").cast("long").alias("exact_a"),
        F.col("n_b").cast("long").alias("exact_b"),
        est_u.alias("est_union"),
        F.round(jac, 6).alias("est_jaccard"),
        F.round(jac * est_u, 4).alias("est_intersection"),
        (F.col("n_a") + F.col("n_b") - F.col("exact_int"))
        .cast("long")
        .alias("exact_union"),
        F.col("exact_int").cast("long").alias("exact_intersection"),
    )
