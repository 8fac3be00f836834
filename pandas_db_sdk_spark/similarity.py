"""Vector similarity search — SURVEY §2 D3/D4.

Embeddings are `array<float>` columns; all arithmetic runs as JVM
higher-order functions (zip_with / aggregate) in double precision — no
Python, no UDF in the scoring path.

Two tiers, same results contract:

* brute-force top-k — broadcast the (small) query set, score every corpus
  row, per-query window top-k. Linear in corpus size, embarrassingly
  parallel: correct baseline at any scale where queries are few.
* LSH-bucketed ANN — random-hyperplane signatures (seeded, hash-derived, so
  they're deterministic WITHOUT shipping plane matrices), equi-join on
  signature buckets, exact rerank inside buckets. The bucket join replaces
  the corpus-wide scoring: cost ∝ bucket collisions, not corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dot(a, b):
    """Σ aᵢ·bᵢ in double — zip_with + aggregate, fully codegen'd."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, p: acc + p)


def l2_norm(a):
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine(a, b):
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk_bruteforce(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """D3 baseline: exact top-k by cosine. Queries are broadcast (they must be
    small — that's the contract of this tier); the corpus never shuffles
    until the final per-query top-k, which moves k·partitions rows."""
    qs = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    cs = corpus.select(F.col(corpus_id).alias("neighbor_id"), F.col(vec_col).alias("__cv"))
    scored = cs.join(F.broadcast(qs)).withColumn(
        "cos", F.round(cosine(F.col("__qv"), F.col("__cv")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def hyperplane_signature(vec_col, n_planes: int = 16, dim: int = 64, seed: int = 7):
    """Random-hyperplane bit signature with hash-derived ±1 plane entries.

    plane[p][d] = sign(xxhash64(seed, p*dim+d)) — every executor derives the
    same planes from literals; nothing is broadcast or collected.
    """
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col

    def plane_dot(p):
        return F.aggregate(
            F.zip_with(
                v,
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda d: F.when(
                        F.pmod(F.xxhash64(F.lit(seed), p * dim + d), 2) == 0, F.lit(1.0)
                    ).otherwise(F.lit(-1.0)),
                ),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda p: F.when(plane_dot(p) >= 0, F.lit(1)).otherwise(F.lit(0)),
    )
    # pack bit array → one long key (Horner fold: acc*2 + bit)
    return F.aggregate(
        bits, F.lit(0).cast("long"), lambda acc, bit: acc * 2 + bit.cast("long")
    )


def cosine_topk_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    query_id: str,
    corpus_id: str,
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 12,
    dim: int = 64,
    n_tables: int = 4,
) -> DataFrame:
    """D3 scale path: multi-table hyperplane LSH → bucket equi-join → exact
    cosine rerank inside buckets → per-query top-k.

    Recall < 1.0 by construction (ANN); raise n_tables for recall, n_planes
    for selectivity. The join is on (table, bucket) keys — at 100 TB this is
    a plain shuffled equi-join Catalyst/AQE can plan, never a crossJoin.
    """
    def with_buckets(df, id_alias):
        sigs = F.array(
            *[
                hyperplane_signature(vec_col, n_planes, dim, seed=101 + t)
                for t in range(n_tables)
            ]
        )
        return df.select(
            F.col("*"),
            F.posexplode(sigs).alias("__table", "__bucket"),
        ).select(
            F.col(query_id if id_alias == "query_id" else corpus_id).alias(id_alias),
            F.col(vec_col).alias(f"__{id_alias}_v"),
            "__table",
            "__bucket",
        )

    qb = with_buckets(queries, "query_id")
    cb = with_buckets(corpus, "neighbor_id")
    cand = (
        qb.join(cb, ["__table", "__bucket"])
        .select("query_id", "neighbor_id", "__query_id_v", "__neighbor_id_v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cos", F.round(cosine(F.col("__query_id_v"), F.col("__neighbor_id_v")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos", "rank")
    )


def near_dup_pairs_by_cosine(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str,
    threshold: float = 0.95,
) -> DataFrame:
    """D2/D3: embedding-cosine near-duplicate pairs within blocking groups.

    The caller provides the blocking column (a cluster id, an LSH bucket, a
    shard key) — pair generation is an equi-join on it, so cost is
    Σ block² instead of n². Returns (id_a, id_b, cos) above threshold.
    """
    a = df.select(
        F.col(block_col).alias("__blk"), F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a")
    )
    b = df.select(
        F.col(block_col).alias("__blk"), F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b")
    )
    pairs = a.join(b, "__blk").filter(F.col("id_a") < F.col("id_b"))
    return (
        pairs.withColumn("cos", F.round(cosine(F.col("v_a"), F.col("v_b")), 6))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
