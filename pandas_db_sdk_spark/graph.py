"""Document-graph analytics — iterative link algorithms as DataFrame loops.

Training-data pipelines use lightweight graphs over documents (shared rare
vocabulary, citation/link fields, near-dup edges) for influence scoring and
sampling. The algorithms here follow the repo's iterative-op discipline
(dedup.connected_components): pure DataFrame joins per round, localCheckpoint
to keep lineage O(1), only O(1) driver state.

Reference parity: the reference SDK (client.py, 216 lines) has no graph
surface; this extends the engine the same way Tier-D does (SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ._localrel import local_rows_df

# Exact accumulation type for rank mass: per-node neighbor sums are
# order-dependent in double; routing every contribution through decimal
# makes each iteration bit-deterministic under any partitioning (the same
# trick as corpus/_util.dsum), so a single-node oracle can replay the
# unrolled recurrence exactly.
_RDEC = "decimal(28,14)"


def pagerank(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    iterations: int = 3,
    damping: float = 0.85,
    directed: bool = False,
) -> DataFrame:
    """PageRank over an edge list, fixed iteration count.

    Returns (id, rank) for every node that appears in an edge. Undirected
    by default (each edge contributes both directions), so every node has
    degree >= 1 and there is no dangling-mass term — the recurrence is the
    textbook r' = (1-d)/N + d * Σ_in r/deg.

    Scale shape: degree is one aggregate; each iteration is one
    (src-keyed) join + one (dst-keyed) partial+final aggregate — rank and
    degree tables hold one row per NODE, never per edge, and the edge
    table is the only corpus-sized operand. localCheckpoint per round
    keeps the plan from growing a join-tree per iteration. Ranks
    accumulate through DECIMAL (bit-deterministic; oracle-replayable) and
    each iteration rounds to 12 dp so the fixed point is engine-exact.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if not directed:
        e = e.union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
    e = e.distinct().localCheckpoint(eager=False)

    deg = e.groupBy("s").agg(F.count("*").alias("deg"))
    # every endpoint is a node: in the directed case pure SINKS have no
    # out-edge (no deg row) but still accumulate rank; deriving nodes
    # from deg alone would silently drop them. (Directed dangling mass is
    # NOT redistributed — sinks absorb it; the undirected default has no
    # dangling nodes, so its recurrence is the exact textbook one.)
    nodes = (
        e.select(F.col("s").alias("id"))
        .union(e.select(F.col("d").alias("id")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()

    # init rounds like every iteration does — the oracle replays the
    # recurrence on rounded values, so the seed must be rounded too
    ranks = nodes.select("id", F.round(F.lit(1.0 / n), 12).alias("rank"))
    base = (1.0 - damping) / n
    for _ in range(iterations):
        contrib = (
            e.join(deg, "s")
            .join(ranks.withColumnRenamed("id", "s"), "s")
            .select("d", (F.col("rank") / F.col("deg")).alias("c"))
        )
        incoming = contrib.groupBy("d").agg(
            F.sum(F.col("c").cast(_RDEC)).cast("double").alias("m")
        )
        ranks = (
            nodes.join(incoming.withColumnRenamed("d", "id"), "id", "left")
            .select(
                "id",
                F.round(
                    F.lit(base) + F.lit(damping) * F.coalesce("m", F.lit(0.0)), 12
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks


def rare_token_edges(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 2,
    max_df: int = 3,
    shingle: int = 3,
) -> DataFrame:
    """Document co-occurrence edges through RARE features: (id_a < id_b)
    for every pair of docs sharing a word ``shingle``-gram whose document
    frequency lies in [min_df, max_df] (single tokens are too common to be
    discriminative — ``shingle=1`` degrades to them). Rare-feature
    blocking bounds the bucket: a feature's pair contribution is at most
    C(max_df, 2), so edge volume is O(vocab × max_df²) — linear-ish, never
    a corpus self-join. (At 100 TB, re-key the groupBy on
    xxhash64(feature) — 8-byte shuffle keys; hash collisions only add
    spurious edges, which PageRank tolerates.)"""
    from .text import word_ngrams

    feat = (
        word_ngrams(text_col, shingle)
        if shingle > 1
        else F.split(F.col(text_col), " ")
    )
    pairs = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(feat)).alias("token"),
    )
    rare = (
        pairs.groupBy("token")
        .agg(F.collect_set("id").alias("ids"))
        .filter((F.size("ids") >= min_df) & (F.size("ids") <= max_df))
    )
    from ._scratch import scratch_persist

    # slot-pooled scratch (r10): the edge list is consumed several times
    # by every caller — the adaptive gate's probe + collect, seed
    # derivation, and the iterative loop's own edge cache — and across
    # the d94/d95/d100/d65 family; without this each pass re-runs the
    # explode + collect_set pipeline over the corpus
    return scratch_persist(
        rare.select(
            F.explode(
                F.expr(
                    "flatten(transform(array_sort(ids), (a, i) -> "
                    "transform(slice(array_sort(ids), i + 2, size(ids)), "
                    "b -> struct(a AS id_a, b AS id_b))))"
                )
            ).alias("p")
        )
        .select("p.*")
        .distinct(),
        "rare_token_edges/pairs",
    )


def hierarchy_depth(
    parents: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    max_iter: int = 40,
    local_threshold: int = 100_000,
) -> DataFrame:
    """Depth of every node in a forest given (id, parent) edges — parent
    NULL marks a root (depth 0). The transitive-closure sibling of
    ``dedup.connected_components``, via POINTER DOUBLING: each round every
    node's known ancestor jumps to THAT ancestor's known ancestor and the
    step counts add, so reachable distance doubles per round — a depth-10⁶
    chain resolves in ~20 rounds, each ONE self-join of the node-sized
    state table (never a per-level corpus join). localCheckpoint per round
    keeps lineage O(1); exceeding ``max_iter`` raises (a cycle — depth is
    undefined — or a tree deeper than 2^40) rather than returning wrong
    depths.

    ADAPTIVE (r10, the connected_components discipline): hierarchies at
    most ``local_threshold`` rows resolve driver-side with a memoized
    parent walk (exact integers, identical cycle raise);
    ``local_threshold=0`` pins the distributed path.
    """
    if local_threshold > 0:
        probe = parents.select(id_col, parent_col).limit(
            local_threshold + 1
        ).count()
        if probe <= local_threshold:
            rows = parents.select(id_col, parent_col).collect()
            parent = {r[0]: r[1] for r in rows if r[1] is not None}
            roots_l = [r[0] for r in rows if r[1] is None]
            depth: dict = {}
            # shared raise contract (ADVICE r10): the local walk enforces
            # the SAME depth budget the doubling loop implies (resolvable
            # depth <= 2^max_iter) and raises the SAME mechanism-neutral
            # message on either trigger — previously the local path
            # accepted arbitrarily deep acyclic chains the distributed
            # path would reject, and its message misdescribed the walk.
            bound = 1 << max_iter

            def resolve(x):
                chain = []
                cur = x
                while cur in parent and cur not in depth:
                    if cur in seen_on_path:
                        raise RuntimeError(_hier_budget_msg(max_iter))
                    seen_on_path.add(cur)
                    chain.append(cur)
                    cur = parent[cur]
                base = depth.get(cur, 0)
                for node in reversed(chain):
                    base += 1
                    if base > bound:
                        raise RuntimeError(_hier_budget_msg(max_iter))
                    depth[node] = base

            for r in rows:
                if r[1] is not None and r[0] not in depth:
                    seen_on_path: set = set()
                    resolve(r[0])
            out = [(x, 0) for x in roots_l] + [
                (x, depth[x]) for x in (r[0] for r in rows) if x in depth
            ]
            return local_rows_df(parents.sparkSession,
                out, f"id {dict(parents.dtypes)[id_col]}, depth int"
            )

    roots = parents.filter(F.col(parent_col).isNull()).select(
        F.col(id_col).alias("id"), F.lit(0).alias("depth")
    )
    state = (
        parents.filter(F.col(parent_col).isNotNull())
        .select(
            F.col(id_col).alias("id"),
            F.col(parent_col).alias("anc"),
            F.lit(1).alias("d"),
        )
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iter):
        t = state.select(
            F.col("id").alias("t_id"),
            F.col("anc").alias("t_anc"),
            F.col("d").alias("t_d"),
        )
        jumped = (
            state.join(t, state.anc == t.t_id, "left")
            .select(
                "id",
                F.coalesce("t_anc", "anc").alias("anc"),
                (F.col("d") + F.coalesce("t_d", F.lit(0))).alias("d"),
                F.col("t_id").isNotNull().alias("__moved"),
            )
            .localCheckpoint(eager=False)
        )
        moved = jumped.filter(F.col("__moved")).limit(1).count()
        state = jumped.drop("__moved")
        if not moved:
            break
    else:
        raise RuntimeError(_hier_budget_msg(max_iter))
    return roots.union(state.select("id", F.col("d").alias("depth")))


def _hier_budget_msg(max_iter: int) -> str:
    """One message for BOTH hierarchy_depth execution paths: the raise
    fires when depth exceeds the 2^max_iter budget OR the parent edges
    contain a cycle (depth undefined) — mechanism-neutral wording so the
    local memoized walk and the distributed doubling loop share one
    contract (ADVICE r10)."""
    return (
        f"hierarchy_depth exceeded its depth budget (depth > 2^{max_iter}) "
        "or the parent edges contain a cycle (depth is undefined on a "
        "cycle) — raise max_iter only for genuinely deeper forests"
    )


def triangle_count(edges: DataFrame, a: str = "id_a", b: str = "id_b") -> DataFrame:
    """Exact global triangle count over an undirected edge list, via
    DEGREE-ORIENTED wedge joins — the O(E^1.5) bound that survives skew.

    A naive wedge join explodes on hub nodes (Σ deg² wedges; one celebrity
    node with degree 10⁶ yields 10¹² wedges). Orienting every edge from
    its lower-(degree, id) endpoint to the higher one caps every node's
    OUT-degree at O(√E), so the wedge join generates at most O(E^1.5)
    candidates regardless of degree skew, and each triangle is counted
    exactly once (at its minimum-order vertex). Three equi-joins total:
    degrees (one agg), wedges (out×out self-join), closing-edge probe.

    Input edges may carry duplicates or both directions; they are
    normalized to distinct undirected pairs first. Returns one row:
    (n_edges, n_triangles).
    """
    from ._scratch import scratch_persist

    # both consumed >=2x (degrees + orientation + edge count; wedge x2 +
    # closing probe): persist so the normalize/orient subtrees run once —
    # without this every reference replays the full upstream plan
    und = scratch_persist(
        edges.select(
            F.least(F.col(a), F.col(b)).alias("u"),
            F.greatest(F.col(a), F.col(b)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct(),
        "triangle_count/und",
    )
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
    )
    # orientation key: degree-major, id-minor — a total order, encoded as
    # one comparable long (ids are < 2^31 in every fixture/TPC-H domain;
    # degree < 2^31 by pigeonhole)
    key = (F.col("d").cast("long") * F.lit(1 << 31) + F.col("n")).alias("k")
    keyed = deg.select("n", key)
    ku = keyed.select(F.col("n").alias("u"), F.col("k").alias("ku"))
    kv = keyed.select(F.col("n").alias("v"), F.col("k").alias("kv"))
    oriented = scratch_persist((
        und.join(ku, "u")
        .join(kv, "v")
        .select(
            F.when(F.col("ku") < F.col("kv"), F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(F.col("ku") < F.col("kv"), F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(F.col("ku") < F.col("kv"), F.col("kv")).otherwise(F.col("ku")).alias("kdst"),
        )
    ), "triangle_count/oriented")
    o1 = oriented.select("src", F.col("dst").alias("w1"), F.col("kdst").alias("k1"))
    o2 = oriented.select("src", F.col("dst").alias("w2"), F.col("kdst").alias("k2"))
    wedges = o1.join(o2, "src").filter(F.col("k1") < F.col("k2")).select("w1", "w2")
    # inner (not semi): oriented edges are distinct, so each wedge matches
    # its closing edge at most once — the join IS the triangle set
    closed = wedges.join(
        oriented.select(F.col("src").alias("w1"), F.col("dst").alias("w2")),
        ["w1", "w2"],
    )
    n_tri = closed.agg(F.count("*").alias("n_triangles"))
    n_e = und.agg(F.count("*").alias("n_edges"))
    return n_e.crossJoin(F.broadcast(n_tri))


def _local_frontier_relax(edge_rows, seed_ids, max_iter, step, algo_name):
    """Driver-side frontier relaxation shared by the count-gated local
    paths of :func:`bfs_hops` (step = constant 1) and
    :func:`shortest_paths` (step = edge weight) — the SAME round-based
    Bellman–Ford the distributed loop runs, including the round budget:
    convergence past ``max_iter`` live rounds raises with the
    distributed path's message, so local and distributed agree not just
    on values but on the depth-bound contract the recursive-CTE oracles
    rely on. Exact integer arithmetic throughout."""
    adj: dict = {}
    for row in edge_rows:
        s, d = row[0], row[1]
        w = int(row[2]) if step is None else step
        adj.setdefault(s, []).append((d, w))
        adj.setdefault(d, []).append((s, w))
    messages = {
        "shortest_paths": (
            f"shortest_paths did not converge in {max_iter} rounds — some "
            "shortest path uses more edges; raise max_iter for this graph"
        ),
        "bfs_hops": (
            f"bfs_hops did not converge in {max_iter} rounds — seed-set "
            f"eccentricity exceeds max_iter; raise it for this graph"
        ),
    }
    dist = {sd: 0 for sd in seed_ids}
    frontier = set(seed_ids)
    rounds = 0
    while frontier:
        rounds += 1
        if rounds > max_iter:
            raise RuntimeError(messages[algo_name])
        nxt = set()
        for u in frontier:
            du = dist[u]
            for v, w in adj.get(u, ()):
                nd = du + w
                if v not in dist or nd < dist[v]:
                    dist[v] = nd
                    nxt.add(v)
        frontier = nxt
    return dist


def shortest_paths(
    edges: DataFrame,
    seeds: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    weight: str = "w",
    max_iter: int = 30,
    local_threshold: int = 100_000,
) -> DataFrame:
    """Single-source-set WEIGHTED shortest paths over an undirected edge
    list — Bellman–Ford frontier relaxation as pure DataFrame rounds; the
    weighted generalization of :func:`bfs_hops` (hop counts are the
    all-weights-1 special case).

    ``seeds`` is a one-column DataFrame of source node ids (distance 0);
    ``weight`` must be a NON-NEGATIVE integer-typed column (distances
    accumulate in long, so sums are exact and the result is
    hash-certifiable against a declarative oracle — float weights would
    reintroduce order-dependent rounding). Returns (id, dist long) for
    every node reachable from a seed; unreachable nodes are absent.

    Scale shape (the bfs_hops discipline): state is one row per REACHED
    node; each round relaxes only the just-improved DELTA against the
    edge table (one equi-join + one min-aggregate — map-side partial, so
    the shuffle carries node-sized data), then min-merges into the
    state; localCheckpoint per round keeps lineage O(1). Bellman–Ford
    settles every shortest path that uses ≤ k edges by round k, so
    convergence within ``max_iter`` PROVES no shortest path is longer
    than max_iter hops — which is exactly the bound a depth-limited
    recursive-CTE oracle needs to be exhaustive. Raises after
    ``max_iter`` rounds with a live frontier instead of returning
    silently-truncated distances.

    ADAPTIVE (r10, the connected_components discipline): at most
    ``local_threshold`` edges — probed with an early-stopping limit
    count — solve driver-side with the SAME round-counting Bellman–Ford
    (exact long arithmetic, identical raise contract), replacing
    rounds × 2 driver actions of distributed fixpoint with one bounded
    collect. ``local_threshold=0`` pins the distributed path.
    """
    from ._scratch import scratch_persist

    # NULL-weight contract (ADVICE r10): both paths IGNORE null-weight
    # edges.  The distributed min-aggregate already drops them (null
    # distances never win a min); the local path must filter them out
    # BEFORE the collect or int(None) crashes the driver — one explicit
    # filter on each path keeps the contract shared and visible.
    if local_threshold > 0:
        probe = edges.select(a, b).limit(local_threshold + 1).count()
        if probe <= local_threshold:
            edge_rows = edges.filter(F.col(weight).isNotNull()).select(
                a, b, F.col(weight).cast("long")
            ).collect()
            seed_ids = [r[0] for r in seeds.distinct().collect()]
            dist = _local_frontier_relax(
                edge_rows, seed_ids, max_iter, None, "shortest_paths"
            )
            return local_rows_df(edges.sparkSession,
                list(dist.items()), f"id {dict(edges.dtypes)[a]}, dist long"
            )

    ew = edges.filter(F.col(weight).isNotNull())
    e = scratch_persist(
        ew.select(
            F.col(a).alias("s"), F.col(b).alias("d"), F.col(weight).cast("long").alias("w")
        ).union(
            ew.select(
                F.col(b).alias("s"), F.col(a).alias("d"), F.col(weight).cast("long").alias("w")
            )
        ).distinct(),
        "shortest_paths/edges",
    )
    seed_col = seeds.columns[0]
    state = (
        seeds.select(F.col(seed_col).alias("id"))
        .distinct()
        .withColumn("dist", F.lit(0).cast("long"))
        .localCheckpoint(eager=False)
    )
    frontier = state
    for _ in range(max_iter):
        if frontier.isEmpty():
            break
        relaxed = (
            e.join(frontier.withColumnRenamed("id", "s"), "s")
            .groupBy(F.col("d").alias("id"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("dist"))
        )
        # ONE aggregate yields both the merged state (min over old+new)
        # and the old value needed to detect the delta — so each round is
        # one exchange and ONE localCheckpoint; a separate merged-vs-state
        # join would double both (r8 bench: halves per-round driver jobs)
        merged = (
            state.withColumn("__old", F.col("dist"))
            .unionByName(relaxed.withColumn("__old", F.lit(None).cast("long")))
            .groupBy("id")
            .agg(F.min("dist").alias("dist"), F.min("__old").alias("__old"))
            .localCheckpoint(eager=False)
        )
        frontier = merged.filter(
            F.col("__old").isNull() | (F.col("dist") < F.col("__old"))
        ).select("id", "dist")
        state = merged.select("id", "dist")
    else:
        if not frontier.isEmpty():
            raise RuntimeError(
                f"shortest_paths did not converge in {max_iter} rounds — some "
                "shortest path uses more edges; raise max_iter for this graph"
            )
    return state.select("id", F.col("dist").cast("long").alias("dist"))


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    max_iter: int = 30,
    local_threshold: int = 100_000,
) -> DataFrame:
    """Minimum hop distance from a seed set over an undirected edge list —
    Pregel-style frontier relaxation as pure DataFrame rounds.

    ``seeds`` is a one-column DataFrame of seed node ids (distance 0).
    Returns (id, hops int) for every node REACHABLE from a seed;
    unreachable nodes are absent (their distance is undefined, and
    emitting a sentinel would poison downstream minimums).

    Scale shape: state is one row per REACHED node; each round joins the
    newly-settled frontier (only rows improved last round — the delta,
    never the full state) against the edge table, then min-merges into
    the state. Rounds = eccentricity of the seed set, which for the
    small-world graphs this targets (co-occurrence, near-dup, citation)
    is tens, not thousands; localCheckpoint per round keeps lineage O(1).
    Raises after ``max_iter`` rounds with a live frontier instead of
    returning silently-truncated distances (the connected_components
    discipline — truncation is a correctness bug, not a degraded mode).

    ADAPTIVE (r10): sub-``local_threshold`` edge tables solve
    driver-side with the same round-counting relaxation (identical
    raise contract); ``local_threshold=0`` pins the distributed path.
    """
    from ._scratch import scratch_persist

    if local_threshold > 0:
        probe = edges.select(a, b).limit(local_threshold + 1).count()
        if probe <= local_threshold:
            edge_rows = edges.select(a, b).collect()
            seed_ids = [r[0] for r in seeds.distinct().collect()]
            dist = _local_frontier_relax(
                edge_rows, seed_ids, max_iter, 1, "bfs_hops"
            )
            return local_rows_df(edges.sparkSession,
                list(dist.items()), f"id {dict(edges.dtypes)[a]}, hops int"
            )

    # slot-pooled scratch: the doubled edge table is consumed every round
    # and across re-invocations (the connected_components discipline)
    e = scratch_persist(
        edges.select(F.col(a).alias("s"), F.col(b).alias("d"))
        .union(edges.select(F.col(b).alias("s"), F.col(a).alias("d")))
        .distinct(),
        "bfs_hops/edges",
    )
    seed_col = seeds.columns[0]
    state = (
        seeds.select(F.col(seed_col).alias("id"))
        .distinct()
        .withColumn("hops", F.lit(0))
        .localCheckpoint(eager=False)
    )
    frontier = state
    for _ in range(max_iter):
        if frontier.isEmpty():
            break
        reached = (
            e.join(frontier.withColumnRenamed("id", "s"), "s")
            .groupBy(F.col("d").alias("id"))
            .agg((F.min("hops") + 1).alias("hops"))
        )
        # one aggregate yields the merged state AND the pre-round value
        # needed to detect the just-settled delta — one exchange and ONE
        # localCheckpoint per round (the shortest_paths r8 shape)
        merged = (
            state.withColumn("__old", F.col("hops"))
            .unionByName(reached.withColumn("__old", F.lit(None).cast("int")))
            .groupBy("id")
            .agg(F.min("hops").alias("hops"), F.min("__old").alias("__old"))
            .localCheckpoint(eager=False)
        )
        frontier = merged.filter(
            F.col("__old").isNull() | (F.col("hops") < F.col("__old"))
        ).select("id", "hops")
        state = merged.select("id", "hops")
    else:
        if not frontier.isEmpty():
            raise RuntimeError(
                f"bfs_hops did not converge in {max_iter} rounds — seed-set "
                "eccentricity exceeds max_iter; raise it for this graph"
            )
    return state.select("id", F.col("hops").cast("int").alias("hops"))


def kcore(
    edges: DataFrame,
    a: str = "id_a",
    b: str = "id_b",
    k: int = 3,
    max_iter: int = 50,
    local_threshold: int = 100_000,
) -> DataFrame:
    """k-core decomposition (membership tier): the maximal subgraph in
    which every vertex keeps degree >= k, computed by the standard
    iterative peeling — delete all vertices below degree k, recompute,
    repeat to a fixed point.  The degree test must CASCADE: a vertex
    whose initial degree clears k can still die when its neighbors
    peel (pinned in tests — a one-round degree filter is wrong).

    Input is an undirected edge list; duplicate edges, reversed
    duplicates, self-loops, and NULL endpoints are dropped on BOTH
    execution paths (one contract — the shortest_paths/bfs advice
    lesson).  Returns (id, core_degree int): the members of the k-core
    with their degree INSIDE the core (>= k by construction); an empty
    result means the graph has no k-core.

    Scale shape: each round is one partial+final degree aggregate plus
    two left-anti joins against the (bounded, usually tiny) victim
    set; the EDGE SET ITSELF SHRINKS monotonically — the d137
    large/small-star property — so late rounds touch a fraction of the
    input; localCheckpoint per round keeps lineage O(1) and the
    victim-set emptiness probe is the only driver round-trip.  Rounds
    are bounded by the peeling depth (degeneracy ordering length), in
    practice a handful; after ``max_iter`` rounds with a live victim
    set it raises instead of returning a silently-non-maximal core.

    ADAPTIVE: sub-``local_threshold`` edge tables peel driver-side
    (identical cascade, identical raise contract);
    ``local_threshold=0`` pins the distributed path."""
    from ._scratch import scratch_persist

    # one materialization for probe, collect AND the distributed
    # fall-through's edge doubling (the connected_components ADVICE-r10
    # discipline: an unpersisted plan recomputes between the two actions
    # and its row count can drift past the bound)
    clean = scratch_persist(
        edges.select(F.col(a), F.col(b)).filter(
            F.col(a).isNotNull() & F.col(b).isNotNull() & (F.col(a) != F.col(b))
        ),
        "kcore/clean_edges",
    )
    id_type = dict(edges.dtypes)[a]

    if local_threshold > 0:
        probe = clean.limit(local_threshold + 1).count()
        if probe <= local_threshold:
            adj: dict = {}
            for r in clean.collect():
                u, v = r[0], r[1]
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)
            for _ in range(max_iter):
                victims = [u for u, nb in adj.items() if len(nb) < k]
                if not victims:
                    break
                for u in victims:
                    for v in adj.pop(u):
                        if v in adj:
                            adj[v].discard(u)
            else:
                if any(len(nb) < k for nb in adj.values()):
                    raise RuntimeError(
                        f"kcore did not converge in {max_iter} rounds — "
                        "peeling depth exceeds max_iter; raise it for "
                        "this graph"
                    )
            return local_rows_df(edges.sparkSession,
                [(u, len(nb)) for u, nb in adj.items()],
                f"id {id_type}, core_degree int",
            )

    e = scratch_persist(
        clean.select(F.col(a).alias("s"), F.col(b).alias("d"))
        .union(clean.select(F.col(b).alias("s"), F.col(a).alias("d")))
        .distinct(),
        "kcore/edges",
    )
    for _ in range(max_iter):
        deg = e.groupBy("s").agg(F.count("*").alias("__deg"))
        victims = deg.filter(F.col("__deg") < k).select("s")
        if victims.isEmpty():
            break
        # the victim set is bounded by this round's casualties — AQE
        # broadcasts it; both anti-joins prune the SAME shrinking edge set
        e = (
            e.join(victims, "s", "left_anti")
            .join(victims.withColumnRenamed("s", "d"), "d", "left_anti")
            .localCheckpoint(eager=False)
        )
    else:
        if not e.groupBy("s").agg(F.count("*").alias("__deg")).filter(
            F.col("__deg") < k
        ).isEmpty():
            raise RuntimeError(
                f"kcore did not converge in {max_iter} rounds — peeling "
                "depth exceeds max_iter; raise it for this graph"
            )
    return (
        e.groupBy("s")
        .agg(F.count("*").cast("int").alias("core_degree"))
        .select(F.col("s").alias("id"), "core_degree")
    )


def label_propagation_communities(
    edges: DataFrame, a: str = "id_a", b: str = "id_b", rounds: int = 2
) -> DataFrame:
    """Community detection by synchronous label propagation (the
    Raghavan-et-al LPA family): every node starts as its own label and
    each round adopts the MOST FREQUENT label among its neighbors
    (ties to the smallest label — fully deterministic, so the op is
    oracle-replayable round by round).  FIXED round count by design:
    synchronous LPA can oscillate on bipartite structures, so "run to
    convergence" is not a well-defined distributed contract — callers
    pick the horizon, and the certified semantics are exactly
    ``rounds`` synchronous updates (the d98c unrolled-replay
    precedent).

    Input hygiene matches kcore/bfs: NULL endpoints and self-loops
    drop, duplicates and reversed duplicates collapse.  Returns
    (id, community) for every node that appears in an edge.

    Scale: per round ONE label-lookup equi-join (labels are
    node-sized, AQE picks broadcast vs shuffled-hash) + one
    (node, label)-keyed partial+final count + one node-keyed
    min(struct) argmax — no collect_list, so hub neighborhoods never
    materialize; localCheckpoint per round keeps lineage O(1)."""
    from ._scratch import scratch_persist

    clean = edges.select(F.col(a), F.col(b)).filter(
        F.col(a).isNotNull() & F.col(b).isNotNull() & (F.col(a) != F.col(b))
    )
    e = scratch_persist(
        clean.select(F.col(a).alias("s"), F.col(b).alias("d"))
        .union(clean.select(F.col(b).alias("s"), F.col(a).alias("d")))
        .distinct(),
        "lpa/edges",
    )
    labels = (
        e.select(F.col("s").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("lbl"))
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        nb = e.join(labels.withColumnRenamed("id", "d"), "d").select("s", "lbl")
        cnt = nb.groupBy("s", "lbl").agg(F.count("*").alias("c"))
        labels = (
            cnt.groupBy("s")
            .agg(
                F.min(
                    F.struct(
                        (-F.col("c")).alias("nc"), F.col("lbl").alias("l")
                    )
                ).alias("__w")
            )
            .select(F.col("s").alias("id"), F.col("__w.l").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    return labels.select("id", F.col("lbl").alias("community"))
