"""Iterative connected components (near-dup cluster resolution).

Near-dup detection (M5/SimHash/Jaccard/cosine) emits candidate PAIRS;
actually deduplicating a corpus needs the transitive closure — if A~B
and B~C, one canonical survivor for {A,B,C}. That closure is an
iterative algorithm (no single SQL expression), implemented here as
the classic min-label propagation: every node repeatedly adopts the
smallest id reachable in one hop until a fixpoint.

Spark-first notes: each iteration is one join + one aggregation on
DataFrames (Catalyst plans, map-side combine); convergence needs
O(log(longest path)) rounds on real near-dup graphs (tiny diameters).
Labels are checkpointed via localCheckpoint each round to cut the
exponentially growing lineage — the standard Spark iterative-algorithm
discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F, types as T

# Above this node count the per-iteration score tables (one double per
# node) stop being broadcast-safe: 20M (node, double) rows is already
# ~300 MB serialized, and a 10^9-node graph would ship multi-GB to every
# executor per iteration. pagerank()/hits() switch to the co-partitioned
# plan past the cap: the edge list is repartitioned ON THE JOIN KEY once
# (a layout localCheckpoint preserves), so each iteration exchanges only
# the O(V) score table while the O(E) edges never move again. Results
# are bit-identical on both sides of the switch — the sums are
# DECIMAL(28,12)-cast, so join strategy cannot perturb them — which the
# capped-vs-uncapped equivalence test pins.
SCORE_BROADCAST_NODE_CAP = 20_000_000


def _score_side(scores: DataFrame, n_nodes: int, cap: int) -> DataFrame:
    """Broadcast the per-node score table only while it is small."""
    return F.broadcast(scores) if n_nodes <= cap else scores


def symmetrized(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Distinct undirected ``(a, b)`` expansion of a pair list — the
    shared first step of every algorithm in this module."""
    return (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )


def iterate_rounds(state, step, rounds: int, *, eager: bool = False, stop=None):
    """Synchronous-rounds driver — the ONE place the per-round
    checkpoint policy lives for pagerank/HITS/LPA/CC/BFS/k-core.

    Runs ``state = step(state, ckpt)`` up to ``rounds`` times; ``step``
    passes every frame it will re-consume through ``ckpt``
    (``localCheckpoint`` — lineage truncation, hooked by
    ``audit_checkpoints`` so every round stays plan-auditable).
    ``eager=False`` folds the checkpoint into the next job (HITS: 4
    fewer jobs ≈ 7 s at sf0.1); eager is required when driver logic
    probes the round's frame (CC convergence, BFS empty-frontier) —
    which ``stop(new, old)`` expresses to end the loop early.
    """

    def ckpt(df: DataFrame) -> DataFrame:
        return df.localCheckpoint(eager=eager)

    for _ in range(rounds):
        new = step(state, ckpt)
        done = stop is not None and stop(new, state)
        state = new
        if done:
            break
    return state


#: Below this many (symmetrized, distinct) edges, connected components
#: run as a DRIVER-side union-find instead of iterative label
#: propagation.  A ≤1M-edge pair graph is broadcast-sized (~16 MB of
#: longs) and union-find resolves it in one pass, where the distributed
#: loop pays ~6 scheduled jobs per iteration — measured ~2 s of pure
#: job round-trips on a 50 k-pair graph.  Labels are identical on both
#: paths (component-minimum ids), pinned by
#: tests/test_graph.py::test_cc_paths_identical.  Near-dup pair graphs
#: are duplication-sized, so at 100 TB most clusters' closures still fit
#: this path; pathological corpora fall through to the iterative plan.
CC_DRIVER_EDGE_CAP = 1_000_000


def _union_find_components(rows) -> "list[tuple]":
    """Min-label union-find over collected (a, b) pairs."""
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in rows:
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN id so the final root IS the component min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return sorted((x, find(x)) for x in parent)


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
    driver_edge_cap: int | None = None,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is an undirected pair list; self-loops and duplicates are
    fine. Deterministic: min() labels, no randomness. Below
    :data:`CC_DRIVER_EDGE_CAP` edges the closure runs as a driver
    union-find (same labels, no per-iteration job latency); above it,
    distributed min-label propagation with pointer jumping.
    """
    cap = CC_DRIVER_EDGE_CAP if driver_edge_cap is None else driver_edge_cap
    # Lazy checkpoint: sym is consumed by the size probe, the label
    # init AND every iteration's neighbor join + convergence count —
    # without the checkpoint each of those jobs re-executes the full
    # upstream edge derivation (for near-dup callers, the entire
    # MinHash/SimHash pipeline, once per iteration).
    sym = symmetrized(edges, src, dst).localCheckpoint(eager=False)
    # Size probe: count first (LIMIT cap+1 so no full count job), and
    # only collect edge rows when the graph is confirmed small — a big
    # graph never ships cap+1 Row objects to the driver just to discard
    # them (Row overhead is ~100s of bytes/edge, not the 16 B of the
    # eventual (a, b) longs). The lazy localCheckpoint above makes the
    # follow-up collect a cheap checkpoint re-read, not a recompute.
    if cap > 0:
        n_edges = sym.limit(cap + 1).count()
        if n_edges <= cap:
            probe = sym.collect()
            node_field = sym.schema["a"]
            out_schema = T.StructType(
                [
                    T.StructField("node", node_field.dataType, False),
                    T.StructField("comp", node_field.dataType, False),
                ]
            )
            pairs = _union_find_components([(r.a, r.b) for r in probe])
            return edges.sparkSession.createDataFrame(pairs, out_schema)
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("comp"))
        .select(F.col("a").alias("node"), "comp")
    )

    def step(labels: DataFrame, ckpt) -> DataFrame:
        # propagate: each node takes min(own comp, neighbors' comps)
        neighbor_best = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("n_comp"))
        )
        new_labels = labels.join(
            neighbor_best, labels.node == neighbor_best.a, "left"
        ).select(
            "node",
            F.least(
                F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))
            ).alias("comp"),
        )
        # pointer jumping: adopt the label of your label — doubles the
        # propagated distance per round, O(log diameter) convergence
        # instead of O(diameter) (the hybrid used by large-graph CC).
        parents = new_labels.select(
            F.col("node").alias("comp"), F.col("comp").alias("parent_comp")
        )
        return ckpt(
            new_labels.join(parents, "comp", "left").select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("parent_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )

    def converged(new: DataFrame, old: DataFrame) -> bool:
        return (
            new.alias("n")
            .join(old.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
            == 0
        )

    return iterate_rounds(labels, step, max_iter, eager=True, stop=converged)


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """Keep one canonical row (min id) per near-dup cluster.

    Docs not in any pair survive untouched; clustered docs survive iff
    they are their cluster's min id. Returns the surviving rows.
    """
    comps = connected_components(pairs, src=pair_a, dst=pair_b)
    keep = comps.groupBy("comp").agg(F.min("node").alias("keeper"))
    losers = (
        comps.join(keep, "comp")
        .where(F.col("node") != F.col("keeper"))
        .select(F.col("node").alias(id_col))
    )
    return docs.join(losers, on=id_col, how="left_anti")


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    broadcast_node_cap: int | None = None,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected pair list.

    Returns (node, rank) after ``iterations`` synchronous updates:
    rank'(v) = (1−d)/n + d·Σ_{u→v} rank(u)/deg(u).

    Determinism discipline: every per-edge contribution is cast to
    DECIMAL(28,12) before summation, so the aggregate is exact and
    order-independent — the ranks are bit-identical run-to-run AND
    engine-to-engine (an unrolled SQL form computes the same values).
    Each round is one join + one partial-aggregated groupBy;
    localCheckpoint truncates the growing lineage like
    :func:`connected_components`.
    """
    sym = symmetrized(edges, src, dst)
    nodes = sym.select(F.col("a").alias("node")).distinct()
    n = nodes.count()
    cap = SCORE_BROADCAST_NODE_CAP if broadcast_node_cap is None else broadcast_node_cap
    # Attach out-degrees to the edge list ONCE; per iteration the big
    # edge side then joins only the ranks table — broadcast while the
    # node count fits under the cap, co-partitioned above it. In the
    # co-partitioned plan the edge list is laid out on the join key
    # before the checkpoint, so every iteration exchanges only the O(V)
    # ranks while the O(E) edges never re-shuffle.
    deg = sym.groupBy("a").agg(F.count("*").alias("deg"))
    sym_deg = sym.join(deg, "a")
    if n > cap:
        sym_deg = sym_deg.repartition("a")
    sym_deg = sym_deg.localCheckpoint(eager=False)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    teleport = F.lit((1.0 - damping) / n)

    def step(ranks: DataFrame, ckpt) -> DataFrame:
        contribs = sym_deg.join(
            _score_side(ranks, n, cap), sym_deg.a == ranks.node
        ).select(
            F.col("b").alias("node"),
            (F.col("rank") / F.col("deg")).alias("contrib"),
        )
        return ckpt(
            contribs.groupBy("node").agg(
                (
                    teleport
                    + F.lit(damping)
                    * F.sum(F.col("contrib").cast("decimal(28,12)")).cast("double")
                ).alias("rank")
            )
        )

    return iterate_rounds(ranks, step, iterations)


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_hops: int = 3,
    *,
    symmetric: bool = False,
    broadcast_node_cap: int | None = None,
) -> DataFrame:
    """Multi-source BFS: (node, level) with level = min hop distance
    from any seed, capped at ``max_hops``.

    ``edges`` is undirected (symmetrized here — or taken as-is when
    the caller passes ``symmetric=True``); unreachable nodes are
    absent from the output.

    ``symmetric=True`` is a two-part caller CONTRACT (ADVICE r13):
    (1) the frame contains BOTH directions of every undirected edge —
    a one-direction list silently yields wrong levels, there is no
    runtime check (tests/test_graph.py asserts the property for the
    one in-repo caller's frame); and (2) the frame is already
    MATERIALIZED (cached/localCheckpoint-ed, e.g. the memoized
    fuzzy_sym frame) — this path skips the checkpoint that the
    symmetrizing path applies, so an unmaterialized frame would
    re-execute its full lineage for the ``sym.count()`` probe and
    again for every per-hop join. Re-symmetrizing such a frame here
    would be a full 2|E|-row union+distinct shuffle per invocation
    for nothing, which is why the flag exists. Each hop is one
    equi join + one anti join against the visited set — the canonical
    Spark frontier expansion, with the node-sized frontier/visited
    sides broadcast under :data:`SCORE_BROADCAST_NODE_CAP` (r13,
    guide §2.4/§3.1) so the O(E) edge list never re-shuffles inside a
    hop; above the cap the joins fall back to shuffled plans.
    Frontiers are localCheckpoint-ed: without it every hop re-executes
    the whole prefix once per downstream consumer (the round-2 shared-
    subtree law). Deterministic: min-level semantics, no randomness.

    r13 MEASURED NEGATIVE RESULT (kept eager deliberately): an
    attempt at lazy checkpoints + dropping the per-hop empty-frontier
    probe ("one job instead of one per hop") benched 2.4 s → 11.2 s at
    sf0.1. The reason is structural, not noise: each hop's frame
    references the previous ``visited`` frame TWICE (the union branch
    and the anti join), so without eager materialization the physical
    DAG of hop N contains two copies of hop N−1's subtree racing the
    block-cache — ~2^hops duplicated stage work, plus every hop's
    exchange still runs after the frontier drains. Eager checkpoints
    make each hop's work run exactly once and let the driver stop at a
    drained frontier; that is the scalable form at 100 TB too (per-hop
    work is frontier-sized either way, and the probe is one cheap
    ``limit(1).count()`` on a materialized frame).
    """
    if symmetric:
        # Caller guarantees both directions present exactly once (and
        # passes a materialized/cheap frame — fuzzy_sym is a memoized
        # checkpoint); a narrow rename replaces the 2|E|-row
        # union+distinct shuffle.
        sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    else:
        sym = symmetrized(edges, src, dst).localCheckpoint(eager=True)
    cap = (
        SCORE_BROADCAST_NODE_CAP
        if broadcast_node_cap is None
        else broadcast_node_cap
    )
    # |V| <= rows(sym), and sym is materialized — the count is a
    # block-metadata scan, no shuffle. Conservative: past the cap the
    # node-sized sides stop broadcasting.
    small = sym.count() <= cap
    visited = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("level", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    hop = 0

    def step(state, ckpt):
        nonlocal hop
        visited, frontier = state
        hop += 1
        fsrc = F.broadcast(frontier) if small else frontier
        vis = visited.select("node")
        nxt = ckpt(
            fsrc.join(sym, fsrc.node == sym.a)
            .select(F.col("b").alias("node"))
            .distinct()
            .join(F.broadcast(vis) if small else vis, "node", "left_anti")
            .withColumn("level", F.lit(hop).cast("long"))
        )
        return visited.unionByName(nxt), nxt

    def exhausted(new, _old) -> bool:
        return new[1].limit(1).count() == 0

    final_visited, _ = iterate_rounds(
        (visited, visited), step, max_hops, eager=True, stop=exhausted
    )
    return final_visited


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
    broadcast_node_cap: int | None = None,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg) over a DIRECTED edge list.

    Synchronous updates with max-normalization each half-step:
    auth'(d) = Σ_{s→d} hub(s), hub'(s) = Σ_{s→d} auth'(d), each
    divided by its max. Same determinism discipline as
    :func:`pagerank`: every contribution is cast to DECIMAL(28,12)
    before summation (exact, order-free), and the normalizing division
    is identical-operand IEEE — an unrolled SQL form computes the same
    doubles bit-for-bit. Per iteration: two joins of the edge list
    against the score tables (broadcast under
    :data:`SCORE_BROADCAST_NODE_CAP`, co-partitioned above it) + two
    partial-aggregated groupBys; the edge list itself never re-shuffles.

    Returns (node, hub, auth); nodes with no outgoing (resp. incoming)
    edges score 0 on that axis.
    """
    # Materialize the edge list ONCE: every iteration (and the final
    # node join) reads it, and without this each per-iteration
    # checkpoint would re-run the whole upstream pair derivation.
    if iterations < 1:
        raise ValueError("hits() needs at least one iteration")
    # lazy checkpoints (r13, guide §2.6): the cap probe below is the
    # first action and materializes both in ONE job instead of three.
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    cap = SCORE_BROADCAST_NODE_CAP if broadcast_node_cap is None else broadcast_node_cap
    # Unlike pagerank, HITS never needs the exact node count — only
    # which side of the cap it falls on — so probe with LIMIT cap+1
    # (stops early on huge graphs) instead of a full count.
    n = nodes.limit(cap + 1).count() if cap > 0 else cap + 1
    # HITS joins the edge list on BOTH keys (s for the auth step, d for
    # the hub step). Under the cap both score tables broadcast and one
    # edge copy suffices; above it we lay the edges out twice — once per
    # join key — so each half-step exchanges only the O(V) score table
    # against its pre-partitioned edge copy (two at-rest layouts, the
    # standard price of a two-key iterative join at cluster scale).
    if n > cap:
        e_by_s = e.repartition("s").localCheckpoint(eager=False)
        e_by_d = e.repartition("d").localCheckpoint(eager=False)
    else:
        e_by_s = e_by_d = e
    def step(state, ckpt):
        # Lazy checkpoints (ckpt): truncate lineage and cache on first
        # materialization WITHOUT an eager job per half-step — the
        # eager form cost one full scheduling round-trip per score
        # table (4 extra jobs for 2 iterations, ~7 s of the 9 s
        # sf0.1 wall clock).
        hub, _ = state
        a_raw = (
            e_by_s.join(_score_side(hub.withColumnRenamed("node", "s"), n, cap), "s")
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum(F.col("score").cast("decimal(28,12)")).cast("double").alias("v"))
        )
        a_max = a_raw.agg(F.max("v").alias("m"))
        auth = ckpt(
            a_raw.crossJoin(F.broadcast(a_max)).select(
                "node", (F.col("v") / F.col("m")).alias("score")
            )
        )
        h_raw = (
            e_by_d.join(_score_side(auth.withColumnRenamed("node", "d"), n, cap), "d")
            .groupBy(F.col("s").alias("node"))
            .agg(F.sum(F.col("score").cast("decimal(28,12)")).cast("double").alias("v"))
        )
        h_max = h_raw.agg(F.max("v").alias("m"))
        hub = ckpt(
            h_raw.crossJoin(F.broadcast(h_max)).select(
                "node", (F.col("v") / F.col("m")).alias("score")
            )
        )
        return hub, auth

    hub0 = nodes.select("node", F.lit(1.0).alias("score"))
    hub, auth = iterate_rounds((hub0, None), step, iterations)
    return (
        nodes.join(hub.withColumnRenamed("score", "hub"), "node", "left")
        .join(auth.withColumnRenamed("score", "auth"), "node", "left")
        .select(
            "node",
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"),
        )
    )


def label_propagation(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    broadcast_node_cap: int | None = None,
) -> DataFrame:
    """Deterministic synchronous label propagation (community detect).

    Returns (node, label) after ``iterations`` synchronous rounds of
    label(v) ← mode of neighbor labels, ties broken by SMALLEST label
    (classic LPA randomizes ties and updates asynchronously; this
    variant is fully deterministic so the unrolled SQL oracle
    hash-matches it, at the usual synchronous-LPA cost that bipartite
    structures can oscillate — fixed iteration count, not fixpoint).
    Init label = own node id.

    Same execution shape as :func:`pagerank`: per round one join of
    the edge list against the O(V) label table (broadcast under the
    node cap, co-partitioned above it — edges shuffled once, never
    again), one (node, label) count, and one node-keyed window to pick
    the mode; ``localCheckpoint`` truncates lineage per round.
    """
    sym = symmetrized(edges, src, dst)
    nodes = sym.select(F.col("a").alias("node")).distinct()
    n = nodes.count()
    cap = SCORE_BROADCAST_NODE_CAP if broadcast_node_cap is None else broadcast_node_cap
    sym_l = sym.repartition("b") if n > cap else sym
    sym_l = sym_l.localCheckpoint(eager=False)
    from pyspark.sql import Window

    pick_w = Window.partitionBy("a").orderBy(
        F.col("votes").desc(), F.col("label").asc()
    )

    def step(labels: DataFrame, ckpt) -> DataFrame:
        votes = (
            sym_l.join(_score_side(labels, n, cap), sym_l.b == labels.node)
            .groupBy("a", "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        return ckpt(
            votes.withColumn("rk", F.row_number().over(pick_w))
            .where(F.col("rk") == 1)
            .select(F.col("a").alias("node"), "label")
        )

    labels = nodes.select("node", F.col("node").alias("label"))
    return iterate_rounds(labels, step, iterations)


def personalized_pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 5,
    damping: float = 0.85,
    broadcast_node_cap: int | None = None,
) -> tuple[DataFrame, int]:
    """PageRank personalized to a single seed node (the minimum node
    id): teleport mass returns to the SEED instead of spreading
    uniformly, so ranks measure proximity to the seed through the
    near-dup graph — the "find everything related to this document"
    primitive (random walk with restart).

    Returns ``(ranks, seed)``. Same determinism discipline as
    :func:`pagerank` (DECIMAL(28,12) contribution sums, per-round
    localCheckpoint) and the same broadcast-vs-co-partitioned switch;
    the only structural changes are the teleport vector (an indicator
    on the seed) and the init (all mass at the seed). Nodes the walk
    has not reached after ``iterations`` rounds keep rank 0 — exact in
    both engines, no epsilon floor."""
    sym = symmetrized(edges, src, dst)
    nodes = sym.select(F.col("a").alias("node")).distinct()
    n = nodes.count()
    seed = sym.agg(F.min("a")).collect()[0][0]  # scalar, driver-sized
    if seed is None:  # empty graph: no nodes, no ranks
        return nodes.select("node", F.lit(0.0).alias("rank")), -1
    cap = SCORE_BROADCAST_NODE_CAP if broadcast_node_cap is None else broadcast_node_cap
    deg = sym.groupBy("a").agg(F.count("*").alias("deg"))
    sym_deg = sym.join(deg, "a")
    if n > cap:
        sym_deg = sym_deg.repartition("a")
    sym_deg = sym_deg.localCheckpoint(eager=False)
    is_seed = F.when(F.col("node") == seed, F.lit(1.0)).otherwise(F.lit(0.0))
    ranks = nodes.select("node", is_seed.alias("rank"))
    teleport = F.when(
        F.col("node") == seed, F.lit(1.0 - damping)
    ).otherwise(F.lit(0.0))

    def step(ranks: DataFrame, ckpt) -> DataFrame:
        contribs = sym_deg.join(
            _score_side(ranks, n, cap), sym_deg.a == ranks.node
        ).select(
            F.col("b").alias("node"),
            (F.col("rank") / F.col("deg")).alias("contrib"),
        )
        return ckpt(
            contribs.groupBy("node").agg(
                (
                    F.lit(damping)
                    * F.sum(F.col("contrib").cast("decimal(28,12)")).cast("double")
                ).alias("rank")
            ).select("node", (F.col("rank") + teleport).alias("rank"))
        )

    return iterate_rounds(ranks, step, iterations), seed
