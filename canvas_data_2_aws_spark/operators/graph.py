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

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 10,
) -> DataFrame:
    """Return (node, component) with component = min node id reachable.

    ``edges`` is an undirected pair list; self-loops and duplicates are
    fine. Deterministic: min() labels, no randomness.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = (
        sym.groupBy("a")
        .agg(F.least(F.min("b"), F.first("a")).alias("comp"))
        .select(F.col("a").alias("node"), "comp")
    )
    for _ in range(max_iter):
        # propagate: each node takes min(own comp, neighbors' comps)
        neighbor_best = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("comp").alias("n_comp"))
        )
        new_labels = (
            labels.join(neighbor_best, labels.node == neighbor_best.a, "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("n_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        # pointer jumping: adopt the label of your label — doubles the
        # propagated distance per round, O(log diameter) convergence
        # instead of O(diameter) (the hybrid used by large-graph CC).
        parents = new_labels.select(
            F.col("node").alias("comp"), F.col("comp").alias("parent_comp")
        )
        new_labels = (
            new_labels.join(parents, "comp", "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("parent_comp"), F.col("comp"))
                ).alias("comp"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


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
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    n = nodes.count()
    # Attach out-degrees to the edge list ONCE; per iteration the big
    # edge side then joins only the small broadcast ranks table — the
    # edges never re-shuffle across iterations (at cluster scale the
    # same plan holds with ranks co-partitioned instead of broadcast).
    deg = sym.groupBy("a").agg(F.count("*").alias("deg"))
    sym_deg = sym.join(deg, "a").localCheckpoint(eager=False)
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    teleport = F.lit((1.0 - damping) / n)
    for _ in range(iterations):
        contribs = sym_deg.join(
            F.broadcast(ranks), sym_deg.a == ranks.node
        ).select(
            F.col("b").alias("node"),
            (F.col("rank") / F.col("deg")).alias("contrib"),
        )
        ranks = contribs.groupBy("node").agg(
            (
                teleport
                + F.lit(damping)
                * F.sum(F.col("contrib").cast("decimal(28,12)")).cast("double")
            ).alias("rank")
        )
        ranks = ranks.localCheckpoint(eager=False)
    return ranks


def bfs_levels(
    edges: DataFrame,
    seeds: DataFrame,
    src: str = "src",
    dst: str = "dst",
    seed_col: str = "node",
    max_hops: int = 3,
) -> DataFrame:
    """Multi-source BFS: (node, level) with level = min hop distance
    from any seed, capped at ``max_hops``.

    ``edges`` is undirected (symmetrized here); unreachable nodes are
    absent from the output. Each hop is one equi join + one anti join
    against the visited set — the canonical Spark frontier expansion.
    Frontiers are localCheckpoint-ed: without it every hop re-executes
    the whole prefix once per downstream consumer (the round-2 shared-
    subtree law). Deterministic: min-level semantics, no randomness.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    visited = (
        seeds.select(F.col(seed_col).alias("node"))
        .distinct()
        .withColumn("level", F.lit(0).cast("long"))
        .localCheckpoint(eager=True)
    )
    frontier = visited
    for hop in range(1, max_hops + 1):
        nxt = (
            frontier.join(sym, frontier.node == sym.a)
            .select(F.col("b").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("level", F.lit(hop).cast("long"))
            .localCheckpoint(eager=True)
        )
        if nxt.limit(1).count() == 0:
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited


def hits(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 2,
) -> DataFrame:
    """Fixed-iteration HITS (Kleinberg) over a DIRECTED edge list.

    Synchronous updates with max-normalization each half-step:
    auth'(d) = Σ_{s→d} hub(s), hub'(s) = Σ_{s→d} auth'(d), each
    divided by its max. Same determinism discipline as
    :func:`pagerank`: every contribution is cast to DECIMAL(28,12)
    before summation (exact, order-free), and the normalizing division
    is identical-operand IEEE — an unrolled SQL form computes the same
    doubles bit-for-bit. Per iteration: two joins of the edge list
    against broadcast score tables + two partial-aggregated groupBys;
    the edge list itself never re-shuffles.

    Returns (node, hub, auth); nodes with no outgoing (resp. incoming)
    edges score 0 on that axis.
    """
    # Materialize the edge list ONCE: every iteration (and the final
    # node join) reads it, and without this each per-iteration
    # checkpoint would re-run the whole upstream pair derivation.
    if iterations < 1:
        raise ValueError("hits() needs at least one iteration")
    e = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        e.select(F.col("s").alias("node"))
        .unionByName(e.select(F.col("d").alias("node")))
        .distinct()
        .localCheckpoint()
    )
    hub = nodes.select("node", F.lit(1.0).alias("score"))
    auth = None
    for _ in range(iterations):
        a_raw = (
            e.join(F.broadcast(hub.withColumnRenamed("node", "s")), "s")
            .groupBy(F.col("d").alias("node"))
            .agg(F.sum(F.col("score").cast("decimal(28,12)")).cast("double").alias("v"))
        )
        a_max = a_raw.agg(F.max("v").alias("m"))
        # Lazy checkpoint: truncates lineage and caches on first
        # materialization WITHOUT an eager job per half-step — the
        # eager form cost one full scheduling round-trip per score
        # table (4 extra jobs for 2 iterations, ~7 s of the 9 s
        # sf0.1 wall clock).
        auth = (
            a_raw.crossJoin(F.broadcast(a_max))
            .select("node", (F.col("v") / F.col("m")).alias("score"))
            .localCheckpoint(eager=False)
        )
        h_raw = (
            e.join(F.broadcast(auth.withColumnRenamed("node", "d")), "d")
            .groupBy(F.col("s").alias("node"))
            .agg(F.sum(F.col("score").cast("decimal(28,12)")).cast("double").alias("v"))
        )
        h_max = h_raw.agg(F.max("v").alias("m"))
        hub = (
            h_raw.crossJoin(F.broadcast(h_max))
            .select("node", (F.col("v") / F.col("m")).alias("score"))
            .localCheckpoint(eager=False)
        )
    return (
        nodes.join(hub.withColumnRenamed("score", "hub"), "node", "left")
        .join(auth.withColumnRenamed("score", "auth"), "node", "left")
        .select(
            "node",
            F.coalesce(F.col("hub"), F.lit(0.0)).alias("hub"),
            F.coalesce(F.col("auth"), F.lit(0.0)).alias("auth"),
        )
    )
