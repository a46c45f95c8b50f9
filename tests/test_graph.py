"""Unit tests for iterative connected components (operators/graph.py)."""

from __future__ import annotations

from canvas_data_2_aws_spark.operators.graph import (
    connected_components,
    resolve_duplicates,
)


def test_cc_chain_and_islands(spark):
    # chain 1-2-3-4, pair 10-11, triangle 20-21-22 (+ redundant edge)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "src long, dst long",
    )
    comps = {r.node: r.comp for r in connected_components(edges).collect()}
    assert comps == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        20: 20, 21: 20, 22: 20,
    }


def test_cc_long_chain_converges(spark):
    n = 40  # diameter >> 1 forces multiple propagation rounds
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    comps = {r.node: r.comp for r in connected_components(edges, max_iter=20).collect()}
    assert set(comps.values()) == {0}
    assert len(comps) == n + 1


def test_resolve_duplicates_keeps_min_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(6)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5)], "doc_a long, doc_b long"  # cluster {1,2,5}
    )
    survivors = sorted(
        r.doc_id for r in resolve_duplicates(docs, pairs).collect()
    )
    assert survivors == [0, 1, 3, 4]


def test_pagerank_invariants(spark, sf_dir):
    """Ranks are positive, and total rank stays ≈ 1 (the similarity
    graph is symmetric, so no dangling-node leak)."""
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = registry.QUERIES["graph_pagerank"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r.rank > 0 for r in rows)
    assert abs(sum(r.rank for r in rows) - 1.0) < 1e-3


def test_cc_paths_identical(spark):
    """The driver union-find (small graphs) and the distributed
    min-label propagation (cap forced to 0) must emit IDENTICAL
    (node, comp) labels — both are component-minimum ids."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22), (5, 5)],
        "src long, dst long",
    )
    uf = {r.node: r.comp for r in connected_components(edges).collect()}
    dist = {
        r.node: r.comp
        for r in connected_components(edges, driver_edge_cap=0).collect()
    }
    assert uf == dist
    assert uf[4] == 1 and uf[22] == 20


def test_pagerank_copartitioned_bitwise_equal(spark):
    """Forcing the big-V co-partitioned plan (cap=0) returns ranks
    BIT-identical to the broadcast plan: the DECIMAL(28,12) contribution
    sums are order/strategy-free, so the size switch cannot perturb the
    oracle hashes."""
    from canvas_data_2_aws_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 6)],
        "src long, dst long",
    )
    small = {r.node: r.rank for r in pagerank(edges, iterations=4).collect()}
    big = {
        r.node: r.rank
        for r in pagerank(edges, iterations=4, broadcast_node_cap=0).collect()
    }
    assert small == big  # exact float equality, not approx


def test_hits_copartitioned_bitwise_equal(spark):
    from canvas_data_2_aws_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 1), (4, 2)], "src long, dst long"
    )
    small = {r.node: (r.hub, r.auth) for r in hits(edges, iterations=3).collect()}
    big = {
        r.node: (r.hub, r.auth)
        for r in hits(edges, iterations=3, broadcast_node_cap=0).collect()
    }
    assert small == big


def test_graph_score_join_not_broadcast_above_cap(spark):
    """Above the node cap the per-iteration score join must NOT plan as
    a broadcast: the physical plan for one pagerank contribution step
    contains a non-broadcast (shuffle/sort-merge) join on the edge key.

    pagerank()/hits() return lazily-checkpointed frames (their external
    plan is Scan ExistingRDD), so this pins the strategy on the exact
    join shape the iteration builds: edge-with-degree ⋈ _score_side(ranks).
    autoBroadcastJoinThreshold is disabled for the capped run to model
    the real big-V condition (a >cap score table exceeds any broadcast
    threshold); the under-cap path must keep broadcasting even then,
    because its explicit hint survives threshold=-1."""
    from canvas_data_2_aws_spark.operators.graph import _score_side

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(50)], "src long, dst long"
    )
    from pyspark.sql import functions as F

    sym = edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    ).unionByName(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
    deg = sym.groupBy("a").agg(F.count("*").alias("deg"))
    sym_deg = sym.join(deg, "a")
    ranks = sym.select(F.col("a").alias("node")).distinct().withColumn(
        "rank", F.lit(0.01)
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        # big-V branch: n=100 > cap=0 → plain join, no broadcast anywhere
        capped = sym_deg.repartition("a").join(
            _score_side(ranks, 100, 0), sym_deg.a == ranks.node
        )
        plan = capped._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan
        # under-cap branch: hint must broadcast even with threshold=-1
        # (guards against silently flipping both branches to shuffle)
        hinted = sym_deg.join(
            _score_side(ranks, 100, 10**9), sym_deg.a == ranks.node
        )
        plan_bc = hinted._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan_bc
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bfs_levels_min_hop_semantics(spark):
    from canvas_data_2_aws_spark.operators.graph import bfs_levels

    # chain 0-1-2-3-4-5 plus a shortcut 0-3: node 3 is 1 hop, not 3
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (4, 5), (0, 3)],
        "src long, dst long",
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    levels = {r.node: r.level for r in bfs_levels(edges, seeds, max_hops=3).collect()}
    assert levels == {0: 0, 1: 1, 3: 1, 2: 2, 4: 2, 5: 3}


def test_bfs_levels_unreachable_and_cap(spark):
    from canvas_data_2_aws_spark.operators.graph import bfs_levels

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    levels = {r.node: r.level for r in bfs_levels(edges, seeds, max_hops=2).collect()}
    # capped at 2 hops; disconnected 10-11 island absent
    assert levels == {0: 0, 1: 1, 2: 2}


def test_fuzzy_sym_holds_both_directions_exactly_once(spark, sf_dir):
    """bfs_levels(symmetric=True)'s caller contract (ADVICE r13): the
    memoized fuzzy_sym frame must contain both directions of every
    undirected edge exactly once — a one-direction list would yield
    wrong BFS levels with no runtime error."""
    from canvas_data_2_aws_spark.operators.fuzzy_graph import (
        fuzzy_pairs,
        fuzzy_sym,
    )
    from pyspark.sql import functions as F

    sym = fuzzy_sym(spark, sf_dir)
    rev = sym.select(
        F.col("nbr").alias("node"), F.col("node").alias("nbr")
    )
    # multiset equality with its own reversal = both directions, same
    # multiplicity; count == 2·pairs = each exactly once.
    assert rev.exceptAll(sym).isEmpty()
    assert sym.count() == 2 * fuzzy_pairs(spark, sf_dir).count()


def test_lpa_splits_bridged_communities(spark):
    """Two 4-cliques joined by one bridge edge are ONE connected
    component but TWO LPA communities — the capability CC cannot
    provide (hand-computed 3-round synchronous trace)."""
    from canvas_data_2_aws_spark.operators.graph import label_propagation

    cl = lambda ns: [(a, b) for a in ns for b in ns if a < b]
    edges = spark.createDataFrame(
        cl([1, 2, 3, 4]) + cl([10, 11, 12, 13]) + [(4, 10)],
        "src long, dst long",
    )
    labels = {r.node: r.label for r in label_propagation(edges).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_lpa_copartitioned_bitwise_equal(spark):
    """cap=0 forces the co-partitioned label join; integer labels and
    COUNT votes make both plans exactly equal."""
    from canvas_data_2_aws_spark.operators.graph import label_propagation

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4)],
        "src long, dst long",
    )
    small = {r.node: r.label for r in label_propagation(edges).collect()}
    big = {
        r.node: r.label
        for r in label_propagation(edges, broadcast_node_cap=0).collect()
    }
    assert small == big


def test_personalized_pagerank_proximity(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = registry.QUERIES["graph_pagerank_personalized"](spark, sf_dir).collect()
    if not rows:  # sf0.001 graph may be empty — covered at sf0.01
        return
    total = sum(r.rank for r in rows)
    # walk mass is conserved up to the rounding: Σ rank ≤ 1 + ε
    assert total <= 1.0 + 1e-4
    seed = min(r.node for r in rows)
    by_node = {r.node: r.rank for r in rows}
    # the seed retains the most mass under restart
    assert by_node[seed] == max(by_node.values())


def test_closeness_seeds_bounds(spark, sf_dir):
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    rows = registry.QUERIES["graph_closeness_seeds"](spark, sf_dir).collect()
    for r in rows:
        assert r.seed % 500 == 0
        # radius-3 harmonic sum: each reached node contributes at most 1/1
        assert r.h_closeness is None or float(r.h_closeness) <= r.n_reached
        # and at least 1/3 each
        if r.n_reached:
            assert float(r.h_closeness) >= r.n_reached / 3.0 - 1e-9


def test_walk_corpus_valid_walks(spark, sf_dir):
    """Each walk is a real path: consecutive nodes share an edge, and
    each (seed, step) appears exactly once."""
    from canvas_data_2_aws_spark import registry
    from canvas_data_2_aws_spark.operators.fuzzy_graph import fuzzy_sym

    registry.load_all()
    rows = registry.QUERIES["graph_walk_corpus"](spark, sf_dir).collect()
    if not rows:
        return
    edges = {
        (r.node, r.nbr) for r in fuzzy_sym(spark, sf_dir).collect()
    }
    walks = {}
    for r in rows:
        walks.setdefault(r.seed, {})[r.step] = r.node
    for seed, path in walks.items():
        assert path[0] == seed
        steps = sorted(path)
        assert steps == list(range(len(steps)))
        for a, b in zip(steps, steps[1:]):
            assert (path[a], path[b]) in edges


def test_betweenness_matches_python_brandes(spark):
    """r11: pure-Python truncated Brandes (radius 3, %500 seeds) over
    the same fuzzy edge list must reproduce the query's top-20 scores
    exactly (to the emitted rounding) — path counts, dependency
    accumulation, and ordering are all engine-independent."""
    from collections import defaultdict, deque

    from canvas_data_2_aws_spark import registry
    from canvas_data_2_aws_spark.operators.fuzzy_graph import fuzzy_sym

    registry.load_all()
    # sf0.01: the %500 seed set is empty below 500 parts (sf0.001),
    # same regime as the closeness-seeds fixture notes
    sf = "/root/testdata/sf0.01"
    got = registry.QUERIES["graph_betweenness_seeds"](spark, sf).collect()

    adj = defaultdict(set)
    for r in fuzzy_sym(spark, sf).collect():
        adj[r.node].add(r.nbr)
    seeds = sorted(n for n in adj if n % 500 == 0)
    assert seeds, "fixture drifted: no %500 seeds in the fuzzy graph"

    bc = defaultdict(float)
    n_terms = defaultdict(int)
    for s in seeds:
        dist = {s: 0}
        sigma = defaultdict(int)
        sigma[s] = 1
        order = [s]
        dq = deque([s])
        while dq:
            v = dq.popleft()
            if dist[v] == 3:
                continue
            for w in sorted(adj[v]):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    dq.append(w)
                    order.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = defaultdict(float)
        for v in reversed(order):
            if v == s or dist[v] == 3:
                # level-3 delta = 0 within the truncated radius; the
                # seed itself is not a betweenness target
                if v == s:
                    continue
            for w in adj[v]:
                if dist.get(w) == dist[v] + 1:
                    delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if v != s and dist[v] < 3:
                bc[v] += delta[v]
                n_terms[v] += 1

    expected = sorted(bc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert len(got) == min(20, len(expected))
    for row, (node, score) in zip(got, expected):
        assert row.node == node
        assert abs(row.betweenness - round(score, 6)) < 1e-5, (
            node,
            row.betweenness,
            score,
        )
        assert row.n_seed_terms == n_terms[node]


def test_degree_powerlaw_consistent_with_histogram(spark, sf_dir):
    """r12: the Hill summary must reconcile exactly with the raw
    degree histogram (same census), and alpha > 1 whenever any tail
    degree exceeds dmin."""
    from canvas_data_2_aws_spark import registry

    registry.load_all()
    hist = registry.QUERIES["graph_degree_stats"](spark, sf_dir).collect()
    got = registry.QUERIES["graph_degree_powerlaw"](spark, sf_dir).collect()[0]
    n_nodes = sum(r.n_nodes for r in hist)
    n_edges = sum(r.degree * r.n_nodes for r in hist) // 2
    max_deg = max(r.degree for r in hist)
    n_tail = sum(r.n_nodes for r in hist if r.degree >= 2)
    assert got.n_nodes == n_nodes
    assert got.n_edges == n_edges
    assert got.max_degree == max_deg
    assert got.n_tail == n_tail
    if any(r.degree > 2 for r in hist):
        assert got.alpha_hill is not None and got.alpha_hill > 1.0
