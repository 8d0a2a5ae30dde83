"""Trajectory transition graph (reference's declared-but-unshipped
TrajectoryGraph output — README.md:63, Parameters.json:73-77 reserve the
``OutputType: graph`` selector with no backing code).

Hand-checked fixtures: known stay sequences -> exact expected edge and
node-degree tables.
"""

from pyspark.sql import functions as F

from geofeaturegeneration_spark.operators import node_features, trajectory_graph


def _stays(spark):
    # two entities; u1 walks A->B->A->B, u2 walks A->B->B (self-loop) ->C
    rows = [
        ("u1", 1, "A"),
        ("u1", 2, "B"),
        ("u1", 3, "A"),
        ("u1", 4, "B"),
        ("u2", 1, "A"),
        ("u2", 2, "B"),
        ("u2", 3, "B"),
        ("u2", 4, "C"),
    ]
    return spark.createDataFrame(rows, "user_id string, stime int, node string")


def test_edges_counts_and_entities(spark):
    edges = trajectory_graph(_stays(spark), ["user_id"], "stime", "node")
    got = {
        (r.src, r.dst): (r.n_trips, r.n_entities) for r in edges.collect()
    }
    # A->B: u1 twice + u2 once = 3 trips / 2 entities; B->A: u1 once;
    # B->C: u2 once; B->B self-loop dropped by default
    assert got == {
        ("A", "B"): (3, 2),
        ("B", "A"): (1, 1),
        ("B", "C"): (1, 1),
    }


def test_self_loops_kept_when_asked(spark):
    edges = trajectory_graph(
        _stays(spark), ["user_id"], "stime", "node", keep_self_loops=True
    )
    got = {(r.src, r.dst): (r.n_trips, r.n_entities) for r in edges.collect()}
    assert got[("B", "B")] == (1, 1)
    assert got[("A", "B")] == (3, 2)


def test_single_stay_entity_emits_no_edges(spark):
    df = spark.createDataFrame(
        [("u3", 1, "Z")], "user_id string, stime int, node string"
    )
    assert trajectory_graph(df, ["user_id"], "stime", "node").count() == 0


def test_node_features_degrees(spark):
    edges = trajectory_graph(_stays(spark), ["user_id"], "stime", "node")
    nf = {r.node: r.asDict() for r in node_features(edges).collect()}
    # A: out A->B (3 trips, 1 neighbor); in B->A (1 trip, 1 neighbor)
    assert nf["A"] == {
        "node": "A", "out_trips": 3, "out_degree": 1,
        "in_trips": 1, "in_degree": 1,
    }
    # B: out B->A + B->C (2 trips, 2 neighbors); in A->B (3 trips, 1)
    assert nf["B"] == {
        "node": "B", "out_trips": 2, "out_degree": 2,
        "in_trips": 3, "in_degree": 1,
    }
    # C: sink only
    assert nf["C"] == {
        "node": "C", "out_trips": 0, "out_degree": 0,
        "in_trips": 1, "in_degree": 1,
    }


def test_types_are_exact_bigint(spark):
    edges = trajectory_graph(_stays(spark), ["user_id"], "stime", "node")
    etypes = dict(edges.dtypes)
    assert etypes["n_trips"] == "bigint" and etypes["n_entities"] == "bigint"
    ntypes = dict(node_features(edges).dtypes)
    for c in ("out_trips", "out_degree", "in_trips", "in_degree"):
        assert ntypes[c] == "bigint", (c, ntypes[c])


def test_plan_shape_single_window_plus_agg(spark):
    """Scale guard: the edge derivation must be one window over the
    entity key plus one hash aggregate — no join, no explode, no
    cartesian node anywhere in the plan."""
    edges = trajectory_graph(_stays(spark), ["user_id"], "stime", "node")
    plan = edges._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan and "Generate" not in plan
    assert plan.count("Window") == 1


def _py_pagerank(edges, n_iter=5, d=850_000, scale=10**12):
    from collections import defaultdict

    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    deg = defaultdict(int)
    for a, _ in edges:
        deg[a] += 1
    rank = {v: scale // n for v in nodes}
    base = ((1_000_000 - d) * scale) // 1_000_000 // n
    for _ in range(n_iter):
        s = defaultdict(int)
        for a, b in edges:
            s[b] += rank[a] // deg[a]
        rank = {v: base + d * s[v] // 1_000_000 for v in nodes}
    return rank


def test_pagerank_matches_python_model(spark):
    import random

    from geofeaturegeneration_spark.operators.graph import pagerank

    rng = random.Random(5)
    edges = sorted(
        {(rng.randrange(30), rng.randrange(30)) for _ in range(120)}
    )
    edges = [(a, b) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {
        r["node"]: r["rank"] for r in pagerank(df, n_iter=5).collect()
    }
    assert got == _py_pagerank(edges, n_iter=5)
    # partitioning invariance: integer arithmetic is shuffle-order-proof
    got2 = {
        r["node"]: r["rank"]
        for r in pagerank(df.repartition(7, "dst"), n_iter=5).collect()
    }
    assert got2 == got


def test_pagerank_hub_ranks_highest_and_dangling_gets_base(spark):
    from geofeaturegeneration_spark.operators.graph import pagerank

    # star: everyone points at 0; 0 points at 9 (so 9 is downstream of the
    # hub); node 5 dangles (in-edge only)
    edges = [(i, 0) for i in range(1, 9)] + [(0, 9), (0, 5)]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT")
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=10).collect()}
    assert got[0] == max(got.values())
    # sources 1..8 (except 5, which receives (0,5)) have no in-edges:
    # exactly base after any iteration
    base = ((1_000_000 - 850_000) * 10**12) // 1_000_000 // 10
    pure_sources = [i for i in range(1, 9) if i != 5]
    assert {i: got[i] for i in pure_sources} == {i: base for i in pure_sources}
    # dangling node 5 still receives rank (its out-mass is dropped)
    assert got[5] > base


def test_pagerank_empty_and_validation(spark):
    import pytest

    from geofeaturegeneration_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src BIGINT, dst BIGINT")
    assert pagerank(empty).count() == 0
    df = spark.createDataFrame([(1, 2)], "src BIGINT, dst BIGINT")
    with pytest.raises(ValueError, match="damping_ppm"):
        pagerank(df, damping_ppm=2_000_000)


def test_pagerank_weighted_matches_python_model(spark):
    import random
    from collections import defaultdict

    from geofeaturegeneration_spark.operators.graph import pagerank

    rng = random.Random(11)
    edges = sorted(
        {(rng.randrange(20), rng.randrange(20)) for _ in range(80)}
    )
    edges = [(a, b, rng.randrange(1, 9)) for a, b in edges if a != b]
    df = spark.createDataFrame(edges, "src BIGINT, dst BIGINT, w BIGINT")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=5, weight_col="w").collect()
    }
    nodes = sorted({a for a, _, _ in edges} | {b for _, b, _ in edges})
    n, d, scale = len(nodes), 850_000, 10**12
    W = defaultdict(int)
    for a, _, w in edges:
        W[a] += w
    rank = {v: scale // n for v in nodes}
    base = ((1_000_000 - d) * scale) // 1_000_000 // n
    for _ in range(5):
        s = defaultdict(int)
        for a, b, w in edges:
            s[b] += (rank[a] * w) // W[a]
        rank = {v: base + d * s[v] // 1_000_000 for v in nodes}
    assert got == rank
    # weight 1 everywhere == the unweighted path exactly
    ones = spark.createDataFrame(
        [(a, b, 1) for a, b, _ in edges], "src BIGINT, dst BIGINT, w BIGINT"
    )
    a1 = {r["node"]: r["rank"] for r in pagerank(ones, n_iter=3, weight_col="w").collect()}
    a2 = {r["node"]: r["rank"] for r in pagerank(ones.drop("w"), n_iter=3).collect()}
    assert a1 == a2


def test_pagerank_rejects_nonpositive_weights(spark):
    """ADVICE r04 #2: a zero/negative/null edge weight must raise (the
    per-row codegen guard), never silently divide by a zero out-weight."""
    import pytest

    from geofeaturegeneration_spark.operators.graph import pagerank

    for bad in (0, -3):
        df = spark.createDataFrame(
            [(1, 2, 5), (1, 3, bad)], "src BIGINT, dst BIGINT, w BIGINT"
        )
        with pytest.raises(Exception, match="positive"):
            pagerank(df, n_iter=2, weight_col="w").collect()
    nul = spark.createDataFrame(
        [(1, 2, 5), (2, 3, None)], "src BIGINT, dst BIGINT, w BIGINT"
    )
    with pytest.raises(Exception, match="positive"):
        pagerank(nul, n_iter=2, weight_col="w").collect()
