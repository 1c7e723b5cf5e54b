"""Link-graph quality propagation (graph.pagerank) vs an independent
dense numpy power iteration — same damping, same dangling-mass
redistribution, same iteration count."""

from __future__ import annotations

import numpy as np
import pytest

from realtime_data_pipeline_spark import graph


def _numpy_pagerank(edges, n, damping=0.85, iterations=20):
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[d] += r[s] / out_deg[s]
        dangling = r[out_deg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return r


@pytest.mark.slow
def test_pagerank_matches_numpy_power_iteration(spark):
    # a graph with a hub, a chain, a dangling sink, and a 2-cycle
    edges = [
        (0, 1), (0, 2), (0, 3),
        (1, 2),
        (2, 0),
        (3, 4),          # 4 is dangling (no out-links)
        (5, 6), (6, 5),  # isolated 2-cycle
    ]
    n = 7
    want = _numpy_pagerank(edges, n)
    got_rows = graph.pagerank(
        spark.createDataFrame(edges, "src long, dst long"),
        iterations=20,
        checkpoint_every=5,
    ).collect()
    got = np.zeros(n)
    for r in got_rows:
        got[r.node] = r.rank
    assert np.abs(got - want).max() < 1e-9
    # mass conservation: dangling redistribution keeps the total at 1
    assert abs(got.sum() - 1.0) < 1e-9
    # the hub target (2: linked by 0 and 1) outranks the chain tail
    assert got[2] > got[3]


def test_pagerank_dedupes_parallel_edges_and_validates(spark):
    # parallel edges count once: identical result with duplicates
    base = [(0, 1), (1, 0)]
    dup = base + [(0, 1), (0, 1)]
    a = {
        r.node: r.rank
        for r in graph.pagerank(
            spark.createDataFrame(base, "src long, dst long"), iterations=5
        ).collect()
    }
    b = {
        r.node: r.rank
        for r in graph.pagerank(
            spark.createDataFrame(dup, "src long, dst long"), iterations=5
        ).collect()
    }
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-12 for k in a)

    df = spark.createDataFrame(base, "src long, dst long")
    with pytest.raises(ValueError, match="damping"):
        graph.pagerank(df, damping=1.5)
    with pytest.raises(ValueError, match="iterations"):
        graph.pagerank(df, iterations=0)


def _brute_triangles(edges):
    """Node -> triangle count by brute-force enumeration."""
    import itertools
    adj = {}
    es = set()
    for a, b in edges:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        es.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    counts = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if (
            (a, b) in es and (a, c) in es and (b, c) in es
        ):
            for n in (a, b, c):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangle_count_matches_bruteforce(spark):
    # two overlapping triangles + a pendant + a square (no triangle)
    edges = [
        (0, 1), (1, 2), (0, 2),           # triangle 0-1-2
        (1, 3), (2, 3),                   # triangle 1-2-3 (shares edge 1-2)
        (3, 4),                           # pendant
        (5, 6), (6, 7), (7, 8), (5, 8),   # 4-cycle, no triangle
        (2, 1),                           # parallel (reversed) duplicate
        (4, 4),                           # self-loop, ignored
    ]
    want = _brute_triangles(edges)
    got = {
        r.node: r.n_triangles
        for r in graph.triangle_count(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    assert got == want


def test_triangle_count_randomized_vs_bruteforce(spark):
    import random

    rng = random.Random(7)
    edges = list(
        {
            (rng.randrange(12), rng.randrange(12))
            for _ in range(40)
        }
    )
    want = _brute_triangles(edges)
    got = {
        r.node: r.n_triangles
        for r in graph.triangle_count(
            spark.createDataFrame(edges, "src long, dst long")
        ).collect()
    }
    assert got == want


def test_bfs_hops_levels_and_unreachable(spark):
    # chain 0-1-2-3, branch 1-4, isolated component 5-6
    edges = [(0, 1), (1, 2), (2, 3), (1, 4), (5, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.hops for r in graph.bfs_hops(df, 0).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 4: 2, 3: 3}  # 5, 6 unreachable
    # max_hops truncates: only levels <= 1 present
    got1 = {r.node: r.hops for r in graph.bfs_hops(df, 0, max_hops=1).collect()}
    assert got1 == {0: 0, 1: 1}
    # direction-agnostic: edges are undirected, so BFS from the chain
    # tail walks the same distances mirrored
    got_rev = {r.node: r.hops for r in graph.bfs_hops(df, 3).collect()}
    assert got_rev == {3: 0, 2: 1, 1: 2, 0: 3, 4: 3}


def test_bfs_hops_string_and_int_node_ids(spark):
    # the seed frame derives its node type from the edge schema, so the
    # generic API works for string ids (and ints of any width) alike
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")]
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.hops for r in graph.bfs_hops(df, "a").collect()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3}
    df_int = spark.createDataFrame([(0, 1), (1, 2)], "src int, dst int")
    got_int = {r.node: r.hops for r in graph.bfs_hops(df_int, 0).collect()}
    assert got_int == {0: 0, 1: 1, 2: 2}


def test_bfs_hops_early_exit_and_validation(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    # frontier drains at hop 1; further hops are a no-op (early break)
    got = {r.node: r.hops for r in graph.bfs_hops(df, 0, max_hops=6).collect()}
    assert got == {0: 0, 1: 1}
    with _pytest.raises(ValueError):
        graph.bfs_hops(df, 0, max_hops=-1)


def test_bfs_hops_randomized_vs_python_bfs(spark):
    import collections
    import random

    rng = random.Random(11)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(45)})

    def py_bfs(src, max_hops):
        adj = collections.defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        dist = {src: 0}
        frontier = [src]
        for hop in range(1, max_hops + 1):
            nxt = {
                v
                for u in frontier
                for v in adj[u]
                if v not in dist
            }
            for v in nxt:
                dist[v] = hop
            frontier = list(nxt)
            if not frontier:
                break
        return dist

    # int32 ids exercise the union's type path alongside the bigint tests
    df = spark.createDataFrame(edges, "src int, dst int")
    for max_hops in (2, 6):
        want = py_bfs(edges[0][0], max_hops)
        got = {
            r.node: r.hops
            for r in graph.bfs_hops(df, edges[0][0], max_hops=max_hops).collect()
        }
        assert got == want, (max_hops, got, want)


def _numpy_ppr(edges, n, seeds, damping=0.85, iterations=20):
    """Personalized PageRank reference: teleport AND dangling mass go to
    the seed distribution; uniform init (matches the operator)."""
    p = np.zeros(n)
    tot = sum(w for _, w in seeds)
    for node, w in seeds:
        p[node] += w / tot
    out_deg = np.zeros(n)
    for s, _ in edges:
        out_deg[s] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        for s, d in edges:
            contrib[d] += r[s] / out_deg[s]
        dangling = r[out_deg == 0].sum()
        r = ((1 - damping) + damping * dangling) * p + damping * contrib
    return r


@pytest.mark.slow
def test_personalized_pagerank_matches_numpy_and_localizes(spark):
    edges = [
        (0, 1), (0, 2), (0, 3),
        (1, 2),
        (2, 0),
        (3, 4),          # 4 is dangling
        (5, 6), (6, 5),  # isolated 2-cycle, unreachable from seeds
    ]
    n = 7
    seeds = [(0, 3.0), (1, 1.0)]
    want = _numpy_ppr(edges, n, seeds)
    got_rows = graph.pagerank(
        spark.createDataFrame(edges, "src long, dst long"),
        iterations=20,
        checkpoint_every=5,
        personalization=spark.createDataFrame(
            seeds, "node long, weight double"
        ),
    ).collect()
    got = np.zeros(n)
    for r in got_rows:
        got[r.node] = r.rank
    assert np.abs(got - want).max() < 1e-9
    assert abs(got.sum() - 1.0) < 1e-9  # mass conserved
    # localization: the unreachable 2-cycle decays toward zero while
    # the seed neighborhood holds the mass
    assert got[5] + got[6] < 0.02
    assert got[0] + got[1] + got[2] > 0.6

    # seeds outside the graph are dropped + renormalized (no mass leak);
    # pure-ghost seed sets are refused
    ghost = spark.createDataFrame(
        seeds + [(999, 100.0)], "node long, weight double"
    )
    got2_rows = graph.pagerank(
        spark.createDataFrame(edges, "src long, dst long"),
        iterations=20,
        personalization=ghost,
    ).collect()
    got2 = np.zeros(n)
    for r in got2_rows:
        got2[r.node] = r.rank
    assert np.abs(got2 - want).max() < 1e-9
    with pytest.raises(ValueError, match="positive weight"):
        graph.pagerank(
            spark.createDataFrame(edges, "src long, dst long"),
            iterations=2,
            personalization=spark.createDataFrame(
                [(999, 1.0)], "node long, weight double"
            ),
        )
