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
