"""Graph analytics over the copurchase affinity graph.

The reference pipeline is single-table and graph-free (SURVEY.md §0);
these queries complete the engine's iterative-graph family alongside
``graph.pagerank`` and ``dedup.connected_components`` — and unlike
those two (rows-only by float/order nature), BOTH shapes here are
EXACT and oracle-checkable: triangle membership and BFS level sets are
set-valued, independent of partition and iteration order, so a DuckDB
twin (3-way self-join; bounded recursive CTE) hash-checks them.

Edge set: parts co-ordered in >= 2 distinct orders (the ``HAVING``
sparsifier keeps the projection of the bipartite order-part graph from
collapsing into a near-clique — one mega-order would otherwise connect
everything). Built exactly like ``parts_copurchase_pairs``
(`relational.py`): within-order self-equi-join with the triangle cut,
pair volume bounded by Σ(items-per-order choose 2), never corpus².

Scale notes:

* ``triangle_count`` (graph.py) degree-orients edges so wedge fan-out
  is O(sqrt(|E|)) per node even under celebrity skew — two equi-join
  shuffles total, each triangle found once at its lowest-ranked apex;
* ``bfs_hops`` (graph.py) moves only the frontier per hop over a
  once-repartitioned symmetric edge table; hop histograms here are
  bounded output (≤ max_hops+1 rows);
* both queries aggregate before any ordering — the only sort runs on
  the bounded result (top-20 / ≤7 rows).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import graph
from realtime_data_pipeline_spark.queries.core import load

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}
SHELVED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
SHELVED_ORACLE_SQL: dict[str, str] = {}


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected (part_a < part_b) edges: co-ordered in >= 2 orders."""
    lp = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = lp.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("pa")
    )
    b = lp.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_partkey").alias("pb")
    )
    return (
        a.join(b, (a["__ok"] == b["__ok"]) & (a["pa"] < b["pb"]))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 2)
        .select("pa", "pb")
    )


def copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by triangle participation in the copurchase graph —
    the 'tightly bundled product cluster' detector (a triangle = three
    parts each pairwise co-ordered). Degree-oriented listing via
    :func:`graph.triangle_count`; only the bounded per-node counts are
    sorted."""
    # persist: triangle_count reads its edge input from three plan
    # branches whose differing column pruning defeats exchange reuse —
    # uncached, the (self-join + groupBy) edge build runs 3x. The cache
    # is bounded (the sparsified edge list, thousands of rows at sf0.1,
    # LRU-evictable); the result stays lazy so the full plan remains
    # EXPLAIN- and gate-visible.
    edges = _copurchase_edges(spark, sf_dir).persist()
    tri = graph.triangle_count(edges, src="pa", dst="pb")
    return (
        tri.orderBy(F.col("n_triangles").desc(), F.col("node").asc())
        .limit(20)
        .select(
            F.col("node").cast("bigint").alias("part"),
            F.col("n_triangles").cast("bigint").alias("n_triangles"),
        )
    )


COPURCHASE_TRIANGLES_SQL = """
WITH lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
      FROM lp a JOIN lp b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= 2),
t AS (SELECT e1.pa AS x, e1.pb AS y, e2.pb AS z
      FROM e e1
      JOIN e e2 ON e2.pa = e1.pb
      JOIN e e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
n AS (SELECT x AS part FROM t
      UNION ALL SELECT y FROM t
      UNION ALL SELECT z FROM t)
SELECT CAST(part AS BIGINT) AS part,
       CAST(COUNT(*) AS BIGINT) AS n_triangles
FROM n GROUP BY part
ORDER BY n_triangles DESC, part ASC
LIMIT 20
"""


def copurchase_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop-distance histogram from the smallest part id in the
    copurchase graph (BFS, <= 6 hops): how fast the affinity
    neighborhood expands — reachable-part count plus min/max part id
    per level (aggregate fingerprints of the full distance map).
    Exact: BFS level sets are partition-order independent; the oracle
    is a bounded recursive CTE."""
    edges = _copurchase_edges(spark, sf_dir).persist()
    src = edges.agg(F.min("pa")).first()[0]  # bounded 1-row scalar
    dist = graph.bfs_hops(edges, src, src="pa", dst="pb", max_hops=6)
    edges.unpersist()
    return (
        dist.groupBy("hops")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.min("node").alias("min_part"),
            F.max("node").alias("max_part"),
        )
        .orderBy("hops")
        .select(
            F.col("hops").cast("int").alias("hops"),
            F.col("n_parts").cast("bigint").alias("n_parts"),
            F.col("min_part").cast("bigint").alias("min_part"),
            F.col("max_part").cast("bigint").alias("max_part"),
        )
    )


COPURCHASE_BFS_HOPS_SQL = """
WITH RECURSIVE lp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb
       FROM lp a JOIN lp b
         ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
e AS (SELECT pa, pb FROM e0 UNION ALL SELECT pb, pa FROM e0),
s AS (SELECT MIN(pa) AS src FROM e),
walk(node, d) AS (
  SELECT src, 0 FROM s
  UNION
  SELECT e.pb, w.d + 1 FROM walk w JOIN e ON e.pa = w.node WHERE w.d < 6
),
dist AS (SELECT node, MIN(d) AS hops FROM walk GROUP BY node)
SELECT CAST(hops AS INT) AS hops,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(MIN(node) AS BIGINT) AS min_part,
       CAST(MAX(node) AS BIGINT) AS max_part
FROM dist GROUP BY hops ORDER BY hops
"""


SHELVED_QUERIES["copurchase_triangles"] = copurchase_triangles
SHELVED_ORACLE_SQL["copurchase_triangles"] = COPURCHASE_TRIANGLES_SQL
SHELVED_QUERIES["copurchase_bfs_hops"] = copurchase_bfs_hops
SHELVED_ORACLE_SQL["copurchase_bfs_hops"] = COPURCHASE_BFS_HOPS_SQL
