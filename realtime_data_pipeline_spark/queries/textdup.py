"""X2 near-duplicate queries over ``documents``.

``docs_jaccard_top_pairs`` is the oracle-checked exact baseline (small-N
crossJoin fallback — the shape SURVEY §2.9 allows only under a row-count
guard). The MinHash / SimHash variants are the scale path: banded signature
joins, rows-only declarations (their quality gates live in
``tests/test_neardup.py`` with planted near-duplicates — the synthetic
corpus itself contains no near-dups, so empty results here are correct).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realtime_data_pipeline_spark import fuzzy, neardup
from realtime_data_pipeline_spark.queries.core import load

N_DOCS = 100
TOP = 20


def docs_jaccard_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < N_DOCS)
    sh = docs.select(
        "doc_id",
        F.array_distinct(neardup.word_shingles(F.col("text"), 3)).alias("sh"),
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(
                neardup.exact_jaccard(F.col("sh_a"), F.col("sh_b")), 6
            ).alias("j6"),
        )
    )
    return (
        pairs.orderBy(F.col("j6").desc(), F.col("id_a").asc(), F.col("id_b").asc())
        .limit(TOP)
        .select("id_a", "id_b", F.round(F.col("j6"), 4).alias("jaccard"))
    )


DOCS_JACCARD_TOP_PAIRS_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
  FROM documents WHERE doc_id < {N_DOCS}
),
d AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh
  FROM toks
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ROUND(CASE
           WHEN len(list_distinct(list_concat(a.sh, b.sh))) > 0
           THEN len(list_intersect(a.sh, b.sh))
                / len(list_distinct(list_concat(a.sh, b.sh)))
           ELSE 0.0 END, 6) AS j6
  FROM d a JOIN d b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, ROUND(j6, 4) AS jaccard
FROM p
ORDER BY j6 DESC, id_a ASC, id_b ASC
LIMIT {TOP}
"""


def docs_neardup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup sweep at Jaccard ≥ 0.3. Rows-only; expected
    empty on the synthetic corpus (no planted dups) — the test suite plants
    them to exercise recall."""
    docs = load(spark, sf_dir, "documents")
    return neardup.neardup_pairs_minhash(
        docs, "doc_id", "text", n=3, k=64, n_bands=16, threshold=0.3
    )


def docs_neardup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash hamming ≤ 7 sweep with 8×8-bit bands: every reported pair
    is pigeonhole-GUARANTEED to be found (hamming ≤ n_bands-1 = 7), no
    probabilistic recall gap. At web scale you'd run the module default
    (4×16 bands, hamming ≤ 3 — finer keys, smaller buckets); rows-only."""
    docs = load(spark, sf_dir, "documents")
    return neardup.neardup_pairs_simhash(
        docs, "doc_id", "text", n=3, max_hamming=7, n_bands=8
    )


def docs_neardup_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 end-to-end: detect near-dups (MinHash-LSH) then DROP them,
    keeping the lowest doc_id of each dup relation — the full
    training-data dedup pass. Rows-only."""
    from realtime_data_pipeline_spark import dedup

    docs = load(spark, sf_dir, "documents")
    pairs = neardup.neardup_pairs_minhash(
        docs, "doc_id", "text", n=3, k=64, n_bands=16, threshold=0.5
    )
    return dedup.drop_neardups(docs, pairs, "doc_id").select(
        "doc_id", "lang", "source"
    )


def docs_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X4 rolling-hash fingerprints (winnowing): per-doc fingerprint counts.
    Rows-only — xxhash64 values are engine-specific; the shift-resistance
    property is gated in tests/test_neardup.py."""
    from realtime_data_pipeline_spark import text as T

    docs = load(spark, sf_dir, "documents")
    fps = T.winnow_fingerprints(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(fps).cast("int").alias("n_fingerprints"),
        F.length("text").cast("int").alias("n_chars"),
    )


CC_N_DOCS = 200
CC_THRESHOLD = 0.6


def docs_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative operator class: connected components over the exact
    near-dup pair graph (Jaccard ≥ 0.6 among the first CC_N_DOCS docs) via
    label propagation to a fixpoint — each dup group labeled by its
    smallest doc_id. The pair base is exact (cross-join under the small-N
    guard) so DuckDB can reproduce it with a recursive CTE; at corpus
    scale the same components run over the MinHash-LSH pair output."""
    from realtime_data_pipeline_spark import dedup

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < CC_N_DOCS)
    sh = docs.select(
        "doc_id", neardup.gram_hashes(F.col("text"), 3).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            neardup.exact_jaccard(F.col("sh_a"), F.col("sh_b")) >= CC_THRESHOLD
        )
        .select("id_a", "id_b")
    )
    return dedup.connected_components(pairs)


DOCS_DUP_COMPONENTS_SQL = rf"""
WITH RECURSIVE d AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(string_split_regex(trim(text), '\s+')) - 1),
           i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
                string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                string_split_regex(trim(text), '\s+')[i+2])) AS sh
  FROM documents WHERE doc_id < {CC_N_DOCS}
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE len(list_distinct(list_concat(a.sh, b.sh))) > 0
    AND len(list_intersect(a.sh, b.sh))
        / len(list_distinct(list_concat(a.sh, b.sh))) >= {CC_THRESHOLD}
),
e AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM p
),
reach(id, lab) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.lab FROM e JOIN reach ON e.b = reach.id
)
SELECT id, MIN(lab) AS component
FROM reach
GROUP BY id
"""


def suppliers_fuzzy_name_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Entity-resolution fuzzy match (`fuzzy.fuzzy_self_pairs`): every
    supplier pair whose names are within Levenshtein distance 1 — the
    typo-tolerant record-linkage pass entity keys need where token
    shingles fail (one edit rewrites every shingle around it). The
    oracle is the brute-force cross-join ground truth; the Spark side
    must reproduce it through symmetric-delete blocking (complete for
    d ≤ 2 by the SymSpell pigeonhole argument — see ``fuzzy.py``) plus
    an exact per-candidate verify. Scale shape: variants shuffle as
    8-byte xxhash64 keys (never strings), one equi-join + distinct, no
    cross product anywhere — candidate volume is rows × name-length,
    not rows²."""
    sup = load(spark, sf_dir, "supplier")
    return fuzzy.fuzzy_self_pairs(
        sup, "s_suppkey", "s_name", max_dist=1
    ).select(
        F.col("id_a").cast("bigint").alias("id_a"),
        F.col("id_b").cast("bigint").alias("id_b"),
        F.col("text_a").alias("name_a"),
        F.col("text_b").alias("name_b"),
        "dist",
    ).orderBy("id_a", "id_b")


SUPPLIERS_FUZZY_NAME_PAIRS_SQL = """
SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b,
       a.s_name AS name_a, b.s_name AS name_b,
       CAST(levenshtein(a.s_name, b.s_name) AS INT) AS dist
FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
WHERE levenshtein(a.s_name, b.s_name) <= 1
ORDER BY id_a, id_b
"""


def docs_dup_best_representative(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Quality-based dup-cluster canonicalization: for every near-dup
    component (the `docs_dup_components` pair base), keep the HIGHEST-
    QUALITY member (lexical diversity, round-6; doc_id breaks ties) —
    the curation upgrade over min-id representatives, because the
    smallest id is arbitrary while the cleanest copy is the one worth
    training on. Composition: exact pair graph → pointer-jump
    components → broadcast quality join → top-1 per component
    (`topk_per_group`, WindowGroupLimit partial top-k). Oracle: the
    recursive-CTE closure + ROW_NUMBER over the same score."""
    from realtime_data_pipeline_spark import dedup, ops

    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < CC_N_DOCS
    )
    sh = docs.select(
        "doc_id", neardup.gram_hashes(F.col("text"), 3).alias("sh")
    )
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("sh").alias("sh_b"))
    pairs = (
        a.crossJoin(F.broadcast(b))
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            neardup.exact_jaccard(F.col("sh_a"), F.col("sh_b"))
            >= CC_THRESHOLD
        )
        .select("id_a", "id_b")
    )
    comp = dedup.connected_components(pairs)
    from realtime_data_pipeline_spark import text

    t = F.col("text")
    wc = text.word_count(t)
    quality = docs.select(
        "doc_id",
        F.round(
            F.when(wc > 0, text.distinct_word_count(t) / wc).otherwise(0.0),
            6,
        ).alias("score6"),
    )
    members = comp.select(
        F.col("id").alias("doc_id"), F.col("component")
    ).join(quality, "doc_id")
    best = ops.topk_per_group(
        members,
        ["component"],
        [F.col("score6").desc(), F.col("doc_id").asc()],
        k=1,
    )
    sizes = members.groupBy("component").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members")
    )
    return (
        best.join(sizes, "component")
        .select(
            F.col("component").cast("bigint").alias("component"),
            F.col("doc_id").cast("bigint").alias("best_doc_id"),
            "score6",
            "n_members",
        )
        .orderBy("component")
    )


DOCS_DUP_BEST_REPRESENTATIVE_SQL = rf"""
WITH RECURSIVE d AS (
  SELECT doc_id,
         list_distinct(list_transform(
           range(1, len(string_split_regex(trim(text), '\s+')) - 1),
           i -> string_split_regex(trim(text), '\s+')[i] || ' ' ||
                string_split_regex(trim(text), '\s+')[i+1] || ' ' ||
                string_split_regex(trim(text), '\s+')[i+2])) AS sh
  FROM documents WHERE doc_id < {CC_N_DOCS}
),
p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE len(list_distinct(list_concat(a.sh, b.sh))) > 0
    AND len(list_intersect(a.sh, b.sh))
        / len(list_distinct(list_concat(a.sh, b.sh))) >= {CC_THRESHOLD}
),
e AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM p
),
reach(id, lab) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.lab FROM e JOIN reach ON e.b = reach.id
),
comp AS (
  SELECT id AS doc_id, MIN(lab) AS component FROM reach GROUP BY id
),
q AS (
  SELECT doc_id,
         ROUND(CASE WHEN len(string_split_regex(trim(text), '\s+')) > 0
               THEN len(list_distinct(string_split_regex(trim(text), '\s+')))
                    / len(string_split_regex(trim(text), '\s+'))
               ELSE 0.0 END, 6) AS score6
  FROM documents WHERE doc_id < {CC_N_DOCS}
),
m AS (
  SELECT c.component, c.doc_id, q.score6,
         ROW_NUMBER() OVER (PARTITION BY c.component
                            ORDER BY q.score6 DESC, c.doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY c.component) AS n_members
  FROM comp c JOIN q USING (doc_id)
)
SELECT CAST(component AS BIGINT) AS component,
       CAST(doc_id AS BIGINT) AS best_doc_id,
       score6,
       CAST(n_members AS BIGINT) AS n_members
FROM m WHERE rn = 1
ORDER BY component
"""


def suppliers_fuzzy_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full entity RESOLUTION, not just matching: the fuzzy pair graph
    (`fuzzy.fuzzy_self_pairs`, Levenshtein ≤ 1 under symmetric-delete
    blocking) closed into canonical entities via pointer-jumped
    connected components (`dedup.connected_components`) — every supplier
    gets an entity_id (the smallest suppkey reachable through typo
    links; singletons canonicalize to themselves) and the entity's
    member count. This is the master-data operator record linkage
    feeds: match finds the edges, RESOLUTION names the nodes.

    Scale shape: blocking keeps candidate volume at rows × name-length
    (never rows²), components converge in O(log diameter) bounded
    rounds, and the singleton fill is one left join + coalesce — no
    per-entity iteration anywhere. Oracle: DuckDB recursive-CTE
    transitive closure over the same Levenshtein pair base (exact on
    the small fixture; the Spark side must reproduce it through the
    blocked + iterative spelling)."""
    from realtime_data_pipeline_spark import dedup

    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").cast("bigint").alias("suppkey"),
        F.col("s_name").alias("name"),
    )
    pairs = fuzzy.fuzzy_self_pairs(
        sup, "suppkey", "name", max_dist=1
    ).select("id_a", "id_b")
    comp = dedup.connected_components(pairs)
    ent = (
        sup.join(
            comp.select(
                F.col("id").cast("bigint").alias("suppkey"), "component"
            ),
            "suppkey",
            "left",
        )
        .select(
            "suppkey",
            "name",
            F.coalesce(F.col("component"), F.col("suppkey"))
            .cast("bigint")
            .alias("entity_id"),
        )
    )
    sizes = ent.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("entity_size")
    )
    return (
        ent.join(sizes, "entity_id")
        .select("suppkey", "name", "entity_id", "entity_size")
        .orderBy("suppkey")
    )


SUPPLIERS_FUZZY_ENTITIES_SQL = """
WITH RECURSIVE p AS (
  SELECT a.s_suppkey AS id_a, b.s_suppkey AS id_b
  FROM supplier a JOIN supplier b ON a.s_suppkey < b.s_suppkey
  WHERE levenshtein(a.s_name, b.s_name) <= 1
), e AS (
  SELECT id_a AS a, id_b AS b FROM p
  UNION ALL
  SELECT id_b AS a, id_a AS b FROM p
), reach(id, lab) AS (
  SELECT a, a FROM e
  UNION
  SELECT e.a, reach.lab FROM e JOIN reach ON e.b = reach.id
), comp AS (
  SELECT id, MIN(lab) AS component FROM reach GROUP BY id
), ent AS (
  SELECT s.s_suppkey AS suppkey, s.s_name AS name,
         CAST(COALESCE(c.component, s.s_suppkey) AS BIGINT) AS entity_id
  FROM supplier s LEFT JOIN comp c ON s.s_suppkey = c.id
)
SELECT suppkey, name, entity_id,
       CAST(COUNT(*) OVER (PARTITION BY entity_id) AS BIGINT)
         AS entity_size
FROM ent
ORDER BY suppkey
"""


def docs_jaccard_join_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact threshold set-similarity join (round 12,
    `neardup.prefix_jaccard_join`): EVERY document pair with
    3-shingle Jaccard ≥ 0.5 over the whole corpus — recall exactly 1.0
    by the prefix-filtering guarantee, candidate cost instead of the
    corpus² the oracle pays. The oracle IS the quadratic cross join, so
    the prefix decomposition is proven identical to the textbook
    definition; the LSH family (`docs_neardup_minhash`) remains the
    recall-traded sibling for thresholds where even candidates are too
    many. The face caps the corpus at SSJOIN_N_DOCS so the QUADRATIC
    oracle stays tractable at sf0.1 (the cap covers the whole corpus at
    sf0.001/0.01; the operator itself has no cap — the whole point is
    that IT does not go quadratic, and its uncapped parity is pinned by
    the brute-force property test in tests/test_neardup.py)."""
    from realtime_data_pipeline_spark import neardup as nd

    docs = load(spark, sf_dir, "documents").filter(
        F.col("doc_id") < SSJOIN_N_DOCS
    )
    return (
        nd.prefix_jaccard_join(docs, "doc_id", "text", tau=0.5, n=3)
        .select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))
        .orderBy("id_a", "id_b")
    )


SSJOIN_N_DOCS = 1500

DOCS_JACCARD_JOIN_EXACT_SQL = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
  FROM documents WHERE doc_id < {SSJOIN_N_DOCS}
), d AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3
              THEN list_distinct(list_transform(range(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
              ELSE [] END AS sh
  FROM toks
), nonempty AS (
  SELECT * FROM d WHERE len(sh) > 0
), p AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         ROUND(len(list_intersect(a.sh, b.sh))
               / CAST(len(list_distinct(list_concat(a.sh, b.sh)))
                      AS DOUBLE), 6) AS j6
  FROM nonempty a JOIN nonempty b ON a.doc_id < b.doc_id
)
SELECT id_a, id_b, ROUND(j6, 4) AS jaccard
FROM p WHERE j6 >= 0.5
ORDER BY id_a, id_b
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "docs_jaccard_top_pairs": docs_jaccard_top_pairs,
    "docs_neardup_minhash": docs_neardup_minhash,
    "docs_dup_components": docs_dup_components,
}

# Implemented + recall-gated in tests/test_neardup.py, but not declared to
# the 50-slot external driver: SimHash duplicates MinHash's rows-only signal
# (same band-join architecture, different sketch), winnowing is a per-doc
# fingerprint whose value is as an input to other ops, and the end-to-end
# dedup composition is the declared minhash pairs + dup components chained —
# both links hold driver rows of their own.
SHELVED_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "docs_neardup_simhash": docs_neardup_simhash,
    "docs_winnow_fingerprints": docs_winnow_fingerprints,
    "docs_neardup_dedup": docs_neardup_dedup,
    # round-10 build, round-11 rotation queue: fuzzy entity matching
    "suppliers_fuzzy_name_pairs": suppliers_fuzzy_name_pairs,
    # round-11 build: fuzzy pairs closed into canonical entities
    "suppliers_fuzzy_entities": suppliers_fuzzy_entities,
    # round-11 build: quality-based dup-cluster canonicalization
    "docs_dup_best_representative": docs_dup_best_representative,
    # round-12 build: exact threshold ssjoin via prefix filtering
    "docs_jaccard_join_exact": docs_jaccard_join_exact,
}

ORACLE_SQL: dict[str, str] = {
    "docs_jaccard_top_pairs": DOCS_JACCARD_TOP_PAIRS_SQL,
    "docs_dup_components": DOCS_DUP_COMPONENTS_SQL,
}

SHELVED_ORACLE_SQL: dict[str, str] = {
    "docs_jaccard_join_exact": DOCS_JACCARD_JOIN_EXACT_SQL,
    "suppliers_fuzzy_name_pairs": SUPPLIERS_FUZZY_NAME_PAIRS_SQL,
    "suppliers_fuzzy_entities": SUPPLIERS_FUZZY_ENTITIES_SQL,
    "docs_dup_best_representative": DOCS_DUP_BEST_REPRESENTATIVE_SQL,
}
