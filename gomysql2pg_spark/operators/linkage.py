"""Entity-resolution / record-linkage operators (SURVEY.md §2.I, round 7).

The reference migrates rows verbatim and its compareDb validation only
checks counts and checksums (`cmd/compare.go`); it has no notion of
*fuzzy* identity. A training-data pipeline needs one: product feeds,
author names, and web hosts arrive with spelling variants, and the
standard cure is blocking → pairwise scoring → transitive clustering →
canonical rollup. This module implements that four-stage ER pipeline
over the `part` dimension (64 distinct adjective-noun names at sf0.01,
with distance-1 variants like 'cold ring' / 'old ring').

Scale notes (100 TB):
- candidate generation NEVER does the all-pairs self-join: entities
  are first collapsed to DISTINCT name strings (dimension-sized, not
  fact-sized), then self-joined only WITHIN a blocking key (last
  token), and any block larger than ER_MAX_BLOCK is dropped with the
  same df-cap pattern as the shingle inverted index
  (`dedup.py:117-213`) — the quadratic term is bounded by
  Σ min(|block|, cap)², never |entities|²,
- scoring is `levenshtein` on the candidate pairs only (JVM
  whole-stage codegen, no Python),
- clustering reuses `connected_components` (`dedup.py:597`): one
  shuffle per propagation round, rounds = cluster diameter (variant
  clusters are tiny), no driver-side graph,
- the rollup joins the (tiny) name→canonical map back to the fact
  side as a broadcast, so resolving 10^11 records is a map-side join.

Cross-engine notes: Spark's `levenshtein` and DuckDB's `levenshtein`
both implement the classic unit-cost edit distance; the blocking key
uses only substring/split primitives both engines define identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .dedup import connected_components

#: drop any blocking bucket with more distinct entities than this —
#: the df-cap guard that bounds the within-block pair blowup when a
#: degenerate key ('', 'inc', 'llc') swallows the dictionary
ER_MAX_BLOCK = 1000

#: match threshold: unit-cost edit distance ≤ 1 (catches drop/insert/
#: substitute-one-letter variants without bridging 'new'→'red' at 2)
ER_MAX_DISTANCE = 1


def _entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct entity names with their blocking key (last token).
    Collapsing to DISTINCT first is the load-bearing move: pair
    generation runs over the dimension (64 names), not the fact table
    (2000 rows at sf0.01, billions at 100 TB)."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(F.col("p_name").alias("name"))
        .distinct()
        .withColumn("block", F.substring_index("name", " ", -1))
    )


def _blocking_pairs(ents: DataFrame) -> DataFrame:
    """Candidate-pair generation from an entity frame — shared by the
    standalone blocking/match queries and the clusters/rollup chain
    (which pass a PERSISTED ents so the dimension collapse runs once
    per invocation, not once per stage)."""
    ok_blocks = (
        ents.groupBy("block")
        .agg(F.count("*").alias("bn"))
        .filter(F.col("bn") <= ER_MAX_BLOCK)
        .select("block")
    )
    e = ents.join(F.broadcast(ok_blocks), "block")
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, "block")
        .filter(F.col("a.name") < F.col("b.name"))
        .select(
            "block",
            F.col("a.name").alias("name_a"),
            F.col("b.name").alias("name_b"),
            F.levenshtein("a.name", "b.name").alias("distance"),
        )
    )


def q_er_blocking_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs from last-token blocking: every unordered pair
    of distinct names sharing a block (block size capped at
    ER_MAX_BLOCK), scored with levenshtein. This is the recall side of
    ER — the pairs the matcher is allowed to see."""
    return _blocking_pairs(_entities(spark, sf_dir))


ORACLE_ER_BLOCKING_PAIRS = f"""
WITH ents AS (
  SELECT DISTINCT p_name AS name,
         string_split(p_name, ' ')[-1] AS block
  FROM part
),
ok AS (
  SELECT block FROM ents GROUP BY block HAVING COUNT(*) <= {ER_MAX_BLOCK}
)
SELECT a.block AS block, a.name AS name_a, b.name AS name_b,
       levenshtein(a.name, b.name) AS distance
FROM ents a JOIN ents b ON a.block = b.block AND a.name < b.name
JOIN ok ON ok.block = a.block
"""


def _match_edges(ents: DataFrame) -> DataFrame:
    """(name_a, name_b) match edges from a (persisted) entity frame —
    the clustering input shared by the clusters and rollup chains."""
    return (
        _blocking_pairs(ents)
        .filter(F.col("distance") <= ER_MAX_DISTANCE)
        .select("name_a", "name_b")
    )


def q_er_match_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The precision side: candidate pairs that actually match
    (distance ≤ ER_MAX_DISTANCE). These edges feed clustering."""
    return q_er_blocking_pairs(spark, sf_dir).filter(
        F.col("distance") <= ER_MAX_DISTANCE
    )


ORACLE_ER_MATCH_PAIRS = f"""
SELECT * FROM ({ORACLE_ER_BLOCKING_PAIRS}) p
WHERE distance <= {ER_MAX_DISTANCE}
"""


def q_er_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure over the match edges: every entity name maps
    to a canonical name (lexicographic minimum of its component, the
    deterministic survivor rule). Singletons map to themselves, so the
    output is a TOTAL name→canonical dictionary, ready to broadcast.

    The entity frame is persisted for the invocation: it feeds both
    the pair generator (which `connected_components` materializes via
    its edge-cache count) and the final singleton left-join, so the
    part scan + distinct collapse runs exactly once, not once per
    stage (r7 VERDICT: the rollup chain recomputed it 3×). The cache
    is INTENTIONALLY left for the session (same policy as the
    PageRank edge/degree persists): the returned frame is lazy, so
    unpersisting here would evict before the caller's first action;
    the cached dimension is entity-distinct (dimension-sized, ~10³
    rows per 10⁶ facts) and Spark's LRU evicts it under pressure."""
    ents = _entities(spark, sf_dir).persist()
    # materialize the dimension cache explicitly: since the r9
    # connected_components rewrite, the small-graph path's only job is
    # a LIMIT-bounded edge probe, and CollectLimit can short-circuit
    # before touching every partition — an implicit "the probe fills
    # the cache" assumption would leave `ents` partially cached and
    # the singleton left-join below rescanning the part distinct.
    # The count is one dimension-sized job (~10³ rows per 10⁶ facts).
    ents.count()
    labels = connected_components(
        _match_edges(ents), src="name_a", dst="name_b"
    )
    return (
        ents.select("name")
        .join(labels, F.col("name") == labels.node, "left")
        .select(
            "name",
            F.coalesce("label", "name").alias("canonical"),
        )
        .withColumn("is_canonical", F.col("name") == F.col("canonical"))
    )


ORACLE_ER_CLUSTERS = f"""
WITH RECURSIVE
pairs AS (SELECT name_a, name_b FROM ({ORACLE_ER_MATCH_PAIRS}) m),
edges AS (
  SELECT name_a AS a, name_b AS b FROM pairs
  UNION
  SELECT name_b AS a, name_a AS b FROM pairs
),
reach(node, r) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON e.b = reach.node
),
labels AS (SELECT node, MIN(r) AS label FROM reach GROUP BY node),
ents AS (SELECT DISTINCT p_name AS name FROM part)
SELECT ents.name AS name,
       COALESCE(labels.label, ents.name) AS canonical,
       COALESCE(labels.label, ents.name) = ents.name AS is_canonical
FROM ents LEFT JOIN labels ON labels.node = ents.name
"""


def q_er_resolved_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The payoff stage: broadcast the name→canonical dictionary onto
    the record side and aggregate per RESOLVED entity — record count,
    variant count, price mean (micro-rounded) and the earliest key as
    the surviving record id. At 100 TB the dictionary stays
    dimension-sized, so this is a map-side broadcast join followed by
    one hash aggregate."""
    part = load_table(spark, sf_dir, "part")
    # persisted per _blocking_pairs' contract: ents feeds the block
    # histogram plus both self-join sides, and the CC probe would
    # otherwise re-run the part scan + distinct collapse ~3× in one
    # job (session-cache policy as in q_er_clusters)
    ents = _entities(spark, sf_dir).persist()
    # r9: join the component labels directly (for the small-graph path
    # a driver-built LocalRelation — its broadcast costs no upstream
    # job) and self-map unlabeled names via coalesce, instead of
    # materializing the TOTAL name→canonical dictionary first: the
    # total dictionary is q_er_clusters' published artifact, but the
    # rollup only needs label-else-self, and skipping the dictionary
    # join removed one broadcast-build job (1.40s → ~1.0s min at
    # sf0.1). Labels cover exactly the paired names, so
    # coalesce(label, p_name) ≡ the dictionary's canonical.
    labels = connected_components(
        _match_edges(ents), src="name_a", dst="name_b"
    )
    # price mean via exact integer cents summed first, then ONE float
    # division — immune to cross-engine float summation order
    cents = F.round(F.col("p_retailprice") * 100).try_cast("bigint")
    return (
        # NULL names carry no entity identity and the oracle's inner
        # dictionary join drops them — filter explicitly instead of
        # silently rolling them into a canonical-NULL group the oracle
        # never emits (r13 review finding)
        part.filter(F.col("p_name").isNotNull())
        .withColumn("cents", cents)
        .join(F.broadcast(labels), part.p_name == labels.node, "left")
        .withColumn("canonical", F.coalesce("label", "p_name"))
        .groupBy("canonical")
        .agg(
            F.count("*").alias("n_records"),
            F.countDistinct("p_name").alias("n_variants"),
            F.sum("cents").alias("sum_cents"),
            F.min("p_partkey").alias("survivor_key"),
        )
        .select(
            "canonical",
            "n_records",
            "n_variants",
            F.round(
                F.col("sum_cents") * F.lit(10000.0) / F.col("n_records")
            )
            .cast("bigint")
            .alias("avg_price_micro"),
            "survivor_key",
        )
    )


ORACLE_ER_RESOLVED_ROLLUP = f"""
WITH dic AS (SELECT name, canonical FROM ({ORACLE_ER_CLUSTERS}) c),
agg AS (
  SELECT dic.canonical AS canonical,
         COUNT(*) AS n_records,
         COUNT(DISTINCT p.p_name) AS n_variants,
         SUM(TRY_CAST(ROUND(p.p_retailprice * 100) AS BIGINT)) AS sum_cents,
         MIN(p.p_partkey) AS survivor_key
  FROM part p JOIN dic ON p.p_name = dic.name
  GROUP BY dic.canonical
)
SELECT canonical, n_records, n_variants,
       CAST(ROUND(sum_cents * 10000.0 / n_records) AS BIGINT)
         AS avg_price_micro,
       survivor_key
FROM agg
"""


QUERIES = {
    "er_blocking_pairs": q_er_blocking_pairs,
    "er_match_pairs": q_er_match_pairs,
    "er_clusters": q_er_clusters,
    "er_resolved_rollup": q_er_resolved_rollup,
}

ORACLES = {
    "er_blocking_pairs": ORACLE_ER_BLOCKING_PAIRS,
    "er_match_pairs": ORACLE_ER_MATCH_PAIRS,
    "er_clusters": ORACLE_ER_CLUSTERS,
    "er_resolved_rollup": ORACLE_ER_RESOLVED_ROLLUP,
}
