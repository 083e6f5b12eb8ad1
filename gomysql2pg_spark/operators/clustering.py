"""Distributed k-means building blocks on `embeddings` (SURVEY.md §2.F).

One Lloyd iteration decomposed into its two distributable halves — the
pattern every 100 TB embedding-clustering job (IVF index training,
SemDeDup coarse clustering, corpus topic bucketing) is built from:

- **Assignment** (`kmeans_assign`): centroids are tiny (k × dim) and
  BROADCAST; the corpus is scanned once, each vector scored against k
  centroids with an exact sequential double fold (bit-identical to the
  DuckDB oracle — same convention as operators/similarity.py). No
  shuffle of the big side at all; argmin via a per-vector
  min-by-struct, not a window, so the plan is a single map stage.
- **Update** (`kmeans_update`): emits per-(centroid, dimension)
  sufficient statistics (Σx as exact scaled bigints, n) with map-side
  partial aggregation — the tree-aggregate M-step. Means are NOT
  divided out: sums of scaled integers are associative and therefore
  bit-identical under any partitioning/AQE re-plan, while a double mean
  would be order-dependent. The driver of an iterative fit divides
  s_scaled/n/1e6 locally (k × dim doubles — trivially small).

The reference has no clustering surface (SURVEY.md §2.C); this extends
the BASELINE.json north-star set (similarity search / dedup) with the
training step those operators assume exists.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

K_CENTROIDS = 8  # seed centroids = the k smallest vec_ids (deterministic)
COMPONENT_SCALE = 1_000_000  # exact micro-unit integer space for Σx


def _sq_dist(a, b):
    """Exact-order squared L2 distance of two float arrays.

    The identical expression tree to the oracle's
    list_reduce(list_prepend(0.0, list_transform(list_zip(...)))) —
    a strict left fold of (x-y)² in element order, so the double is
    bit-identical across engines (same convention as dedup.dot_double,
    driver-verified on similarity_topk/ivf)."""
    return F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: (x.cast("double") - y.cast("double"))
            * (x.cast("double") - y.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _centroid_scores(emb: DataFrame) -> DataFrame:
    """(vec_id, cid, dist2): every vector scored against every seed
    centroid — the broadcast-join fan-out shared by assignment and
    coreset selection."""
    cent = emb.filter(F.col("vec_id") < K_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("ce")
    )
    return emb.join(F.broadcast(cent)).select(
        "vec_id",
        "cid",
        _sq_dist(F.col("embedding"), F.col("ce")).alias("dist2"),
    )


def _assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, cid, dist2): nearest seed centroid per vector.

    Centroids (k rows) broadcast against the corpus; per-vector argmin
    via min(struct(dist2, cid)) — one wide map + a k-way per-row
    reduce inside the join projection, grouped per vector. The groupBy
    on vec_id aggregates k rows per vector; at scale the broadcast
    join's output is (n·k) narrow rows with map-side partial min, so
    the shuffle carries one struct per vector."""
    scored = _centroid_scores(load_table(spark, sf_dir, "embeddings"))
    # leading null-flag key pins NULL dist2 (NULL/length-mismatched
    # embedding) to sort LAST on both engines: Spark struct-min is
    # nulls-FIRST, the oracle's ROW_NUMBER default is nulls-LAST —
    # without the flag a poisoned centroid would win every Spark
    # assignment and lose every oracle one (r13 review finding)
    best = (
        scored.groupBy("vec_id")
        .agg(
            F.min(
                F.struct(
                    F.col("dist2").isNull().cast("int").alias("nl"),
                    "dist2",
                    "cid",
                )
            ).alias("m")
        )
        .select(
            "vec_id",
            F.col("m.cid").alias("cid"),
            F.col("m.dist2").alias("dist2"),
        )
    )
    return best


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E-step: nearest-centroid assignment for every vector."""
    return _assignments(spark, sf_dir)


ORACLE_KMEANS_ASSIGN = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings
  WHERE vec_id < {K_CENTROIDS}
),
scored AS (
  SELECT e.vec_id, c.cid,
    list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(list_zip(e.embedding::DOUBLE[], c.ce::DOUBLE[]),
                       s -> (s[1] - s[2]) * (s[1] - s[2]))),
      (acc, x) -> acc + x) AS dist2
  FROM embeddings e CROSS JOIN cent c
),
ranked AS (
  SELECT vec_id, cid, dist2,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY (dist2 IS NULL), dist2, cid) AS rn
  FROM scored
)
SELECT vec_id, cid, dist2 FROM ranked WHERE rn = 1
"""


def q_kmeans_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M-step sufficient statistics: per (centroid, dimension) the
    exact scaled component sum and member count.

    posexplode fans each vector into (pos, x) rows; the groupBy
    (cid, pos) aggregation is map-side-combinable, so the shuffle
    carries k × dim partials per map task regardless of corpus size —
    the tree-aggregate shape. Component sums are exact bigints
    (ROUND(x·1e6): the scaled double is the same IEEE value in every
    engine, integer sums are order-independent — see
    functions/numeric.py)."""
    best = _assignments(spark, sf_dir).select("vec_id", "cid")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    comp = emb.join(best, "vec_id").select(
        "cid", F.posexplode("embedding").alias("pos", "x")
    )
    return (
        comp.groupBy("cid", F.col("pos").cast("long").alias("pos"))
        .agg(
            F.sum(
                F.round(F.col("x").cast("double") * COMPONENT_SCALE).cast(
                    "long"
                )
            ).alias("s_scaled"),
            F.count("*").alias("n"),
        )
    )


ORACLE_KMEANS_UPDATE = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings
  WHERE vec_id < {K_CENTROIDS}
),
scored AS (
  SELECT e.vec_id, c.cid,
    list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(list_zip(e.embedding::DOUBLE[], c.ce::DOUBLE[]),
                       s -> (s[1] - s[2]) * (s[1] - s[2]))),
      (acc, x) -> acc + x) AS dist2
  FROM embeddings e CROSS JOIN cent c
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           ROW_NUMBER() OVER (PARTITION BY vec_id
                              ORDER BY (dist2 IS NULL), dist2, cid) AS rn
    FROM scored) WHERE rn = 1
),
comp AS (
  SELECT a.cid,
         CAST(unnest(range(len(e.embedding))) AS BIGINT) AS pos,
         unnest(e.embedding::DOUBLE[]) AS x
  FROM embeddings e JOIN assign a USING (vec_id)
)
SELECT cid, pos,
  CAST(SUM(CAST(ROUND(x * {COMPONENT_SCALE}) AS BIGINT)) AS BIGINT)
    AS s_scaled,
  CAST(COUNT(*) AS BIGINT) AS n
FROM comp
GROUP BY cid, pos
"""


# ----------------------------------------------- margin-based coreset
#
# Round-7 addition: coreset selection by decision-boundary margin.
# Data-pruning work (e.g. "Beyond neural scaling laws", Sorscher et
# al. 2022) keeps the HARDEST examples — the ones closest to a
# cluster boundary, where margin = d²(2nd-nearest) − d²(nearest) is
# smallest — and drops the easy prototypical interior. This is the
# distributed form: the margin needs only the best-two of the k
# broadcast centroid distances, computed per vector with a bounded
# collect_list(k structs) + array_sort (k is tiny and fixed — never a
# corpus-sized window), and the per-cluster top-M pick is a window
# PARTITIONED BY centroid, which parallelizes across clusters.

CORESET_PER_CLUSTER = 20  # hardest examples kept per cluster


def q_coreset_margin_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hardest-example coreset: per cluster, the CORESET_PER_CLUSTER
    vectors with the smallest (d²₂ − d²₁) margin, rank included.
    Distances reuse the exact sequential fold (`_sq_dist`), so the
    margin doubles are bit-identical across engines; ties break on
    vec_id."""
    scored = _centroid_scores(load_table(spark, sf_dir, "embeddings"))
    best2 = (
        scored.groupBy("vec_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("dist2").isNull().cast("int").alias("nl"),
                        "dist2",
                        "cid",
                    )
                )
            ).alias("ranked")
        )
        .select(
            "vec_id",
            F.col("ranked")[0]["cid"].alias("cid"),
            F.col("ranked")[0]["dist2"].alias("d1"),
            F.col("ranked")[1]["dist2"].alias("d2"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("cid").orderBy(
        (F.col("d2") - F.col("d1")).asc_nulls_last(),
        F.col("vec_id").asc(),
    )
    return (
        best2.withColumn("rank_in_cluster", F.row_number().over(w))
        .filter(F.col("rank_in_cluster") <= CORESET_PER_CLUSTER)
        .select(
            "cid",
            "vec_id",
            F.round((F.col("d2") - F.col("d1")) * 1e6)
            .cast("bigint")
            .alias("margin_micro"),
            "rank_in_cluster",
        )
    )


ORACLE_CORESET_MARGIN = f"""
WITH cent AS (
  SELECT vec_id AS cid, embedding AS ce FROM embeddings
  WHERE vec_id < {K_CENTROIDS}
),
scored AS (
  SELECT e.vec_id, c.cid,
    list_reduce(
      list_prepend(CAST(0.0 AS DOUBLE),
        list_transform(list_zip(e.embedding::DOUBLE[], c.ce::DOUBLE[]),
                       s -> (s[1] - s[2]) * (s[1] - s[2]))),
      (acc, x) -> acc + x) AS dist2
  FROM embeddings e CROSS JOIN cent c
),
ranked AS (
  SELECT vec_id, cid, dist2,
         ROW_NUMBER() OVER (PARTITION BY vec_id
                            ORDER BY (dist2 IS NULL), dist2, cid) AS rn
  FROM scored
),
best2 AS (
  SELECT r1.vec_id, r1.cid, r1.dist2 AS d1, r2.dist2 AS d2
  FROM ranked r1 JOIN ranked r2
    ON r1.vec_id = r2.vec_id AND r1.rn = 1 AND r2.rn = 2
),
sel AS (
  SELECT cid, vec_id, d2 - d1 AS margin,
         ROW_NUMBER() OVER (PARTITION BY cid
                            ORDER BY (d2 - d1) NULLS LAST, vec_id)
                           AS rank_in_cluster
  FROM best2
)
SELECT cid, vec_id,
       CAST(ROUND(margin * 1e6) AS BIGINT) AS margin_micro,
       rank_in_cluster
FROM sel WHERE rank_in_cluster <= {CORESET_PER_CLUSTER}
"""


QUERIES = {
    "kmeans_assign": q_kmeans_assign,
    "kmeans_update": q_kmeans_update,
    "coreset_margin_select": q_coreset_margin_select,
}

ORACLES = {
    "kmeans_assign": ORACLE_KMEANS_ASSIGN,
    "kmeans_update": ORACLE_KMEANS_UPDATE,
    "coreset_margin_select": ORACLE_CORESET_MARGIN,
}
