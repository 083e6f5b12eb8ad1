"""Scalar-function library operators (SURVEY.md §2.C — the categories
the reference LACKS: date/time and math scalar functions beyond ceil,
array functions, randomness/ID functions B16).

Each query exercises a function family over the fixture tables with a
full SQL oracle. All pure Column expressions (whole-stage codegen)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table


def q_datetime_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family: extract fields, offsets, diffs,
    truncation, boundaries (reference has none — only Go-side
    time.Now formatting, `cmd/root.go:123`)."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.dayofweek("o_orderdate").alias("dow"),
        F.dayofyear("o_orderdate").alias("doy"),
        F.quarter("o_orderdate").alias("q"),
        F.weekofyear("o_orderdate").alias("woy"),
        F.date_add(d, 30).alias("plus30"),
        F.datediff(F.lit("2002-01-01").cast("date"), d).alias("days_to_2002"),
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.last_day(d).alias("month_end"),
        # tz-free epoch (column may arrive TIMESTAMP or TIMESTAMP_NTZ
        # depending on the session's inferTimestampNTZ; values are
        # midnight-aligned so day arithmetic is exact either way)
        (
            F.datediff(d, F.lit("1970-01-01").cast("date")).cast("long")
            * F.lit(86_400_000_000)
        ).alias("epoch_us"),
    )


ORACLE_DATETIME_FUNCS = """
SELECT o_orderkey,
  EXTRACT(year FROM o_orderdate)::INT AS y,
  EXTRACT(month FROM o_orderdate)::INT AS m,
  EXTRACT(day FROM o_orderdate)::INT AS dom,
  (dayofweek(o_orderdate) + 1)::INT AS dow,
  dayofyear(o_orderdate)::INT AS doy,
  quarter(o_orderdate)::INT AS q,
  weekofyear(o_orderdate)::INT AS woy,
  (CAST(o_orderdate AS DATE) + INTERVAL 30 DAY)::DATE AS plus30,
  datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')::INT
    AS days_to_2002,
  CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
  last_day(CAST(o_orderdate AS DATE)) AS month_end,
  epoch_us(o_orderdate) AS epoch_us
FROM orders
"""


def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family: abs/mod/floor/ceil/round/sqrt/sign/
    greatest/least. sqrt is IEEE-correctly-rounded (cross-engine exact);
    non-correctly-rounded transcendentals (pow/exp/ln) are exercised on
    integer-exact cases only."""
    o = load_table(spark, sf_dir, "orders")
    tp = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(F.col("o_custkey") - 750).alias("abs_dist"),
        F.pmod(F.col("o_orderkey"), F.lit(7)).alias("mod7"),
        # try_cast: floor/ceil of a non-finite price must degrade to
        # NULL, not raise ANSI CAST_INVALID_INPUT (r13 review finding)
        F.floor(tp).try_cast("long").alias("floor_tp"),
        F.ceil(tp).try_cast("long").alias("ceil_tp"),
        F.round(tp, 1).alias("round_tp1"),
        F.sqrt(F.col("o_orderkey").cast("double")).alias("sqrt_key"),
        F.signum(tp - 10000.0).try_cast("int").alias("sign_vs_10k"),
        F.greatest(F.col("o_custkey"), F.lit(100).cast("long")).alias("greatest_100"),
        F.least(F.col("o_custkey"), F.lit(100).cast("long")).alias("least_100"),
        F.pow(F.lit(2.0), (F.col("o_orderkey") % 10).cast("double")).alias(
            "pow2"
        ),
    )


ORACLE_MATH_FUNCS = """
SELECT o_orderkey,
  abs(o_custkey - 750) AS abs_dist,
  o_orderkey % 7 AS mod7,
  TRY_CAST(floor(o_totalprice) AS BIGINT) AS floor_tp,
  TRY_CAST(ceil(o_totalprice) AS BIGINT) AS ceil_tp,
  round(o_totalprice, 1) AS round_tp1,
  sqrt(CAST(o_orderkey AS DOUBLE)) AS sqrt_key,
  TRY_CAST(sign(o_totalprice - 10000.0) AS INT) AS sign_vs_10k,
  greatest(o_custkey, 100) AS greatest_100,
  least(o_custkey, 100) AS least_100,
  pow(2.0, CAST(o_orderkey % 10 AS DOUBLE)) AS pow2
FROM orders
"""


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family over the embedding column (§2.C: absent in
    reference; ArrayType enters via the extension surface)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    # Array-valued outputs are unpacked to fixed-position scalar columns:
    # array cells crash the driver's canonicalizer (VERDICT r01), and
    # keeping the elements as floats (not strings) preserves the exact
    # float32 value compare.
    # Spark sort_array is NULLS FIRST; pin DuckDB's list_sort to the
    # same order (its default is NULLS LAST) so a NULL component in
    # the head slice sorts identically (r13 review finding)
    s4 = F.sort_array(F.slice(emb, 1, 4))
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        *[F.element_at(emb, i).alias(f"h4_{i}") for i in (1, 2, 3, 4)],
        F.element_at(emb, 3).alias("third"),
        *[F.element_at(s4, i).alias(f"h4s_{i}") for i in (1, 2, 3, 4)],
        F.array_max(emb).alias("vmax"),
        F.array_min(emb).alias("vmin"),
        F.array_position(emb, F.array_max(emb)).cast("long").alias(
            "argmax_1based"
        ),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_positive"),
        *[
            F.element_at(F.reverse(F.slice(emb, 1, 3)), i).alias(f"h3r_{i}")
            for i in (1, 2, 3)
        ],
    )


ORACLE_ARRAY_FUNCS = """
SELECT vec_id,
  len(embedding)::INT AS dim,
  embedding[1] AS h4_1, embedding[2] AS h4_2,
  embedding[3] AS h4_3, embedding[4] AS h4_4,
  embedding[3] AS third,
  list_sort(embedding[1:4], 'ASC', 'NULLS FIRST')[1] AS h4s_1,
  list_sort(embedding[1:4], 'ASC', 'NULLS FIRST')[2] AS h4s_2,
  list_sort(embedding[1:4], 'ASC', 'NULLS FIRST')[3] AS h4s_3,
  list_sort(embedding[1:4], 'ASC', 'NULLS FIRST')[4] AS h4s_4,
  list_max(embedding) AS vmax,
  list_min(embedding) AS vmin,
  CAST(list_position(embedding, list_max(embedding)) AS BIGINT)
    AS argmax_1based,
  len(list_filter(embedding, x -> x > 0))::INT AS n_positive,
  list_reverse(embedding[1:3])[1] AS h3r_1,
  list_reverse(embedding[1:3])[2] AS h3r_2,
  list_reverse(embedding[1:3])[3] AS h3r_3
FROM embeddings
"""


def q_sequence_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19: sequence assignment at materialization time — row_number
    over the PK order + START offset, the engine-side analog of the
    reference's `create sequence … start <Auto_increment>` + nextval
    (`cmd/tablemeta.go:162`). Partitioned path would use
    plans.pagination.global_row_number; here the oracle needs the exact
    total order."""
    from pyspark.sql import Window

    start = 1001
    n = load_table(spark, sf_dir, "nation")
    w = Window.orderBy("n_nationkey")
    return n.select(
        "n_nationkey",
        (F.row_number().over(w) + F.lit(start - 1)).alias("seq_val"),
    )


ORACLE_SEQUENCE_SEMANTICS = """
SELECT n_nationkey,
       ROW_NUMBER() OVER (ORDER BY n_nationkey) + 1000 AS seq_val
FROM nation
"""


def q_random_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B16: uuid() / md5(rand()) / monotonically_increasing_id — the
    reference's unique-index-name generators (`cmd/tablemeta.go:215,217`).
    Nondeterministic by nature → rows-only check; the test asserts
    uniqueness and shape instead of values."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.expr("uuid()").alias("uid"),
        F.substring(F.md5(F.rand(seed=42).cast("string")), 1, 8).alias(
            "rand8"
        ),
        F.monotonically_increasing_id().alias("mono_id"),
    )


def q_random_ids_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic driver gate for the RNG/ID generators: the VALUES
    are nondeterministic by nature (rows-only on `random_ids`), but the
    generator CONTRACTS are exact booleans — uuid() and
    monotonically_increasing_id() must be collision-free over the
    table, rand-derived ids must be 8 lowercase hex chars, uuids must
    be RFC-4122 v4 shaped. One aggregation over the generated frame;
    the oracle pins the row count and all-true flags."""
    ids = q_random_ids(spark, sf_dir)
    n = F.count("*")
    uuid_re = (
        "^[0-9a-f]{8}-[0-9a-f]{4}-4[0-9a-f]{3}-[89ab][0-9a-f]{3}"
        "-[0-9a-f]{12}$"
    )
    return ids.agg(
        n.cast("long").alias("n_rows"),
        (F.countDistinct("uid") == n).alias("uuids_unique"),
        (F.countDistinct("mono_id") == n).alias("mono_unique"),
        (F.sum(F.col("rand8").rlike("^[0-9a-f]{8}$").cast("long")) == n).alias(
            "rand8_hex"
        ),
        (F.sum(F.col("uid").rlike(uuid_re).cast("long")) == n).alias(
            "uuid_v4_format"
        ),
    )


ORACLE_RANDOM_IDS_CHECK = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       TRUE AS uuids_unique,
       TRUE AS mono_unique,
       TRUE AS rand8_hex,
       TRUE AS uuid_v4_format
FROM part
"""


def q_lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral flatten family: posexplode (with ordinality) over an
    array slice, and explode_outer preserving rows whose array is empty
    (the [NULL]-substitution trick spelled identically in the oracle).
    At scale explode is a narrow op — rows fan out within the partition,
    no shuffle."""
    e = load_table(spark, sf_dir, "embeddings")
    head = F.slice(F.col("embedding"), 1, 8)
    pos_part = e.select(
        "vec_id", F.posexplode(head).alias("pos0", "val")
    ).select(
        "vec_id",
        (F.col("pos0") + 1).cast("long").alias("pos"),
        "val",
        F.lit("posexplode").alias("op"),
    )
    big = F.filter(F.col("embedding"), lambda x: x > 0.15)
    outer_part = e.select(
        "vec_id", F.explode_outer(big).alias("val")
    ).select(
        "vec_id",
        F.lit(0).cast("long").alias("pos"),
        "val",
        F.lit("explode_outer").alias("op"),
    )
    return pos_part.unionByName(outer_part)


ORACLE_LATERAL_EXPLODE = """
SELECT vec_id,
       unnest(range(1, len(embedding[1:8]) + 1)) AS pos,
       unnest(embedding[1:8]) AS val,
       'posexplode' AS op
FROM embeddings
UNION ALL
SELECT vec_id,
       CAST(0 AS BIGINT) AS pos,
       -- embedding IS NULL: Spark's explode_outer(NULL) emits one
       -- NULL-val row; len(NULL) = NULL skips the =0 branch, so the
       -- NULL case must be caught explicitly (r13 review finding)
       unnest(CASE WHEN embedding IS NULL
                    OR len(list_filter(embedding, x -> x > 0.15)) = 0
                   THEN [NULL]
                   ELSE list_filter(embedding, x -> x > 0.15) END) AS val,
       'explode_outer' AS op
FROM embeddings
"""


def q_regex_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex function family over customer names (`Customer#000000001`
    shape): group extraction, extract-all, count, replace, boolean
    match — all JVM-side regex (B15 extended; the reference only does
    Go-side strings.ReplaceAll)."""
    c = load_table(spark, sf_dir, "customer")
    name = F.col("c_name")
    return c.select(
        "c_custkey",
        F.regexp_extract(name, r"#(\d+)", 1).alias("id_str"),
        F.regexp_extract(name, r"^([A-Za-z]+)#", 1).alias("prefix"),
        F.regexp_count(name, F.lit(r"0")).alias("n_zeros"),
        F.regexp_replace(name, r"0+", "0").alias("squeezed"),
        name.rlike(r"^Customer#\d{9}$").alias("well_formed"),
        F.array_join(
            F.regexp_extract_all(name, F.lit(r"(\d)"), F.lit(1)), ""
        ).alias("digits"),
    )


ORACLE_REGEX_FUNCS = r"""
SELECT c_custkey,
  regexp_extract(c_name, '#(\d+)', 1) AS id_str,
  regexp_extract(c_name, '^([A-Za-z]+)#', 1) AS prefix,
  len(regexp_extract_all(c_name, '0'))::INT AS n_zeros,
  regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
  regexp_full_match(c_name, 'Customer#\d{9}') AS well_formed,
  list_aggregate(regexp_extract_all(c_name, '(\d)', 1), 'string_agg', '')
    AS digits
FROM customer
"""


def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map function family: per-priority map of status→count built with
    map_from_entries over a collected (sorted) entry list, then read
    back via map_keys/element_at and re-exploded. Output is exploded
    rows (map-valued outputs don't hash portably across engines; the
    map type is exercised, the contract stays row-shaped)."""
    orders = load_table(spark, sf_dir, "orders")
    # a NULL status would become a NULL MAP KEY — illegal in Spark SQL
    # (NULL_MAP_KEY) and undefined across engines; exclude it
    # explicitly on BOTH sides (mirrored in the oracle) so a corpus
    # with missing statuses degrades instead of failing the job
    per = (
        orders.filter(F.col("o_orderstatus").isNotNull())
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    mapped = per.groupBy("o_orderpriority").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("o_orderstatus", "n")))
        ).alias("m")
    )
    return (
        mapped.select(
            "o_orderpriority",
            "m",
            F.size("m").alias("n_statuses"),
            F.element_at(F.col("m"), "O").alias("n_open"),
            F.explode(F.map_keys("m")).alias("status"),
        )
        .withColumn(
            "status_count", F.element_at(F.col("m"), F.col("status"))
        )
        .drop("m")
    )


ORACLE_MAP_FUNCS = """
WITH per AS (
  SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n
  FROM orders WHERE o_orderstatus IS NOT NULL GROUP BY 1, 2
),
agg AS (
  SELECT o_orderpriority,
         COUNT(*) AS n_statuses,
         MAX(CASE WHEN o_orderstatus = 'O' THEN n END) AS n_open
  FROM per GROUP BY o_orderpriority
)
SELECT a.o_orderpriority, a.n_statuses, a.n_open,
       p.o_orderstatus AS status, p.n AS status_count
FROM agg a JOIN per p USING (o_orderpriority)
"""


QUERIES = {
    "datetime_funcs": q_datetime_funcs,
    "map_funcs": q_map_funcs,
    "regex_funcs": q_regex_funcs,
    "math_funcs": q_math_funcs,
    "array_funcs": q_array_funcs,
    "lateral_explode": q_lateral_explode,
    "sequence_semantics": q_sequence_semantics,
    "random_ids": q_random_ids,
    "random_ids_check": q_random_ids_check,
}

ORACLES = {
    "datetime_funcs": ORACLE_DATETIME_FUNCS,
    "map_funcs": ORACLE_MAP_FUNCS,
    "regex_funcs": ORACLE_REGEX_FUNCS,
    "math_funcs": ORACLE_MATH_FUNCS,
    "array_funcs": ORACLE_ARRAY_FUNCS,
    "lateral_explode": ORACLE_LATERAL_EXPLODE,
    "sequence_semantics": ORACLE_SEQUENCE_SEMANTICS,
    # random_ids: rows-only (nondeterministic values by design); its
    # *_check twin gates the uniqueness/format contract exactly
    "random_ids_check": ORACLE_RANDOM_IDS_CHECK,
}
