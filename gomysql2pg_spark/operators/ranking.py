"""Text ranking operators: TF-IDF and BM25 — the retrieval-scoring
half of the text-analysis surface (SURVEY.md §2.D C4; a training-data
pipeline uses these for corpus weighting and query-based filtering).

Determinism discipline: term and document frequencies are exact
integers; scores are quantized to integer MICRO-UNITS
(round(score·1e6)) because ln() differs in the last ulp between the
JVM and C libm — the quantized integers are engine-stable and make the
rank ordering exact. No float SUM over variable-cardinality sets
anywhere — BM25 is emitted per (doc, term) component, and the TF-IDF
ranking orders by (score_micro, term), a total order.

Scale: one shuffle to build the postings (doc, term, tf); document
frequency is a second tiny aggregate joined back BY TERM (broadcast —
vocabulary ≪ corpus); top-k per doc is a window partitioned by doc.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table

TOP_TERMS = 3
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ["batch", "hash", "stream"]


def _postings(docs: DataFrame) -> DataFrame:
    """(doc_id, term, tf) exact term frequencies."""
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    return (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document. idf = ln((N+1)/(df+1)) over
    exact counts; rank ties broken by term for a total order."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    post = _postings(docs)
    dfreq = post.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    # quantize to micro-units: ln() differs in the last ulp between the
    # JVM and C libm, so the raw double is not cross-engine-stable; the
    # rounded integer is (and makes the rank ordering exact too)
    scored = post.join(F.broadcast(dfreq), "term").select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.round(
            F.col("tf").cast("double")
            * F.log(
                (F.lit(n_docs) + F.lit(1)).cast("double")
                / (F.col("df") + F.lit(1)).cast("double")
            )
            * F.lit(1_000_000.0)
        )
        .cast("long")
        .alias("tfidf_micro"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf_micro").desc(), F.col("term")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOP_TERMS)
        .select("doc_id", "rank", "term", "tf", "df", "tfidf_micro")
    )


ORACLE_TFIDF = r"""
WITH post AS (
  SELECT doc_id, w AS term, COUNT(*) AS tf FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
    FROM documents)
  GROUP BY doc_id, w
),
dfreq AS (
  SELECT term, COUNT(DISTINCT doc_id) AS df FROM post GROUP BY term
),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
scored AS (
  SELECT p.doc_id, p.term, p.tf, d.df,
         CAST(ROUND(CAST(p.tf AS DOUBLE)
           * LN(CAST(n_docs + 1 AS DOUBLE) / CAST(d.df + 1 AS DOUBLE))
           * 1000000.0) AS BIGINT) AS tfidf_micro
  FROM post p JOIN dfreq d USING (term) CROSS JOIN n
)
SELECT doc_id, rank, term, tf, df, tfidf_micro FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY tfidf_micro DESC, term) AS rank
  FROM scored
) WHERE rank <= 3
"""


def q_bm25_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 score component per (document, query-term) for a fixed
    3-term query — emitted per term (no float sum over a variable set)
    with the textbook saturation/length normalization:
    idf·tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    post = _postings(docs)
    dl = post.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    # SUM over zero rows is NULL; on an empty corpus the output frame
    # is empty regardless, so the constant only needs to stay finite
    total_terms = dl.agg(F.sum("dl")).first()[0] or 1
    post_q = post.filter(F.col("term").isin(BM25_QUERY))
    dfreq = post_q.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    joined = (
        post_q.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
    )
    tf = F.col("tf").cast("double")
    idf = F.log(
        (F.lit(n_docs - 0) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    # the SAME left-associated IEEE tree as the oracle's
    # `B * dl * n / tot` (((B*dl)*n)/tot): the previous
    # B*((dl*n)/tot) grouping could differ by an ulp and flip a .5
    # micro rounding boundary between engines (r13 review finding)
    bnorm = (
        F.lit(BM25_B)
        * F.col("dl").cast("double")
        * F.lit(float(n_docs))
        / F.lit(float(total_terms))
    )
    denom = tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + bnorm)
    return joined.select(
        "doc_id",
        "term",
        "tf",
        "df",
        "dl",
        F.round(idf * tf * F.lit(BM25_K1 + 1.0) / denom * F.lit(1_000_000.0))
        .cast("long")
        .alias("bm25_micro"),
    )


ORACLE_BM25 = rf"""
WITH post AS (
  SELECT doc_id, w AS term, COUNT(*) AS tf FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
    FROM documents)
  GROUP BY doc_id, w
),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id),
tot AS (SELECT SUM(dl) AS total_terms FROM dl),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
pq AS (SELECT * FROM post WHERE term IN ('batch', 'hash', 'stream')),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM pq GROUP BY term)
SELECT p.doc_id, p.term, p.tf, d.df, l.dl,
  CAST(ROUND(LN((CAST(n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5) + 1.0)
    * CAST(p.tf AS DOUBLE) * {BM25_K1 + 1.0}
    / (CAST(p.tf AS DOUBLE)
       + {BM25_K1} * ({1.0 - BM25_B}
                      + {BM25_B} * CAST(l.dl AS DOUBLE)
                        * CAST(n_docs AS DOUBLE)
                        / CAST(total_terms AS DOUBLE)))
    * 1000000.0) AS BIGINT) AS bm25_micro
FROM pq p
JOIN dfreq d USING (term)
JOIN dl l USING (doc_id)
CROSS JOIN n CROSS JOIN tot
"""


# ---------------------------------------------------------------------------
# vocabulary building + OOV scoring
# ---------------------------------------------------------------------------

VOCAB_N = 100  # ranked vocabulary size emitted by vocab_topk
OOV_VOCAB_N = 200  # in-vocabulary set used for the OOV-rate probe


def _alpha_tokens(docs: DataFrame) -> DataFrame:
    """(doc_id, token) lowercase alphabetic word occurrences."""
    return docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+"), 0)
        ).alias("token"),
    )


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked top-N vocabulary with contiguous ids — the tokenizer-prep
    pass of a training pipeline (word-level vocab, BPE seed alphabet,
    stopword candidates).

    One explode→groupBy shuffle builds exact type counts; the top-N is
    TakeOrdered (distributed partial top-k per partition, no global
    sort); only the N surviving rows pass through the id-assigning
    window, so the single-partition window is bounded by N regardless
    of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    agg = (
        _alpha_tokens(docs)
        .groupBy("token")
        .agg(
            F.count("*").alias("tf"),
            F.count_distinct("doc_id").alias("df"),
        )
    )
    top = agg.orderBy(F.col("tf").desc(), F.col("token")).limit(VOCAB_N)
    w = Window.orderBy(F.col("tf").desc(), F.col("token"))
    return top.withColumn(
        "vocab_id", F.row_number().over(w).cast("long")
    )


ORACLE_VOCAB_TOPK = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents
),
agg AS (
  SELECT token, CAST(COUNT(*) AS BIGINT) AS tf,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok GROUP BY token
)
SELECT token, tf, df,
       CAST(ROW_NUMBER() OVER (ORDER BY tf DESC, token) AS BIGINT)
         AS vocab_id
FROM agg
ORDER BY tf DESC, token
LIMIT {VOCAB_N}
"""


def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document out-of-vocabulary counts against the top-N
    vocabulary — the quality signal language filters and tokenizer
    audits use (high OOV ⇒ junk, wrong language, or encoding damage).

    The vocabulary is tiny and BROADCAST; the corpus-side token stream
    is probed by a broadcast hash join (no shuffle of the big side) and
    reduced per document with map-side partials. Documents with zero
    alphabetic tokens are preserved by the outer join with exact zero
    counts (degrade, not drop)."""
    docs = load_table(spark, sf_dir, "documents")
    tok = _alpha_tokens(docs)
    vocab = (
        tok.groupBy("token")
        .agg(F.count("*").alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token"))
        .limit(OOV_VOCAB_N)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    per = (
        tok.join(F.broadcast(vocab), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_alpha_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_oov"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_alpha_tokens", F.lit(0).cast("long")).alias(
                "n_alpha_tokens"
            ),
            F.coalesce("n_oov", F.lit(0).cast("long")).alias("n_oov"),
        )
    )


ORACLE_OOV_RATE = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents
),
vocab AS (
  SELECT token FROM (
    SELECT token, COUNT(*) AS tf FROM tok GROUP BY token
  ) ORDER BY tf DESC, token LIMIT {OOV_VOCAB_N}
),
per AS (
  SELECT t.doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_alpha_tokens,
         CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov
  FROM tok t LEFT JOIN vocab v USING (token)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(per.n_alpha_tokens, 0) AS n_alpha_tokens,
       COALESCE(per.n_oov, 0) AS n_oov
FROM documents d LEFT JOIN per USING (doc_id)
"""


def q_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram log-likelihood — the LM quality filter
    shape (CCNet-style: score each doc under a corpus language model,
    gate on the per-token likelihood). A real deployment swaps the
    self-trained unigram table for a reference-corpus table; the plan
    is identical.

    Determinism: ln() is quantized to integer micro-units ONCE per
    vocabulary type (tiny frame), so the per-doc score is a sum of
    exact bigints — order-independent under any partitioning. The
    scored vocabulary is BROADCAST; the corpus-side token stream never
    shuffles for the probe, only the per-doc reduce. Token-less
    documents survive with zero counts."""
    docs = load_table(spark, sf_dir, "documents")
    tok = _alpha_tokens(docs)
    uni = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    tot = tok.agg(F.count("*").alias("total"))
    lp = uni.crossJoin(F.broadcast(tot)).select(
        "token",
        F.round(
            F.log(
                F.col("cnt").cast("double") / F.col("total").cast("double")
            )
            * 1_000_000
        )
        .cast("long")
        .alias("logp_micro"),
    )
    per = (
        tok.join(F.broadcast(lp), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("logp_micro").alias("sum_logp_micro"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("sum_logp_micro", F.lit(0).cast("long")).alias(
                "sum_logp_micro"
            ),
        )
    )


ORACLE_UNIGRAM_LOGPROB = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents
),
uni AS (SELECT token, COUNT(*) AS cnt FROM tok GROUP BY token),
tot AS (SELECT COUNT(*) AS total FROM tok),
lp AS (
  SELECT token,
         CAST(ROUND(LN(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE))
                    * 1000000) AS BIGINT) AS logp_micro
  FROM uni, tot
),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(logp_micro) AS BIGINT) AS sum_logp_micro
  FROM tok JOIN lp USING (token)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(per.n_tokens, 0) AS n_tokens,
       COALESCE(per.sum_logp_micro, 0) AS sum_logp_micro
FROM documents d LEFT JOIN per USING (doc_id)
"""


def q_bigram_lm_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document add-1-smoothed BIGRAM log-likelihood — the CCNet /
    Gopher LM-filter shape one order up from `q_unigram_logprob`:
    P(w2|w1) = (c(w1,w2) + 1) / (ctx(w1) + V), scored over each doc's
    adjacent token pairs. A real deployment swaps the self-trained
    table for a reference-corpus model (KenLM-style); the plan is
    identical.

    Determinism: ln() is quantized to integer micro-units ONCE per
    bigram TYPE (vocabulary-sized frame), so the per-doc score is a
    sum of exact bigints — order-independent under any partitioning.
    Scale shape: the bigram stream is built in one pass (token array
    materialized through its own projection — lambda bodies
    re-evaluate outer expressions per element), counts/contexts are
    two partial-applied hash aggs over it, and the probe is an
    equi-join of the stream against the (w1,w2)-keyed prob table —
    co-partitioned at 100 TB, never a crossJoin; only V (one row)
    broadcasts unconditionally."""
    docs = load_table(spark, sf_dir, "documents")
    pre = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
    )
    from .text import bigram_index

    toks = F.col("toks")
    pairs = F.transform(
        bigram_index(toks),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ).alias("bigram"),
        ),
    )
    # persist + materialize: feeds the count aggs AND the per-doc
    # probe join — lazily each consumer would redo the explode (same
    # discipline as the shingle pipelines)
    big = pre.select(
        "doc_id", F.explode(pairs).alias("p")
    ).select("doc_id", "p.w1", "p.bigram").persist()
    big.count()
    c = big.groupBy("w1", "bigram").agg(F.count("*").alias("cnt"))
    ctx = c.groupBy("w1").agg(F.sum("cnt").alias("ctx_n"))
    vocab = pre.select(F.explode(toks).alias("t")).agg(
        F.countDistinct("t").alias("v")
    )
    bp = (
        c.join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            F.round(
                F.log(
                    (F.col("cnt") + 1).cast("double")
                    / (F.col("ctx_n") + F.col("v")).cast("double")
                )
                * 1_000_000
            )
            .cast("long")
            .alias("logp_micro"),
        )
    )
    per = (
        big.join(bp, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("logp_micro").alias("sum_logp_micro"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            F.coalesce("sum_logp_micro", F.lit(0).cast("long")).alias(
                "sum_logp_micro"
            ),
        )
    )


ORACLE_BIGRAM_LM_LOGPROB = r"""
WITH pre AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS l
  FROM documents
),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(l) - 1, 0) + 1),
                i -> struct_pack(w1 := l[i],
                                 bigram := l[i] || ' ' || l[i + 1]))) AS p
  FROM pre
),
bigf AS (SELECT doc_id, p.w1 AS w1, p.bigram AS bigram FROM big),
c AS (SELECT w1, bigram, COUNT(*) AS cnt FROM bigf GROUP BY w1, bigram),
ctx AS (SELECT w1, SUM(cnt) AS ctx_n FROM c GROUP BY w1),
vocab AS (
  SELECT COUNT(DISTINCT t) AS v
  FROM (SELECT unnest(l) AS t FROM pre)
),
bp AS (
  SELECT bigram,
         CAST(ROUND(LN(CAST(cnt + 1 AS DOUBLE)
                       / CAST(ctx_n + v AS DOUBLE)) * 1000000) AS BIGINT)
           AS logp_micro
  FROM c JOIN ctx USING (w1), vocab
),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(logp_micro) AS BIGINT) AS sum_logp_micro
  FROM bigf JOIN bp USING (bigram)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(per.n_bigrams, 0) AS n_bigrams,
       COALESCE(per.sum_logp_micro, 0) AS sum_logp_micro
FROM documents d LEFT JOIN per USING (doc_id)
"""


#: Kneser-Ney absolute discount (the standard 0.75; held as the exact
#: double 3/4 so both engines' arithmetic is bit-identical)
KN_DISCOUNT = 0.75

#: the per-bigram-type KN probability → integer micro log-prob, as ONE
#: SQL text shared verbatim by engine and oracle (the `_DATACARD_SQL`
#: discipline): interpolated KN = discounted MLE + back-off weight ×
#: continuation probability, every operand an exact integer count cast
#: to double, so the expression tree — and the rounded micro value —
#: cannot drift between engines.
_KN_LOGP_SQL = (
    "CAST(ROUND(LN("
    "GREATEST(CAST(cnt AS DOUBLE) - {d}, CAST(0 AS DOUBLE))"
    " / CAST(ctx_n AS DOUBLE)"
    " + {d} * CAST(n1f AS DOUBLE) / CAST(ctx_n AS DOUBLE)"
    " * (CAST(n1p AS DOUBLE) / CAST(types AS DOUBLE))"
    ") * 1000000) AS BIGINT)"
)


def q_kn_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document INTERPOLATED KNESER-NEY bigram log-likelihood
    (Kneser & Ney, ICASSP 1995; Chen & Goodman, CSL 1999 — the
    smoothing KenLM ships by default, one real step up from
    `bigram_lm_logprob`'s add-1):

        P_KN(w2|w1) = max(c(w1,w2) − d, 0) / c(w1·)
                      + d·N1+(w1·)/c(w1·) · N1+(·w2)/|bigram types|

    — the continuation probability ranks words by how many CONTEXTS
    they complete, not raw frequency (the 'San Francisco' effect:
    'Francisco' is frequent but follows only one word, so KN scores
    it low as a generic continuation). Scored over each doc's
    adjacent pairs from the self-trained table; a deployment swaps in
    a reference-corpus model, the plan is identical.

    Determinism: the KN probability is computed per bigram TYPE from
    five integer counts through ONE shared SQL expression
    (`_KN_LOGP_SQL`, identical text in engine and oracle), ln()
    quantized to micro-units once per type, per-doc score an exact
    bigint sum. Every scored bigram is seen (same-corpus training),
    so the discounted term is positive and ln() is defined.

    Scale shape: identical to `bigram_lm_logprob` — one bigram-stream
    pass (persisted: the stream feeds the count aggregates AND the
    returned per-doc probe join, the allowlisted shingle-pipeline
    discipline), three vocabulary-sized hash aggs (counts,
    left-contexts, right-continuations), a one-row types aggregate
    broadcast, and the stream-vs-model equi-join on the bigram key.
    The N1+ tables are BY-PRODUCTS of the count table — no extra
    corpus pass."""
    docs = load_table(spark, sf_dir, "documents")
    pre = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("toks"),
    )
    from .text import bigram_index

    toks = F.col("toks")
    pairs = F.transform(
        bigram_index(toks),
        lambda i: F.struct(
            F.element_at(toks, i).alias("w1"),
            F.element_at(toks, i + 1).alias("w2"),
            F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ).alias("bigram"),
        ),
    )
    big = (
        pre.select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", "p.w1", "p.w2", "p.bigram")
        .persist()
    )
    big.count()
    c = big.groupBy("w1", "w2", "bigram").agg(F.count("*").alias("cnt"))
    ctx = c.groupBy("w1").agg(
        F.sum("cnt").alias("ctx_n"), F.count("*").alias("n1f")
    )
    cont = c.groupBy("w2").agg(F.count("*").alias("n1p"))
    types = c.agg(F.count("*").alias("types"))
    bp = (
        c.join(ctx, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "bigram",
            F.expr(_KN_LOGP_SQL.format(d=KN_DISCOUNT)).alias(
                "logp_micro"
            ),
        )
    )
    per = (
        big.join(bp, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.sum("logp_micro").alias("sum_logp_micro"),
        )
    )
    out = (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0).cast("long")).alias(
                "n_bigrams"
            ),
            F.coalesce("sum_logp_micro", F.lit(0).cast("long")).alias(
                "sum_logp_micro"
            ),
        )
    )
    return out


ORACLE_KN_BIGRAM_LOGPROB = rf"""
WITH pre AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS l
  FROM documents
),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, greatest(len(l) - 1, 0) + 1),
                i -> struct_pack(w1 := l[i], w2 := l[i + 1],
                                 bigram := l[i] || ' ' || l[i + 1]))) AS p
  FROM pre
),
bigf AS (
  SELECT doc_id, p.w1 AS w1, p.w2 AS w2, p.bigram AS bigram FROM big
),
c AS (
  SELECT w1, w2, bigram, COUNT(*) AS cnt FROM bigf GROUP BY w1, w2, bigram
),
ctx AS (
  SELECT w1, SUM(cnt) AS ctx_n, COUNT(*) AS n1f FROM c GROUP BY w1
),
cont AS (SELECT w2, COUNT(*) AS n1p FROM c GROUP BY w2),
ty AS (SELECT COUNT(*) AS types FROM c),
bp AS (
  SELECT bigram, {_KN_LOGP_SQL.format(d=KN_DISCOUNT)} AS logp_micro
  FROM c JOIN ctx USING (w1) JOIN cont USING (w2), ty
),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(logp_micro) AS BIGINT) AS sum_logp_micro
  FROM bigf JOIN bp USING (bigram)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(per.n_bigrams, 0) AS n_bigrams,
       COALESCE(per.sum_logp_micro, 0) AS sum_logp_micro
FROM documents d LEFT JOIN per USING (doc_id)
"""


DSIR_TARGET_LANG = "en"  # the fixture's "target distribution" proxy


def q_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al., NeurIPS
    2023, simplified to word-unigram features): score every document
    by the log importance ratio between a TARGET language model
    (trained on the docs whose `lang` matches the target — a real
    deployment swaps in a Wikipedia/books reference corpus; the plan
    is identical) and the RAW-corpus model, then keep the documents
    more likely under the target than under the source. Both LMs use
    add-1 smoothing over the shared corpus vocabulary so every corpus
    token scores under both.

    Determinism: each LM's ln() is quantized to integer micro-units
    ONCE per vocabulary type (the `unigram_logprob` discipline), the
    per-token delta is a bigint difference, and the per-doc ratio is
    an exact bigint sum — order-independent under any partitioning.
    Selection is the stateless `logratio > 0` gate, so the operator
    needs NO global window or corpus sort: at 100 TB the scored
    vocabulary broadcasts, the token stream shuffles once for the
    per-doc reduce, and the gate is a projection."""
    docs = load_table(spark, sf_dir, "documents")
    tok = _alpha_tokens(docs)
    ttok = _alpha_tokens(docs.filter(F.col("lang") == DSIR_TARGET_LANG))
    uni_s = tok.groupBy("token").agg(F.count("*").alias("cs"))
    uni_t = ttok.groupBy("token").agg(F.count("*").alias("ct"))
    ns = tok.agg(F.count("*").alias("ns"))
    nt = ttok.agg(F.count("*").alias("nt"))
    v = tok.agg(F.countDistinct("token").alias("v"))

    def _lp_micro(cnt, total):
        return (
            F.round(
                F.log(
                    cnt.cast("double")
                    / (F.col("v") + total).cast("double")
                )
                * 1_000_000
            )
            .cast("long")
        )

    lm = (
        uni_s.join(uni_t, "token", "left")
        .crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(nt))
        .crossJoin(F.broadcast(v))
        .select(
            "token",
            (
                _lp_micro(F.coalesce("ct", F.lit(0)) + 1, F.col("nt"))
                - _lp_micro(F.col("cs") + 1, F.col("ns"))
            ).alias("delta_micro"),
        )
    )
    per = (
        tok.join(F.broadcast(lm), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("delta_micro").alias("logratio_micro"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias(
                "n_tokens"
            ),
            F.coalesce("logratio_micro", F.lit(0).cast("long")).alias(
                "logratio_micro"
            ),
            (
                F.coalesce("logratio_micro", F.lit(0).cast("long"))
                > 0
            ).alias("selected"),
        )
    )


ORACLE_DSIR_SELECT = f"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents
),
ttok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z]+')) AS token
  FROM documents WHERE lang = '{DSIR_TARGET_LANG}'
),
uni_s AS (SELECT token, COUNT(*) AS cs FROM tok GROUP BY token),
uni_t AS (SELECT token, COUNT(*) AS ct FROM ttok GROUP BY token),
ns AS (SELECT COUNT(*) AS ns FROM tok),
nt AS (SELECT COUNT(*) AS nt FROM ttok),
v AS (SELECT COUNT(DISTINCT token) AS v FROM tok),
lm AS (
  SELECT s.token,
         CAST(ROUND(LN(CAST(COALESCE(t.ct, 0) + 1 AS DOUBLE)
                       / CAST(v + nt AS DOUBLE)) * 1000000) AS BIGINT)
       - CAST(ROUND(LN(CAST(s.cs + 1 AS DOUBLE)
                       / CAST(v + ns AS DOUBLE)) * 1000000) AS BIGINT)
           AS delta_micro
  FROM uni_s s LEFT JOIN uni_t t USING (token), ns, nt, v
),
per AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(delta_micro) AS BIGINT) AS logratio_micro
  FROM tok JOIN lm USING (token)
  GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(per.n_tokens, 0) AS n_tokens,
       COALESCE(per.logratio_micro, 0) AS logratio_micro,
       COALESCE(per.logratio_micro, 0) > 0 AS selected
FROM documents d LEFT JOIN per USING (doc_id)
"""


def q_ccnet_perplexity_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., LREC 2020):
    score every document under the corpus unigram LM
    (`q_unigram_logprob` — a real deployment swaps in a reference-
    corpus KenLM table; the plan is identical), then split EACH
    LANGUAGE into head/middle/tail terciles by per-token log-
    likelihood. CCNet keeps 'head' (and often 'middle') as the
    pretraining corpus; the per-(lang, bucket) rollup this returns is
    the decision table for that cut.

    Determinism across engines: the per-doc score is
    floor(sum_logp_micro / n_tokens) computed via ONE double division
    (exact-bigint micro sum, |sum| ≪ 2^53, so the double is the exact
    integer and both engines floor the identical quotient); tercile
    cutpoints are the values at EXPLICIT integer ranks ⌈n/3⌉ and
    ⌈2n/3⌉ of the per-language sorted scores — NOT `percentile_disc`,
    whose engines disagree exactly at k/n == fraction boundaries
    (measured: Spark and DuckDB split a 75-doc language 24/26 vs
    25/25 at 2/3). The value at sorted position k is well-defined
    under any tie permutation, so ROW_NUMBER ordered by the value
    alone is safe. Token-less docs land in an explicit 'empty' bucket
    instead of poisoning the cuts.

    Plan at 100 TB: the LM probe is the unigram_logprob plan
    (broadcast scored vocabulary, one per-doc reduce), the cutpoint
    frame is |langs|×2 values (broadcast), and the bucket label is a
    stateless CASE — no corpus shuffle beyond the per-doc reduce."""
    per = q_unigram_logprob(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    scored = docs.join(per, "doc_id").select(
        "lang",
        F.expr(
            "CASE WHEN n_tokens > 0 THEN CAST(FLOOR("
            "CAST(sum_logp_micro AS DOUBLE) / n_tokens) AS BIGINT) END"
        ).alias("avg_logp_micro"),
    )
    scored.createOrReplaceTempView("_ccnet_scored")
    return spark.sql(_CCNET_BUCKET_SQL.format(scored="_ccnet_scored"))


# shared verbatim by the engine (over the temp view) and the oracle
# (over the scored CTE): the bucket algebra cannot drift between them
_CCNET_BUCKET_SQL = """
WITH ranked AS (
  SELECT lang, avg_logp_micro,
         ROW_NUMBER() OVER (
           PARTITION BY lang ORDER BY avg_logp_micro) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM {scored} WHERE avg_logp_micro IS NOT NULL
),
cuts AS (
  SELECT lang,
         MAX(CASE WHEN rn = CAST(FLOOR((n + 2) / 3.0) AS BIGINT)
                  THEN avg_logp_micro END) AS c33,
         MAX(CASE WHEN rn = CAST(FLOOR((2 * n + 2) / 3.0) AS BIGINT)
                  THEN avg_logp_micro END) AS c67
  FROM ranked GROUP BY lang
)
SELECT s.lang,
       CASE WHEN s.avg_logp_micro IS NULL THEN 'empty'
            WHEN s.avg_logp_micro > c.c67 THEN 'head'
            WHEN s.avg_logp_micro > c.c33 THEN 'middle'
            ELSE 'tail' END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(COALESCE(s.avg_logp_micro, 0)) AS BIGINT)
         AS sum_avg_logp_micro
FROM {scored} s LEFT JOIN cuts c USING (lang)
GROUP BY 1, 2
"""


ORACLE_CCNET_BUCKETS = f"""
WITH per AS ({ORACLE_UNIGRAM_LOGPROB}),
scored AS (
  SELECT d.lang,
         CASE WHEN per.n_tokens > 0 THEN CAST(FLOOR(
           CAST(per.sum_logp_micro AS DOUBLE) / per.n_tokens) AS BIGINT)
         END AS avg_logp_micro
  FROM documents d JOIN per USING (doc_id)
)
{_CCNET_BUCKET_SQL.format(scored="scored").replace("WITH ranked", ", ranked", 1)}
"""


# ---------------------------------------------------------------------------
# multi-query BM25 retrieval (top-k documents per query)
# ---------------------------------------------------------------------------
#
# `q_bm25_components` emits per-(doc, term) scores for ONE query; this
# is the actual retrieval operator a data pipeline runs — a batch of
# queries, each returning its top-k ranked documents (mining
# supervision pairs, dataset search, RAG corpus probes). The float
# discipline survives because each per-term component is quantized to
# integer micros FIRST (the bm25_components association tree, verified
# cross-engine since r13) and the per-(query, doc) score is a SUM of
# those integers — order-independent, engine-exact.
BM25_TOPK_K = 10
BM25_QUERIES = {
    1: ("batch", "hash", "stream"),
    2: ("join", "merge", "sort"),
    3: ("vector", "window", "scan"),
    4: ("slow", "query", "filter"),
}

#: driver-side row cap for the bounded top-k drain: |queries| × K by
#: construction (the per-query WindowGroupLimit caps at K). A module
#: constant so the no-unbounded-collect lint can prove the bound at
#: lint time, and so a grown query set can never silently truncate
#: against a stale hardcoded limit (r16 review)
BM25_DRAIN_CAP = len(BM25_QUERIES) * BM25_TOPK_K


def _bm25_topk_ranked(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(ranked, stats_cache): the LAZY ranked top-k plan plus the
    persisted per-document statistics frame it reads. Split out of
    `q_bm25_topk` so the plan-shape gate (WindowGroupLimit, broadcast
    df/query map — tests/test_round15c_ops.py) can inspect the real
    retrieval plan even though the public operator drains it eagerly;
    callers of THIS helper own the cache and must release it.

    r17 optimization (guide §2.3 "aggregate before you shuffle" /
    §2.4 "remove shuffles outright"): the r15-r16 form shuffled the
    FULL (doc_id, term, tf) postings relation — the whole tokenized
    corpus crossing one exchange — only to derive (a) per-document
    lengths and (b) the term frequencies of the {n} fixed query
    terms, then joined `dl` back to the query-term postings with a
    SECOND doc-keyed shuffle join. Both are one doc-keyed aggregate:
    explode the tokens and groupBy(doc_id) with count(*) (= dl, every
    token counted exactly as the postings Σtf did) plus one
    conditional counter per query term. Map-side partial aggregation
    collapses the exploded tokens to ONE 13-integer row per document
    per map task, so the only corpus-scale exchange ships
    |docs| × 13 integers instead of the postings relation, and the
    dl join disappears (dl rides the same row as the tfs). The
    (doc_id, term, tf) rows the scorer consumes are melted back out
    of the counter columns (stateless explode, tf > 0 ⇔ a postings
    row existed), so every downstream integer — tf, dl, df,
    total_terms — is value-identical and the micro-quantized score
    tree is untouched (oracle stays hash-exact)."""
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    all_terms = sorted({t for ts in BM25_QUERIES.values() for t in ts})
    toks = docs.select(
        "doc_id",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("term"),
    )
    # ONE corpus-scale aggregate: dl = count(*) per doc (identical to
    # the postings' Σtf — every exploded token, empty strings
    # included), tf{i} = that document's count of query term i
    stats = (
        toks.groupBy("doc_id")
        .agg(
            F.count("*").alias("dl"),
            *[
                F.sum(
                    F.when(F.col("term") == t, F.lit(1)).otherwise(
                        F.lit(0)
                    )
                )
                .cast("long")
                .alias(f"tf{i}")
                for i, t in enumerate(all_terms)
            ],
        )
        .persist()
    )
    # the doc-stats cache feeds THREE branches (total_terms, dfreq,
    # the scored join) — persist + materialize so the corpus
    # tokenization runs once (same discipline as the r15 postings
    # cache, now over a 13-integer-per-doc frame instead of the
    # tokens-sized postings)
    total_terms = stats.agg(F.sum("dl")).first()[0] or 1
    # melt the counter columns back to (doc_id, dl, term, tf) rows —
    # tf > 0 exactly reproduces the query-term postings rows. The
    # doc_id IS NOT NULL filter reproduces two NULL semantics the
    # postings form got implicitly (hostile-fixture pin in
    # tests/test_round15c_ops.py): the old inner `dl` equi-join
    # dropped a NULL-doc_id posting from the scored side (NULL never
    # equi-matches), and countDistinct(doc_id) excluded NULL from df.
    # total_terms above intentionally still includes the NULL doc's
    # tokens — the old Σdl did too (group-by keeps a NULL group).
    post_q = (
        stats.select(
            "doc_id",
            "dl",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("term"),
                            F.col(f"tf{i}").alias("tf"),
                        )
                        for i, t in enumerate(all_terms)
                    ]
                )
            ).alias("p"),
        )
        .select("doc_id", "dl", "p.term", "p.tf")
        .filter((F.col("tf") > 0) & F.col("doc_id").isNotNull())
    )
    dfreq = post_q.groupBy("term").agg(
        F.count("*").cast("long").alias("df")
    )
    joined = post_q.join(F.broadcast(dfreq), "term")
    # the component expression below mirrors q_bm25_components
    # LITERALLY — same left-associated IEEE tree as the oracle's
    # `B * dl * n / tot` (r13 finding: any other grouping can differ
    # by an ulp and flip a .5 micro rounding boundary between engines)
    tf = F.col("tf").cast("double")
    idf = F.log(
        (F.lit(n_docs - 0) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    bnorm = (
        F.lit(BM25_B)
        * F.col("dl").cast("double")
        * F.lit(float(n_docs))
        / F.lit(float(total_terms))
    )
    denom = tf + F.lit(BM25_K1) * (F.lit(1.0 - BM25_B) + bnorm)
    comp = joined.select(
        "doc_id",
        "term",
        F.round(idf * tf * F.lit(BM25_K1 + 1.0) / denom * F.lit(1_000_000.0))
        .cast("long")
        .alias("bm25_micro"),
    )
    # 12-row literal query map, built JVM-side (range + generator, a
    # LocalTableScan — never applySchemaToPythonRDD; cf. _model_df)
    pairs = F.array(
        *[
            F.struct(F.lit(qid).alias("qid"), F.lit(t).alias("term"))
            for qid, ts in sorted(BM25_QUERIES.items())
            for t in ts
        ]
    )
    qterms = (
        spark.range(1)
        .select(F.explode(pairs).alias("p"))
        .select("p.qid", "p.term")
    )
    scored = (
        comp.join(F.broadcast(qterms), "term")
        .groupBy("qid", "doc_id")
        .agg(F.sum("bm25_micro").alias("score_micro"))
    )
    # asc_nulls_last pins the tie-break for a NULL doc_id (Spark's ASC
    # default is NULLS FIRST, DuckDB's is NULLS LAST — the exact
    # cross-engine divergence class the repo pins on every ranked
    # window; r15 review finding, hostile fixture in
    # tests/test_round15c_ops.py)
    w = Window.partitionBy("qid").orderBy(
        F.col("score_micro").desc(), F.col("doc_id").asc_nulls_last()
    )
    ranked = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOPK_K)
        .select("qid", "doc_id", "rank", "score_micro")
    )
    return ranked, stats


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{K} documents per query for a {Q}-query batch, ranked by
    BM25 (sum of integer micro-quantized per-term components; ties by
    doc_id). Scale shape (built in `_bm25_topk_ranked`, plan-gated):
    ONE doc-keyed 13-integer aggregate shuffle (r17: the postings
    relation never crosses an exchange — see the helper's docstring),
    document frequencies broadcast back by term, the 12-row query map
    broadcast, a combinable integer sum per (qid, doc), and a rank
    window per qid that Spark executes via WindowGroupLimit (partial
    top-k per map task before the exchange). The result is
    ≤ |queries|·K rows BY CONSTRUCTION (row_number ≤ K per qid), so
    it is drained eagerly through the sanctioned bounded-probe shape
    and the per-doc stats cache is RELEASED before returning (r16
    ADVICE: the r15 form returned a lazy frame over a persisted
    corpus-scale cache, pinning it for the session — the
    storage-memory-squatter class `lsh_recall_report`'s eager drain
    already fixed); the returned frame is a local literal rebuild of
    the drained rows (LocalTableScan, never
    applySchemaToPythonRDD)."""
    ranked, stats = _bm25_topk_ranked(spark, sf_dir)
    # bounded drain: ≤ BM25_DRAIN_CAP rows exist BY CONSTRUCTION (the
    # per-query WindowGroupLimit caps at K), so the limit is the
    # computed module constant, not a hardcoded number a grown query
    # set could silently truncate against under `python -O` (r16
    # review); the release is try/finally so a failed drain can't pin
    # the doc-stats cache for the session
    try:
        rows = ranked.limit(BM25_DRAIN_CAP).collect()
    finally:
        stats.unpersist()
    if not rows:
        return spark.createDataFrame(
            [], "qid int, doc_id bigint, rank int, score_micro bigint"
        )
    # ONE SQL string, not per-row Column literals: assembling 40
    # structs through the Column API costs hundreds of py4j round
    # trips (~1 s of driver time — the _cell_expr lesson; measured as
    # a 2.2x bench regression on this entry). All four fields are
    # integers, so the SQL literals are exact.
    ival = lambda v: "NULL" if v is None else str(int(v))  # noqa: E731
    structs = ",".join(
        f"named_struct('qid', CAST({ival(r.qid)} AS INT), "
        f"'doc_id', CAST({ival(r.doc_id)} AS BIGINT), "
        f"'rank', CAST({ival(r.rank)} AS INT), "
        f"'score_micro', CAST({ival(r.score_micro)} AS BIGINT))"
        for r in rows
    )
    return (
        spark.range(1)
        .select(F.explode(F.expr(f"array({structs})")).alias("p"))
        .select("p.qid", "p.doc_id", "p.rank", "p.score_micro")
    )


_BM25_QT_VALUES = ", ".join(
    f"({qid}, '{t}')"
    for qid, ts in sorted(BM25_QUERIES.items())
    for t in ts
)
_BM25_ALL_TERMS = ", ".join(
    f"'{t}'" for t in sorted({t for ts in BM25_QUERIES.values() for t in ts})
)

ORACLE_BM25_TOPK = rf"""
WITH post AS (
  SELECT doc_id, w AS term, COUNT(*) AS tf FROM (
    SELECT doc_id,
           unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
    FROM documents)
  GROUP BY doc_id, w
),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM post GROUP BY doc_id),
tot AS (SELECT SUM(dl) AS total_terms FROM dl),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
qt (qid, term) AS (VALUES {_BM25_QT_VALUES}),
pq AS (SELECT * FROM post WHERE term IN ({_BM25_ALL_TERMS})),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM pq GROUP BY term),
comp AS (
  SELECT p.doc_id, p.term,
    CAST(ROUND(LN((CAST(n_docs AS DOUBLE) - d.df + 0.5) / (d.df + 0.5) + 1.0)
      * CAST(p.tf AS DOUBLE) * {BM25_K1 + 1.0}
      / (CAST(p.tf AS DOUBLE)
         + {BM25_K1} * ({1.0 - BM25_B}
                        + {BM25_B} * CAST(l.dl AS DOUBLE)
                          * CAST(n_docs AS DOUBLE)
                          / CAST(total_terms AS DOUBLE)))
      * 1000000.0) AS BIGINT) AS bm25_micro
  FROM pq p
  JOIN dfreq d USING (term)
  JOIN dl l USING (doc_id)
  CROSS JOIN n CROSS JOIN tot
),
scored AS (
  SELECT qt.qid, c.doc_id,
         CAST(SUM(c.bm25_micro) AS BIGINT) AS score_micro
  FROM comp c JOIN qt USING (term)
  GROUP BY 1, 2
)
SELECT qid, doc_id, CAST(rank AS INT) AS rank, score_micro FROM (
  SELECT qid, doc_id, score_micro,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY score_micro DESC, doc_id ASC) AS rank
  FROM scored
) WHERE rank <= {BM25_TOPK_K}
"""


# ---------------------------------------------------------------------------
# hybrid retrieval fusion: reciprocal-rank fusion of BM25 and ANN
# ---------------------------------------------------------------------------
#
# Real retrieval pipelines run a lexical ranker AND a dense ranker and
# fuse the two ranked lists; reciprocal-rank fusion (Cormack, Clarke &
# Buettcher, SIGIR 2009 — public algorithm) is the standard
# score-free fusion: fused(d) = sum over lists of 1/(k0 + rank). The
# qid bridge rides the shared id space of the fixtures (doc_id ≡
# vec_id): BM25 query q in {1..Q} pairs with ANN query vector
# vec_id = (q-1)·QUERY_MOD, which is in the ANN query set by
# construction (vec_id % QUERY_MOD == 0).

RRF_K0 = 60  # the SIGIR'09 paper's constant
RRF_TOPK = 10


def q_retrieval_rrf(
    spark: SparkSession, sf_dir: str, ann_ivfpq: DataFrame | None = None
) -> DataFrame:
    """Hybrid retrieval: RRF fusion of `q_bm25_topk` (lexical) and
    `q_similarity_ivfpq` (dense IVFADC) per query. Integer-exact by
    construction: each list contributes floor(1e9 / (K0 + rank)) —
    integer division of positive operands, identical in Spark (`div`)
    and DuckDB (`//`) — and the fused score is a sum of those
    integers; ties break on doc_id. Composition-priced (VERDICT r15
    item 2): both component rankers run end-to-end — caching either
    would fake the fusion — and the fusion itself is ONE full-outer
    join of two k-bounded frames (≤ Q·K rows each) plus a re-rank
    window over ≤ Q·2K rows: no new corpus scan beyond the two
    components, so the operator inherits their 100 TB story
    unchanged. A doc ranked by only one list keeps the other
    contribution at 0 (the full-outer + coalesce shape).

    `ann_ivfpq` (r17): an optional pre-computed `q_similarity_ivfpq`
    frame. `q_retrieval_quality_report` consumes the IVFADC serving
    twice — once directly and once through this fusion — and in
    production both consumers read the SAME served ranking; passing
    the frame in lets the report persist one serving instead of
    executing the identical probe plan twice per invocation. Absent
    (the registry entry), the fusion computes its own serving —
    byte-identical output either way."""
    from .similarity import QUERY_MOD, q_similarity_ivfpq

    bm = q_bm25_topk(spark, sf_dir).select(
        "qid", "doc_id", F.col("rank").alias("bm25_rank")
    )
    n_q = len(BM25_QUERIES)
    if ann_ivfpq is None:
        ann_ivfpq = q_similarity_ivfpq(spark, sf_dir)
    ann = (
        ann_ivfpq
        .filter(F.col("qid") < n_q * QUERY_MOD)
        .select(
            (F.expr(f"CAST(qid div {QUERY_MOD} AS INT)") + F.lit(1)).alias(
                "qid"
            ),
            F.col("nid").alias("doc_id"),
            F.col("rank").alias("ann_rank"),
        )
    )
    j = bm.join(ann, ["qid", "doc_id"], "full_outer")
    fused = (
        F.coalesce(
            F.expr(f"1000000000 div ({RRF_K0} + bm25_rank)"), F.lit(0)
        )
        + F.coalesce(
            F.expr(f"1000000000 div ({RRF_K0} + ann_rank)"), F.lit(0)
        )
    ).cast("long")
    w = Window.partitionBy("qid").orderBy(
        F.col("fused_nano").desc(), F.col("doc_id").asc_nulls_last()
    )
    return (
        j.withColumn("fused_nano", fused)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= RRF_TOPK)
        .select(
            "qid", "doc_id", "bm25_rank", "ann_rank", "fused_nano", "rank"
        )
    )


def _oracle_retrieval_rrf() -> str:
    """Composes the two component oracles verbatim (CTE-for-CTE — the
    fusion definition can never drift from the published rankers)."""
    from .similarity import ORACLE_SIMILARITY_IVFPQ, QUERY_MOD

    n_q = len(BM25_QUERIES)
    return f"""
WITH bm AS (
  SELECT qid, doc_id, rank AS bm25_rank FROM ({ORACLE_BM25_TOPK})
),
ann0 AS (SELECT * FROM ({ORACLE_SIMILARITY_IVFPQ})),
ann AS (
  SELECT CAST(qid // {QUERY_MOD} AS INT) + 1 AS qid, nid AS doc_id,
         rank AS ann_rank
  FROM ann0 WHERE qid < {n_q * QUERY_MOD}
),
j AS (
  SELECT COALESCE(bm.qid, ann.qid) AS qid,
         COALESCE(bm.doc_id, ann.doc_id) AS doc_id,
         bm.bm25_rank, ann.ann_rank
  FROM bm FULL OUTER JOIN ann
    ON bm.qid = ann.qid AND bm.doc_id = ann.doc_id
),
f AS (
  SELECT qid, doc_id, bm25_rank, ann_rank,
         CAST(COALESCE(1000000000 // ({RRF_K0} + bm25_rank), 0)
            + COALESCE(1000000000 // ({RRF_K0} + ann_rank), 0) AS BIGINT)
           AS fused_nano
  FROM j
)
SELECT qid, doc_id, bm25_rank, ann_rank, fused_nano,
       CAST(rank AS INT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY fused_nano DESC, doc_id ASC) AS rank
  FROM f
) WHERE rank <= {RRF_TOPK}
"""


# ---------------------------------------------------------------------------
# retrieval rank-quality audit: nDCG@K of the served rankers vs truth
# ---------------------------------------------------------------------------
#
# The eval a retrieval deployment runs before switching rankers: rank
# quality of the ANN index and the hybrid fusion against the exact
# brute-force cosine truth, on the SHARED query set (the BM25-mapped
# ANN queries, so the comparison is apples-to-apples). Binary
# relevance (membership in the exact top-K), DCG position gains
# round(1e6 / log2(i+1)) precomputed ONCE in Python and embedded as
# INTEGER literals in both engines — no runtime log2, so the whole
# report is integer-exact (the same literal-table trick as the LSH
# hash planes).

NDCG_K = 5
_NDCG_GAIN = [
    round(1e6 / math.log2(i + 1)) for i in range(1, NDCG_K + 1)
]
_NDCG_PREFIX = [0] + [sum(_NDCG_GAIN[: i + 1]) for i in range(NDCG_K)]


def q_retrieval_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(ranker, n_queries, total_hits, mean_ndcg_milli) for the IVFADC
    index and the RRF hybrid against exact-cosine truth@{K}.
    Composition-priced: truth (brute force) AND both rankers run
    end-to-end. Queries a ranker misses entirely still count (zero
    nDCG) via the query-set × ranker base frame — a silent-miss
    ranker cannot inflate its mean. Per-query nDCG is
    (dcg·1000) div idcg with idcg looked up from the literal prefix
    table by truth size; the mean is a truncating integer division.
    At 100 TB the audit cost is its components' (the truth side is
    the deliberate quadratic, as in `q_ann_recall_report`); the
    report itself is two k-bounded joins and two tiny aggregates.

    r17 optimization (guide §2.4 — remove duplicated subtrees): the
    pre-r17 lazy plan embedded the IVFADC probe subtree TWICE (the
    direct nDCG branch and inside the RRF fusion) and the brute-force
    truth subtree twice (the semi-join and the idcg base), so every
    drain executed each of them twice. Both frames are k-bounded
    (≤ |queries|·K rows) servings, not corpus-scale state: persist
    each, reuse the single serving in both consumers — exactly what a
    deployment does, and each component still runs END-TO-END once
    per invocation, so the audit stays composition-priced — and drain
    the ≤2-row report eagerly (one row per ranker BY CONSTRUCTION)
    so both caches are RELEASED before returning (the persist-release
    discipline; the returned frame is a local literal rebuild)."""
    from .similarity import QUERY_MOD, q_similarity_ivfpq, q_similarity_topk

    n_q = len(BM25_QUERIES)
    truth = (
        q_similarity_topk(spark, sf_dir)
        .filter(F.col("rank") <= NDCG_K)
        .select("qid", "nid")
    ).persist()
    # r17 (guide §2.6 — overlap independent jobs): the truth side
    # (brute-force quadratic) and the IVFADC serving share no state —
    # materialize the truth cache on a pool thread while the main
    # thread builds the index serving (eager tree install/read at
    # call time) and materializes its cache. Both consumers read the
    # caches only after both counts return — same frames, same
    # report values as the sequential form.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    with ThreadPoolExecutor(max_workers=1) as tp:
        truth_f = tp.submit(inheritable_thread_target(truth.count))
        ann = q_similarity_ivfpq(spark, sf_dir).persist()
        ann.count()  # materialize once; the nDCG branch + the fusion
        truth_f.result()  # materialized once; two consumers read it
    ivf = (
        ann.filter(F.col("rank") <= NDCG_K)
        .select(F.lit("ivfpq").alias("ranker"), "qid", "nid", "rank")
    )
    rrf = (
        q_retrieval_rrf(spark, sf_dir, ann_ivfpq=ann)
        .filter(F.col("rank") <= NDCG_K)
        .select(
            F.lit("rrf").alias("ranker"),
            ((F.col("qid") - 1) * QUERY_MOD).cast("bigint").alias("qid"),
            F.col("doc_id").alias("nid"),
            "rank",
        )
    )
    cands = ivf.unionByName(rrf)
    gain = F.lit(0)
    for i, g in enumerate(_NDCG_GAIN, start=1):
        gain = F.when(F.col("rank") == i, F.lit(g)).otherwise(gain)
    sc = (
        cands.join(truth, ["qid", "nid"], "left_semi")
        .groupBy("ranker", "qid")
        .agg(
            F.sum(gain).cast("long").alias("dcg"),
            F.count("*").alias("hits"),
        )
    )
    base = (
        truth.filter(F.col("qid") < n_q * QUERY_MOD)
        .groupBy("qid")
        .agg(F.count("*").alias("n_rel"))
    )
    idcg = F.lit(0)
    for nrel, p in enumerate(_NDCG_PREFIX):
        idcg = F.when(F.col("n_rel") == nrel, F.lit(p)).otherwise(idcg)
    br = base.select(
        "qid",
        idcg.alias("idcg"),
        F.explode(F.array(F.lit("ivfpq"), F.lit("rrf"))).alias("ranker"),
    )
    per = br.join(sc, ["ranker", "qid"], "left").select(
        "ranker",
        F.coalesce("dcg", F.lit(0)).alias("dcg"),
        F.coalesce("hits", F.lit(0)).alias("hits"),
        "idcg",
    )
    report = per.groupBy("ranker").agg(
        F.count("*").cast("long").alias("n_queries"),
        F.sum("hits").cast("long").alias("total_hits"),
        F.expr("CAST(SUM((dcg * 1000) div idcg) div COUNT(*) AS BIGINT)")
        .alias("mean_ndcg_milli"),
    )
    # ≤ 2 rows BY CONSTRUCTION (one per ranker literal) — eager
    # bounded drain, then release both k-bounded serving caches; the
    # try/finally keeps a failed drain from pinning them (the
    # `drain_one_row` discipline, two-row variant)
    schema = (
        "ranker string, n_queries bigint, total_hits bigint, "
        "mean_ndcg_milli bigint"
    )
    try:
        rows = report.limit(4).collect()
    finally:
        truth.unpersist()
        ann.unpersist()
    from .similarity import _model_df

    return _model_df(
        spark,
        [
            (r["ranker"], r["n_queries"], r["total_hits"],
             r["mean_ndcg_milli"])
            for r in rows
        ],
        schema,
    )


def _oracle_retrieval_quality_report() -> str:
    from .similarity import ORACLE_SIMILARITY_IVFPQ, ORACLE_SIMILARITY_TOPK
    from .similarity import QUERY_MOD

    n_q = len(BM25_QUERIES)
    gain_case = " ".join(
        f"WHEN {i} THEN {g}"
        for i, g in enumerate(_NDCG_GAIN, start=1)
    )
    idcg_case = " ".join(
        f"WHEN {n} THEN {p}" for n, p in enumerate(_NDCG_PREFIX)
    )
    return f"""
WITH truth AS (
  SELECT qid, nid FROM ({ORACLE_SIMILARITY_TOPK}) WHERE rank <= {NDCG_K}
),
ivf AS (
  SELECT 'ivfpq' AS ranker, qid, nid, rank
  FROM ({ORACLE_SIMILARITY_IVFPQ}) WHERE rank <= {NDCG_K}
),
rrf AS (
  SELECT 'rrf' AS ranker,
         CAST((qid - 1) * {QUERY_MOD} AS BIGINT) AS qid,
         doc_id AS nid, rank
  FROM ({_oracle_retrieval_rrf()}) WHERE rank <= {NDCG_K}
),
cands AS (
  SELECT * FROM ivf UNION ALL SELECT * FROM rrf
),
sc AS (
  SELECT c.ranker, c.qid,
         CAST(SUM(CASE c.rank {gain_case} ELSE 0 END) AS BIGINT) AS dcg,
         COUNT(*) AS hits
  FROM cands c
  WHERE EXISTS (SELECT 1 FROM truth t
                WHERE t.qid = c.qid AND t.nid = c.nid)
  GROUP BY 1, 2
),
base AS (
  SELECT qid, COUNT(*) AS n_rel FROM truth
  WHERE qid < {n_q * QUERY_MOD} GROUP BY qid
),
br AS (
  SELECT b.qid,
         CAST(CASE b.n_rel {idcg_case} ELSE 0 END AS BIGINT) AS idcg,
         r.ranker
  FROM base b, (VALUES ('ivfpq'), ('rrf')) r(ranker)
),
per AS (
  SELECT br.ranker,
         COALESCE(sc.dcg, 0) AS dcg,
         COALESCE(sc.hits, 0) AS hits,
         br.idcg
  FROM br LEFT JOIN sc ON br.ranker = sc.ranker AND br.qid = sc.qid
)
SELECT ranker,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       CAST(SUM(hits) AS BIGINT) AS total_hits,
       CAST(SUM((dcg * 1000) // idcg) // COUNT(*) AS BIGINT)
         AS mean_ndcg_milli
FROM per GROUP BY ranker
"""


QUERIES = {
    "tfidf_top_terms": q_tfidf_top_terms,
    "bm25_components": q_bm25_components,
    "vocab_topk": q_vocab_topk,
    "oov_rate": q_oov_rate,
    "unigram_logprob": q_unigram_logprob,
    "bigram_lm_logprob": q_bigram_lm_logprob,
    "kn_bigram_logprob": q_kn_bigram_logprob,
    "dsir_select": q_dsir_select,
    "ccnet_perplexity_buckets": q_ccnet_perplexity_buckets,
    "bm25_topk": q_bm25_topk,
    "retrieval_rrf": q_retrieval_rrf,
    "retrieval_quality_report": q_retrieval_quality_report,
}

ORACLES = {
    "tfidf_top_terms": ORACLE_TFIDF,
    "bm25_components": ORACLE_BM25,
    "vocab_topk": ORACLE_VOCAB_TOPK,
    "oov_rate": ORACLE_OOV_RATE,
    "unigram_logprob": ORACLE_UNIGRAM_LOGPROB,
    "bigram_lm_logprob": ORACLE_BIGRAM_LM_LOGPROB,
    "kn_bigram_logprob": ORACLE_KN_BIGRAM_LOGPROB,
    "dsir_select": ORACLE_DSIR_SELECT,
    "ccnet_perplexity_buckets": ORACLE_CCNET_BUCKETS,
    "bm25_topk": ORACLE_BM25_TOPK,
    "retrieval_rrf": _oracle_retrieval_rrf(),
    "retrieval_quality_report": _oracle_retrieval_quality_report(),
}
