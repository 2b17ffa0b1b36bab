"""Corpus n-gram language model with Stupid Backoff (Brants et al.,
"Large Language Models in Machine Translation", EMNLP 2007) — the
KenLM-class perplexity filter of CCNet-style curation pipelines,
trained and applied entirely inside the engine: trigram/bigram/
unigram counts from a labeled seed slice become the model, and every
held-out document is scored by its summed trigram log-probabilities
with the 0.4-factor backoff chain the paper showed is
indistinguishable from Kneser-Ney at web scale (and, unlike KN,
needs only COUNTS — i.e., three combinable aggregates).

Reference parity: no text surface in the reference
(worker/lambda/app.py:96-118 forwards CDC JSON byte-for-byte); this
extends SURVEY.md §2.9's quality-scoring family beside
bigram_lm_score (which is a no-backoff bigram scorer trained on the
full corpus — this one has held-out application, so backoff actually
fires).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.operators.text import _DUCK_TOKENS, tokens_col
from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table

SB_LAMBDA = 0.4  # the paper's backoff factor
SB_SEED_MOD = 10
SB_SEED_LT = 3  # same 30% seed slice as nb_token_classifier

# trigram stream: one row per in-doc trigram occurrence, with the
# seed/holdout split. DuckDB range(1, len-1) = [1 .. len-2] — exactly
# the trigram starts; greatest(...,1) empties 0/1/2-token docs.
_DUCK_TRI = f"""
t AS (
  SELECT doc_id, doc_id % {SB_SEED_MOD} < {SB_SEED_LT} AS seed,
         {_DUCK_TOKENS} AS tk
  FROM documents
),
tri AS (
  SELECT doc_id, seed,
         tk[CAST(i AS INT)] AS w1,
         tk[CAST(i + 1 AS INT)] AS w2,
         tk[CAST(i + 2 AS INT)] AS w3
  FROM t, unnest(range(1, greatest(len(tk) - 1, 1))) AS u(i)
),
uni AS (
  SELECT doc_id, seed, unnest(tk) AS w FROM t
),
bi AS (
  SELECT doc_id, seed,
         tk[CAST(i AS INT)] AS w1, tk[CAST(i + 1 AS INT)] AS w2
  FROM t, unnest(range(1, greatest(len(tk), 1))) AS u(i)
)
""".strip()


@query(
    "stupid_backoff_score",
    oracle=f"""
WITH {_DUCK_TRI},
c1 AS (SELECT w, count(*) AS n FROM uni WHERE seed GROUP BY w),
c2 AS (SELECT w1, w2, count(*) AS n FROM bi WHERE seed GROUP BY w1, w2),
c3 AS (SELECT w1, w2, w3, count(*) AS n FROM tri WHERE seed GROUP BY w1, w2, w3),
nn AS (SELECT CAST(sum(n) AS DOUBLE) AS n_total FROM c1),
m3 AS (
  SELECT c3.w1, c3.w2, c3.w3, CAST(c3.n AS DOUBLE) / c2.n AS s
  FROM c3 JOIN c2 ON c3.w1 = c2.w1 AND c3.w2 = c2.w2
),
m2 AS (
  SELECT c2.w1 AS w2, c2.w2 AS w3,
         {SB_LAMBDA} * CAST(c2.n AS DOUBLE) / c1.n AS s
  FROM c2 JOIN c1 ON c2.w1 = c1.w
),
m1 AS (
  SELECT w AS w3, {SB_LAMBDA} * {SB_LAMBDA} * CAST(n AS DOUBLE) / n_total AS s
  FROM c1 CROSS JOIN nn
),
scored AS (
  SELECT tri.doc_id,
         CASE WHEN m3.s IS NOT NULL THEN 3
              WHEN m2.s IS NOT NULL THEN 2
              WHEN m1.s IS NOT NULL THEN 1 ELSE 0 END AS lvl,
         CAST(round(ln(coalesce(
           m3.s, m2.s, m1.s,
           {SB_LAMBDA} * {SB_LAMBDA} * 0.5 / nn.n_total)), 9)
           AS DECIMAL(28,9)) AS c
  FROM tri
  LEFT JOIN m3 ON tri.w1 = m3.w1 AND tri.w2 = m3.w2 AND tri.w3 = m3.w3
  LEFT JOIN m2 ON tri.w2 = m2.w2 AND tri.w3 = m2.w3
  LEFT JOIN m1 ON tri.w3 = m1.w3
  CROSS JOIN nn
  WHERE NOT tri.seed
)
SELECT doc_id,
       count(*) AS n_tri,
       CAST(sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit3,
       CAST(sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit2,
       CAST(sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit1,
       CAST(sum(CASE WHEN lvl = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit0,
       round(CAST(sum(c) AS DOUBLE), 6) AS lm_score
FROM scored
GROUP BY doc_id
""",
)
def stupid_backoff_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out LM scoring with Stupid Backoff: train
    trigram/bigram/unigram counts on the seed slice
    (doc_id % {SB_SEED_MOD} < {SB_SEED_LT}), score every holdout
    document as Σ ln S(w₃|w₁w₂) where S backs off through
    {SB_LAMBDA}·S(w₃|w₂) → {SB_LAMBDA}²·c(w₃)/N → an add-half floor
    for fully-unseen words. Per-doc backoff-level counts
    (n_hit3..n_hit0) ride along, so the score is auditable — a doc
    scored entirely off the floor is OOV junk, not fluent text.

    Plan: the tokenized corpus explodes once per n-gram order into
    three combinable count aggregates (the model — every one keyed on
    its n-gram, map-side partial); the model relations pre-join into
    per-level probability tables (model-side, never row-side work);
    scoring is three LEFT joins from the holdout trigram stream,
    each on an n-gram key, followed by one per-doc combinable sum.
    Nothing ever shuffles wider than an n-gram key or doc_id, and at
    100 TB every model table is vocab-bounded, not corpus-bounded
    (production adds a count-threshold prune — one HAVING — exactly
    as Brants et al. do). Contributions round to 9 and sum in
    DECIMAL(28,9); probabilities are single double divisions of
    identical integer counts, so both engines score bit-identically
    before the rounding."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (F.col("doc_id") % SB_SEED_MOD < SB_SEED_LT).alias("seed"),
        tokens_col().alias("tk"),
    )

    def grams(n: int, cols: list[str]) -> DataFrame:
        """One row per n-gram occurrence: slice the token array into
        n staggered views and zip them positionally."""
        ln = F.greatest(F.size("tk") - (n - 1), F.lit(0))
        views = [F.slice("tk", i + 1, ln).alias(c) for i, c in enumerate(cols)]
        z = F.arrays_zip(*views) if n > 1 else None
        if n == 1:
            return d.select(
                "doc_id", "seed", F.explode("tk").alias(cols[0])
            )
        return d.select("doc_id", "seed", F.explode(z).alias("g")).select(
            "doc_id", "seed", *[F.col(f"g.{c}").alias(c) for c in cols]
        )

    uni = grams(1, ["w"])
    bi = grams(2, ["w1", "w2"])
    tri = grams(3, ["w1", "w2", "w3"])

    c1 = uni.where("seed").groupBy("w").agg(F.count("*").alias("n"))
    c2 = bi.where("seed").groupBy("w1", "w2").agg(F.count("*").alias("n"))
    c3 = (
        tri.where("seed")
        .groupBy("w1", "w2", "w3")
        .agg(F.count("*").alias("n"))
    )
    nn = F.broadcast(c1.agg(F.sum("n").cast("double").alias("n_total")))

    m3 = c3.alias("c3").join(
        c2.alias("p2"),
        (F.col("c3.w1") == F.col("p2.w1")) & (F.col("c3.w2") == F.col("p2.w2")),
    ).select(
        F.col("c3.w1").alias("w1"),
        F.col("c3.w2").alias("w2"),
        F.col("c3.w3").alias("w3"),
        (F.col("c3.n").cast("double") / F.col("p2.n")).alias("s3"),
    )
    m2 = c2.alias("c2").join(
        c1.alias("p1"), F.col("c2.w1") == F.col("p1.w")
    ).select(
        F.col("c2.w1").alias("w2"),
        F.col("c2.w2").alias("w3"),
        (SB_LAMBDA * F.col("c2.n").cast("double") / F.col("p1.n")).alias("s2"),
    )
    m1 = c1.crossJoin(nn).select(
        F.col("w").alias("w3"),
        (SB_LAMBDA * SB_LAMBDA * F.col("n").cast("double") / F.col("n_total"))
        .alias("s1"),
    )

    s = F.coalesce(
        F.col("s3"),
        F.col("s2"),
        F.col("s1"),
        SB_LAMBDA * SB_LAMBDA * F.lit(0.5) / F.col("n_total"),
    )
    lvl = (
        F.when(F.col("s3").isNotNull(), 3)
        .when(F.col("s2").isNotNull(), 2)
        .when(F.col("s1").isNotNull(), 1)
        .otherwise(0)
    )
    scored = (
        tri.where(~F.col("seed"))
        .join(m3, ["w1", "w2", "w3"], "left")
        .join(m2, ["w2", "w3"], "left")
        .join(m1, ["w3"], "left")
        .crossJoin(nn)
        .select(
            "doc_id",
            lvl.alias("lvl"),
            F.round(F.log(s), 9).cast("decimal(28,9)").alias("c"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tri"),
        F.sum((F.col("lvl") == 3).cast("long")).alias("n_hit3"),
        F.sum((F.col("lvl") == 2).cast("long")).alias("n_hit2"),
        F.sum((F.col("lvl") == 1).cast("long")).alias("n_hit1"),
        F.sum((F.col("lvl") == 0).cast("long")).alias("n_hit0"),
        F.round(F.sum("c").cast("double"), 6).alias("lm_score"),
    )


# CCNet-style perplexity bucketing (Wenzek et al., "CCNet: Extracting
# High Quality Monolingual Datasets from Web Crawl Data", LREC 2020):
# per-language head/middle/tail terciles by LM fluency; head+middle
# kept. The fluency statistic is the mean seed-bigram frequency —
# a rank-equivalent fluency proxy whose value is ONE double division
# of identical integer aggregates, so the per-language ordering (and
# therefore every tercile boundary) is bit-identical across engines,
# which a summed-float perplexity cannot guarantee.
CCNET_BUCKETS = 3


@query(
    "ccnet_perplexity_buckets",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, doc_id % {SB_SEED_MOD} < {SB_SEED_LT} AS seed,
         {_DUCK_TOKENS} AS tk
  FROM documents
),
bi AS (
  SELECT doc_id, lang, seed,
         tk[CAST(i AS INT)] AS w1, tk[CAST(i + 1 AS INT)] AS w2
  FROM t, unnest(range(1, greatest(len(tk), 1))) AS u(i)
),
model AS (SELECT w1, w2, count(*) AS n FROM bi WHERE seed GROUP BY w1, w2),
scored AS (
  SELECT bi.doc_id, bi.lang,
         count(*) AS n_bi,
         CAST(sum(coalesce(model.n, 0)) AS BIGINT) AS hit_sum
  FROM bi LEFT JOIN model USING (w1, w2)
  WHERE NOT bi.seed
  GROUP BY bi.doc_id, bi.lang
),
b AS (
  SELECT doc_id, lang, n_bi, hit_sum,
         hit_sum / CAST(n_bi AS DOUBLE) AS fl,
         CAST(ntile({CCNET_BUCKETS}) OVER (
           PARTITION BY lang
           ORDER BY hit_sum / CAST(n_bi AS DOUBLE) DESC, doc_id
         ) AS INT) AS bucket
  FROM scored
)
SELECT doc_id, lang, n_bi, hit_sum, bucket,
       bucket <= {CCNET_BUCKETS - 1} AS keep
FROM b
""",
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail bucketing: train a bigram frequency
    model on the seed slice (doc_id % {SB_SEED_MOD} < {SB_SEED_LT} —
    CCNet's Wikipedia stand-in), score every holdout document by mean
    seed-bigram frequency, and split each LANGUAGE into
    {CCNET_BUCKETS} equal terciles of descending fluency (ntile over
    the per-lang ordering, doc_id tie-break); head+middle are kept,
    the tail is the low-quality cut — CCNet's per-language
    perplexity-tercile recipe with an exactly-ranking statistic.
    Documents with <2 tokens have no bigrams and are not scored.
    The output carries the exact integer pair (hit_sum, n_bi) rather
    than the rounded float quotient: the ntile ORDER BY uses the
    division (bit-identical across engines), but a ROUNDED display
    value can differ by one ulp at the HALF_UP boundary and would
    poison the parity hash for no information gain.

    Plan: the bigram stream explodes once; the model is a map-side
    combinable count keyed on the bigram; scoring is one LEFT join
    on the bigram key + one per-(doc, lang) combinable sum. The only
    non-combinable step is the per-language ntile — a single window
    whose partition key is `lang` (≤ dozens of languages); at 100 TB
    that window is the known skew point, and the production dial is
    the same one CCNet uses: compute per-lang score QUANTILES on a
    sample (quantile_bucketize's pattern) and broadcast the two cut
    points instead of ranking every row — kept exact here because
    the oracle must rank identically."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        (F.col("doc_id") % SB_SEED_MOD < SB_SEED_LT).alias("seed"),
        tokens_col().alias("tk"),
    )
    ln = F.greatest(F.size("tk") - 1, F.lit(0))
    z = F.arrays_zip(
        F.slice("tk", 1, ln).alias("w1"), F.slice("tk", 2, ln).alias("w2")
    )
    bi = d.select(
        "doc_id", "lang", "seed", F.explode(z).alias("g")
    ).select(
        "doc_id",
        "lang",
        "seed",
        F.col("g.w1").alias("w1"),
        F.col("g.w2").alias("w2"),
    )
    model = bi.where("seed").groupBy("w1", "w2").agg(F.count("*").alias("n"))
    scored = (
        bi.where(~F.col("seed"))
        .join(model, ["w1", "w2"], "left")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_bi"),
            F.sum(F.coalesce("n", F.lit(0))).alias("hit_sum"),
        )
    )
    fl = F.col("hit_sum") / F.col("n_bi").cast("double")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        fl.desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("bucket", F.ntile(CCNET_BUCKETS).over(w).cast("int"))
        .select(
            "doc_id",
            "lang",
            "n_bi",
            "hit_sum",
            "bucket",
            (F.col("bucket") <= CCNET_BUCKETS - 1).alias("keep"),
        )
    )
