"""Corpus-curation operators, round-9 batch: distribution-matched
importance reweighting (the DSIR recipe), a trained token classifier
(the fastText-quality-filter stand-in), per-domain frequency caps
(the FineWeb/Common-Crawl dedup practice), and a k-anonymity audit
(the privacy gate release pipelines run before export).

All four are pure built-in/HOF plans — zero Python in the hot path —
with DuckDB oracle twins, same float discipline as the rest of the
text family (per-item contributions rounded to 9-10 places, summed in
DECIMAL so both engines associate identically, final values rounded
to 6).

Reference parity: the reference has no curation surface (it forwards
CDC JSON byte-for-byte, worker/lambda/app.py:96-118); this module
extends SURVEY.md §2.9's mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.operators.text import (
    _DUCK_TOKENS,
    DUCK_HASH64,
    shared_hash64,
    tokens_col,
)
from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.session import truncate_lineage
from sfdc_cdc_aws_spark.sources import load_table

# ---------------------------------------------------------------------------
# DSIR — data selection via importance resampling (hashed n-grams)
# ---------------------------------------------------------------------------

# Feature space is unigrams ∪ bigrams hashed into DSIR_BUCKETS buckets
# (Xie et al., "Data Selection for Language Models via Importance
# Resampling", NeurIPS 2023 — the hashed-ngram variant, §3.2). Bucket
# count is deliberately small relative to vocab so collisions smooth
# the estimate; 0.5 is plain add-half Laplace smoothing.
DSIR_BUCKETS = 1024
DSIR_ALPHA = 0.5

_DUCK_FEATS = (
    "(tk || list_transform(range(1, greatest(len(tk), 1)), "
    "i -> tk[CAST(i AS INT)] || '_' || tk[CAST(i + 1 AS INT)]))"
)


def _feats_col():
    """Unigrams ∪ bigrams of the shared whitespace tokenizer, as one
    array column (bigrams joined with '_'). slice lengths clamp at 0
    so 0/1-token docs contribute their unigrams only — the DuckDB
    twin gets the same from range(1, greatest(len, 1))."""
    t = tokens_col()
    n = F.greatest(F.size(t) - 1, F.lit(0))
    bigrams = F.zip_with(
        F.slice(t, 1, n), F.slice(t, 2, n), lambda a, b: F.concat(a, F.lit("_"), b)
    )
    return F.concat(t, bigrams)


@query(
    "dsir_importance_weights",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, {_DUCK_TOKENS} AS tk FROM documents
),
b AS (
  SELECT doc_id, lang,
         ({DUCK_HASH64.format(expr='feat')}) % {DSIR_BUCKETS} AS bucket
  FROM (SELECT doc_id, lang, unnest({_DUCK_FEATS}) AS feat FROM t)
),
raw AS (SELECT bucket, count(*) AS rc FROM b GROUP BY bucket),
tot AS (
  SELECT (SELECT count(*) FROM b) AS r_total,
         (SELECT count(*) FROM b WHERE lang = 'en') AS t_total
),
lr AS (
  SELECT raw.bucket,
         CAST(round(
           ln((coalesce(tc, 0) + {DSIR_ALPHA})
              / (t_total + {DSIR_ALPHA} * {DSIR_BUCKETS}))
           - ln((rc + {DSIR_ALPHA})
              / (r_total + {DSIR_ALPHA} * {DSIR_BUCKETS})),
           9) AS DECIMAL(28,9)) AS c
  FROM raw
  LEFT JOIN (SELECT bucket, count(*) AS tc FROM b WHERE lang = 'en'
             GROUP BY bucket) tgt ON raw.bucket = tgt.bucket
  CROSS JOIN tot
)
SELECT b.doc_id,
       count(*) AS n_feats,
       round(CAST(sum(lr.c) AS DOUBLE), 6) AS log_weight
FROM b JOIN lr ON b.bucket = lr.bucket
GROUP BY b.doc_id
""",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: score every raw document by how much
    more likely its hashed-ngram features are under the TARGET
    distribution (here the English slice — in production, the
    high-quality seed corpus) than under the raw corpus — the
    log-importance weight that drives importance RESAMPLING of a
    100 TB crawl toward a curated distribution. Feature space is
    unigrams ∪ bigrams hashed into {DSIR_BUCKETS} buckets; both bag
    models use add-{DSIR_ALPHA} smoothing; a doc's weight is the sum
    of its occurrences' per-bucket log-ratios.

    Plan: one scan+explode of ``documents`` feeds BOTH bag-of-bucket
    aggregates (target counts are a filtered re-aggregation — Spark
    computes them map-side-partial over the same shuffle width), the
    {DSIR_BUCKETS}-row log-ratio relation broadcasts, and the per-doc
    weight is a broadcast-join + one combinable sum — the corpus
    never shuffles by anything wider than (bucket) and (doc_id). At
    100× the only growing structure is the doc-keyed aggregate;
    the model stays {DSIR_BUCKETS} rows by construction. Per-bucket
    contributions round to 9 places and sum in DECIMAL(18,9) (the
    bm25_score float discipline; 18 digits, not 28, so the
    occurrence-count product below stays inside Spark's 38-digit
    ceiling without precision loss)."""
    d = load_table(spark, sf_dir, "documents")
    # ONE explode of the corpus, immediately pre-aggregated to
    # (doc_id, bucket) occurrence counts and lineage-truncated: the
    # doc-keyed relation feeds BOTH the global bag models (a re-agg
    # by bucket — no second corpus scan) and the final scoring join.
    bd = truncate_lineage(
        d.select("doc_id", "lang", F.explode(_feats_col()).alias("feat"))
        .select(
            "doc_id",
            "lang",
            (shared_hash64(F.col("feat")) % DSIR_BUCKETS).alias("bucket"),
        )
        .groupBy("doc_id", "bucket")
        .agg(
            F.count("*").alias("n"),
            F.sum((F.col("lang") == "en").cast("long")).alias("n_en"),
        )
    )
    raw = bd.groupBy("bucket").agg(
        F.sum("n").alias("rc"),
        F.sum("n_en").alias("tc"),
    )
    tot = F.broadcast(
        raw.agg(
            F.sum("rc").alias("r_total"),
            F.sum("tc").alias("t_total"),
        )
    )
    c = F.round(
        F.log(
            (F.col("tc") + DSIR_ALPHA)
            / (F.col("t_total") + DSIR_ALPHA * DSIR_BUCKETS)
        )
        - F.log(
            (F.col("rc") + DSIR_ALPHA)
            / (F.col("r_total") + DSIR_ALPHA * DSIR_BUCKETS)
        ),
        9,
        # decimal(18,9), not (28,9): the occurrence-count product below
        # must stay within Spark's 38-digit decimal ceiling WITHOUT
        # precision loss (28+12+1 > 38 would silently shrink the scale
        # and drift the last digit vs the oracle's per-occurrence sum)
    ).cast("decimal(18,9)")
    lr = F.broadcast(raw.crossJoin(tot).select("bucket", c.alias("c")))
    return (
        bd.join(lr, "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_feats"),
            F.round(
                F.sum(F.col("n").cast("decimal(12,0)") * F.col("c")).cast(
                    "double"
                ),
                6,
            ).alias("log_weight"),
        )
    )


# ---------------------------------------------------------------------------
# Naive-Bayes token classifier — train on a seed slice, apply to the rest
# ---------------------------------------------------------------------------

# Seed slice = 30% of docs by id (the labeled set a team can afford to
# curate); label = "is English" (stand-in for "is high quality" — the
# fastText quality classifier of the CCNet/LLaMA pipelines is exactly
# this shape: train on a seed, score the crawl).
NB_ALPHA = 0.5
NB_SEED_MOD = 10
NB_SEED_LT = 3


@query(
    "nb_token_classifier",
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, doc_id % {NB_SEED_MOD} < {NB_SEED_LT} AS seed,
         {_DUCK_TOKENS} AS tk
  FROM documents
),
tok AS (SELECT doc_id, lang, seed, unnest(tk) AS token FROM t),
vocab AS (
  SELECT token,
         count(*) FILTER (lang = 'en') AS cp,
         count(*) FILTER (lang <> 'en') AS cn
  FROM tok WHERE seed GROUP BY token
),
m AS (
  SELECT (SELECT count(*) FROM vocab) AS v,
         (SELECT sum(cp) FROM vocab) AS tp,
         (SELECT sum(cn) FROM vocab) AS tn,
         (SELECT count(*) FROM t WHERE seed AND lang = 'en') AS np,
         (SELECT count(*) FROM t WHERE seed AND lang <> 'en') AS nn
),
llr AS (
  SELECT token,
         CAST(round(
           ln((cp + {NB_ALPHA}) / (tp + {NB_ALPHA} * v))
           - ln((cn + {NB_ALPHA}) / (tn + {NB_ALPHA} * v)), 9)
           AS DECIMAL(28,9)) AS c
  FROM vocab CROSS JOIN m
)
SELECT tok.doc_id,
       count(*) AS n_tok_seen,
       round(CAST(sum(llr.c) AS DOUBLE)
             + ln((any_value(m.np) + {NB_ALPHA})
                  / (any_value(m.nn) + {NB_ALPHA})), 6)
         AS score,
       (CAST(sum(llr.c) AS DOUBLE)
        + ln((any_value(m.np) + {NB_ALPHA})
             / (any_value(m.nn) + {NB_ALPHA}))) > 0
         AS pred_en
FROM tok JOIN llr USING (token) CROSS JOIN m
WHERE NOT tok.seed
GROUP BY tok.doc_id
""",
)
def nb_token_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained quality/language classifier, end to end IN the engine:
    fit a Naive-Bayes token model on the labeled seed slice
    (doc_id % {NB_SEED_MOD} < {NB_SEED_LT}; label = ``lang = 'en'``),
    then score every held-out document with the summed token
    log-likelihood ratios + the class-prior log-odds — the
    CCNet/LLaMA-style "train a cheap classifier on a seed, filter the
    crawl" step as one declarative plan. Out-of-vocabulary tokens are
    skipped (inner join), exactly as a fixed fastText vocabulary
    would.

    Plan: training is ONE map-side-partial aggregate over the seed
    slice's tokens (shuffle keyed on token, |vocab| rows out); the
    model (per-token LLR + scalar priors) broadcasts; application is
    a broadcast-join + per-doc combinable sum — the corpus scans
    once for training and once for scoring, and nothing ever
    shuffles wider than (token) and (doc_id). At 100 TB the model
    stays |vocab|-bounded (production would additionally min-df prune
    the vocab — one HAVING clause on the training aggregate).
    Per-token contributions round to 9 places and sum in
    DECIMAL(28,9)."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "seed", F.col("doc_id") % NB_SEED_MOD < NB_SEED_LT
    )
    tok = d.select(
        "doc_id", "lang", "seed", F.explode(tokens_col()).alias("token")
    )
    vocab = (
        tok.where("seed")
        .groupBy("token")
        .agg(
            F.sum((F.col("lang") == "en").cast("long")).alias("cp"),
            F.sum((F.col("lang") != "en").cast("long")).alias("cn"),
        )
    )
    seed_docs = d.where("seed").agg(
        F.sum((F.col("lang") == "en").cast("long")).alias("np"),
        F.sum((F.col("lang") != "en").cast("long")).alias("nn"),
    )
    m = F.broadcast(
        vocab.agg(
            F.count("*").alias("v"),
            F.sum("cp").alias("tp"),
            F.sum("cn").alias("tn"),
        ).crossJoin(seed_docs)
    )
    c = F.round(
        F.log((F.col("cp") + NB_ALPHA) / (F.col("tp") + NB_ALPHA * F.col("v")))
        - F.log((F.col("cn") + NB_ALPHA) / (F.col("tn") + NB_ALPHA * F.col("v"))),
        9,
    ).cast("decimal(28,9)")
    llr = F.broadcast(vocab.crossJoin(m).select("token", c.alias("c")))
    # class-prior log-odds, add-alpha smoothed like the token counts:
    # a degenerate one-class seed slice must not divide by zero
    # (round-9 advice — DuckDB errors, Spark yields ±Infinity)
    prior = F.log(
        (F.col("np") + NB_ALPHA) / (F.col("nn") + NB_ALPHA)
    )
    raw_score = F.col("s").cast("double") + prior
    return (
        tok.where(~F.col("seed"))
        .join(llr, "token")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_tok_seen"), F.sum("c").alias("s"))
        .crossJoin(F.broadcast(seed_docs))
        .select(
            "doc_id",
            "n_tok_seen",
            F.round(raw_score, 6).alias("score"),
            (raw_score > 0).alias("pred_en"),
        )
    )


# ---------------------------------------------------------------------------
# per-domain frequency caps
# ---------------------------------------------------------------------------

# Cap binds at every test SF: sources hold ~2-3 docs at sf0.001 and
# ~25 at sf0.01, so kept/dropped both occur (a cap nothing hits
# verifies nothing).
DOMAIN_CAP = 2


@query(
    "domain_cap_sample",
    oracle=f"""
SELECT doc_id, source, rk,
       rk <= {DOMAIN_CAP} AS kept
FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY {DUCK_HASH64.format(expr='CAST(doc_id AS VARCHAR)')},
                    doc_id
         ) AS rk
  FROM documents
)
""",
)
def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain frequency cap (the FineWeb/C4 practice: no single
    domain may contribute more than CAP documents to the training
    mix): rank each source's documents by a deterministic hash of
    doc_id — an unbiased shuffle that is reproducible across engines
    and runs, unlike RAND() — and keep the first {DOMAIN_CAP}.
    Every row is emitted with its rank and kept flag so the drop
    manifest is part of the result, not a side effect.

    Plan: one window (row_number) partitioned by source over the
    hash order — a single shuffle keyed on the domain. At 100 TB a
    mega-domain makes that partition hot; the production refinement
    is a two-phase rank (aggregate per-domain counts first — one
    tiny relation — then rank ONLY domains over the cap, the same
    observed-cap discipline as the LSH bucket caps), which this plan
    degrades to without changing semantics."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        shared_hash64(F.col("doc_id").cast("string")), "doc_id"
    )
    return d.select(
        "doc_id", "source", F.row_number().over(w).alias("rk")
    ).withColumn("kept", F.col("rk") <= DOMAIN_CAP)


# ---------------------------------------------------------------------------
# k-anonymity audit
# ---------------------------------------------------------------------------

K_ANON = 8


@query(
    "k_anonymity_check",
    oracle=f"""
SELECT c_nationkey, c_mktsegment,
       count(*) AS n_rows,
       count(*) < {K_ANON} AS risky
FROM customer
GROUP BY c_nationkey, c_mktsegment
""",
)
def k_anonymity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the quasi-identifier pair
    (nation, market segment): any combination shared by fewer than
    {K_ANON} customers re-identifies its members and must be
    suppressed or generalized before the table ships in a training
    corpus — the privacy gate beside pii_scrub (which handles direct
    identifiers; this handles identifying COMBINATIONS). Every
    equivalence class is emitted with its size and risk flag so the
    release decision is auditable.

    Plan: one map-side-partial aggregate keyed on the QI tuple —
    the shuffle carries |QI classes| rows, scale-invariant in row
    count. At 100 TB with high-cardinality QIs the same plan holds;
    risk concentration (many tiny classes) is exactly what the
    output measures."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy("c_nationkey", "c_mktsegment")
        .agg(F.count("*").alias("n_rows"))
        .withColumn("risky", F.col("n_rows") < K_ANON)
    )


# ---------------------------------------------------------------------------
# the composed curation funnel — one manifest for the whole pipeline
# ---------------------------------------------------------------------------

FUNNEL_DOMAIN_CAP = 5
# Training-token budget for the funnel's final fill stage. Sized to
# BIND at every test SF (stage-5 survivor mass is ~2.7k tokens at
# sf0.001 and grows with SF) while leaving every source at least ~1
# admissible document — a budget nothing hits verifies nothing.
FUNNEL_TOKEN_BUDGET = 1_500
# the stream_quality_gate rules, batch-composed — IMPORTED, not
# re-declared, so retuning the stream gate retunes the funnel's
# quality_gate stage with it (round-9 advice)
from sfdc_cdc_aws_spark.streaming.quality_gate import (  # noqa: E402
    GATE_MAX_CHARS as _GATE_MAX_CHARS,
    GATE_MIN_TOKENS as _GATE_MIN_TOKENS,
)


def curation_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE curation pipeline as one funnel manifest: raw corpus
    → language filter → quality gate → MinHash-LSH dedup survivors →
    per-domain cap → DSIR selection → token-budget fill, each stage
    reported with its surviving doc and token counts — the one-page
    number a data lead reads before a training run (and the
    composition proof: every stage is an already-verified operator of
    this engine, chained).

    Stage semantics: dedup keeps the lower doc_id of every LSH
    candidate pair WHERE BOTH SIDES survived the gate (dedup runs on
    what the gate admitted, as in a real pipeline); the domain cap
    ranks gate+dedup survivors per source by deterministic hash and
    keeps {FUNNEL_DOMAIN_CAP}; DSIR selection keeps cap survivors the
    importance model (dsir_importance_weights — trained on the FULL
    corpus, as DSIR prescribes) scores target-ward (log_weight > 0);
    the budget stage apportions {FUNNEL_TOKEN_BUDGET} training tokens
    across sources by largest remainder over the DSIR survivors' token
    mass (token_budget_allocation's method) and admits each source's
    docs in deterministic hash order while the running token count
    stays inside its allocation.

    Plan (round-14 single-pass restructure, guide §2.4): the seven
    stage aggregates used to be a UNION of seven branches, and
    Catalyst does not share common subtrees across union arms — the
    LSH pair relation executed 4x and the DSIR model 2x. Stages are
    nested subsets, so the whole funnel reduces to ONE doc-level
    relation carrying a boolean per stage (membership in stage k):
    the expensive inputs (LSH pairs, DSIR weights) compute exactly
    once, the per-source windows run once over flag-sorted order
    (survivors sort first, so their row_number/running-sum equal the
    subset's), and the 7-row manifest is a single aggregate of flag
    sums pivoted with stack(). The flags relation is
    lineage-truncated between the window pass and the |sources|-row
    allocation aggregate that must re-read it. Same oracle,
    row-identical output, ~3x fewer executions of the dominant
    subtrees."""
    from sfdc_cdc_aws_spark.operators.dedup import minhash_lsh_dedup

    # narrow per-doc relation (5 scalar columns): truncate so the
    # tokenize-and-count scan runs ONCE — it feeds the flags relation
    # AND both sides of the gated-pair filter below, and Catalyst
    # re-executes the scan+split per consumer (guide §2.4)
    d = truncate_lineage(
        load_table(spark, sf_dir, "documents").select(
            "doc_id",
            "source",
            "lang",
            "n_chars",
            F.size(tokens_col()).alias("n_tok"),
        )
    )
    f2_pred = (
        (F.col("lang") == "en")
        & (F.col("n_tok") >= _GATE_MIN_TOKENS)
        & (F.col("n_chars") < _GATE_MAX_CHARS)
    )
    # dedup among gate survivors: drop the higher id of every LSH
    # pair whose BOTH endpoints passed the gate
    pairs = minhash_lsh_dedup(spark, sf_dir).select("doc_a", "doc_b")
    gated_ids = d.where(f2_pred).select("doc_id")
    drop = (
        pairs.join(gated_ids.withColumnRenamed("doc_id", "doc_a"), "doc_a")
        .join(gated_ids.withColumnRenamed("doc_id", "doc_b"), "doc_b")
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    dw = dsir_importance_weights(spark, sf_dir).select(
        "doc_id", "log_weight"
    )
    h = shared_hash64(F.col("doc_id").cast("string"))
    # per-source rank among f3 survivors: survivors order first, so
    # row_number equals their rank within the f3 subset (non-survivors
    # get garbage ranks their false flag ignores)
    w_rank = Window.partitionBy("source").orderBy(
        F.col("f3").desc(), h, "doc_id"
    )
    # pin the window's exchange at the session's parallelism: AQE
    # coalesces the small post-join shuffle to ONE partition, which
    # serializes the whole flags pipeline into a single task (guide
    # §2.5/§2.6 — measured 1.4 s serial at sf0.1); an explicit width
    # on the same key is the exchange the window needs anyway, and
    # defaultParallelism is scale-adaptive, not a local constant
    dp = spark.sparkContext.defaultParallelism
    flags = (
        d.repartition(dp, "source")
        .withColumn("f1", F.col("lang") == "en")
        .withColumn("f2", f2_pred)
        .join(drop.withColumn("_dropped", F.lit(True)), "doc_id", "left")
        .withColumn("f3", F.col("f2") & F.col("_dropped").isNull())
        .withColumn(
            "f4",
            F.col("f3")
            & (F.row_number().over(w_rank) <= FUNNEL_DOMAIN_CAP),
        )
        .join(dw, "doc_id", "left")
        .withColumn(
            "f5",
            F.col("f4") & F.coalesce(F.col("log_weight") > 0, F.lit(False)),
        )
        .select("doc_id", "source", "n_tok", "f1", "f2", "f3", "f4", "f5")
    )
    # the allocation aggregate below re-reads this relation: truncate
    # so the pair/model/window prefix executes once, not twice
    flags = truncate_lineage(flags)
    # stage 6: token-budget fill — largest-remainder apportionment of
    # FUNNEL_TOKEN_BUDGET over the DSIR survivors' per-source token
    # mass, then greedy admission per source in hash order while the
    # inclusive running token count fits the allocation
    src = flags.where("f5").groupBy("source").agg(
        F.sum("n_tok").alias("src_tokens")
    )
    w_all = Window.partitionBy()
    quota = FUNNEL_TOKEN_BUDGET * (
        F.col("src_tokens").cast("double") / F.sum("src_tokens").over(w_all)
    )
    fr = src.select(
        "source",
        F.floor(quota).cast("bigint").alias("base"),
        (quota - F.floor(quota)).alias("frac"),
    ).select(
        "*",
        F.row_number()
        .over(Window.partitionBy().orderBy(F.col("frac").desc(), "source"))
        .alias("frac_rank"),
        (FUNNEL_TOKEN_BUDGET - F.sum("base").over(w_all)).alias("leftover"),
    )
    alloc = fr.select(
        "source",
        (
            F.col("base")
            + (F.col("frac_rank") <= F.col("leftover")).cast("long")
        ).alias("alloc_tokens"),
    )
    # inclusive running token sum among f5 survivors in hash order
    # (survivors first; non-survivors contribute 0 and fail f6 anyway)
    w_cum = Window.partitionBy("source").orderBy(
        F.col("f5").desc(), h, "doc_id"
    )
    staged = (
        # same pinning as w_rank: the truncate above erased the
        # partitioning, and AQE would coalesce w_cum's exchange to one
        # serial task
        flags.repartition(dp, "source")
        .withColumn(
            "cum",
            F.sum(F.when(F.col("f5"), F.col("n_tok")).otherwise(0)).over(
                w_cum
            ),
        )
        .join(F.broadcast(alloc), "source", "left")
        .withColumn(
            "f6",
            F.col("f5")
            & F.coalesce(F.col("cum") <= F.col("alloc_tokens"), F.lit(False)),
        )
    )

    def n_docs(flag):
        return F.coalesce(F.sum(flag.cast("long")), F.lit(0)).cast("bigint")

    def n_toks(flag):
        return F.coalesce(
            F.sum(F.when(flag, F.col("n_tok"))), F.lit(0)
        ).cast("bigint")

    stage_flags = [
        ("raw", F.lit(True)),
        ("lang_en", F.col("f1")),
        ("quality_gate", F.col("f2")),
        ("lsh_dedup", F.col("f3")),
        ("domain_cap", F.col("f4")),
        ("dsir_select", F.col("f5")),
        ("token_budget", F.col("f6")),
    ]
    one = staged.agg(
        *[
            c
            for i, (_, fl) in enumerate(stage_flags)
            for c in (
                n_docs(fl).alias(f"d{i}"),
                n_toks(fl).alias(f"t{i}"),
            )
        ]
    )
    rows = ", ".join(
        f"{i}, '{name}', d{i}, t{i}"
        for i, (name, _) in enumerate(stage_flags)
    )
    return one.selectExpr(
        f"stack({len(stage_flags)}, {rows}) AS (stage, stage_name, n_docs, n_tokens)"
    )


def _funnel_oracle() -> str:
    from sfdc_cdc_aws_spark.operators.dedup import _DUCK_LSH_PAIRS_CTE

    # the DSIR model relation is the ALREADY-REGISTERED oracle of
    # dsir_importance_weights, embedded as a subquery (its WITH scope
    # is its own; inner t/b/raw/tot/lr names shadow nothing out here)
    dsir_sql = _Q["dsir_importance_weights"].oracle
    doc_hash = DUCK_HASH64.format(expr="CAST(doc_id AS VARCHAR)")
    return f"""
WITH {_DUCK_LSH_PAIRS_CTE},
d AS (
  SELECT doc_id, source, lang, n_chars,
         len({_DUCK_TOKENS}) AS n_tok
  FROM documents
),
s1 AS (SELECT * FROM d WHERE lang = 'en'),
s2 AS (SELECT * FROM s1
       WHERE n_tok >= {_GATE_MIN_TOKENS} AND n_chars < {_GATE_MAX_CHARS}),
s3 AS (
  SELECT * FROM s2 WHERE doc_id NOT IN (
    SELECT p.doc_b FROM lsh_pairs p
    JOIN s2 a ON a.doc_id = p.doc_a
    JOIN s2 b ON b.doc_id = p.doc_b
  )
),
s4 AS (
  SELECT doc_id, source, lang, n_chars, n_tok FROM (
    SELECT *, row_number() OVER (
      PARTITION BY source
      ORDER BY {doc_hash}, doc_id
    ) AS rk FROM s3
  ) WHERE rk <= {FUNNEL_DOMAIN_CAP}
),
dw AS (SELECT doc_id, log_weight FROM ({dsir_sql})),
s5 AS (
  SELECT s4.* FROM s4 JOIN dw USING (doc_id) WHERE dw.log_weight > 0
),
src AS (SELECT source, sum(n_tok) AS src_tokens FROM s5 GROUP BY source),
fr AS (
  SELECT source, CAST(floor(q) AS BIGINT) AS base, q - floor(q) AS frac
  FROM (SELECT source,
               {FUNNEL_TOKEN_BUDGET} * (CAST(src_tokens AS DOUBLE)
                                        / sum(src_tokens) OVER ()) AS q
        FROM src)
),
alloc AS (
  SELECT source,
         base + CASE WHEN row_number() OVER (ORDER BY frac DESC, source)
                          <= {FUNNEL_TOKEN_BUDGET} - sum(base) OVER ()
                     THEN 1 ELSE 0 END AS alloc_tokens
  FROM fr
),
s6 AS (
  SELECT doc_id, source, lang, n_chars, n_tok FROM (
    SELECT s5.*, a.alloc_tokens,
           sum(n_tok) OVER (
             PARTITION BY s5.source ORDER BY {doc_hash}, doc_id
           ) AS cum
    FROM s5 JOIN alloc a USING (source)
  ) WHERE cum <= alloc_tokens
)
SELECT 0 AS stage, 'raw' AS stage_name, count(*) AS n_docs,
       CAST(coalesce(sum(n_tok), 0) AS BIGINT) AS n_tokens FROM d
UNION ALL
SELECT 1, 'lang_en', count(*), CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s1
UNION ALL
SELECT 2, 'quality_gate', count(*), CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s2
UNION ALL
SELECT 3, 'lsh_dedup', count(*), CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s3
UNION ALL
SELECT 4, 'domain_cap', count(*), CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s4
UNION ALL
SELECT 5, 'dsir_select', count(*), CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s5
UNION ALL
SELECT 6, 'token_budget', count(*), CAST(coalesce(sum(n_tok), 0) AS BIGINT) FROM s6
""".strip()


# late-bind the oracle (dedup's CTE lives in a module that imports us
# indirectly through text.py — resolve at import-completion time, the
# registry stores plain strings)
from sfdc_cdc_aws_spark.registry import QUERIES as _Q  # noqa: E402

import dataclasses as _dc  # noqa: E402

from sfdc_cdc_aws_spark.registry import query as _query  # noqa: E402

# the funnel oracle composes dedup's LSH CTE, which cannot be an
# f-string at decoration time (dedup imports text which sits below
# us in load_all order) — register the builder, then late-bind the
# SQL once both modules exist; the registry stores plain strings
_query("curation_funnel_report")(curation_funnel_report)
_Q["curation_funnel_report"] = _dc.replace(
    _Q["curation_funnel_report"], oracle=_funnel_oracle()
)


# ---------------------------------------------------------------------------
# token budget allocation — largest-remainder apportionment
# ---------------------------------------------------------------------------

TOKEN_BUDGET = 100_000  # tokens the training run may draw


@query(
    "token_budget_allocation",
    oracle=f"""
WITH s AS (
  SELECT source,
         CAST(sum(len({_DUCK_TOKENS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
q AS (
  SELECT source, n_tokens,
         {TOKEN_BUDGET} * (CAST(n_tokens AS DOUBLE)
                           / sum(n_tokens) OVER ()) AS quota
  FROM s
),
f AS (
  SELECT source, n_tokens, quota,
         CAST(floor(quota) AS BIGINT) AS base,
         quota - floor(quota) AS frac
  FROM q
),
r AS (
  SELECT *,
         row_number() OVER (ORDER BY frac DESC, source) AS frac_rank,
         {TOKEN_BUDGET} - sum(base) OVER () AS leftover
  FROM f
)
SELECT source, n_tokens,
       round(quota, 6) AS quota,
       CAST(base + CASE WHEN frac_rank <= leftover THEN 1 ELSE 0 END
            AS BIGINT) AS alloc_tokens,
       frac_rank <= leftover AS got_remainder
FROM r
""",
)
def token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apportion a fixed training-token budget ({TOKEN_BUDGET}) across
    sources proportionally to their token mass using the
    LARGEST-REMAINDER method (floor every quota, then hand the
    leftover tokens to the largest fractional parts — ties broken on
    source name): Σ alloc_tokens == budget EXACTLY, every allocation
    within 1 of its real-valued quota — the property a sampling job
    needs so per-source readers can be sized up front. The
    quota/remainder columns make the apportionment auditable.

    Plan: one map-side-partial aggregate over documents (shuffle
    carries one row per source), then window arithmetic over the
    |sources|-row metadata relation — the same deliberately-tiny
    single-partition window as mixture_reweight (at 100 TB |sources|
    is thousands, not billions; the corpus-sized work is only the
    first aggregate)."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.sum(F.size(tokens_col())).cast("bigint").alias("n_tokens")
    )
    w = Window.partitionBy()
    quota = TOKEN_BUDGET * (
        F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    )
    f = s.select(
        "source",
        "n_tokens",
        quota.alias("quota"),
        F.floor(quota).cast("bigint").alias("base"),
        (quota - F.floor(quota)).alias("frac"),
    )
    r = f.select(
        "*",
        F.row_number()
        .over(Window.partitionBy().orderBy(F.col("frac").desc(), "source"))
        .alias("frac_rank"),
        (TOKEN_BUDGET - F.sum("base").over(w)).alias("leftover"),
    )
    got = F.col("frac_rank") <= F.col("leftover")
    return r.select(
        "source",
        "n_tokens",
        F.round("quota", 6).alias("quota"),
        (F.col("base") + got.cast("long")).cast("bigint").alias(
            "alloc_tokens"
        ),
        got.alias("got_remainder"),
    )
