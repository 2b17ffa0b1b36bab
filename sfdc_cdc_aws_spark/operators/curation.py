"""Corpus-curation operators, round-3 batch: rule-based quality
gating (the Gopher-rules analog), exact-substring duplicate-span
coverage (the removal metric of suffix-array dedup), and one BPE
merge iteration (tokenizer induction as a corpus aggregate).

All three are pure built-in/HOF plans — zero Python in the hot path —
with DuckDB oracle twins. Thresholds are tuned so the synthetic
corpus splits both ways (a rule that every row passes verifies
nothing; see tests/test_oracle_parity.py + the driver rows).

Reference parity: the reference has no text surface (it forwards CDC
JSON byte-for-byte, worker/lambda/app.py:96-118); this module extends
SURVEY.md §2.9's mandated LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.operators.text import (
    _DUCK_TOKENS,
    _STOPWORDS,
    DUCK_HASH64,
    shared_hash64,
    tokens_col,
)
from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table

# Gopher-style gates, adapted to the synthetic corpus's ranges
# (10..99 words/doc): word-count bounds split the corpus at both
# ends, the stopword gate splits it in the middle, and the
# mean-word-length bounds are the canonical 3..10.
GOPHER_MIN_WORDS = 25
GOPHER_MAX_WORDS = 90
GOPHER_MIN_MWL = 3.0
GOPHER_MAX_MWL = 10.0
GOPHER_MIN_STOPWORDS = 2

SPAN_K = 8  # tokens per exact-substring span

BPE_TOP = 20  # merge candidates reported per iteration

NOVELTY_N = 3  # token n-gram width for cross-doc novelty

MIX_CAP = 3.0  # max upsampling weight per source (max epochs over a source)


@query(
    "gopher_quality_rules",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKENS} AS tk
  FROM documents
),
m AS (
  SELECT doc_id,
         len(tk) AS n_words,
         CAST(length(list_aggregate(tk, 'string_agg', '')) AS DOUBLE)
           / len(tk) AS mean_word_len,
         len(list_distinct(list_filter(tk, x -> x IN {_STOPWORDS})))
           AS n_stop_distinct
  FROM t WHERE len(tk) > 0
)
SELECT doc_id, n_words, mean_word_len, n_stop_distinct,
       n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS}
         AS rule_word_count,
       mean_word_len BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL}
         AS rule_mean_word_len,
       n_stop_distinct >= {GOPHER_MIN_STOPWORDS} AS rule_stopwords,
       (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
         AND (mean_word_len BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL})
         AND n_stop_distinct >= {GOPHER_MIN_STOPWORDS} AS pass_gopher
FROM m
""",
)
def gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rule-based quality gating in the style of the Gopher corpus
    rules: per-document word-count bounds, mean-word-length bounds,
    and a distinct-stopword floor, each reported as its own flag plus
    the conjunction — keeping the flags separate is what makes the
    gate auditable (a curation run reports WHY a doc dropped, not
    just that it did).

    Embarrassingly parallel: one projection over documents, zero
    shuffles, every expression a JVM built-in/HOF. The scan reads
    doc_id+text only. At 100 TB this is a map-only pass whose output
    feeds the cleaning manifest."""
    d = load_table(spark, sf_dir, "documents")
    tk = tokens_col()
    m = d.select(
        "doc_id",
        F.size(tk).alias("n_words"),
        (
            F.length(F.array_join(tk, "")).cast("double") / F.size(tk)
        ).alias("mean_word_len"),
        F.size(
            F.array_distinct(F.filter(tk, lambda x: x.isin(*_STOPWORDS)))
        ).alias("n_stop_distinct"),
    ).where(F.col("n_words") > 0)
    rule_wc = F.col("n_words").between(GOPHER_MIN_WORDS, GOPHER_MAX_WORDS)
    rule_mwl = F.col("mean_word_len").between(GOPHER_MIN_MWL, GOPHER_MAX_MWL)
    rule_sw = F.col("n_stop_distinct") >= GOPHER_MIN_STOPWORDS
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "n_stop_distinct",
        rule_wc.alias("rule_word_count"),
        rule_mwl.alias("rule_mean_word_len"),
        rule_sw.alias("rule_stopwords"),
        (rule_wc & rule_mwl & rule_sw).alias("pass_gopher"),
    )


@query(
    "dup_span_coverage",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents
),
sp AS (
  SELECT doc_id,
         {DUCK_HASH64.format(
             expr="list_aggregate(tk[i:i+" + str(SPAN_K - 1) + "], 'string_agg', ' ')"
         )} AS h
  FROM (SELECT doc_id, tk,
               unnest(generate_series(1, len(tk) - {SPAN_K - 1})) AS i
        FROM t WHERE len(tk) >= {SPAN_K})
),
nd AS (
  SELECT h, count(DISTINCT doc_id) AS n_docs FROM sp GROUP BY h
)
SELECT sp.doc_id,
       count(*) AS n_spans,
       CAST(sum(CASE WHEN nd.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       CAST(sum(CASE WHEN nd.n_docs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS dup_frac
FROM sp JOIN nd ON nd.h = sp.h
GROUP BY sp.doc_id
""",
)
def dup_span_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring duplicate coverage — the removal metric of
    suffix-array dedup (every {SPAN_K}-token sliding span is hashed;
    a span occurring in ≥2 distinct documents is "duplicated text"),
    reported per document as the fraction of its spans that are
    duplicated. Unlike pairwise dedup (minhash/ngram-jaccard), this
    measures HOW MUCH of each doc is boilerplate, which is what the
    cut-or-keep decision actually needs.

    Plan: spans leave the tokenizer as (hash, doc_id) — 16 bytes per
    span, never text — and the corpus is scanned ONCE: the spans
    collapse to (h, doc_id, occurrences) with a map-side partial (the
    within-doc repeat combine), the per-hash distinct-doc count is
    then just a row count per h — a JVM window over the already
    hash-partitioned aggregate, no self-join and no second tokenize
    pass — and the final per-doc rollup sums occurrence counts. The
    unique-span tail dies at the first combine at scale."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens_col().alias("tk")).where(
        F.size("tk") >= SPAN_K
    )
    sp = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(1), F.size("tk") - (SPAN_K - 1))).alias("i"),
        "tk",
    ).select(
        "doc_id",
        shared_hash64(F.array_join(F.slice("tk", F.col("i"), SPAN_K), " ")).alias(
            "h"
        ),
    )
    per_doc_hash = sp.groupBy("h", "doc_id").agg(F.count("*").alias("occ"))
    with_nd = per_doc_hash.withColumn(
        "n_docs", F.count("*").over(Window.partitionBy("h"))
    )
    dup_occ = F.when(F.col("n_docs") >= 2, F.col("occ")).otherwise(0)
    return with_nd.groupBy("doc_id").agg(
        F.sum("occ").cast("bigint").alias("n_spans"),
        F.sum(dup_occ).cast("bigint").alias("n_dup_spans"),
        (F.sum(dup_occ).cast("double") / F.sum("occ")).alias("dup_frac"),
    )


@query(
    "bpe_merge_step",
    oracle=f"""
WITH wc AS (
  SELECT token, count(*) AS freq
  FROM (SELECT unnest({_DUCK_TOKENS}) AS token FROM documents)
  GROUP BY token
),
pairs AS (
  SELECT substr(token, i, 2) AS pair, sum(freq) AS cnt
  FROM (SELECT token, freq,
               unnest(generate_series(1, length(token) - 1)) AS i
        FROM wc WHERE length(token) >= 2)
  GROUP BY pair
)
SELECT merge_rank, pair, cnt FROM (
  SELECT pair, CAST(cnt AS BIGINT) AS cnt,
         row_number() OVER (ORDER BY cnt DESC, pair) AS merge_rank
  FROM pairs
) WHERE merge_rank <= {BPE_TOP}
""",
)
def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One byte-pair-encoding merge iteration as a corpus aggregate:
    count adjacent symbol pairs inside every word, weighted by word
    frequency, and emit the top-{BPE_TOP} merge candidates — the unit
    of work a distributed tokenizer trainer repeats (like
    kmeans_lloyd_step, the driver of the loop stays outside; each
    iteration is one declarative plan over the updated symbol table).

    Plan: word frequencies are one map-side-partial aggregate (the
    shuffle carries the corpus VOCABULARY, not tokens); pair explosion
    runs over |vocab| rows, so its cost is independent of corpus row
    count; the final ranking window runs over |distinct char pairs|
    rows (bounded by alphabet², ~1k) — a deliberate single-partition
    window over a provably tiny relation. Ties break on the pair
    string so the ranking is total and replayable."""
    d = load_table(spark, sf_dir, "documents")
    wc = (
        d.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
        .where(F.length("token") >= 2)
    )
    pairs = (
        wc.select(
            F.explode(
                F.expr("transform(sequence(1, length(token) - 1), "
                       "i -> substring(token, i, 2))")
            ).alias("pair"),
            "freq",
        )
        .groupBy("pair")
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair"))
    return (
        pairs.withColumn("merge_rank", F.row_number().over(w))
        .where(F.col("merge_rank") <= BPE_TOP)
        .select("merge_rank", "pair", "cnt")
    )


@query(
    "ngram_novelty",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents
),
g AS (
  SELECT DISTINCT doc_id,
         {DUCK_HASH64.format(
             expr="list_aggregate(tk[i:i+" + str(NOVELTY_N - 1) + "], 'string_agg', ' ')"
         )} AS h
  FROM (SELECT doc_id, tk,
               unnest(generate_series(1, len(tk) - {NOVELTY_N - 1})) AS i
        FROM t WHERE len(tk) >= {NOVELTY_N})
),
f AS (SELECT h, min(doc_id) AS first_doc FROM g GROUP BY h)
SELECT g.doc_id,
       count(*) AS n_ngrams,
       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         / count(*) AS novelty_frac
FROM g JOIN f ON f.h = g.h
GROUP BY g.doc_id
""",
)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document n-gram novelty: for each document, the fraction
    of its distinct {NOVELTY_N}-gram hashes whose FIRST corpus
    occurrence (min doc_id) is this document — the per-doc "new
    information" signal a curation pass uses to rank near-boilerplate
    documents below genuinely novel ones (the streaming analog is
    what dedup-aware samplers call first-writer-wins attribution).

    Plan: grams leave the scan as per-doc DISTINCT 8-byte hashes
    (`array_distinct` runs narrow, inside the row, before the
    explode — no dedup shuffle), so the one shuffle carries
    (h, doc_id) pairs only. The first-writer doc is a `min` window
    over the hash partition of that same shuffle output — no
    self-join, no second scan — and the per-doc rollup is a map-side
    partial count. Nothing in the plan holds text after tokenize.

    Reference parity: no text surface in the reference (the Lambda
    forwards CDC JSON bytes, worker/lambda/app.py:96-118); this
    extends SURVEY.md §2.9's curation battery."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens_col().alias("tk")).where(
        F.size("tk") >= NOVELTY_N
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(1), F.size("tk") - (NOVELTY_N - 1)),
                    lambda i: shared_hash64(
                        F.array_join(F.slice("tk", i, NOVELTY_N), " ")
                    ),
                )
            )
        ).alias("h"),
    )
    first = F.min("doc_id").over(Window.partitionBy("h"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        grams.withColumn("first_doc", first)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_ngrams"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            (F.sum(novel).cast("double") / F.count("*")).alias("novelty_frac"),
        )
    )


@query(
    "mixture_reweight",
    oracle=f"""
WITH s AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len({_DUCK_TOKENS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER () AS actual_share,
       least({MIX_CAP}, (1.0 / count(*) OVER ())
         / (CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER ())) AS weight,
       (1.0 / count(*) OVER ())
         / (CAST(n_tokens AS DOUBLE) / sum(n_tokens) OVER ()) > {MIX_CAP}
         AS capped
FROM s
""",
)
def mixture_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture reweighting: per-source token shares and the
    sampling weight that moves the mixture toward a uniform
    target share per source, capped at {MIX_CAP}× (the "max epochs"
    guard every mixture spec carries so a tiny source can't be
    upsampled without bound). `capped = true` rows are the sources
    where the target is unreachable under the cap — surfaced, never
    silently clipped.

    Plan: one map-side-partial aggregate over documents (the shuffle
    carries one row per source), then share/weight arithmetic as
    window functions over the |sources|-row aggregate — a deliberate
    single-partition window over a provably tiny metadata relation
    (same posture as bpe_merge_step's final ranking)."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_col())).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy()
    share = F.col("n_tokens").cast("double") / F.sum("n_tokens").over(w)
    raw = (F.lit(1.0) / F.count("*").over(w)) / share
    return s.select(
        "source",
        "n_docs",
        "n_tokens",
        share.alias("actual_share"),
        F.least(F.lit(MIX_CAP), raw).alias("weight"),
        (raw > MIX_CAP).alias("capped"),
    )


@query(
    "quality_rule_ablation",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {_DUCK_TOKENS} AS tk
  FROM documents
),
m AS (
  SELECT doc_id,
         len(tk) AS n_words,
         CAST(length(list_aggregate(tk, 'string_agg', '')) AS DOUBLE)
           / len(tk) AS mean_word_len,
         len(list_distinct(list_filter(tk, x -> x IN {_STOPWORDS})))
           AS n_stop_distinct
  FROM t WHERE len(tk) > 0
),
f AS (
  SELECT (n_words BETWEEN {GOPHER_MIN_WORDS} AND {GOPHER_MAX_WORDS})
           AS r_wc,
         (mean_word_len BETWEEN {GOPHER_MIN_MWL} AND {GOPHER_MAX_MWL})
           AS r_mwl,
         (n_stop_distinct >= {GOPHER_MIN_STOPWORDS}) AS r_sw
  FROM m
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CASE WHEN r_wc AND r_mwl AND r_sw THEN 1 ELSE 0 END)
              AS BIGINT) AS n_pass_all,
         CAST(sum(CASE WHEN NOT r_wc THEN 1 ELSE 0 END) AS BIGINT) AS f_wc,
         CAST(sum(CASE WHEN NOT r_mwl THEN 1 ELSE 0 END) AS BIGINT) AS f_mwl,
         CAST(sum(CASE WHEN NOT r_sw THEN 1 ELSE 0 END) AS BIGINT) AS f_sw,
         CAST(sum(CASE WHEN NOT r_wc AND r_mwl AND r_sw THEN 1 ELSE 0 END)
              AS BIGINT) AS o_wc,
         CAST(sum(CASE WHEN r_wc AND NOT r_mwl AND r_sw THEN 1 ELSE 0 END)
              AS BIGINT) AS o_mwl,
         CAST(sum(CASE WHEN r_wc AND r_mwl AND NOT r_sw THEN 1 ELSE 0 END)
              AS BIGINT) AS o_sw
  FROM f
)
SELECT 'word_count' AS rule, f_wc AS n_fail, o_wc AS n_fail_only,
       n_pass_all, n_docs FROM agg
UNION ALL
SELECT 'mean_word_len', f_mwl, o_mwl, n_pass_all, n_docs FROM agg
UNION ALL
SELECT 'stopwords', f_sw, o_sw, n_pass_all, n_docs FROM agg
""",
)
def quality_rule_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-rule ablation of the Gopher quality gate: for each rule,
    how many documents fail it at all (``n_fail``) and how many fail
    ONLY it (``n_fail_only`` — the docs that one rule alone removes
    from the corpus). ``n_fail_only`` is the rule's marginal cost,
    the number a curation review weighs against sample inspections
    before tightening or dropping a threshold; a rule whose
    ``n_fail`` is high but ``n_fail_only`` is ~0 is redundant with
    the rest of the gate. Built ON the registered gate itself
    (gopher_quality_rules' flags feed the aggregate), so the
    ablation can never drift from the gate it audits.

    Plan: the per-doc flag projection is the same zero-shuffle
    map-only pass as the gate; one map-side-partial aggregate
    collapses it to a single row of counters, and the 3-row unpivot
    runs on that scalar relation."""
    flags = gopher_quality_rules(spark, sf_dir).select(
        F.col("rule_word_count").alias("r_wc"),
        F.col("rule_mean_word_len").alias("r_mwl"),
        F.col("rule_stopwords").alias("r_sw"),
    )
    c = lambda cond: F.sum(cond.cast("long"))  # noqa: E731
    agg = flags.agg(
        F.count("*").alias("n_docs"),
        c(F.col("r_wc") & F.col("r_mwl") & F.col("r_sw")).alias("n_pass_all"),
        c(~F.col("r_wc")).alias("f_wc"),
        c(~F.col("r_mwl")).alias("f_mwl"),
        c(~F.col("r_sw")).alias("f_sw"),
        c(~F.col("r_wc") & F.col("r_mwl") & F.col("r_sw")).alias("o_wc"),
        c(F.col("r_wc") & ~F.col("r_mwl") & F.col("r_sw")).alias("o_mwl"),
        c(F.col("r_wc") & F.col("r_mwl") & ~F.col("r_sw")).alias("o_sw"),
    )
    return agg.selectExpr(
        """stack(3,
             'word_count', f_wc, o_wc,
             'mean_word_len', f_mwl, o_mwl,
             'stopwords', f_sw, o_sw
           ) AS (rule, n_fail, n_fail_only)""",
        "n_pass_all",
        "n_docs",
    )


@query(
    "dataset_card_stats",
    oracle=f"""
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(len({_DUCK_TOKENS})) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       round(avg(n_chars), 6) AS mean_chars,
       round(1.0 - count(DISTINCT md5(lower(trim(text)))) * 1.0 / count(*), 6)
         AS dup_rate
FROM documents
GROUP BY source
""",
)
def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card, computed not written: per source, the
    headline numbers a corpus release documents — document and token
    counts, language spread, mean document length, and the
    exact-duplicate rate (1 − distinct normalized hashes / docs).
    Every number is derived from the corpus by the engine itself, so
    the card is reproducible and can gate a release (e.g. fail the
    publish if dup_rate regresses) instead of being hand-maintained
    prose.

    Plan: ONE aggregation over the documents scan — token counts are
    computed narrow per row, and the two count-distincts (lang, text
    hash) expand inside the same grouped aggregate; the shuffle
    carries per-source partials. At 100 TB this is the same plan per
    (source, snapshot-date) partition."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(tokens_col())).alias("n_tokens"),
        F.countDistinct("lang").alias("n_langs"),
        F.round(F.avg("n_chars"), 6).alias("mean_chars"),
        F.round(
            1.0
            - F.countDistinct(F.md5(F.lower(F.trim(F.col("text")))))
            / F.count("*"),
            6,
        ).alias("dup_rate"),
    )
