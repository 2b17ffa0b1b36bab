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
from sfdc_cdc_aws_spark.session import truncate_lineage
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


# ---------------------------------------------------------------------------
# multi-iteration BPE training (the loop bpe_merge_step is one step of)
# ---------------------------------------------------------------------------

N_TRAIN_MERGES = 4  # merges learned by the training loop
# merge application is literal left-to-right replace-all, applied
# MERGE_PASSES times per iteration: one pass leaves every second pair
# of an odd/even run unmerged (the shared-boundary-space effect), a
# second pass converges any run a natural-language vocabulary holds.
# Both engines apply the IDENTICAL pass count, so parity is by
# construction even on adversarial runs.
MERGE_PASSES = 2


def _bpe_train_ctes() -> str:
    """The unrolled N_TRAIN_MERGES-step BPE-training CTE chain (WITH
    w0 … b{N}, w{N} — no final SELECT): each step recounts adjacent
    symbol pairs over the merged vocabulary of the previous step, the
    same fixpoint the Spark loop computes.  Shared by the training
    oracle (reads the b{k} winners) and the encode-apply oracle
    (reads w{N}, the fully-merged vocabulary)."""
    parts = [
        f"""WITH w0 AS (
  SELECT token, CAST(count(*) AS BIGINT) AS freq,
         ' ' || array_to_string(list_transform(generate_series(1, length(token)),
                                               i -> token[i]), ' ') || ' ' AS sym
  FROM (SELECT unnest({_DUCK_TOKENS}) AS token FROM documents)
  GROUP BY token
)"""
    ]
    for k in range(1, N_TRAIN_MERGES + 1):
        pat = f"(SELECT ' ' || l || ' ' || r || ' ' FROM b{k})"
        rep = f"(SELECT ' ' || l || r || ' ' FROM b{k})"
        sym = "sym"
        for _ in range(MERGE_PASSES):
            sym = f"replace({sym}, {pat}, {rep})"
        parts.append(
            f""",
s{k} AS (
  SELECT list_filter(string_split(sym, ' '), x -> x <> '') AS s, freq
  FROM w{k - 1}
),
p{k} AS (
  SELECT s[i] AS l, s[i + 1] AS r, CAST(sum(freq) AS BIGINT) AS cnt
  FROM (SELECT s, freq, unnest(generate_series(1, len(s) - 1)) AS i
        FROM s{k} WHERE len(s) >= 2)
  GROUP BY 1, 2
),
b{k} AS (SELECT l, r, cnt FROM p{k} ORDER BY cnt DESC, l, r LIMIT 1),
w{k} AS (SELECT token, freq, {sym} AS sym FROM w{k - 1})"""
        )
    return "".join(parts)


def _bpe_train_oracle() -> str:
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS merge_rank, l AS left_sym, r AS right_sym, "
        f"l || r AS merged, cnt FROM b{k}"
        for k in range(1, N_TRAIN_MERGES + 1)
    )
    return f"{_bpe_train_ctes()}\n{sel}"


@query("bpe_train_merges", oracle=_bpe_train_oracle())
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE TRAINING, not just one candidate count: learn
    the first N_TRAIN_MERGES merges by iterating (count adjacent
    symbol pairs weighted by word frequency → take the argmax → apply
    the merge to every word) — the actual tokenizer-induction loop,
    where :func:`bpe_merge_step` is the inner aggregate of one pass.

    Plan posture (the kmeans_lloyd_step / connected-components
    discipline for iterative algorithms): the FIRST aggregate reduces
    the corpus to its vocabulary, so every later iteration is
    corpus-size-independent — pair counting and merge application run
    over |vocab| rows only. The driver collects exactly ONE row per
    iteration (the argmax pair — the loop's steering scalar, same
    class as the CC convergence sum), never row data;
    ``localCheckpoint`` truncates the growing replace lineage each
    step. Merge application is a narrow literal ``replace`` over the
    space-joined symbol string (MERGE_PASSES passes, see module
    constant), identical in both engines. Ties break on (cnt DESC,
    left, right) so the learned merge table is total-ordered and
    replayable. At 100 TB only the first aggregate sees data scale;
    the training loop's cost is vocabulary-bounded."""
    d = load_table(spark, sf_dir, "documents")
    chars = F.expr("transform(sequence(1, length(token)), i -> substring(token, i, 1))")
    words = (
        d.select(F.explode(tokens_col()).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("freq"))
        .select(
            "freq",
            F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" ")).alias("sym"),
        )
    )
    words = truncate_lineage(words)
    merges = []
    for k in range(1, N_TRAIN_MERGES + 1):
        syms = words.select(
            F.filter(F.split("sym", " "), lambda x: x != F.lit("")).alias("s"),
            "freq",
        ).where(F.size("s") >= 2)
        pair_structs = F.expr(
            "transform(sequence(1, size(s) - 1), "
            "i -> struct(element_at(s, i) AS l, element_at(s, i + 1) AS r))"
        )
        pairs = (
            syms.select(F.explode(pair_structs).alias("p"), "freq")
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("freq").cast("bigint").alias("cnt"))
        )
        best = pairs.orderBy(F.col("cnt").desc(), "l", "r").first()
        left, right, cnt = best["l"], best["r"], best["cnt"]
        merges.append((k, left, right, left + right, cnt))
        new_sym = F.col("sym")
        for _ in range(MERGE_PASSES):
            new_sym = F.replace(
                new_sym, F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
            )
        words = truncate_lineage(words.select("freq", new_sym.alias("sym")))
    return spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, merged string, cnt bigint",
    )


def _bpe_apply_oracle() -> str:
    """Encode-apply oracle: run the identical training chain, then
    tokenize every document against the FINAL merged vocabulary
    w{N_TRAIN_MERGES} — per doc, words looked up in the vocabulary
    and their post-merge symbol counts summed."""
    w = f"w{N_TRAIN_MERGES}"
    units = "len(list_filter(string_split(w.sym, ' '), x -> x <> ''))"
    return f"""{_bpe_train_ctes()},
tok AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS token FROM documents)
SELECT t.doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum({units}) AS BIGINT) AS n_bpe_units,
       round(CAST(sum({units}) AS DOUBLE) / count(*), 6) AS units_per_word
FROM tok t JOIN {w} w ON t.token = w.token
GROUP BY t.doc_id
"""


@query("bpe_encode_apply", oracle=_bpe_apply_oracle())
def bpe_encode_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer APPLICATION at corpus scale — the second half of the
    BPE story (:func:`bpe_train_merges` learns the merge table, this
    key encodes with it): every document re-tokenized under the
    learned merges, emitting per-doc word count, post-merge BPE unit
    count, and the units-per-word fertility a tokenizer team actually
    tracks.

    Plan: the learned table is N_TRAIN_MERGES rows (collected once —
    the bounded model side-input, same class as the classifier
    weights in :func:`hash_ngram_classify`); merge application is a
    narrow chain of literal ``replace`` calls (N_TRAIN_MERGES ×
    MERGE_PASSES, identical to training) applied ONCE PER DISTINCT
    TOKEN — the vocabulary relation, Heaps-law-bounded, NOT the
    corpus — then broadcast-joined back to the exploded corpus, so
    the per-occurrence work is an 8-byte lookup.  The final aggregate
    is map-side combinable per doc_id.  At 100 TB the encode cost is
    scan + broadcast-join + partial agg; the replace chain's cost
    rides on |vocab|, invariant to corpus replication."""
    merges = [
        (r["left_sym"], r["right_sym"])
        for r in bpe_train_merges(spark, sf_dir).orderBy("merge_rank").collect()
    ]
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col()).alias("token"))
    chars = F.expr("transform(sequence(1, length(token)), i -> substring(token, i, 1))")
    sym = F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" "))
    for left, right in merges:
        for _ in range(MERGE_PASSES):
            sym = F.replace(sym, F.lit(f" {left} {right} "), F.lit(f" {left}{right} "))
    vocab = tok.select("token").distinct().select(
        "token",
        F.size(F.filter(F.split(sym, " "), lambda x: x != F.lit(""))).alias("n_units"),
    )
    return (
        tok.join(F.broadcast(vocab), "token")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_units").cast("bigint").alias("n_bpe_units"),
            F.round(
                F.sum("n_units").cast("double") / F.count("*"), 6
            ).alias("units_per_word"),
        )
    )


# ---------------------------------------------------------------------------
# hashed-n-gram linear classifier inference (the fastText-style
# quality-filter shape of CCNet / GPT-3-era curation)
# ---------------------------------------------------------------------------

N_HASH_BUCKETS = 256  # feature-hash dimensionality (≤ embeddings rows)


@query(
    "hash_ngram_classify",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents),
grams AS (
  SELECT doc_id, unnest(tk) AS g FROM t
  UNION ALL
  SELECT doc_id, tk[i] || '_' || tk[i + 1] AS g
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk) - 1)) AS i
        FROM t WHERE len(tk) >= 2)
),
feats AS (
  SELECT doc_id, {DUCK_HASH64.format(expr='g')} % {N_HASH_BUCKETS} AS bucket
  FROM grams
),
wt AS (
  SELECT vec_id AS bucket, round(CAST(embedding[1] AS DOUBLE), 3) AS w
  FROM embeddings WHERE vec_id < {N_HASH_BUCKETS}
)
SELECT f.doc_id,
       CAST(count(*) AS BIGINT) AS n_feats,
       round(sum(w.w), 6) AS score,
       CAST(CASE WHEN round(sum(w.w), 6) > 0 THEN 1 ELSE 0 END AS INT) AS pred
FROM feats f JOIN wt w USING (bucket)
GROUP BY f.doc_id
""",
)
def hash_ngram_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-classifier INFERENCE over hashed bag-of-n-grams — the
    fastText-style quality-filter shape LLM curation pipelines run at
    corpus scale (CCNet's language-model filter, the GPT-3 quality
    classifier): unigram + bigram features hashed into N_HASH_BUCKETS
    dimensions, a per-feature weight looked up from a model table,
    summed per document, thresholded into a keep/drop prediction.
    Weights are a deterministic stand-in (first embedding component of
    the matching vec_id, rounded to 3 dp) so both engines read the
    same model from the same parquet.

    Plan: feature hashing is narrow (the md5-based shared hash, so
    the shuffle never carries gram STRINGS — 8-byte bucket ids only);
    the weight table is N_HASH_BUCKETS rows and explicitly
    ``broadcast()``; scoring is ONE map-side-combinable aggregate.
    The score is rounded to 6 dp BEFORE thresholding on both engines
    so a boundary document cannot classify differently. At 100 TB
    this is a scan + broadcast-join + partial agg — no wide shuffle
    of features, only per-doc partial sums."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens_col().alias("tk"))
    uni = toks.select("doc_id", F.explode("tk").alias("g"))
    bigrams = F.expr(
        "transform(sequence(1, size(tk) - 1), "
        "i -> concat(element_at(tk, i), '_', element_at(tk, i + 1)))"
    )
    bi = toks.where(F.size("tk") >= 2).select(
        "doc_id", F.explode(bigrams).alias("g")
    )
    feats = uni.unionByName(bi).select(
        "doc_id", (shared_hash64(F.col("g")) % N_HASH_BUCKETS).alias("bucket")
    )
    wt = (
        load_table(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < N_HASH_BUCKETS)
        .select(
            F.col("vec_id").alias("bucket"),
            F.round(F.element_at("embedding", 1).cast("double"), 3).alias("w"),
        )
    )
    scored = (
        feats.join(F.broadcast(wt), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.round(F.sum("w"), 6).alias("score"),
        )
    )
    return scored.select(
        "doc_id",
        "n_feats",
        "score",
        (F.col("score") > 0).cast("int").alias("pred"),
    )
