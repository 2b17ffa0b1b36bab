"""Sub-document operators: sliding-window chunking, sentence-level
dedup, and winnowing (MOSS-style) fingerprints.

The dedup/fingerprint family in operators/dedup.py works at document
granularity; a pretraining pipeline also needs the level below it —
chunking long documents into model-window pieces, and finding
duplication at sentence/passage granularity (boilerplate, quotes,
license headers) that whole-document hashes can't see.

Scale posture: everything explodes to narrow rows (doc_id, pos,
64-bit hash ≈ 24 bytes) before any shuffle; chunk/shingle text never
shuffles. Token arrays are materialized ONCE per document behind a
Generate (explode) barrier — the higher-order-function re-evaluation
trap (transform re-running the tokenizer per element, the round-1
16× MinHash bug) cannot reach across a Generate node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# Exact-substring dedup spans reuse curation.SPAN_K so
# dup_span_coverage (the measure) and exact_substring_dedup (the
# rewrite) agree on what "duplicated" means.
from sfdc_cdc_aws_spark.operators.curation import SPAN_K as EXSUB_K
from sfdc_cdc_aws_spark.operators.text import (
    DUCK_HASH64,
    _DUCK_TOKENS,
    shared_hash64,
    tokens_col,
)
from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table

# Model-window chunking: 64-token chunks, stride 48 (16-token overlap)
CHUNK = 64
STRIDE = 48

# Winnowing: 4-token shingles, window 5 (guarantee: any 8-token match
# shares a fingerprint)
WIN_K = 4
WIN_W = 5

# Line-level dedup: the corpus has no newlines, so a "line" is a
# fixed non-overlapping LINE_TOKENS-token segment; a line appearing
# in >= LINE_DUP_MIN_DOCS distinct documents is boilerplate and is
# removed from EVERY document (the C4/CCNet/RefinedWeb convention).
# 4-token lines split the synthetic corpus both ways at every SF
# (~11% of occurrences drop at sf0.001) — a threshold nothing (or
# everything) hits verifies nothing.
LINE_TOKENS = 4
LINE_DUP_MIN_DOCS = 2


@query(
    "chunk_overlap",
    oracle=f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
nz AS (
  SELECT doc_id, t,
         CAST(ceil(greatest(len(t) - {CHUNK}, 0) / {STRIDE}.0) AS INT) + 1 AS nch
  FROM toks WHERE len(t) >= 1
)
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
       len(list_slice(t, i * {STRIDE} + 1, i * {STRIDE} + {CHUNK})) AS n_tokens,
       {DUCK_HASH64.format(expr=f"array_to_string(list_slice(t, i * {STRIDE} + 1, i * {STRIDE} + {CHUNK}), ' ')")} AS chunk_hash
FROM (SELECT doc_id, t, unnest(generate_series(0, CAST(nch - 1 AS BIGINT))) AS i
      FROM nz)
""",
)
def chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking: 64-token chunks at stride 48, the
    standard long-document → model-window fan-out. The token array is
    computed once per document (projection below the explode barrier);
    each output row then slices the materialized array — no
    re-tokenization per chunk. Only (doc_id, idx, len, hash) leaves
    the operator; chunk text stays inside the stage. Embarrassingly
    parallel: zero shuffles."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", tokens_col().alias("t"))
        .where(F.size("t") >= 1)
        .withColumn(
            "nch",
            (
                F.ceil(F.greatest(F.size("t") - CHUNK, F.lit(0)) / F.lit(float(STRIDE)))
            ).cast("int")
            + 1,
        )
    )
    chunked = toks.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(0), F.col("nch") - 1)).alias("chunk_idx"),
    )
    sl = F.slice(F.col("t"), F.col("chunk_idx") * STRIDE + 1, CHUNK)
    return chunked.select(
        "doc_id",
        "chunk_idx",
        F.size(sl).alias("n_tokens"),
        shared_hash64(F.array_join(sl, " ")).alias("chunk_hash"),
    )


@query(
    "sentence_dedup",
    oracle=f"""
WITH sents AS (
  SELECT doc_id, trim(s) AS sent
  FROM (SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[.!?]+')) AS s
        FROM documents)
  WHERE length(trim(s)) >= 20
)
SELECT {DUCK_HASH64.format(expr="sent")} AS sent_hash,
       count(DISTINCT doc_id) AS n_docs,
       count(*) AS n_occ
FROM sents
GROUP BY sent_hash
HAVING count(DISTINCT doc_id) >= 2
""",
)
def sentence_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-granularity exact dedup: split on sentence breaks,
    normalize, hash, and report every sentence appearing in ≥2
    distinct documents — the boilerplate/quote/license-header detector
    that document-level dedup can't see. The shuffle carries (hash,
    doc_id) pairs only — 16 bytes per sentence occurrence, never the
    text. At 100 TB the HAVING filter drops the long unique tail at
    the reducer; the surviving head (true boilerplate) is tiny."""
    d = load_table(spark, sf_dir, "documents")
    sents = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), r"[.!?]+")).alias("s"),
        )
        .select("doc_id", F.trim("s").alias("sent"))
        .where(F.length("sent") >= 20)
    )
    return (
        sents.select(shared_hash64(F.col("sent")).alias("sent_hash"), "doc_id")
        .groupBy("sent_hash")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
        )
        .where(F.col("n_docs") >= 2)
    )


@query(
    "line_dedup_corpus",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents),
seg AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         array_to_string(
           list_slice(tk, (i - 1) * {LINE_TOKENS} + 1, i * {LINE_TOKENS}),
           ' ') AS line
  FROM (SELECT doc_id, tk,
               unnest(generate_series(
                 1, CAST(ceil(len(tk) / {LINE_TOKENS}.0) AS BIGINT))) AS i
        FROM t WHERE len(tk) >= 1)
),
h AS (SELECT doc_id, pos, line,
             {DUCK_HASH64.format(expr='line')} AS h
      FROM seg),
boiler AS (
  SELECT h FROM h GROUP BY h
  HAVING count(DISTINCT doc_id) >= {LINE_DUP_MIN_DOCS}
),
flagged AS (
  SELECT s.doc_id, s.pos, s.line, b.h IS NOT NULL AS dup
  FROM h s LEFT JOIN boiler b USING (h)
)
SELECT doc_id,
       count(*) AS n_lines,
       CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       CAST(count(*) - sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       {DUCK_HASH64.format(
           expr="coalesce(string_agg(CASE WHEN NOT dup THEN line END,"
                " ' ' ORDER BY pos), '')")} AS new_text_hash
FROM flagged GROUP BY doc_id
""",
)
def line_dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level corpus dedup — the C4/CCNet/RefinedWeb boilerplate
    step the document-granularity family can't do: any line
    (non-overlapping {LINE_TOKENS}-token segment; see LINE_TOKENS
    above) occurring in ≥{LINE_DUP_MIN_DOCS} distinct documents is
    removed from every document, and each document is REWRITTEN from
    its surviving lines in order. Unlike ``sentence_dedup`` (which
    detects duplication) this emits the transformed training text:
    per-doc total/kept/dropped line counts plus the 64-bit hash of
    the rewritten text — the detect→act closure for sub-document
    dedup, the way dedup_keep_best closed it for whole documents.
    Zero-token documents have no lines and are not emitted.

    Plan: lines are hashed at birth, so the boilerplate aggregate and
    the back-join both shuffle narrow (hash, doc_id) rows; line TEXT
    shuffles once, inside the per-doc reassembly aggregate (24-byte
    average lines — bounded by LINE_TOKENS, never whole documents).
    The HAVING filter drops the long unique tail at the reducer; at
    100 TB the surviving boilerplate head (nav bars, footers, license
    headers) is tiny relative to the corpus, and every stage is a
    plain hash-keyed aggregate or join — nothing is iterative,
    nothing collects."""
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", tokens_col().alias("t"))
        .where(F.size("t") >= 1)
        .withColumn(
            "nl",
            F.ceil(F.size("t") / F.lit(float(LINE_TOKENS))).cast("int"),
        )
    )
    seg = toks.select(
        "doc_id",
        "t",
        F.explode(F.sequence(F.lit(1), F.col("nl"))).alias("pos"),
    )
    sl = F.slice(F.col("t"), (F.col("pos") - 1) * LINE_TOKENS + 1, LINE_TOKENS)
    lines = seg.select(
        "doc_id",
        "pos",
        F.array_join(sl, " ").alias("line"),
    ).withColumn("h", shared_hash64(F.col("line")))
    boiler = (
        lines.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= LINE_DUP_MIN_DOCS)
        .select("h", F.lit(True).alias("dup"))
    )
    flagged = lines.join(boiler, "h", "left")
    # collect_list skips the nulls when() produces for dropped lines;
    # sort_array orders the kept structs by pos (unique per doc)
    kept = F.sort_array(
        F.collect_list(
            F.when(F.col("dup").isNull(), F.struct("pos", "line"))
        )
    )
    agg = flagged.groupBy("doc_id").agg(
        F.count("*").alias("n_lines"),
        F.sum(F.col("dup").isNotNull().cast("long")).alias("n_dropped"),
        kept.alias("kept_structs"),
    )
    new_text = F.array_join(
        F.transform("kept_structs", lambda s: s.line), " "
    )
    return agg.select(
        "doc_id",
        "n_lines",
        "n_dropped",
        (F.col("n_lines") - F.col("n_dropped")).alias("n_kept"),
        shared_hash64(new_text).alias("new_text_hash"),
    )


@query(
    "winnow_fingerprints",
    oracle=f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
sh AS (
  SELECT doc_id, i AS pos, len(t) - {WIN_K} + 1 AS nsh,
         {DUCK_HASH64.format(expr="t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]")} AS h
  FROM (SELECT doc_id, t,
               unnest(generate_series(1, CAST(len(t) - {WIN_K} + 1 AS BIGINT))) AS i
        FROM toks WHERE len(t) >= {WIN_K})
),
wm AS (
  SELECT doc_id, pos, nsh,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {WIN_W - 1} FOLLOWING) AS fp
  FROM sh
),
fps AS (SELECT DISTINCT doc_id, fp FROM wm WHERE pos <= nsh - {WIN_W} + 1)
SELECT doc_id, count(*) AS n_fps, bit_xor(fp) AS fp_xor
FROM fps GROUP BY doc_id
""",
)
def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every 4-token shingle, then
    keep the minimum hash of each 5-shingle window; the distinct
    window-minima are the fingerprint set, guaranteeing any shared
    run of ≥8 tokens between two documents shares a fingerprint.

    Spark shape: shingles come from posexplode + 3 ``lead``s (the
    token array materializes once behind the explode; no per-element
    re-tokenization), the window minimum is a plain ROWS frame — all
    JVM window machinery, no Python. The one shuffle partitions
    24-byte (doc_id, pos, hash) rows by doc_id; shingle TEXT never
    shuffles. Output is one (n_fps, checksum) row per doc."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", tokens_col().alias("t")).where(F.size("t") >= WIN_K)
    ex = toks.select(
        "doc_id",
        (F.size("t") - WIN_K + 1).alias("nsh"),
        F.posexplode("t").alias("pos0", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos0")
    shingle = F.concat_ws(
        " ",
        F.col("tok"),
        *[F.lead("tok", i).over(w) for i in range(1, WIN_K)],
    )
    sh = (
        ex.select(
            "doc_id",
            "nsh",
            (F.col("pos0") + 1).alias("pos"),
            F.lead("tok", WIN_K - 1).over(w).isNotNull().alias("full"),
            shared_hash64(shingle).alias("h"),
        )
        .where(F.col("full"))
        .drop("full")
    )
    wmin = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, WIN_W - 1)
    fps = (
        sh.select(
            "doc_id",
            "pos",
            "nsh",
            F.min("h").over(wmin).alias("fp"),
        )
        .where(F.col("pos") <= F.col("nsh") - WIN_W + 1)
        .select("doc_id", "fp")
        .distinct()
    )
    return fps.groupBy("doc_id").agg(
        F.count("*").alias("n_fps"),
        F.bit_xor("fp").alias("fp_xor"),
    )


# Canonical-occurrence election uses min over a (doc_id, pos) STRUCT
# (lexicographic struct comparison — identical semantics in Spark and
# DuckDB), not a packed bigint: packing would silently collide across
# doc boundaries the day a document exceeds the stride.


@query(
    "exact_substring_dedup",
    oracle=f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents),
base AS (SELECT doc_id, tk, len(tk) AS n FROM t WHERE len(tk) >= 1),
sp AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         {DUCK_HASH64.format(
             expr="list_aggregate(tk[i:i+" + str(EXSUB_K - 1) + "], 'string_agg', ' ')"
         )} AS h
  FROM (SELECT doc_id, tk,
               unnest(generate_series(1, len(tk) - {EXSUB_K - 1})) AS i
        FROM base WHERE n >= {EXSUB_K})
),
dup AS (
  SELECT h, min(struct_pack(d := doc_id, p := pos)) AS keep
  FROM sp GROUP BY h
  HAVING count(DISTINCT doc_id) >= 2
),
cov AS (
  SELECT DISTINCT doc_id, CAST(j AS BIGINT) AS idx FROM (
    SELECT sp.doc_id,
           unnest(generate_series(sp.pos, sp.pos + {EXSUB_K - 1})) AS j
    FROM sp JOIN dup USING (h)
    WHERE NOT (sp.doc_id = (dup.keep).d AND sp.pos = (dup.keep).p))
),
tok AS (
  SELECT doc_id, CAST(i AS BIGINT) AS idx, tk[CAST(i AS INT)] AS tok
  FROM (SELECT doc_id, tk, unnest(generate_series(1, len(tk))) AS i
        FROM base)
),
kept AS (
  SELECT tok.doc_id, tok.idx, tok.tok
  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.idx = cov.idx
  WHERE cov.idx IS NULL
)
SELECT base.doc_id,
       base.n AS n_tokens,
       CAST(base.n - count(kept.idx) AS BIGINT) AS n_removed,
       CAST(count(kept.idx) AS BIGINT) AS n_kept,
       {DUCK_HASH64.format(
           expr="coalesce(string_agg(kept.tok, ' ' ORDER BY kept.idx), '')"
       )} AS new_text_hash
FROM base LEFT JOIN kept ON base.doc_id = kept.doc_id
GROUP BY base.doc_id, base.n
""",
)
def exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup that REWRITES (Lee et al., ACL 2022):
    every {EXSUB_K}-token sliding span occurring in ≥2 distinct
    documents is duplicated text; all its occurrences except the
    globally-first (lexicographic min over a (doc_id, pos) struct —
    the paper keeps exactly one copy) have their token positions
    removed, and each
    document is rewritten from the surviving tokens in order. The
    detect→act closure of ``dup_span_coverage`` (which measures span
    duplication but leaves the text alone), at span rather than
    line granularity — overlapping duplicated spans merge through
    the position-set union, so removal is maximal-run, not
    per-span.

    Plan: spans leave the tokenizer as narrow (doc_id, pos, hash)
    rows; the duplicated head is a hash-keyed aggregate whose HAVING
    drops the long unique tail at the reducer, so the cov join's
    build side is the boilerplate head only (broadcastable at any
    scale — AQE handles it here). Coverage explodes ONLY duplicated
    occurrences ({EXSUB_K}× a small relation, never the corpus);
    the token stream shuffles once on (doc_id, idx) for the
    anti-join and once on doc_id for reassembly — both rows of
    ≤~32 bytes. Nothing iterative, nothing collected."""
    from sfdc_cdc_aws_spark.session import truncate_lineage

    d = load_table(spark, sf_dir, "documents")
    # tokenize ONCE: three consumers (span hashing, token reassembly,
    # the per-doc size anchor) otherwise each re-run the regex
    # tokenizer over the corpus (the ngram_jaccard/allpairs
    # discipline)
    base = truncate_lineage(
        d.select("doc_id", tokens_col().alias("t")).where(F.size("t") >= 1)
    )
    # hash every sliding span ONCE: both the duplicated-head aggregate
    # and the coverage join consume this relation, and the md5-per-span
    # map is the key's dominant CPU
    spans = truncate_lineage(
        base.where(F.size("t") >= EXSUB_K)
        .select(
            "doc_id",
            "t",
            F.explode(
                F.sequence(F.lit(1), F.size("t") - (EXSUB_K - 1))
            ).alias("pos"),
        )
        .select(
            "doc_id",
            F.col("pos").cast("long").alias("pos"),
            shared_hash64(
                F.array_join(F.slice("t", F.col("pos"), EXSUB_K), " ")
            ).alias("h"),
        )
    )
    dup = (
        spans.groupBy("h")
        .agg(
            F.count_distinct("doc_id").alias("nd"),
            F.min(F.struct("doc_id", "pos")).alias("keep"),
        )
        .where(F.col("nd") >= 2)
        .select("h", "keep")
    )
    cov = (
        spans.join(dup, "h")
        .where(
            ~(
                (F.col("doc_id") == F.col("keep.doc_id"))
                & (F.col("pos") == F.col("keep.pos"))
            )
        )
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (EXSUB_K - 1))
            ).alias("idx"),
        )
        .distinct()
    )
    tok = base.select(
        "doc_id", F.posexplode("t").alias("i", "tok")
    ).select("doc_id", (F.col("i") + 1).cast("long").alias("idx"), "tok")
    kept_agg = (
        tok.join(cov, ["doc_id", "idx"], "left_anti")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_kept"),
            F.sort_array(F.collect_list(F.struct("idx", "tok"))).alias("ks"),
        )
    )
    new_text = F.array_join(F.transform("ks", lambda s: s.tok), " ")
    return (
        base.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
        .join(kept_agg, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (
                F.col("n_tokens") - F.coalesce("n_kept", F.lit(0))
            ).alias("n_removed"),
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            shared_hash64(F.coalesce(new_text, F.lit(""))).alias(
                "new_text_hash"
            ),
        )
    )
