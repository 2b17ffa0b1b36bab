"""Training-data ASSEMBLY operators — the stage after cleaning/dedup
where a corpus becomes model input: sequence packing, mixture
sampling, and embedding quantization.

These extend the reference's surface in the LLM-pipeline dimension
(SURVEY.md §2.9 charter): the reference ships records to a lake
(worker/app.py:103-109); a training pipeline additionally has to
*assemble* those records into token-budgeted sequences, sample them
to a target source mixture, and compress embedding side-cars for
serving. All three are deterministic (hash-seeded), so each has an
exact DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.operators.text import (
    _DUCK_TOKENS,
    _LANG_MARKERS,
    _STOPWORDS,
    _duck_marker_count,
    DUCK_HASH64,
    shared_hash64,
    tokens_col,
)
from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table

PACK_CAP = 256  # token budget per packed sequence (bin)
PACK_SHARDS = 4  # packing parallelism within a source


@query(
    "pack_sequences",
    oracle=f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, source, doc_id % {PACK_SHARDS} AS shard,
         CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n_tokens,
         row_number() OVER (PARTITION BY source, doc_id % {PACK_SHARDS}
                            ORDER BY doc_id) AS rn
  FROM documents
),
pack AS (
  SELECT source, shard, rn, doc_id, n_tokens,
         CAST(0 AS BIGINT) AS bin_id, n_tokens AS acc
  FROM toks WHERE rn = 1
  UNION ALL
  SELECT t.source, t.shard, t.rn, t.doc_id, t.n_tokens,
         CASE WHEN p.acc + t.n_tokens <= {PACK_CAP}
              THEN p.bin_id ELSE p.bin_id + 1 END,
         CASE WHEN p.acc + t.n_tokens <= {PACK_CAP}
              THEN p.acc + t.n_tokens ELSE t.n_tokens END
  FROM pack p
  JOIN toks t ON t.source = p.source AND t.shard = p.shard AND t.rn = p.rn + 1
)
SELECT doc_id, source, shard, n_tokens, bin_id FROM pack
""",
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: within each (source, shard), walk docs
    in doc_id order and append each to the current bin while the
    running token count stays ≤ PACK_CAP, else open a new bin (an
    oversize doc gets a bin of its own). This is the first-fit packing
    every pretraining pipeline runs to turn ragged documents into
    fixed-budget context windows with minimal padding.

    Scale design: packing is inherently sequential *within* a pack
    unit, so the unit is (source, shard) — shard = doc_id %
    PACK_SHARDS — making the sequential span Θ(rows/sources/shards)
    and the units embarrassingly parallel; ``applyInPandas`` runs one
    Arrow-batched greedy scan per unit (a few integer ops per row —
    the narrow-waist case where per-group Python is fine), and the
    only shuffle is the groupBy that co-locates each unit. The oracle
    states the same spec as a recursive CTE."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        (F.col("doc_id") % PACK_SHARDS).alias("shard"),
        F.size(tokens_col()).cast("bigint").alias("n_tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bins, bin_id, acc = [], 0, None
        for nt in pdf["n_tokens"]:
            if acc is None:  # first doc in the unit
                acc = nt
            elif acc + nt <= PACK_CAP:
                acc += nt
            else:
                bin_id, acc = bin_id + 1, nt
            bins.append(bin_id)
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        return pdf[["doc_id", "source", "shard", "n_tokens", "bin_id"]]

    return toks.groupBy("source", "shard").applyInPandas(
        pack, "doc_id long, source string, shard long, n_tokens long, bin_id long"
    )


# target mixture: keep-rate in permille per source, derived from the
# source's numeric suffix so the spec is engine-independent — sources
# cycle through 50/100/150/200 permille
_MIX_PERMILLE = "(({src_num} % 4 + 1) * 50)"


@query(
    "source_mixture_sample",
    oracle=f"""
SELECT doc_id, source, keep_permille FROM (
  SELECT doc_id, source,
         CAST({_MIX_PERMILLE.format(src_num="CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT)")} AS BIGINT)
           AS keep_permille,
         ({DUCK_HASH64.format(expr="'mix:' || CAST(doc_id AS VARCHAR)")}) % 1000 AS h
  FROM documents
) WHERE h < keep_permille
""",
)
def source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic source-mixture sampling: each source gets a target
    keep-rate (the training-mixture weight) and each doc keeps or
    drops by a salted content hash — so the sample is reproducible
    across runs, engines, and cluster sizes, and composes with
    incremental ingestion (a doc's fate never depends on what else is
    in the batch). Pure map-side filter: no shuffle, no state, scales
    to any corpus size; changing the mixture is a literal edit, not a
    re-shuffle."""
    d = load_table(spark, sf_dir, "documents")
    src_num = F.regexp_extract("source", r"([0-9]+)$", 1).cast("bigint")
    keep = ((src_num % 4 + 1) * 50).cast("bigint")
    h = shared_hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 1000
    return (
        d.select("doc_id", "source", keep.alias("keep_permille"), h.alias("h"))
        .where(F.col("h") < F.col("keep_permille"))
        .drop("h")
    )


# A-ES weighted sampling: per-stratum sample size and the uniform's
# modulus (u = (h % M + 1) / (M + 1) ∈ (0, 1], never exactly 0 so
# ln(u) is finite)
ARES_K = 5
ARES_MOD = 1_000_000


@query(
    "weighted_sample_ares",
    oracle=f"""
WITH keyed AS (
  SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS weight,
         round(ln((({DUCK_HASH64.format(expr="'ares:' || CAST(doc_id AS VARCHAR)")})
                   % {ARES_MOD} + 1) / {ARES_MOD + 1}.0)
               / n_chars, 6) AS k
  FROM documents WHERE n_chars > 0
)
SELECT lang, doc_id, weight, CAST(rn AS INT) AS sample_rank FROM (
  SELECT lang, doc_id, weight,
         row_number() OVER (PARTITION BY lang
                            ORDER BY k DESC, doc_id) AS rn
  FROM keyed
) WHERE rn <= {ARES_K}
""",
)
def weighted_sample_ares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed weighted sampling WITHOUT replacement per stratum —
    the Efraimidis–Spiridonov A-ES scheme every "sample k docs per
    language, proportional to length/quality" request reduces to:
    each doc draws key u^(1/w) (equivalently ln(u)/w, monotone) from
    a salted content-hash uniform, and the per-stratum top-k by key
    IS an exact weighted sample without replacement. Deterministic by
    construction: the sample is reproducible across runs, engines,
    partitionings, and incremental ingestion (a doc's key never
    depends on the rest of the batch — the same property
    :func:`source_mixture_sample` has for Bernoulli sampling, here
    for exact-k).

    Cross-engine discipline: u comes from the shared md5 hash so both
    engines draw the SAME uniform; the key is rounded to 6 dp before
    ranking with a doc_id tiebreak, so a final-ulp ln() difference
    cannot reorder the boundary. Scale shape: per-stratum top-k is a
    rank window partitioned by lang — Spark's WindowGroupLimit keeps
    only k rows per partition before the final sort, so the shuffle
    carries ~k·|strata| candidates, not the corpus; at 100 TB this is
    the textbook one-pass distributed sample (no per-stratum count
    pass, no rejection loop)."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").where(F.col("n_chars") > 0)
    u = (
        shared_hash64(F.concat(F.lit("ares:"), F.col("doc_id").cast("string")))
        % ARES_MOD
        + 1
    ) / F.lit(float(ARES_MOD + 1))
    k = F.round(F.log(u) / F.col("n_chars"), 6)
    rn = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.desc("k"), "doc_id")
    )
    return (
        d.select(
            "lang",
            "doc_id",
            F.col("n_chars").cast("bigint").alias("weight"),
            k.alias("k"),
        )
        .withColumn("sample_rank", rn)
        .where(F.col("sample_rank") <= ARES_K)
        .drop("k")
    )


QUANT_PROBE_DIMS = 8  # dims exposed to the oracle check per vector


@query(
    "vector_quantize_int8",
    oracle=f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
),
m AS (
  SELECT vec_id, emb,
         list_max(list_transform(emb, x -> abs(x))) AS maxabs
  FROM v
)
SELECT m.vec_id AS vec_id, gs.i - 1 AS idx,
       CASE WHEN m.maxabs = 0 THEN 0
            ELSE CAST(round(m.emb[gs.i] * 127.0 / m.maxabs, 0) AS BIGINT)
       END AS qval,
       round(m.maxabs / 127.0, 6) AS scale
FROM m, generate_series(1, {QUANT_PROBE_DIMS}) gs(i)
""",
)
def vector_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column:
    scale = maxabs/127, q_i = round(x_i/scale) — the 4× memory/IO
    compression every large-scale ANN index applies before serving.
    All narrow column expressions (one ``aggregate`` fold for maxabs,
    one ``transform`` for the quantized array): zero shuffle, zero
    Python. The result exposes the first QUANT_PROBE_DIMS quantized
    values per vector via ``posexplode`` so the oracle can hash-check
    exact integers (full-array string comparison is representation-
    fragile across engines)."""
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding").cast("array<double>")
    maxabs = F.aggregate(
        emb, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )
    # maxabs is a named column before the quantize transform so the
    # fold evaluates once per vector, not once per element
    base = e.select("vec_id", emb.alias("emb"), maxabs.alias("maxabs"))
    q = F.transform(
        F.slice(F.col("emb"), 1, QUANT_PROBE_DIMS),
        lambda x: F.when(F.col("maxabs") == 0, F.lit(0).cast("bigint")).otherwise(
            F.round(x * 127.0 / F.col("maxabs"), 0).cast("bigint")
        ),
    )
    return (
        base.select(
            "vec_id",
            F.round(F.col("maxabs") / 127.0, 6).alias("scale"),
            q.alias("qs"),
        )
        .select("vec_id", "scale", F.posexplode("qs").alias("idx", "qval"))
        .select("vec_id", "idx", "qval", "scale")
    )


# ---------------------------------------------------------------------------
# composed end-to-end cleaning pipeline
# ---------------------------------------------------------------------------

CLEAN_MIN_TOKENS = 5
CLEAN_MAX_PUNCT = 0.1
CLEAN_MIN_STOP = 0.02

_CLEAN_PRED = """
CASE WHEN n_en + n_de + n_es + n_fr = 0 THEN 'und'
     WHEN n_en >= n_de AND n_en >= n_es AND n_en >= n_fr THEN 'en'
     WHEN n_de >= n_es AND n_de >= n_fr THEN 'de'
     WHEN n_es >= n_fr THEN 'es'
     ELSE 'fr' END
""".strip()


@query(
    "corpus_clean_manifest",
    oracle=f"""
WITH t AS (
  SELECT doc_id, source, text, {_DUCK_TOKENS} AS toks,
         length(text) AS len_chars,
         length(regexp_replace(text, '[a-z0-9\\s]', '', 'g')) AS n_punct,
         {_duck_marker_count(_LANG_MARKERS['en'])} AS n_en,
         {_duck_marker_count(_LANG_MARKERS['de'])} AS n_de,
         {_duck_marker_count(_LANG_MARKERS['es'])} AS n_es,
         {_duck_marker_count(_LANG_MARKERS['fr'])} AS n_fr
  FROM documents
),
f AS (
  SELECT doc_id, source, text,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         {_CLEAN_PRED} AS pred_lang
  FROM t
  WHERE len(toks) >= {CLEAN_MIN_TOKENS}
    AND CAST(n_punct AS DOUBLE) / len_chars <= {CLEAN_MAX_PUNCT}
    AND CAST(len(list_filter(toks, x -> x IN {_STOPWORDS})) AS DOUBLE)
          / len(toks) >= {CLEAN_MIN_STOP}
    AND ({_CLEAN_PRED}) <> 'und'
),
k AS (
  SELECT *, min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS keeper
  FROM f
)
SELECT doc_id, source, pred_lang, n_tokens FROM k
WHERE doc_id = keeper
  AND ({DUCK_HASH64.format(expr="'mix:' || CAST(doc_id AS VARCHAR)")}) % 1000
        < CAST(regexp_extract(source, '([0-9]+)$', 1) AS BIGINT) % 4 * 50 + 50
""",
)
def corpus_clean_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE cleaning pipeline as ONE declarative plan — the
    CCNet-shaped sequence every pretraining corpus goes through:
    quality gate (token count / punctuation / stop-word ratios) →
    language gate → exact dedup (keep lowest doc_id per normalized
    content hash) → mixture sampling. Stage ordering is the 100 TB
    ordering: every narrow filter runs *before* the pipeline's single
    shuffle (the dedup window on the content hash), so the shuffle
    carries only surviving docs; Catalyst fuses all four gate
    expressions into the scan stage. The same pipeline as chained
    per-stage jobs would shuffle the full corpus once per stage."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens_col()

    def marker(ws: tuple[str, ...]):
        return F.size(F.filter(t, lambda x: x.isin(*ws)))

    n = {k: marker(ws) for k, ws in _LANG_MARKERS.items()}
    pred = (
        F.when(n["en"] + n["de"] + n["es"] + n["fr"] == 0, "und")
        .when((n["en"] >= n["de"]) & (n["en"] >= n["es"]) & (n["en"] >= n["fr"]), "en")
        .when((n["de"] >= n["es"]) & (n["de"] >= n["fr"]), "de")
        .when(n["es"] >= n["fr"], "es")
        .otherwise("fr")
    )
    punct_ratio = (
        F.length(F.regexp_replace(F.col("text"), r"[a-z0-9\s]", "")).cast("double")
        / F.length("text")
    )
    stop_ratio = (
        F.size(F.filter(t, lambda x: x.isin(*_STOPWORDS))).cast("double") / F.size(t)
    )
    f = d.where(
        (F.size(t) >= CLEAN_MIN_TOKENS)
        & (punct_ratio <= CLEAN_MAX_PUNCT)
        & (stop_ratio >= CLEAN_MIN_STOP)
        & (pred != "und")
    ).select(
        "doc_id",
        "source",
        "text",
        F.size(t).cast("bigint").alias("n_tokens"),
        pred.alias("pred_lang"),
    )
    from pyspark.sql import Window

    keeper = F.min("doc_id").over(
        Window.partitionBy(F.md5(F.lower(F.trim(F.col("text")))))
    )
    src_num = F.regexp_extract("source", r"([0-9]+)$", 1).cast("bigint")
    h = shared_hash64(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))) % 1000
    return (
        f.withColumn("_keeper", keeper)
        .where(F.col("doc_id") == F.col("_keeper"))
        .where(h < src_num % 4 * 50 + 50)
        .select("doc_id", "source", "pred_lang", "n_tokens")
    )


N_SHARDS = 8  # output-shard budget; production sizes this to the
              # target file count (total_bytes / file_size), not cores


@query(
    "global_shuffle_shard",
    oracle=f"""
WITH k AS (
  SELECT doc_id, source,
         md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS key,
         ({DUCK_HASH64.format(expr="'shuffle:' || CAST(doc_id AS VARCHAR)")})
           % {N_SHARDS} AS shard_id
  FROM documents
)
SELECT doc_id, source, shard_id,
       row_number() OVER (PARTITION BY shard_id ORDER BY key, doc_id)
         AS pos
FROM k
""",
)
def global_shuffle_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global training-data shuffle: every document gets a
    deterministic shard and a deterministic position inside it, by
    hashing the stable key — the reproducible equivalent of
    "shuffle the corpus once before training". Hash-keyed placement
    means any engine, any run, any subset of workers produces the
    SAME shard files, so a resumed or re-run job never reshuffles
    training order (which would silently change the data curriculum).

    Plan: one shuffle, keyed by shard. The md5 sort key is computed
    narrow; the window's PARTITION BY shard_id ORDER BY key is
    exactly "repartition into {N_SHARDS} writers, sort within each"
    — the write path of a sharded training-set export. Each shard
    must fit its writer task (corpus_bytes / {N_SHARDS}); production
    raises N_SHARDS with corpus size (it is a file-count budget, not
    a parallelism constant), keeping per-task volume flat."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
    shard = (
        shared_hash64(F.concat(F.lit("shuffle:"), F.col("doc_id").cast("string")))
        % N_SHARDS
    )
    from pyspark.sql import Window

    w = Window.partitionBy("shard_id").orderBy("key", "doc_id")
    return (
        d.select(
            "doc_id",
            "source",
            shard.alias("shard_id"),
            key.alias("key"),
        )
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "source", "shard_id", "pos")
    )
