"""Deduplication operators over the ``documents`` table.

The dedup family a training-data pipeline needs (SURVEY.md §2.9 /
north-star): exact, MinHash+LSH, SimHash, and blocked n-gram Jaccard.
Embedding-cosine near-dup lives in operators/similarity.py with the
rest of the vector ops.

Scale design notes, since dedup is the classic 100 TB trap:

* Signatures (MinHash, SimHash, fingerprints) are computed **narrow**
  — nested higher-order functions over the token array, zero shuffle,
  zero Python. Only the tiny (doc_id, signature) relation shuffles.
* Candidate generation is always **blocked** (LSH band buckets /
  shingle blocks), never a cross join: cost is Σ bucket² instead of
  n². Bucket skew is the residual risk — AQE skew-join handles
  moderate skew; a pathological bucket (identical boilerplate docs)
  would be salt-split in a production run.
* Cross-engine determinism: all hashing goes through
  ``text.shared_hash64`` (md5-derived 60-bit int) because Spark and
  DuckDB ``hash()`` are different algorithms.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.operators.text import (
    DUCK_HASH64,
    _DUCK_TOKENS,
    shared_hash64,
    tokens_col,
)
from sfdc_cdc_aws_spark.sources import load_table

P31 = 2_147_483_647  # Mersenne prime 2^31-1: keeps a*x+b inside int64
N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
# cap on LSH bucket membership before pair expansion — see
# minhash_lsh_dedup's docstring; ~100x any bucket the driver corpora
# produce, so oracles are unaffected at every test SF
MINHASH_BUCKET_CAP = 512

# bytes of materialized signatures per partition when spreading the
# signature-cache read (minhash_signatures): the consumer-side band
# explode is cheap integer/array work, so a partition per ~4 MB keeps
# tasks meaningful instead of scheduling 32 crumbs (round-14's
# unconditional spread — see minhash_signatures). Env-overridable so a
# cluster deployment can tune bytes-per-task without a code change.
_SIG_SPREAD_BYTES = int(
    os.environ.get("SPARK_GRAFT_SIG_SPREAD_BYTES", str(4 << 20))
)


def _spark_hash31(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint") % P31


_DUCK_HASH31 = f"({DUCK_HASH64} % {P31})"


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

@query(
    "exact_dedup_docs",
    oracle="""
SELECT min(doc_id) AS keep_doc_id,
       count(*) AS n_copies,
       min(n_chars) AS n_chars
FROM documents
GROUP BY md5(lower(trim(text)))
""",
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text: group by content hash, keep the
    lowest doc_id. Grouping by the md5 instead of the full text means
    the shuffle carries 32-byte keys, not documents — the difference
    between shuffling 100 TB and shuffling ~nothing."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("_h"))
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count("*").alias("n_copies"),
            F.min("n_chars").alias("n_chars"),
        )
        .drop("_h")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

def _word_shingles(n: int = 3) -> Column:
    """Distinct word n-gram shingles of the tokenized text (narrow)."""
    t = tokens_col()
    grams = F.when(
        F.size(t) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(t) - (n - 1)),
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, i + j) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_distinct(grams)


_DUCK_SHINGLES3 = (
    f"list_distinct(list_transform(generate_series(1, len(t) - 2), "
    f"i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
)


def minhash_sig_df(d: DataFrame) -> DataFrame:
    """MinHash signatures over any DataFrame with (doc_id, text) —
    batch or streaming (the whole computation is stateless column
    expressions). (doc_id, sig: array<bigint> of N_HASHES minhashes);
    sig[i] = min over shingles of the i-th universal hash
    (a_i*x + b_i) mod P of the shingle's 31-bit content hash."""
    hashed = F.transform(_word_shingles(3), lambda s: _spark_hash31(s))
    # One fold over the hashed shingles, updating all N_HASHES mins
    # per element. The naive formulation — transform(sequence(0,15),
    # i -> array_min(transform(hashed, affine_i))) — re-evaluates the
    # md5 shingle hashing once per hash function (16x the dominant
    # cost; a projection boundary doesn't help, CollapseProject
    # re-inlines it). aggregate() evaluates its input array exactly
    # once, so each shingle is md5-hashed once and then touched only
    # by cheap integer affine maps.
    sig = F.aggregate(
        hashed,
        F.array_repeat(F.lit(P31).cast("bigint"), N_HASHES),
        lambda acc, x: F.zip_with(
            acc,
            F.transform(
                F.sequence(F.lit(0), F.lit(N_HASHES - 1)),
                lambda i: ((i * 31 + 17) * x + i * 7919 + 3) % P31,
            ),
            lambda m, v: F.least(m, v),
        ),
    )
    return (
        d.where(F.size(tokens_col()) >= 3)
        .select("doc_id", sig.alias("sig"))
    )


def minhash_sig_agg_df(d: DataFrame) -> DataFrame:
    """BATCH twin of minhash_sig_df — identical signature VALUES
    (same shingle hash, same affine family, same mins; the two are
    pinned byte-equal by tests/test_dedup_blocking.py), ~10× faster.

    The expression fold above runs through Catalyst's interpreted
    higher-order functions: every shingle allocates a fresh
    16-element accumulator array and evaluates a nested
    transform/zip_with lambda tree outside whole-stage codegen —
    measured ~14 ms/doc, 97% of the bucketed admit drain's x100 wall
    (BENCH_SCALE100 x100_profile.bands_s). This formulation stays
    entirely inside codegen: explode the hashed shingles once, derive
    the N_HASHES affine images as flat integer columns, and take
    per-doc mins with a hash aggregate. Map-side partial aggregation
    collapses the exploded rows before the (doc_id-keyed) exchange,
    so the shuffle carries one 16-column row per doc — at 100 TB the
    explode never materializes off-core.

    Batch-only: the groupBy makes it a streaming AGGREGATION on an
    unbounded input (breaking downstream stream-static joins), so
    readStream paths (stream_minhash_ingest) keep the expression
    fold; foreachBatch folds and materializers use this."""
    hashed = F.transform(_word_shingles(3), lambda s: _spark_hash31(s))
    mins = [
        F.min(((i * 31 + 17) * F.col("_x") + i * 7919 + 3) % P31).alias(
            f"_s{i}"
        )
        for i in range(N_HASHES)
    ]
    return (
        d.where(F.size(tokens_col()) >= 3)
        .select("doc_id", F.explode(hashed).alias("_x"))
        .groupBy("doc_id")
        .agg(*mins)
        .select(
            "doc_id",
            F.array(*[f"_s{i}" for i in range(N_HASHES)]).alias("sig"),
        )
    )


def minhash_signatures(
    spark: SparkSession, sf_dir: str, base: str = "/tmp/sfdc_minhash_sigs"
) -> DataFrame:
    """Corpus MinHash signatures (see minhash_sig_df), MATERIALIZED
    per source content — the signature fold is the shared expensive
    prefix of the probe / banding / pair / cluster queries, and a
    production dedup pipeline computes signatures once per corpus
    version, not once per consumer (same fingerprint discipline as
    ensure_ivf_index and the streaming band index). The fingerprinted
    name makes a corpus refresh rebuild instead of serving stale
    signatures; streaming arrivals still compute theirs inline
    (minhash_sig_df works on unbounded inputs)."""
    from sfdc_cdc_aws_spark.sources.tables import table_path

    st = os.stat(table_path(sf_dir, "documents"))
    name = (
        f"{os.path.basename(sf_dir.rstrip('/'))}_v1"
        f"_{st.st_mtime_ns}_{st.st_size}"
    )
    out = os.path.join(base, name)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        minhash_sig_agg_df(
            load_table(spark, sf_dir, "documents", widen=True)
        ).write.mode("overwrite").parquet(out)
    sigs = spark.read.parquet(out)
    # a small cache lands as one file, and file packing
    # (maxPartitionBytes/openCost) keeps even a multi-file cache in
    # one scan split — so every consumer's band explode ran as ONE
    # task with the other cores idle (guide §2.6). Round-15
    # recalibration (round-14 verdict item 1): the round-14 spread
    # was UNCONDITIONALLY to defaultParallelism, which widened this
    # ~340 KB relation to 32 partitions and multiplied task-scheduling
    # cost across every stage of its consumers' fixpoints (driver:
    # dedup_clusters 2.80→7.41 s, contamination_check 1.63→3.34 s —
    # both 2× over their 7-run variance bands). Width now derives
    # from the cache's on-disk bytes (no df.rdd.getNumPartitions()
    # plan analysis on the consumer path): ~one partition per
    # _SIG_SPREAD_BYTES of signatures, capped at the session's
    # parallelism, and only when that exceeds the scan's own split
    # count — so a tiny relation stays narrow, a mid-size one spreads,
    # and a production-scale multi-file cache (already wide) adds no
    # shuffle at all.
    n_files, total_bytes = 0, 0
    for fname in os.listdir(out):
        if fname.endswith(".parquet"):
            n_files += 1
            total_bytes += os.path.getsize(os.path.join(out, fname))
    width = _sig_spread_width(
        total_bytes, n_files, spark.sparkContext.defaultParallelism
    )
    if width > 1:
        sigs = sigs.repartition(width, "doc_id")
    return sigs


def _sig_spread_width(total_bytes: int, n_files: int, par: int) -> int:
    """Partitions the signature-cache read should be spread to, or 1
    for "leave the scan alone". Byte-derived (one partition per
    _SIG_SPREAD_BYTES, capped at the session parallelism) and engaged
    only when it exceeds the scan's own estimated split count — splits
    ≈ ceil(packed bytes / maxPartitionBytes) with each file charged
    openCostInBytes (4 MB), the same packing math the file source
    uses, computed from the listing instead of a plan analysis."""
    width = min(par, max(1, total_bytes // _SIG_SPREAD_BYTES))
    est_scan_parts = max(
        1,
        min(n_files, -(-(total_bytes + n_files * (4 << 20)) // (128 << 20))),
    )
    return width if width > est_scan_parts else 1


def sig_bands(sig_df: DataFrame) -> DataFrame:
    """LSH banding of a signature relation: (doc_id, band_id, bucket)
    with one row per band, bucket = the band's minhash slice joined
    '-'. Works on batch and streaming inputs alike."""
    return sig_df.select(
        "doc_id",
        "sig",
        F.explode(F.sequence(F.lit(0), F.lit(N_BANDS - 1))).alias("band_id"),
    ).select(
        "doc_id",
        "band_id",
        F.concat_ws(
            "-",
            F.slice(F.col("sig"), F.col("band_id") * ROWS_PER_BAND + 1, ROWS_PER_BAND),
        ).alias("bucket"),
    )


_DUCK_SIG_CTE = f"""
toks AS (
  SELECT doc_id, list_filter(regexp_split_to_array(lower(text), '\\W+'),
                             x -> x <> '') AS t
  FROM documents
),
hashed AS (
  SELECT doc_id,
         list_transform({_DUCK_SHINGLES3},
                        s -> {_DUCK_HASH31.format(expr='s')}) AS hs
  FROM toks WHERE len(t) >= 3
),
sigs AS (
  SELECT doc_id,
         list_transform(generate_series(0, {N_HASHES - 1}),
                        i -> list_min(list_transform(hs,
                             x -> ((i * 31 + 17) * x + i * 7919 + 3) % {P31}))) AS sig
  FROM hashed
)
""".strip()


@query(
    "minhash_signature_probe",
    oracle=f"""
WITH {_DUCK_SIG_CTE}
SELECT doc_id, sig[1] AS mh0, sig[8] AS mh7, sig[16] AS mh15 FROM sigs
""",
)
def minhash_signature_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar probe of the MinHash signature (3 of 16 components) so
    the oracle hash-checks the signature math itself, independent of
    the LSH banding that consumes it."""
    sig = minhash_signatures(spark, sf_dir)
    return sig.select(
        "doc_id",
        F.element_at("sig", 1).alias("mh0"),
        F.element_at("sig", 8).alias("mh7"),
        F.element_at("sig", 16).alias("mh15"),
    )


_DUCK_LSH_PAIRS_CTE = f"""
{_DUCK_SIG_CTE},
bands AS (
  SELECT doc_id, b AS band_id,
         array_to_string(sig[b * {ROWS_PER_BAND} + 1 : (b + 1) * {ROWS_PER_BAND}],
                         '-') AS bucket
  FROM sigs, unnest(generate_series(0, {N_BANDS - 1})) AS u(b)
),
lsh_pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         count(*) AS n_shared_bands
  FROM bands a JOIN bands b
    ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
""".strip()


def salted_bucket_pairs(
    rel: DataFrame,
    key_cols: list[str],
    cap: int,
    metric_name: str,
    count_alias: str = "salted_buckets",
) -> DataFrame:
    """Intra-bucket candidate pairs for ANY blocking relation
    (*key_cols, doc_id) — one row per (pair, bucket) — with a
    two-path plan split on bucket width. Shared by MinHash-LSH band
    buckets and n-gram shingle posting lists (any inverted-index
    blocker reduces to this shape):

    - **narrow buckets** (≤ cap): collect the bucket's sorted id
      list in one aggregation and expand pairs with higher-order
      array functions — one shuffle, doc_a < doc_b by construction,
      no per-pair join.
    - **over-cap buckets** (boilerplate-heavy families — the 100 TB
      crawl reality): SALT-SPLIT instead of excluded (round-6 verdict
      item 2; the exclusion silently dropped exactly the densest
      near-dup families). Members hash into g = ceil(size/CAP) salt
      groups and each unordered group cell (i ≤ j) becomes one join
      key, so the irreducible C(n,2) pair space — the uncapped oracle
      pays it too — is produced in ≤ CAP² work units spread over
      g(g+1)/2 shuffle keys, one hot bucket never lands on one task
      and no row ever materializes an over-cap id list (the 2^31
      array ceiling). A pair (x, y) appears in exactly one cell
      (min(uₓ,uᵧ), max(uₓ,uᵧ)), so output parity with the narrow path
      is structural, not probabilistic.

    Over-cap buckets are still OBSERVED (``count_alias`` in the
    ``metric_name`` metric) so a run reports how much of the
    corpus took the quadratic path."""
    sizes = (
        rel.groupBy(*key_cols)
        .agg(F.count("*").alias("bsz"))
        .observe(
            metric_name,
            F.sum((F.col("bsz") > cap).cast("long")).alias(count_alias),
            F.max("bsz").alias("max_bucket"),
        )
    )
    mem = rel.join(sizes, key_cols)

    # narrow path: one collect_list per bucket, higher-order expansion
    ids = F.sort_array(F.collect_list("doc_id"))
    narrow_pairs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )
    narrow = (
        mem.where(F.col("bsz").between(2, cap))
        .groupBy(*key_cols)
        .agg(ids.alias("ids"))
        .select(F.explode(narrow_pairs).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
    )

    # salted path: group cells (i, j) with i ≤ j as join keys
    over = mem.where(F.col("bsz") > cap).select(
        *key_cols,
        "doc_id",
        F.ceil(F.col("bsz") / cap).cast("int").alias("g"),
    )
    over = over.withColumn(
        "u", F.pmod(F.hash("doc_id"), F.col("g")).cast("int")
    )
    left = over.select(
        *key_cols,
        F.col("doc_id").alias("doc_l"),
        F.col("u").alias("ci"),
        F.explode(F.sequence(F.col("u"), F.col("g") - 1)).alias("cj"),
    )
    right = over.select(
        *key_cols,
        F.col("doc_id").alias("doc_r"),
        F.explode(F.sequence(F.lit(0), F.col("u"))).alias("ci"),
        F.col("u").alias("cj"),
    )
    salted = (
        left.join(right, [*key_cols, "ci", "cj"])
        .where((F.col("ci") < F.col("cj")) | (F.col("doc_l") < F.col("doc_r")))
        .select(
            F.least("doc_l", "doc_r").alias("doc_a"),
            F.greatest("doc_l", "doc_r").alias("doc_b"),
        )
    )
    return narrow.unionByName(salted)


def lsh_bucket_pairs(bands: DataFrame) -> DataFrame:
    """MinHash-LSH instantiation of :func:`salted_bucket_pairs` over
    (band_id, bucket) buckets — kept as a named entry point because
    tests and the scale-stress lane drive it directly."""
    return salted_bucket_pairs(
        bands, ["band_id", "bucket"], MINHASH_BUCKET_CAP, "minhash_lsh_blocking"
    )


@query(
    "minhash_lsh_dedup",
    oracle=f"""
WITH {_DUCK_LSH_PAIRS_CTE}
SELECT doc_a, doc_b, n_shared_bands FROM lsh_pairs
""",
)
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash → LSH banding → bucket self-pairing: candidate near-dup
    pairs without a cross join. 16 hashes in 4 bands of 4 ⇒ a pair
    with Jaccard j collides with prob 1-(1-j⁴)⁴. Pair generation runs
    on (band_id, bucket) — at scale a shuffle of the small signature
    relation only, Σ bucket² bounded by band width — with over-cap
    boilerplate buckets SALT-SPLIT across g(g+1)/2 join cells rather
    than excluded, so output matches the uncapped oracle even on a
    fixture whose densest family blows the cap (see
    :func:`lsh_bucket_pairs` for the decomposition)."""
    bands = sig_bands(minhash_signatures(spark, sf_dir))
    return (
        lsh_bucket_pairs(bands)
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

N_SIMHASH_BITS = 16


@query(
    "simhash_dedup",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents
),
hashed AS (
  SELECT doc_id, list_transform(t, s -> {DUCK_HASH64.format(expr='s')}) AS hs
  FROM toks WHERE len(t) > 0
),
sims AS (
  SELECT doc_id,
         list_sum(list_transform(generate_series(0, {N_SIMHASH_BITS - 1}),
           j -> CASE WHEN list_sum(list_transform(hs,
                         x -> ((x >> j) & 1) * 2 - 1)) > 0
                THEN 1 << j ELSE 0 END))::BIGINT AS simhash
  FROM hashed
)
SELECT doc_id, simhash,
       count(*) OVER (PARTITION BY simhash) AS n_same
FROM sims
""",
)
def simhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash (16-bit): per bit j, sum ±1 votes of every token's
    hash bit; the sign vector is the signature. Near-dups agree on
    most bits; identical token multisets collide exactly. Narrow
    nested-lambda computation, then one window to size each collision
    group."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents", widen=True)
    t = tokens_col()
    hs = F.transform(
        t, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("bigint")
    )
    # nested higher-order aggregate with a per-bit shift: the Python
    # shiftright/shiftleft wrappers require literal shift amounts, so
    # the expression is written in SQL where lambda vars are allowed
    simhash_sql = f"""
    aggregate(
      transform(sequence(0, {N_SIMHASH_BITS - 1}),
        j -> CASE WHEN aggregate(hs, 0L,
                       (acc, x) -> acc + ((shiftright(x, j) & 1) * 2 - 1)) > 0
             THEN shiftleft(1L, j) ELSE 0L END),
      0L, (acc, v) -> acc + v) AS simhash
    """
    sims = (
        d.where(F.size(t) > 0)
        .select("doc_id", hs.alias("hs"))
        .selectExpr("doc_id", simhash_sql)
    )
    return sims.withColumn(
        "n_same", F.count("*").over(Window.partitionBy("simhash"))
    )


# ---------------------------------------------------------------------------
# blocked n-gram Jaccard
# ---------------------------------------------------------------------------

JACCARD_MIN = 0.01

# Width threshold on shingle posting lists: a shingle shared by p docs
# contributes p²/2 candidate pairs, so one boilerplate 4-gram ("all
# rights reserved here") with a million-doc posting list would emit
# 5·10¹¹ pairs from a single index row — THE quadratic failure mode of
# inverted-index blocking at 100 TB. Lists longer than the cap switch
# from the collect_list narrow path to the salt-split quadratic path
# (salted_bucket_pairs) so the result stays EXACT — the irreducible
# pair space is spread over g(g+1)/2 shuffle keys instead of one hot
# task — and the count of over-cap lists is surfaced via an
# ``observe`` metric, never silently. 512 also bounds the narrow
# path's per-bucket pair array to 512²/2 structs (~2 MB), under the
# 2^31 array ceiling.
NGRAM_POSTING_CAP = 512


@query(
    "ngram_jaccard_dedup",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, {_DUCK_TOKENS} AS t FROM documents
),
sh AS (
  SELECT doc_id, lang,
         unnest(list_transform(
             list_distinct(list_transform(generate_series(1, len(t) - 3),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])),
             g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS h
  FROM toks WHERE len(t) >= 4
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b
    ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.n_common,
       round(CAST(i.n_common AS DOUBLE) / (s1.n + s2.n - i.n_common), 6) AS jaccard
FROM inter i
JOIN sizes s1 ON i.doc_a = s1.doc_id
JOIN sizes s2 ON i.doc_b = s2.doc_id
WHERE CAST(i.n_common AS DOUBLE) / (s1.n + s2.n - i.n_common) >= {JACCARD_MIN}
""",
)
def ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard similarity with shingle-inverted-index blocking:
    only documents sharing a (lang, word-4-gram) ever meet, so the
    pair space is the inverted index's posting-list squares, not n².
    Shingles are hashed to 64-bit ints at birth (8-byte shuffle keys);
    the index groups each (lang, shingle) posting list once and emits
    intra-list pairs — the shingle pipeline evaluates once, where a
    shingle-stream self-join would evaluate it per join side. The
    self-join formulation remains in the oracle as the semantic spec.

    Posting lists longer than NGRAM_POSTING_CAP take the SALT-SPLIT
    quadratic path of :func:`salted_bucket_pairs` instead of being
    dropped (round-8 ADVICE: the old exclusion made the ensemble vote
    diverge from its uncapped oracle on boilerplate-dense corpora) —
    so n_common is EXACT at any posting density while the Σ list²
    work stays spread over g(g+1)/2 shuffle keys per hot shingle; the
    number of over-cap lists rides along as the observed metric
    ``salted_posting_lists``, at zero extra jobs."""
    from sfdc_cdc_aws_spark.session import truncate_lineage

    d = load_table(spark, sf_dir, "documents", widen=True)
    # ONE execution of the tokenize→shingle→md5 pipeline: the relation
    # feeds doc sizes, posting-list sizes AND both pair-expansion
    # branches — without truncation each consumer re-tokenizes and
    # re-hashes the corpus (profiled: 3 stages x ~20 s executor run at
    # sf0.1, ~the whole key). The narrow (doc_id, lang, h) rows are
    # the cheap proxy the heavy work reduces to (guide §8).
    sh = truncate_lineage(
        d.where(F.size(tokens_col()) >= 4).select(
            "doc_id",
            "lang",
            F.explode(
                F.transform(_word_shingles(4), lambda g: shared_hash64(g))
            ).alias("h"),
        )
    )
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        salted_bucket_pairs(
            sh,
            ["lang", "h"],
            NGRAM_POSTING_CAP,
            "ngram_jaccard_blocking",
            "salted_posting_lists",
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    s1 = sizes.alias("s1")
    s2 = sizes.alias("s2")
    jac = F.col("n_common").cast("double") / (
        F.col("s1.n") + F.col("s2.n") - F.col("n_common")
    )
    return (
        inter.join(s1, F.col("doc_a") == F.col("s1.doc_id"))
        .join(s2, F.col("doc_b") == F.col("s2.doc_id"))
        .where(jac >= JACCARD_MIN)
        .select(
            "doc_a", "doc_b", "n_common", F.round(jac, 6).alias("jaccard")
        )
    )


# ---------------------------------------------------------------------------
# AllPairs prefix filtering (exact set-similarity join)
# ---------------------------------------------------------------------------

# the near-duplicate bar for the prefix-filtered join — deliberately
# the corpus's "true near-dup" threshold (LSH_EVAL_JACCARD), not
# ngram_jaccard_dedup's permissive 0.01 audit floor: prefix length is
# |d| - ceil(theta*|d|) + 1, so the filter only has teeth when theta
# is a real similarity bar
PREFIX_JACCARD_MIN = 0.5


@query(
    "allpairs_prefix_jaccard",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, lang, {_DUCK_TOKENS} AS t FROM documents
),
sh AS (
  SELECT doc_id, lang,
         unnest(list_transform(
             list_distinct(list_transform(generate_series(1, len(t) - 3),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])),
             g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS h
  FROM toks WHERE len(t) >= 4
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM sh a JOIN sh b
    ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.n_common,
       round(CAST(i.n_common AS DOUBLE) / (s1.n + s2.n - i.n_common), 6)
         AS jaccard
FROM inter i
JOIN sizes s1 ON i.doc_a = s1.doc_id
JOIN sizes s2 ON i.doc_b = s2.doc_id
WHERE CAST(i.n_common AS DOUBLE) / (s1.n + s2.n - i.n_common)
      >= {PREFIX_JACCARD_MIN}
""",
)
def allpairs_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT word-4-gram Jaccard >= {PREFIX_JACCARD_MIN} near-dup
    pairs via AllPairs/PPJoin prefix filtering (Bayardo, Ma &
    Srikant, WWW 2007; Xiao et al., WWW 2008) — the third blocking
    strategy in this module, and the one that ELIMINATES hot-shingle
    work instead of spreading it: salted_bucket_pairs caps and
    salt-splits an over-wide posting list but still pays its
    irreducible list**2 pair units; prefix filtering orders each
    document's shingles by ascending global document frequency and
    only indexes the first |d| - ceil(theta*|d|) + 1 of them, so the
    corpus-wide boilerplate shingles (the exact tail that dominates
    neardup_ensemble_vote's x100 wall) land at the END of every
    ordering, fall outside every prefix, and never generate a
    candidate at all.

    Exactness is the prefix-filtering principle (PPJoin Lemma 1):
    J(A,B) >= theta implies |A∩B| >= ceil(theta*|A|), and a pair
    whose intersection is that large must collide inside both
    (|d| - ceil(theta*|d|) + 1)-prefixes under any shared total
    order — so the candidate set is a SUPERSET of the answer and the
    per-candidate exact verify (array_intersect of the two sorted
    hash arrays) makes the result identical to the uncapped
    self-join, which is verbatim this key's oracle at the same
    threshold.

    Plan: one df aggregate (map-side combinable, |vocab| rows), one
    per-doc row_number window over ~|d| shingle rows, the candidate
    join on (lang, shingle) over PREFIX rows only, then the verify
    join against the per-doc sorted hash arrays (docs are ~1e2
    shingles; the arrays travel once per side). At 100 TB the df
    relation is the same metadata-scale side input every inverted
    index maintains, and candidate volume tracks true-similar pairs,
    not posting-list squares."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents", widen=True)
    # materialize the narrow (doc, lang, shingle-hash) relation ONCE
    # (8-byte hashes — ~n_docs*|d| rows): five consumers read it (df
    # aggregate, ranked prefix, both candidate sides, both verify
    # arrays), and without the checkpoint each re-runs the
    # tokenize+md5 pipeline — measured 5x the whole key's wall at
    # sf0.1 (the lsh_eval_pr discipline: audit inputs run once)
    sh = (
        d.where(F.size(tokens_col()) >= 4)
        .select(
            "doc_id",
            "lang",
            F.explode(
                F.transform(_word_shingles(4), lambda g: shared_hash64(g))
            ).alias("h"),
        )
        .localCheckpoint()
    )
    dfreq = sh.groupBy("lang", "h").agg(F.count("*").alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "h")
    ranked = (
        sh.join(dfreq, ["lang", "h"])
        .withColumn("rk", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("doc_id")))
    )
    prefix_len = F.col("n") - F.ceil(
        F.lit(PREFIX_JACCARD_MIN) * F.col("n")
    ) + 1
    pref = ranked.where(F.col("rk") <= prefix_len).select(
        "doc_id", "lang", "h"
    )
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    # verify arrays re-assembled from the SAME checkpointed relation
    # (shingles are distinct per doc, so collect_list is the set)
    arr = sh.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("h")).alias("hs"),
        F.count("*").alias("n"),
    )
    aa = arr.select(
        F.col("doc_id").alias("doc_a"),
        F.col("hs").alias("hs_a"),
        F.col("n").alias("n_a"),
    )
    bb = arr.select(
        F.col("doc_id").alias("doc_b"),
        F.col("hs").alias("hs_b"),
        F.col("n").alias("n_b"),
    )
    n_common = F.size(F.array_intersect("hs_a", "hs_b"))
    jac = n_common.cast("double") / (
        F.col("n_a") + F.col("n_b") - n_common
    )
    return (
        cand.join(aa, "doc_a")
        .join(bb, "doc_b")
        .where(jac >= PREFIX_JACCARD_MIN)
        .select(
            "doc_a",
            "doc_b",
            n_common.cast("bigint").alias("n_common"),
            F.round(jac, 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# duplicate clusters (connected components over the LSH pair graph)
# ---------------------------------------------------------------------------

MAX_CC_ITERS = 15
CC_CHECK_EVERY = 3  # late-phase check cadence (see _cc_check_round)
CC_EARLY_CHECKS = 4  # check every round this far in — shallow graphs exit here


def _cc_check_round(round_no: int) -> bool:
    """Convergence-check schedule: EVERY round while shallow components
    (the LSH near-dup reality — diameter 2-3) are still converging, so
    the common case exits at the earliest detectable round; every
    CC_CHECK_EVERY rounds beyond that, so a pathological deep chain
    costs O(log D) rounds with O(log D / k) driver blocks, not one
    block per round (round-5 verdict item 3)."""
    return round_no <= CC_EARLY_CHECKS or round_no % CC_CHECK_EVERY == 0


def _connected_components(edges: DataFrame) -> tuple[DataFrame, int]:
    """Min-label propagation with POINTER DOUBLING over a symmetric
    edge list ``(src, dst)`` → (labels ``(node, label)``, rounds run).

    Two relaxations per round: (1) the Pregel neighbor-min step, then
    (2) a shortcut step ``label ← label(label)`` — each round at least
    doubles the distance a minimum has travelled, so a path component
    of diameter D converges in O(log D) rounds, not O(D) (the round-5
    verdict's pathological-chain concern, dedup.py item 3).  The
    driver blocks on a scalar label-sum on the :func:`_cc_check_round`
    schedule (labels only decrease, so an unchanged sum across k rounds
    certifies the fixpoint just as well as one across a single round)
    — O(log D / CC_CHECK_EVERY) late-phase blocking collects,
    each moving one BIGINT to the driver, never row data."""
    labels = _truncate_lineage(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    prev_sum = None
    for it in range(MAX_CC_ITERS):
        nbr_min = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        stepped = labels.join(
            nbr_min, labels["node"] == nbr_min["src"], "left"
        ).select(
            "node",
            F.least(F.col("label"), F.coalesce("nbr_label", F.col("label"))).alias(
                "label"
            ),
        )
        # pointer doubling: chase one extra hop through the label
        # table. Engaged from round 3 — shallow components (the LSH
        # near-dup reality, diameter 2-3) converge on neighbor-min
        # alone and pay nothing extra; anything still moving by round
        # 3 is deep, and doubling caps it at O(log D) further rounds.
        if it >= 2:
            hop = stepped.select(
                F.col("node").alias("h_node"), F.col("label").alias("h_label")
            )
            stepped = stepped.join(
                hop, stepped["label"] == hop["h_node"], "left"
            ).select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("h_label", F.col("label"))
                ).alias("label"),
            )
        labels = _truncate_lineage(stepped)
        if _cc_check_round(it + 1) or it == MAX_CC_ITERS - 1:
            new_sum = labels.agg(F.sum("label")).collect()[0][0]
            if new_sum == prev_sum:
                return labels, it + 1
            prev_sum = new_sum
    raise RuntimeError(
        f"connected components did not converge in {MAX_CC_ITERS} iterations"
    )


def _truncate_lineage(df: DataFrame) -> DataFrame:
    """Cut the iterative loop's growing lineage — delegates to the
    shared ``SPARK_GRAFT_CHECKPOINT_DIR``-aware helper
    (session.truncate_lineage) so every lineage-truncation site in
    the engine honors the same reliable-checkpoint escape hatch."""
    from sfdc_cdc_aws_spark.session import truncate_lineage

    return truncate_lineage(df)


@query(
    "dedup_clusters",
    oracle=f"""
WITH RECURSIVE {_DUCK_LSH_PAIRS_CTE},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM lsh_pairs
),
walk AS (
  SELECT src AS node, src AS label FROM edges
  UNION
  SELECT e.src AS node, w.label
  FROM edges e JOIN walk w ON e.dst = w.node
)
SELECT node AS doc_id, min(label) AS cluster_id
FROM walk GROUP BY node
""",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS from the LSH candidate pairs: connected
    components by min-label propagation WITH POINTER DOUBLING
    (:func:`_connected_components`) — O(log diameter) rounds, a
    blocking scalar convergence collect only every CC_CHECK_EVERY
    rounds (round-5 verdict item 3: the driver no longer paces every
    step), each join bounded by the edge list and ``localCheckpoint``
    truncating the growing lineage. Convergence is asserted within
    MAX_CC_ITERS rather than silently stopping early. The oracle
    replays the same fixpoint as a recursive CTE."""
    pairs = minhash_lsh_dedup(spark, sf_dir).select("doc_a", "doc_b")
    edges = _truncate_lineage(
        pairs.union(pairs.select(F.col("doc_b"), F.col("doc_a"))).toDF("src", "dst")
    )
    labels, _rounds = _connected_components(edges)
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


# shared keep-best oracle: CC labels (recursive min-label walk) +
# per-cluster survivor election + drop manifest. Used verbatim by
# dedup_keep_best AND by the maintained-labels twin
# (streaming/ingest_dedup.py::dedup_keep_best_merge — the merged
# labels are hash-equal to from-scratch CC, so the election contract
# is identical).
DUCK_KEEP_BEST_SQL = f"""
WITH RECURSIVE {_DUCK_LSH_PAIRS_CTE},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM lsh_pairs
),
walk AS (
  SELECT src AS node, src AS label FROM edges
  UNION
  SELECT e.src AS node, w.label
  FROM edges e JOIN walk w ON e.dst = w.node
),
labels AS (
  SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node
),
j AS (
  SELECT l.cluster_id, l.doc_id, d.n_chars
  FROM labels l JOIN documents d USING (doc_id)
),
sel AS (
  SELECT cluster_id, doc_id, n_chars,
         row_number() OVER (PARTITION BY cluster_id
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM j
)
SELECT cluster_id,
       count(*) AS n_members,
       CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS survivor_doc,
       CAST(max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS survivor_chars,
       string_agg(CASE WHEN rn > 1 THEN CAST(doc_id AS VARCHAR) END,
                  ',' ORDER BY doc_id) AS dropped_docs
FROM sel GROUP BY cluster_id
"""


def keep_best_election(
    spark: SparkSession, sf_dir: str, labels: DataFrame
) -> DataFrame:
    """Survivor election + drop manifest over ANY (doc_id, cluster_id)
    labeling: one max_by aggregate, no window (see dedup_keep_best's
    plan discussion)."""
    j = labels.join(
        load_table(spark, sf_dir, "documents").select("doc_id", "n_chars"),
        "doc_id",
    )
    g = j.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.max_by(
            "doc_id", F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("neg"))
        ).alias("survivor_doc"),
        F.max("n_chars").alias("survivor_chars"),
        F.sort_array(F.collect_list("doc_id")).alias("ids"),
    )
    dropped = F.array_join(
        F.transform(
            F.filter(F.col("ids"), lambda x: x != F.col("survivor_doc")),
            lambda x: x.cast("string"),
        ),
        ",",
    )
    return g.select(
        "cluster_id",
        "n_members",
        "survivor_doc",
        "survivor_chars",
        # nullif: a singleton cluster has no dropped members; the
        # oracle's string_agg over an all-NULL group yields NULL, and
        # array_join over [] yields '' — align on NULL (round-8
        # ADVICE: unreachable today, every LSH-clustered node has an
        # edge, but a future singleton-producing change must not
        # break parity silently).
        F.nullif(dropped, F.lit("")).alias("dropped_docs"),
    )


@query("dedup_keep_best", oracle=DUCK_KEEP_BEST_SQL)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-exact canonical selection — the batch-exact KEEP path
    that :func:`lsh_survivor_pick` approximates bucket-locally: run
    connected components over the LSH pair graph, then elect ONE
    survivor per duplicate cluster (longest ``n_chars``, ties to the
    lower ``doc_id``) and emit the drop manifest a curation pipeline
    actually executes (per cluster: member count, the survivor, and
    the comma-joined sorted id list of everything to delete).

    Plan: labels come from the pointer-doubling CC fixpoint
    (:func:`_connected_components`, O(log diameter) rounds); quality
    rides in on an equi-join against a 2-column projection of
    ``documents``; the election is ONE ``max_by`` aggregate keyed on
    ``(n_chars, -doc_id)`` — no window, map-side partial winners —
    and the manifest column is a post-aggregation projection over the
    already-grouped id list. At 100 TB the shuffle after CC carries
    (cluster_id, doc_id, n_chars) triples only; clusters are near-dup
    families, so per-group state is bounded by family size (the same
    Σ family² reality every pair-emitting key in this module prices).
    """
    return keep_best_election(spark, sf_dir, dedup_clusters(spark, sf_dir))


# ---------------------------------------------------------------------------
# benchmark contamination (cross-corpus n-gram overlap)
# ---------------------------------------------------------------------------

BENCH_DOC_MAX = 50  # doc_id < 50 plays the held-out benchmark set


@query(
    "contamination_check",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_transform(
             list_distinct(list_transform(generate_series(1, len(t) - 3),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])),
             g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS h
  FROM toks WHERE len(t) >= 4
),
bench AS (SELECT DISTINCT h FROM sh WHERE doc_id < {BENCH_DOC_MAX})
SELECT c.doc_id, count(*) AS n_hits
FROM sh c JOIN bench b USING (h)
WHERE c.doc_id >= {BENCH_DOC_MAX}
GROUP BY c.doc_id
""",
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: count, per corpus document, the
    distinct word-4-grams it shares with a held-out benchmark set
    (docs with doc_id < BENCH_DOC_MAX stand in for the eval suite).
    Shingles are hashed to 64-bit ints BEFORE the join — the broadcast
    set and the equality probes carry 8 bytes instead of full n-gram
    strings (both engines hash through md5, so even a collision counts
    identically). At 100 TB the corpus shingles never shuffle, only
    the per-doc hit counts do. Documents with any overlap are the
    candidates a pretrain pipeline quarantines before training."""
    from sfdc_cdc_aws_spark.operators.text import shared_hash64

    d = load_table(spark, sf_dir, "documents", widen=True)
    sh = d.where(F.size(tokens_col()) >= 4).select(
        "doc_id",
        F.explode(
            F.transform(_word_shingles(4), lambda g: shared_hash64(g))
        ).alias("h"),
    )
    bench = F.broadcast(
        sh.where(F.col("doc_id") < BENCH_DOC_MAX).select("h").distinct()
    )
    return (
        sh.where(F.col("doc_id") >= BENCH_DOC_MAX)
        .join(bench, "h")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


@query(
    "decontaminate_anti",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents
),
sh AS (
  SELECT doc_id,
         unnest(list_transform(
             list_distinct(list_transform(generate_series(1, len(t) - 3),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])),
             g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS h
  FROM toks WHERE len(t) >= 4
),
bench AS (SELECT DISTINCT h FROM sh WHERE doc_id < {BENCH_DOC_MAX}),
contaminated AS (
  SELECT DISTINCT c.doc_id FROM sh c JOIN bench b USING (h)
  WHERE c.doc_id >= {BENCH_DOC_MAX}
)
SELECT d.doc_id, d.lang, d.source
FROM documents d
WHERE d.doc_id >= {BENCH_DOC_MAX}
  AND d.doc_id NOT IN (SELECT doc_id FROM contaminated)
""",
)
def decontaminate_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The enforcement half of benchmark decontamination: keep only
    the corpus documents with ZERO 4-gram overlap against the held-out
    benchmark set (``contamination_check`` is the audit that counts
    hits; this is the anti-join that drops the hitters). The
    contaminated-id set is tiny (bounded by corpus hit rate), so the
    final anti-join broadcasts; the shingle side reuses the same
    narrow hashed-shingle plan — at 100 TB nothing but 8-byte hashes
    and doc ids ever shuffles."""
    from sfdc_cdc_aws_spark.operators.text import shared_hash64

    d = load_table(spark, sf_dir, "documents", widen=True)
    sh = d.where(F.size(tokens_col()) >= 4).select(
        "doc_id",
        F.explode(
            F.transform(_word_shingles(4), lambda g: shared_hash64(g))
        ).alias("h"),
    )
    bench = F.broadcast(
        sh.where(F.col("doc_id") < BENCH_DOC_MAX).select("h").distinct()
    )
    contaminated = (
        sh.where(F.col("doc_id") >= BENCH_DOC_MAX)
        .join(bench, "h")
        .select("doc_id")
        .distinct()
    )
    return (
        d.where(F.col("doc_id") >= BENCH_DOC_MAX)
        .join(F.broadcast(contaminated), "doc_id", "left_anti")
        .select("doc_id", "lang", "source")
    )


# ---------------------------------------------------------------------------
# PageRank power iteration over the near-dup graph
# ---------------------------------------------------------------------------

@query(
    "pagerank_step",
    oracle=f"""
WITH {_DUCK_LSH_PAIRS_CTE},
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM lsh_pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM lsh_pairs
),
deg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src),
n AS (SELECT count(*) AS n_nodes FROM deg),
s AS (
  SELECT e.src AS node,
         sum(CAST(round(1.0 / d.deg, 12) AS DECIMAL(28,12))) AS contrib
  FROM edges e JOIN deg d ON d.node = e.dst
  GROUP BY e.src
)
SELECT s.node AS doc_id, dg.deg,
       round((0.15 + 0.85 * CAST(s.contrib AS DOUBLE)) / n.n_nodes, 9)
         AS pr_score
FROM s JOIN deg dg ON dg.node = s.node, n
""",
)
def pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One PageRank power iteration (damping 0.85) over the
    undirected near-dup graph, from the uniform start r0 = 1/N — the
    centrality signal that ranks which documents sit at the center of
    duplication clusters (keep the canonical center, drop satellites).
    Full PageRank is this step in a driver loop, like
    dedup_clusters/kmeans_lloyd_step: scalars cross the driver,
    relations never do.

    Scale shape: degree and contribution are both map-side-partial
    aggregates on the edge list; the node count rides a 1-row
    broadcast. Per-edge contributions 1/deg round to 12 places and
    sum in DECIMAL(28,12) so both engines associate identically."""
    pairs = minhash_lsh_dedup(spark, sf_dir).select("doc_a", "doc_b")
    edges = pairs.union(
        pairs.select(F.col("doc_b"), F.col("doc_a"))
    ).toDF("src", "dst")
    deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    )
    n = F.broadcast(deg.agg(F.count("*").alias("n_nodes")))
    contrib = F.round(F.lit(1.0) / F.col("deg"), 12).cast("decimal(28,12)")
    s = (
        edges.join(deg.withColumnRenamed("node", "dnode"),
                   F.col("dnode") == F.col("dst"))
        .groupBy("src")
        .agg(F.sum(contrib).alias("contrib"))
    )
    return (
        s.join(deg, F.col("node") == F.col("src"))
        .crossJoin(n)
        .select(
            F.col("src").alias("doc_id"),
            "deg",
            F.round(
                (F.lit(0.15) + F.lit(0.85) * F.col("contrib").cast("double"))
                / F.col("n_nodes"),
                9,
            ).alias("pr_score"),
        )
    )


# ---------------------------------------------------------------------------
# survivor election per LSH bucket (the keep-side of near-dup dedup)
# ---------------------------------------------------------------------------

@query(
    "lsh_survivor_pick",
    oracle=f"""
WITH {_DUCK_SIG_CTE},
bands AS (
  SELECT doc_id, b AS band_id,
         array_to_string(sig[b * {ROWS_PER_BAND} + 1 : (b + 1) * {ROWS_PER_BAND}],
                         '-') AS bucket
  FROM sigs, unnest(generate_series(0, {N_BANDS - 1})) AS u(b)
),
j AS (
  SELECT bd.doc_id, bd.band_id, bd.bucket, d.n_chars
  FROM bands bd JOIN documents d ON d.doc_id = bd.doc_id
)
SELECT band_id, bucket, n_members, survivor_doc, survivor_chars FROM (
  SELECT band_id, bucket,
         count(*) OVER (PARTITION BY band_id, bucket) AS n_members,
         doc_id AS survivor_doc, n_chars AS survivor_chars,
         row_number() OVER (PARTITION BY band_id, bucket
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM j
) WHERE rn = 1 AND n_members >= 2
""",
)
def lsh_survivor_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor election per MinHash LSH bucket — the KEEP side of
    near-dup dedup: inside every candidate bucket with ≥2 members,
    elect the canonical document by quality (longest n_chars, ties to
    the lower doc_id). Bucket-local election is the admission-time
    approximation a streaming pipeline uses (no global view needed);
    ``dedup_clusters`` + a per-cluster pick is the batch-exact path.
    A doc sitting in several buckets gets judged in each — the
    union of losers is the drop candidate set.

    Plan: signatures narrow (one fold, dedup.py::minhash_sig_df),
    banding explodes to (doc_id, band, bucket) 3-tuples, the quality
    column rides along from a broadcast-sized projection of
    documents, and the election is ONE map-side-partial ``max_by``
    aggregate keyed on (n_chars, -doc_id) — no window, no sort; the
    shuffle carries per-bucket partial winners, not members."""
    bands = sig_bands(minhash_signatures(spark, sf_dir))
    j = bands.join(
        load_table(spark, sf_dir, "documents").select("doc_id", "n_chars"),
        "doc_id",
    )
    g = (
        j.groupBy("band_id", "bucket")
        .agg(
            F.count("*").alias("n_members"),
            F.max_by(
                F.struct(
                    F.col("doc_id").alias("d"), F.col("n_chars").alias("c")
                ),
                F.struct(
                    F.col("n_chars").alias("c"),
                    (-F.col("doc_id")).alias("negid"),
                ),
            ).alias("s"),
        )
        .where(F.col("n_members") >= 2)
    )
    return g.select(
        "band_id",
        "bucket",
        "n_members",
        F.col("s.d").alias("survivor_doc"),
        F.col("s.c").alias("survivor_chars"),
    )


@query(
    "triangle_count",
    oracle=f"""
WITH {_DUCK_LSH_PAIRS_CTE},
edges AS (SELECT doc_a, doc_b FROM lsh_pairs),
tri AS (
  SELECT e1.doc_a AS a, e1.doc_b AS b, e2.doc_b AS c
  FROM edges e1
  JOIN edges e2 ON e2.doc_a = e1.doc_b
  JOIN edges e3 ON e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
)
SELECT doc_id, count(*) AS n_triangles
FROM (SELECT unnest([a, b, c]) AS doc_id FROM tri)
GROUP BY doc_id
""",
)
def triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangles in the near-duplicate candidate graph — the local
    clustering signal that separates TRUE duplicate clusters (near-
    dup sets collide pairwise → triangle-dense) from chance LSH
    collisions (isolated edges, no triangles). Completes the graph
    family over the same edge relation: dedup_clusters finds the
    components, pagerank_step ranks within them, and triangle counts
    grade each doc's neighborhood cohesion — the standard triage
    before trusting a cluster enough to drop its members.

    Plan: the classic two-join triangle enumeration on the
    ordered edge list (doc_a < doc_b by construction, so each
    triangle is counted exactly once as a<b<c): edges ⋈ edges on
    b=a' finds wedges, the third join closes them. Both joins are
    equi-joins on doc ids — shuffles carry the EDGE relation (Σ
    bucket² bounded by the LSH cap), never documents; at 100 TB this
    is the textbook distributed triangle count (order edges by
    degree to bound wedge fan-out further; unnecessary under the
    bucket cap)."""
    e = minhash_lsh_dedup(spark, sf_dir).select("doc_a", "doc_b")
    e1 = e.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = e.select(F.col("doc_a").alias("b2"), F.col("doc_b").alias("c"))
    e3 = e.select(F.col("doc_a").alias("a3"), F.col("doc_b").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    return (
        tri.select(
            F.explode(F.array(F.col("a"), F.col("b"), F.col("c"))).alias(
                "doc_id"
            )
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_triangles"))
    )


# ---------------------------------------------------------------------------
# LSH quality evaluation: precision/recall of the candidate generator
# ---------------------------------------------------------------------------

LSH_EVAL_JACCARD = 0.5  # "true near-duplicate" bar for the eval


@query(
    "lsh_eval_pr",
    oracle=f"""
WITH {_DUCK_LSH_PAIRS_CTE},
jtoks AS (
  SELECT doc_id, lang, {_DUCK_TOKENS} AS t FROM documents
),
jsh AS (
  SELECT doc_id, lang,
         unnest(list_transform(
             list_distinct(list_transform(generate_series(1, len(t) - 3),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])),
             g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS h
  FROM jtoks WHERE len(t) >= 4
),
jsizes AS (SELECT doc_id, count(*) AS n FROM jsh GROUP BY doc_id),
jinter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM jsh a JOIN jsh b
    ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
truth AS (
  SELECT i.doc_a, i.doc_b
  FROM jinter i
  JOIN jsizes s1 ON i.doc_a = s1.doc_id
  JOIN jsizes s2 ON i.doc_b = s2.doc_id
  WHERE round(CAST(i.n_common AS DOUBLE) / (s1.n + s2.n - i.n_common), 6)
        >= {LSH_EVAL_JACCARD}
),
cand AS (SELECT DISTINCT doc_a, doc_b FROM lsh_pairs),
hit AS (SELECT c.doc_a FROM cand c JOIN truth t
        ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b)
SELECT (SELECT count(*) FROM cand) AS n_candidates,
       (SELECT count(*) FROM truth) AS n_truth,
       (SELECT count(*) FROM hit) AS n_hit,
       round((SELECT count(*) FROM hit) * 1.0
             / (SELECT count(*) FROM cand), 6) AS precision_at_bar,
       round((SELECT count(*) FROM hit) * 1.0
             / (SELECT count(*) FROM truth), 6) AS recall
""",
)
def lsh_eval_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-generator quality, MEASURED: precision/recall of the
    MinHash-LSH bucket pairs against exact n-gram Jaccard ≥
    {LSH_EVAL_JACCARD} ground truth — the audit that must precede
    trusting banded LSH on a 100 TB corpus, because band geometry
    (here 4x4: P[collide] = 1-(1-j⁴)⁴ ≈ 0.22 at j=0.5) is a TUNABLE
    whose miss rate is invisible until measured. Recall is the number
    that decides whether to add bands; "precision" at the truth bar
    is expectedly low (LSH admits medium-similarity pairs by design —
    the exact verify pass downstream pays for each).

    Plan: the two pair pipelines this engine already runs (banded
    buckets; shingle inverted index) plus set intersection — three
    aggregates to scalar counts broadcast into one row. Nothing here
    exceeds the cost of the pipelines being audited."""
    # localCheckpoint: each pair relation feeds BOTH its scalar count
    # and the intersection join — without it the two most expensive
    # subtrees (banded LSH; shingle inverted index) execute twice.
    # The threshold filters the ROUNDED jaccard on both engines (the
    # emitted 6-dp column here, round(...) in the oracle) so a pair at
    # the boundary can't classify differently across engines.
    cand = (
        minhash_lsh_dedup(spark, sf_dir)
        .select("doc_a", "doc_b")
        .distinct()
        .localCheckpoint()
    )
    truth = (
        ngram_jaccard_dedup(spark, sf_dir)
        .where(F.col("jaccard") >= LSH_EVAL_JACCARD)
        .select("doc_a", "doc_b")
        .localCheckpoint()
    )
    hit = cand.join(truth, ["doc_a", "doc_b"], "inner")
    counts = (
        cand.agg(F.count("*").alias("n_candidates"))
        .crossJoin(truth.agg(F.count("*").alias("n_truth")))
        .crossJoin(hit.agg(F.count("*").alias("n_hit")))
    )
    return counts.select(
        "n_candidates",
        "n_truth",
        "n_hit",
        F.round(F.col("n_hit") / F.col("n_candidates"), 6).alias(
            "precision_at_bar"
        ),
        F.round(F.col("n_hit") / F.col("n_truth"), 6).alias("recall"),
    )


# ---------------------------------------------------------------------------
# MinHash estimator accuracy: signature agreement vs exact Jaccard
# ---------------------------------------------------------------------------


@query(
    "minhash_estimate_accuracy",
    oracle=f"""
WITH {_DUCK_LSH_PAIRS_CTE},
cand AS (SELECT DISTINCT doc_a, doc_b FROM lsh_pairs),
est AS (
  SELECT c.doc_a, c.doc_b,
         round(len(list_filter(generate_series(1, {N_HASHES}),
                               i -> sa.sig[i] = sb.sig[i]))
               * 1.0 / {N_HASHES}, 6) AS est_jaccard
  FROM cand c
  JOIN sigs sa ON sa.doc_id = c.doc_a
  JOIN sigs sb ON sb.doc_id = c.doc_b
),
jtoks AS (
  SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents
),
jsh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(generate_series(1, len(t) - 2),
             i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS g
  FROM jtoks WHERE len(t) >= 3
),
jsizes AS (SELECT doc_id, count(*) AS n FROM jsh GROUP BY doc_id),
jinter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM jsh a JOIN jsh b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT e.doc_a, e.doc_b, e.est_jaccard,
       round(coalesce(i.n_common, 0) * 1.0
             / (s1.n + s2.n - coalesce(i.n_common, 0)), 6) AS exact_jaccard,
       abs(e.est_jaccard
           - coalesce(i.n_common, 0) * 1.0
             / (s1.n + s2.n - coalesce(i.n_common, 0))) <= 0.375
         AS within_bound
FROM est e
LEFT JOIN jinter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
JOIN jsizes s1 ON s1.doc_id = e.doc_a
JOIN jsizes s2 ON s2.doc_id = e.doc_b
""",
)
def minhash_estimate_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MinHash ESTIMATOR itself, audited: for every LSH candidate
    pair, the signature-agreement estimate (matching components /
    {N_HASHES}) next to the exact 3-shingle Jaccard it estimates, and
    a bound verdict — E[est] = J with sd = sqrt(J(1-J)/{N_HASHES}) ≤
    0.125, so |est − J| ≤ 3sd = 0.375 holds per pair except with
    vanishing probability; a systematic estimator bug (wrong hash
    family, off-by-one in the component compare) breaks the bound
    wholesale and fails the hash. `lsh_eval_pr` audits the BANDING's
    candidate recall; this audits the ESTIMATE's calibration — the
    two failure modes of a MinHash deployment, now both measured.

    Plan: signatures come from the materialized per-corpus cache
    (computed once), the estimate is a narrow array comparison per
    candidate pair, and the exact side reuses the shingle
    inverted-index shape on the CANDIDATE pairs only — never all
    pairs."""
    import pyspark.sql.functions as PF

    cand = (
        minhash_lsh_dedup(spark, sf_dir)
        .select("doc_a", "doc_b")
        .distinct()
        .localCheckpoint()
    )
    sigs = minhash_signatures(spark, sf_dir)
    sa = sigs.select(PF.col("doc_id").alias("doc_a"), PF.col("sig").alias("sig_a"))
    sb = sigs.select(PF.col("doc_id").alias("doc_b"), PF.col("sig").alias("sig_b"))
    matches = PF.size(
        PF.filter(
            PF.zip_with("sig_a", "sig_b", lambda x, y: x == y),
            lambda m: m,
        )
    )
    est = (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            PF.round(matches / N_HASHES, 6).alias("est_jaccard"),
        )
    )
    # exact 3-shingle Jaccard, computed only for the candidate pairs.
    # The candidate-doc semi-filter sits ABOVE the explode by
    # necessity (Catalyst won't push a join below a generator), so
    # apply it to the DOCUMENTS scan first — shingling the whole
    # corpus to then keep 2|cand| docs cost ~6 s of pure explode.
    cand_docs = (
        cand.select(PF.col("doc_a").alias("doc_id"))
        .unionByName(cand.select(PF.col("doc_b").alias("doc_id")))
        .distinct()
    )
    d = load_table(spark, sf_dir, "documents").join(
        PF.broadcast(cand_docs), "doc_id", "left_semi"
    )
    t = tokens_col()
    sh = (
        d.where(PF.size(t) >= 3)
        .select(
            "doc_id",
            PF.explode(
                PF.array_distinct(
                    PF.expr(
                        "transform(sequence(1, size(filter(split(lower(text),"
                        " '\\\\W+'), x -> x != '')) - 2), i -> concat_ws(' ',"
                        " slice(filter(split(lower(text), '\\\\W+'),"
                        " x -> x != ''), i, 3)))"
                    )
                )
            ).alias("g"),
        )
    )
    sizes = sh.groupBy("doc_id").agg(PF.count("*").alias("n"))
    a = sh.select(PF.col("doc_id").alias("doc_a"), "g")
    b = sh.select(PF.col("doc_id").alias("doc_b"), PF.col("g").alias("gb"))
    inter = (
        a.join(b, (PF.col("g") == PF.col("gb")) & (PF.col("doc_a") < PF.col("doc_b")))
        .join(cand, ["doc_a", "doc_b"], "left_semi")
        .groupBy("doc_a", "doc_b")
        .agg(PF.count("*").alias("n_common"))
    )
    exact = (
        est.join(inter, ["doc_a", "doc_b"], "left")
        .join(sizes.select(PF.col("doc_id").alias("doc_a"), PF.col("n").alias("n_a")), "doc_a")
        .join(sizes.select(PF.col("doc_id").alias("doc_b"), PF.col("n").alias("n_b")), "doc_b")
    )
    jac = PF.coalesce(PF.col("n_common"), PF.lit(0)) / (
        PF.col("n_a") + PF.col("n_b") - PF.coalesce(PF.col("n_common"), PF.lit(0))
    )
    return exact.select(
        "doc_a",
        "doc_b",
        "est_jaccard",
        PF.round(jac, 6).alias("exact_jaccard"),
        (PF.abs(PF.col("est_jaccard") - jac) <= 0.375).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# candidate verification: exact edit distance over the LSH pairs
# ---------------------------------------------------------------------------

EDIT_SIM_THRESHOLD = 0.5  # keep pairs whose 1 - dist/max_len clears this

# Verify-stage candidate budget (round-7 verdict item 7): exact
# Levenshtein is the pipeline's most expensive per-pair kernel, so a
# run verifies at most this many candidates — the B pairs with the
# smallest deterministic pair-hash (an unbiased, reproducible sample;
# both engines rank and cut identically, so parity is structural).
# Far above every real corpus slice (sf0.1 yields 338 candidates);
# it binds only on adversarial near-dup-saturated inputs like the
# 10x scale fixture (171,911 candidates), where it bounds lane cost
# the way the LSH bucket caps bound pair-space cost. The pre-cut
# candidate count rides as an observed metric, so a binding budget
# is visible, never silent.
EDIT_VERIFY_BUDGET = 20_000


@query(
    "editdist_verify_neardup",
    oracle=f"""
WITH {_DUCK_LSH_PAIRS_CTE},
cand AS (
  SELECT doc_a, doc_b FROM lsh_pairs
  ORDER BY {DUCK_HASH64.format(expr="doc_a || '_' || doc_b")}, doc_a, doc_b
  LIMIT {EDIT_VERIFY_BUDGET}
),
ver AS (
  SELECT p.doc_a, p.doc_b,
         levenshtein(da.text, db.text) AS edit_distance,
         greatest(len(da.text), len(db.text)) AS max_len
  FROM cand p
  JOIN documents da ON da.doc_id = p.doc_a
  JOIN documents db ON db.doc_id = p.doc_b
)
SELECT doc_a, doc_b, edit_distance,
       round(1.0 - edit_distance / max_len, 6) AS edit_similarity
FROM ver
WHERE 1.0 - edit_distance / max_len >= {EDIT_SIM_THRESHOLD}
""",
)
def editdist_verify_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The VERIFY stage of the standard near-dup pipeline: LSH gives
    probabilistic candidates; exact Levenshtein over just those pairs
    confirms or rejects them. The O(n·m) distance runs only on the
    LSH-bounded candidate set (never all pairs) and, past
    {EDIT_VERIFY_BUDGET} candidates, on the deterministic hash-ranked
    budget slice (see EDIT_VERIFY_BUDGET above — observed, mirrored
    in the oracle, binding only on adversarial inputs), JVM-side via
    ``F.levenshtein``; the text shuffle is bounded by
    min(candidates, budget) × doc length — the two-sided fetch-by-id
    join a 100 TB corpus serves from a doc store. Threshold compares
    the UNROUNDED similarity on both engines so the cut is
    hash-identical."""
    pairs = (
        minhash_lsh_dedup(spark, sf_dir)
        .select("doc_a", "doc_b")
        .observe(
            "edit_verify_budget",
            F.count(F.lit(1)).alias("n_candidates"),
        )
        .orderBy(
            shared_hash64(F.concat_ws("_", "doc_a", "doc_b")),
            "doc_a",
            "doc_b",
        )
        .limit(EDIT_VERIFY_BUDGET)
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sim = F.lit(1.0) - F.col("edit_distance") / F.col("max_len")
    return (
        pairs.join(
            docs.select(
                F.col("doc_id").alias("doc_a"), F.col("text").alias("text_a")
            ),
            "doc_a",
        )
        .join(
            docs.select(
                F.col("doc_id").alias("doc_b"), F.col("text").alias("text_b")
            ),
            "doc_b",
        )
        .withColumn("edit_distance", F.levenshtein("text_a", "text_b"))
        .withColumn(
            "max_len", F.greatest(F.length("text_a"), F.length("text_b"))
        )
        .where(sim >= EDIT_SIM_THRESHOLD)
        .select(
            "doc_a",
            "doc_b",
            "edit_distance",
            F.round(sim, 6).alias("edit_similarity"),
        )
    )


@query(
    "edit_verify_budget_report",
    oracle=f"""
WITH {_DUCK_LSH_PAIRS_CTE}
SELECT count(*) AS n_candidates,
       {EDIT_VERIFY_BUDGET} AS budget,
       count(*) > {EDIT_VERIFY_BUDGET} AS budget_binding
FROM lsh_pairs
""",
)
def edit_verify_budget_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Companion relation to ``editdist_verify_neardup`` (round-9
    advice): the pre-cut candidate count, the verify budget, and
    whether the budget binds — as a one-row DATAFRAME, so a composed
    pipeline can branch on a binding budget (e.g. widen the budget,
    or tighten the LSH bands) without reaching into the JVM
    observed-metrics harness. The verify key itself stays pure
    (same schema/hash as before); this is the observability surface.

    Plan: the LSH pair relation aggregated to one row — the pair
    space is already bounded by the banding/caps, and the aggregate
    is map-side partial; at 100 TB this costs one pass over the
    candidate relation the verify stage builds anyway."""
    pairs = minhash_lsh_dedup(spark, sf_dir).select("doc_a", "doc_b")
    return pairs.agg(
        F.count("*").alias("n_candidates"),
        F.lit(EDIT_VERIFY_BUDGET).cast("int").alias("budget"),
        (F.count("*") > EDIT_VERIFY_BUDGET).alias("budget_binding"),
    )


# ---------------------------------------------------------------------------
# ensemble near-dup vote (minhash-LSH ∩ ngram-Jaccard ∩ simhash)
# ---------------------------------------------------------------------------

ENSEMBLE_MIN_VOTES = 2

#: DataFrames persist()ed by the PREVIOUS neardup_ensemble_vote call,
#: released on the next call (see the in-function comment)
_ENSEMBLE_CACHED: list = []


@query(
    "neardup_ensemble_vote",
    oracle=f"""
WITH {_DUCK_LSH_PAIRS_CTE},
etoks AS (
  SELECT doc_id, lang, {_DUCK_TOKENS} AS t FROM documents
),
g4 AS (
  SELECT doc_id, lang,
         unnest(list_transform(
             list_distinct(list_transform(generate_series(1, len(t) - 3),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])),
             g -> ('0x' || substr(md5(g), 1, 15))::BIGINT)) AS h
  FROM etoks WHERE len(t) >= 4
),
g4sizes AS (SELECT doc_id, count(*) AS n FROM g4 GROUP BY doc_id),
g4inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM g4 a JOIN g4 b
    ON a.h = b.h AND a.lang = b.lang AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jac AS (
  SELECT i.doc_a, i.doc_b
  FROM g4inter i
  JOIN g4sizes s1 ON i.doc_a = s1.doc_id
  JOIN g4sizes s2 ON i.doc_b = s2.doc_id
  WHERE CAST(i.n_common AS DOUBLE) / (s1.n + s2.n - i.n_common)
        >= {JACCARD_MIN}
),
ehashed AS (
  SELECT doc_id, list_transform(t, s -> {DUCK_HASH64.format(expr='s')}) AS hs
  FROM etoks WHERE len(t) > 0
),
esims AS (
  SELECT doc_id,
         list_sum(list_transform(generate_series(0, {N_SIMHASH_BITS - 1}),
           j -> CASE WHEN list_sum(list_transform(hs,
                         x -> ((x >> j) & 1) * 2 - 1)) > 0
                THEN 1 << j ELSE 0 END))::BIGINT AS simhash
  FROM ehashed
),
simpairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM esims a JOIN esims b
    ON a.simhash = b.simhash AND a.doc_id < b.doc_id
),
allp AS (
  SELECT doc_a, doc_b, 'minhash' AS method FROM lsh_pairs
  UNION ALL SELECT doc_a, doc_b, 'ngram' AS method FROM jac
  UNION ALL SELECT doc_a, doc_b, 'simhash' AS method FROM simpairs
)
SELECT doc_a, doc_b,
       CAST(count(*) AS BIGINT) AS n_votes,
       string_agg(method, ',' ORDER BY method) AS methods
FROM allp GROUP BY doc_a, doc_b
HAVING count(*) >= {ENSEMBLE_MIN_VOTES}
""",
)
def neardup_ensemble_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ensemble near-duplicate detection — the production curation
    reality that no single signature family is trusted alone (each
    has a distinct blind spot: MinHash-LSH misses pairs whose banding
    never collides, 4-gram Jaccard misses heavy paraphrase, SimHash
    exact-collision misses any bit flip): run all three generators
    and keep pairs confirmed by at least ENSEMBLE_MIN_VOTES methods,
    with per-pair method provenance.

    Plan posture (round-11 verdict item 5 — the ngram leg is a
    VERIFIER, not a generator): with ENSEMBLE_MIN_VOTES = 2 of 3
    methods, every surviving pair carries at least one vote from
    {minhash, simhash} — so the ngram leg never has to GENERATE
    candidates at all. The old shape composed ngram_jaccard_dedup's
    posting-list self-join, whose hot-shingle Σ list² tail dominated
    every lane it appeared in (~2 B intermediate rows / 1103 s at
    x100, EXEMPT). PPJoin prefix filtering cannot fix that leg at the
    ensemble's own θ: JACCARD_MIN = 0.01 makes the prefix length
    |d| − ceil(0.01·|d|) + 1 ≈ |d| — zero candidate elimination.
    Vote algebra is stronger than any prefix: candidates :=
    minhash ∪ simhash pairs (already-blocked relations), and the
    exact 4-gram Jaccard test runs ONLY on those pairs via a per-doc
    distinct-shingle-hash array (materialized once) and
    array_intersect — O(candidates × doc length), whole-stage
    codegen, no posting-list pair space anywhere. Output is
    IDENTICAL to the uncapped oracle (an ngram-only pair has 1 vote
    and never surfaces; any output pair is in the candidate set by
    the 2-of-3 pigeonhole), so the x10 checksum anchor holds
    unchanged. At 100 TB: ONE pair-keyed shuffle + a map-side
    broadcast verify — the generator legs stream straight into the
    vote aggregate (never materialized: the simhash leg's 16-bit
    value classes are VOCABULARY-bound — measured 1763 distinct
    values at sf0.1 — so its pair count grows quadratically with
    corpus size, ~420M rows at x100; checkpointing or re-shuffling
    that relation is the cost ceiling), and the ngram verdict is
    decided per GROUPED pair by two broadcast hash joins against the
    narrow per-doc shingle-set relation (O(corpus) build, pairs never
    move again) + one array_intersect in whole-stage codegen."""
    # Method votes travel as BIT FLAGS (minhash=1, ngram=2,
    # simhash=4); the provenance string is reconstructed from the
    # bit_or'd mask after aggregation, flag values alphabetical so
    # the rendered order matches the oracle's sorted string_agg.
    #
    # THE decisive plan property: no O(pair-space) shuffle, ever.
    # The simhash pair stream is ~402M rows at x100 and the measured
    # cost of shuffling it into a pair-keyed aggregate is ~1300 s —
    # the whole old wall. Instead every pair row decides its fate
    # MAP-SIDE (ngram verdict via the broadcast shingle sets;
    # minhash-membership via a broadcast of the 27M minhash pairs):
    # a simhash pair that fails ngram and is not a minhash pair can
    # never reach 2 votes, so it dies in the scan stage and only the
    # ~|output|-sized survivor stream shuffles into the final
    # bit_or. Over-keeping would be harmless (bit_count of the
    # merged mask is the vote count), which is why at 100 TB the
    # broadcast-of-m can be swapped for a bloom filter
    # (might_contain's false positives only pad the small shuffle,
    # never the result).
    # The candidate set (minhash ∪ simhash) drops ngram-only pairs by
    # the 2-of-3 pigeonhole — an algebra that is only sound while the
    # threshold is exactly 2. Lowering it to 1 would silently lose
    # every ngram-only pair the oracle keeps, so the coupling must
    # fail loudly instead (round-12 ADVICE).
    assert ENSEMBLE_MIN_VOTES == 2, (
        "candidate-set construction assumes the 2-of-3 pigeonhole; "
        "re-add an ngram generator leg before changing the threshold"
    )
    # persist (serialized columnar cache), NOT localCheckpoint: at
    # x100 localCheckpoint stores ~27M deserialized InternalRow
    # objects and measured 572 s against a 23 s compute (GC-locker
    # storms in the JVM log); the serialized cache costs roughly the
    # compute itself and both consumers (the vote stream and the
    # membership broadcast) share it. The caller materializes the
    # returned plan, so the three caches cannot drop inside this
    # function — instead the PREVIOUS invocation's caches release on
    # the next call (round-12 ADVICE: repeated bench/parity
    # invocations in one session must not accumulate cached blocks).
    # best-effort: an entry cached by a SparkSession that was stopped
    # and recreated between calls (bench harnesses cycling sessions in
    # one process) raises on unpersist — the blocks died with the
    # session, so swallowing is correct, not masking (round-13 ADVICE)
    while _ENSEMBLE_CACHED:
        try:
            _ENSEMBLE_CACHED.pop().unpersist()
        except Exception:
            pass
    m0 = (
        minhash_lsh_dedup(spark, sf_dir)
        .select("doc_a", "doc_b")
        .persist()
    )
    # materialize the signature relation once: the self-join would
    # otherwise recompute the 16-bit vote aggregate on BOTH sides
    # (the lsh_eval_pr discipline — audit inputs run once)
    s = (
        simhash_dedup(spark, sf_dir)
        .select("doc_id", "simhash")
        .persist()
    )
    sp = (
        s.alias("a")
        .join(s.alias("b"), "simhash")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
    )
    # per-doc distinct shingle-hash set, computed ONCE for both join
    # sides (the rhp_lsh_neardup round-11 lesson: an unmaterialized
    # relation consumed by two sides of a join runs twice)
    d = load_table(spark, sf_dir, "documents", widen=True)
    shs = (
        d.where(F.size(tokens_col()) >= 4)
        .select(
            "doc_id",
            "lang",
            F.array_distinct(
                F.transform(_word_shingles(4), lambda g: shared_hash64(g))
            ).alias("hs"),
        )
        .withColumn("n", F.size("hs"))
        .persist()
    )
    _ENSEMBLE_CACHED.extend((m0, s, shs))
    a = F.broadcast(
        shs.select(
            F.col("doc_id").alias("doc_a"),
            F.col("lang").alias("lang_a"),
            F.col("hs").alias("hs_a"),
            F.col("n").alias("na"),
        )
    )
    b = F.broadcast(
        shs.select(
            F.col("doc_id").alias("doc_b"),
            F.col("lang").alias("lang_b"),
            F.col("hs").alias("hs_b"),
            F.col("n").alias("nb"),
        )
    )
    # LEFT joins: a doc with <4 tokens has no shingle row and simply
    # cannot earn the ngram vote
    n_common = F.size(F.array_intersect("hs_a", "hs_b"))
    ngram_ok = (
        F.col("lang_a").isNotNull()
        & (F.col("lang_a") == F.col("lang_b"))
        & (
            n_common.cast("double")
            / (F.col("na") + F.col("nb") - n_common)
            >= JACCARD_MIN
        )
    )

    def _with_ok(pairs: DataFrame) -> DataFrame:
        return (
            pairs.join(a, "doc_a", "left")
            .join(b, "doc_b", "left")
            .withColumn("ok", F.coalesce(ngram_ok, F.lit(False)))
        )

    mv = _with_ok(m0).select(
        "doc_a",
        "doc_b",
        (F.lit(1) + F.when(F.col("ok"), 2).otherwise(0)).alias("mpart"),
    )
    mkeys = F.broadcast(m0.withColumn("in_m", F.lit(True)))
    spv = (
        _with_ok(sp)
        .join(mkeys, ["doc_a", "doc_b"], "left")
        .where(F.col("ok") | F.col("in_m").isNotNull())
        .select(
            "doc_a",
            "doc_b",
            (F.lit(4) + F.when(F.col("ok"), 2).otherwise(0)).alias("mpart"),
        )
    )
    g = (
        mv.unionByName(spv)
        .groupBy("doc_a", "doc_b")
        .agg(F.bit_or("mpart").alias("mask"))
    )
    methods = F.array_join(
        F.filter(
            F.array(
                F.when(F.col("mask").bitwiseAND(1) > 0, F.lit("minhash")),
                F.when(F.col("mask").bitwiseAND(2) > 0, F.lit("ngram")),
                F.when(F.col("mask").bitwiseAND(4) > 0, F.lit("simhash")),
            ),
            lambda x: x.isNotNull(),
        ),
        ",",
    )
    return (
        g.select(
            "doc_a",
            "doc_b",
            F.bit_count("mask").cast("bigint").alias("n_votes"),
            methods.alias("methods"),
        )
        .where(F.col("n_votes") >= ENSEMBLE_MIN_VOTES)
    )
