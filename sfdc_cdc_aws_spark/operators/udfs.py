"""User-defined-function surface (SURVEY.md §2.8).

The reference has no pluggable function registry — its only "UDFs" are
plain Python inside the Lambda (app.py:48-118), which this engine
re-expressed as built-ins. These operators demonstrate the sanctioned
escape hatches for logic built-ins can't express, in preference order:

1. built-in column expressions            — everything else in the repo
2. Arrow-vectorized ``@pandas_udf``       — :func:`pandas_fingerprint`
3. ``mapInPandas`` batch iterators        — operators/multimodal.py
4. ``applyInPandasWithState``             — streaming/job.py

Row-at-a-time Python UDFs are deliberately absent: at 100 TB the
~10-100x penalty vs Arrow batching makes them a bug, not a feature.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from sfdc_cdc_aws_spark.operators.text import _DUCK_TOKENS
from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table


def md5_hex_udf():
    """Arrow-vectorized scalar UDF: one Python invocation per ~10k-row
    Arrow batch, pandas in/out. hashlib.md5 is bit-identical to SQL
    md5(), so this UDF's output is exactly hash-checkable — chosen to
    prove the plumbing, not because you'd ever UDF what a built-in
    does. (Constructed lazily: the decorator resolves its DDL return
    type against the active SparkSession.)"""

    @pandas_udf("string")
    def _md5_hex(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: hashlib.md5(t.encode("utf-8")).hexdigest())

    return _md5_hex


@query(
    "pandas_udf_fingerprint",
    oracle="""
SELECT doc_id, md5(text) AS py_md5, md5(text) AS sql_md5
FROM documents
""",
)
def pandas_udf_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Pandas-UDF path, verified end-to-end: the same md5 computed
    (a) in Python via the Arrow-batched UDF and (b) JVM-side by the
    built-in — the oracle requires both columns identical. This is the
    template for the live SOQL-client boundary (SURVEY.md §2.8): batch
    in via Arrow, pure-Python inside, batch out."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        md5_hex_udf()(F.col("text")).alias("py_md5"),
        F.md5(F.col("text")).alias("sql_md5"),
    )


def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw approximate aggregates (user API): HLL++ distinct
    counts and t-digest percentiles per return flag — one map-side-
    combinable pass with bounded state, where the exact twins
    (``count(distinct)``, ``percentile``) need an extra shuffle or a
    per-group sort."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("approx_parts"),
            F.percentile_approx(
                F.col("l_quantity").cast("double"), [0.25, 0.5, 0.75], 10000
            ).alias("approx_q"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            "approx_parts",
            F.element_at("approx_q", 1).alias("q25"),
            F.element_at("approx_q", 2).alias("q50"),
            F.element_at("approx_q", 3).alias("q75"),
            "n",
        )
    )


# error budgets the verification relation asserts (same margins as
# tests/test_sketches.py): HLL++ default rsd 5% with 3x margin;
# percentile_approx(accuracy=10000) has rank error <= n/10000, +1 row
# of slack for the floor/ceil edges.
HLL_REL_ERR = 0.15
PCTL_ACCURACY = 10000


@query(
    "sketch_suite",
    oracle="""
SELECT l_returnflag,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
       TRUE AS distinct_ok, TRUE AS q25_ok, TRUE AS q50_ok, TRUE AS q75_ok
FROM lineitem GROUP BY l_returnflag
""",
)
def sketch_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate aggregates a 100 TB deployment actually runs
    (HLL++ distinct counts, t-digest percentiles), emitted as a
    BOUND-VERIFICATION relation so the sketch gets a cross-engine
    hash check despite being algorithm-specific: DuckDB's
    approx_count_distinct / approx_quantile use different sketches,
    so the raw estimates can never hash-match — but the exact values
    and the claim "each estimate is inside its published error bound"
    are engine-independent. Per return flag the row carries the exact
    n and distinct-part count (deterministic in both engines) plus
    one boolean per estimate: HLL++ within 3x its 5% default rsd, and
    each percentile_approx value's RANK RANGE (ties give a value a
    rank interval [count(<v)+1, count(<=v)]) intersecting the
    accuracy-10000 tolerance window around phi*n. The oracle asserts
    the booleans are all TRUE — a sketch drifting out of bound flips
    a FALSE and fails the hash, which is exactly the Misra-Gries /
    HLL contract made mechanically checkable.

    Plan: the sketch pass is one map-side-combinable aggregate; the
    verification joins the 3-row sketch relation back onto the scan
    by broadcast and recounts ranks conditionally — a second scan, no
    extra shuffle beyond the two aggregates. The raw-estimate user
    API is :func:`approx_sketches` (bench and tests exercise both)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_partkey", F.col("l_quantity").cast("double").alias("qty")
    )
    approx = approx_sketches(spark, sf_dir).select(
        "l_returnflag", "approx_parts", "q25", "q50", "q75"
    )
    joined = li.join(F.broadcast(approx), "l_returnflag")
    aggs = [
        F.count("*").alias("n"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.first("approx_parts").alias("approx_parts"),
    ]
    for phi, col in ((0.25, "q25"), (0.5, "q50"), (0.75, "q75")):
        aggs += [
            F.sum((F.col("qty") < F.col(col)).cast("long")).alias(f"lt_{col}"),
            F.sum((F.col("qty") <= F.col(col)).cast("long")).alias(f"le_{col}"),
        ]
    g = joined.groupBy("l_returnflag").agg(*aggs)

    def rank_ok(phi: float, col: str):
        # tolerance window around the target rank phi*n, in rows
        tol = F.col("n") / PCTL_ACCURACY + F.lit(1.0)
        lo = phi * F.col("n") - tol
        hi = phi * F.col("n") + tol
        # value's rank interval [lt+1, le] must intersect [lo, hi]
        return (F.col(f"lt_{col}") + 1 <= hi) & (F.col(f"le_{col}") >= lo)

    dist_ok = (
        F.abs(F.col("approx_parts") - F.col("exact_parts"))
        <= HLL_REL_ERR * F.col("exact_parts")
    )
    return g.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.col("exact_parts").cast("bigint").alias("exact_parts"),
        dist_ok.alias("distinct_ok"),
        rank_ok(0.25, "q25").alias("q25_ok"),
        rank_ok(0.5, "q50").alias("q50_ok"),
        rank_ok(0.75, "q75").alias("q75_ok"),
    )


# ---------------------------------------------------------------------------
# heavy hitters: mergeable Misra-Gries sketch
# ---------------------------------------------------------------------------

MG_CAPACITY = 64  # counters per partition sketch


def mg_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw merged Misra-Gries sketch (user API): (token,
    est_count) with at most C counters per partition, summed.

    The partial sketch is an Arrow-batched ``mapInPandas`` (batch
    value_counts merged into the counter table, batched MG decrement
    when it overflows); the merge is a plain map-side-combinable sum —
    exactly how a sketch aggregate distributes. The full merged
    sketch is returned (≤ C·partitions rows — bounded regardless of
    input size), not a top-K cut: the survival guarantee "every token
    with true count > N/C is present" holds for the sketch, and
    truncating it would silently break that contract."""
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(
                F.split(F.lower("text"), r"\W+"), lambda x: x != F.lit("")
            )
        ).alias("token")
    )

    def mg_partial(batches):
        from collections import Counter

        counters: Counter = Counter()
        for pdf in batches:
            if not len(pdf):
                continue
            counters.update(pdf["token"].value_counts().to_dict())
            if len(counters) > MG_CAPACITY:
                # batched MG decrement: subtract the (C+1)-th largest
                # count from everything, drop the non-positive
                delta = sorted(counters.values(), reverse=True)[MG_CAPACITY]
                counters = Counter(
                    {k: v - delta for k, v in counters.items() if v - delta > 0}
                )
        yield pd.DataFrame(
            {"token": list(counters.keys()), "est": list(counters.values())}
        )

    partials = toks.mapInPandas(mg_partial, "token string, est long")
    return (
        partials.groupBy("token")
        .agg(F.sum("est").alias("est_count"))
        .orderBy(F.col("est_count").desc(), F.col("token"))
    )


@query(
    "heavy_hitters_sketch",
    oracle=f"""
WITH toks AS (SELECT unnest({_DUCK_TOKENS}) AS token FROM documents),
counts AS (SELECT token, count(*) AS exact_n FROM toks GROUP BY token),
tot AS (SELECT sum(exact_n) AS n_total FROM counts)
SELECT token, CAST(exact_n AS BIGINT) AS exact_n,
       TRUE AS in_sketch, TRUE AS within_bound
FROM counts, tot
WHERE exact_n > n_total / {MG_CAPACITY}
""",
)
def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy-hitter tokens via per-partition Misra-Gries
    sketches (capacity C=64) summed across partitions — the
    bounded-state alternative to the exact ``text_token_counts`` +
    sort when the vocabulary won't fit a shuffle at 100 TB — emitted
    as a BOUND-VERIFICATION relation so the sketch gets a real
    cross-engine hash check: the sketch itself is algorithm-specific
    (no DuckDB twin), but the Misra-Gries CONTRACT is exact and
    engine-independent. For every TRUE heavy hitter (exact count >
    N/C, computed exactly in both engines over the shared tokenizer)
    the row carries the deterministic exact count plus two booleans
    the guarantee forces TRUE: the token survives in the merged
    sketch (summed undercount ≤ N/(C+1) < its excess over N/C), and
    its estimate sits within [exact−N/C, exact]. The oracle computes
    the same heavy-hitter relation with TRUE constants — a sketch
    violating its bound flips a FALSE and fails the hash. The raw
    sketch is the :func:`mg_sketch` user API (benched via this query,
    error-bounded over the full vocabulary in tests/test_sketches.py).

    Plan: sketch pass (mapInPandas partials + map-side-combinable
    sum) and exact pass (explode + count) each shuffle only counter
    rows; the heavy-hitter cut is a broadcast-scalar total, and the
    final check left-joins the ≤C·partitions-row sketch — all
    bounded relations."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.filter(
                F.split(F.lower("text"), r"\W+"), lambda x: x != F.lit("")
            )
        ).alias("token")
    )
    exact = toks.groupBy("token").agg(F.count("*").alias("exact_n"))
    total = toks.agg(F.sum(F.lit(1)).alias("n_total"))
    hh = exact.crossJoin(F.broadcast(total)).where(
        F.col("exact_n") > F.col("n_total") / MG_CAPACITY
    )
    sketch = mg_sketch(spark, sf_dir)
    est = F.col("est_count")
    return (
        hh.join(F.broadcast(sketch), "token", "left")
        .select(
            "token",
            F.col("exact_n").cast("bigint").alias("exact_n"),
            est.isNotNull().alias("in_sketch"),
            (
                est.isNotNull()
                & (est <= F.col("exact_n"))
                & (
                    F.col("exact_n") - F.coalesce(est, F.lit(0))
                    <= F.col("n_total") / MG_CAPACITY
                )
            ).alias("within_bound"),
        )
        .orderBy(F.col("exact_n").desc(), "token")
    )


# ---------------------------------------------------------------------------
# Python UDTF: the custom table-function escape hatch
# ---------------------------------------------------------------------------

UDTF_CHUNK = 64  # tokens per emitted chunk row


@query(
    "udtf_chunk_expand",
    oracle=f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
c AS (
  SELECT doc_id, t,
         unnest(generate_series(0,
             CAST(ceil(len(t) / {UDTF_CHUNK}.0) AS INT) - 1)) AS chunk_idx
  FROM toks WHERE len(t) > 0
)
SELECT doc_id,
       CAST(chunk_idx AS INT) AS chunk_idx,
       CAST(least({UDTF_CHUNK}, len(t) - chunk_idx * {UDTF_CHUNK}) AS INT)
         AS n_tokens,
       t[chunk_idx * {UDTF_CHUNK} + 1] AS first_token
FROM c
""",
)
def udtf_chunk_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 ``@udtf``): one
    input row fans out to N output rows from imperative Python — the
    escape hatch for generators no built-in expresses (stateful
    parsers, tokenizer bindings, decoder loops). The function here
    (fixed {UDTF_CHUNK}-token chunking) IS expressible declaratively —
    deliberately, so the oracle can check the UDTF machinery
    end-to-end: registration, LATERAL correlated invocation, and the
    row-generator protocol. ``re.ASCII`` pins Python's \\W to Java's
    ASCII semantics so tokenization matches the engine convention.

    The cost model is the honest part: a row-based Python UDTF pays
    pickle + per-row Python, ~10-100x an Arrow path — the guidance
    stands (built-ins, then pandas_udf/mapInPandas, UDTF only when
    per-row imperative generation is the semantics; compare
    `chunk_overlap`, the declarative chunker this engine actually
    uses)."""
    import re as _re

    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, n_tokens int, first_token string")
    class ChunkExpand:
        def eval(self, doc_id, text):  # noqa: ANN001 - UDTF protocol
            toks = [
                t
                for t in _re.split(r"\W+", (text or "").lower(), flags=_re.ASCII)
                if t
            ]
            for i in range(0, len(toks), UDTF_CHUNK):
                c = toks[i : i + UDTF_CHUNK]
                yield doc_id, i // UDTF_CHUNK, len(c), c[0]

    spark.udtf.register("chunk_expand_udtf", ChunkExpand)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf_v")
    return spark.sql(
        """
        SELECT c.doc_id, c.chunk_idx, c.n_tokens, c.first_token
        FROM docs_udtf_v d, LATERAL chunk_expand_udtf(d.doc_id, d.text) c
        """
    )
