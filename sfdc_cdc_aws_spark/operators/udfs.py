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


@query(
    "sketch_suite",
    oracle=None,  # sketches are engine-specific: DuckDB's approx_count_distinct
    # and approx_quantile use different algorithms than Spark's HLL++ and
    # t-digest, so no cross-engine hash exists — the driver records the
    # rows-only check, and tests/test_sketches.py bounds the error vs exact.
)
def sketch_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The approximate aggregates a 100 TB deployment actually runs:
    HLL++ distinct counts and t-digest percentiles are one map-side-
    combinable pass with bounded state, where their exact twins
    (``count(distinct)``, ``percentile``) need an extra shuffle or a
    per-group sort. Exact variants live in agg_suite / quantile_suite;
    this pair is benched, and its error is bounded in tests."""
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


# ---------------------------------------------------------------------------
# heavy hitters: mergeable Misra-Gries sketch
# ---------------------------------------------------------------------------

MG_CAPACITY = 64  # counters per partition sketch


@query(
    "heavy_hitters_sketch",
    oracle=None,  # algorithm-specific like the HLL/t-digest pair above:
    # no cross-engine twin exists; the driver records rows-only and
    # tests/test_sketches.py bounds the error vs the exact counts.
)
def heavy_hitters_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy-hitter tokens via per-partition Misra-Gries sketches
    (capacity 64) summed across partitions — the bounded-state
    alternative to the exact ``text_token_counts`` + sort when the
    vocabulary won't fit a shuffle at 100 TB. Each partition keeps at
    most C counters regardless of input size; summed sketches keep the
    classic guarantee: every token with true count > N/C survives, and
    estimates sit within N/C below the truth (bounded in
    tests/test_sketches.py).

    The partial sketch is an Arrow-batched ``mapInPandas`` (batch
    value_counts merged into the counter table, batched MG decrement
    when it overflows); the merge is a plain map-side-combinable sum —
    exactly how a sketch aggregate distributes."""
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
    # the FULL merged sketch (≤ C·partitions rows — bounded regardless
    # of input size), not a top-K cut: the survival guarantee "every
    # token with true count > N/C is present" holds for the sketch,
    # and truncating it would silently break that contract
    return (
        partials.groupBy("token")
        .agg(F.sum("est").alias("est_count"))
        .orderBy(F.col("est_count").desc(), F.col("token"))
    )
