"""Statistical profiling and relational-robustness operators.

Three capabilities a 100 TB curation pipeline needs that the other
suites don't cover:

- ``stats_moments_suite`` — higher-moment statistics (variance,
  skewness, kurtosis, covariance, correlation) computed from ONE scan
  of exact power sums. The map-side partial aggregate carries nine
  numbers per group regardless of input size — the mergeable-
  statistics pattern (contrast quantile_suite's sort-based exact
  percentiles, which cannot partial-aggregate).
- ``interval_coalesce`` — merge overlapping half-open time intervals
  per key (gaps-and-islands): the span-level view behind outage
  reports, session stitching, and "coverage" metrics.
- ``schema_drift_union`` — the CDC schema-evolution read: epochs of
  the same entity with drifting column sets unioned by NAME with
  missing columns as NULL, the contract a long-lived landing zone
  needs when the upstream adds fields (reference: the subscriber
  stores whatever envelope fields arrive, worker/lambda/app.py:97-118
  re-projects against the CURRENT schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table

# ---------------------------------------------------------------------------
# exact higher moments from power sums
# ---------------------------------------------------------------------------

# One SQL text, two engines. Spark SQL and DuckDB both parse this
# query; running the IDENTICAL expression tree on both sides makes
# every derived double bit-identical (same exact integer/decimal sums,
# then the same IEEE-754 operation sequence), which the driver's
# string-hash compare requires. The inner aggregate keeps everything
# EXACT: quantity is integral (1..50 doubles) so its power sums live
# in BIGINT; price sums use DECIMAL wide enough that no product or
# sum ever rounds (DECIMAL(10,0)*DECIMAL(18,2) stays under 38 digits
# — a bare bigint*decimal product would overflow precision 38 and
# round engine-dependently). Only the final derived statistics are
# DOUBLE.
#
# At 100 TB this is the profile you can always afford: the shuffle
# carries |groups| rows of 8 sums; skewness of a trillion rows costs
# one scan. BIGINT x^4 sums overflow past ~1.5e12 rows of x<=50 —
# at that scale widen to DECIMAL(38,0), same plan.
_MOMENTS_SQL = """
WITH sums AS (
  SELECT l_returnflag AS flag,
         COUNT(*) AS n,
         SUM(CAST(l_quantity AS BIGINT)) AS sx,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sx2,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
             * CAST(l_quantity AS BIGINT)) AS sx3,
         SUM(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)
             * CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT)) AS sx4,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sy,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_extendedprice AS DECIMAL(18,2))) AS sy2,
         SUM(CAST(l_quantity AS DECIMAL(10,0))
             * CAST(l_extendedprice AS DECIMAL(18,2))) AS sxy
  FROM {T}
  GROUP BY l_returnflag
),
m AS (
  SELECT flag, n,
         CAST(sx  AS DOUBLE) / n AS ex,
         CAST(sx2 AS DOUBLE) / n AS ex2,
         CAST(sx3 AS DOUBLE) / n AS ex3,
         CAST(sx4 AS DOUBLE) / n AS ex4,
         CAST(sy  AS DOUBLE) / n AS ey,
         CAST(sy2 AS DOUBLE) / n AS ey2,
         CAST(sxy AS DOUBLE) / n AS exy,
         CAST(sy  AS DOUBLE) AS syd,
         CAST(sy2 AS DOUBLE) AS sy2d,
         CAST(sx  AS DOUBLE) AS sxd,
         CAST(sxy AS DOUBLE) AS sxyd
  FROM sums
),
c AS (
  SELECT flag, n, ex, ey,
         ex2 - ex * ex AS m2x,
         ex3 - 3.0 * ex * ex2 + 2.0 * ex * ex * ex AS m3x,
         ex4 - 4.0 * ex * ex3 + 6.0 * ex * ex * ex2
             - 3.0 * ex * ex * ex * ex AS m4x,
         ey2 - ey * ey AS m2y,
         exy - ex * ey AS cxy,
         (sy2d - syd * syd / n) / (n - 1) AS var_price_samp,
         (sxyd - sxd * syd / n) / (n - 1) AS covar_samp
  FROM m
)
SELECT flag, n,
       ex AS mean_qty,
       m2x AS var_qty_pop,
       m3x / (m2x * sqrt(m2x)) AS skew_qty,
       m4x / (m2x * m2x) - 3.0 AS kurt_qty,
       ey AS mean_price,
       sqrt(var_price_samp) AS stddev_price_samp,
       covar_samp AS covar_qty_price_samp,
       cxy / (sqrt(m2x) * sqrt(m2y)) AS corr_qty_price
FROM c
""".strip()


@query("stats_moments_suite", oracle=_MOMENTS_SQL.format(T="lineitem"))
def stats_moments_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / population variance / skewness / excess kurtosis of
    quantity plus sample stddev, covariance, and correlation against
    price, per return flag — all nine statistics from ONE pass of
    exact power sums (n, Σx..Σx⁴ in BIGINT, Σy, Σy², Σxy in exact
    DECIMAL), so the aggregate is map-side partial and the shuffle
    carries |groups| rows of eight numbers however big the scan is.
    The derived moments are computed by the SAME SQL text the oracle
    runs (see _MOMENTS_SQL), making every double bit-identical across
    engines — the manual power-sum formulation exists because each
    engine's built-in skewness()/kurtosis() pick their own
    accumulation order and denominators, which can never hash-match."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_mom_v")
    return spark.sql(_MOMENTS_SQL.format(T="lineitem_mom_v"))


# ---------------------------------------------------------------------------
# interval coalescing (gaps and islands over real overlaps)
# ---------------------------------------------------------------------------

# synthetic duration: event_id % 7 + 1 minutes — deterministic, spans
# 1..7 min against a median inter-event gap in the same ballpark, so
# at every SF some intervals overlap and some don't (non-vacuous both
# ways).
_IVL_DUR_MIN_MOD = 7


@query(
    "interval_coalesce",
    oracle=f"""
WITH iv AS (
  SELECT user_id, event_id,
         epoch_ms(ts) AS s_ms,
         epoch_ms(ts) + ((event_id % {_IVL_DUR_MIN_MOD}) + 1) * 60000 AS e_ms
  FROM events
),
m AS (
  SELECT user_id, event_id, s_ms, e_ms,
         max(e_ms) OVER (PARTITION BY user_id ORDER BY s_ms, e_ms, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev_max
  FROM iv
),
g AS (
  SELECT user_id, s_ms, e_ms,
         CASE WHEN prev_max IS NULL OR s_ms > prev_max THEN 1 ELSE 0 END
           AS is_new,
         event_id
  FROM m
),
grp AS (
  SELECT user_id, s_ms, e_ms,
         CAST(sum(is_new) OVER (PARTITION BY user_id
                                ORDER BY s_ms, e_ms, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS span_id
  FROM g
)
SELECT user_id, span_id,
       min(s_ms) AS span_start_ms,
       max(e_ms) AS span_end_ms,
       count(*) AS n_events
FROM grp
GROUP BY user_id, span_id
""",
)
def interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping [start, end) intervals per user into maximal
    covered spans — gaps-and-islands via running max: an interval
    starts a new span iff its start exceeds the max end seen so far
    (touching intervals merge, half-open semantics). Differs from
    ``sessionize_events`` (gap between POINTS) in that intervals have
    extent, so a long interval can swallow many later short ones.

    One shuffle on user_id serves both windows AND the final rollup
    (same partitioning, Exchange reuse); everything else is integer
    arithmetic in whole-stage codegen. The running max is O(1) state
    per row — the sort-merge formulation of interval union, which is
    the only shape that survives a per-key history too big for memory
    at 100 TB."""
    e = load_table(spark, sf_dir, "events")
    s_ms = F.unix_millis("ts")
    dur_ms = ((F.col("event_id") % _IVL_DUR_MIN_MOD) + 1) * 60000
    iv = e.select(
        "user_id",
        "event_id",
        s_ms.alias("s_ms"),
        (s_ms + dur_ms).alias("e_ms"),
    )
    w = Window.partitionBy("user_id").orderBy("s_ms", "e_ms", "event_id")
    prev_max = F.max("e_ms").over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    is_new = F.when(
        prev_max.isNull() | (F.col("s_ms") > prev_max), 1
    ).otherwise(0)
    spans = iv.withColumn("is_new", is_new).withColumn(
        "span_id",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return spans.groupBy("user_id", "span_id").agg(
        F.min("s_ms").alias("span_start_ms"),
        F.max("e_ms").alias("span_end_ms"),
        F.count("*").alias("n_events"),
    )


# ---------------------------------------------------------------------------
# schema evolution across epochs
# ---------------------------------------------------------------------------


@query(
    "schema_drift_union",
    oracle="""
SELECT 1 AS epoch, o_orderkey, o_totalprice,
       CAST(NULL AS VARCHAR) AS o_orderstatus,
       CAST(NULL AS BIGINT) AS o_custkey
FROM orders WHERE o_orderkey % 3 = 0
UNION ALL
SELECT 2 AS epoch, o_orderkey, o_totalprice, o_orderstatus,
       CAST(NULL AS BIGINT) AS o_custkey
FROM orders WHERE o_orderkey % 3 = 1
UNION ALL
SELECT 3 AS epoch, o_orderkey, o_totalprice, o_orderstatus, o_custkey
FROM orders WHERE o_orderkey % 3 = 2
""",
)
def schema_drift_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Read three 'epochs' of the same entity whose column set grew
    over time (the CDC schema-drift case: the upstream added fields)
    and union them BY NAME with absent columns as typed NULLs —
    ``unionByName(allowMissingColumns=True)``, the positional-union
    footgun's antidote. The oracle spells out the same contract as
    explicit NULL projections (ANSI SQL has no by-name union; DuckDB's
    UNION BY NAME is the same rewrite).

    Pure map-side: three filtered scans of the same file concatenated,
    no shuffle; at scale each epoch is its own partition directory and
    the union is metadata-only."""
    o = load_table(spark, sf_dir, "orders")
    e1 = o.where(F.col("o_orderkey") % 3 == 0).select(
        F.lit(1).alias("epoch"), "o_orderkey", "o_totalprice"
    )
    e2 = o.where(F.col("o_orderkey") % 3 == 1).select(
        F.lit(2).alias("epoch"), "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    e3 = o.where(F.col("o_orderkey") % 3 == 2).select(
        F.lit(3).alias("epoch"), "o_orderkey", "o_totalprice", "o_orderstatus", "o_custkey"
    )
    out = e1.unionByName(e2, allowMissingColumns=True).unionByName(
        e3, allowMissingColumns=True
    )
    # unionByName leaves the missing columns untyped-null only on the
    # short side; the result schema is the union — epoch 1's
    # o_orderstatus arrives as NULL VARCHAR, matching the oracle.
    return out
