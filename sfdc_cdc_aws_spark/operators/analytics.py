"""Deeper analytic surface: window frames, cube/pivot, subqueries,
sessionization, multi-join TPC-H-shaped reports.

These extend SURVEY.md §2.9 — the operators an analyst points at the
landed CDC lake. Everything keeps the float-determinism discipline of
operators/relational.py (DECIMAL-cast inputs into sums; ranking on
exact or rounded values with id tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table


def _dec(col: str, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# window frames beyond ranking
# ---------------------------------------------------------------------------

@query(
    "window_frame_suite",
    oracle="""
SELECT o_orderkey, o_custkey,
       ntile(4)       OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist()    OVER w, 6) AS cdist,
       first_value(o_orderkey) OVER w AS first_ok,
       last_value(o_orderkey)
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_ok,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS window3_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_frame_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile / percent_rank / cume_dist / first+last value / sliding
    3-row frame — the frame mechanics beyond plain ranking."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    w3 = w.rowsBetween(-2, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.first("o_orderkey").over(w).alias("first_ok"),
        F.last("o_orderkey").over(wall).alias("last_ok"),
        F.sum(_dec("o_totalprice")).over(w3).cast("double").alias("window3_spend"),
    )


# ---------------------------------------------------------------------------
# cube + pivot
# ---------------------------------------------------------------------------

@query(
    "cube_suite",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def cube_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all four grouping combinations in one
    expand+aggregate pass."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count("*").alias("n"),
    )


@query(
    "pivot_suite",
    oracle="""
SELECT o_orderpriority,
       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS O,
       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS F,
       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS P
FROM orders GROUP BY o_orderpriority
""",
)
def pivot_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot order status into columns. The value list is explicit
    (['O','F','P']) — at scale an implicit pivot would need a distinct
    pass first; never do that silently."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum(_dec("o_totalprice")).cast("double"))
    )


# ---------------------------------------------------------------------------
# subqueries
# ---------------------------------------------------------------------------

@query(
    "subquery_suite",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
WHERE o_totalprice > 0.9 * (SELECT max(o_totalprice) FROM orders)
   OR o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < 0)
""",
)
def subquery_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery + IN subquery through the SQL API — Catalyst
    rewrites the IN to a semi-join and the scalar to a broadcast
    single-row relation (subquery decorrelation is free, SURVEY.md
    §4). Thresholds use exact max, not avg, so the predicate boundary
    is float-deterministic."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders_v
        WHERE o_totalprice > 0.9 * (SELECT max(o_totalprice) FROM orders_v)
           OR o_custkey IN (SELECT c_custkey FROM customer_v WHERE c_acctbal < 0)
        """
    )


# ---------------------------------------------------------------------------
# sessionization
# ---------------------------------------------------------------------------

SESSION_GAP_MIN = 60


@query(
    "sessionize_events",
    oracle=f"""
WITH gaps AS (
  SELECT event_id, user_id, ts,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {SESSION_GAP_MIN} * 60 * 1000
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
SELECT event_id, user_id,
       CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM gaps
""",
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (lag + running sum of gap breaks) —
    the batch formulation; streaming uses ``session_window`` with the
    same gap (see streaming tests). One shuffle on user_id serves both
    windows."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_ms = F.unix_millis("ts") - F.lag(F.unix_millis("ts")).over(w)
    new_session = F.when(gap_ms > SESSION_GAP_MIN * 60 * 1000, 1).otherwise(0)
    return (
        e.select("event_id", "user_id", "ts", new_session.alias("new_session"))
        .withColumn(
            "session_id",
            F.sum("new_session").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        .select("event_id", "user_id", "session_id")
    )


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join reports
# ---------------------------------------------------------------------------

@query(
    "tpch_q3_shipping",
    oracle="""
SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1999-06-30'
  AND l_shipdate > TIMESTAMP '1999-06-30'
GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
ORDER BY revenue DESC, o_orderkey
LIMIT 10
""",
)
def tpch_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → fact join → agg → top-k.
    The customer dim filters to one segment and broadcasts; lineitem
    (the 100 TB table) joins orders on its own key, so the only big
    shuffle is the o_orderkey equi-join — which AQE can convert to
    broadcast if the filtered orders side collapses. Top-k is a
    TakeOrderedAndProject, not a global sort."""
    c = load_table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1999-06-30").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1999-06-30").cast("timestamp")
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("o_orderkey", F.col("o_orderdate").cast("date").alias("order_date"))
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "tpch_q10_returns",
    oracle="""
SELECT c_custkey, c_name, n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: 4-table join (two broadcast dims), revenue per
    customer over returned items, top 20."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q5_local_supply",
    oracle="""
SELECT n_name,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
                           AND c_nationkey = s_nationkey
              JOIN nation   ON s_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def tpch_q5_local_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: the 6-table local-supplier join. This is the
    join-ordering stress test — region/nation/supplier/customer are
    all broadcast dims, so the only shuffle joins are lineitem⋈orders
    (both on orderkey) and the residual c_nationkey = s_nationkey
    equality, which arrives as a cheap post-broadcast filter rather
    than a join. The date filter prunes orders before the fact join;
    at 100 TB with a date-partitioned lake it becomes partition
    pruning."""
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .join(
            F.broadcast(s),
            (li["l_suppkey"] == s["s_suppkey"])
            & (c["c_nationkey"] == s["s_nationkey"]),
        )
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("n_name")
        .agg(
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@query(
    "tpch_q18_big_orders",
    oracle="""
WITH big AS (
  SELECT l_orderkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 300
)
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price,
       qty_sum
FROM big JOIN orders ON o_orderkey = l_orderkey
         JOIN customer ON c_custkey = o_custkey
ORDER BY total_price DESC, o_orderkey
LIMIT 20
""",
)
def tpch_q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): the HAVING-filtered
    aggregate-as-build-side pattern. The per-order quantity sum reduces
    lineitem to one row per order BEFORE any join (map-side partial,
    then the HAVING cuts it to a tiny relation), so the subsequent
    joins broadcast the survivors instead of shuffling lineitem twice.
    Top-k again via TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_dec("l_quantity")).alias("qty_dec"))
        .where(F.col("qty_dec") > 300)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("qty_sum"))
    )
    return (
        F.broadcast(big)
        .join(o, big["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            F.col("o_totalprice").cast("decimal(18,2)").cast("double").alias(
                "total_price"
            ),
            "qty_sum",
        )
        .orderBy(F.desc("total_price"), "o_orderkey")
        .limit(20)
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
              * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 — the canonical predicate-pushdown query: three
    conjunctive range filters and no join, so the entire cost is the
    scan. All three predicates must reach the parquet reader
    (PushedFilters) where row-group min/max stats skip data; at 100 TB
    with date-partitioned lineitem the shipdate range also prunes
    partitions. A count rides along so the result is stable even when
    the revenue sum is empty-at-small-SF."""
    li = load_table(spark, sf_dir, "lineitem")
    f = li.where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.03, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum(_dec("l_extendedprice") * _dec("l_discount"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_rows"),
    )


@query(
    "tpch_q14_promo_effect",
    oracle="""
SELECT CAST(100.00 * sum(CASE WHEN p_type LIKE 'PROMO%'
                  THEN CAST(l_extendedprice AS DECIMAL(18,2))
                       * (1 - CAST(l_discount AS DECIMAL(18,2))) END) AS DOUBLE)
       / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate <  TIMESTAMP '1996-04-01'
""",
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 — conditional aggregation over a dimension join: one
    month of lineitem (pushed range filter) joined to part, the
    CASE-guarded numerator and the full denominator computed in the
    SAME partial-aggregating pass (one scan, one shuffle of two
    partial sums). The part side broadcasts."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    promo = F.when(F.col("p_type").like("PROMO%"), rev)
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0) * F.sum(promo).cast("double")
                / F.sum(rev).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q19_disjunctive_pushdown",
    oracle="""
SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
              * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       count(*) AS n_rows
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19_disjunctive_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — the disjunctive-predicate stress test: an OR
    of three conjunctive branches mixing columns from BOTH join sides.
    The optimizer must (a) factor the single-side implications out of
    the OR so each side's scan still gets a pushable filter
    (l_quantity ∈ [1,30]; p_size ∈ [1,15]; p_brand IN (…)), and
    (b) keep the residual mixed predicate as the join condition —
    naive handling scans both tables in full. A count rides along to
    keep the result stable at small SF."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    )
    branch = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    rev = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .where(branch)
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# multi-band single scan: N band aggregates without N self-joins
# ---------------------------------------------------------------------------


@query(
    "multi_band_single_scan",
    oracle="""
SELECT count(*) FILTER (WHERE hour(ts) BETWEEN 0 AND 2) AS h0,
       count(*) FILTER (WHERE hour(ts) BETWEEN 3 AND 5) AS h3,
       count(*) FILTER (WHERE hour(ts) BETWEEN 6 AND 8) AS h6,
       count(*) FILTER (WHERE hour(ts) BETWEEN 9 AND 11) AS h9,
       count(*) FILTER (WHERE hour(ts) BETWEEN 12 AND 14) AS h12,
       count(*) FILTER (WHERE hour(ts) BETWEEN 15 AND 17) AS h15,
       count(*) FILTER (WHERE hour(ts) BETWEEN 18 AND 20) AS h18,
       count(*) FILTER (WHERE hour(ts) BETWEEN 21 AND 23) AS h21,
       round(avg(value) FILTER (WHERE hour(ts) BETWEEN 0 AND 11), 6)
         AS am_avg_value,
       round(avg(value) FILTER (WHERE hour(ts) BETWEEN 12 AND 23), 6)
         AS pm_avg_value
FROM events
""",
)
def multi_band_single_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-DS Q88 lesson: N band metrics (8 three-hour activity
    bands + AM/PM value averages) computed as conditional aggregates
    in ONE scan — where the naive (and the benchmark's literal)
    formulation runs N scans and cross-joins the N scalar results.
    ``count(*) FILTER (WHERE ...)`` carries one counter per band
    through a single map-side partial, so the fact table is read
    once regardless of how many bands the report adds; at 100 TB
    that is an 8x scan-volume difference for this report alone.

    Plan: one FileScan, one partial+final aggregate, zero joins —
    the plan-audit sweep sees no BNLJ precisely because the bands
    never become separate relations."""
    ev = load_table(spark, sf_dir, "events")
    h = F.hour("ts")

    def band(lo: int, hi: int):
        return F.count(F.when((h >= lo) & (h <= hi), 1)).alias(f"h{lo}")

    return ev.agg(
        band(0, 2), band(3, 5), band(6, 8), band(9, 11),
        band(12, 14), band(15, 17), band(18, 20), band(21, 23),
        F.round(F.avg(F.when(h <= 11, F.col("value"))), 6).alias("am_avg_value"),
        F.round(F.avg(F.when(h >= 12, F.col("value"))), 6).alias("pm_avg_value"),
    )
