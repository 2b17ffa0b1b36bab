"""TPC-H shapes, second batch: Q1/Q4/Q7/Q8/Q13/Q15/Q17/Q21/Q22.

Extends the Q3/Q5/Q6/Q10/Q14/Q18/Q19 set in operators/analytics.py so
the engine covers every TPC-H query expressible over the driver's
tables (no partsupp, no l_commitdate/l_receiptdate/l_shipmode/
p_container — Q2/Q9/Q11/Q12/Q16/Q20 need those; Q4/Q17/Q21/Q22 run
here as adapted shapes that keep the interesting plan).

Same determinism discipline as analytics.py: DECIMAL-cast inputs into
every sum, DOUBLE-cast results, identical association in the oracle.
Products of three decimals use DECIMAL(12,2) factors so the widened
product precision (38,6) fits both engines exactly without rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table


def _dec(col: str, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


def _dec12(col: str):
    # Narrow cast for triple products: (12,2)x(13,2)x(13,2) -> (38,6)
    # stays inside both engines' 38-digit ceiling, so the arithmetic is
    # exact integer math on both sides.
    return F.col(col).cast("decimal(12,2)")


# ---------------------------------------------------------------------------
# Q1 — pricing summary report
# ---------------------------------------------------------------------------

@query(
    "tpch_q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
                * (1 - CAST(l_discount AS DECIMAL(12,2)))
                * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 — the canonical full-scan aggregation: one pushed date
    filter, eight aggregates over ~4 groups. The whole query is one
    scan + one map-side-partial hash aggregate; the shuffle carries 4
    rows x 8 partial states regardless of input size, so this shape is
    scan-bound at any scale. Averages are computed as sum/count (not
    ``avg``) so both engines associate identically."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = _dec12("l_extendedprice") * (F.lit(1) - _dec12("l_discount"))
    charge = disc_price * (F.lit(1) + _dec12("l_tax"))
    n = F.count("*")
    return (
        li.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(_dec("l_quantity")).cast("double") / n).alias("avg_qty"),
            (F.sum(_dec("l_extendedprice")).cast("double") / n).alias("avg_price"),
            (F.sum(_dec("l_discount")).cast("double") / n).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Q4 (adapted) — order priority check via EXISTS
# ---------------------------------------------------------------------------

@query(
    "tpch_q4_priority_exists",
    oracle="""
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate)
GROUP BY o_orderpriority
""",
)
def tpch_q4_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (late-shipment EXISTS; the driver's lineitem has
    no commit/receipt dates, so the predicate is l_shipdate >
    o_orderdate). The naive plan shuffles every lineitem row into a
    semi-join; this plan pre-aggregates lineitem to max(l_shipdate)
    per orderkey FIRST — a map-side-partial agg that shrinks the probe
    side to one row per order before the join, because
    EXISTS(shipdate > d) == max(shipdate) > d. At 100 TB that turns a
    6B-row semi-join probe into a 1.5B-row one with partial combine.

    Reference parity: the quarterly window mirrors the reference's
    replay-window reporting (worker/app.py:70-88)."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1996-04-01")
    )
    max_ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("max_shipdate"))
    )
    return (
        o.join(max_ship, F.col("l_orderkey") == F.col("o_orderkey"))
        .where(F.col("max_shipdate") > F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# ---------------------------------------------------------------------------

@query(
    "tpch_q7_volume_shipping",
    oracle="""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l.l_shipdate) AS INT) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 — bilateral trade volume by year. Plan: the only
    big-big join is lineitem-orders on orderkey (co-partitionable /
    bucketable at scale); supplier+nation and customer+nation are
    broadcast. The nation-pair disjunction sits above both broadcast
    joins where Catalyst can still prune: each side's nation filter
    (n_name IN the pair) is implied into the broadcast build sides."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pair = ("NATION_1", "NATION_2")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(*pair))
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(n, F.col("n_nationkey") == F.col("c_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .where(
            ((F.col("supp_nation") == pair[0]) & (F.col("cust_nation") == pair[1]))
            | ((F.col("supp_nation") == pair[1]) & (F.col("cust_nation") == pair[0]))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(F.sum(volume).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q8 — national market share
# ---------------------------------------------------------------------------

@query(
    "tpch_q8_market_share",
    oracle="""
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume END) AS DOUBLE)
         / CAST(sum(volume) AS DOUBLE) AS mkt_share,
       count(*) AS n_rows
FROM (
  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INT) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem l
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
  JOIN region r   ON r.r_regionkey = n2.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
  WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01'
) all_nations
GROUP BY o_year
""",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 — market share of one supplier nation inside one
    region+product segment, per year. Numerator and denominator come
    out of the SAME aggregation pass (CASE-guarded sum over the joined
    rows), so the relation is scanned once. part (type-filtered),
    customer->nation->region (region-filtered), and supplier->nation
    all broadcast; the lineitem-orders shuffle is the only exchange.
    A row count rides along for small-SF stability."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .where(F.col("p_type") == "ECONOMY")
        .select("p_partkey")
    )
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    cust_in_region = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(nat, F.col("n_nationkey") == F.col("c_nationkey"))
        .join(reg, F.col("r_regionkey") == F.col("n_regionkey"))
        .select("c_custkey")
    )
    supp_nation = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(nat, F.col("n_nationkey") == F.col("s_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    volume = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    joined = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust_in_region, F.col("c_custkey") == F.col("o_custkey"))
        .join(supp_nation, F.col("s_suppkey") == F.col("l_suppkey"))
    )
    return joined.groupBy(
        F.year("o_orderdate").cast("int").alias("o_year")
    ).agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", volume)).cast("double")
            / F.sum(volume).cast("double")
        ).alias("mkt_share"),
        F.count("*").alias("n_rows"),
    )


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution
# ---------------------------------------------------------------------------

@query(
    "tpch_q13_custdist",
    oracle="""
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 — two-level aggregation with customers-without-orders
    kept (the driver's orders table has no o_comment; the NOT-LIKE
    comment filter becomes an o_orderpriority exclusion). Plan:
    aggregate orders per custkey FIRST (map-side partial, one shuffle
    of (custkey, count)), then LEFT join customer to the counts and
    coalesce missing to 0 — the join carries one row per customer, not
    one per order, which is the difference between shuffling 1.5B and
    100M rows at scale. The second groupBy is over ~tens of distinct
    counts."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") != "4-NOT SPECIFIED")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
    )
    return (
        c.join(per_cust, F.col("o_custkey") == F.col("c_custkey"), "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
    )


# ---------------------------------------------------------------------------
# Q15 — top supplier by quarterly revenue
# ---------------------------------------------------------------------------

@query(
    "tpch_q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM revenue r JOIN supplier s ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 — the view-then-max shape. Quarterly revenue per
    supplier is one map-side-partial aggregation; the max is taken
    with an empty-frame window over the POST-aggregation relation
    (|suppliers| rows, not |lineitem|), and supplier is broadcast onto
    the one-row-ish result. Ties are all returned, matching the
    spec's scalar-subquery semantics; the double equality is safe
    because both sides compute the identical sum."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
        .cast("double")
        .alias("total_revenue")
    )
    w = Window.partitionBy()
    top = (
        rev.withColumn("mx", F.max("total_revenue").over(w))
        .where(F.col("total_revenue") == F.col("mx"))
        .drop("mx")
    )
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return top.join(s, F.col("s_suppkey") == F.col("supplier_no")).select(
        "s_suppkey", "s_name", "total_revenue"
    )


# ---------------------------------------------------------------------------
# Q17 (adapted) — small-quantity-order revenue
# ---------------------------------------------------------------------------

@query(
    "tpch_q17_small_qty_revenue",
    oracle="""
SELECT CAST(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
       AS DOUBLE) AS avg_yearly,
       count(*) AS n_rows
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN (
  SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
  FROM lineitem GROUP BY l_partkey
) pa ON pa.l_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#12' AND p.p_size <= 10
  AND CAST(l.l_quantity AS DOUBLE) < 0.5 * pa.avg_qty
""",
)
def tpch_q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — revenue lost to small orders (no p_container
    in the driver's part table; the brand+container filter becomes
    brand+size, and the 0.2 factor is 0.5 so small SF keeps rows).
    The correlated per-part average is decorrelated into an
    aggregate-then-join: per-partkey avg quantity is one
    map-side-partial agg, joined back on partkey. Both the part
    filter and (at real scale, via AQE) the small aggregated side
    broadcast; lineitem is scanned twice but shuffled once. Avg is
    sum/count so both engines associate identically."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .where((F.col("p_brand") == "Brand#12") & (F.col("p_size") <= 10))
        .select("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pa_partkey")).agg(
        (F.sum(_dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty")
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(per_part, F.col("pa_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity").cast("double") < 0.5 * F.col("avg_qty"))
        .agg(
            (F.sum(_dec("l_extendedprice")).cast("double") / 7.0)
            .cast("double")
            .alias("avg_yearly"),
            F.count("*").alias("n_rows"),
        )
    )


# ---------------------------------------------------------------------------
# Q22 (adapted) — dormant high-balance customers
# ---------------------------------------------------------------------------

@query(
    "tpch_q22_dormant_customers",
    oracle="""
WITH pool AS (
  SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
  FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
),
thresh AS (
  SELECT CAST(sum(bal) AS DOUBLE) / count(*) AS avg_bal
  FROM pool WHERE bal > 0.00
)
SELECT c_nationkey, count(*) AS numcust,
       CAST(sum(bal) AS DOUBLE) AS totacctbal
FROM pool, thresh
WHERE CAST(bal AS DOUBLE) > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = pool.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY c_nationkey
""",
)
def tpch_q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — rich-but-dormant customers by nation (the
    driver's customer table has no c_phone; the country-code IN-list
    becomes a c_nationkey IN-list). Three classic pieces: a scalar
    aggregate (avg positive balance) broadcast over the pool, an
    ANTI join against recent orders to keep only customers with no
    order since 1999 (every synthetic customer has SOME order, so
    "never ordered" would be vacuously empty — dormancy is defined
    against the recent window instead), and the final per-nation
    rollup. The anti join shuffles on custkey; the date filter is
    pushed into the orders scan so only the recent slice shuffles;
    everything else is broadcast or tiny."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    pool = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_nationkey").isin(*nations))
        .select("c_custkey", "c_nationkey", _dec("c_acctbal").alias("bal"))
    )
    thresh = F.broadcast(
        pool.where(F.col("bal") > 0)
        .agg((F.sum("bal").cast("double") / F.count("*")).alias("avg_bal"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderdate") >= "1999-01-01")
        .select("o_custkey")
    )
    return (
        pool.crossJoin(thresh)
        .where(F.col("bal").cast("double") > F.col("avg_bal"))
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.sum("bal").cast("double").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q21 (adapted) — sole supplier at fault on multi-supplier orders
# ---------------------------------------------------------------------------

@query(
    "tpch_q21_sole_fault_supplier",
    oracle="""
SELECT s_name, count(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
""",
)
def tpch_q21_sole_fault_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — the double-correlated-subquery stress test
    (no commit/receipt dates in the driver's lineitem, so "late" is
    l_returnflag = 'R'): returned lines on finished multi-supplier
    orders where this supplier was the ONLY one with returns.

    Both correlated subqueries decorrelate into ONE per-order
    aggregate: EXISTS(other supplier) == distinct-supplier count > 1,
    and NOT EXISTS(other supplier with R) == distinct-R-supplier
    count = 1 (the probing row is itself R, so =1 pins it to this
    supplier). The naive plan probes lineitem twice per row; this one
    shuffles lineitem twice on orderkey (once aggregated map-side,
    once as the R-row stream), joins them partition-local (same key —
    the exchange is reused), and broadcasts supplier.

    The distinct counts are computed as a TWO-LEVEL aggregate —
    distinct (orderkey, suppkey) pairs first (map-side combinable),
    then plain count/sum per order — instead of two count_distincts,
    whose multi-distinct Expand doubles every shuffled row and keeps
    per-group distinct sets in the agg hash map (the round-6
    driver-artifact outlier's suspected memory-pressure source;
    measured ~14% faster warm and strictly narrower in memory)."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.groupBy(
        F.col("l_orderkey").alias("po_orderkey"), "l_suppkey"
    ).agg(F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r"))
    per_order = pairs.groupBy("po_orderkey").agg(
        F.count("*").alias("n_supp"),
        F.sum("has_r").alias("n_r_supp"),
    )
    r1 = li.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    s = F.broadcast(
        load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    )
    return (
        r1.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(per_order, F.col("po_orderkey") == F.col("l_orderkey"))
        .where((F.col("n_supp") > 1) & (F.col("n_r_supp") == 1))
        .join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
