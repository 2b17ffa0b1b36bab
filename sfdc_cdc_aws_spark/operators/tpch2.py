"""TPC-H shapes, third batch: Q2/Q9/Q11/Q12/Q16/Q20 — the six queries
whose spec columns the driver's tables lack (partsupp, l_commitdate /
l_receiptdate / l_shipmode, p_container, p_mfgr, s_comment, c_phone).

Each runs here as an adapted shape that keeps the query's *plan*
interesting for the same reason the spec version is:

- Q2   correlated MIN subquery -> decorrelated window-min over the
       candidate relation; lineitem stands in for partsupp (the
       observed min unit price IS a supply-cost relation).
- Q9   five-way join profit rollup by (nation, year).
- Q11  group-by value vs a broadcast scalar threshold (HAVING against
       a scalar subquery over the same relation).
- Q12  big-big shuffle join + conditional (CASE) aggregation.
- Q16  distinct part-supplier pairs, NOT-IN anti join, COUNT DISTINCT.
- Q20  two-level semi-join chain gated on an aggregate inequality.

Same determinism discipline as tpch.py: DECIMAL-cast inputs into every
sum, DOUBLE-cast results, identical association in the oracle; the one
division (Q2's unit price) is IEEE double in both engines so the
min/equality round-trips exactly.

Reference parity: the reference has no analytics surface at all (it
lands raw CDC JSON on S3 — worker/lambda/app.py:96-118); this module
is part of the SURVEY.md §2.9 mandated extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table


def _dec(col: str, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# Q2 (adapted) — minimum-cost supplier per part
# ---------------------------------------------------------------------------

@query(
    "tpch_q2_min_cost_supplier",
    oracle="""
WITH ps AS (
  SELECT l.l_partkey, l.l_suppkey,
         min(CAST(l.l_extendedprice AS DOUBLE)
             / CAST(l.l_quantity AS DOUBLE)) AS cost
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_size <= 15 AND p.p_type = 'LARGE'
  GROUP BY l.l_partkey, l.l_suppkey
),
cand AS (
  SELECT ps.l_partkey AS p_partkey, s.s_name, n.n_name,
         CAST(s.s_acctbal AS DOUBLE) AS s_acctbal, ps.cost
  FROM ps
  JOIN supplier s ON s.s_suppkey = ps.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT p_partkey, s_name, n_name, s_acctbal, cost
FROM (SELECT cand.*, min(cost) OVER (PARTITION BY p_partkey) AS mn
      FROM cand)
WHERE cost = mn
""",
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape — for each qualifying part, the EUROPE supplier
    offering it at minimum cost. The driver has no partsupp table, so
    lineitem IS the part-supplier relation and "supply cost" is the
    minimum observed unit price (extendedprice/quantity, IEEE double
    division — bit-identical across engines, so the min/equality
    round-trips exactly).

    The spec's correlated scalar-MIN subquery decorrelates into a
    window min over the candidate relation: lineitem is filtered by a
    broadcast part filter BEFORE its one shuffle (groupBy partkey,
    suppkey), the supplier->nation->region chain is a broadcast dim
    tree, and the per-part min is a window over the post-aggregation
    relation (|parts x suppliers| rows, not |lineitem|). At 100 TB
    the only big exchange is the pre-filtered lineitem aggregate —
    exactly the partsupp-sized relation the spec query reads."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .where((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
        .select("p_partkey")
    )
    ps = (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(
                F.col("l_extendedprice").cast("double")
                / F.col("l_quantity").cast("double")
            ).alias("cost")
        )
    )
    eu = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
            ),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey", "s_name", "n_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )
    cand = ps.join(eu, F.col("s_suppkey") == F.col("l_suppkey")).select(
        F.col("l_partkey").alias("p_partkey"), "s_name", "n_name", "s_acctbal", "cost"
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("mn", F.min("cost").over(w))
        .where(F.col("cost") == F.col("mn"))
        .drop("mn")
    )


# ---------------------------------------------------------------------------
# Q9 (adapted) — product-type profit by nation and year
# ---------------------------------------------------------------------------

@query(
    "tpch_q9_product_profit",
    oracle="""
SELECT n.n_name AS nation,
       CAST(year(o.o_orderdate) AS INT) AS o_year,
       CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
         AS sum_profit
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN orders o ON o.o_orderkey = l.l_orderkey
WHERE p.p_name LIKE '%bolt%'
GROUP BY nation, o_year
""",
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape — profit on a product line by supplier nation
    and order year (no ps_supplycost in the driver's data, so profit
    is discounted revenue). The five-way join is the point: part
    (name LIKE, broadcast — prunes lineitem FIRST), supplier->nation
    (broadcast dim tree), then the one genuinely big join
    lineitem><orders on orderkey, then a two-key rollup whose shuffle
    carries |nations x years| partial states. Catalyst orders the
    broadcasts below the shuffle join so the big exchange only
    carries name-matched rows."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("%bolt%"))
        .select("p_partkey")
    )
    sn = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey", "n_name")
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    profit = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(sn, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 (adapted) — important stock identification
# ---------------------------------------------------------------------------

@query(
    "tpch_q11_important_stock",
    oracle="""
WITH asia_value AS (
  SELECT l.l_partkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS value_dec
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  WHERE r.r_name = 'ASIA'
  GROUP BY l.l_partkey
)
SELECT l_partkey AS ps_partkey, CAST(value_dec AS DOUBLE) AS value
FROM asia_value
WHERE CAST(value_dec AS DOUBLE)
      > (SELECT CAST(sum(value_dec) AS DOUBLE) * 0.001 FROM asia_value)
""",
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape — parts representing a significant share of the
    stock held by one region's suppliers (no partsupp: "stock value"
    is discounted lineitem revenue from ASIA suppliers). The defining
    shape is a HAVING against a scalar subquery over the SAME grouped
    relation: here the per-part aggregate is computed once, the grand
    total is a broadcast one-row aggregate of it, and the filter is a
    crossJoin(broadcast scalar) — the relation is never re-scanned and
    nothing but |parts| rows flow after the single lineitem shuffle.
    Both sides sum exact decimals; the 0.001 threshold multiply
    happens in double on identical inputs."""
    li = load_table(spark, sf_dir, "lineitem")
    asia = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
            ),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
        .select("s_suppkey")
    )
    value = _dec("l_extendedprice") * (F.lit(1) - _dec("l_discount"))
    per_part = (
        li.join(asia, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(value).alias("value_dec"))
    )
    thresh = F.broadcast(
        per_part.agg(
            (F.sum("value_dec").cast("double") * F.lit(0.001)).alias("threshold")
        )
    )
    return (
        per_part.crossJoin(thresh)
        .where(F.col("value_dec").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("value_dec").cast("double").alias("value"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 (adapted) — shipping-class priority counts
# ---------------------------------------------------------------------------

@query(
    "tpch_q12_ship_priority_counts",
    oracle="""
SELECT l.l_returnflag AS ship_class,
       CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01'
  AND l.l_shipdate > o.o_orderdate
GROUP BY ship_class
""",
)
def tpch_q12_ship_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape — did late lines carry urgent orders? (No
    l_shipmode/l_commitdate/l_receiptdate: the mode becomes
    l_returnflag and "received late" becomes shipped-after-order.)
    The shape is the spec's: one big-big shuffle join orders><lineitem
    where BOTH date predicates push into the lineitem scan (only the
    1997 slice shuffles), the cross-relation lateness predicate
    evaluates join-side, and the conditional CASE aggregation
    collapses everything into |classes| x 2 counters with map-side
    partials."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 (adapted) — supplier count by part brand/type/size
# ---------------------------------------------------------------------------

@query(
    "tpch_q16_supplier_part_counts",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       count(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
JOIN part p ON p.p_partkey = ps.l_partkey
WHERE p.p_brand <> 'Brand#5'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND ps.l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def tpch_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape — how many suppliers can supply each qualifying
    part class? lineitem's distinct (partkey, suppkey) pairs stand in
    for partsupp, and the spec's "customer complaints" NOT IN becomes
    negative-balance suppliers (no s_comment column). The shape: a
    map-side-partial DISTINCT on (partkey, suppkey) is the only big
    exchange; the part predicate broadcasts; the NOT IN is a broadcast
    ANTI join (the excluded set is a handful of keys — never a shuffle);
    COUNT(DISTINCT suppkey) re-uses the grouping exchange via
    Catalyst's two-phase distinct-aggregate expansion."""
    ps = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part").where(
            (F.col("p_brand") != "Brand#5")
            & (F.col("p_type") != "PROMO")
            & (F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49))
        )
    )
    complained = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .where(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        ps.join(complained, F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 (adapted) — suppliers with promotable surplus of a part line
# ---------------------------------------------------------------------------

@query(
    "tpch_q20_promotable_suppliers",
    oracle="""
WITH ship AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
         CAST(sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01'
                        AND l_shipdate <  TIMESTAMP '1997-01-01'
                       THEN CAST(l_quantity AS DECIMAL(18,2))
                       ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           AS recent_qty
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
promo AS (
  SELECT DISTINCT ship.l_suppkey
  FROM ship
  JOIN part p ON p.p_partkey = ship.l_partkey
  WHERE p.p_name LIKE 'small%'
    AND ship.recent_qty > 0.4 * ship.total_qty
)
SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'AFRICA'
  AND s.s_suppkey IN (SELECT l_suppkey FROM promo)
""",
)
def tpch_q20_promotable_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape — suppliers whose recent shipments of a part
    line dominate their stock (no ps_availqty: "availability" is the
    all-time shipped quantity per (part, supplier), and the spec's
    half-of-year-volume gate becomes recent-year > 40% of all-time).
    The nested-subquery chain keeps its shape: ONE per-(part,supplier)
    aggregate computes both sums in a single pass (the conditional sum
    replaces the spec's second correlated subquery), a broadcast part
    name-filter gates it, and suppliers are kept via a LEFT SEMI join
    — at scale nothing flows to the final join but distinct qualifying
    suppkeys. The 0.4 multiply is double-on-exact-decimal on both
    engines."""
    li = load_table(spark, sf_dir, "lineitem")
    recent = (F.col("l_shipdate") >= "1996-01-01") & (
        F.col("l_shipdate") < "1997-01-01"
    )
    ship = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("total_qty"),
        F.sum(F.when(recent, _dec("l_quantity")).otherwise(F.lit(0).cast("decimal(18,2)")))
        .cast("double")
        .alias("recent_qty"),
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    promo = (
        ship.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .where(F.col("recent_qty") > 0.4 * F.col("total_qty"))
        .select("l_suppkey")
    )
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "region").where(F.col("r_name") == "AFRICA")
            ),
            F.col("r_regionkey") == F.col("n_regionkey"),
        )
    )
    return s.join(promo, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi").select(
        "s_name", F.col("s_acctbal").cast("double").alias("s_acctbal")
    )
