"""Extension relational surface (SURVEY.md §2.9).

The reference contains exactly one join and no numeric aggregation
(SURVEY.md §2.3-2.4); a user replacing it with this engine still needs
the full relational toolbox over the landed lake — these suites prove
that surface with hash-checked DuckDB oracles on the TPC-H-ish tables.

Float determinism: double addition is order-sensitive, and Spark's
partial aggregates + DuckDB's segment-tree window aggregates associate
differently. Every SUM/AVG here therefore aggregates DECIMAL-cast
inputs (exact, association-free) and casts the final result to DOUBLE
— bit-identical on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table


def _dec(col: str, scale: int = 2):
    return F.col(col).cast(f"decimal(18,{scale})")


# ---------------------------------------------------------------------------
# agg_suite — hash aggregate with partial (map-side) combine
# ---------------------------------------------------------------------------

@query(
    "agg_suite",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
       CAST(max(l_extendedprice) AS DOUBLE) AS max_price,
       count(*) AS count_order,
       count(DISTINCT l_partkey) AS n_parts,
       CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
            / count(*) AS DOUBLE) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-09-02'
GROUP BY l_returnflag, l_linestatus
""",
)
def agg_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped aggregation: sum/avg/min/max/count/count-distinct
    per group. Plan shape at scale: partial HashAggregate before the
    shuffle (combine on the map side), exchange only carries one row
    per (group, partition)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.min("l_extendedprice").cast("double").alias("min_price"),
            F.max("l_extendedprice").cast("double").alias("max_price"),
            F.count("*").alias("count_order"),
            F.countDistinct("l_partkey").alias("n_parts"),
        )
        .withColumn("avg_qty", (F.col("sum_qty") / F.col("count_order")).cast("double"))
    )


# ---------------------------------------------------------------------------
# window_rank_suite — ranking + frame aggregates
# ---------------------------------------------------------------------------

@query(
    "window_rank_suite",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice,
       rank()       OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       row_number() OVER w AS rn,
       lag(o_orderkey, 1)  OVER w AS prev_order,
       lead(o_orderkey, 1) OVER w AS next_order,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DOUBLE) AS running_spend
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
""",
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/row_number/lag/lead + a rowsBetween running sum
    per customer. One shuffle on o_custkey serves all six window
    functions (same partitioning+ordering → single Window node)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
        F.lag("o_orderkey", 1).over(w).alias("prev_order"),
        F.lead("o_orderkey", 1).over(w).alias("next_order"),
        F.sum(_dec("o_totalprice")).over(wsum).cast("double").alias("running_spend"),
    )


# ---------------------------------------------------------------------------
# rollup_revenue — grouping sets
# ---------------------------------------------------------------------------

@query(
    "rollup_revenue",
    oracle="""
SELECT o_orderpriority, o_orderstatus,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders
GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: (priority, status), (priority), () — the
    expand+aggregate plan; subtotal rows carry NULL group keys."""
    o = load_table(spark, sf_dir, "orders")
    return o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.sum(_dec("o_totalprice")).cast("double").alias("revenue"),
        F.count("*").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# set_ops_suite — union / intersect / except
# ---------------------------------------------------------------------------

@query(
    "set_ops_suite",
    oracle="""
WITH bld AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     rich AS (SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
SELECT 'union' AS op, c_custkey FROM (SELECT c_custkey FROM bld UNION SELECT c_custkey FROM rich)
UNION ALL
SELECT 'intersect' AS op, c_custkey FROM (SELECT c_custkey FROM bld INTERSECT SELECT c_custkey FROM rich)
UNION ALL
SELECT 'except' AS op, c_custkey FROM (SELECT c_custkey FROM bld EXCEPT SELECT c_custkey FROM rich)
""",
)
def set_ops_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """union (distinct) / intersect / except over two customer slices,
    tagged by op so one result proves all three."""
    c = load_table(spark, sf_dir, "customer")
    bld = c.where(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    rich = c.where(F.col("c_acctbal") > 5000).select("c_custkey")
    return (
        bld.union(rich).distinct().select(F.lit("union").alias("op"), "c_custkey")
        .unionAll(
            bld.intersect(rich).select(F.lit("intersect").alias("op"), "c_custkey")
        )
        .unionAll(bld.exceptAll(rich).distinct().select(F.lit("except").alias("op"), "c_custkey"))
    )


# ---------------------------------------------------------------------------
# join_suite — inner / left / semi / anti
# ---------------------------------------------------------------------------

@query(
    "join_suite",
    oracle="""
SELECT 'inner' AS jt, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'AUTOMOBILE'
UNION ALL
SELECT 'left' AS jt, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_mktsegment = 'AUTOMOBILE'
UNION ALL
SELECT 'semi' AS jt, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders o WHERE EXISTS (SELECT 1 FROM customer c
                            WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'AUTOMOBILE')
UNION ALL
SELECT 'anti' AS jt, count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c
                                WHERE c.c_custkey = o.o_custkey AND c.c_mktsegment = 'AUTOMOBILE')
""",
)
def join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """inner/left/semi/anti joins of orders against an AUTOMOBILE
    customer dim, reduced to per-join-type aggregates. The dim side is
    broadcast — at 100 TB the fact table never shuffles for any of the
    four variants."""
    o = load_table(spark, sf_dir, "orders")
    c = F.broadcast(
        load_table(spark, sf_dir, "customer").where(
            F.col("c_mktsegment") == "AUTOMOBILE"
        )
    )
    on = o["o_custkey"] == c["c_custkey"]

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count("*").alias("n"),
            F.sum(_dec("o_totalprice")).cast("double").alias("total"),
        ).select(F.lit(tag).alias("jt"), "n", "total")

    return (
        agg(o.join(c, on, "inner"), "inner")
        .unionAll(agg(o.join(c, on, "left"), "left"))
        .unionAll(agg(o.join(c, on, "left_semi"), "semi"))
        .unionAll(agg(o.join(c, on, "left_anti"), "anti"))
    )


# ---------------------------------------------------------------------------
# asof_event_order — as-of join (Spark has no native one)
# ---------------------------------------------------------------------------

@query(
    "asof_event_order",
    oracle="""
SELECT o_orderkey, o_custkey,
       e.last_event_type, e.last_event_ms
FROM orders o
LEFT JOIN (
  SELECT o_orderkey AS k, event_type AS last_event_type,
         epoch_ms(ts) AS last_event_ms,
         row_number() OVER (PARTITION BY o_orderkey
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM orders JOIN events ON user_id = o_custkey AND ts <= o_orderdate
) e ON e.k = o_orderkey AND e.rn = 1
""",
)
def asof_event_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each order, the latest event of that customer at
    or before the order date. Spark lacks a native as-of join; the
    composition is equi-join on the entity key + range predicate +
    max_by per left row. The per-key event set is bounded, so the
    max_by aggregate (map-side partial) replaces a sort. A
    merge_asof-style applyInPandas variant exists in
    operators/multimodal.py territory if per-key fan-out ever explodes;
    ties break on (ts, event_id) for determinism."""
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    joined = o.join(
        e,
        (e["user_id"] == o["o_custkey"]) & (e["ts"] <= o["o_orderdate"]),
        "inner",
    )
    last = (
        joined.groupBy("o_orderkey")
        .agg(
            F.max_by(
                F.struct(
                    F.col("event_type").alias("last_event_type"),
                    F.unix_millis(F.col("ts")).alias("last_event_ms"),
                ),
                F.struct(F.col("ts"), F.col("event_id")),
            ).alias("last")
        )
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("last.last_event_type").alias("last_event_type"),
            F.col("last.last_event_ms").alias("last_event_ms"),
        )
    )
    return o.join(last, o["o_orderkey"] == last["k"], "left").select(
        "o_orderkey", "o_custkey", "last_event_type", "last_event_ms"
    )


# ---------------------------------------------------------------------------
# date_math_suite
# ---------------------------------------------------------------------------

@query(
    "date_math_suite",
    oracle="""
SELECT o_orderkey,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
       datediff('day', DATE '1997-01-01', CAST(o_orderdate AS DATE)) AS days_since,
       CAST(year(o_orderdate) AS BIGINT) AS order_year,
       CAST(month(o_orderdate) AS BIGINT) AS order_month,
       CAST(dayofweek(CAST(o_orderdate AS DATE)) AS BIGINT) AS dow,
       (year(o_orderdate) - 1997) * 12 + (month(o_orderdate) - 1) AS months_since,
       CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS due_ts
FROM orders
""",
)
def date_math_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc / datediff / parts / month arithmetic / interval add.
    DuckDB has no months_between, so the month delta is written as
    explicit year*12+month arithmetic on both sides; dow follows
    DuckDB's Sunday=0 via (spark dayofweek - 1)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        F.date_trunc("quarter", "o_orderdate").cast("date").alias("quarter_start"),
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1997-01-01").cast("date"))
        .cast("bigint")
        .alias("days_since"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        (F.dayofweek(F.col("o_orderdate").cast("date")) - 1)
        .cast("bigint")
        .alias("dow"),
        (
            (F.year("o_orderdate") - F.lit(1997)) * 12 + (F.month("o_orderdate") - 1)
        ).alias("months_since"),
        (F.col("o_orderdate").cast("date") + F.expr("INTERVAL 90 DAYS"))
        .cast("timestamp")
        .alias("due_ts"),
    )


# ---------------------------------------------------------------------------
# string_fn_suite
# ---------------------------------------------------------------------------

@query(
    "string_fn_suite",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substr(p_name, 1, 8) AS name_prefix,
       length(p_name) AS name_len,
       regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
       replace(p_type, ' ', '_') AS type_snake,
       levenshtein(p_brand, 'Brand#00') AS brand_dist,
       concat(p_brand, ':', p_type) AS brand_type,
       CASE WHEN p_name LIKE '%green%' THEN 1 ELSE 0 END AS has_green
FROM part
""",
)
def string_fn_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """substr / regexp_extract / levenshtein / replace / concat / LIKE
    over part names — all JVM built-ins, whole-stage codegen."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.regexp_extract("p_name", "([a-z]+)", 1).alias("first_word"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.levenshtein("p_brand", F.lit("Brand#00")).cast("bigint").alias("brand_dist"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.when(F.col("p_name").like("%green%"), 1).otherwise(0).alias("has_green"),
    )


# ---------------------------------------------------------------------------
# topn_per_group
# ---------------------------------------------------------------------------

@query(
    "topn_per_group",
    oracle="""
SELECT p_brand, p_partkey, p_name, p_retailprice
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         row_number() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) WHERE rn <= 5
""",
)
def topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 parts by retail price per brand — window row_number +
    filter; AQE turns the rank filter into a partial top-k sort per
    partition before the shuffle (WindowGroupLimit)."""
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey")
    )
    return (
        p.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice")
    )


# ---------------------------------------------------------------------------
# json_props_extract
# ---------------------------------------------------------------------------

@query(
    "json_props_extract",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 0 ELSE 1 END AS has_k
FROM events
""",
)
def json_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction from the events.props payload — the
    engine-side analog of reading sparse CDC changed-field payloads
    (SURVEY.md §1.3 maps them to MapType/JSON)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k")
    return e.select(
        "event_id",
        k.cast("bigint").alias("k_val"),
        F.when(k.isNull(), 0).otherwise(1).alias("has_k"),
    )
