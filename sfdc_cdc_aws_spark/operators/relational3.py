"""Third relational suite: generator functions with ordinality and
multiset set operations — ANSI surface the first two suites don't
touch (relational.py has distinct-set ops; this one proves the ALL
variants' multiplicity semantics, and posexplode's position output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.operators.text import _DUCK_TOKENS, tokens_col
from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table


@query(
    "posexplode_suite",
    oracle=f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
e AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, least(5, len(t))),
                               i -> {{'pos': i - 1, 'tok': t[i]}})) AS u
  FROM toks WHERE len(t) > 0
)
SELECT doc_id, CAST(u.pos AS INT) AS pos, u.tok AS token FROM e
""",
)
def posexplode_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional explode (generator with ordinality): the first five
    tokens of every document with their positions — the UNNEST WITH
    ORDINALITY shape. The slice bounds the fan-out before the
    generator runs, so the explode is narrow and the row count is
    5·docs, not tokens."""
    d = load_table(spark, sf_dir, "documents")
    t = tokens_col()
    return (
        d.where(F.size(t) > 0)
        .select("doc_id", F.posexplode(F.slice(t, 1, 5)).alias("pos", "token"))
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "token")
    )


@query(
    "set_ops_all_suite",
    oracle="""
WITH a AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
     b AS (SELECT c_nationkey FROM customer WHERE c_acctbal > 5000)
SELECT 'union_all' AS op, c_nationkey
FROM (SELECT c_nationkey FROM a UNION ALL SELECT c_nationkey FROM b)
UNION ALL
SELECT 'intersect_all' AS op, c_nationkey
FROM (SELECT c_nationkey FROM a INTERSECT ALL SELECT c_nationkey FROM b)
UNION ALL
SELECT 'except_all' AS op, c_nationkey
FROM (SELECT c_nationkey FROM a EXCEPT ALL SELECT c_nationkey FROM b)
""",
)
def set_ops_all_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (bag) set operations — UNION ALL / INTERSECT ALL /
    EXCEPT ALL over overlapping customer slices with duplicate
    nationkeys, so multiplicity semantics (min / difference of
    duplicate counts) are what the oracle actually checks, not just
    membership. Spark plans intersectAll/exceptAll as count-annotated
    aggregates + a generate — no row-by-row matching."""
    c = load_table(spark, sf_dir, "customer")
    a = c.where(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    b = c.where(F.col("c_acctbal") > 5000).select("c_nationkey")
    tag = lambda df, op: df.select(F.lit(op).alias("op"), "c_nationkey")  # noqa: E731
    return (
        tag(a.unionAll(b), "union_all")
        .unionAll(tag(a.intersectAll(b), "intersect_all"))
        .unionAll(tag(a.exceptAll(b), "except_all"))
    )


@query(
    "safe_arithmetic_suite",
    oracle="""
SELECT o_orderkey,
       o_totalprice / NULLIF(CAST(o_orderkey % 3 AS DOUBLE), 0)
         AS safe_div,
       TRY_CAST(o_orderstatus AS INTEGER) AS bad_cast,
       TRY_CAST(CAST(o_orderkey AS VARCHAR) AS INTEGER) AS good_cast,
       COALESCE(TRY_CAST(o_orderstatus AS INTEGER), -1) AS cast_or_default,
       CASE WHEN o_orderkey % 3 = 0 THEN NULL
            ELSE o_totalprice / CAST(o_orderkey % 3 AS DOUBLE) END
         AS case_guard_div
FROM orders
WHERE o_orderkey <= 1000
""",
)
def safe_arithmetic_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe expression surface — the NULL-not-exception contract
    a pipeline needs when raw data reaches arithmetic: try_divide
    (÷0 → NULL), try_cast (unparseable → NULL), coalesce defaults,
    and the explicit CASE guard. All whole-stage-codegen built-ins;
    the point of the oracle is that Spark's try_* semantics and ANSI
    SQL's NULLIF/TRY_CAST idioms agree row-for-row, so queries port
    between the engines without wrapping every division in a guard.
    Map-only: the filter pushes to the scan, zero shuffles."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") <= 1000)
    denom = (F.col("o_orderkey") % 3).cast("double")
    return o.select(
        "o_orderkey",
        F.try_divide(F.col("o_totalprice"), F.nullif(denom, F.lit(0.0))).alias(
            "safe_div"
        ),
        F.col("o_orderstatus").try_cast("int").alias("bad_cast"),
        F.col("o_orderkey").cast("string").try_cast("int").alias("good_cast"),
        F.coalesce(
            F.col("o_orderstatus").try_cast("int"), F.lit(-1)
        ).alias("cast_or_default"),
        F.when(F.col("o_orderkey") % 3 == 0, F.lit(None).cast("double"))
        .otherwise(F.col("o_totalprice") / denom)
        .alias("case_guard_div"),
    )


@query(
    "histogram_bins",
    oracle="""
SELECT CAST(floor(o_totalprice / 5000.0) AS BIGINT) AS bin,
       floor(o_totalprice / 5000.0) * 5000.0 AS bin_lo,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bin_sum
FROM orders
GROUP BY bin, bin_lo
""",
)
def histogram_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order value — the profiling aggregate
    behind every data-quality dashboard. Binning is pure arithmetic
    (floor-divide, no UDF, no sort), so the whole histogram is one
    map-side-partial aggregate whose shuffle carries |bins| rows.
    Contrast quantile_suite (exact percentiles need a sort-based
    aggregate): for monitoring at 100 TB the fixed-width histogram is
    the cheap always-on path, percentiles the occasional exact one."""
    o = load_table(spark, sf_dir, "orders")
    bin_ = F.floor(F.col("o_totalprice") / 5000.0)
    return o.groupBy(
        bin_.cast("bigint").alias("bin"),
        (bin_ * 5000.0).alias("bin_lo"),
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("bin_sum"),
    )


@query(
    "yoy_revenue_growth",
    oracle="""
WITH yearly AS (
  SELECT n.n_name AS nation,
         CAST(year(o.o_orderdate) AS INT) AS yr,
         CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
                  * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS DOUBLE)
           AS revenue
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY nation, yr
)
SELECT nation, yr, revenue,
       lag(revenue) OVER (PARTITION BY nation ORDER BY yr) AS prev_revenue,
       revenue / lag(revenue) OVER (PARTITION BY nation ORDER BY yr) - 1.0
         AS yoy_growth
FROM yearly
""",
)
def yoy_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per customer nation — the
    canonical period-comparison report, expressed as ONE pass: the
    yearly rollup (map-side partials; customer/nation broadcast under
    the lineitem><orders join) followed by a lag window over the
    |nations × years| aggregated relation. The naive formulation
    self-joins two copies of the rollup on yr = yr+1 and scans the
    facts twice; the window form reads them once and shuffles the
    tiny aggregate, not the join."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    cn = F.broadcast(
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation")),
            F.col("n_nationkey") == F.col("c_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )
    yearly = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cn, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("yr"),
        )
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("nation").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "nation",
        "yr",
        "revenue",
        prev.alias("prev_revenue"),
        (F.col("revenue") / prev - 1.0).alias("yoy_growth"),
    )


JOINEST_TOP_K = 10


@query(
    "join_cardinality_estimate",
    oracle=f"""
WITH e AS (SELECT user_id, count(*) AS n_e FROM events GROUP BY 1),
o AS (SELECT o_custkey, count(*) AS n_o FROM orders GROUP BY 1),
contrib AS (
  SELECT e.user_id AS join_key, CAST(n_e * n_o AS BIGINT) AS out_rows
  FROM e JOIN o ON e.user_id = o.o_custkey
),
tot AS (
  SELECT CAST(sum(out_rows) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS n_keys
  FROM contrib
),
top AS (
  SELECT join_key, out_rows,
         row_number() OVER (ORDER BY out_rows DESC, join_key) AS rk
  FROM contrib
)
SELECT t.join_key, t.out_rows, x.total_rows, x.n_keys,
       round(t.out_rows * 1.0 / x.total_rows, 6) AS share
FROM top t CROSS JOIN tot x
WHERE t.rk <= {JOINEST_TOP_K}
""",
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size prediction WITHOUT running the join: the output
    cardinality of events ⋈ orders on the user key is
    Σ_k count_events(k) · count_orders(k), computed from the two
    per-key count relations — the estimate a cost-based planner (or
    an engineer sizing a shuffle) needs before committing to a join
    strategy, with the top-{JOINEST_TOP_K} contributing keys and
    their output share attached. A key carrying >10% of the output
    is the broadcast/salt signal skew_key_report raises
    (relational2.py) — this op quantifies the blast radius before
    any data moves.

    Plan: each side collapses to its unique-key count relation at a
    map-side partial (the shuffles carry keys, not rows); the contrib
    join runs on those two SMALL relations, and the total is a
    broadcast scalar. Cost is two aggregates over key columns —
    strictly cheaper than the join being estimated, which is the
    point."""
    ev = load_table(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count("*").alias("n_e")
    )
    orders = load_table(spark, sf_dir, "orders").groupBy("o_custkey").agg(
        F.count("*").alias("n_o")
    )
    contrib = ev.join(orders, F.col("user_id") == F.col("o_custkey")).select(
        F.col("user_id").alias("join_key"),
        (F.col("n_e") * F.col("n_o")).cast("bigint").alias("out_rows"),
    )
    tot = contrib.agg(
        F.sum("out_rows").cast("bigint").alias("total_rows"),
        F.count("*").cast("bigint").alias("n_keys"),
    )
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.orderBy(F.col("out_rows").desc(), F.col("join_key"))
    )
    return (
        contrib.withColumn("rk", rk)
        .where(F.col("rk") <= JOINEST_TOP_K)
        .crossJoin(F.broadcast(tot))
        .select(
            "join_key",
            "out_rows",
            "total_rows",
            "n_keys",
            F.round(F.col("out_rows") / F.col("total_rows"), 6).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# quantile bucketize: value-based feature binning against exact quartiles
# ---------------------------------------------------------------------------


@query(
    "quantile_bucketize",
    oracle="""
WITH q AS (
  SELECT percentile_cont(0.25) WITHIN GROUP (ORDER BY o_totalprice) AS q1,
         percentile_cont(0.50) WITHIN GROUP (ORDER BY o_totalprice) AS q2,
         percentile_cont(0.75) WITHIN GROUP (ORDER BY o_totalprice) AS q3
  FROM orders
)
SELECT o.o_orderkey,
       CAST(1 + (o.o_totalprice > q.q1)::INT + (o.o_totalprice > q.q2)::INT
              + (o.o_totalprice > q.q3)::INT AS INT) AS bucket
FROM orders o CROSS JOIN q
""",
)
def quantile_bucketize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based quartile binning (the exact-quantile
    QuantileDiscretizer): every order assigned the bucket its total
    price falls in, with boundaries computed from the data itself.
    Unlike ``ntile`` — which splits by ROW COUNT and breaks ties
    arbitrarily — value-based cut points give every equal value the
    same bucket, which is what a feature pipeline needs for
    reproducibility.

    Plan: the boundary relation is ONE row (three interpolated
    percentiles — Spark ``percentile`` ≡ DuckDB ``percentile_cont``,
    parity proven by `quantile_suite`); it cross-joins back by
    broadcast, so bucketing 100 TB of facts is one scan + one
    one-row broadcast — no shuffle of the fact side at all."""
    o = load_table(spark, sf_dir, "orders")
    q = o.agg(
        F.percentile("o_totalprice", 0.25).alias("q1"),
        F.percentile("o_totalprice", 0.50).alias("q2"),
        F.percentile("o_totalprice", 0.75).alias("q3"),
    )
    bucket = (
        F.lit(1)
        + (F.col("o_totalprice") > F.col("q1")).cast("int")
        + (F.col("o_totalprice") > F.col("q2")).cast("int")
        + (F.col("o_totalprice") > F.col("q3")).cast("int")
    )
    return o.crossJoin(F.broadcast(q)).select(
        "o_orderkey", bucket.cast("int").alias("bucket")
    )


# ---------------------------------------------------------------------------
# LATERAL correlated join
# ---------------------------------------------------------------------------


@query(
    "lateral_join_topn",
    oracle="""
SELECT n.n_name, t.c_name, t.c_acctbal
FROM nation n,
     LATERAL (SELECT c_name, c_acctbal FROM customer c
              WHERE c.c_nationkey = n.n_nationkey
              ORDER BY c_acctbal DESC, c_name LIMIT 2) t
""",
)
def lateral_join_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join — per nation, its two richest
    customers via a correlated subquery in the FROM clause. The ANSI
    LATERAL surface is the point: Catalyst DECORRELATES the per-row
    subquery into one window-rank over the customer side joined back
    to nation (DecorrelateInnerQuery) — the same plan `topn_per_group`
    builds by hand, proving the declarative form costs nothing.
    Deterministic tie-break (c_acctbal DESC, c_name) pins the LIMIT 2
    cut across engines.

    Plan: no per-nation re-execution survives optimization — one
    shuffle of customers on nationkey, rank, filter, broadcast-join
    the 25-row nation dim."""
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_lat_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat_v")
    return spark.sql(
        """
        SELECT n.n_name, t.c_name, t.c_acctbal
        FROM nation_lat_v n,
             LATERAL (SELECT c_name, c_acctbal FROM customer_lat_v c
                      WHERE c.c_nationkey = n.n_nationkey
                      ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        """
    )


# ---------------------------------------------------------------------------
# recursive CTE: bounded BFS over an edge list
# ---------------------------------------------------------------------------

_BFS_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT user_id AS src, CAST(floor(value) AS BIGINT) % 500 AS dst
  FROM {events} WHERE value IS NOT NULL
),
walk(node, dist) AS (
  SELECT DISTINCT src AS node, 0 AS dist FROM edges WHERE src % 97 = 0
  UNION ALL
  SELECT DISTINCT e.dst AS node, w.dist + 1 AS dist
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.dist < 3
)
SELECT node, CAST(min(dist) AS INT) AS hops FROM walk GROUP BY node
"""


@query("recursive_bfs_hops", oracle=_BFS_SQL.format(events="events"))
def recursive_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded BFS via ANSI ``WITH RECURSIVE`` (Spark 4's recursive
    CTE support): hop distance from seed nodes over a derived edge
    list, depth-capped at 3 — the reachability shape (lineage walks,
    referral chains) that previously forced a driver-side loop like
    `dedup_clusters`' Pregel iteration. The IDENTICAL SQL text runs
    on both engines; min-dist is aggregated OUTSIDE the recursion
    (recursive terms can't aggregate), and each step SELECTs DISTINCT
    (node, dist) so the frontier is bounded by the NODE count per
    level — without it the recursion materializes every PATH, which
    multiplies by the out-degree each hop and tripped Spark's
    RECURSION_ROW_LIMIT (1M rows) at sf0.1 while passing at sf0.01:
    the textbook example of a plan that only breaks at scale.

    Scale note: each recursion step is a plain equi-join of the
    frontier against the edge list — shuffle-partitioned like any
    join; the depth cap (not engine magic) is what bounds work, the
    same discipline the iterative operators apply explicitly.
    `dedup_clusters` remains the scale path for full transitive
    closure (its frontier CONTRACTS via min-label convergence);
    recursion is the declarative tool for short bounded walks."""
    load_table(spark, sf_dir, "events").createOrReplaceTempView("events_bfs_v")
    return spark.sql(_BFS_SQL.format(events="events_bfs_v"))


# ---------------------------------------------------------------------------
# VARIANT: Spark 4's semi-structured type over the raw props JSON
# ---------------------------------------------------------------------------


@query(
    "variant_suite",
    oracle="""
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INT) AS k_int,
       CAST(json_extract(props, '$.k') AS DOUBLE) / 10 AS k_scaled,
       json_extract_string(props, '$.missing') AS missing_path,
       CAST(json_extract(props, '$.k') AS INT) IS NOT NULL AS has_k
FROM events WHERE event_id % 11 = 0
""",
)
def variant_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT over the raw JSON payload: ``parse_json`` once
    into the binary semi-structured type, then typed path access with
    ``variant_get`` — the schema-on-read answer for payloads whose
    shape is not known at pipeline-build time (the same gap the
    envelope's MapType fills for CDC headers, here for arbitrary
    nesting). VARIANT keeps the parsed tree in a binary encoding, so
    repeated path accesses don't re-parse the JSON text the way
    chained ``get_json_object`` calls do — the difference between one
    parse and P parses per row at 100 TB. Missing paths yield NULL
    (``try_variant_get`` semantics), checked by the `missing_path`
    column; the oracle recomputes every access with DuckDB's JSON
    operators over the same text.

    Plan: narrow per-row expressions on a pushed-filter scan — no
    shuffle, no UDF."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 11 == 0)
    v = F.parse_json("props")
    k_int = F.try_variant_get(v, "$.k", "int")
    return ev.select(
        "event_id",
        k_int.alias("k_int"),
        (F.try_variant_get(v, "$.k", "double") / 10).alias("k_scaled"),
        F.try_variant_get(v, "$.missing", "string").alias("missing_path"),
        k_int.isNotNull().alias("has_k"),
    )


# ---------------------------------------------------------------------------
# SQL pipe syntax: the linear query form, same Catalyst plan
# ---------------------------------------------------------------------------


@query(
    "pipe_sql_suite",
    oracle="""
SELECT o_orderpriority,
       count(*) AS n_orders,
       round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2)
         AS revenue
FROM orders
WHERE o_orderstatus = 'O'
GROUP BY o_orderpriority
HAVING count(*) > 10
""",
)
def pipe_sql_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL PIPE syntax (Spark 4's ``|>`` operator): the same
    filter → aggregate → having pipeline written in execution order
    instead of SELECT's inside-out nesting. The surface is the point
    — pipes parse to the IDENTICAL logical plan (WHERE after
    AGGREGATE becomes HAVING), so the feature costs nothing and the
    oracle is the classic formulation. Analysts migrating scripts
    between dialects get a mechanical rewrite path.

    Plan: pushed status filter, map-side partial aggregate, |priority|
    rows shuffled — same as the GROUP BY form, by construction."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe_v")
    return spark.sql(
        """
        FROM orders_pipe_v
        |> WHERE o_orderstatus = 'O'
        |> AGGREGATE count(*) AS n_orders,
                     round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                                AS DOUBLE), 2) AS revenue
           GROUP BY o_orderpriority
        |> WHERE n_orders > 10
        """
    )


# ---------------------------------------------------------------------------
# data-quality expectations: the dbt-tests analog as one relation
# ---------------------------------------------------------------------------


@query(
    "dq_expectations",
    oracle="""
SELECT 'orders_pk_unique' AS expectation,
       CAST((SELECT count(*) - count(DISTINCT o_orderkey) FROM orders)
            AS BIGINT) AS n_bad,
       (SELECT count(*) - count(DISTINCT o_orderkey) FROM orders) = 0 AS ok
UNION ALL
SELECT 'orders_custkey_not_null',
       CAST((SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT),
       (SELECT count(*) FROM orders WHERE o_custkey IS NULL) = 0
UNION ALL
SELECT 'orders_to_customer_ref',
       CAST((SELECT count(*) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
       (SELECT count(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey)) = 0
UNION ALL
SELECT 'lineitem_to_orders_ref',
       CAST((SELECT count(*) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT),
       (SELECT count(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_orderkey = l.l_orderkey)) = 0
UNION ALL
SELECT 'lineitem_qty_in_range',
       CAST((SELECT count(*) FROM lineitem
             WHERE l_quantity < 1 OR l_quantity > 50) AS BIGINT),
       (SELECT count(*) FROM lineitem
        WHERE l_quantity < 1 OR l_quantity > 50) = 0
UNION ALL
SELECT 'orders_status_in_set',
       CAST((SELECT count(*) FROM orders
             WHERE o_orderstatus NOT IN ('O', 'F', 'P')) AS BIGINT),
       (SELECT count(*) FROM orders
        WHERE o_orderstatus NOT IN ('O', 'F', 'P')) = 0
""",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality expectations over the lake — the
    dbt-tests / Great-Expectations analog as ONE relation: primary-key
    uniqueness, not-null, referential integrity (both fact→dim
    edges), range, and accepted-values checks, each emitting its
    violation count and verdict. A CI gate diffs `ok` against
    all-TRUE; the violation counts make a red check actionable
    without a re-query.

    Plan: uniqueness is a distinct-count aggregate; referential
    integrity is a LEFT ANTI join per edge (Catalyst's decorrelated
    NOT EXISTS — shuffle-parallel, no per-row subquery); range/set
    checks are pushed-filter counts. Each check is a scalar
    aggregate; the final relation is six broadcast one-row unions —
    checking 100 TB costs the scans, not the assembly."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    li = load_table(spark, sf_dir, "lineitem")

    def check(name: str, bad_df: DataFrame) -> DataFrame:
        return bad_df.agg(F.count("*").cast("bigint").alias("n_bad")).select(
            F.lit(name).alias("expectation"),
            "n_bad",
            (F.col("n_bad") == 0).alias("ok"),
        )

    dup = o.groupBy("o_orderkey").count().where(F.col("count") > 1)
    pk_unique = dup.agg(
        F.coalesce(F.sum(F.col("count") - 1), F.lit(0)).cast("bigint").alias("n_bad")
    ).select(
        F.lit("orders_pk_unique").alias("expectation"),
        "n_bad",
        (F.col("n_bad") == 0).alias("ok"),
    )
    return (
        pk_unique
        .unionByName(check("orders_custkey_not_null", o.where(F.col("o_custkey").isNull())))
        .unionByName(
            check(
                "orders_to_customer_ref",
                o.join(c, o["o_custkey"] == c["c_custkey"], "left_anti"),
            )
        )
        .unionByName(
            check(
                "lineitem_to_orders_ref",
                li.join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti"),
            )
        )
        .unionByName(
            check(
                "lineitem_qty_in_range",
                li.where((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)),
            )
        )
        .unionByName(
            check(
                "orders_status_in_set",
                o.where(~F.col("o_orderstatus").isin("O", "F", "P")),
            )
        )
    )
