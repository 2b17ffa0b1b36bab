"""Event-sequence analytics over the ``events`` table: ordered
funnels and cohort retention.

The reference's event stream is a CDC bus (EmpConnector.java:89-120);
once events land in a lake the questions become behavioral — "who
completed signup → view → purchase, in order?" and "of the users who
arrived in week W, how many were still active k weeks later?". Both
are pure aggregate/join plans keyed on user_id: one shuffle of the
events relation, then every later step joins per-user scalars on the
same key (partition-local under the reused exchange).

Timestamps cross the API as epoch milliseconds (bigint) — the
project-wide convention for oracle-hashable time values (DuckDB
``epoch_ms`` == Spark ``unix_millis`` after the loader's ns→µs
conversion; both floor)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table

WEEK_MS = 7 * 24 * 3600 * 1000

# the ordered funnel: each stage must happen strictly after the prior
FUNNEL = ("signup", "view", "purchase")


@query(
    "funnel_ordered_stages",
    oracle=f"""
WITH s1 AS (
  SELECT user_id, min(epoch_ms(ts)) AS signup_ms
  FROM events WHERE event_type = '{FUNNEL[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(epoch_ms(e.ts)) AS view_ms
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = '{FUNNEL[1]}' AND epoch_ms(e.ts) > s1.signup_ms
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(epoch_ms(e.ts)) AS purchase_ms
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = '{FUNNEL[2]}' AND epoch_ms(e.ts) > s2.view_ms
  GROUP BY e.user_id
)
SELECT s1.user_id, s1.signup_ms, s2.view_ms, s3.purchase_ms,
       1 + CASE WHEN s2.view_ms IS NULL THEN 0 ELSE 1 END
         + CASE WHEN s3.purchase_ms IS NULL THEN 0 ELSE 1 END AS funnel_depth
FROM s1 LEFT JOIN s2 ON s2.user_id = s1.user_id
        LEFT JOIN s3 ON s3.user_id = s1.user_id
""",
)
def funnel_ordered_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel signup → view → purchase: each
    stage's timestamp is the user's FIRST qualifying event strictly
    after the prior stage (so a view before signup doesn't count).
    Decorrelated into a chain of per-user min-aggregates — every
    step is a map-side-partial agg + same-key join, so the events
    relation shuffles once on user_id and the per-user scalars ride
    the reused partitioning. Output: per-user stage times (epoch ms,
    null when the stage was never reached in order) and funnel
    depth."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_millis("ts").alias("ms")
    )
    s1 = (
        e.where(F.col("event_type") == FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ms").alias("signup_ms"))
    )
    s2 = (
        e.where(F.col("event_type") == FUNNEL[1])
        .join(s1.select(F.col("user_id").alias("u1"), "signup_ms"),
              F.col("u1") == F.col("user_id"))
        .where(F.col("ms") > F.col("signup_ms"))
        .groupBy("user_id")
        .agg(F.min("ms").alias("view_ms"))
    )
    s3 = (
        e.where(F.col("event_type") == FUNNEL[2])
        .join(s2.select(F.col("user_id").alias("u2"), "view_ms"),
              F.col("u2") == F.col("user_id"))
        .where(F.col("ms") > F.col("view_ms"))
        .groupBy("user_id")
        .agg(F.min("ms").alias("purchase_ms"))
    )
    depth = (
        F.lit(1)
        + F.col("view_ms").isNotNull().cast("int")
        + F.col("purchase_ms").isNotNull().cast("int")
    )
    return (
        s1.join(s2.withColumnRenamed("user_id", "u2"),
                F.col("u2") == F.col("user_id"), "left")
        .join(s3.withColumnRenamed("user_id", "u3"),
              F.col("u3") == F.col("user_id"), "left")
        .select(
            "user_id",
            "signup_ms",
            "view_ms",
            "purchase_ms",
            depth.alias("funnel_depth"),
        )
    )


@query(
    "cohort_retention",
    oracle=f"""
WITH first_seen AS (
  SELECT user_id, min(epoch_ms(ts)) // {WEEK_MS} AS cohort_week
  FROM events GROUP BY user_id
)
SELECT f.cohort_week,
       epoch_ms(e.ts) // {WEEK_MS} - f.cohort_week AS week_offset,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN first_seen f ON f.user_id = e.user_id
GROUP BY 1, 2
""",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen week,
    counted distinct in every subsequent activity week (offset 0 =
    the arrival week itself). Two aggregates on user-keyed data —
    first-seen is map-side partial; the retention count shuffles
    (cohort, offset, user) triples after the same-key join. Week
    bucketing is integer division of epoch ms, exact in both
    engines."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_millis("ts").alias("ms")
    )
    first_seen = e.groupBy(F.col("user_id").alias("fu")).agg(
        F.expr(f"min(ms) div {WEEK_MS}").alias("cohort_week")
    )
    return (
        e.join(first_seen, F.col("fu") == F.col("user_id"))
        .select(
            "cohort_week",
            (F.expr(f"ms div {WEEK_MS}") - F.col("cohort_week")).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


RFM_TILES = 4  # quartile segmentation


@query(
    "rfm_segmentation",
    oracle=f"""
WITH anchor AS (SELECT max(epoch_ms(ts)) AS now_ms FROM events
                WHERE event_type = 'purchase'),
per_user AS (
  SELECT user_id,
         CAST(a.now_ms - max(epoch_ms(ts)) AS BIGINT) AS recency_ms,
         count(*) AS frequency,
         round(sum(value), 6) AS monetary
  FROM events CROSS JOIN anchor a
  WHERE event_type = 'purchase'
  GROUP BY user_id, a.now_ms
),
tiled AS (
  SELECT user_id, recency_ms, frequency, monetary,
         ntile({RFM_TILES}) OVER (ORDER BY recency_ms, user_id) AS r_tile,
         ntile({RFM_TILES}) OVER (ORDER BY frequency DESC, user_id) AS f_tile,
         ntile({RFM_TILES}) OVER (ORDER BY monetary DESC, user_id) AS m_tile
  FROM per_user
)
SELECT user_id, recency_ms, frequency, monetary,
       r_tile, f_tile, m_tile,
       CAST(r_tile AS VARCHAR) || CAST(f_tile AS VARCHAR)
         || CAST(m_tile AS VARCHAR) AS segment
FROM tiled
""",
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation
    over purchase events — the classic lifecycle scoring: per user,
    time since last purchase, purchase count, and revenue, each cut
    into {RFM_TILES} quantile tiles; the concatenated tile digits are
    the segment label ("111" = best, "444" = churned).

    Plan: one shuffle of the (pushed-down-filtered) purchase events
    on user_id with map-side partial aggregates; the three ntile
    windows then run over the per-USER relation — orders of magnitude
    smaller than the event log, the standard cardinality cliff that
    makes global quantile windows affordable (the same relation a
    mart would materialize). Deterministic tie-break (metric,
    user_id) makes ntile's row numbering — and therefore every tile —
    identical across engines. The recency anchor is the data's own
    max timestamp (broadcast scalar), so the query is reproducible
    with no wall-clock input."""
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    ms = F.unix_millis("ts")
    per_user = ev.groupBy("user_id").agg(
        F.max(ms).alias("last_ms"),
        F.count("*").alias("frequency"),
        F.round(F.sum("value"), 6).alias("monetary"),
    )
    anchor = per_user.agg(F.max("last_ms").alias("now_ms"))
    from pyspark.sql import Window

    u = per_user.crossJoin(F.broadcast(anchor)).select(
        "user_id",
        (F.col("now_ms") - F.col("last_ms")).alias("recency_ms"),
        "frequency",
        "monetary",
    )
    r_t = F.ntile(RFM_TILES).over(Window.orderBy("recency_ms", "user_id"))
    f_t = F.ntile(RFM_TILES).over(
        Window.orderBy(F.col("frequency").desc(), "user_id")
    )
    m_t = F.ntile(RFM_TILES).over(
        Window.orderBy(F.col("monetary").desc(), "user_id")
    )
    return u.select(
        "user_id",
        "recency_ms",
        "frequency",
        "monetary",
        r_t.alias("r_tile"),
        f_t.alias("f_tile"),
        m_t.alias("m_tile"),
    ).withColumn(
        "segment",
        F.concat(
            F.col("r_tile").cast("string"),
            F.col("f_tile").cast("string"),
            F.col("m_tile").cast("string"),
        ),
    )


# ---------------------------------------------------------------------------
# time-based rolling window + anomaly scoring
# ---------------------------------------------------------------------------

ROLLING_MS = 7 * 24 * 3600 * 1000  # trailing 7 days


@query(
    "rolling_7d_user_value",
    oracle=f"""
SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
       round(sum(value) OVER w, 6) AS value_7d,
       CAST(count(*) OVER w AS BIGINT) AS n_7d
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts)
             RANGE BETWEEN {ROLLING_MS} PRECEDING AND CURRENT ROW)
""",
)
def rolling_7d_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day per-user rolling metrics — the TIME-based RANGE
    frame (`range_window_frame` is the value-based one; this is the
    telemetry shape: "activity in the last week as of each event").
    The frame is defined on the event-time axis, so rows with equal
    timestamps share a frame in both engines regardless of secondary
    order — RANGE peers make the result order-insensitive where a
    ROWS frame would be tie-ambiguous.

    Plan: one shuffle on user_id; within each partition the frame is
    a sort + two-pointer sliding aggregate (Spark's bounded-preceding
    RANGE frame never rescans the partition). At 100 TB the shuffle
    carries (user, ts, value) only — the projection is pruned to the
    frame inputs before the exchange."""
    ev = load_table(spark, sf_dir, "events")
    ts_ms = F.unix_millis("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_ms)
        .rangeBetween(-ROLLING_MS, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        ts_ms.alias("ts_ms"),
        F.round(F.sum("value").over(w), 6).alias("value_7d"),
        F.count("*").over(w).alias("n_7d"),
    )


ZSCORE_THRESHOLD = 3.0


@query(
    "zscore_outliers",
    oracle=f"""
WITH stats AS (
  SELECT event_type, avg(value) AS mu, stddev_samp(value) AS sigma
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       round((e.value - s.mu) / s.sigma, 6) AS z,
       abs(round((e.value - s.mu) / s.sigma, 6)) > {ZSCORE_THRESHOLD}
         AS is_outlier
FROM events e JOIN stats s USING (event_type)
""",
)
def zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score anomaly scoring: every event scored against
    its type's mean/stddev — the monitoring primitive behind "this
    entity's change volume looks wrong" alerts. The outlier flag
    compares the ROUNDED z so the boolean is a pure function of the
    hashed column (no cross-engine boundary flicker at |z| ~ 3).

    Plan: the stats relation is one map-side-combinable aggregate
    (avg/stddev partials), then a BROADCAST join back onto the scan —
    scoring 100 TB of events costs one pass and zero fact-side
    shuffles. A window over event_type would shuffle-and-sort every
    event for the same answer."""
    ev = load_table(spark, sf_dir, "events")
    stats = ev.groupBy("event_type").agg(
        F.avg("value").alias("mu"), F.stddev_samp("value").alias("sigma")
    )
    z = F.round((F.col("value") - F.col("mu")) / F.col("sigma"), 6)
    return (
        ev.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            z.alias("z"),
            (F.abs(z) > ZSCORE_THRESHOLD).alias("is_outlier"),
        )
    )


# ---------------------------------------------------------------------------
# sweep-line concurrency: distributed prefix sum over interval boundaries
# ---------------------------------------------------------------------------

DAY_MS = 24 * 3600 * 1000


@query(
    "concurrency_sweepline",
    oracle="""
WITH b AS (
  SELECT epoch_ms(ts) AS boundary_ms, 1 AS delta FROM events
  UNION ALL
  SELECT epoch_ms(ts) + CAST(floor(value * 60000) AS BIGINT), -1 FROM events
),
per AS (SELECT boundary_ms, sum(delta) AS d FROM b GROUP BY boundary_ms)
SELECT boundary_ms,
       CAST(sum(d) OVER (ORDER BY boundary_ms) AS BIGINT) AS concurrent
FROM per
""",
)
def concurrency_sweepline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concurrent-interval count over time (sweep line): each event is
    "active" from its timestamp for ``value`` minutes; the output is
    the number of simultaneously-active intervals after every
    boundary — the ops curve behind "how many jobs/sessions/transfers
    were in flight at once?".

    The naive formulation is ONE global running sum — a
    single-partition window that serializes the whole time axis
    through one task. This implementation is the DISTRIBUTED
    prefix-sum: (1) boundary deltas pre-aggregate per timestamp
    (map-side combinable), (2) a running sum WITHIN each day
    partition (parallel across days), (3) a day-level exclusive
    running total over the tiny per-day relation (the only serial
    step — bounded by the calendar, not the data), added as an
    offset. At 100 TB step 3 still sees one row per day; nothing
    data-proportional ever funnels through a single task."""
    ev = load_table(spark, sf_dir, "events")
    ts_ms = F.unix_millis("ts")
    ends = ev.select(
        (ts_ms + F.floor(F.col("value") * 60000).cast("bigint")).alias(
            "boundary_ms"
        ),
        F.lit(-1).alias("delta"),
    )
    starts = ev.select(ts_ms.alias("boundary_ms"), F.lit(1).alias("delta"))
    per = (
        starts.unionByName(ends)
        .groupBy("boundary_ms")
        .agg(F.sum("delta").alias("d"))
        .withColumn("day", (F.col("boundary_ms") / DAY_MS).cast("bigint"))
    )
    in_day = F.sum("d").over(
        Window.partitionBy("day")
        .orderBy("boundary_ms")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_in_day = per.select("day", "boundary_ms", in_day.alias("cum_in_day"))
    day_totals = per.groupBy("day").agg(F.sum("d").alias("day_d"))
    prev_days = (
        F.sum("day_d")
        .over(
            Window.orderBy("day").rowsBetween(
                Window.unboundedPreceding, -1
            )
        )
        .alias("offset")
    )
    offsets = day_totals.select("day", F.coalesce(prev_days, F.lit(0)).alias("offset"))
    return (
        with_in_day.join(F.broadcast(offsets), "day")
        .select(
            "boundary_ms",
            (F.col("offset") + F.col("cum_in_day")).cast("bigint").alias("concurrent"),
        )
    )


# ---------------------------------------------------------------------------
# event-type transition matrix: first-order behavioral Markov counts
# ---------------------------------------------------------------------------


@query(
    "event_transition_matrix",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY epoch_ms(ts), event_id) AS prev_type
  FROM events
),
counts AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM ordered WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
totals AS (SELECT prev_type, sum(n) AS row_n FROM counts GROUP BY 1)
SELECT c.prev_type, c.next_type, c.n,
       round(c.n * 1.0 / t.row_n, 6) AS p
FROM counts c JOIN totals t USING (prev_type)
""",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order transition matrix of user behavior: for every
    consecutive event pair within a user's timeline, count
    (prev_type → next_type) and normalize rows to probabilities — the
    Markov-chain summary behind next-action prediction and anomaly
    detection on CDC-derived activity streams. (event-time, event_id)
    is the deterministic per-user total order.

    Plan: ONE shuffle of (user, ts, type) for the lag window; the
    transition counts then reduce to a |types|² relation with
    map-side partials, and the row-normalizing join runs on that tiny
    matrix (broadcast). The window partitions by user_id — millions
    of independent partitions at scale, not a global sort."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.unix_millis("ts"), "event_id")
    ordered = ev.select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = ordered.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").alias("n")
    )
    totals = counts.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return counts.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.col("row_n"), 6).alias("p"),
    )


# ---------------------------------------------------------------------------
# built-in linear-regression aggregates: per-type trend fitting
# ---------------------------------------------------------------------------

REGR_EPOCH_MS = 1704067200000  # 2024-01-01, fixed x-origin for conditioning


@query(
    "regression_suite",
    oracle=f"""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(regr_slope(value, (epoch_ms(ts) - {REGR_EPOCH_MS}) / 86400000.0), 6)
         AS slope_per_day,
       round(regr_intercept(value, (epoch_ms(ts) - {REGR_EPOCH_MS}) / 86400000.0), 6)
         AS intercept,
       round(regr_r2(value, (epoch_ms(ts) - {REGR_EPOCH_MS}) / 86400000.0), 6)
         AS r2,
       round(corr(value, (epoch_ms(ts) - {REGR_EPOCH_MS}) / 86400000.0), 6)
         AS pearson_r,
       round(covar_samp(value, (epoch_ms(ts) - {REGR_EPOCH_MS}) / 86400000.0), 6)
         AS covar
FROM events GROUP BY event_type
""",
)
def regression_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend of event value over time via the
    BUILT-IN regression aggregates (regr_slope / regr_intercept /
    regr_r2 / corr / covar_samp) — "is this entity's change volume
    drifting?" answered in one aggregate, no MLlib, no UDF. The x
    axis is days since a fixed epoch (not raw epoch-ms): centering
    keeps the sums regr_* accumulates well-conditioned, which is what
    lets a 6-decimal round agree across engines' summation orders.

    Plan: one map-side-combinable aggregate — every regr_* carries a
    constant-size moment partial (n, Σx, Σy, Σxy, Σx², Σy²), so the
    trend of a 100 TB event log shuffles |types| rows."""
    ev = load_table(spark, sf_dir, "events")
    x = (F.unix_millis("ts") - F.lit(REGR_EPOCH_MS)) / 86400000.0
    y = F.col("value")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(F.regr_slope(y, x), 6).alias("slope_per_day"),
        F.round(F.regr_intercept(y, x), 6).alias("intercept"),
        F.round(F.regr_r2(y, x), 6).alias("r2"),
        F.round(F.corr(y, x), 6).alias("pearson_r"),
        F.round(F.covar_samp(y, x), 6).alias("covar"),
    )


# ---------------------------------------------------------------------------
# forward-fill imputation: last non-null carried forward per key
# ---------------------------------------------------------------------------

FFILL_NULL_MOD = 7  # deterministic sensor dropout: event_id % 7 == 0


@query(
    "forward_fill_impute",
    oracle=f"""
WITH raw AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
         CASE WHEN event_id % {FFILL_NULL_MOD} = 0 THEN NULL
              ELSE value END AS v
  FROM events
)
SELECT event_id, user_id, ts_ms, v,
       last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY ts_ms, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled
FROM raw
""",
)
def forward_fill_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (last observation carried forward): every dropped
    reading (a deterministic 1-in-{FFILL_NULL_MOD} dropout stands in
    for sensor gaps) takes the user's most recent non-null value —
    the imputation every telemetry/feature pipeline runs before
    modeling. The engine form is ``last_value(..., ignoreNulls=True)``
    over an unbounded-preceding ROWS frame; IGNORE NULLS is the whole
    trick (a plain last_value returns the current row's null).
    Leading nulls before a user's first reading stay null — honest
    gaps, not fabricated values.

    Plan: ONE shuffle on user_id and a running frame within each
    partition — same cost envelope as any per-key cumulative window;
    nothing global, nothing iterative."""
    ev = load_table(spark, sf_dir, "events")
    v = F.when(F.col("event_id") % FFILL_NULL_MOD == 0, F.lit(None)).otherwise(
        F.col("value")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_millis("ts"), "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        v.alias("v"),
        F.last(v, ignorenulls=True).over(w).alias("v_filled"),
    )


# ---------------------------------------------------------------------------
# time-series resample: per-user weekly grid, gaps carried forward
# ---------------------------------------------------------------------------


@query(
    "timeseries_resample",
    oracle=f"""
WITH per AS (
  SELECT user_id, epoch_ms(ts) // {WEEK_MS} AS wk,
         epoch_ms(ts) AS ms, event_id, value
  FROM events
),
spans AS (
  SELECT user_id, min(wk) AS wk_lo, max(wk) AS wk_hi FROM per GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(generate_series(wk_lo, wk_hi)) AS wk FROM spans
),
weekly AS (
  SELECT user_id, wk, wk_last FROM (
    SELECT user_id, wk, value AS wk_last,
           row_number() OVER (PARTITION BY user_id, wk
                              ORDER BY ms DESC, event_id DESC) AS rn
    FROM per) WHERE rn = 1
)
SELECT s.user_id, CAST(s.wk AS BIGINT) AS wk,
       round(last_value(w.wk_last IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.wk
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS v,
       (w.wk_last IS NULL) AS imputed
FROM spine s LEFT JOIN weekly w
  ON w.user_id = s.user_id AND w.wk = s.wk
""",
)
def timeseries_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical resample, composed from proven parts: per user,
    a complete WEEKLY grid over their active span (calendar spine —
    no silent gaps), each week valued at the user's LAST reading that
    week ((ms, event_id)-ordered max_by), and empty weeks carried
    forward (LOCF) with an explicit ``imputed`` flag so downstream
    consumers can tell measurement from fill. This is what
    `date_spine_fill` + `forward_fill_impute` + the flagship's
    max_by reduction exist FOR — the dashboard/feature-store shape.

    Plan: the weekly reduction is one map-side-combinable aggregate
    (the shuffle carries user-weeks, not events); the spine explodes
    from |users| span rows and joins the weekly relation on the same
    (user, wk) key; the LOCF window partitions by user. Output is
    Σ user-weeks — bounded by users x calendar, an order below the
    event log."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.select(
        "user_id",
        F.expr(f"unix_millis(ts) div {WEEK_MS}").alias("wk"),
        F.unix_millis("ts").alias("ms"),
        "event_id",
        "value",
    )
    weekly = per.groupBy("user_id", "wk").agg(
        F.max_by("value", F.struct("ms", "event_id")).alias("wk_last")
    )
    spine = (
        per.groupBy("user_id")
        .agg(F.min("wk").alias("wk_lo"), F.max("wk").alias("wk_hi"))
        .select(
            "user_id",
            F.explode(F.sequence("wk_lo", "wk_hi")).alias("wk"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("wk")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        spine.join(weekly, ["user_id", "wk"], "left")
        .select(
            "user_id",
            F.col("wk").cast("bigint").alias("wk"),
            F.round(F.last("wk_last", ignorenulls=True).over(w), 6).alias("v"),
            F.col("wk_last").isNull().alias("imputed"),
        )
    )


# ---------------------------------------------------------------------------
# WAU / MAU stickiness: the engagement ratio over rolling user sets
# ---------------------------------------------------------------------------


@query(
    "wau_mau_stickiness",
    oracle=f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // {WEEK_MS} AS wk FROM events
),
weeks AS (SELECT DISTINCT wk FROM uw),
mau AS (
  SELECT w.wk, count(DISTINCT u.user_id) AS mau
  FROM weeks w JOIN uw u ON u.wk BETWEEN w.wk - 3 AND w.wk
  GROUP BY w.wk
),
wau AS (SELECT wk, count(*) AS wau FROM uw GROUP BY wk)
SELECT CAST(w.wk AS BIGINT) AS wk,
       CAST(w.wau AS BIGINT) AS wau,
       CAST(m.mau AS BIGINT) AS mau,
       round(w.wau * 1.0 / m.mau, 6) AS stickiness
FROM wau w JOIN mau m USING (wk)
""",
)
def wau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAU/MAU stickiness per week — weekly actives over the
    trailing-4-week distinct actives, the canonical engagement ratio.
    Distinct-over-a-sliding-window canNOT ride a window function
    (COUNT(DISTINCT) has no frame form and user sets overlap between
    weeks), so each user-week EXPLODES into the 4 anchor weeks whose
    trailing window contains it — a narrow 4x generator on the
    DEDUPLICATED relation, no join of any kind (the first draft
    range-joined a week spine and the engine's own plan-audit sweep
    flagged the BroadcastNestedLoopJoin; the explode formulation is
    what survives it). Anchors past the observed max week are
    clipped so phantom weeks don't appear.

    Plan: the user-week dedup is the only event-volume shuffle; the
    explode is narrow; both counts reduce map-side; the final
    wau-mau join runs on |weeks| rows."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.expr(f"unix_millis(ts) div {WEEK_MS}").alias("wk")
    ).distinct()
    max_wk = uw.agg(F.max("wk").alias("max_wk"))
    anchors = uw.select(
        "user_id",
        F.explode(F.sequence(F.col("wk"), F.col("wk") + 3)).alias("anchor_wk"),
    ).join(F.broadcast(max_wk), F.col("anchor_wk") <= F.col("max_wk")).drop(
        "max_wk"
    )
    mau = anchors.distinct().groupBy("anchor_wk").agg(
        F.count("*").alias("mau")
    )
    wau = uw.groupBy("wk").agg(F.count("*").alias("wau"))
    return (
        wau.join(mau, wau["wk"] == mau["anchor_wk"])
        .select(
            F.col("wk").cast("bigint").alias("wk"),
            F.col("wau").cast("bigint").alias("wau"),
            F.col("mau").cast("bigint").alias("mau"),
            F.round(F.col("wau") / F.col("mau"), 6).alias("stickiness"),
        )
    )


# ---------------------------------------------------------------------------
# day-of-week seasonality index per event type
# ---------------------------------------------------------------------------


@query(
    "dow_seasonality",
    oracle="""
WITH counts AS (
  SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow, count(*) AS n
  FROM events GROUP BY 1, 2
),
base AS (
  SELECT event_type, sum(n) * 1.0 / count(*) AS mean_n FROM counts GROUP BY 1
)
SELECT c.event_type, c.dow, CAST(c.n AS BIGINT) AS n,
       round(c.n / b.mean_n, 6) AS seasonality_idx
FROM counts c JOIN base b USING (event_type)
""",
)
def dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: each (type, weekday)'s volume
    relative to that type's average weekday — >1 is a hot day
    (dow is Spark's Sunday=1..Saturday=7; DuckDB's 0-based dayofweek
    shifts by one in the oracle). The
    capacity-planning signal behind "when do changes surge?"
    (the reference's Kinesis shard count and Lambda concurrency are
    static, subscriber.yaml:10-13 — this is the query that says
    whether static is wasteful).

    Plan: one map-side-partial aggregate to |types x 7| rows;
    everything after (the per-type mean and the ratio join) runs on
    that constant-size relation."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        "event_type", F.dayofweek("ts").cast("int").alias("dow")
    ).agg(F.count("*").alias("n"))
    base = counts.groupBy("event_type").agg(
        (F.sum("n") / F.count("*")).alias("mean_n")
    )
    return counts.join(F.broadcast(base), "event_type").select(
        "event_type",
        "dow",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n") / F.col("mean_n"), 6).alias("seasonality_idx"),
    )


# ---------------------------------------------------------------------------
# weekly growth accounting: new vs returning actives
# ---------------------------------------------------------------------------


@query(
    "weekly_new_returning",
    oracle=f"""
WITH uw AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // {WEEK_MS} AS wk FROM events
),
first_seen AS (SELECT user_id, min(wk) AS wk0 FROM uw GROUP BY user_id)
SELECT CAST(u.wk AS BIGINT) AS wk,
       CAST(count(*) FILTER (WHERE u.wk = f.wk0) AS BIGINT) AS new_users,
       CAST(count(*) FILTER (WHERE u.wk > f.wk0) AS BIGINT) AS returning_users
FROM uw u JOIN first_seen f USING (user_id)
GROUP BY u.wk
""",
)
def weekly_new_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting: actives split into NEW (first-ever
    week) vs RETURNING — the companion to `cohort_retention` (that
    one follows a cohort forward; this reads each week's composition)
    and the denominator discipline behind every growth chart.

    Plan: user-week dedup shuffles once on the pair; first-seen is a
    map-side-partial min on the same relation; the classify join runs
    user-keyed on already-deduplicated rows and the final aggregate
    is conditional counts to |weeks| rows."""
    ev = load_table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.expr(f"unix_millis(ts) div {WEEK_MS}").alias("wk")
    ).distinct()
    first_seen = uw.groupBy("user_id").agg(F.min("wk").alias("wk0"))
    return (
        uw.join(first_seen, "user_id")
        .groupBy(F.col("wk").cast("bigint").alias("wk"))
        .agg(
            F.count(F.when(F.col("wk") == F.col("wk0"), 1))
            .cast("bigint")
            .alias("new_users"),
            F.count(F.when(F.col("wk") > F.col("wk0"), 1))
            .cast("bigint")
            .alias("returning_users"),
        )
    )
