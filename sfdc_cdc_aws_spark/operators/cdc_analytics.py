"""CDC-lake analytics beyond the flagship snapshot.

The reference pipeline's product is an append-only change log
(README.md:3-26); these operators are the standard consumptions of
such a log that the reference leaves to downstream consumers:
SCD-Type-2 history, tumbling freshness counts (the batch-expressible
twin of the Firehose 60 s buffer flush, worker/template.yaml:108-110),
and offset-range incremental reads (the batch analog of resuming from
a stored replayId, ReplayExtension.java:39-82).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table
from sfdc_cdc_aws_spark.sources.cdc_feed import (
    CHANGES_CTE,
    ID_FMT,
    changes,
    envelopes,
)


@query(
    "scd2_history",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT entity_name, uid, change_type AS uind,
       commit_ts_ms AS valid_from_ms,
       lead(commit_ts_ms) OVER w AS valid_to_ms,
       (lead(commit_ts_ms) OVER w IS NULL AND change_type <> 'DELETE')
         AS is_current
FROM changes
WINDOW w AS (PARTITION BY entity_name, uid ORDER BY commit_ts_ms, replay_id)
""",
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-Type-2 dimension history from the change log: each change
    version is valid from its commit until the next change of the same
    key (NULL = still current, unless the last operation was DELETE).
    One window over (entity, key) — the shuffle carries the changelog
    partitioned by key, which is the minimum possible for this
    semantics. (commit_ts_ms, replay_id) is the total order per key,
    replay_id being the unique stream offset
    (ReplayExtension.java:29)."""
    ch = changes(spark, sf_dir)
    w = Window.partitionBy("entity_name", "uid").orderBy(
        "commit_ts_ms", "replay_id"
    )
    valid_to = F.lead("commit_ts_ms").over(w)
    return ch.select(
        "entity_name",
        "uid",
        F.col("change_type").alias("uind"),
        F.col("commit_ts_ms").alias("valid_from_ms"),
        valid_to.alias("valid_to_ms"),
        (valid_to.isNull() & (F.col("change_type") != "DELETE")).alias(
            "is_current"
        ),
    )


@query(
    "tumbling_commit_counts",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT entity_name,
       commit_ts_ms - commit_ts_ms % 60000 AS window_start_ms,
       count(*) AS n_changes,
       count(DISTINCT uid) AS n_ids
FROM changes
GROUP BY 1, 2
""",
)
def tumbling_commit_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-second tumbling change counts per entity — the event-time
    twin of the Firehose 60 s/50 MB buffered flush (SURVEY.md §2.6;
    worker/template.yaml:108-110). Uses the built-in ``window()``
    (epoch-aligned, so start ≡ floor(ts/60 s)); the streaming job runs
    the identical expression behind a watermark."""
    ch = changes(spark, sf_dir)
    return (
        ch.groupBy(
            "entity_name",
            F.window(F.timestamp_millis("commit_ts_ms"), "60 seconds").alias("w"),
        )
        .agg(
            F.count("*").alias("n_changes"),
            F.countDistinct("uid").alias("n_ids"),
        )
        .select(
            "entity_name",
            F.unix_millis("w.start").alias("window_start_ms"),
            "n_changes",
            "n_ids",
        )
    )


@query(
    "changed_fields_analysis",
    oracle="""
SELECT event_type AS entity_name, f.field, count(*) AS n_updates
FROM events, unnest(['value', 'props']) AS f(field)
WHERE event_id % 3 = 1
GROUP BY 1, 2
""",
)
def changed_fields_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Which fields change how often, per entity — read from the
    envelope's ``changedFields`` array (the header field the reference
    receives but ignores, app.py:97 fetches all fields regardless).
    Exercises array navigation through the nested envelope struct:
    explode(payload.ChangeEventHeader.changedFields) on UPDATEs."""
    env = envelopes(spark, sf_dir)
    h = F.col("envelope.payload.ChangeEventHeader")
    return (
        env.where(h["changeType"] == "UPDATE")
        .select(
            h["entityName"].alias("entity_name"),
            F.explode(h["changedFields"]).alias("field"),
        )
        .groupBy("entity_name", "field")
        .agg(F.count("*").alias("n_updates"))
    )


@query(
    "map_payload_extract",
    oracle="""
SELECT event_id AS replay_id, event_type AS entity_name, value
FROM events
WHERE event_id % 3 = 1
""",
)
def map_payload_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar extraction from the dynamic MapType payload — the
    engine's answer to per-entity schemas unknown at compile time
    (SURVEY.md §1.3): ``element_at(payload.fields, 'value')`` typed
    with an explicit cast at the edge. The stringified double in the
    map round-trips exactly (Java Double.toString preserves the bit
    pattern), so the oracle compares the raw column row-for-row."""
    env = envelopes(spark, sf_dir)
    h = F.col("envelope.payload.ChangeEventHeader")
    val = F.element_at(F.col("envelope.payload.fields"), "value")
    return env.where(h["changeType"] == "UPDATE").select(
        F.col("envelope.event.replayId").alias("replay_id"),
        h["entityName"].alias("entity_name"),
        val.cast("double").alias("value"),
    )


REPLAY_LO = 2_000
REPLAY_HI = 6_000


@query(
    "replay_range_read",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT entity_name, change_type, count(*) AS n,
       min(replay_id) AS first_replay, max(replay_id) AS last_replay
FROM changes
WHERE replay_id BETWEEN {REPLAY_LO} AND {REPLAY_HI}
GROUP BY 1, 2
""",
)
def replay_range_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental consumption of an offset range — the batch analog
    of subscribing with a stored replayId (REPLAY_FROM constants,
    EmpConnector.java:103-104) and reading up to the tip. The replay_id
    predicate is a pushable range filter: on a lake partitioned or
    sorted by offset this prunes to the new files only."""
    ch = changes(spark, sf_dir)
    return (
        ch.where(F.col("replay_id").between(REPLAY_LO, REPLAY_HI))
        .groupBy("entity_name", "change_type")
        .agg(
            F.count("*").alias("n"),
            F.min("replay_id").alias("first_replay"),
            F.max("replay_id").alias("last_replay"),
        )
    )


MAX_EDIT_DIST = 2


@query(
    "fuzzy_entity_match",
    oracle=f"""
WITH keyed AS (
  SELECT c_custkey, c_name, c_nationkey,
         substr(c_name, 1, length(c_name) - 2) AS blk
  FROM customer
)
SELECT a.c_custkey AS cust_a, b.c_custkey AS cust_b,
       levenshtein(a.c_name, b.c_name) AS edit_dist
FROM keyed a JOIN keyed b
  ON a.c_nationkey = b.c_nationkey AND a.blk = b.blk
 AND a.c_custkey < b.c_custkey
 AND levenshtein(a.c_name, b.c_name) <= {MAX_EDIT_DIST}
""",
)
def fuzzy_entity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy entity resolution: near-identical customer names
    (levenshtein ≤ MAX_EDIT_DIST) — the record-matching pass a CDC
    consumer runs to catch the same real-world entity landing under
    multiple Ids. Candidate pairs are blocked on (nation, name-prefix
    = all but the last 2 chars): the sorted-neighborhood trick that
    keeps the pair space at Σ block² instead of n² — on these
    templated names, nation-only blocking admits ~100x the pairs for
    the same final matches. The edit distance then scores only the
    prefix-colliding survivors."""
    from sfdc_cdc_aws_spark.sources import load_table

    c = load_table(spark, sf_dir, "customer")
    blk = F.expr("substr(c_name, 1, length(c_name) - 2)")
    keyed = c.select("c_custkey", "c_name", "c_nationkey", blk.alias("blk"))
    a = keyed.select(
        F.col("c_custkey").alias("cust_a"),
        F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nk"),
        F.col("blk").alias("blk_a"),
    )
    b = keyed.select(
        F.col("c_custkey").alias("cust_b"),
        F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nk_b"),
        F.col("blk").alias("blk_b"),
    )
    dist = F.levenshtein(F.col("name_a"), F.col("name_b"))
    return (
        a.join(
            b,
            (F.col("nk") == F.col("nk_b"))
            & (F.col("blk_a") == F.col("blk_b"))
            & (F.col("cust_a") < F.col("cust_b")),
        )
        .where(dist <= MAX_EDIT_DIST)
        .select("cust_a", "cust_b", dist.alias("edit_dist"))
    )


@query(
    "commit_order_violations",
    oracle=f"""
WITH {CHANGES_CTE},
seq AS (
  SELECT entity_name, commit_ts_ms,
         lag(commit_ts_ms) OVER (PARTITION BY entity_name, uid
                                 ORDER BY replay_id) AS prev_ts
  FROM changes
)
SELECT entity_name,
       count(*) AS n_changes,
       CAST(sum(CASE WHEN prev_ts IS NOT NULL AND commit_ts_ms < prev_ts
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM seq GROUP BY entity_name
""",
)
def commit_order_violations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality probe: per entity, how many changes have a commit
    timestamp that goes BACKWARD relative to stream order (replay_id)
    for the same key — the anomaly the reference's at-least-once
    delivery can produce and that latest-per-Id semantics must
    tolerate (SURVEY.md §1.5). One lag window per key, then a
    map-side-combinable count; zeros are reported, so a clean feed is
    positively verified rather than silently empty."""
    ch = changes(spark, sf_dir)
    w = Window.partitionBy("entity_name", "uid").orderBy("replay_id")
    prev_ts = F.lag("commit_ts_ms").over(w)
    viol = (
        prev_ts.isNotNull() & (F.col("commit_ts_ms") < prev_ts)
    ).cast("long")
    return (
        ch.select("entity_name", viol.alias("is_violation"))
        .groupBy("entity_name")
        .agg(
            F.count("*").alias("n_changes"),
            F.sum("is_violation").alias("n_violations"),
        )
    )


# Snapshot-diff epoch boundary: 2024-01-16T00:00:00Z in epoch millis.
# The synthetic feed spans 2024-01-01..01-30 at every SF, so both the
# "old" and "new" epochs are non-degenerate at sf0.001/0.01/0.1. A
# numeric constant (not a timestamp literal) keeps the predicate pure
# arithmetic on commit_ts_ms — no timezone semantics on either side.
DIFF_CUT_MS = 1_705_363_200_000


@query(
    "snapshot_diff",
    oracle=f"""
WITH {CHANGES_CTE},
a AS (
  SELECT entity_name, uid, change_type, replay_id FROM (
    SELECT entity_name, uid, change_type, replay_id,
           row_number() OVER (PARTITION BY entity_name, uid
                              ORDER BY commit_ts_ms DESC, replay_id DESC) AS rn
    FROM changes WHERE commit_ts_ms < {DIFF_CUT_MS}
  ) WHERE rn = 1
),
b AS (
  SELECT entity_name, uid, change_type, replay_id FROM (
    SELECT entity_name, uid, change_type, replay_id,
           row_number() OVER (PARTITION BY entity_name, uid
                              ORDER BY commit_ts_ms DESC, replay_id DESC) AS rn
    FROM changes
  ) WHERE rn = 1
)
SELECT entity_name, record_id, diff_type, old_replay_id, new_replay_id
FROM (
  SELECT b.entity_name,
         printf('00D%015d', b.uid) AS record_id,
         CASE
           WHEN b.change_type <> 'DELETE'
                AND NOT coalesce(a.change_type <> 'DELETE', FALSE)
             THEN 'INSERT'
           WHEN b.change_type <> 'DELETE' AND a.change_type <> 'DELETE'
                AND b.replay_id <> a.replay_id
             THEN 'UPDATE'
           WHEN b.change_type = 'DELETE' AND a.change_type <> 'DELETE'
             THEN 'DELETE'
         END AS diff_type,
         a.replay_id AS old_replay_id,
         b.replay_id AS new_replay_id
  FROM b LEFT JOIN a ON b.entity_name = a.entity_name AND b.uid = a.uid
) WHERE diff_type IS NOT NULL
""",
)
def snapshot_diff(
    spark: SparkSession, sf_dir: str, cut_ms: int = DIFF_CUT_MS
) -> DataFrame:
    """Diff of two snapshot epochs of the CDC lake — the change set a
    consumer that refreshes from snapshots (instead of tailing the
    stream) must apply. Epoch A is the latest state per key as of
    ``cut_ms`` (registered oracle uses {DIFF_CUT_MS}); epoch B is the
    latest state over the full feed; the diff classifies every key
    whose live state differs:

    * ``INSERT`` — live in B, absent-or-dead in A (covers UNDELETE
      after a DELETE, per SURVEY §7 liveness = ``<> 'DELETE'``);
    * ``UPDATE`` — live in both but a newer change landed after A;
    * ``DELETE`` — live in A, dead in B.

    Keys untouched since the cut compare equal and vanish — the diff
    is empty exactly when no change committed after the cut, which is
    the correctness contract of snapshot-based replication (the batch
    analog of resuming from a stored replayId,
    ReplayExtension.java:39-82).

    Plan: ONE shuffle total. Both epoch states come out of a single
    ``groupBy(entity, uid)`` — ``max(struct(ts, replay, change_type))``
    for B and the same over a ``when(ts < cut)`` guard for A (``max``
    skips the NULLed-out late rows, and struct comparison is
    lexicographic on the same (ts, replay) total order the flagship
    uses) — so the 100 TB changelog is read once, combined map-side,
    and shuffled only as unique keys. The oracle spells the same
    semantics as two row_number windows + left join, which is the
    slow-but-obvious form."""
    return diff_changes(changes(spark, sf_dir), cut_ms)


def diff_changes(ch: DataFrame, cut_ms: int) -> DataFrame:
    """Core of :func:`snapshot_diff`, factored over any changes-shaped
    DataFrame (entity_name, uid, change_type, commit_ts_ms, replay_id)
    so the property-based tests can drive it with arbitrary generated
    change sequences."""
    ordered = F.struct("commit_ts_ms", "replay_id", "change_type")
    agg = ch.groupBy("entity_name", "uid").agg(
        F.max(ordered).alias("b"),
        F.max(F.when(F.col("commit_ts_ms") < cut_ms, ordered)).alias("a"),
    )
    live_a = F.coalesce(F.col("a.change_type") != "DELETE", F.lit(False))
    live_b = F.col("b.change_type") != "DELETE"
    diff_type = (
        F.when(live_b & ~live_a, "INSERT")
        .when(
            live_b & live_a & (F.col("b.replay_id") != F.col("a.replay_id")),
            "UPDATE",
        )
        .when(~live_b & live_a, "DELETE")
    )
    return (
        agg.select(
            "entity_name",
            F.format_string(ID_FMT, F.col("uid")).alias("record_id"),
            diff_type.alias("diff_type"),
            F.col("a.replay_id").alias("old_replay_id"),
            F.col("b.replay_id").alias("new_replay_id"),
        )
        .where(F.col("diff_type").isNotNull())
    )


# Tombstone retention horizon: tombstones committed before this are
# eligible for physical purge. Mid-feed (the synthetic feed spans
# 2024-01-01..01-30 at every SF) so the plan is non-degenerate at
# sf0.001/0.01/0.1.
PURGE_BEFORE_MS = 1_705_968_000_000  # 2024-01-23T00:00:00Z


@query(
    "tombstone_purge_plan",
    oracle=f"""
WITH {CHANGES_CTE},
last AS (
  SELECT entity_name, uid, change_type, commit_ts_ms, n_changes FROM (
    SELECT entity_name, uid, change_type, commit_ts_ms,
           count(*) OVER (PARTITION BY entity_name, uid) AS n_changes,
           row_number() OVER (PARTITION BY entity_name, uid
                              ORDER BY commit_ts_ms DESC, replay_id DESC)
             AS rn
    FROM changes
  ) WHERE rn = 1
)
SELECT entity_name,
       printf('00D%015d', uid) AS record_id,
       commit_ts_ms AS deleted_at_ms,
       CAST(n_changes AS BIGINT) AS n_lifetime_changes
FROM last
WHERE change_type = 'DELETE' AND commit_ts_ms < {PURGE_BEFORE_MS}
""",
)
def tombstone_purge_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention sweep over the change log: keys whose CURRENT state
    is a tombstone older than the retention horizon — the rows a
    GDPR/TTL purge job physically deletes from the lake. Liveness is
    decided by the LATEST change only (a key deleted then UNDELETEd
    is live and never purged — same liveness predicate as the
    flagship, SURVEY §7), and the lifetime change count rides along
    for the audit record the purge must write.

    Plan: one ``groupBy(entity, uid)`` with map-side partials
    computing the latest change (``max(struct)`` on the flagship's
    (ts, replay) total order) and the lifetime count side-by-side —
    the changelog shuffles once as unique keys, exactly like
    snapshot_diff. The oracle spells it as a window + count window;
    the aggregate form is the 100 TB plan."""
    ch = changes(spark, sf_dir)
    agg = ch.groupBy("entity_name", "uid").agg(
        F.max(F.struct("commit_ts_ms", "replay_id", "change_type")).alias("last"),
        F.count("*").alias("n_lifetime_changes"),
    )
    return (
        agg.where(
            (F.col("last.change_type") == "DELETE")
            & (F.col("last.commit_ts_ms") < PURGE_BEFORE_MS)
        )
        .select(
            "entity_name",
            F.format_string(ID_FMT, F.col("uid")).alias("record_id"),
            F.col("last.commit_ts_ms").alias("deleted_at_ms"),
            "n_lifetime_changes",
        )
    )


# Redelivery model for the arrival log: every event whose replay_id
# is a multiple of REDELIVER_EVERY is delivered AGAIN by the bus,
# REDELIVER_LAG arrival slots after its first delivery (arrival slots
# are 2*replay_id so the lagged copy interleaves between originals).
REDELIVER_EVERY = 50
REDELIVER_LAG = 71


@query(
    "late_arrival_report",
    oracle=f"""
WITH {CHANGES_CTE},
arrivals AS (
  SELECT entity_name, commit_ts_ms, record_id,
         replay_id * 2 AS arrival_seq, FALSE AS is_redelivery
  FROM changes
  UNION ALL
  SELECT entity_name, commit_ts_ms, record_id,
         replay_id * 2 + {REDELIVER_LAG} AS arrival_seq,
         TRUE AS is_redelivery
  FROM changes WHERE replay_id % {REDELIVER_EVERY} = 0
),
seq AS (
  SELECT entity_name, commit_ts_ms, is_redelivery,
         max(commit_ts_ms) OVER (PARTITION BY entity_name
                                 ORDER BY arrival_seq, record_id
                                 ROWS UNBOUNDED PRECEDING) AS high_water
  FROM arrivals
)
SELECT entity_name,
       count(*) AS n_arrivals,
       CAST(sum(CASE WHEN is_redelivery THEN 1 ELSE 0 END) AS BIGINT)
         AS n_redelivered,
       CAST(sum(CASE WHEN commit_ts_ms < high_water THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       max(high_water - commit_ts_ms) AS max_lateness_ms
FROM seq GROUP BY entity_name
""",
)
def late_arrival_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How late can a duplicate arrive? — the measured event-time
    disorder of an at-least-once arrival log, which is exactly the
    number that SIZES the streaming dedup watermark: ``withWatermark``
    horizons (streaming/job.py PROD_DEDUP_HORIZON ≙ bus retention,
    subscriber.yaml:39-40) are correct iff they cover the max
    lateness measured here, and this report turns that setting from
    a config guess into a property of the feed. The arrival log
    models the bus redelivering every {REDELIVER_EVERY}th event
    {REDELIVER_LAG} arrival slots later (the reference tolerates
    redelivery by overwrite-on-Id, SURVEY.md §1.5); each arrival's
    lateness is measured against the per-entity event-time
    high-water mark in arrival order — watermarks advance per
    partition-key ordering domain (Kinesis orders per partitionKey =
    entityName, KinesisExample.java:108).

    Plan: the redelivery branch is a second pushed-down scan unioned
    under the window (map-side, no extra shuffle); the running-max
    window shuffles the log once on entity, and the final aggregate
    combines map-side. At 100 TB the same report runs per
    (entity, day) to keep window partitions bounded."""
    ch = changes(spark, sf_dir)
    originals = ch.select(
        "entity_name",
        "commit_ts_ms",
        "record_id",
        (F.col("replay_id") * 2).alias("arrival_seq"),
        F.lit(False).alias("is_redelivery"),
    )
    redelivered = ch.where(F.col("replay_id") % REDELIVER_EVERY == 0).select(
        "entity_name",
        "commit_ts_ms",
        "record_id",
        (F.col("replay_id") * 2 + REDELIVER_LAG).alias("arrival_seq"),
        F.lit(True).alias("is_redelivery"),
    )
    arrivals = originals.unionByName(redelivered)
    w = (
        Window.partitionBy("entity_name")
        .orderBy("arrival_seq", "record_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hw = F.max("commit_ts_ms").over(w)
    return (
        arrivals.select(
            "entity_name",
            "commit_ts_ms",
            "is_redelivery",
            hw.alias("high_water"),
        )
        .groupBy("entity_name")
        .agg(
            F.count("*").alias("n_arrivals"),
            F.sum(F.col("is_redelivery").cast("long")).alias("n_redelivered"),
            F.sum(
                (F.col("commit_ts_ms") < F.col("high_water")).cast("long")
            ).alias("n_late"),
            F.max(F.col("high_water") - F.col("commit_ts_ms")).alias(
                "max_lateness_ms"
            ),
        )
    )


# Significance threshold for numeric field changes: deltas smaller
# than this are noise a downstream consumer may suppress (sensor
# jitter, rounding churn). ~1% of the value range at every SF.
SIGNIFICANT_DELTA = 5.0


@query(
    "change_significance_filter",
    oracle=f"""
WITH cwv AS (
  SELECT event_type AS entity_name, uid, event_id AS replay_id,
         epoch_ms(ts) AS commit_ts_ms, value
  FROM (
    SELECT event_id, ts, user_id AS uid, event_type, value FROM events
    UNION ALL
    SELECT event_id, ts, user_id + 1000000 AS uid, event_type, value
    FROM events WHERE event_id % 5 = 0
  )
),
seq AS (
  SELECT entity_name, value,
         lag(value) OVER (PARTITION BY entity_name, uid
                          ORDER BY commit_ts_ms, replay_id) AS prev_value
  FROM cwv
)
SELECT entity_name,
       CAST(count(*) AS BIGINT) AS n_with_prev,
       CAST(sum(CASE WHEN abs(value - prev_value) < {SIGNIFICANT_DELTA}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_insignificant,
       round(sum(CASE WHEN abs(value - prev_value) < {SIGNIFICANT_DELTA}
                      THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
         AS suppress_rate
FROM seq WHERE prev_value IS NOT NULL
GROUP BY entity_name
""",
)
def change_significance_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-significance suppression — the CDC noise gate: per key,
    a change whose numeric delta vs the previous version is below
    {SIGNIFICANT_DELTA} is flagged insignificant (sensor jitter,
    rounding churn — the at-least-once world's no-op updates), and
    the report gives each entity's suppressible fraction. Downstream
    consumers use exactly this to cut write amplification: the
    flagship snapshot is unchanged by suppressed rows, so the sink
    can skip them — the CDC analog of the curation layer's
    'filter before you pay to move it'.

    Plan: one lag window per key (the changelog shuffles once,
    partitioned by key — same minimum as scd2_history), then a
    map-side-combinable aggregate to the per-entity report. The
    value column rides the same derivation as the change feed
    (sources/cdc_feed.py), so the oracle replays it exactly."""
    ev = load_table(spark, sf_dir, "events")
    cwv = ev.select(
        F.col("event_id"),
        F.col("ts"),
        F.col("event_type").alias("entity_name"),
        F.col("value"),
        F.explode(
            F.when(
                F.col("event_id") % 5 == 0,
                F.array(F.col("user_id"), F.col("user_id") + F.lit(1_000_000)),
            ).otherwise(F.array(F.col("user_id")))
        ).alias("uid"),
    ).select(
        "entity_name",
        "uid",
        F.col("event_id").alias("replay_id"),
        F.unix_millis("ts").alias("commit_ts_ms"),
        "value",
    )
    w = Window.partitionBy("entity_name", "uid").orderBy(
        "commit_ts_ms", "replay_id"
    )
    prev = F.lag("value").over(w)
    insig = (F.abs(F.col("value") - prev) < SIGNIFICANT_DELTA).cast("long")
    return (
        cwv.select("entity_name", prev.alias("prev_value"), "value", insig.alias("i"))
        .where(F.col("prev_value").isNotNull())
        .groupBy("entity_name")
        .agg(
            F.count("*").alias("n_with_prev"),
            F.sum("i").alias("n_insignificant"),
            F.round(F.sum("i") / F.count("*"), 6).alias("suppress_rate"),
        )
    )


# Point-in-time read timestamp: mid-feed like DIFF_CUT_MS, so the
# as-of state is non-degenerate at every SF.
ASOF_TS_MS = 1_705_363_200_000  # 2024-01-16T00:00:00Z


@query(
    "scd2_time_travel",
    oracle=f"""
WITH {CHANGES_CTE},
hist AS (
  SELECT entity_name, uid, change_type AS uind,
         commit_ts_ms AS valid_from_ms,
         lead(commit_ts_ms) OVER w AS valid_to_ms
  FROM changes
  WINDOW w AS (PARTITION BY entity_name, uid
               ORDER BY commit_ts_ms, replay_id)
)
SELECT entity_name,
       printf('00D%015d', uid) AS record_id,
       uind, valid_from_ms
FROM hist
WHERE valid_from_ms <= {ASOF_TS_MS}
  AND (valid_to_ms IS NULL OR valid_to_ms > {ASOF_TS_MS})
  AND uind <> 'DELETE'
""",
)
def scd2_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (time-travel) read over the SCD2 history: the
    dimension's live state AS OF {ASOF_TS_MS} — each key's version
    whose validity interval covers the read timestamp, tombstoned
    keys excluded. This is the query a reproducible training run or
    an audit issues against the CDC lake ("what did the table say
    when the model was trained?"), and together with snapshot_diff
    it closes the snapshot lifecycle: travel to A, diff A→B, apply.

    Consistency is by construction: the same change log that builds
    the flagship snapshot serves every historical version, so
    time-travel needs no extra storage — just the interval predicate
    over scd2_history's windowed output (one shuffle on the key,
    the minimum for versioning semantics)."""
    hist = scd2_history(spark, sf_dir)
    return (
        hist.where(
            (F.col("valid_from_ms") <= ASOF_TS_MS)
            & (
                F.col("valid_to_ms").isNull()
                | (F.col("valid_to_ms") > ASOF_TS_MS)
            )
            & (F.col("uind") != "DELETE")
        )
        .select(
            "entity_name",
            F.format_string(ID_FMT, F.col("uid")).alias("record_id"),
            "uind",
            "valid_from_ms",
        )
    )


# ---------------------------------------------------------------------------
# temporal probe join: every probe row carries its own AS-OF timestamp
# ---------------------------------------------------------------------------

PROBE_MOD = 17  # deterministic probe sample: event_id % PROBE_MOD == 3


@query(
    "scd2_temporal_probe_join",
    oracle=f"""
WITH {CHANGES_CTE},
hist AS (
  SELECT entity_name, uid, change_type AS uind,
         commit_ts_ms AS valid_from_ms,
         lead(commit_ts_ms) OVER w AS valid_to_ms
  FROM changes
  WINDOW w AS (PARTITION BY entity_name, uid
               ORDER BY commit_ts_ms, replay_id)
),
probes AS (
  SELECT event_id AS probe_id, event_type AS entity_name,
         user_id AS uid, epoch_ms(ts) AS probe_ms
  FROM events WHERE event_id % {PROBE_MOD} = 3
)
SELECT p.probe_id, p.entity_name, p.uid, p.probe_ms,
       h.uind, h.valid_from_ms
FROM probes p
JOIN hist h
  ON h.entity_name = p.entity_name AND h.uid = p.uid
 AND h.valid_from_ms <= p.probe_ms
 AND (h.valid_to_ms IS NULL OR h.valid_to_ms > p.probe_ms)
""",
)
def scd2_temporal_probe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal (point-in-interval) join: a probe relation where EVERY
    row has its own as-of timestamp, joined to the SCD2 history on
    key equality + interval containment — "what did each record look
    like at the moment this event touched it?". This is the lookup
    shape `scd2_time_travel` (one global constant timestamp) cannot
    express, and the batch analog of a stream-side enrichment against
    a versioned dimension.

    Plan: the join condition leads with the EQUI pair
    (entity_name, uid), so Catalyst plans a hash/sort-merge join
    shuffled on the key with the interval predicate applied as the
    join residual — never a broadcast-nested-loop or cartesian. At
    100 TB both sides shuffle once on the same key; each key's probe
    rows meet only that key's few versions (interval containment
    selects at most one). DELETE versions are kept: a probe landing
    inside a tombstone's interval reports the key AS deleted — the
    honest read of the lake at that instant."""
    probes = load_table(spark, sf_dir, "events").where(
        F.col("event_id") % PROBE_MOD == 3
    ).select(
        F.col("event_id").alias("probe_id"),
        F.col("event_type").alias("entity_name"),
        F.col("user_id").alias("uid"),
        F.unix_millis("ts").alias("probe_ms"),
    )
    hist = scd2_history(spark, sf_dir)
    cond = (
        (hist["entity_name"] == probes["entity_name"])
        & (hist["uid"] == probes["uid"])
        & (hist["valid_from_ms"] <= probes["probe_ms"])
        & (hist["valid_to_ms"].isNull() | (hist["valid_to_ms"] > probes["probe_ms"]))
    )
    return probes.join(hist, cond, "inner").select(
        "probe_id",
        probes["entity_name"].alias("entity_name"),
        probes["uid"].alias("uid"),
        "probe_ms",
        "uind",
        "valid_from_ms",
    )


# ---------------------------------------------------------------------------
# golden-record fusion: survivorship rules over match groups
# ---------------------------------------------------------------------------


@query(
    "golden_record_fusion",
    oracle="""
WITH keyed AS (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
         substr(c_name, 1, length(c_name) - 2) AS blk
  FROM customer
)
SELECT c_nationkey, blk,
       min(c_custkey) AS survivor_id,
       CAST(count(*) AS INT) AS n_members,
       min_by(c_name, c_custkey) AS survivor_name,
       round(max(c_acctbal), 6) AS best_acctbal,
       min(c_mktsegment) AS segment_vote
FROM keyed
GROUP BY c_nationkey, blk
HAVING count(*) > 1
""",
)
def golden_record_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step after entity matching: fuse each match group into ONE
    golden record under explicit survivorship rules — lowest key
    survives (stable id), its name carries (``min_by`` ties the
    attribute to the SURVIVOR, not the alphabet), the best balance is
    taken across members, and the categorical field resolves by a
    deterministic vote. `lsh_survivor_pick` elects a survivor ROW;
    this is the attribute-level MDM merge where different columns
    come from different members. Groups reuse `fuzzy_entity_match`'s
    (nation, name-prefix) blocking key, so the two queries describe
    the same duplicate space: one scores the pairs, one publishes
    the merged dimension.

    Plan: one map-side-combinable aggregate over the blocking key —
    min/max/min_by/count all carry constant-size partials, so fusing
    a 100 TB dimension shuffles |groups| rows, and the HAVING
    group-size gate runs post-agg where it belongs."""
    c = load_table(spark, sf_dir, "customer")
    blk = F.expr("substr(c_name, 1, length(c_name) - 2)")
    return (
        c.select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment",
                 blk.alias("blk"))
        .groupBy("c_nationkey", "blk")
        .agg(
            F.min("c_custkey").alias("survivor_id"),
            F.count("*").cast("int").alias("n_members"),
            F.min_by("c_name", "c_custkey").alias("survivor_name"),
            F.round(F.max("c_acctbal"), 6).alias("best_acctbal"),
            F.min("c_mktsegment").alias("segment_vote"),
        )
        .where(F.col("n_members") > 1)
    )


# ---------------------------------------------------------------------------
# replay-offset continuity audit: islands counted without a global sort
# ---------------------------------------------------------------------------


@query(
    "replay_gap_report",
    oracle=f"""
WITH {CHANGES_CTE},
per AS (SELECT DISTINCT change_type, replay_id FROM changes),
stats AS (
  SELECT change_type, min(replay_id) AS lo, max(replay_id) AS hi,
         count(*) AS n_offsets
  FROM per GROUP BY change_type
),
islands AS (
  SELECT a.change_type, count(*) AS n_islands
  FROM per a LEFT JOIN per b
    ON b.change_type = a.change_type AND b.replay_id = a.replay_id + 1
  WHERE b.replay_id IS NULL
  GROUP BY a.change_type
)
SELECT s.change_type, s.n_offsets, s.hi - s.lo + 1 AS span,
       s.hi - s.lo + 1 - s.n_offsets AS n_missing, i.n_islands
FROM stats s JOIN islands i USING (change_type)
""",
)
def replay_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-continuity audit — the replay-loss question the
    reference's replay map exists to answer (ReplayExtension.java:
    31-50): per change type, how many offsets arrived, what span they
    cover, how many are missing, and how many contiguous ISLANDS they
    form. An island count of 1 with n_missing 0 is a healthy shard;
    anything else localizes drops.

    The point is the PLAN: gaps-and-islands is usually written as
    ``replay_id - row_number() OVER (ORDER BY replay_id)`` — a global
    sort that serializes the offset axis through one task. Islands
    are counted here WITHOUT any window: an offset r ends an island
    iff r+1 is absent (probed by a self equi-join on (type, r+1) —
    shuffle-parallel like any join), and #island-ends ≡ #islands.
    min/max/count are map-side partials. Nothing orders the axis
    globally, so the audit scales with the join, not a sort."""
    ch = changes(spark, sf_dir)
    per = ch.select("change_type", "replay_id").distinct()
    stats = per.groupBy("change_type").agg(
        F.min("replay_id").alias("lo"),
        F.max("replay_id").alias("hi"),
        F.count("*").alias("n_offsets"),
    )
    nxt = per.select(
        F.col("change_type").alias("b_type"),
        (F.col("replay_id")).alias("b_replay"),
    )
    ends = per.join(
        nxt,
        (F.col("b_type") == F.col("change_type"))
        & (F.col("b_replay") == F.col("replay_id") + 1),
        "left_anti",
    )
    islands = ends.groupBy("change_type").agg(F.count("*").alias("n_islands"))
    return (
        stats.join(islands, "change_type")
        .select(
            "change_type",
            "n_offsets",
            (F.col("hi") - F.col("lo") + 1).alias("span"),
            (F.col("hi") - F.col("lo") + 1 - F.col("n_offsets")).alias("n_missing"),
            "n_islands",
        )
    )


# ---------------------------------------------------------------------------
# map higher-order functions over the dynamic payload
# ---------------------------------------------------------------------------


@query(
    "map_fn_suite",
    oracle="""
SELECT event_id AS replay_id,
       'props,value' AS keys_sorted,
       2 AS n_entries,
       value AS val_entry,
       CAST(json_extract(props, '$.k') AS INT) AS props_k,
       1 AS n_value_entries,
       upper(props) AS props_upper
FROM events WHERE event_id % 3 = 1
""",
)
def map_fn_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The MapType higher-order-function surface over the dynamic
    payload (`map_payload_extract` does one scalar lookup; this is
    the rest of the toolbox): ``map_keys`` + sort + join,
    ``map_filter`` with a key lambda, ``transform_values``, size and
    ``element_at``. The payload map is the engine's representation of
    per-entity schemas unknown at compile time (SURVEY.md §1.3), so
    these are the operations a generic consumer actually has — it
    cannot name struct fields it doesn't know. The oracle recomputes
    every output from the underlying columns from first principles
    (the map's construction is known), so the HOFs are checked
    against ground truth, not against themselves; the stringified
    double goes back through a double cast, the one representation
    that round-trips across engines (Java Double.toString ≠ DuckDB
    VARCHAR cast).

    Plan: every HOF here is a narrow per-row expression — no shuffle,
    no UDF; at 100 TB this whole suite rides the scan."""
    env = envelopes(spark, sf_dir)
    h = F.col("envelope.payload.ChangeEventHeader")
    m = F.col("envelope.payload.fields")
    return env.where(h["changeType"] == "UPDATE").select(
        F.col("envelope.event.replayId").alias("replay_id"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        F.size(m).alias("n_entries"),
        F.element_at(m, "value").cast("double").alias("val_entry"),
        F.get_json_object(F.element_at(m, "props"), "$.k")
        .cast("int")
        .alias("props_k"),
        F.size(F.map_filter(m, lambda k, v: k == F.lit("value"))).alias(
            "n_value_entries"
        ),
        F.element_at(
            F.transform_values(m, lambda k, v: F.upper(v)), "props"
        ).alias("props_upper"),
    )
