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
from sfdc_cdc_aws_spark.sources.cdc_feed import CHANGES_CTE, changes, envelopes


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
