"""Synthetic CDC change feed — the engine's canonical event source.

The reference's unit of input is one Salesforce CDC envelope delivered
via Kinesis (captured fixture /root/reference/worker/events/event.json,
parsed at worker/lambda/app.py:48-62). For deterministic testing the
engine reconstructs that envelope from the driver's ``events`` table
(FIXTURES.md §A.4): every derivation below is pure arithmetic on
``events`` columns, so the identical feed is expressible in DuckDB SQL
— that is what makes every CDC query oracle-checkable.

Derivation (one CDC event per ``events`` row):

====================  =====================================================
envelope field         derivation
====================  =====================================================
entityName             ``event_type``
changeType             ``event_id % 3`` → CREATE / UPDATE / DELETE, except
                       ``event_id % 15 == 0`` → UNDELETE (every 5th CREATE
                       slot). UNDELETE semantics per SURVEY §7: the record
                       is live again — every liveness predicate in the
                       engine is ``change_type <> 'DELETE'``, so UNDELETE
                       behaves exactly like CREATE without losing the
                       marker (reference declares it TBD, README.md:14)
recordIds              ``[fmt(user_id)]``; every 5th event also carries a
                       second id ``fmt(user_id + 1_000_000)`` (exercises
                       the explode fan-out, app.py:66)
record id format       ``printf('00D%%015d', uid)`` — 18-char SFDC-ish id
commitTimestamp        epoch millis of ``ts``
commitNumber           ``event_id``
replayId               ``event_id`` (the stream offset,
                       ReplayExtension.java:29)
sequenceNumber         ``event_id % 10``
commitUser             ``'005' || printf('%%015d', user_id)``
transactionKey         ``md5(event_id)``
changedFields          ``['value','props']`` on UPDATE else ``[]``
====================  =====================================================

Two access levels:

* :func:`changes` — the flat, exploded change feed (one row per
  (event, record id)); the input to every downstream CDC operator.
* :func:`envelopes` — the nested envelope as a typed struct plus its
  base64(JSON) wire form, used to exercise decode/parse (T1/T2)
  exactly as the worker does (app.py:51-55).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sfdc_cdc_aws_spark.sources.tables import load_table

# --- Envelope schema (SURVEY.md §1.3; fixture event.json:8 decoded) ---

CHANGE_EVENT_HEADER = T.StructType(
    [
        T.StructField("commitNumber", T.LongType()),
        T.StructField("commitUser", T.StringType()),
        T.StructField("sequenceNumber", T.IntegerType()),
        T.StructField("entityName", T.StringType()),
        T.StructField("changeType", T.StringType()),
        T.StructField("changedFields", T.ArrayType(T.StringType())),
        T.StructField("changeOrigin", T.StringType()),
        T.StructField("transactionKey", T.StringType()),
        T.StructField("commitTimestamp", T.LongType()),
        T.StructField("recordIds", T.ArrayType(T.StringType())),
    ]
)

ENVELOPE_SCHEMA = T.StructType(
    [
        T.StructField("schema", T.StringType()),
        T.StructField(
            "payload",
            T.StructType(
                [
                    T.StructField("ChangeEventHeader", CHANGE_EVENT_HEADER),
                    # sparse changed-field payload: dynamic per entity →
                    # MapType in the generic engine (SURVEY.md §1.3)
                    T.StructField("fields", T.MapType(T.StringType(), T.StringType())),
                ]
            ),
        ),
        T.StructField("event", T.StructType([T.StructField("replayId", T.LongType())])),
    ]
)

SCHEMA_FINGERPRINT = "8_j4Jvbl5vY1cUg6ykKsKw"
CHANGE_ORIGIN = "com/salesforce/api/soap/44.0"
ID_FMT = "00D%015d"


def _change_type(col):
    return (
        F.when(col % 15 == 0, "UNDELETE")
        .when(col % 3 == 0, "CREATE")
        .when(col % 3 == 1, "UPDATE")
        .otherwise("DELETE")
    )


def envelopes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One typed envelope struct per events row + its wire form.

    Columns: ``envelope`` (struct), ``wire`` (base64 of the envelope
    JSON — the shape of a Kinesis record's ``data`` field,
    fixture event.json:8), ``partition_key`` (= entityName, the
    Kinesis partition key, KinesisExample.java:108).

    widen: building the wire form is CPU-bound per event (struct →
    JSON → base64, plus the md5 transactionKey), so the single-row-
    group local file gets full-core parallelism.
    """
    ev = load_table(spark, sf_dir, "events", widen=True)
    second_id = F.format_string(ID_FMT, F.col("user_id") + F.lit(1_000_000))
    header = F.struct(
        F.col("event_id").alias("commitNumber"),
        F.concat(F.lit("005"), F.format_string("%015d", F.col("user_id"))).alias(
            "commitUser"
        ),
        (F.col("event_id") % 10).cast("int").alias("sequenceNumber"),
        F.col("event_type").alias("entityName"),
        _change_type(F.col("event_id")).alias("changeType"),
        F.when(
            _change_type(F.col("event_id")) == "UPDATE",
            F.array(F.lit("value"), F.lit("props")),
        )
        .otherwise(F.array().cast("array<string>"))
        .alias("changedFields"),
        F.lit(CHANGE_ORIGIN).alias("changeOrigin"),
        F.md5(F.col("event_id").cast("string")).alias("transactionKey"),
        F.unix_millis(F.col("ts")).alias("commitTimestamp"),
        F.when(
            F.col("event_id") % 5 == 0,
            F.array(F.format_string(ID_FMT, F.col("user_id")), second_id),
        )
        .otherwise(F.array(F.format_string(ID_FMT, F.col("user_id"))))
        .alias("recordIds"),
    )
    envelope = F.struct(
        F.lit(SCHEMA_FINGERPRINT).alias("schema"),
        F.struct(
            header.alias("ChangeEventHeader"),
            F.create_map(
                F.lit("value"), F.col("value").cast("string"),
                F.lit("props"), F.col("props"),
            ).alias("fields"),
        ).alias("payload"),
        F.struct(F.col("event_id").alias("replayId")).alias("event"),
    )
    return ev.select(
        envelope.alias("envelope"),
        F.base64(F.to_json(envelope).cast("binary")).alias("wire"),
        F.col("event_type").alias("partition_key"),
    )


def changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flat exploded change feed — one row per (event, record id).

    This is the post-T13 (explode, app.py:66) view of the stream that
    every downstream operator consumes. ``uid`` keeps the numeric key
    for the enrichment join against snapshot tables.
    """
    ev = load_table(spark, sf_dir, "events")
    exploded = ev.select(
        F.col("event_id"),
        F.col("ts"),
        F.col("event_type").alias("entity_name"),
        F.explode(
            F.when(
                F.col("event_id") % 5 == 0,
                F.array(F.col("user_id"), F.col("user_id") + F.lit(1_000_000)),
            ).otherwise(F.array(F.col("user_id")))
        ).alias("uid"),
    )
    return exploded.select(
        "entity_name",
        F.format_string(ID_FMT, F.col("uid")).alias("record_id"),
        F.col("uid"),
        _change_type(F.col("event_id")).alias("change_type"),
        F.unix_millis(F.col("ts")).alias("commit_ts_ms"),
        F.col("event_id").alias("replay_id"),
        F.col("event_id").alias("commit_number"),
    )


# --- DuckDB mirror of the derivations above (oracle CTE fragments) ---

# flat exploded feed ≡ changes()
CHANGES_CTE = """
changes AS (
  SELECT event_type AS entity_name,
         printf('00D%015d', uid) AS record_id,
         uid,
         CASE WHEN event_id % 15 = 0 THEN 'UNDELETE'
              WHEN event_id % 3 = 0 THEN 'CREATE'
              WHEN event_id % 3 = 1 THEN 'UPDATE'
              ELSE 'DELETE' END AS change_type,
         epoch_ms(ts) AS commit_ts_ms,
         event_id AS replay_id,
         event_id AS commit_number
  FROM (
    SELECT event_id, ts, user_id AS uid, event_type FROM events
    UNION ALL
    SELECT event_id, ts, user_id + 1000000 AS uid, event_type
    FROM events WHERE event_id % 5 = 0
  )
)
""".strip()

# per-event (pre-explode) header fields
EVENTS_HEADER_CTE = """
headers AS (
  SELECT event_id,
         event_type AS entity_name,
         CASE WHEN event_id % 15 = 0 THEN 'UNDELETE'
              WHEN event_id % 3 = 0 THEN 'CREATE'
              WHEN event_id % 3 = 1 THEN 'UPDATE'
              ELSE 'DELETE' END AS change_type,
         epoch_ms(ts) AS commit_ts_ms,
         event_id AS replay_id,
         event_id AS commit_number,
         CAST(event_id % 10 AS INTEGER) AS sequence_number,
         '005' || printf('%015d', user_id) AS commit_user,
         md5(CAST(event_id AS VARCHAR)) AS transaction_key,
         CASE WHEN event_id % 5 = 0 THEN 2 ELSE 1 END AS n_record_ids
  FROM events
)
""".strip()
