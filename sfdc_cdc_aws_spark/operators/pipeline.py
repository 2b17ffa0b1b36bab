"""The reference CDC worker pipeline re-expressed as DataFrame ops.

The reference (worker/lambda/app.py:48-118) is an imperative loop:
base64-decode each Kinesis record, json-parse, pull header fields,
explode+dedup recordIds per entity, slice into BATCH_SIZE chunks, and
per chunk either emit a DELETE tombstone or enrich via a SOQL
``WHERE Id IN (...)`` lookup, stamp ``UIND``, and put each row to
Firehose. Here every step is a declarative operator on the synthetic
change feed (sources/cdc_feed.py), so Catalyst plans it: the decode
and projections are whole-stage-codegen'd, the dedup is a map-side
partial aggregate, and the enrichment is a broadcast-able equi-join
instead of N REST calls.

Each operator registers a query key + DuckDB oracle with the central
registry; SURVEY.md §2 operator ids (T1..T15, S6, S10) are noted per
function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.registry import query
from sfdc_cdc_aws_spark.sources import load_table
from sfdc_cdc_aws_spark.sources.cdc_feed import (
    CHANGES_CTE,
    ENVELOPE_SCHEMA,
    EVENTS_HEADER_CTE,
    changes,
    envelopes,
)

BATCH_SIZE = 50  # deployed reference value, worker/template.yaml:59


# ---------------------------------------------------------------------------
# §2.7 flagship — the table the whole pipeline exists to produce
# ---------------------------------------------------------------------------

@query(
    "cdc_latest_snapshot",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT entity_name, record_id, uind, commit_ts_ms
FROM (
  SELECT entity_name, record_id, change_type AS uind, commit_ts_ms,
         row_number() OVER (PARTITION BY entity_name, uid
                            ORDER BY commit_ts_ms DESC, replay_id DESC) AS rn
  FROM changes
) WHERE rn = 1 AND uind <> 'DELETE'
""",
)
def cdc_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest non-deleted record per Id (SURVEY.md §2.7).

    Scale note: expressed as ``groupBy().agg(max_by(...))`` rather than
    a row_number window — the aggregate gets a map-side partial
    (combine before shuffle), while a window must shuffle and sort
    every change. At 100 TB of changelog that is the difference
    between shuffling unique-key-sized data and shuffling everything.
    (commit_ts_ms, replay_id) is a total order per key since replay_id
    is the unique stream offset (ReplayExtension.java:29).
    """
    ch = changes(spark, sf_dir)
    return (
        ch.groupBy("entity_name", "uid")
        .agg(
            F.max_by(
                F.struct("record_id", "change_type", "commit_ts_ms"),
                F.struct("commit_ts_ms", "replay_id"),
            ).alias("last")
        )
        .select(
            "entity_name",
            F.col("last.record_id").alias("record_id"),
            F.col("last.change_type").alias("uind"),
            F.col("last.commit_ts_ms").alias("commit_ts_ms"),
        )
        .where(F.col("uind") != "DELETE")
    )


# ---------------------------------------------------------------------------
# T1/T2 — wire decode + parse (app.py:51-55)
# ---------------------------------------------------------------------------

@query(
    "decode_b64",
    oracle="""
SELECT event_id AS replay_id, event_type AS entity_name FROM events
""",
)
def decode_b64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: base64 wire bytes → JSON text (app.py:51-54), then a scalar
    probe of the decoded text via ``get_json_object`` to keep the
    oracle output flat. The decode itself is JVM-side codegen
    (``unbase64``), not per-row Python as in the reference."""
    env = envelopes(spark, sf_dir)
    decoded = F.unbase64(F.col("wire")).cast("string")
    return env.select(
        F.get_json_object(decoded, "$.event.replayId").cast("bigint").alias("replay_id"),
        F.get_json_object(decoded, "$.payload.ChangeEventHeader.entityName").alias(
            "entity_name"
        ),
    )


@query(
    "parse_envelope",
    oracle=f"""
WITH {EVENTS_HEADER_CTE}
SELECT replay_id, entity_name, change_type, commit_ts_ms, sequence_number,
       commit_user, transaction_key, n_record_ids
FROM headers
""",
)
def parse_envelope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: ``from_json`` with the fixed ENVELOPE_SCHEMA (the typed
    replacement for ``json.loads``, app.py:55) over the decoded wire
    text; returns the full header surface."""
    env = envelopes(spark, sf_dir)
    parsed = F.from_json(F.unbase64(F.col("wire")).cast("string"), ENVELOPE_SCHEMA)
    h = parsed["payload"]["ChangeEventHeader"]
    return env.select(
        parsed["event"]["replayId"].alias("replay_id"),
        h["entityName"].alias("entity_name"),
        h["changeType"].alias("change_type"),
        h["commitTimestamp"].alias("commit_ts_ms"),
        h["sequenceNumber"].alias("sequence_number"),
        h["commitUser"].alias("commit_user"),
        h["transactionKey"].alias("transaction_key"),
        F.size(h["recordIds"]).alias("n_record_ids"),
    )


# ---------------------------------------------------------------------------
# T3 — nested-struct field extraction (app.py:58-62)
# ---------------------------------------------------------------------------

@query(
    "extract_header",
    oracle=f"""
WITH {EVENTS_HEADER_CTE}
SELECT entity_name, change_type, replay_id, commit_number, commit_ts_ms
FROM headers
""",
)
def extract_header(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: dotted-path extraction of ChangeEventHeader fields from the
    typed struct — `payload.ChangeEventHeader.entityName` etc.
    (app.py:58-62, KinesisExample.java:102-105)."""
    env = envelopes(spark, sf_dir)
    return env.select(
        F.col("envelope.payload.ChangeEventHeader.entityName").alias("entity_name"),
        F.col("envelope.payload.ChangeEventHeader.changeType").alias("change_type"),
        F.col("envelope.event.replayId").alias("replay_id"),
        F.col("envelope.payload.ChangeEventHeader.commitNumber").alias("commit_number"),
        F.col("envelope.payload.ChangeEventHeader.commitTimestamp").alias(
            "commit_ts_ms"
        ),
    )


# ---------------------------------------------------------------------------
# T13 — explode recordIds (app.py:66)
# ---------------------------------------------------------------------------

@query(
    "explode_record_ids",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT entity_name, record_id, change_type, replay_id FROM changes
""",
)
def explode_record_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T13: one CDC event fans out to one row per recordIds element
    (the ``for record_id in recordIds`` loop, app.py:66) —
    ``explode`` on the envelope array."""
    env = envelopes(spark, sf_dir)
    h = "envelope.payload.ChangeEventHeader"
    return env.select(
        F.col(f"{h}.entityName").alias("entity_name"),
        F.col(f"{h}.changeType").alias("change_type"),
        F.col("envelope.event.replayId").alias("replay_id"),
        F.explode(F.col(f"{h}.recordIds")).alias("record_id"),
    ).select("entity_name", "record_id", "change_type", "replay_id")


# ---------------------------------------------------------------------------
# T10 — dedup ids (app.py:65-72)
# ---------------------------------------------------------------------------

@query(
    "dedup_ids",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT DISTINCT entity_name, record_id FROM changes
""",
)
def dedup_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T10: distinct (entityName, Id) over the exploded feed — the
    reference's per-entity ``count(id) <= 0`` dedup dict (app.py:65-72)
    as a hash aggregate with map-side combine."""
    return changes(spark, sf_dir).select("entity_name", "record_id").dropDuplicates()


# ---------------------------------------------------------------------------
# T11 — group-by-entity routing (app.py:65-72; partition key
#        KinesisExample.java:108)
# ---------------------------------------------------------------------------

@query(
    "group_by_entity",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT entity_name,
       count(*) AS n_changes,
       count(DISTINCT record_id) AS n_ids
FROM changes GROUP BY entity_name
""",
)
def group_by_entity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T11: accumulate ids per entityName — the routing dict
    (app.py:65-72) and the Kinesis partition key
    (KinesisExample.java:108) — as a groupBy aggregate."""
    return (
        changes(spark, sf_dir)
        .groupBy("entity_name")
        .agg(
            F.count("*").alias("n_changes"),
            F.countDistinct("record_id").alias("n_ids"),
        )
    )


# ---------------------------------------------------------------------------
# T4 — predicate branch on changeType (app.py:77)
# ---------------------------------------------------------------------------

@query(
    "filter_by_changetype",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT entity_name, record_id, replay_id
FROM changes WHERE change_type = 'DELETE'
""",
)
def filter_by_changetype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T4: the ``if changeType == 'DELETE'`` branch (app.py:77) as a
    filter; the predicate is pushed into the scan by Catalyst."""
    return (
        changes(spark, sf_dir)
        .where(F.col("change_type") == "DELETE")
        .select("entity_name", "record_id", "replay_id")
    )


# ---------------------------------------------------------------------------
# T6 — tombstone projection (app.py:78-93)
# ---------------------------------------------------------------------------

@query(
    "tombstone_project",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT entity_name AS type, record_id AS id, 'DELETE' AS uind
FROM changes WHERE change_type = 'DELETE'
""",
)
def tombstone_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T6: DELETE → minimal tombstone
    ``{attributes:{type}, Id, UIND}`` (app.py:78-93), flattened here
    (attributes.type → type) so the oracle output is scalar. The
    engine emits the bare Id — the reference leaves SOQL quoting on it
    (app.py:67), documented deviation (FIXTURES.md §A.3)."""
    return (
        changes(spark, sf_dir)
        .where(F.col("change_type") == "DELETE")
        .select(
            F.col("entity_name").alias("type"),
            F.col("record_id").alias("id"),
            F.lit("DELETE").alias("uind"),
        )
    )


# ---------------------------------------------------------------------------
# T7 — literal quoting (app.py:67)
# ---------------------------------------------------------------------------

@query(
    "format_ids",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT DISTINCT record_id, '''' || record_id || '''' AS quoted_id FROM changes
""",
)
def format_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T7: wrap each record id in single quotes for the SOQL IN-list
    (``"'%s'" % record_id``, app.py:67) — ``format_string`` JVM-side."""
    return (
        changes(spark, sf_dir)
        .select("record_id")
        .dropDuplicates()
        .select(
            "record_id", F.format_string("'%s'", F.col("record_id")).alias("quoted_id")
        )
    )


# ---------------------------------------------------------------------------
# T14 — fixed-size batching (app.py:75)
# ---------------------------------------------------------------------------

@query(
    "batch_assign",
    oracle=f"""
WITH {CHANGES_CTE},
ids AS (SELECT DISTINCT entity_name, record_id FROM changes)
SELECT entity_name, record_id,
       CAST(floor((row_number() OVER (PARTITION BY entity_name
                                      ORDER BY record_id) - 1) / {BATCH_SIZE})
            AS BIGINT) AS batch_id
FROM ids
""",
)
def batch_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T14: slice the deduped id list into BATCH_SIZE chunks
    (``range(0, len, batch_size)``, app.py:75; BATCH_SIZE=50 deployed,
    template.yaml:59) — row_number per entity → integer-divide.
    At the live SOQL edge this bounds the IN-list; on parquet the join
    replaces it, so this operator exists for parity + the connector.

    Scale consequence, stated plainly: ``row_number() OVER (PARTITION
    BY entity_name)`` serializes EACH ENTITY'S ids through one task —
    with 5 entities this is a 5-task stage no matter how many
    executors exist. That is faithful to the reference (one Lambda
    walks one entity's id list sequentially, app.py:75-113) and
    acceptable only because the live edge is the real scale path:
    `soql_enrich` (sources/live.py) chunks per PARTITION, so the
    deployed chunking parallelizes with the data while this parity
    operator stays the sequential spec."""
    from pyspark.sql import Window

    ids = changes(spark, sf_dir).select("entity_name", "record_id").dropDuplicates()
    w = Window.partitionBy("entity_name").orderBy("record_id")
    return ids.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - 1) / BATCH_SIZE).cast("bigint"),
    )


# ---------------------------------------------------------------------------
# T8 — UIND stamp (app.py:102)
# ---------------------------------------------------------------------------

@query(
    "append_uind",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT record_id, replay_id, change_type AS uind FROM changes
""",
)
def append_uind(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8: stamp the operation marker ``UIND = changeType`` on every
    row (app.py:102, :84) — a ``withColumn`` projection."""
    return changes(spark, sf_dir).withColumn("uind", F.col("change_type")).select(
        "record_id", "replay_id", "uind"
    )


# ---------------------------------------------------------------------------
# T9 — JSON serialize (app.py:103)
# ---------------------------------------------------------------------------

@query(
    "to_json_row",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT replay_id,
       to_json(struct_pack(Id := record_id, UIND := change_type)) AS js
FROM changes
""",
)
def to_json_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9: row → JSON text for the sink (``json.dumps``, app.py:103) —
    ``to_json(struct(...))``, vectorized instead of per-row."""
    return changes(spark, sf_dir).select(
        "replay_id",
        F.to_json(
            F.struct(F.col("record_id").alias("Id"), F.col("change_type").alias("UIND"))
        ).alias("js"),
    )


# ---------------------------------------------------------------------------
# T12 — the enrichment join (app.py:97-99)
# ---------------------------------------------------------------------------

@query(
    "enrich_join",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT c.record_id, c.replay_id, c.change_type AS uind,
       s.c_custkey, s.c_name, s.c_nationkey, s.c_acctbal, s.c_mktsegment
FROM changes c JOIN customer s ON c.uid = s.c_custkey
WHERE c.change_type <> 'DELETE'
""",
)
def enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12: the enrichment — ``SELECT <all fields> WHERE Id IN (...)``
    (app.py:97-99) is semantically an inner equi-join of the changed-id
    feed against the entity snapshot on its PK. The changed-id side of
    a micro-batch is small → broadcast it, so the snapshot never
    shuffles; at 100 TB the snapshot side stays partition-local."""
    ch = changes(spark, sf_dir).where(F.col("change_type") != "DELETE")
    snap = load_table(spark, sf_dir, "customer")
    return (
        snap.join(F.broadcast(ch), ch["uid"] == snap["c_custkey"], "inner")
        .select(
            "record_id",
            "replay_id",
            F.col("change_type").alias("uind"),
            "c_custkey",
            "c_name",
            "c_nationkey",
            "c_acctbal",
            "c_mktsegment",
        )
    )


@query(
    "semi_filter_ids",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT s.c_custkey, s.c_name, s.c_acctbal
FROM customer s
WHERE s.c_custkey IN (SELECT uid FROM changes)
""",
)
def semi_filter_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T12a: the id set never appears in the output columns → it is a
    left-semi filter on the snapshot (app.py:97-109)."""
    ch = changes(spark, sf_dir).select("uid")
    snap = load_table(spark, sf_dir, "customer")
    return snap.join(
        F.broadcast(ch), ch["uid"] == snap["c_custkey"], "left_semi"
    ).select("c_custkey", "c_name", "c_acctbal")


# ---------------------------------------------------------------------------
# T5 — dynamic all-columns projection (app.py:97, :115-118)
# ---------------------------------------------------------------------------

@query(
    "project_all_fields",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT s.* FROM customer s
WHERE s.c_custkey IN (SELECT uid FROM changes WHERE change_type <> 'DELETE')
""",
)
def project_all_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: the SELECT list is every field of the entity, discovered at
    runtime (``getObjectFields`` via describe(), app.py:115-118) — here
    the projection list comes from the snapshot's schema at plan time,
    the Spark analog of runtime describe()."""
    snap = load_table(spark, sf_dir, "customer")
    all_fields = snap.schema.fieldNames()  # runtime discovery, not hard-coded
    ch = changes(spark, sf_dir).where(F.col("change_type") != "DELETE").select("uid")
    return snap.join(
        F.broadcast(ch), ch["uid"] == snap["c_custkey"], "left_semi"
    ).select(*all_fields)


# ---------------------------------------------------------------------------
# §2.6 — branch union (app.py:77-94 vs :96-109 → one sink)
# ---------------------------------------------------------------------------

@query(
    "union_branches",
    oracle=f"""
WITH {CHANGES_CTE}
SELECT c.record_id AS id, c.entity_name AS type, 'DELETE' AS uind,
       c.replay_id, NULL AS c_name, CAST(NULL AS DOUBLE) AS c_acctbal
FROM changes c WHERE c.change_type = 'DELETE'
UNION ALL
SELECT c.record_id AS id, c.entity_name AS type, c.change_type AS uind,
       c.replay_id, s.c_name, s.c_acctbal
FROM changes c JOIN customer s ON c.uid = s.c_custkey
WHERE c.change_type <> 'DELETE'
""",
)
def union_branches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.6: the DELETE and UPSERT branches write to the same stream
    (app.py:77-94, :96-109) — the implicit UNION ALL, expressed as
    ``unionByName(allowMissingColumns=True)`` so the tombstone's
    missing snapshot columns become nulls."""
    ch = changes(spark, sf_dir)
    tombstones = ch.where(F.col("change_type") == "DELETE").select(
        F.col("record_id").alias("id"),
        F.col("entity_name").alias("type"),
        F.lit("DELETE").alias("uind"),
        "replay_id",
    )
    snap = load_table(spark, sf_dir, "customer")
    upserts = (
        snap.join(
            F.broadcast(ch.where(F.col("change_type") != "DELETE")),
            F.col("uid") == F.col("c_custkey"),
            "inner",
        )
        .select(
            F.col("record_id").alias("id"),
            F.col("entity_name").alias("type"),
            F.col("change_type").alias("uind"),
            "replay_id",
            "c_name",
            "c_acctbal",
        )
    )
    return tombstones.unionByName(upserts, allowMissingColumns=True)


# ---------------------------------------------------------------------------
# S6 — SOQL point lookup (app.py:97-99)
# ---------------------------------------------------------------------------

_LOOKUP_KEYS = (1, 3, 5, 7, 11, 42)


@query(
    "soql_in_lookup",
    oracle=f"""
SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
FROM customer WHERE c_custkey IN {_LOOKUP_KEYS}
""",
)
def soql_in_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: ``WHERE Id IN ('...')`` against the entity table
    (``sf.query_all``, app.py:97-99) — an ``isin`` filter that Catalyst
    pushes into the parquet scan as an IN predicate."""
    snap = load_table(spark, sf_dir, "customer")
    return snap.where(F.col("c_custkey").isin(*_LOOKUP_KEYS)).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


# ---------------------------------------------------------------------------
# S10 — synthetic bulk generator (bulk-load.py:47-72)
# ---------------------------------------------------------------------------

_BULK_N = 2000  # records per Bulk API call, bulk-load.py:42-45


@query(
    "bulk_generate",
    oracle=f"""
SELECT i AS seq,
       printf('00Q%015d', i) AS id,
       'LastName_' || CAST(i AS VARCHAR) AS last_name,
       printf('bulk%d@example.com', i) AS email
FROM range({_BULK_N}) t(i)
""",
)
def bulk_generate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: the deterministic test-stimulus generator — templated
    LastName/Email rows (bulk-load.py:55-65) via ``spark.range`` +
    ``format_string``, fully distributed (no driver-side loop)."""
    return spark.range(_BULK_N).select(
        F.col("id").alias("seq"),
        F.format_string("00Q%015d", F.col("id")).alias("id"),
        F.concat(F.lit("LastName_"), F.col("id").cast("string")).alias("last_name"),
        F.format_string("bulk%d@example.com", F.col("id")).alias("email"),
    )


# ---------------------------------------------------------------------------
# dead-letter accounting: the corrupt-record path, driver-visible
# ---------------------------------------------------------------------------

POISON_MOD = 101  # deterministic poison: every 101st event's wire truncated


@query(
    "dead_letter_report",
    oracle=f"""
SELECT CAST(count(*) FILTER (WHERE event_id % {POISON_MOD} <> 0) AS BIGINT)
         AS n_ok_records,
       CAST(count(*) FILTER (WHERE event_id % {POISON_MOD} = 0) AS BIGINT)
         AS n_dead_records,
       CAST(count(*) FILTER (WHERE event_id % {POISON_MOD} <> 0
                             AND event_id % 5 = 0) * 2
            + count(*) FILTER (WHERE event_id % {POISON_MOD} <> 0
                               AND event_id % 5 <> 0) AS BIGINT)
         AS n_ok_changes
FROM events
""",
)
def dead_letter_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corrupt-record path, end to end and driver-checked: a
    deterministic 1-in-{POISON_MOD} of the wire records is truncated
    mid-base64 (the torn-Kinesis-record failure), the feed routes
    through :func:`streaming.job.split_corrupt`, and the report
    accounts for every record — parsed records explode to their
    changes, dead letters are COUNTED (in production: landed with
    raw payload + alerted), and nothing vanishes. The reference
    would loop forever here: app.py:48-62 has no error handling, so
    Kinesis redelivers the poisoned batch until it expires; the
    split makes the same input a bounded, measured loss instead.

    Plan: one scan, the split is two complementary filters on the
    same decoded expression (no second decode), counts are map-side
    partials."""
    from sfdc_cdc_aws_spark.sources.cdc_feed import envelopes
    from sfdc_cdc_aws_spark.streaming.job import wire_validity

    env = envelopes(spark, sf_dir)
    wire = env.select(
        F.col("partition_key").alias("partitionKey"),
        F.when(
            F.col("envelope.event.replayId") % POISON_MOD == 0,
            F.substring(F.col("wire"), 1, 10),  # torn record: invalid b64 tail
        )
        .otherwise(F.col("wire"))
        .alias("data"),
    )
    # ONE pass: split_corrupt's validity predicate evaluated once per
    # record, all three counts as conditional aggregates — the wire
    # build + decode runs a single time instead of once per branch
    parsed, ok = wire_validity(wire)
    n_ids = F.size(parsed["payload"]["ChangeEventHeader"]["recordIds"])
    return wire.select(ok.alias("_ok"), n_ids.alias("_n")).agg(
        F.sum(F.col("_ok").cast("long")).cast("bigint").alias("n_ok_records"),
        F.sum((~F.coalesce(F.col("_ok"), F.lit(False))).cast("long"))
        .cast("bigint")
        .alias("n_dead_records"),
        F.sum(F.when(F.col("_ok"), F.col("_n")).otherwise(0))
        .cast("bigint")
        .alias("n_ok_changes"),
    )
