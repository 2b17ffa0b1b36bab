"""Streaming-mode properties beyond the oracle parity suite:
batch ≡ stream equivalence, the production foreachBatch lake sink,
and checkpoint resume (the engine's ReplayExtension analog)."""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.operators.pipeline import cdc_latest_snapshot, union_branches
from sfdc_cdc_aws_spark.sources import load_table
from sfdc_cdc_aws_spark.streaming.job import (
    changes_stream,
    cdc_stream_latest,
    cdc_stream_pipeline,
    ensure_landing,
    sink_to_lake,
)

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_stream_latest_equals_batch(spark):
    got = cdc_stream_latest(spark, SF)
    want = cdc_latest_snapshot(spark, SF)
    cols = ["entity_name", "record_id", "uind", "commit_ts_ms"]
    assert _rows(got, cols) == _rows(want, cols)


def test_stream_pipeline_equals_batch(spark):
    got = cdc_stream_pipeline(spark, SF)
    want = union_branches(spark, SF)
    cols = ["id", "type", "uind", "replay_id", "c_name", "c_acctbal"]
    assert _rows(got, cols) == _rows(want, cols)


def test_foreach_batch_lake_sink(spark, tmp_path):
    landing = ensure_landing(spark, SF)
    out = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")
    snapshot = load_table(spark, SF, "customer")
    q = sink_to_lake(changes_stream(spark, landing), snapshot, out, ckpt)
    q.awaitTermination()
    landed = spark.read.parquet(out)
    want = union_branches(spark, SF)
    assert landed.count() == want.count()
    # partitioned by entity type, like the Firehose prefix + partition key
    parts = {p for p in os.listdir(out) if p.startswith("type=")}
    types = {r[0] for r in want.select("type").distinct().collect()}
    assert parts == {f"type={t}" for t in types}


def test_checkpoint_resume_no_reprocessing(spark, tmp_path):
    """Replay semantics (S2): a restarted query with the same
    checkpoint must not re-emit already-committed events."""
    landing = ensure_landing(spark, SF)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def run_once() -> int:
        q = (
            changes_stream(spark, landing)
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).count()

    n1 = run_once()
    assert n1 > 0
    n2 = run_once()  # second run: offsets exhausted → nothing new
    assert n2 == n1


def test_tumbling_window_counts_match_batch(spark):
    """Event-time tumbling window in streaming ≡ date_trunc in batch
    (the Firehose 60s-buffer analog, SURVEY.md §2.6)."""
    landing = ensure_landing(spark, SF)
    stream = changes_stream(spark, landing)
    agg = stream.groupBy(
        F.window("commit_ts", "1 hour"), "entity_name"
    ).agg(F.count("*").alias("n"))
    name = f"tumbling_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", f"/tmp/sfdc_cdc_ckpt/{name}")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = sorted(
        (r["window"]["start"], r["entity_name"], r["n"])
        for r in spark.table(name).collect()
    )
    from sfdc_cdc_aws_spark.sources.cdc_feed import changes

    want = sorted(
        (r["w"], r["entity_name"], r["n"])
        for r in changes(spark, SF)
        .groupBy(
            F.date_trunc("hour", F.timestamp_millis("commit_ts_ms")).alias("w"),
            "entity_name",
        )
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert got == want


def test_console_sink_drains(spark, tmp_path):
    """S9 smoke: the console debug sink consumes the whole feed and
    terminates (output goes to driver stdout by design)."""
    from sfdc_cdc_aws_spark.streaming.job import ensure_landing, sink_to_console

    landing = ensure_landing(spark, "/root/testdata/sf0.001")
    q = sink_to_console(
        changes_stream(spark, landing),
        num_rows=5,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    assert q.lastProgress is not None


def test_landing_cache_invalidated_by_source_change(spark, tmp_path):
    """The wire landing dir is keyed on (feed revision, source
    mtime+size): regenerating events.parquet must produce a fresh
    landing dir, not serve the stale wire feed."""
    import shutil as _sh

    from sfdc_cdc_aws_spark.streaming.job import ensure_landing

    sf_dir = tmp_path / "sfY"
    sf_dir.mkdir()
    _sh.copy("/root/testdata/sf0.001/events.parquet", sf_dir / "events.parquet")
    first = ensure_landing(spark, str(sf_dir))

    import duckdb

    con = duckdb.connect()
    con.execute(
        f"COPY (SELECT * FROM read_parquet('{sf_dir}/events.parquet') "
        f"WHERE event_id % 2 = 0) TO '{sf_dir}/events.parquet' (FORMAT PARQUET)"
    )
    second = ensure_landing(spark, str(sf_dir))
    assert second != first, "stale landing dir served after source regeneration"


def test_split_corrupt_quarantines_poison_records(spark):
    """Corrupt wire records (bad base64, non-JSON payload, missing
    recordIds) land in the dead-letter side with payload intact; the
    good side parses to exactly the same feed as the clean input."""
    import base64 as b64
    import json as js

    from sfdc_cdc_aws_spark.streaming.job import parse_wire, split_corrupt

    landing = ensure_landing(spark, "/root/testdata/sf0.001")
    clean = spark.read.json(landing)
    n_clean = clean.count()

    poison = spark.createDataFrame(
        [
            ("p1", "!!!not-base64!!!"),
            ("p2", b64.b64encode(b"this is not json").decode()),
            (
                "p3",
                b64.b64encode(
                    js.dumps(
                        {"schema": "x", "payload": {"ChangeEventHeader": {}},
                         "event": {"replayId": 1}}
                    ).encode()
                ).decode(),
            ),
        ],
        "partitionKey string, data string",
    )
    mixed = clean.unionByName(poison)
    good, bad = split_corrupt(mixed)
    assert good.count() == n_clean
    assert bad.count() == 3
    assert {r["partitionKey"] for r in bad.collect()} == {"p1", "p2", "p3"}
    # the good side parses identically to the clean feed
    assert parse_wire(good).count() == parse_wire(clean).count()


def test_backfill_handoff_seam_reconciles(spark):
    """The seam must neither drop nor double-count: merged per-record
    counts equal a one-pass batch aggregate over the full feed, the
    per-side counts partition each record's total, and both sides of
    the seam are non-empty corpus-wide (the cut actually splits the
    feed)."""
    from sfdc_cdc_aws_spark.streaming.backfill import stream_backfill_handoff
    from sfdc_cdc_aws_spark.streaming.job import WIRE_SCHEMA, parse_wire

    landing = ensure_landing(spark, SF)
    full = parse_wire(spark.read.schema(WIRE_SCHEMA).json(landing))
    onepass = {
        r["record_id"]: (r["n"], r["last"])
        for r in full.groupBy("record_id")
        .agg(F.count("*").alias("n"), F.max("replay_id").alias("last"))
        .collect()
    }
    rows = stream_backfill_handoff(spark, SF).collect()
    assert len(rows) == len(onepass)
    tot_backfill = tot_live = 0
    for r in rows:
        n, last = onepass[r["record_id"]]
        assert (r["n_changes"], r["last_replay"]) == (n, last), r
        assert r["n_backfill"] + r["n_live"] == r["n_changes"], r
        tot_backfill += r["n_backfill"]
        tot_live += r["n_live"]
    assert tot_backfill > 0 and tot_live > 0, (tot_backfill, tot_live)
