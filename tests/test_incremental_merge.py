"""Incremental MERGE-emulation: maintaining the latest snapshot from
micro-batches must converge to the batch flagship answer regardless
of how the stream is chopped up."""

from __future__ import annotations

from sfdc_cdc_aws_spark.operators.pipeline import cdc_latest_snapshot
from sfdc_cdc_aws_spark.sources.cdc_feed import changes
from sfdc_cdc_aws_spark.streaming.job import changes_stream, ensure_landing
from sfdc_cdc_aws_spark.streaming.merge import IncrementalSnapshot

SF = "/root/testdata/sf0.001"
COLS = ["entity_name", "record_id", "uind", "commit_ts_ms"]


def _flagship_rows(spark):
    return sorted(tuple(r) for r in cdc_latest_snapshot(spark, SF).select(*COLS).collect())


def _state_rows(snap):
    got = snap.current().selectExpr(
        "entity_name", "record_id", "change_type AS uind", "commit_ts_ms"
    )
    return sorted(tuple(r) for r in got.collect())


def test_incremental_equals_batch_multi_epoch(spark, tmp_path):
    """Drive the merge with many small micro-batches (maxFilesPerTrigger=2)
    so ordering across epochs actually matters."""
    landing = ensure_landing(spark, SF)
    snap = IncrementalSnapshot(spark, str(tmp_path / "state"))
    q = snap.attach(
        changes_stream(spark, landing, max_files_per_trigger=2),
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    assert _state_rows(snap) == _flagship_rows(spark)


def test_incremental_idempotent_replay(spark, tmp_path):
    """Replaying an already-applied batch must not change the state
    (at-least-once tolerance, SURVEY.md §1.5)."""
    snap = IncrementalSnapshot(spark, str(tmp_path / "state"))
    ch = changes(spark, SF)
    snap.upsert(ch)
    before = _state_rows(snap)
    snap.upsert(ch.limit(500))  # duplicate delivery of a prefix
    assert _state_rows(snap) == before
