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


def test_crash_between_renames_recovers(spark, tmp_path, monkeypatch):
    """Kill the swap between ``state → old`` and ``stage → state``:
    the next access must still see the full prior state (rolled back
    from ``__old``), and replaying the interrupted batch — which is
    what the streaming checkpoint does, since the epoch never
    committed — must converge to the batch answer. This was the
    round-1/2 exactly-once gap: a crash in that window left no state
    dir at all while the checkpoint kept earlier batches marked done."""
    import os as _os

    import pytest

    import sfdc_cdc_aws_spark.streaming.merge as merge_mod

    snap = IncrementalSnapshot(spark, str(tmp_path / "state"))
    ch = changes(spark, SF)
    snap.upsert(ch.limit(500))
    before = _state_rows(snap)

    real_rename = _os.rename
    calls = {"n": 0}

    def dying_rename(src, dst):
        if calls["n"] == 0:
            calls["n"] += 1
            return real_rename(src, dst)  # state -> old succeeds
        raise OSError("simulated crash between renames")

    monkeypatch.setattr(merge_mod.os, "rename", dying_rename)
    with pytest.raises(OSError, match="simulated crash"):
        snap.upsert(ch)
    monkeypatch.setattr(merge_mod.os, "rename", real_rename)

    assert not merge_mod.os.path.exists(
        merge_mod.os.path.join(str(tmp_path / "state"), "_SUCCESS")
    ), "precondition: the crash really did land in the no-state window"
    assert snap.exists(), "recovery must restore the prior state"
    assert _state_rows(snap) == before
    snap.upsert(ch)  # checkpoint replays the interrupted batch
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
