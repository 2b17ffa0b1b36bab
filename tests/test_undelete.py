"""UNDELETE semantics (SURVEY §7: treat as CREATE, keep the marker).

The reference declares the UNDELETE changeType but leaves its handling
TBD (reference README.md:14); the engine's contract is: an UNDELETE
makes the record live again — every liveness predicate is
``change_type <> 'DELETE'`` — while the marker itself is preserved
end-to-end (UIND = changeType verbatim)."""

from __future__ import annotations

from pyspark.sql import functions as F

from sfdc_cdc_aws_spark.operators.pipeline import cdc_latest_snapshot
from sfdc_cdc_aws_spark.sources.cdc_feed import changes

SF = "/root/testdata/sf0.001"


def test_feed_emits_undelete(spark):
    ch = changes(spark, SF)
    by_type = {r["change_type"]: r["n"] for r in ch.groupBy("change_type").agg(F.count("*").alias("n")).collect()}
    assert set(by_type) == {"CREATE", "UPDATE", "DELETE", "UNDELETE"}
    # UNDELETE occupies every 5th CREATE slot: ~1/15 of events
    assert 0 < by_type["UNDELETE"] < by_type["CREATE"]


def test_undelete_is_live_in_snapshot(spark):
    ch = changes(spark, SF)
    snap = cdc_latest_snapshot(spark, SF)
    # records whose LATEST change is an UNDELETE must appear in the
    # snapshot (live), carrying the UNDELETE marker
    latest = (
        ch.groupBy("entity_name", "record_id")
        .agg(F.max_by("change_type", F.struct("commit_ts_ms", "replay_id")).alias("ct"))
    )
    n_latest_undelete = latest.where(F.col("ct") == "UNDELETE").count()
    assert n_latest_undelete > 0, "fixture must exercise latest=UNDELETE"
    n_snap_undelete = snap.where(F.col("uind") == "UNDELETE").count()
    assert n_snap_undelete == n_latest_undelete
    # and none of the snapshot rows is a tombstone
    assert snap.where(F.col("uind") == "DELETE").count() == 0
