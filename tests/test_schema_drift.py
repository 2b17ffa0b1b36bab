"""End-to-end schema-drift drill (round-5 verdict item 7).

A new payload field arrives MID-STREAM: wave 1 envelopes carry
fields {value, props}; wave 2 adds tier__c.  Driven through
wire → parse → per-batch runtime field discovery → incremental merge
(same checkpoint across waves), then asserted:

- the pre-drift published epoch stays readable, schema unchanged;
- the post-drift state carries the new column, NULL-backfilled for
  keys last touched before the drift;
- an EPOCH-CROSSING ORACLE: the final state must equal the
  latest-per-key reduction of ALL events (both waves) computed
  independently in pure Python from the fixture definition.
"""

from __future__ import annotations

import base64
import json
import os

from sfdc_cdc_aws_spark.streaming.drift import (
    attach_with_drift,
    parse_wire_fields,
)
from sfdc_cdc_aws_spark.streaming.job import WIRE_SCHEMA
from sfdc_cdc_aws_spark.streaming.merge import IncrementalSnapshot

REPLAY_HORIZON = "100000 days"  # historical replay: unbounded disorder


def _wire_line(replay_id, uid, change_type, ts_ms, fields):
    env = {
        "schema": "drift-fixture",
        "payload": {
            "ChangeEventHeader": {
                "commitNumber": replay_id,
                "commitUser": f"005{uid:015d}",
                "sequenceNumber": 1,
                "entityName": "acct",
                "changeType": change_type,
                "changedFields": sorted(fields),
                "changeOrigin": "drift-test",
                "transactionKey": f"tx{replay_id}",
                "commitTimestamp": ts_ms,
                "recordIds": [f"00D{uid:015d}"],
            },
            "fields": fields,
        },
        "event": {"replayId": replay_id},
    }
    data = base64.b64encode(json.dumps(env).encode()).decode()
    return json.dumps({"partitionKey": "acct", "data": data})


# wave 1: v1 payload {value, props} — uids 1..4
WAVE1 = [
    (1, 1, "CREATE", 1_000, {"value": "10", "props": "a"}),
    (2, 2, "CREATE", 2_000, {"value": "20", "props": "b"}),
    (3, 3, "CREATE", 3_000, {"value": "30", "props": "c"}),
    (4, 4, "CREATE", 4_000, {"value": "40", "props": "d"}),
    (5, 2, "UPDATE", 5_000, {"value": "21", "props": "b2"}),
]
# wave 2 (post-drift): payload gains tier__c; touches uids 2 and 5
WAVE2 = [
    (6, 2, "UPDATE", 6_000, {"value": "22", "props": "b3", "tier__c": "gold"}),
    (7, 5, "CREATE", 7_000, {"value": "50", "props": "e", "tier__c": "silver"}),
]


def _expected_final():
    """Epoch-crossing oracle: latest-per-(entity, uid) over BOTH waves,
    tier__c NULL where the winning row predates the drift."""
    latest = {}
    for replay, uid, ct, ts, fields in WAVE1 + WAVE2:
        key = ("acct", uid)
        if key not in latest or (ts, replay) > latest[key][:2]:
            latest[key] = (ts, replay, ct, fields)
    out = set()
    for (ent, uid), (ts, replay, ct, fields) in latest.items():
        out.add(
            (
                ent,
                uid,
                ct,
                ts,
                fields.get("value"),
                fields.get("props"),
                fields.get("tier__c"),
            )
        )
    return out


def _drain(spark, snap, landing, ckpt):
    stream = parse_wire_fields(
        spark.readStream.schema(WIRE_SCHEMA).json(landing)
    ).withWatermark("commit_ts", REPLAY_HORIZON).dropDuplicates(
        ["replay_id", "record_id"]
    )
    q = attach_with_drift(snap, stream, ckpt)
    q.awaitTermination()


def test_mid_stream_new_field_drill(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)
    with open(os.path.join(landing, "wave1.json"), "w") as f:
        f.write("\n".join(_wire_line(*e) for e in WAVE1) + "\n")

    snap = IncrementalSnapshot(spark, str(tmp_path / "state"), keep_epochs=10)
    _drain(spark, snap, landing, ckpt)

    # pre-drift epoch: published, readable, and WITHOUT the new column
    pre_epochs = snap.epochs()
    assert pre_epochs, "wave 1 must publish at least one epoch"
    pre_last = pre_epochs[-1]
    assert "tier__c" not in snap.read().columns
    pre_rows = snap.read().count()
    assert pre_rows == 4  # uids 1..4

    # the drift: new envelopes with an extra payload field arrive
    with open(os.path.join(landing, "wave2.json"), "w") as f:
        f.write("\n".join(_wire_line(*e) for e in WAVE2) + "\n")
    _drain(spark, snap, landing, ckpt)  # same checkpoint: only wave 2 replays

    # old epoch: still readable, schema unchanged (byte-identical files)
    old = snap.read_epoch(pre_last)
    assert "tier__c" not in old.columns
    assert old.count() == pre_rows

    # new state: additive widening, NULL-backfilled for pre-drift keys
    cur = snap.read()
    assert "tier__c" in cur.columns
    got = {
        (
            r["entity_name"],
            r["uid"],
            r["change_type"],
            r["commit_ts_ms"],
            r["value"],
            r["props"],
            r["tier__c"],
        )
        for r in cur.collect()
    }
    assert got == _expected_final()
    by_uid = {r["uid"]: r for r in cur.collect()}
    assert by_uid[2]["tier__c"] == "gold"  # updated post-drift
    assert by_uid[5]["tier__c"] == "silver"  # created post-drift
    for uid in (1, 3, 4):  # last touched pre-drift → NULL-backfilled
        assert by_uid[uid]["tier__c"] is None
