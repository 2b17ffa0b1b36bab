"""Live-edge stubs: the cdc_wire DataSource (replayId offsets) and
the batched mapInPandas lookup client."""

from __future__ import annotations

import os

import pandas as pd
import pytest

from sfdc_cdc_aws_spark.operators.pipeline import enrich_join
from sfdc_cdc_aws_spark.sources import load_table
from sfdc_cdc_aws_spark.sources.cdc_feed import changes
from sfdc_cdc_aws_spark.sources.live import (
    HAS_DATASOURCE_API,
    REPLAY_FROM_TIP,
    register_cdc_wire,
    snapshot_fetcher,
    soql_enrich,
)
from sfdc_cdc_aws_spark.streaming.job import ensure_landing, parse_wire

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not HAS_DATASOURCE_API, reason="needs pyspark>=4 DataSource API"
)


def test_cdc_wire_batch_read(spark):
    register_cdc_wire(spark)
    landing = ensure_landing(spark, SF)
    df = spark.read.format("cdc_wire").option("path", landing).load()
    n_events = load_table(spark, SF, "events").count()
    assert df.count() == n_events
    # replay ids are the stream offsets: unique and complete
    assert df.select("replay_id").distinct().count() == n_events
    # and the payload parses through the shared wire parser
    parsed = parse_wire(df.drop("replay_id"))
    assert parsed.count() == changes(spark, SF).count()


def test_cdc_wire_stream_earliest(spark, tmp_path):
    register_cdc_wire(spark)
    landing = ensure_landing(spark, SF)
    q = (
        spark.readStream.format("cdc_wire")
        .option("path", landing)
        .load()
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.read.parquet(str(tmp_path / "out"))
    assert got.count() == load_table(spark, SF, "events").count()


def test_cdc_wire_stream_from_tip_sees_nothing(spark, tmp_path):
    """REPLAY_FROM_TIP (-1): a new subscription starts at the current
    end of stream (EmpConnector.java:104) — a static landing dir
    yields zero rows."""
    register_cdc_wire(spark)
    landing = ensure_landing(spark, SF)
    q = (
        spark.readStream.format("cdc_wire")
        .option("path", landing)
        .option("replay_from", str(REPLAY_FROM_TIP))
        .load()
        .writeStream.format("memory")
        .queryName("tip_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert spark.table("tip_test").count() == 0


def test_soql_enrich_matches_join(spark):
    """The mapInPandas batched-lookup client returns exactly what the
    broadcast enrichment join returns (T12 ≡ S6+T14 semantics)."""
    ch = changes(spark, SF).where("change_type <> 'DELETE'")
    snap_pdf: pd.DataFrame = load_table(spark, SF, "customer").toPandas()
    fetch = snapshot_fetcher(snap_pdf, "c_custkey")
    schema = (
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double,"
        " c_mktsegment string, record_id string, UIND string"
    )
    got = soql_enrich(ch, fetch, schema, batch_size=50)
    want = enrich_join(spark, SF)
    g = sorted(
        tuple(r) for r in got.select("record_id", "c_custkey", "c_name", "UIND").collect()
    )
    w = sorted(
        tuple(r)
        for r in want.selectExpr(
            "record_id", "c_custkey", "c_name", "uind AS UIND"
        ).collect()
    )
    assert g == w


def test_cdc_wire_stream_from_concrete_replay_id(spark, tmp_path):
    """Resuming from a stored replayId (the ReplayExtension contract,
    ReplayExtension.java:39-50): only events strictly after the stored
    offset are delivered."""
    register_cdc_wire(spark)
    landing = ensure_landing(spark, SF)
    all_ids = sorted(
        r[0]
        for r in spark.read.format("cdc_wire")
        .option("path", landing)
        .load()
        .select("replay_id")
        .collect()
    )
    mid = all_ids[len(all_ids) // 2]
    q = (
        spark.readStream.format("cdc_wire")
        .option("path", landing)
        .option("replay_from", str(mid))
        .load()
        .writeStream.format("memory")
        .queryName("resume_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
    finally:
        q.stop()
    got = sorted(r[0] for r in spark.table("resume_test").select("replay_id").collect())
    assert got == [i for i in all_ids if i > mid]


def test_cdc_wire_stream_picks_up_new_files(spark, tmp_path):
    """New wire records appearing in the landing dir advance the
    offset and are delivered exactly once across restarts of the same
    checkpoint."""
    import base64 as b64
    import json as js
    import shutil

    register_cdc_wire(spark)
    src = ensure_landing(spark, SF)
    landing = str(tmp_path / "landing")
    shutil.copytree(src, landing)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain() -> list[int]:
        q = (
            spark.readStream.format("cdc_wire")
            .option("path", landing)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sorted(r[0] for r in spark.read.parquet(out).select("replay_id").collect())

    first = drain()
    top = max(first)
    # a late event arrives on the wire
    env = {
        "schema": "x",
        "payload": {"ChangeEventHeader": {"entityName": "late"}},
        "event": {"replayId": top + 1},
    }
    rec = {
        "partitionKey": "late",
        "data": b64.b64encode(js.dumps(env).encode()).decode(),
    }
    with open(f"{landing}/late.json", "w") as f:
        f.write(js.dumps(rec) + "\n")
    second = drain()
    assert second == first + [top + 1]


def test_reauth_resumes_from_stored_replay_id(spark):
    """Mid-stream auth failure → reauthenticate → resubscribe, resuming
    from the stored replayId (EmpConnector.java:322-346 + the
    ReplayExtension contract): no events lost, none reprocessed, and
    the provider is called exactly once per (re)authentication."""
    from sfdc_cdc_aws_spark.sources.live import (
        AuthError,
        _WireStreamReader,
        register_token_provider,
    )

    landing = ensure_landing(spark, SF)
    state = {"issued": 0, "expired": False}
    register_token_provider(
        "test_bearer",
        provider=lambda: (state.update(issued=state["issued"] + 1, expired=False),
                          f"tok{state['issued']}")[1],
        validator=lambda tok: not state["expired"],
    )
    reader = _WireStreamReader(
        {"path": landing, "token_provider": "test_bearer"}
    )
    start = reader.initialOffset()
    rows1, mid = reader.read(start)
    rows1 = list(rows1)
    assert rows1 and state["issued"] == 1

    # simulate the 401: token expires between micro-batches...
    state["expired"] = True
    # ...but a fresh landing scan happens only after reauth succeeds
    rows2, end = reader.read(mid)
    assert state["issued"] == 2, "expired token must force exactly one reauth"
    # the offset lived in the checkpoint, not the connection: resuming
    # from `mid` delivers nothing new and reprocesses nothing
    assert list(rows2) == []
    assert end == mid

    # full replay across the auth boundary is still exactly-once
    all_ids = [r[0] for r in rows1]
    assert sorted(all_ids) == sorted(set(all_ids))

    # terminal branch: provider that keeps returning invalid tokens
    register_token_provider(
        "test_bad", provider=lambda: "dead", validator=lambda tok: False
    )
    bad = _WireStreamReader({"path": landing, "token_provider": "test_bad"})
    with pytest.raises(AuthError):
        bad.read(bad.initialOffset())


# ---------------------------------------------------------------------------
# writer half of the DataSource: two-phase commit semantics
# ---------------------------------------------------------------------------


def _wire_slice(spark, sf_dir, mod=13):
    from pyspark.sql import functions as F

    from sfdc_cdc_aws_spark.sources.cdc_feed import envelopes

    return envelopes(spark, sf_dir).where(
        F.col("envelope.event.replayId") % mod == 0
    ).select(
        F.col("partition_key").alias("partitionKey"), F.col("wire").alias("data")
    )


def test_writer_append_then_read_back(spark, sf_dir, tmp_path):
    from sfdc_cdc_aws_spark.sources.live import register_cdc_wire

    register_cdc_wire(spark)
    out = str(tmp_path / "landing")
    os.makedirs(out)
    sl = _wire_slice(spark, sf_dir)
    n = sl.count()
    sl.write.format("cdc_wire").mode("append").option("path", out).save()
    # published: _SUCCESS present, no staged leftovers
    assert os.path.exists(os.path.join(out, "_SUCCESS"))
    assert not os.path.exists(os.path.join(out, "_staged"))
    back = spark.read.format("cdc_wire").option("path", out).load()
    assert back.count() == n


def test_writer_overwrite_replaces_previous_publish(spark, sf_dir, tmp_path):
    from sfdc_cdc_aws_spark.sources.live import register_cdc_wire

    register_cdc_wire(spark)
    out = str(tmp_path / "landing")
    os.makedirs(out)
    _wire_slice(spark, sf_dir, mod=13).write.format("cdc_wire").mode("append").option(
        "path", out
    ).save()
    smaller = _wire_slice(spark, sf_dir, mod=26)
    n2 = smaller.count()
    smaller.write.format("cdc_wire").mode("overwrite").option("path", out).save()
    back = spark.read.format("cdc_wire").option("path", out).load()
    assert back.count() == n2


def test_writer_put_batch_cap_respected(spark, sf_dir, tmp_path):
    """With put_batch_size=7 every staged PUT batch holds <=7 records;
    the commit message accounting must add up (ceil per partition)."""
    from sfdc_cdc_aws_spark.sources.live import _WireBatchWriter

    class Row:
        def __init__(self, i):
            self.partitionKey = f"pk{i % 3}"
            self.data = f"d{i}"

    out = str(tmp_path / "landing")
    os.makedirs(out)
    w = _WireBatchWriter({"path": out, "put_batch_size": "7"}, overwrite=False)
    msg = w.write(iter([Row(i) for i in range(23)]))
    assert msg.records == 23
    assert msg.put_batches == 4  # ceil(23/7)
    # staged only — a reader scanning now must see NOTHING published
    from sfdc_cdc_aws_spark.sources.live import _scan_landing

    assert _scan_landing(out) == []
    w.abort([msg])
    assert not os.path.exists(os.path.join(out, "_staged"))


def test_batch_reader_one_task_per_file(spark, sf_dir, tmp_path):
    """partitions() must fan the batch read out one task per landing
    file — the default single InputPartition(None) serializes the
    whole dir through one task."""
    from sfdc_cdc_aws_spark.sources.live import register_cdc_wire

    register_cdc_wire(spark)
    out = str(tmp_path / "landing")
    os.makedirs(out)
    _wire_slice(spark, sf_dir).repartition(4).write.format("cdc_wire").mode(
        "append"
    ).option("path", out).save()
    n_files = len([f for f in os.listdir(out) if f.endswith(".json")])
    assert n_files >= 2  # repartition(4) staged >=2 non-empty partitions
    back = spark.read.format("cdc_wire").option("path", out).load()
    assert back.rdd.getNumPartitions() == n_files


def test_stream_writer_epoch_commits_and_replay_idempotence(spark, sf_dir, tmp_path):
    """writeStream.format('cdc_wire'): multi-epoch drain publishes
    per-batch files + COMMITTED markers; a replayed batchId publishes
    nothing twice."""
    from sfdc_cdc_aws_spark.sources.live import _WireCommit, _WireStreamWriter
    from sfdc_cdc_aws_spark.sources.live import register_cdc_wire
    from sfdc_cdc_aws_spark.streaming.job import WIRE_SCHEMA, ensure_landing

    register_cdc_wire(spark)
    landing = ensure_landing(spark, sf_dir)
    out = str(tmp_path / "sink")
    os.makedirs(out)
    ckpt = str(tmp_path / "ckpt")
    wire = (
        spark.readStream.schema(WIRE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .json(landing)
        .selectExpr("partitionKey", "data")
    )
    q = (
        wire.writeStream.format("cdc_wire")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # 16 landing files / 8 per trigger -> 2 committed epochs
    markers = [f for f in os.listdir(out) if f.endswith("_COMMITTED")]
    assert len(markers) == 2
    back = spark.read.format("cdc_wire").option("path", out).load()
    want = spark.read.schema(WIRE_SCHEMA).json(landing).count()
    assert back.count() == want

    # replaying a committed batchId must be a no-op (marker short-circuit)
    w = _WireStreamWriter({"path": out}, overwrite=False)
    staged_dir = os.path.join(out, "_staged")
    os.makedirs(staged_dir, exist_ok=True)
    ghost = os.path.join(staged_dir, "ghost.staged")
    with open(ghost, "w") as f:
        f.write('{"partitionKey": "x", "data": "ZmFrZQ=="}\n')
    n_before = len([f for f in os.listdir(out) if f.endswith(".json")])
    w.commit([_WireCommit(staged=ghost, records=1, put_batches=1)], batchId=0)
    n_after = len([f for f in os.listdir(out) if f.endswith(".json")])
    assert n_after == n_before  # nothing republished
    assert not os.path.exists(ghost)  # re-staged duplicate discarded


def test_reader_corrupt_policy(spark, sf_dir, tmp_path):
    """Default: a poisoned landing line fails the read loudly;
    corrupt_policy=skip drops it and delivers the rest."""
    from sfdc_cdc_aws_spark.sources.live import register_cdc_wire

    register_cdc_wire(spark)
    out = str(tmp_path / "landing")
    os.makedirs(out)
    _wire_slice(spark, sf_dir).write.format("cdc_wire").mode("append").option(
        "path", out
    ).save()
    good = spark.read.format("cdc_wire").option("path", out).load().count()
    # poison one file with junk + a record missing its data field
    victim = sorted(f for f in os.listdir(out) if f.endswith(".json"))[0]
    with open(os.path.join(out, victim), "a") as f:
        f.write("this is not json\n")
        f.write('{"partitionKey": "x"}\n')

    with pytest.raises(Exception):
        spark.read.format("cdc_wire").option("path", out).load().count()

    skipped = (
        spark.read.format("cdc_wire")
        .option("path", out)
        .option("corrupt_policy", "skip")
        .load()
        .count()
    )
    assert skipped == good


def test_second_append_adds_instead_of_clobbering(spark, sf_dir, tmp_path):
    """Two mode('append') writes must ACCUMULATE — publish names are
    per-commit unique, so a second job can never os.replace over the
    first publish's files."""
    from sfdc_cdc_aws_spark.sources.live import register_cdc_wire

    register_cdc_wire(spark)
    out = str(tmp_path / "landing")
    os.makedirs(out)
    a = _wire_slice(spark, sf_dir, mod=13)
    b = _wire_slice(spark, sf_dir, mod=26)
    a.write.format("cdc_wire").mode("append").option("path", out).save()
    b.write.format("cdc_wire").mode("append").option("path", out).save()
    back = spark.read.format("cdc_wire").option("path", out).load()
    assert back.count() == a.count() + b.count()


def _fake_wire_row(i):
    """A minimal valid wire record: base64(JSON envelope) with a
    replayId — what _scan_file insists on."""
    import base64 as _b64
    import json as _json
    import types as _types

    env = _json.dumps({"event": {"replayId": int(i)}, "payload": {"Id": f"x{i}"}})
    return _types.SimpleNamespace(
        partitionKey=f"pk{i}", data=_b64.b64encode(env.encode()).decode()
    )


def test_concurrent_writers_isolated_stages(tmp_path):
    """Round-5 ADVICE: two interleaved jobs (e.g. a batch append racing
    the stream sink) must not delete each other's in-flight staged
    files.  w1 commits while w2 is mid-flight; w2's stage survives and
    its commit publishes — no innocent-job os.replace failure."""
    from sfdc_cdc_aws_spark.sources.live import _WireBatchWriter, _scan_landing

    Row = _fake_wire_row

    out = str(tmp_path / "landing")
    os.makedirs(out)
    w1 = _WireBatchWriter({"path": out}, overwrite=False)
    w2 = _WireBatchWriter({"path": out}, overwrite=False)
    m1 = w1.write(iter([Row(i) for i in range(5)]))
    m2 = w2.write(iter([Row(i) for i in range(100, 103)]))
    w1.commit([m1])  # must clean ONLY w1's stage
    assert os.path.exists(m2.staged), "w1.commit deleted w2's staged file"
    w2.commit([m2])  # succeeds: both publishes land
    assert len(_scan_landing(out)) == 8
    # and an abort on a third writer leaves the landing dir untouched
    w3 = _WireBatchWriter({"path": out}, overwrite=False)
    m3 = w3.write(iter([Row(7)]))
    w3.abort([m3])
    assert len(_scan_landing(out)) == 8


def test_overwrite_commit_publishes_before_deleting(tmp_path, monkeypatch):
    """Round-5 ADVICE: overwrite must rename the new publish in FIRST
    and delete the old one after — a crash mid-commit leaves old+new
    (retryable), never an empty landing dir.  Simulated by crashing
    the commit right after the publish loop (before old-file removal):
    both publishes visible; the delete-old phase never ran."""
    from sfdc_cdc_aws_spark.sources.live import _WireBatchWriter, _scan_landing

    Row = _fake_wire_row

    out = str(tmp_path / "landing")
    os.makedirs(out)
    w0 = _WireBatchWriter({"path": out}, overwrite=False)
    w0.commit([w0.write(iter([Row(i) for i in range(4)]))])
    assert len(_scan_landing(out)) == 4

    w1 = _WireBatchWriter({"path": out}, overwrite=True)
    m1 = w1.write(iter([Row(i) for i in range(10, 13)]))
    real_remove = os.remove
    calls = {"n": 0}

    def crashing_remove(p):
        calls["n"] += 1
        raise RuntimeError("simulated crash before delete-old phase")

    monkeypatch.setattr(os, "remove", crashing_remove)
    with pytest.raises(RuntimeError):
        w1.commit([m1])
    monkeypatch.setattr(os, "remove", real_remove)
    # the new publish landed BEFORE the crash: never an empty dir
    assert len(_scan_landing(out)) == 7  # old 4 + new 3, retry cleans up
    # a clean retry-style overwrite converges to new-only
    w2 = _WireBatchWriter({"path": out}, overwrite=True)
    w2.commit([w2.write(iter([Row(i) for i in range(10, 13)]))])
    assert len(_scan_landing(out)) == 3


def test_concurrent_overwrites_serialize_to_one_publish(tmp_path, monkeypatch):
    """Round-6 ADVICE: two OVERWRITE commits racing one landing dir
    must serialize — without the commit flock each snapshots a
    `previous` missing the other's files and the UNION of both
    publishes stays visible forever.  The race is forced: os.listdir
    on the landing dir stalls after reading, so unserialized commits
    would overlap deterministically."""
    import threading
    import time as _time

    from sfdc_cdc_aws_spark.sources.live import _WireBatchWriter, _scan_landing

    Row = _fake_wire_row
    out = str(tmp_path / "landing")
    os.makedirs(out)
    w0 = _WireBatchWriter({"path": out}, overwrite=False)
    w0.commit([w0.write(iter([Row(i) for i in range(4)]))])

    real_listdir = os.listdir

    def stalling_listdir(path="."):
        names = real_listdir(path)
        if str(path) == out:
            _time.sleep(0.4)  # widen the snapshot→publish window
        return names

    monkeypatch.setattr(os, "listdir", stalling_listdir)
    wa = _WireBatchWriter({"path": out}, overwrite=True)
    wb = _WireBatchWriter({"path": out}, overwrite=True)
    ma = wa.write(iter([Row(i) for i in range(10, 13)]))
    mb = wb.write(iter([Row(i) for i in range(20, 23)]))
    errs = []

    def run(w, m):
        try:
            w.commit([m])
        except Exception as e:  # pragma: no cover - surfaced below
            errs.append(e)

    ta = threading.Thread(target=run, args=(wa, ma))
    tb = threading.Thread(target=run, args=(wb, mb))
    ta.start(), tb.start()
    ta.join(), tb.join()
    monkeypatch.undo()
    assert errs == [], errs

    visible = sorted(f for f in os.listdir(out) if f.endswith(".json"))
    jobs = {f.split("-")[1] for f in visible}
    assert jobs in ({wa.job}, {wb.job}), (
        f"concurrent overwrites left {visible} — the union anomaly"
    )
    assert len(_scan_landing(out)) == 3  # exactly one 3-row publish


# ---------------------------------------------------------------------------
# the reference's whole job, end to end, as one assertion
# ---------------------------------------------------------------------------


def test_bus_to_wire_to_occ_merge_end_to_end(spark, tmp_path, monkeypatch):
    """Round-7 verdict item 5 — the reference's ENTIRE pipeline
    (README.md:3-26: subscribe the bus, land the wire, parse, keep
    the latest snapshot) driven as ONE flow with both failure seams
    injected: the REAL Bayeux long-poll client drains a scripted bus
    into the wire landing, the token is revoked MID-DRAIN (the client
    must reauth and resume from its stored replayId with no loss and
    no redelivery), Structured Streaming parses the landing in
    micro-batches into the OCC merge, and the writer is killed
    BETWEEN COMMIT AND PUBLISH of an intermediate epoch (readers must
    stay on the published epoch; the restarted stream must recover
    the orphan). Final assertion: the PUBLISHED state equals the
    batch latest-per-key over exactly the served prefix."""
    import base64
    import json as _json

    import sfdc_cdc_aws_spark.streaming.merge as merge_mod
    from sfdc_cdc_aws_spark.sources.bayeux import BayeuxConnector
    from sfdc_cdc_aws_spark.sources.bayeux_testing import ScriptedBayeuxServer
    from sfdc_cdc_aws_spark.sources.cdc_feed import envelopes
    from sfdc_cdc_aws_spark.streaming.job import WIRE_SCHEMA, changes_stream
    from sfdc_cdc_aws_spark.streaming.merge import IncrementalSnapshot

    from pyspark.sql import functions as F

    CUT = 500
    topic = "/data/ChangeEvents"
    served = [
        _json.loads(base64.b64decode(r["wire"]))
        for r in envelopes(spark, SF)
        .where(F.col("envelope.event.replayId") <= CUT)
        .orderBy("envelope.event.replayId")
        .select("wire")
        .collect()
    ]
    landing = str(tmp_path / "landing")

    # -- bus -> wire, with a mid-drain token revocation ----------------
    tokens = {"current": "t0", "reauths": 0}

    def provider(reauth: bool) -> str:
        if reauth:
            tokens["reauths"] += 1
            tokens["current"] = "t1"
        return tokens["current"]

    with ScriptedBayeuxServer(served, batch=100, token="t0") as srv:
        client = BayeuxConnector(srv.url, provider)
        client.start()
        client.subscribe_earliest(topic, lambda d: None)
        landed = client.drain_to(landing, topic, max_polls=2)
        assert 0 < landed < CUT  # genuinely mid-stream
        srv.valid_tokens = {"t1"}  # revoke the live token
        # the 401 poll reauths and delivers nothing; the next drain
        # resumes from the client's stored replayId
        assert client.drain_to(landing, topic) == 0
        landed += client.drain_to(landing, topic)
        replay_pos = client.last_replay_id(topic)
        client.stop()
    assert landed == len(served), f"loss/redelivery across reauth: {landed}"
    assert tokens["reauths"] == 1 and client.stats["reconnects"] == 1
    assert replay_pos == CUT  # cursor sits at the served tip (max replayId)

    # -- wire -> streaming parse -> OCC merge, crash mid-commit --------
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    snap = IncrementalSnapshot(spark, state)
    real_publish = IncrementalSnapshot._publish
    calls = {"n": 0}

    def dying_publish(self, epoch, audit):
        calls["n"] += 1
        if calls["n"] == 2:  # epoch 1: committed, then die pre-publish
            raise OSError("injected crash between commit and publish")
        return real_publish(self, epoch, audit)

    monkeypatch.setattr(IncrementalSnapshot, "_publish", dying_publish)
    q = snap.attach(changes_stream(spark, landing, max_files_per_trigger=2), ckpt)
    with pytest.raises(Exception, match="injected crash"):
        q.awaitTermination()

    # torn window: epoch 1 fully committed on disk, manifest still 0,
    # and a reader sees ONLY the published epoch
    import json as _json2

    assert os.path.exists(os.path.join(snap._epoch_dir(1), "_SUCCESS"))
    assert _json2.load(open(snap._manifest_path))["epoch"] == 0
    epoch0_keys = snap.current().count()

    # -- restart: checkpoint replays the torn batch, orphan recovered --
    monkeypatch.setattr(IncrementalSnapshot, "_publish", real_publish)
    q2 = snap.attach(changes_stream(spark, landing, max_files_per_trigger=2), ckpt)
    q2.awaitTermination()

    manifest = _json2.load(open(snap._manifest_path))
    assert manifest["epoch"] >= 2  # orphan published + replay landed
    assert snap.current().count() >= epoch0_keys

    # -- the one assertion: published state == batch over the prefix --
    cols = ["entity_name", "record_id", "change_type", "commit_ts_ms", "replay_id"]
    wire = spark.read.schema(WIRE_SCHEMA).json(landing)
    # the consumer view drops keys whose LATEST change is a DELETE
    # tombstone (current() semantics) — the batch reference must too
    ref = merge_mod._latest_per_key(parse_wire(wire)).where(
        F.col("change_type") != "DELETE"
    )
    got = sorted(tuple(r) for r in snap.current().select(*cols).collect())
    want = sorted(tuple(r) for r in ref.select(*cols).collect())
    assert got == want
