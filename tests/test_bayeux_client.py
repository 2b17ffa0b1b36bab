"""BayeuxConnector against a real in-process HTTP server.

The scripted server speaks enough Bayeux to exercise every behavior
the reference's EmpConnector implements: handshake with the replay
extension, per-topic replay positions (-2/-1/concrete), long-poll
event delivery, 401/403 auth failover with token invalidation, and
the replayId-resume guarantee (no loss, no redelivery) across a
forced reconnect.  SOAP login is tested with an injected transport.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from sfdc_cdc_aws_spark.sources.bayeux import (
    REPLAY_FROM_EARLIEST,
    REPLAY_FROM_TIP,
    BayeuxConnector,
    BayeuxError,
    CannotSubscribe,
    LoginError,
    login_token_provider,
    parse_login_response,
    soap_login,
)

TOPIC = "/data/AccountChangeEvent"
BATCH = 3  # events per connect poll


def _event(rid):
    return {
        "schema": "fixture",
        "payload": {
            "ChangeEventHeader": {
                "entityName": "Account",
                "changeType": "UPDATE",
                "commitTimestamp": 1000 + rid,
                "recordIds": [f"00D{rid:015d}"],
            },
            "fields": {"value": str(rid)},
        },
        "event": {"replayId": rid},
    }


class _BayeuxServer:
    """Scripted CometD stand-in: threads + stdlib http.server only."""

    def __init__(self, n_events=10, replay_supported=True):
        self.events = [_event(i + 1) for i in range(n_events)]
        self.replay_supported = replay_supported
        self.valid_tokens = {"token-0"}
        self.fail_next_connects = 0  # respond HTTP 403 this many times
        self.refuse_subscribe = False
        self.cursors: dict[str, int] = {}  # clientId:topic -> replay cursor
        self.log: list[str] = []
        self._client_seq = 0
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_POST(self):
                body = self.rfile.read(int(self.headers["Content-Length"]))
                token = self.headers.get("Authorization", "")
                if token not in outer.valid_tokens:
                    self.send_response(401)
                    self.end_headers()
                    return
                msgs = json.loads(body)
                out = []
                for m in msgs:
                    res = outer.handle(m, self)
                    if res is None:  # handler already wrote an HTTP error
                        return
                    out.extend(res)
                payload = json.dumps(out).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_port}/cometd/44.0"
        self.thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)
        self.thread.start()

    def stop(self):
        self.httpd.shutdown()

    # -- per-message scripting --------------------------------------------

    def handle(self, m, http):
        ch = m["channel"]
        self.log.append(ch)
        if ch == "/meta/handshake":
            self._client_seq += 1
            resp = {
                "channel": ch,
                "successful": True,
                "clientId": f"c{self._client_seq}",
                "id": m.get("id"),
            }
            if self.replay_supported:
                resp["ext"] = {"replay": True}
            return [resp]
        if ch == "/meta/subscribe":
            if self.refuse_subscribe:
                return [
                    {
                        "channel": ch,
                        "successful": False,
                        "error": "402::replay not enabled",
                        "id": m.get("id"),
                    }
                ]
            topic = m["subscription"]
            replay_from = m["ext"]["replay"][topic]
            self.log.append(f"subscribe@{replay_from}")
            if replay_from == REPLAY_FROM_EARLIEST:
                cursor = 0
            elif replay_from == REPLAY_FROM_TIP:
                cursor = len(self.events)
            else:
                cursor = int(replay_from)
            self.cursors[f"{m['clientId']}:{topic}"] = cursor
            return [{"channel": ch, "successful": True, "id": m.get("id")}]
        if ch == "/meta/connect":
            if self.fail_next_connects > 0:
                self.fail_next_connects -= 1
                http.send_response(403)
                http.end_headers()
                return None  # HTTP-level failure; nothing else written
            out = [{"channel": ch, "successful": True, "id": m.get("id")}]
            for key, cursor in list(self.cursors.items()):
                cid, topic = key.split(":", 1)
                if cid != m["clientId"]:
                    continue
                batch = [e for e in self.events if e["event"]["replayId"] > cursor][
                    :BATCH
                ]
                for e in batch:
                    out.append({"channel": topic, "data": e})
                if batch:
                    self.cursors[key] = batch[-1]["event"]["replayId"]
            return out
        if ch == "/meta/disconnect":
            return [{"channel": ch, "successful": True, "id": m.get("id")}]
        raise AssertionError(f"unscripted channel {ch}")


@pytest.fixture()
def server():
    s = _BayeuxServer()
    yield s
    s.stop()


def _tokens(server, fresh_prefix="token"):
    """Token provider: serves token-0; a reauth mints token-<n> and
    registers it as the only valid one (the old session is dead)."""
    calls = {"fresh": 0}

    def provider(reauthenticate):
        if reauthenticate:
            calls["fresh"] += 1
            t = f"{fresh_prefix}-{calls['fresh']}"
            server.valid_tokens = {t}
            provider.current = t
        return provider.current

    provider.current = "token-0"
    provider.calls = calls
    return provider


def test_earliest_delivers_all_in_order(server):
    got = []
    c = BayeuxConnector(server.url, _tokens(server))
    c.start()
    assert c.replay_supported
    c.subscribe_earliest(TOPIC, lambda d: got.append(d["event"]["replayId"]))
    while c.poll_once():
        pass
    assert got == list(range(1, 11))
    assert c.last_replay_id(TOPIC) == 10
    c.stop()


def test_resume_from_concrete_replay_id(server):
    got = []
    c = BayeuxConnector(server.url, _tokens(server))
    c.start()
    c.subscribe(TOPIC, 7, lambda d: got.append(d["event"]["replayId"]))
    while c.poll_once():
        pass
    assert got == [8, 9, 10]


def test_tip_sees_only_new_events(server):
    got = []
    c = BayeuxConnector(server.url, _tokens(server))
    c.start()
    c.subscribe_tip(TOPIC, lambda d: got.append(d["event"]["replayId"]))
    assert c.poll_once() == []
    server.events.append(_event(11))  # the bus moves on
    while c.poll_once():
        pass
    assert got == [11]


def test_auth_failover_resumes_without_loss_or_redelivery(server):
    """The EmpConnector guarantee: a 403 mid-stream (token revoked)
    triggers reauth + re-handshake + resubscribe FROM THE LAST SEEN
    REPLAY ID — every event delivered exactly once."""
    got = []
    provider = _tokens(server)
    c = BayeuxConnector(server.url, provider)
    c.start()
    c.subscribe_earliest(TOPIC, lambda d: got.append(d["event"]["replayId"]))
    assert [d["event"]["replayId"] for d in c.poll_once()] == [1, 2, 3]
    # the session dies: the server 403s the next long poll; the
    # provider must mint a FRESH token (the old one is revoked by the
    # reauth — _tokens() swaps valid_tokens) and the client must
    # re-handshake + resubscribe from the last seen replayId
    server.fail_next_connects = 1
    assert c.poll_once() == []  # the failed poll performs the failover
    assert c.stats["reconnects"] == 1
    assert provider.calls["fresh"] == 1
    while c.poll_once():
        pass
    assert got == list(range(1, 11))  # nothing lost, nothing doubled
    assert "subscribe@3" in server.log  # resubscribed from last seen id


def test_double_subscribe_rejected(server):
    c = BayeuxConnector(server.url, _tokens(server))
    c.start()
    c.subscribe_earliest(TOPIC, lambda d: None)
    with pytest.raises(BayeuxError, match="already subscribed"):
        c.subscribe(TOPIC + "?fields=All", 5, lambda d: None)


def test_subscribe_refusal_raises_cannot_subscribe(server):
    server.refuse_subscribe = True
    c = BayeuxConnector(server.url, _tokens(server))
    c.start()
    with pytest.raises(CannotSubscribe, match="replay not enabled"):
        c.subscribe_earliest(TOPIC, lambda d: None)


def test_no_replay_support_records_nothing():
    s = _BayeuxServer(replay_supported=False)
    try:
        c = BayeuxConnector(s.url, _tokens(s))
        c.start()
        assert not c.replay_supported
        c.subscribe_earliest(TOPIC, lambda d: None)
        c.poll_once()
        # ReplayExtension.rcv: without handshake support, no tracking
        assert c.last_replay_id(TOPIC) is None
    finally:
        s.stop()


def test_drain_to_feeds_the_cdc_wire_pipeline(server, spark, tmp_path):
    """Live edge → Spark: the drained landing is readable by the
    cdc_wire DataSource AND by parse_wire — the full bridge from a
    long-poll subscription to the engine's change feed."""
    from sfdc_cdc_aws_spark.sources.live import register_cdc_wire
    from sfdc_cdc_aws_spark.streaming.job import WIRE_SCHEMA, parse_wire

    c = BayeuxConnector(server.url, _tokens(server))
    c.start()
    c.subscribe_earliest(TOPIC, lambda d: None)
    landing = str(tmp_path / "live_landing")
    n = c.drain_to(landing, TOPIC)
    assert n == 10

    register_cdc_wire(spark)
    wire = spark.read.format("cdc_wire").option("path", landing).load()
    assert wire.count() == 10
    assert [r["replay_id"] for r in wire.orderBy("replay_id").collect()] == list(
        range(1, 11)
    )
    parsed = parse_wire(spark.read.schema(WIRE_SCHEMA).json(landing))
    assert parsed.count() == 10
    assert set(parsed.select("entity_name").distinct().toPandas()["entity_name"]) == {
        "Account"
    }


# ---------------------------------------------------------------------------
# SOAP login
# ---------------------------------------------------------------------------

OK_XML = b"""<?xml version="1.0" encoding="UTF-8"?>
<soapenv:Envelope xmlns:soapenv="http://schemas.xmlsoap.org/soap/envelope/">
 <soapenv:Body><loginResponse xmlns="urn:partner.soap.sforce.com"><result>
  <serverUrl>https://na1.example.com:8443/services/Soap/u/44.0/00Dx</serverUrl>
  <sessionId>SESSION123</sessionId>
 </result></loginResponse></soapenv:Body></soapenv:Envelope>"""

FAULT_XML = b"""<?xml version="1.0"?>
<soapenv:Envelope xmlns:soapenv="http://schemas.xmlsoap.org/soap/envelope/">
 <soapenv:Body><soapenv:Fault>
  <faultcode>INVALID_LOGIN</faultcode>
  <faultstring>INVALID_LOGIN: bad credentials</faultstring>
 </soapenv:Fault></soapenv:Body></soapenv:Envelope>"""


def test_soap_login_derives_cometd_endpoint():
    seen = {}

    def transport(url, body, headers):
        seen["url"], seen["body"], seen["headers"] = url, body, headers
        return OK_XML

    out = soap_login("https://login.example.com", "u@x.com", "pw<&>", transport=transport)
    assert out["session_id"] == "SESSION123"
    assert out["cometd_endpoint"] == "https://na1.example.com:8443/cometd/44.0"
    assert seen["url"].endswith("/services/Soap/u/44.0/")
    assert seen["headers"]["SOAPAction"] == "''"
    assert b"pw&lt;&amp;&gt;" in seen["body"]  # credentials escaped


def test_soap_login_old_api_uses_replay_path():
    out = soap_login(
        "https://login.example.com", "u", "p", version="36.0",
        transport=lambda *a: OK_XML.replace(b"44.0", b"36.0"),
    )
    assert out["cometd_endpoint"].endswith("/cometd/replay/36.0")


def test_soap_login_fault_raises_with_faultstring():
    with pytest.raises(LoginError, match="INVALID_LOGIN: bad credentials"):
        soap_login("https://l", "u", "p", transport=lambda *a: FAULT_XML)


def test_login_response_rejects_dtd():
    with pytest.raises(LoginError, match="DTD"):
        parse_login_response(b"<!DOCTYPE foo [<!ENTITY x 'y'>]><a>&x;</a>")


def test_login_token_provider_reauths_fresh():
    calls = {"n": 0}

    def transport(url, body, headers):
        calls["n"] += 1
        return OK_XML.replace(b"SESSION123", b"S%d" % calls["n"])

    p = login_token_provider("https://l", "u", "p", transport=transport)
    assert p(False) == "S1"
    assert p(False) == "S1"  # cached
    assert p(True) == "S2"  # reauthenticate = fresh login
    assert calls["n"] == 2


def test_cdc_bayeux_streaming_source(server, spark, tmp_path):
    """readStream.format("cdc_bayeux"): the live client as a
    Structured Streaming source. The availableNow drain consumes the
    bus down; a SECOND run on the same checkpoint must deliver ONLY
    events published after the committed replayId — Spark's offset
    log and the bus's replay capability composing into exactly-once."""
    import uuid

    from sfdc_cdc_aws_spark.sources.bayeux import register_cdc_bayeux

    register_cdc_bayeux(spark)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain() -> list[int]:
        before = {
            r["replay_id"]
            for r in (
                spark.read.parquet(out).collect() if os.path.exists(out) else []
            )
        }
        q = (
            spark.readStream.format("cdc_bayeux")
            .option("endpoint", server.url)
            .option("topic", TOPIC)
            .option("token", "token-0")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows = spark.read.parquet(out).collect()
        return sorted(r["replay_id"] for r in rows if r["replay_id"] not in before)

    assert drain() == list(range(1, 11))
    # the bus moves on while the query is down
    server.events.extend(_event(i) for i in (11, 12, 13))
    assert drain() == [11, 12, 13]  # resume from the checkpointed replayId

    # and the landed rows are the standard wire shape end to end
    from sfdc_cdc_aws_spark.streaming.job import WIRE_SCHEMA, parse_wire

    qname = f"bayeux_all_{uuid.uuid4().hex[:8]}"
    q = (
        spark.readStream.format("cdc_bayeux")
        .option("endpoint", server.url)
        .option("topic", TOPIC)
        .option("token", "token-0")
        .load()
        .select("partitionKey", "data")
        .writeStream.format("memory")
        .queryName(qname)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    parsed = parse_wire(spark.table(qname))
    assert parsed.count() == 13
    assert parsed.select("entity_name").distinct().collect()[0][0] == "Account"


def test_persistent_auth_failure_is_terminal_not_recursive(server):
    """Round-6 ADVICE: credentials that STAY invalid (revoked token,
    broken provider) must end in a terminal BayeuxError after a bounded
    number of reauth attempts — not unbounded handshake→subscribe→401
    mutual recursion hot-looping the auth endpoint."""
    c = BayeuxConnector(server.url, lambda reauth: "token-0", max_reauth=3)
    c.start()
    c.subscribe_earliest(TOPIC, lambda d: None)
    server.valid_tokens = set()  # every token (old AND freshly minted) dies
    with pytest.raises(BayeuxError, match="3 consecutive reauth attempts"):
        c.poll_once()
    assert c.stats["reconnects"] == 3  # the budget, exactly
    assert not c.running  # terminal: the caller must not keep polling


def test_reauth_budget_resets_after_recovery(server):
    """A transient auth blip must NOT eat into a permanent budget:
    failover succeeds mid-stream, polling continues, and the stream
    stays lossless — the budget bounds CONSECUTIVE failures only."""
    provider = _tokens(server)
    got = []
    c = BayeuxConnector(server.url, provider, max_reauth=2)
    c.start()
    c.subscribe_earliest(TOPIC, lambda d: got.append(d["event"]["replayId"]))
    c.poll_once()
    server.fail_next_connects = 1  # one transient 403, then healthy
    c.poll_once()
    while c.poll_once():
        pass
    assert got == list(range(1, 11))
    assert c.running


def test_stream_reader_skips_events_without_replay_id():
    """Round-6 ADVICE: an event with no replayId cannot be offset
    tracked; the streaming source's consumer must drop it instead of
    raising TypeError and killing the micro-batch."""
    from sfdc_cdc_aws_spark.sources.bayeux import (
        HAS_BAYEUX_DATASOURCE,
        _BayeuxSimpleStreamReader,
    )

    assert HAS_BAYEUX_DATASOURCE
    r = _BayeuxSimpleStreamReader({"endpoint": "http://unused", "topic": TOPIC})
    r._buffer = []
    r._consumer({"payload": {"x": 1}})  # no event envelope at all
    r._consumer({"payload": {"x": 2}, "event": {}})  # envelope, no replayId
    assert r._buffer == []
    # round-8 ADVICE: the drops are counted, never silent — and this
    # is deliberately stricter than the batch client, whose poll_once
    # DELIVERS such events (no replay contract to protect there)
    assert r.dropped_no_replay == 2
    r._consumer(_event(5))
    assert [t[0] for t in r._buffer] == [5]
    assert r.dropped_no_replay == 2


def test_dropped_no_replay_surfaces_in_client_stats():
    """Round-8 ADVICE: the drop counter must be visible OUTSIDE the
    reader instance — mirrored into the live client's ``stats`` dict
    beside polls/events/reconnects, so operators can see
    non-replayable loss without reaching into reader internals."""
    from sfdc_cdc_aws_spark.sources.bayeux import (
        BayeuxConnector,
        _BayeuxSimpleStreamReader,
    )

    r = _BayeuxSimpleStreamReader({"endpoint": "http://unused", "topic": TOPIC})
    r._buffer = []
    # every connector advertises the counter from birth
    c = BayeuxConnector("http://unused", lambda reauth: "")
    assert c.stats["dropped_no_replay"] == 0
    r._client = c
    r._consumer({"payload": {"x": 2}, "event": {}})  # no replayId
    r._consumer({"payload": {"x": 3}, "event": {}})
    assert r.dropped_no_replay == 2
    assert c.stats["dropped_no_replay"] == 2
    # with no live client (pre-connect) the counter still advances
    r._client = None
    r._consumer({"payload": {"x": 4}, "event": {}})
    assert r.dropped_no_replay == 3


def test_multi_topic_independent_replay_resume_across_failover():
    """Two topics with DISJOINT replay sequences: failover mid-drain
    must resume each topic from its OWN last-seen replayId — a client
    that resubscribed both from one shared position would redeliver
    on one topic and lose on the other."""
    from sfdc_cdc_aws_spark.sources.bayeux_testing import ScriptedBayeuxServer

    def _ev(rid, ent):
        return {
            "payload": {
                "ChangeEventHeader": {
                    "entityName": ent,
                    "changeType": "UPDATE",
                    "commitTimestamp": 1000 + rid,
                    "recordIds": [f"00D{rid:015d}"],
                }
            },
            "event": {"replayId": rid},
        }

    # topic A holds odd replayIds, topic B even — positions diverge
    topics = {
        "/data/AChangeEvent": [_ev(r, "A") for r in range(1, 20, 2)],
        "/data/BChangeEvent": [_ev(r, "B") for r in range(2, 21, 2)],
    }
    got = {t: [] for t in topics}
    with ScriptedBayeuxServer(topics, batch=2, token="t0") as srv:
        state = {"cur": "t0"}

        def provider(reauth):
            if reauth:
                state["cur"] = "t1"
                srv.valid_tokens = {"t1"}
            return state["cur"]

        c = BayeuxConnector(srv.url, provider)
        c.start()
        for t in topics:
            c.subscribe_earliest(t, (lambda b: lambda d: b.append(d))(got[t]))
        c.poll_once()  # 2 events per topic delivered
        before = {t: c.last_replay_id(t) for t in topics}
        assert before["/data/AChangeEvent"] == 3
        assert before["/data/BChangeEvent"] == 4
        srv.valid_tokens = {"t1"}  # revoke: next poll must fail over
        while sum(len(v) for v in got.values()) < 20:
            c.poll_once()
        c.stop()
    assert srv._client_seq >= 2  # handshake happened again
    for t, seq in topics.items():
        rids = [d["event"]["replayId"] for d in got[t]]
        assert rids == [e["event"]["replayId"] for e in seq], t
