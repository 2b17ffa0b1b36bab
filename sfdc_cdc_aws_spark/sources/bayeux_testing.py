"""Deterministic in-process CometD bus for the live-edge roundtrip.

The same stand-in pattern as :func:`live.snapshot_fetcher` (the SOQL
REST fetcher answered from a local snapshot): a scripted Bayeux
server over ``http.server`` that serves a FIXED event sequence with
the replay semantics of the real bus — earliest/-2, tip/-1, resume
from a concrete replayId, batched long-poll delivery. It exists so
the full client stack (sources/bayeux.py: handshake → subscribe →
long-poll → replay bookkeeping) can be driven end-to-end inside a
registered query and hash-checked against the DuckDB oracle; a
deployment swaps the URL for the real endpoint and changes nothing
else.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from sfdc_cdc_aws_spark.sources.bayeux import (
    REPLAY_FROM_EARLIEST,
    REPLAY_FROM_TIP,
)


class ScriptedBayeuxServer:
    """Serves ``events`` (envelope dicts carrying event.replayId, in
    replay order) on a random localhost port; ``batch`` events per
    long poll. Use as a context manager.

    ``events`` may also be a ``dict[topic, list]`` — the real bus's
    per-object CDC channels, each with its OWN independent replay
    sequence (a subscribe to an unknown topic then serves nothing).
    The flat-list form keeps the original behavior: every topic
    serves the same sequence."""

    def __init__(
        self,
        events: list[dict] | dict[str, list[dict]],
        batch: int = 100,
        token: str = "tok",
    ):
        self._by_topic = events if isinstance(events, dict) else None
        self.events = (
            [e for seq in events.values() for e in seq]
            if isinstance(events, dict)
            else events
        )
        self.batch = batch
        self.valid_tokens = {token}
        self.cursors: dict[str, int] = {}
        self._client_seq = 0
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):
                pass

            def do_POST(self):
                body = self.rfile.read(int(self.headers["Content-Length"]))
                if self.headers.get("Authorization", "") not in outer.valid_tokens:
                    self.send_response(401)
                    self.end_headers()
                    return
                out = []
                for m in json.loads(body):
                    out.extend(outer._handle(m))
                payload = json.dumps(out).encode()
                self.send_response(200)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)

        self.httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
        self.url = f"http://127.0.0.1:{self.httpd.server_port}/cometd/44.0"
        self._thread = threading.Thread(target=self.httpd.serve_forever, daemon=True)

    def __enter__(self) -> "ScriptedBayeuxServer":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.httpd.shutdown()

    def _events_for(self, topic: str) -> list[dict]:
        if self._by_topic is None:
            return self.events
        return self._by_topic.get(topic, [])

    def _handle(self, m: dict) -> list[dict]:
        ch = m["channel"]
        if ch == "/meta/handshake":
            self._client_seq += 1
            return [
                {
                    "channel": ch,
                    "successful": True,
                    "clientId": f"c{self._client_seq}",
                    "ext": {"replay": True},
                    "id": m.get("id"),
                }
            ]
        if ch == "/meta/subscribe":
            topic = m["subscription"]
            rf = m["ext"]["replay"][topic]
            seq = self._events_for(topic)
            if rf == REPLAY_FROM_EARLIEST:
                cursor = -(10**18)  # before any replayId
            elif rf == REPLAY_FROM_TIP:
                cursor = seq[-1]["event"]["replayId"] if seq else 0
            else:
                cursor = int(rf)
            self.cursors[f"{m['clientId']}:{topic}"] = cursor
            return [{"channel": ch, "successful": True, "id": m.get("id")}]
        if ch == "/meta/connect":
            out = [{"channel": ch, "successful": True, "id": m.get("id")}]
            for key, cursor in list(self.cursors.items()):
                cid, topic = key.split(":", 1)
                if cid != m["clientId"]:
                    continue
                batch = [
                    e
                    for e in self._events_for(topic)
                    if e["event"]["replayId"] > cursor
                ][: self.batch]
                out.extend({"channel": topic, "data": e} for e in batch)
                if batch:
                    self.cursors[key] = batch[-1]["event"]["replayId"]
            return out
        if ch == "/meta/disconnect":
            return [{"channel": ch, "successful": True, "id": m.get("id")}]
        return [{"channel": ch, "successful": False, "error": "404::unsupported"}]
