"""Live-socket legs of the transports (VERDICT r10 item 4).

The container has no MQTT broker, no paho/websocket-client — but the
TTN v3 SSE leg needs only `requests` (present) and an HTTP server, so
that callback->queue->poll path runs FOR REAL here against a stdlib
server speaking the actual SSE protocol (streaming POST, Authorization
header, identifiers body, blank-line-delimited events, reconnect after
server close). The MQTT/WebSocket queue halves run through
put_evict_oldest directly.

Residual gates (exact missing dependency, per transport):
- MqttTransport.connect/close: needs `paho-mqtt` (not in container;
  ImportError in __init__ names it) + a broker socket.
- TTNv2WebSocketTransport.connect: needs `websocket-client` (not in
  container; ImportError in __init__ names it); its HTTP session half
  (login/token/refresh) is local-server tested in test_ttn_v2_session.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from rolaguard_data_collectors_spark.sources.transports import (
    RawMessage,
    TTNv3Config,
    TTNv3SseTransport,
    put_evict_oldest,
)


class _SseHandler(BaseHTTPRequestHandler):
    """Minimal TTN v3 /api/v3/events endpoint: validates the request
    the transport is contractually supposed to send, then streams
    blank-line-delimited SSE events."""

    seen: list[dict] = []
    events_per_conn = 3
    conns = 0

    def do_POST(self):  # noqa: N802 (stdlib naming)
        cls = type(self)
        cls.conns += 1
        body = json.loads(
            self.rfile.read(int(self.headers["Content-Length"]))
        )
        cls.seen.append(
            {
                "path": self.path,
                "auth": self.headers.get("Authorization"),
                "body": body,
            }
        )
        self.send_response(200)
        self.send_header("Content-Type", "text/event-stream")
        self.end_headers()
        base = (cls.conns - 1) * cls.events_per_conn
        for i in range(cls.events_per_conn):
            evt = json.dumps(
                {"result": {"name": "gs.up.receive", "seq": base + i}}
            )
            self.wfile.write((evt + "\n\n").encode())
            self.wfile.flush()
        # connection closes here -> the transport's reconnect loop
        # must open a new stream until close() stops it

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture()
def sse_server():
    _SseHandler.seen = []
    _SseHandler.conns = 0
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _SseHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()
    srv.server_close()


def test_ttn_v3_sse_live_roundtrip(sse_server):
    """The real connect(): requests streaming POST against a live
    socket, SSE split on blank lines, events land in the queue, poll
    drains, reconnect happens after the server ends a stream, close()
    stops the loop."""
    tr = TTNv3SseTransport(
        TTNv3Config(
            base_url=sse_server,
            gateway_ids=("gw-a", "gw-b"),
            api_key="secret-key",
        )
    )
    tr.connect()
    got: list[RawMessage] = []
    deadline = time.monotonic() + 15
    while len(got) < 7 and time.monotonic() < deadline:
        got.extend(tr.poll(max_records=10))
        time.sleep(0.02)
    tr.close()
    assert len(got) >= 7, f"only {len(got)} events before timeout"
    # protocol fidelity: the request the reference sends
    req = _SseHandler.seen[0]
    assert req["path"] == "/api/v3/events"
    assert req["auth"] == "Bearer secret-key"
    assert req["body"] == {
        "identifiers": [
            {"gateway_ids": {"gateway_id": "gw-a"}},
            {"gateway_ids": {"gateway_id": "gw-b"}},
        ]
    }
    # events parsed whole and in order per connection
    seqs = [json.loads(m.value)["result"]["seq"] for m in got]
    assert seqs == sorted(seqs)
    assert _SseHandler.conns >= 2, "no reconnect after stream end"
    # close() stops the reconnect loop: no new connections after drain
    time.sleep(0.3)
    conns_after_close = _SseHandler.conns
    time.sleep(0.5)
    assert _SseHandler.conns == conns_after_close


def test_put_evict_oldest_backpressure():
    """The MQTT/WebSocket callback-thread enqueue half: full queue
    evicts oldest, newest always lands, losses counted."""
    q: queue.Queue = queue.Queue(maxsize=3)
    dropped = 0
    for i in range(7):
        dropped += put_evict_oldest(q, RawMessage("t", str(i), i))
    assert dropped == 4
    assert [q.get_nowait().value for _ in range(3)] == ["4", "5", "6"]


def test_put_evict_oldest_no_drop_when_space():
    q: queue.Queue = queue.Queue(maxsize=10)
    assert put_evict_oldest(q, RawMessage("t", "x", 0)) == 0
    assert q.qsize() == 1
