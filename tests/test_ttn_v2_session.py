"""TTN v2 login/token-refresh flow (op 3, TTNCollector.py:304-355)
against a LOCAL fake console server — the upstream v2 console is
decommissioned, so the HTTP leg is exercised end-to-end here and the
WebSocket leg stays replay-based.

Covers: credential POST + console-cookie GET, access-token fetch,
the 15-min-early refresh schedule, token push to the socket, and the
3-strike reconnect."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from rolaguard_data_collectors_spark.sources.transports import (
    TTNv2Config,
    TTNv2Session,
)


class _FakeConsole(BaseHTTPRequestHandler):
    logins: list[dict] = []
    cookie_hits: list[str] = []
    refresh_calls = 0
    fail_refresh = False

    def log_message(self, *a):  # quiet
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        type(self).logins.append(body)
        ok = body.get("password") == "secret"
        self.send_response(200 if ok else 401)
        self.end_headers()
        self.wfile.write(b"{}")

    def do_GET(self):
        cls = type(self)
        if self.path == "/login":
            cls.cookie_hits.append(self.headers.get("Cookie") or "")
            self.send_response(200)
            self.send_header("Set-Cookie", "console_session=abc123")
            self.end_headers()
            self.wfile.write(b"ok")
            return
        if self.path == "/refresh":
            cls.refresh_calls += 1
            if cls.fail_refresh:
                self.send_response(503)
                self.end_headers()
                self.wfile.write(b"{}")
                return
            self.send_response(200)
            self.end_headers()
            self.wfile.write(
                json.dumps(
                    {"access_token": f"tok-{cls.refresh_calls}",
                     "expires": 1_700_000_000_000}
                ).encode()
            )
            return
        self.send_response(404)
        self.end_headers()


@pytest.fixture()
def console():
    _FakeConsole.logins = []
    _FakeConsole.cookie_hits = []
    _FakeConsole.refresh_calls = 0
    _FakeConsole.fail_refresh = False
    srv = HTTPServer(("127.0.0.1", 0), _FakeConsole)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_port}"
    yield base
    srv.shutdown()


def _config(base: str) -> TTNv2Config:
    return TTNv2Config(
        account_login_url=f"{base}/api/v2/users/login",
        login_url=f"{base}/login",
        access_token_url=f"{base}/refresh",
        user="u@example.org",
        password="secret",
    )


def test_login_and_token_fetch(console):
    ses = TTNv2Session(_config(console))
    assert ses.login() is True
    assert _FakeConsole.logins == [{"username": "u@example.org", "password": "secret"}]
    data = ses.fetch_access_token()
    assert data["access_token"] == "tok-1"
    assert data["expires"] == 1_700_000_000_000


def test_login_failure_is_reported(console):
    cfg = _config(console)
    cfg.password = "wrong"
    ses = TTNv2Session(cfg)
    assert ses.login() is False
    # the console GET still ran (reference does it unconditionally)
    assert len(_FakeConsole.cookie_hits) == 1


def test_refresh_loop_pushes_tokens_on_schedule(console):
    """First expiry honored (refresh starts 15 min early), each
    refresh pushes the token to the socket, loop exits on close."""
    ses = TTNv2Session(_config(console))
    assert ses.login()
    sent: list[str] = []
    clock_now = [1_700_000_000_000 / 1000 - 1800]  # 30 min before expiry
    closed = [False]

    def clock():
        return clock_now[0]

    def sleeper(s):
        clock_now[0] += s  # fast-forward instead of sleeping

    def send(tok):
        sent.append(tok)
        closed[0] = len(sent) >= 2  # stop the loop after two pushes

    ses.refresh_loop(
        send_token=send,
        is_closed=lambda: closed[0],
        first_expires_ms=1_700_000_000_000,
        clock=clock,
        sleeper=sleeper,
    )
    # refresh fired once the 15-min-early deadline passed, then again
    # on the next (same-expiry) deadline until the loop was closed
    assert sent and all(t.startswith("tok-") for t in sent)
    assert _FakeConsole.refresh_calls == len(sent)


def test_refresh_loop_reconnects_after_three_failures(console):
    ses = TTNv2Session(_config(console))
    assert ses.login()
    _FakeConsole.fail_refresh = True
    reconnects = []
    ses.refresh_loop(
        send_token=lambda t: None,
        is_closed=lambda: False,
        first_expires_ms=None,  # no expiry known -> immediate attempts
        reconnect=lambda: reconnects.append(1),
        clock=lambda: 0.0,
        sleeper=lambda s: None,
    )
    assert reconnects == [1]
    assert _FakeConsole.refresh_calls == 3
