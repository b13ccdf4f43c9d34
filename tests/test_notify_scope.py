"""NOTIFY scope parity (reference mr/handlers/general.py:252-264,
mr/log.py): handlers can call NOTIFY with no hooks configured (warning
fallback, never an error), EMAIL/HTTP appear in scope only when the
corresponding hook env is set, and a hooked HTTP notification reaches a
real local listener."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from jobx_spark import handlers as H
from jobx_spark.engine import Engine


@pytest.fixture(autouse=True)
def _clean_hooks(monkeypatch):
    H.reset_log_hooks()
    monkeypatch.delenv(H.DO_HOOK_EMAIL_ENV, raising=False)
    monkeypatch.delenv(H.DO_HOOK_HTTP_ENV, raising=False)
    yield
    H.reset_log_hooks()


NOTIFY_MAPPER = '''"""notify then double.

**{"handler_type": "mapper", "argument_spec": [["arg1", "int"]]}
"""
yield MrConfigureToReturn()
NOTIFY("mapping a batch")
NOTIFY.warning("warn style")
for name, value in arguments:
    yield (name, value * 2)
'''


def _engine(spark):
    e = Engine(spark)
    e.create_workflow("wf")
    e.register_handler("wf", "notifier", source_code=NOTIFY_MAPPER)
    e.register_handler(
        "wf", "noop",
        source_code='''"""pass through.

**{"handler_type": "reducer", "argument_spec": []}
"""
for k, vl in results:
    yield (k, vl)
''',
    )
    e.create_step("wf", "s", "notifier", "noop")
    e.create_job("wf", "j", "s")
    return e


def test_reference_style_handler_calling_notify_runs(spark):
    req = _engine(spark).submit("wf", "j", {"arg1": 21})
    assert req.result["pairs"] == [["arg1", [42]]]


def test_email_http_absent_from_scope_without_hooks():
    scope = H.HandlerScope("inv1").scope_dict()
    assert "NOTIFY" in scope
    assert "EMAIL" not in scope and "HTTP" not in scope


def test_http_hook_scope_and_delivery(monkeypatch):
    received = []

    class Sink(BaseHTTPRequestHandler):
        def do_POST(self):
            received.append(self.rfile.read(int(self.headers["Content-Length"])))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Sink)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        monkeypatch.setenv(H.DO_HOOK_HTTP_ENV, "1")
        monkeypatch.setenv("JOBX_LOG_HTTP_HOSTNAME", "127.0.0.1")
        monkeypatch.setenv("JOBX_LOG_HTTP_PORT", str(srv.server_address[1]))
        scope = H.HandlerScope("inv2").scope_dict()
        assert "HTTP" in scope and "EMAIL" not in scope
        scope["NOTIFY"]("hello %s", "world")
        for _ in range(100):
            if received:
                break
            threading.Event().wait(0.05)
        assert received and b"hello+world" in received[0].replace(b"%20", b"+")
    finally:
        srv.shutdown()


def test_email_hook_appears_in_scope(monkeypatch):
    monkeypatch.setenv(H.DO_HOOK_EMAIL_ENV, "1")
    monkeypatch.setenv("JOBX_LOG_EMAIL_TO", "ops@example.com")
    scope = H.HandlerScope("inv3").scope_dict()
    assert "EMAIL" in scope


def test_notification_listener_receives_http_hook_records(capsys):
    """mr_http_notification_listen parity: a real logging.HTTPHandler
    (what the HTTP scope hook uses) delivers to NotificationListener,
    which records and prints the formatted line."""
    import logging
    import logging.handlers
    import time

    from jobx_spark.http_api import NotificationListener

    listener = NotificationListener().start()
    try:
        h = logging.handlers.HTTPHandler(
            f"127.0.0.1:{listener.port}", "/", method="POST"
        )
        lg = logging.getLogger("jobx.test.notify")
        lg.setLevel(logging.INFO)
        lg.addHandler(h)
        lg.info("hello from a handler")
        lg.removeHandler(h)
        deadline = time.time() + 5
        while not listener.records and time.time() < deadline:
            time.sleep(0.05)
    finally:
        listener.stop()
    assert listener.records
    rec = listener.records[0]
    assert rec["name"] == "jobx.test.notify"
    assert rec["levelname"] == "INFO"
    assert rec["msg"] == "hello from a handler"
