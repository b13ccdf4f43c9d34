"""Result sinks: inline, file/CSV, HTTP POST, email.

Parity with the reference's writer surface (mr/result_writers/*.py).
All writers run on the driver *after* the Spark action returns —
exactly-once by construction (the reference fires its writer once at
request completion, mr/job_engine.py:996-1001; with Spark task retries
the only safe place for a side-effecting sink is post-action).
"""

from __future__ import annotations

import csv
import json
import os


class ResultWriter:
    """Base (reference: mr/result_writers/base.py:4-6)."""

    def render(self, request, pairs: list[tuple]) -> dict:
        raise NotImplementedError


class InlineResultWriter(ResultWriter):
    """Pairs straight into the response envelope
    (reference: mr/result_writers/inline.py:6-9)."""

    def render(self, request, pairs):
        return {"pairs": [[k, v] for k, v in pairs]}


class FileResultWriter(ResultWriter):
    """Space-delimited CSV file, or one file per key in a directory
    (reference: mr/result_writers/file.py:10-52)."""

    def __init__(self, path: str, per_key: bool = False):
        self.path = path
        self.per_key = per_key

    def render(self, request, pairs):
        if self.per_key:
            os.makedirs(self.path, exist_ok=True)
            for k, v in pairs:
                fname = os.path.join(self.path, str(k))
                with open(fname, "a", encoding="utf-8") as f:
                    f.write(f"{json.dumps(v)}\n")
        else:
            os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
            with open(self.path, "w", newline="", encoding="utf-8") as f:
                w = csv.writer(f, delimiter=" ")
                for k, v in pairs:
                    w.writerow([k, v])
        return {"path": self.path, "n_pairs": len(pairs)}


class HttpResultWriter(ResultWriter):
    """JSON result POSTed to a URL with request/workflow/job headers
    (reference: mr/result_writers/http.py:11-33)."""

    def __init__(self, url: str, timeout: float = 10.0):
        self.url = url
        self.timeout = timeout

    def render(self, request, pairs):
        import urllib.request

        body = json.dumps({"pairs": [[k, v] for k, v in pairs]}).encode()
        req = urllib.request.Request(
            self.url,
            data=body,
            headers={
                "Content-Type": "application/json",
                "X-Mr-Request-Id": request.request_id,
                "X-Mr-Workflow-Name": request.workflow_name,
                "X-Mr-Job-Name": request.job_name,
            },
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as resp:
            return {"status": resp.status, "n_pairs": len(pairs)}


class EmailResultWriter(ResultWriter):
    """JSON attachment via SMTP (reference: mr/result_writers/email.py:
    11-39). SMTP config must be supplied; no server in the test
    environment, so render() raises unless configured."""

    def __init__(self, to_addr: str, from_addr: str, smtp_host: str | None = None):
        self.to_addr = to_addr
        self.from_addr = from_addr
        self.smtp_host = smtp_host

    def render(self, request, pairs):
        if not self.smtp_host:
            raise NotImplementedError(
                "EmailResultWriter requires smtp_host; none in this environment"
            )
        import smtplib
        from email.message import EmailMessage

        msg = EmailMessage()
        msg["Subject"] = f"MR result {request.request_id}"
        msg["From"] = self.from_addr
        msg["To"] = self.to_addr
        msg.add_attachment(
            json.dumps({"pairs": [[k, v] for k, v in pairs]}).encode(),
            maintype="application",
            subtype="json",
            filename="result.json",
        )
        with smtplib.SMTP(self.smtp_host) as s:
            s.send_message(msg)
        return {"sent_to": self.to_addr, "n_pairs": len(pairs)}


_WRITERS = {
    "inline": InlineResultWriter,
    "file": FileResultWriter,
    "http": HttpResultWriter,
    "email": EmailResultWriter,
}


def get_writer(name: str, options: dict | None = None) -> ResultWriter:
    try:
        cls = _WRITERS[name]
    except KeyError:
        raise ValueError(f"unknown result writer {name!r}") from None
    return cls(**(options or {}))
