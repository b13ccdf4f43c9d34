"""Email sink e2e (reference: mr/result_writers/email.py:11-39): a
minimal in-process SMTP server accepts the session, and the writer's
message arrives with the JSON attachment intact."""

import json
import socket
import threading

from jobx_spark.result_writers import EmailResultWriter


class _MiniSmtpServer:
    """Just enough SMTP to accept one message: 220 greeting, 250 to
    every verb, 354 for DATA, collect until the dot terminator."""

    def __init__(self):
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.messages: list[bytes] = []
        self.thread = threading.Thread(target=self._serve, daemon=True)
        self.thread.start()

    def _serve(self):
        conn, _ = self.sock.accept()
        f = conn.makefile("rb")
        conn.sendall(b"220 mini ESMTP\r\n")
        data_mode = False
        buf = []
        while True:
            line = f.readline()
            if not line:
                break
            if data_mode:
                if line.rstrip(b"\r\n") == b".":
                    self.messages.append(b"".join(buf))
                    conn.sendall(b"250 OK\r\n")
                    data_mode = False
                else:
                    buf.append(line)
                continue
            verb = line.split()[0].upper() if line.split() else b""
            if verb in (b"EHLO", b"HELO"):
                conn.sendall(b"250 mini\r\n")
            elif verb == b"DATA":
                conn.sendall(b"354 go\r\n")
                data_mode = True
            elif verb == b"QUIT":
                conn.sendall(b"221 bye\r\n")
                break
            else:
                conn.sendall(b"250 OK\r\n")
        conn.close()


class _Req:
    request_id = "req123"
    workflow_name = "wf"
    job_name = "j1"


def test_email_writer_sends_json_attachment():
    srv = _MiniSmtpServer()
    writer = EmailResultWriter(
        to_addr="dev@example.com",
        from_addr="mr@example.com",
        smtp_host=f"127.0.0.1:{srv.port}",
    )
    out = writer.render(_Req(), [["a", 1], ["b", 2]])
    srv.thread.join(timeout=10)
    assert out == {"sent_to": "dev@example.com", "n_pairs": 2}
    assert len(srv.messages) == 1
    raw = srv.messages[0].decode()
    assert "Subject: MR result req123" in raw
    assert "result.json" in raw
    # parse the MIME message and decode the JSON attachment
    import email
    import email.policy

    msg = email.message_from_bytes(srv.messages[0], policy=email.policy.default)
    attachments = [p for p in msg.iter_attachments()]
    assert len(attachments) == 1
    att = attachments[0]
    assert att.get_filename() == "result.json"
    assert json.loads(att.get_content()) == {"pairs": [["a", 1], ["b", 2]]}
