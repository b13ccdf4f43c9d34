"""Handler runtime: routing tokens, scope injection, source compilation.

The reference's handlers are user Python generators whose first yield is
a routing token (``MrConfigureToMap(next_step)`` /
``MrConfigureToReturn()`` — reference: mr/handlers/scope.py:5-24,
dispatch mr/job_engine.py:502-509), executed with an injected global
scope (LOG, FS verbs, session accessors, subprocess RUN — reference:
mr/handlers/general.py:236-337) after being compiled from source
(reference: mr/handlers/processors/python.py:13-66).

Here handlers are ordinary Python callables (closures ship to executors
natively via Spark), but the source-string registration path and the
docstring-metadata format are kept for API parity. Handlers execute on
executors inside Arrow-batched pandas UDFs; scope objects must therefore
be picklable and side-effect-idempotent (Spark retries tasks).
"""

from __future__ import annotations

import io
import json
import logging
import os
import shutil
import subprocess


class MrConfigureToReturn:
    """First-yield routing token: combine+reduce this mapping's output
    (reference: mr/handlers/scope.py:21-24)."""


class MrConfigureToMap:
    """First-yield routing token: fan each yielded pair out as its own
    downstream map invocation of `next_step` (reference:
    mr/handlers/scope.py:13-18)."""

    def __init__(self, next_step_name: str):
        self.next_step_name = next_step_name


class SessionWriteLockedError(RuntimeError):
    """Raised when a reducer attempts a session write (the reference
    disables session writes in reduce paths — mr/job_engine.py:795-800)."""


# --------------------------------------------------------------- notifications
# Reference parity: handler scope exposes NOTIFY (mr/handlers/general.py:
# 252-253, mr/log.py _Notify) plus EMAIL/HTTP child loggers when the
# corresponding hook is enabled (general.py:256-264). Hooks are wired
# from env vars exactly like mr/config/log.py, but evaluated lazily (at
# scope construction, executor-side) instead of import time, so tests
# and deployments can flip them per-process without re-importing.
DO_HOOK_EMAIL_ENV = "JOBX_LOG_EMAIL_HOOK"
DO_HOOK_HTTP_ENV = "JOBX_LOG_HTTP_HOOK"
_hooked_loggers: dict[str, logging.Logger | None] = {}


def _email_hook_logger() -> logging.Logger | None:
    """MR_HANDLER.EMAIL equivalent: an SMTPHandler-backed logger built
    from JOBX_LOG_EMAIL_* env (hostname/port/from/to/subject —
    mr/config/log.py:_configure_email). Memoized per process so the
    handler attaches once."""
    if "email" not in _hooked_loggers:
        lg = None
        if os.environ.get(DO_HOOK_EMAIL_ENV, "0") not in ("0", ""):
            import logging.handlers

            host = os.environ.get("JOBX_LOG_EMAIL_HOSTNAME", "localhost")
            port = int(os.environ.get("JOBX_LOG_EMAIL_HOST_PORT", "25"))
            lg = logging.getLogger("jobx_spark.handler.EMAIL")
            lg.addHandler(
                logging.handlers.SMTPHandler(
                    (host, port),
                    os.environ.get("JOBX_LOG_EMAIL_FROM", "jobx@local"),
                    os.environ.get("JOBX_LOG_EMAIL_TO", "jobx@local").split(","),
                    os.environ.get("JOBX_LOG_EMAIL_SUBJECT", "JobX Notification"),
                )
            )
            lg.setLevel(
                getattr(logging, os.environ.get("JOBX_LOG_EMAIL_LEVEL", "INFO").upper())
            )
        _hooked_loggers["email"] = lg
    return _hooked_loggers["email"]


def _http_hook_logger() -> logging.Logger | None:
    """MR_HANDLER.HTTP equivalent: an HTTPHandler-backed logger from
    JOBX_LOG_HTTP_* env (mr/config/log.py:_configure_http)."""
    if "http" not in _hooked_loggers:
        lg = None
        if os.environ.get(DO_HOOK_HTTP_ENV, "0") not in ("0", ""):
            import logging.handlers

            host = os.environ.get("JOBX_LOG_HTTP_HOSTNAME", "localhost")
            port = os.environ.get("JOBX_LOG_HTTP_PORT", "3333")
            lg = logging.getLogger("jobx_spark.handler.HTTP")
            lg.addHandler(
                logging.handlers.HTTPHandler(
                    f"{host}:{port}",
                    os.environ.get("JOBX_LOG_HTTP_PATH", "/"),
                    method=os.environ.get("JOBX_LOG_HTTP_VERB", "POST").upper(),
                )
            )
            lg.setLevel(
                getattr(logging, os.environ.get("JOBX_LOG_HTTP_LEVEL", "INFO").upper())
            )
        _hooked_loggers["http"] = lg
    return _hooked_loggers["http"]


def reset_log_hooks() -> None:
    """Drop memoized hook loggers (tests flip env between cases)."""
    for lg in _hooked_loggers.values():
        if lg is not None:
            for h in list(lg.handlers):
                lg.removeHandler(h)
    _hooked_loggers.clear()


class Notify:
    """The ``NOTIFY`` scope object (reference mr/log.py ``_Notify``):
    fan a notification out to every hooked channel (EMAIL/HTTP); with
    no hooks enabled, fall back to a plain warning log so the call
    never breaks a ported handler. Callable form is shorthand for
    ``.info`` (reference handlers call both styles)."""

    def __init__(self, invocation_id: str = "?"):
        self.invocation_id = invocation_id

    def _log(self, level: str, message: str, *args) -> None:
        if args:
            message = message % args
        targets = [lg for lg in (_email_hook_logger(), _http_hook_logger()) if lg]
        if not targets:
            logging.getLogger("jobx_spark.handler.notify").warning(
                "[%s] notifications aren't hooked: %s", self.invocation_id, message
            )
            return
        for lg in targets:
            getattr(lg, level)("[%s] %s", self.invocation_id, message)

    def __call__(self, message: str, *args) -> None:
        self._log("info", message, *args)

    def debug(self, message: str, *args) -> None:
        self._log("debug", message, *args)

    def info(self, message: str, *args) -> None:
        self._log("info", message, *args)

    def warning(self, message: str, *args) -> None:
        self._log("warning", message, *args)

    def error(self, message: str, *args) -> None:
        self._log("error", message, *args)

    def exception(self, message: str, *args) -> None:
        import traceback

        self._log("error", message + "\n\n" + traceback.format_exc(), *args)


class FsVerbs:
    """The workflow-scoped filesystem surface handlers see as ``FS``.

    Verb-for-verb parity with the reference's shared-FS wrapper
    (mr/fs/general.py:49-224: mkdir/ls/cp/cpr/rm/rmdir/mv/stat/exists/
    isfile/isdir/open), rooted at a workdir. The reference needed
    Tahoe-LAFS because its workers share nothing; Spark executors see
    shared storage (NFS/HDFS-mount/local in tests) directly, so plain
    ``os``/``shutil`` against the root is the whole implementation.
    Paths are handler-relative; escaping the root is rejected. Instances
    hold only the root string → picklable into executor UDFs.
    """

    def __init__(self, root: str):
        self.root = root

    def _abs(self, path: str) -> str:
        p = os.path.normpath(os.path.join(self.root, path.lstrip("/")))
        if not p.startswith(os.path.normpath(self.root)):
            raise ValueError(f"path escapes workdir: {path!r}")
        return p

    def mkdir(self, path: str) -> None:
        os.makedirs(self._abs(path), exist_ok=True)

    def ls(self, path: str = "."):
        base = self._abs(path)
        return sorted(
            (name, os.stat(os.path.join(base, name)))
            for name in os.listdir(base)
        )

    def cp(self, src: str, dst: str) -> None:
        shutil.copy2(self._abs(src), self._abs(dst))

    def cpr(self, src: str, dst: str) -> None:
        shutil.copytree(self._abs(src), self._abs(dst), dirs_exist_ok=True)

    def rm(self, path: str) -> None:
        os.unlink(self._abs(path))

    def rmdir(self, path: str) -> None:
        shutil.rmtree(self._abs(path))

    def mv(self, src: str, dst: str) -> None:
        shutil.move(self._abs(src), self._abs(dst))

    def stat(self, path: str):
        return os.stat(self._abs(path))

    def exists(self, path: str) -> bool:
        return os.path.exists(self._abs(path))

    def isfile(self, path: str) -> bool:
        return os.path.isfile(self._abs(path))

    def isdir(self, path: str) -> bool:
        return os.path.isdir(self._abs(path))

    def open(self, path: str, mode: str = "r"):
        if any(c in mode for c in "wax"):
            os.makedirs(os.path.dirname(self._abs(path)) or self.root,
                        exist_ok=True)
        return open(self._abs(path), mode)


class HandlerScope:
    """The injected execution scope visible to handler code.

    Mirrors the reference's scope surface (mr/handlers/general.py:
    236-337): LOG, PRINT, RUN, JSON encode/decode, session accessors and
    the routing classes. FS verbs operate on a plain workdir path —
    any Hadoop-compatible FS path works (the reference used Tahoe-LAFS;
    Spark executors see shared storage directly).
    """

    def __init__(
        self,
        invocation_id: str,
        session_snapshot: dict | None = None,
        allow_session_writes: bool = True,
        workdir: str | None = None,
        extra: dict | None = None,
    ):
        self.invocation_id = invocation_id
        self._session = dict(session_snapshot or {})
        self._session_writes: dict[str, str] = {}
        self._allow_session_writes = allow_session_writes
        self.workdir = workdir
        self.fs = FsVerbs(workdir) if workdir else None
        self._stdout = io.StringIO()
        self.extra = extra or {}

    # session accessors (reference: mr/handlers/general.py:367-416)
    def session_set(self, key: str, value) -> None:
        if not self._allow_session_writes:
            raise SessionWriteLockedError(
                "session writes are disabled in reducers"
            )
        encoded = json.dumps(value)
        self._session[key] = encoded
        self._session_writes[key] = encoded

    def session_get(self, key: str):
        raw = self._session.get(key)
        return None if raw is None else json.loads(raw)

    def session_list(self) -> list[str]:
        return sorted(self._session)

    # logging / io
    def log(self, msg: str) -> None:
        logging.getLogger("jobx_spark.handler").info("[%s] %s", self.invocation_id, msg)

    def print_(self, *args) -> None:
        print(*args, file=self._stdout)

    def run(self, cmd: list[str]) -> str:
        """Subprocess escape hatch (reference injects RUN; works the same
        on executors)."""
        return subprocess.run(
            cmd, capture_output=True, text=True, check=True
        ).stdout

    def captured_stdout(self) -> str:
        return self._stdout.getvalue()

    def session_writes(self) -> dict[str, str]:
        return dict(self._session_writes)

    def session_snapshot(self) -> dict[str, str]:
        return dict(self._session)

    def scope_dict(self) -> dict:
        d = {
            "LOG": self.log,
            "PRINT": self.print_,
            "RUN": self.run,
            "JSON_E": json.dumps,
            "JSON_D": json.loads,
            "SEP": "/",
            "JOIN": "/".join,
            "WORKDIR": self.workdir,
            "FS": FsVerbs(self.workdir) if self.workdir else None,
            "S_SET": self.session_set,
            "S_GET": self.session_get,
            "S_LIST": self.session_list,
            "MrConfigureToMap": MrConfigureToMap,
            "MrConfigureToReturn": MrConfigureToReturn,
            "INVOCATION_ID": self.invocation_id,
            "NOTIFY": Notify(self.invocation_id),
        }
        # EMAIL/HTTP appear only when hooked — reference general.py:256-264
        email_lg, http_lg = _email_hook_logger(), _http_hook_logger()
        if email_lg is not None:
            d["EMAIL"] = email_lg
        if http_lg is not None:
            d["HTTP"] = http_lg
        d.update(self.extra)
        return d


_COMPILE_CACHE: dict = {}


def compile_source_handler(name: str, arg_names: list[str], source_code: str):
    """Build a callable from handler source, reproducing the reference's
    wrap-in-a-def + exec flow (mr/handlers/processors/python.py:23-66).

    The source body sees the scope names as globals at call time; the
    returned callable has signature (scope_dict, *args). Compiles are
    cached per (name, source) — the UDF calls this once per invocation
    group on the executor.
    """
    cache_key = (name, tuple(arg_names), source_code)
    if cache_key in _COMPILE_CACHE:
        return _COMPILE_CACHE[cache_key]
    indented = "\n".join(
        "    " + line for line in source_code.splitlines()
    )
    fn_name = f"_handler_{name}"
    wrapped = f"def {fn_name}({', '.join(arg_names)}):\n{indented or '    pass'}\n"
    code = compile(wrapped, f"<handler:{name}>", "exec")

    def call(scope_dict: dict, *args):
        globs = dict(scope_dict)
        exec(code, globs)
        return globs[fn_name](*args)

    call.__name__ = fn_name
    _COMPILE_CACHE[cache_key] = call
    return call


def parse_docstring_metadata(source_code: str) -> dict:
    """Parse the reference's docstring-metadata format: a handler source
    whose docstring carries JSON metadata after a ``**`` marker line
    (reference: mr/handlers/sync.py:136-169; required keys
    mr/config/handler.py:7-11)."""
    import ast

    tree = ast.parse(source_code)
    doc = ast.get_docstring(tree) or ""
    if "**" not in doc:
        raise ValueError("handler docstring missing '**' metadata marker")
    _, meta_part = doc.split("**", 1)
    meta = json.loads(meta_part)
    required = {"handler_type", "argument_spec"}
    missing = required - set(meta)
    if missing:
        raise ValueError(f"handler metadata missing {sorted(missing)}")
    meta["argument_spec"] = [tuple(p) for p in meta["argument_spec"]]
    return meta
