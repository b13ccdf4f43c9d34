"""Handler hot-reload daemon: background re-sync of a handler source
tree into the catalog at a fixed interval.

Parity with the reference's update-check loop (mr/handlers/general.py:
136-234): a thread wakes every ``interval_s``, computes a cheap state
fingerprint over the source tree, and only when it changes runs the
full sync (create/update/delete via the same code path as the CLI's
``handler-sync``). The next ``Engine.submit`` picks up the new version
automatically because the engine resolves handlers from the catalog at
submit time — no re-registration step.

The reference checks its KV store, not the filesystem; our catalog IS
the library side, and the filesystem is the source side (the reference
splits these the same way: HandlerSync feeds the KV, the update loop
feeds the library). One loop instance per (workflow, source_dir).
"""

from __future__ import annotations

import hashlib
import os
import threading

from jobx_spark.catalog import Catalog


def source_tree_state(root: str) -> str:
    """Fingerprint of the handler source tree: sha1 over sorted
    (relative path, content sha1) pairs — the get_handlers_state()
    equivalent (reference: mr/handlers/source.py checksum set)."""
    h = hashlib.sha1()
    for dirpath, _dirs, files in sorted(os.walk(root)):
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            with open(path, "rb") as f:
                digest = hashlib.sha1(f.read()).hexdigest()
            rel = os.path.relpath(path, root)
            h.update(f"{rel}:{digest};".encode())
    return h.hexdigest()


class HandlerUpdateLoop:
    """Background daemon that keeps catalog handlers in sync with a
    source directory.

    >>> loop = HandlerUpdateLoop(catalog, "wf", "handlers/", interval_s=10)
    >>> loop.start()     # daemon thread; stop() to halt
    >>> loop.check_once()  # or: one synchronous pass (deterministic tests)
    """

    def __init__(
        self,
        catalog: Catalog,
        workflow_name: str,
        source_dir: str,
        interval_s: float = 10.0,
    ):
        self.catalog = catalog
        self.workflow_name = workflow_name
        self.source_dir = source_dir
        self.interval_s = interval_s
        self._known_state: str | None = None
        self._exit = threading.Event()
        self._thread: threading.Thread | None = None
        self.last_result: dict | None = None
        # Observable failure signal: a permanently broken tree must not
        # look like "quietly in sync" (last_result would keep showing
        # the last good pass). Cleared on the next successful pass.
        self.last_error: str | None = None
        self._last_error_sig: str | None = None

    def check_once(self) -> dict:
        """One sync pass. Skips the (comparatively) expensive parse+diff
        when the tree fingerprint is unchanged."""
        state = source_tree_state(self.source_dir)
        if state == self._known_state:
            return {"created": [], "updated": [], "deleted": [], "skipped": True}
        from jobx_spark.cli import sync_handlers_from_dir

        result = sync_handlers_from_dir(self.catalog, self.workflow_name, self.source_dir)
        self._known_state = state
        self.last_result = result
        self.last_error = None
        return result

    def _run(self) -> None:
        import logging
        import traceback

        while not self._exit.is_set():
            try:
                self.check_once()
            except Exception:  # noqa: BLE001 - a broken source file must not
                # kill the daemon; next interval retries (ref behavior) —
                # but record it so callers can detect a stuck loop, and
                # log once per distinct error to avoid interval spam.
                self.last_error = traceback.format_exc()
                sig = self.last_error.strip().splitlines()[-1]
                if sig != self._last_error_sig:
                    logging.getLogger(__name__).warning(
                        "hot-reload pass failed for %s: %s", self.source_dir, sig
                    )
                    self._last_error_sig = sig
            self._exit.wait(self.interval_s)

    def start(self) -> "HandlerUpdateLoop":
        self.check_once()  # synchronous first pass: handlers exist on return
        self._thread = threading.Thread(
            target=self._run,
            name=f"jobx-hot-reload-{self.workflow_name}",
            daemon=True,
        )
        self._thread.start()
        return self

    def stop(self) -> None:
        self._exit.set()
        if self._thread:
            self._thread.join(timeout=5)
