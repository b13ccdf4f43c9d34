"""Persisted-artifact contract: portable filesystem probes and a
version-pointer layout for crash-consistent index publishing.

The r10 persisted-index family (ann-index, ann-pq-index, dedup-index,
bpe-vocab) relied on ``mode("overwrite")`` + a ``_SUCCESS`` probe via
``os.path.exists``. Two gaps at deployment scale (VERDICT r10 #5/#7):

* ``os.path`` only sees the driver's local disk — on an S3/HDFS
  warehouse every probe would miss and every serve would silently
  rebuild. All probes here go through the Hadoop FileSystem API via
  the session's JVM (which resolves file://, hdfs://, s3a://, ...
  uniformly), falling back to ``os.path`` only when no JVM is
  reachable, so the LOCAL test run exercises the SAME code path a
  cluster uses (RawLocalFileSystem).
* ``overwrite`` deletes-then-writes in place: a reader concurrent
  with a rebuild/compact can see a half-swapped directory. The
  version-pointer layout never mutates a published version: a writer
  materializes ``<root>/v=<N+1>/...`` completely, then PUBLISHES it by
  creating the empty marker file ``<root>/_v<N+1>.ptr`` (a single
  atomic create — the rename-free analogue of a manifest swap that
  works on object stores without atomic rename). Readers resolve
  ``max(N)`` over the markers; a version directory without its marker
  is invisible, so a writer crash at any point leaves the previous
  version fully intact and current. Retention keeps the latest two
  versions so a reader pinned to ``v=N`` survives a concurrent
  publish of ``v=N+1`` (the snapshot-isolation contract pinned by
  tests/test_r11_additions.py::test_index_snapshot_isolation).

Scope of the guarantee (ADVICE r11): this layout assumes a SINGLE
WRITER per artifact root. Two concurrent builders would resolve the
same next version, and ``next_version_dir``'s crash-leftover cleanup
could delete the other writer's in-flight directory mid-
materialization. That matches the deployment story — one driver owns
an index's build/append/compact jobs (the way one streaming query
owns a checkpoint dir); reader concurrency is unlimited. Cross-driver
writer coordination would need an external lock or a
conditional-create manifest, out of scope here. Retention depth is
likewise a bound, not an invariant: keeping the latest TWO versions
protects a reader pinned to v=N across exactly ONE subsequent publish
— a reader that stays pinned while two more versions publish loses
its files. Long-lived readers should re-resolve per query (every
serve path here does).

Reference basis: the same publish-then-flip-pointer discipline as
table formats' metadata pointer (Iceberg's version-hint / Delta's
_last_checkpoint), re-expressed for plain parquet directories.
"""

from __future__ import annotations

import glob
import os
import re

from pyspark.sql import SparkSession

_PTR_RE = re.compile(r"_v(\d+)\.ptr$")


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def fs_exists(spark: SparkSession | None, path: str) -> bool:
    """Existence probe through the Hadoop FS API (portable to any
    warehouse scheme); ``os.path`` fallback when no JVM is reachable
    (e.g. pure-Python unit tests)."""
    if spark is not None:
        try:
            fs, p = _hadoop_fs(spark, path)
            return bool(fs.exists(p))
        except Exception:
            pass
    return os.path.exists(path)


def _touch(spark: SparkSession | None, path: str) -> None:
    if spark is not None:
        try:
            fs, p = _hadoop_fs(spark, path)
            fs.create(p, True).close()
            return
        except Exception:
            pass
    with open(path, "w", encoding="utf-8"):
        pass


def touch(spark: SparkSession | None, path: str) -> None:
    """Create (or truncate) an empty marker file through the portable
    FS path — the terminal-marker primitive the append families use to
    record 'every segment of this generation is on disk' (gating
    repair on Spark's root ``_SUCCESS`` is wrong for multi-segment
    writes: the FIRST segment's commit already creates it)."""
    _touch(spark, path)


def _delete(spark: SparkSession | None, path: str) -> None:
    if spark is not None:
        try:
            fs, p = _hadoop_fs(spark, path)
            fs.delete(p, True)
            return
        except Exception:
            pass
    import shutil

    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)
    elif os.path.exists(path):
        os.remove(path)


def _list_markers(spark: SparkSession | None, root: str) -> list[int]:
    names: list[str] = []
    if spark is not None:
        try:
            fs, p = _hadoop_fs(spark, root)
            if fs.exists(p):
                for st in fs.listStatus(p):
                    names.append(st.getPath().getName())
        except Exception:
            names = []
    if not names:
        names = [os.path.basename(x) for x in glob.glob(
            os.path.join(root, "_v*.ptr")
        )]
    out = []
    for n in names:
        m = _PTR_RE.search(n)
        if m:
            out.append(int(m.group(1)))
    return sorted(out)


def current_version(spark: SparkSession | None, root: str) -> int | None:
    """The published version a reader should open, or None if the
    artifact has never been published."""
    vs = _list_markers(spark, root)
    return vs[-1] if vs else None


def version_dir(root: str, version: int) -> str:
    return os.path.join(root, f"v={version}")


def resolve(spark: SparkSession | None, root: str) -> str | None:
    """Path of the current published version's directory, or None."""
    v = current_version(spark, root)
    return None if v is None else version_dir(root, v)


def publish(spark: SparkSession | None, root: str, version: int) -> str:
    """Flip the pointer to ``version`` (whose directory must already be
    fully written) and prune versions older than the previous one —
    the latest TWO stay on disk so a reader pinned to the prior
    version survives THIS publish (one-publish window: a second
    subsequent publish deletes v=N, see the module docstring's
    retention bound). Single-writer per root, also per the module
    docstring."""
    _touch(spark, os.path.join(root, f"_v{version}.ptr"))
    for old in _list_markers(spark, root):
        if old < version - 1:
            _delete(spark, os.path.join(root, f"_v{old}.ptr"))
            _delete(spark, version_dir(root, old))
    return version_dir(root, version)


def next_version_dir(spark: SparkSession | None, root: str) -> tuple[int, str]:
    """(version, dir) the writer should materialize into. Never reuses
    a published version number; an unpublished crash leftover with the
    same number is removed first (it was invisible to readers). The
    leftover cleanup is exactly why the contract is single-writer per
    root: a second concurrent builder's in-flight directory looks like
    a crash leftover to this call."""
    cur = current_version(spark, root)
    nxt = (cur or 0) + 1
    vdir = version_dir(root, nxt)
    _delete(spark, vdir)
    return nxt, vdir
