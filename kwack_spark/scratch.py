"""Session-scoped scratch directories for engine-internal materialization.

Every place the engine needs a filesystem staging location — iterative-state
parquet round-trips (operators/graph.py), streaming replay/landing/checkpoint
dirs, persisted index fixtures — allocates it HERE, for two reasons:

1. **Cluster safety.**  A driver-local ``tempfile.mkdtemp()`` path is NOT a
   shared filesystem: on a multi-node cluster executors would write their
   partitions to their own local disks and a later ``read.parquet(path)``
   silently reads partial (or no) data.  This module resolves the scratch
   root from, in order: the ``kwack.scratch.dir`` Spark conf, the session's
   checkpoint dir (``sc.setCheckpointDir`` — the same shared-FS contract
   Spark's own reliable checkpointing relies on), and ONLY under a
   ``local[*]`` master a process-temp directory.  On a non-local master with
   neither conf set, allocation fails loudly instead of corrupting silently.

2. **Hygiene.**  Scratch dirs used to leak (one parquet label table per CC
   round per call; replay dirs per streaming query per battery run — GBs of
   /tmp across repeated benches).  All allocations now live under ONE
   session root that is removed at interpreter exit; callers with a shorter
   lifecycle (per-round iterative state) delete eagerly via :func:`remove`.

Scheme-less paths are NOT assumed driver-local: Spark resolves them against
``fs.defaultFS``, so a bare ``/warehouse/scratch`` on an HDFS-defaulted
cluster is a remote path — mkdir/cleanup through ``os``/``shutil`` there
would be silent no-ops and the scratch would leak on the shared FS (r11
ADVICE).  Locality is decided by resolving the path through the Hadoop
``FileSystem`` for the session's ``hadoopConfiguration``; ``os``/``shutil``
are used only when the resolved filesystem is ``file:``.

This is the single ``tempfile.mkdtemp`` call site in the engine (grep-able
invariant; the test fixtures keep their own).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import SparkSession

# session root cache: (application id, configured base) -> root path.  Keyed
# on the base too so a test that flips kwack.scratch.dir mid-session gets a
# fresh root under the new location.
_ROOTS: dict[tuple[str, str | None], str] = {}
_CLEANUP_REGISTERED = False


def _is_local_path(spark: SparkSession | None, path: str) -> bool:
    """True when ``path`` resolves to the DRIVER-LOCAL filesystem.

    An explicit scheme decides directly.  A scheme-less path defers to the
    Hadoop ``FileSystem`` resolution for the session's configuration
    (``Path.getFileSystem`` honors ``fs.defaultFS``) — exactly the
    resolution Spark's own writers use, so write target and cleanup target
    can never disagree.  Without a session to ask (interpreter-exit
    cleanup after the JVM is gone), a scheme-less path falls back to
    local best-effort — non-local roots registered in ``_ROOTS`` carry
    their explicit scheme from resolution time, so this fallback only
    ever sees genuinely local roots."""
    scheme = _scheme(path)
    if scheme is not None:
        return scheme == "file"
    if spark is None:
        return True
    try:
        fs, _ = _hadoop_fs(spark, path)
        return fs.getUri().getScheme() == "file"
    except Exception:
        return True


def _scheme(path: str) -> str | None:
    """URI scheme of ``path``, or None for a scheme-less path.  Handles
    both ``file://host/p`` and Hadoop's single-slash ``file:/p`` form
    (what ``Path.makeQualified`` emits for the local filesystem)."""
    head = path.split("/", 1)[0]
    if head.endswith(":") and len(head) > 1:
        return head[:-1]
    return None


def _local_part(path: str) -> str:
    for prefix in ("file://", "file:"):
        if path.startswith(prefix):
            return path[len(prefix):]
    return path


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath


def _qualified(spark: SparkSession, path: str) -> str:
    """The fully-qualified URI string of ``path`` under the session's
    filesystem resolution (scheme made explicit).  Roots are stored
    qualified so interpreter-exit cleanup — which may run without a live
    session — still knows where they live."""
    fs, hpath = _hadoop_fs(spark, path)
    return fs.makeQualified(hpath).toString()


def _mkdirs(spark: SparkSession, path: str) -> None:
    if _is_local_path(spark, path):
        os.makedirs(_local_part(path), exist_ok=True)
    else:
        fs, hpath = _hadoop_fs(spark, path)
        fs.mkdirs(hpath)


def remove(spark: SparkSession | None, path: str) -> None:
    """Recursively delete a scratch path (eager per-round cleanup).  Local
    paths go through shutil (works even after the JVM is gone); shared-FS
    URIs go through the Hadoop FileSystem API."""
    if _is_local_path(spark, path):
        shutil.rmtree(_local_part(path), ignore_errors=True)
    else:
        if spark is None:
            spark = SparkSession.getActiveSession()
        if spark is not None:
            try:
                fs, hpath = _hadoop_fs(spark, path)
                fs.delete(hpath, True)
            except Exception:
                pass  # best-effort: never fail a query over scratch cleanup


def _cleanup_all() -> None:
    for root in list(_ROOTS.values()):
        remove(None, root)
    _ROOTS.clear()


def _session_root(spark: SparkSession) -> str:
    base = spark.conf.get("kwack.scratch.dir", None)
    if base is None:
        base = spark.sparkContext.getCheckpointDir()
    app_id = spark.sparkContext.applicationId
    key = (app_id, base)
    root = _ROOTS.get(key)
    if root is not None:
        return root
    if base is not None:
        root = base.rstrip("/") + f"/kwack-scratch-{uuid.uuid4().hex[:8]}"
        try:
            # qualify BEFORE first use: a scheme-less base under a non-local
            # fs.defaultFS becomes an explicit hdfs://... root, so every
            # later mkdir/remove (including post-JVM atexit) targets the
            # same filesystem Spark writes to
            root = _qualified(spark, root)
        except Exception:
            pass  # no JVM fs access: fall through with the raw path
        _mkdirs(spark, root)
    else:
        master = spark.sparkContext.master or ""
        if not master.startswith("local"):
            raise RuntimeError(
                "kwack: no shared scratch location on a non-local master — "
                "set the kwack.scratch.dir Spark conf (or a checkpoint dir "
                "via sc.setCheckpointDir) to a shared-filesystem path; a "
                "driver-local temp dir is not visible to executors"
            )
        root = tempfile.mkdtemp(prefix="kwack_scratch_")
    _ROOTS[key] = root
    global _CLEANUP_REGISTERED
    if not _CLEANUP_REGISTERED:
        atexit.register(_cleanup_all)
        _CLEANUP_REGISTERED = True
    return root


def scratch_dir(spark: SparkSession, tag: str) -> str:
    """A fresh, empty, uniquely-named scratch directory under the session
    root — visible to every executor wherever the root resolves to.  The
    whole root is deleted at interpreter exit; delete earlier with
    :func:`remove` when the caller's lifecycle allows."""
    d = f"{_session_root(spark)}/{tag}-{uuid.uuid4().hex[:12]}"
    _mkdirs(spark, d)
    return d
