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


def _is_local_path(path: str) -> bool:
    scheme, sep, _rest = path.partition("://")
    return not sep or scheme == "file"


def _local_part(path: str) -> str:
    return path[len("file://"):] if path.startswith("file://") else path


def _hadoop_fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath


def _mkdirs(spark: SparkSession, path: str) -> None:
    if _is_local_path(path):
        os.makedirs(_local_part(path), exist_ok=True)
    else:
        fs, hpath = _hadoop_fs(spark, path)
        fs.mkdirs(hpath)


def remove(spark: SparkSession | None, path: str) -> None:
    """Recursively delete a scratch path (eager per-round cleanup).  Local
    paths go through shutil (works even after the JVM is gone); shared-FS
    URIs go through the Hadoop FileSystem API."""
    if _is_local_path(path):
        shutil.rmtree(_local_part(path), ignore_errors=True)
    elif spark is not None:
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
