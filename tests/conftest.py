import os
import shutil
import time

import pytest

from hadoop_logfile_inputformat_spark.session import get_spark

#: Warehouse entries the test suite owns (table dirs AND lease files):
#: every fixture index/table name in tests/ starts with one of these.
#: Exact prefixes, not a bare "t" — a future library table that merely
#: starts with the letter must never be collateral.
_TEST_OWNED = ("t_", "tdf_", "tdl_", "tdr", "tfq_", "tia_", "tlk",
               "tmp_", "topq", "kmh_", "ivfpqh",
               "ann_ivf_append_result")

#: Ephemeral uuid-named indexes the library drops before returning
#: (similarity.ann_ivf_append_lifecycle and friends) — an interrupted
#: run strands their dirs.  Deleted only when STALE: a fresh one may
#: belong to a concurrently-running correctness gate or bench sharing
#: this warehouse.
_EPHEMERAL = ("ivf_incr_", "ivf_kmeans_", "ivfpq_")
_STALE_S = 3600

#: Concurrent-session guard (r15 verdict note): the test-owned
#: prefixes are deleted UNCONDITIONALLY below, which assumes one pytest
#: session per warehouse at a time — two overlapping sessions would GC
#: each other's live tables.  Each session therefore leaves a marker
#: file carrying its pid; a starting session that finds another LIVE
#: session's marker skips the GC entirely (conservative: debris from a
#: crashed run survives one extra session rather than a live run losing
#: its tables — the crash-sweep setups clear their own debris via
#: force_drop_table regardless).
_SESSION_MARKER_PREFIX = ".pytest-session-"


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def _other_live_session(wh: str) -> bool:
    """True when another pytest session's marker names a live pid;
    stale markers (dead pid, or older than _STALE_S) are removed."""
    now = time.time()
    for entry in os.listdir(wh):
        if not entry.startswith(_SESSION_MARKER_PREFIX):
            continue
        path = os.path.join(wh, entry)
        try:
            pid = int(entry[len(_SESSION_MARKER_PREFIX):])
        except ValueError:
            pid = -1
        try:
            fresh = now - os.path.getmtime(path) < _STALE_S
        except OSError:
            continue
        if pid != os.getpid() and pid > 0 and fresh and _pid_alive(pid):
            return True
        try:
            os.remove(path)
        except OSError:
            pass
    return False


def _gc_warehouse_debris(spark) -> None:
    """Session-start debris GC — the "recovery must tolerate debris"
    rule applied to the suite itself (r14 verdict: an interrupted run
    strands managed-table directories the in-memory catalog has
    forgotten; the next managed CREATE fails with "location already
    exists").  The catalog is brand-new and empty here, so every
    warehouse entry is by definition orphaned; we still only remove
    names the tests own (plus stale library ephemerals), because other
    processes (bench, the driver's correctness gate) may share this
    warehouse concurrently."""
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    if not os.path.isdir(wh):
        return
    if _other_live_session(wh):
        return
    now = time.time()
    for entry in os.listdir(wh):
        if entry.startswith(_SESSION_MARKER_PREFIX):
            continue
        path = os.path.join(wh, entry)
        if entry.startswith(_TEST_OWNED):
            pass
        elif entry.startswith(_EPHEMERAL):
            try:
                if now - os.path.getmtime(path) < _STALE_S:
                    continue
            except OSError:
                continue
        else:
            continue
        try:
            if os.path.isdir(path):
                shutil.rmtree(path, ignore_errors=True)
            else:
                os.remove(path)
        except OSError:
            pass


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="hlis-tests", master="local[4]", shuffle_partitions=4)
    _gc_warehouse_debris(spark)
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    marker = os.path.join(wh, f"{_SESSION_MARKER_PREFIX}{os.getpid()}")
    try:
        os.makedirs(wh, exist_ok=True)
        with open(marker, "w") as f:
            f.write(str(time.time()))
    except OSError:
        marker = None
    yield spark
    if marker is not None:
        try:
            os.remove(marker)
        except OSError:
            pass
    spark.stop()
