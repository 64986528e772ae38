"""The session-start warehouse GC's concurrent-session guard (r15
verdict note #2): two overlapping pytest sessions sharing a warehouse
must not GC each other's live test-owned tables.  Each session leaves
a pid-bearing marker; a starting session that sees another LIVE
session's marker skips the GC entirely."""

import os
import subprocess
import sys
import time

import conftest


def test_other_live_session_detects_live_pid(tmp_path):
    wh = str(tmp_path)
    # pid 1 is always alive (os.kill(1, 0) raises PermissionError,
    # which counts as alive) and is never this process
    marker = os.path.join(wh, f"{conftest._SESSION_MARKER_PREFIX}1")
    with open(marker, "w") as f:
        f.write(str(time.time()))
    assert conftest._other_live_session(wh) is True
    assert os.path.exists(marker)  # a live session's marker survives


def test_other_live_session_ignores_own_and_dead(tmp_path):
    wh = str(tmp_path)
    own = os.path.join(
        wh, f"{conftest._SESSION_MARKER_PREFIX}{os.getpid()}"
    )
    with open(own, "w") as f:
        f.write("x")
    # a genuinely dead pid: spawn-and-reap a child
    p = subprocess.Popen([sys.executable, "-c", "pass"])
    p.wait()
    dead = os.path.join(wh, f"{conftest._SESSION_MARKER_PREFIX}{p.pid}")
    with open(dead, "w") as f:
        f.write("x")
    assert conftest._other_live_session(wh) is False
    assert not os.path.exists(dead)  # stale marker removed
    assert not os.path.exists(own)  # own marker rewritten at yield time


def test_stale_marker_is_removed_even_if_pid_recycled(tmp_path):
    wh = str(tmp_path)
    marker = os.path.join(wh, f"{conftest._SESSION_MARKER_PREFIX}1")
    with open(marker, "w") as f:
        f.write("x")
    old = time.time() - conftest._STALE_S - 10
    os.utime(marker, (old, old))
    assert conftest._other_live_session(wh) is False
    assert not os.path.exists(marker)
