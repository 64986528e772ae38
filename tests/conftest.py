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
    now = time.time()
    for entry in os.listdir(wh):
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
    yield spark
    spark.stop()
