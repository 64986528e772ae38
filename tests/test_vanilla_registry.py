"""Every registry query must MATERIALIZE on a vanilla SparkSession.

Two rounds were lost to exactly this gap:

- round 2: ``[DATA_SOURCE_PUSHDOWN_DISABLED]`` — the logfile source only
  worked on session.py's configured session.
- round 3: the driver regenerated the parquet testdata with
  timezone-less timestamps (``timestamp[us]`` → TIMESTAMP_NTZ under
  Spark 4's default ``inferTimestampNTZ``), and
  ``events_sessionize``'s ``CAST(ts AS BIGINT)`` stopped analyzing —
  which also crashed bench.py before it wrote a single timing.

The driver's harness builds a bare ``SparkSession`` in its own process;
the in-suite fixture can't reproduce that (``getOrCreate`` would return
the already-configured session), so this runs the sweep in a
subprocess.  ``limit(3).collect()`` (not ``.columns``) forces analysis
AND execution of every plan.
"""

from __future__ import annotations

import os
import subprocess
import sys

SF = "/root/testdata/sf0.001"

_SCRIPT = """
import sys

from pyspark.sql import SparkSession

import __spark_entry__ as entry

spark = (
    SparkSession.builder.master("local[4]")
    .appName("vanilla-registry")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
failures = []
for name, fn in entry.queries().items():
    try:
        df = fn(spark, {sf!r})
        df.limit(3).collect()
    except Exception as exc:  # noqa: BLE001 - report every broken query
        failures.append(f"{{name}}: {{type(exc).__name__}}: " + str(exc).split(chr(10))[0][:300])
print("CHECKED", len(entry.queries()))
for f in failures:
    print("FAIL", f)
sys.exit(1 if failures else 0)
"""


def test_all_registry_queries_materialize_on_vanilla_session():
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = pkg_root + os.pathsep + env.get("PYTHONPATH", "")
    res = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(sf=SF)],
        capture_output=True,
        text=True,
        timeout=1200,
        env=env,
        cwd=pkg_root,
    )
    assert res.returncode == 0, (res.stdout[-6000:], res.stderr[-2000:])
    assert "CHECKED" in res.stdout
