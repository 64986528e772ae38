"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator registry from
``hadoop_logfile_inputformat_spark.plans.registry`` (one entry per
implemented operator from SURVEY.md §2 plus the training-data-pipeline
extensions).  All 50 keys carry a DuckDB oracle: hash-dependent
operators use an engine-portable md5-affine family, the logfile-source
queries use generator-replay oracles (``logfile_sample`` samples by a
replayable hash gate), and ``approx_sketches`` hashes exact aggregates
plus sketch-error-bound flags (the raw sketch values being the one
genuinely engine-specific surface, additionally bounded in ``tests/``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Python workers spawned by the JVM need the package importable too
# (cluster equivalent: --py-files); harmless if the session is already up.
_pp = os.environ.get("PYTHONPATH", "")
if _REPO not in _pp.split(os.pathsep):
    os.environ["PYTHONPATH"] = f"{_REPO}{os.pathsep}{_pp}" if _pp else _REPO


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from hadoop_logfile_inputformat_spark.plans.registry import QUERIES

    return QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hadoop_logfile_inputformat_spark.plans.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    from hadoop_logfile_inputformat_spark.plans.registry import ORACLES

    return {k: v for k, v in ORACLES.items() if v is not None}
