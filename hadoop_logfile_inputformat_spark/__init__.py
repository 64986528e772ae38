"""PySpark-native analytics engine with the capabilities of
comdirect/hadoop-logfile-inputformat, rebuilt Spark-first.

The reference (see /root/reference, SURVEY.md) is a Hadoop
``FileInputFormat`` that turns (possibly gzipped) multi-line logfiles
into ``((path, offset), record_text)`` pairs. Here that capability is a
PySpark Python DataSource (``sources.logfile``) producing a DataFrame
``(path STRING, offset BIGINT, record STRING)``, plus:

- ``functions``  — typed log parsing, text analysis, vector math
- ``operators``  — relational query builders, dedup, similarity search
- ``plans``      — the query registry consumed by ``__spark_entry__``
- ``streaming``  — incremental (file, offset)-tracking stream source
- ``testing``    — deterministic log corpus generator (parity with the
  reference's LogfileGenerator.java test harness)
"""

__version__ = "0.1.0"

from hadoop_logfile_inputformat_spark.sources.logfile import (  # noqa: F401
    LogfileDataSource,
    register_logfile_source,
)
