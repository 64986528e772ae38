from hadoop_logfile_inputformat_spark.plans.registry import (  # noqa: F401
    ORACLES,
    QUERIES,
    query_names,
)
