from hadoop_logfile_inputformat_spark.sources.logfile import (  # noqa: F401
    LogfileDataSource,
    iter_records,
    plan_partitions,
    register_logfile_source,
    stage_decompress,
)
