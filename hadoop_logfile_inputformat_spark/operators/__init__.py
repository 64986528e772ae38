from hadoop_logfile_inputformat_spark.operators import (  # noqa: F401
    dedup,
    relational,
    similarity,
    text,
)
