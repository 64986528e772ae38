from hadoop_logfile_inputformat_spark.operators import (  # noqa: F401
    bucketing,
    dedup,
    logparity,
    relational,
    relational_ext,
    similarity,
    skew,
    text,
)
