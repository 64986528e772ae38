from hadoop_logfile_inputformat_spark.testing.loggen import (  # noqa: F401
    FORMAT_A,
    FORMAT_B,
    LogfileSummary,
    generate_log_records,
    write_log_corpus,
)
