from hadoop_logfile_inputformat_spark.functions.logparse import (  # noqa: F401
    format_record_lines,
    parse_log_records,
)
