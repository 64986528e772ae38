from hadoop_logfile_inputformat_spark.streaming.logfile_stream import (  # noqa: F401
    LogfileStreamDataSource,
    register_logfile_stream_source,
)
from hadoop_logfile_inputformat_spark.streaming.pipelines import (  # noqa: F401
    curate_stream,
    curate_stream_batch,
    dedup_stream,
    embedding_index_stream,
    embedding_index_stream_batch,
    enrich_stream_with_dim,
    events_hourly_stream,
    near_dup_stream,
    near_dup_stream_batch,
    purchases_joined_to_clicks_stream,
    sessionize_stream,
    takedown_stream,
    takedown_stream_batch,
)
from hadoop_logfile_inputformat_spark.streaming.stateful import (  # noqa: F401
    ROCKSDB_STATE_CONFS,
    sessionize_with_state,
)
