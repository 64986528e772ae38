from hadoop_logfile_inputformat_spark.multimodal.media import (  # noqa: F401
    MEDIA_FEATURE_SCHEMA,
    attach_fake_media,
    attach_fake_video,
    decode_image_batch,
    extract_media_features,
    sample_video_frames,
)
