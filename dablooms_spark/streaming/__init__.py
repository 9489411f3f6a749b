from dablooms_spark.streaming.incremental import streaming_bloom_update
from dablooms_spark.streaming.windowed import windowed_distinct_stream

__all__ = ["streaming_bloom_update", "windowed_distinct_stream"]
