from dablooms_spark.streaming.dedup import streaming_first_seen
from dablooms_spark.streaming.incremental import streaming_bloom_update
from dablooms_spark.streaming.windowed import windowed_distinct_stream

__all__ = [
    "streaming_bloom_update",
    "streaming_first_seen",
    "windowed_distinct_stream",
]
