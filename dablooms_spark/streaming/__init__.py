from dablooms_spark.streaming.dedup import (
    default_first_seen_shards,
    streaming_first_seen,
    streaming_first_seen_event_time,
)
from dablooms_spark.streaming.incremental import streaming_bloom_update
from dablooms_spark.streaming.ingest_bridge import streaming_sharded_ingest
from dablooms_spark.streaming.ttl import streaming_ttl_first_seen
from dablooms_spark.streaming.windowed import windowed_distinct_stream

__all__ = [
    "default_first_seen_shards",
    "streaming_bloom_update",
    "streaming_first_seen",
    "streaming_first_seen_event_time",
    "streaming_sharded_ingest",
    "streaming_ttl_first_seen",
    "windowed_distinct_stream",
]
