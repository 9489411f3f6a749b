from dablooms_spark.streaming.incremental import streaming_bloom_update

__all__ = ["streaming_bloom_update"]
