"""Streaming first-seen dedup: hard no-duplicate guarantee, ε-bounded
first-occurrence loss, bounded state."""

from pyspark.sql import functions as F


def test_streaming_first_seen(spark, tmp_path_factory):
    from dablooms_spark.streaming import streaming_first_seen

    src = str(tmp_path_factory.mktemp("fs_src")) + "/in"
    # batch 1: keys 0..399; batch 2: keys 200..599 (200 dups, 200 new)
    b1 = spark.range(0, 400).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        F.col("id").alias("payload"),
    )
    b2 = spark.range(200, 600).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        (F.col("id") + 10_000).alias("payload"),
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    out = streaming_first_seen(
        stream, "key", capacity=2000, error_rate=0.01, num_shards=4
    )
    assert set(out.columns) == {"key", "payload"}
    ckpt = str(tmp_path_factory.mktemp("fs_ckpt"))
    q = (
        out.writeStream.format("memory")
        .queryName("first_seen")
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from first_seen").collect()

    emitted = [r["key"] for r in rows]
    # HARD guarantee: no key emitted twice (blooms never false-negative)
    assert len(emitted) == len(set(emitted))
    # every emitted key is genuine and carries its FIRST payload
    payloads = {r["key"]: r["payload"] for r in rows}
    for k, p in payloads.items():
        i = int(k[1:])
        # keys < 400 first appear in batch 1 (payload = i); keys >= 400
        # only exist in batch 2 (payload = i + 10000)
        expected = i if i < 400 else i + 10_000
        assert p == expected, f"{k}: non-first payload {p} emitted"
    # ε-bounded loss: ≥ 99% of the 600 distinct keys surface at 1% ε
    assert len(set(emitted)) >= 594
    # keys unique to batch 2 really arrive through the second batch
    assert sum(1 for k in emitted if int(k[1:]) >= 400) >= 194


def test_streaming_first_seen_state_is_blob_sized(spark, tmp_path_factory):
    """State per shard is one filter blob: re-running with 10x the
    rows must not grow state beyond the fixed geometry."""
    from dablooms_spark.core.counting_bloom import CountingBloom

    cb = CountingBloom(1000, 0.01)
    cb.add([f"k{i}".encode() for i in range(1000)])
    at_capacity = len(cb.to_bytes())
    # dense counters bound the blob: state size is geometry-, not
    # stream-length-, dependent
    assert at_capacity <= cb.geometry.size + 128
    # hammering the same keys 5x more must not grow the blob
    for _ in range(5):
        cb2 = CountingBloom(1000, 0.01)
        cb2.add([f"k{i}".encode() for i in range(1000)])
        cb = cb.merge(cb2)
    assert len(cb.to_bytes()) <= cb.geometry.size + 128
