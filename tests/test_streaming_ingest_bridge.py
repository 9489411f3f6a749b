"""foreachBatch bridge: streaming micro-batches into the batch
sharded-scaling artifact — artifact bit-identity with a one-shot
build, cross-batch dedup of the emitted rows, and the
manifest-batch_tag replay guard (exactly-once artifact)."""

from pyspark.sql import functions as F


def _mk(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.concat(F.lit("k"), F.col("id")).alias("key"),
        F.col("id").alias("rid"),
    )


def test_streaming_sharded_ingest_bridge(spark, tmp_path):
    from dablooms_spark.operators.sharded_scaling import (
        build_sharded_scaling_layers,
    )
    from dablooms_spark.sources.checkpoint import CheckpointManager
    from dablooms_spark.streaming import streaming_sharded_ingest
    from dablooms_spark.streaming.ingest_bridge import committed_batch_tags

    CAP, EPS, SHARDS = 500, 0.05, 4
    src = str(tmp_path / "src")
    art = str(tmp_path / "artifact")
    sck1 = str(tmp_path / "stream_ck1")

    # two micro-batch files with overlapping keys (400-799 repeat)
    _mk(spark, 0, 800).coalesce(1).write.mode("append").parquet(src)
    _mk(spark, 400, 1_300).coalesce(1).write.mode("append").parquet(src)

    emitted = {}

    def sink(df, batch_id):
        emitted[batch_id] = {r["key"] for r in df.collect()}

    def run(stream_ck):
        stream = (
            spark.readStream.schema("key string, rid long")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        q = (
            streaming_sharded_ingest(
                stream, "key", "rid", art, "srun", CAP, EPS,
                num_shards=SHARDS, on_new_rows=sink,
            )
            .option("checkpointLocation", stream_ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run(sck1)

    # batch 0 all fresh; batch 1 emits only keys unseen in batch 0
    # (bloom-only split: FP may drop a few genuinely-new keys, never
    # emit a seen one)
    assert emitted[0] == {f"k{i}" for i in range(800)}
    expect_new = {f"k{i}" for i in range(800, 1_300)}
    assert emitted[1] <= expect_new
    assert len(emitted[1]) >= len(expect_new) * 0.9

    # artifact == one-shot sharded build over the concatenated batches
    mgr = CheckpointManager(art)
    committed = {
        (r.shard, r.first_id): (bytes(r.blob), r.n)
        for r in mgr.load_blobs(spark, mgr.latest("srun")).collect()
    }
    oneshot = {
        (r.shard, r.first_id): (bytes(r.blob), r.n)
        for r in build_sharded_scaling_layers(
            _mk(spark, 0, 800).unionByName(_mk(spark, 400, 1_300)),
            "key", "rid", CAP, EPS, num_shards=SHARDS,
        ).collect()
    }
    assert committed == oneshot
    assert committed_batch_tags(mgr, "srun") == {"stream-0", "stream-1"}
    seqs_before = mgr.seqnums()

    # replay guard: a FRESH streaming checkpoint reprocesses both
    # files under the same batch ids — the artifact must not
    # double-count (no new seqnums, blobs unchanged)
    emitted.clear()
    run(str(tmp_path / "stream_ck2"))
    assert emitted == {}  # both batches skipped
    assert mgr.seqnums() == seqs_before
    committed2 = {
        (r.shard, r.first_id): (bytes(r.blob), r.n)
        for r in mgr.load_blobs(spark, mgr.latest("srun")).collect()
    }
    assert committed2 == oneshot
