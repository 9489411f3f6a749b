"""Distributed bloom-filter build — the two-phase topology.

The reference is a single-process writer (scaling_bloom_add,
src/dablooms.c:≈487). The Spark-native equivalent (SURVEY.md §4.3):

  stage 1 (no shuffle of text):  mapInArrow over input partitions —
      each task hashes its Arrow batches zero-copy and scatter-adds
      into one partition-local filter, emitting a single small blob
      row. The wide text column never shuffles; only filter blobs do.
  stage 2 (tree merge):          repeated groupBy(shard // fanin) →
      applyInPandas counter-sum/concat merges — log_fanin(P) rounds of
      blob-only shuffles, then a driver-side merge of the last ≤ fanin
      blobs. At P=10k input partitions and fanin 64 that is two tiny
      shuffle rounds; at local scale usually zero.

This is the map-side-combine shape Catalyst builds for its own
partial aggregates, expressed for a Python UDAF whose state (the
filter) is too structured for Spark's builtin aggregate buffer.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dablooms_spark.core.counting_bloom import CountingBloom
from dablooms_spark.core.scaling_bloom import ScalingBloom
from dablooms_spark.functions.arrow_utils import arrow_byte_view
from dablooms_spark.functions.murmur import DABLOOMS_SEED, dablooms_hash_words_buffer

_BLOB_SCHEMA = "shard long, blob binary, n long"
_BLOB_SCHEMA_PA = pa.schema(
    [("shard", pa.int64()), ("blob", pa.large_binary()), ("n", pa.int64())]
)


def _loads(blob: bytes, seed: int):
    """Kind-dispatching deserializer (blobs are self-describing)."""
    from dablooms_spark.core.serde import loads

    return loads(blob, seed=seed)


def _tree_merge(blob_df: DataFrame, seed: int, fanin: int, collect_threshold: int = 256):
    """Merge a DataFrame of (shard, blob, n) rows down to one filter.

    Shuffles only blobs. Rounds of groupBy(shard // fanin) until few
    enough rows remain to merge on the driver.
    """

    def merge_group(pdf):
        import pandas as pd

        filt = _loads(pdf.blob.iloc[0], seed)
        for b in pdf.blob.iloc[1:]:
            filt = filt.merge(_loads(b, seed))
        return pd.DataFrame(
            {
                "shard": [int(pdf.shard.min())],
                "blob": [filt.to_bytes()],
                "n": [int(pdf.n.sum())],
            }
        )

    blob_df = blob_df.persist()
    n = blob_df.count()
    if n == 0:
        blob_df.unpersist()
        return None, 0
    df = blob_df
    while n > collect_threshold:
        k = math.ceil(n / fanin)
        df = (
            df.withColumn("g", (F.col("shard") % F.lit(k)).cast("long"))
            .groupBy("g")
            .applyInPandas(
                lambda pdf: merge_group(pdf.assign(shard=pdf.g)),
                schema=_BLOB_SCHEMA,
            )
        )
        n = k
    rows = df.collect()
    blob_df.unpersist()
    filt = _loads(rows[0].blob, seed)
    total = rows[0].n
    for r in rows[1:]:
        filt = filt.merge(_loads(r.blob, seed))
        total += r.n
    return filt, total


def build_counting_bloom(
    df: DataFrame,
    key_col: str,
    capacity: int,
    error_rate: float,
    seed: int = DABLOOMS_SEED,
    num_build_partitions: int | None = None,
    merge_fanin: int = 64,
) -> CountingBloom:
    """Build one counting bloom over a key column, distributed.

    Exactness: the saturating counter-sum merge makes the result
    bit-identical to a single-process dablooms build over the same
    keys (any partitioning, any merge order), so no repartition is
    needed — each input partition builds locally and only blobs move.
    """
    sdf = df.select(F.col(key_col).alias("key")).filter(F.col("key").isNotNull())
    if num_build_partitions:
        sdf = sdf.repartition(num_build_partitions)

    def build_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        cb = CountingBloom(capacity, error_rate, seed=seed)
        from pyspark import TaskContext

        shard = TaskContext.get().partitionId() if TaskContext.get() else 0
        for batch in batches:
            buf, offs, lens = arrow_byte_view(batch.column(0))
            h1, h2 = dablooms_hash_words_buffer(buf, offs, lens, seed)
            cb.add_hashed(h1, h2)
        if cb.count:
            yield pa.RecordBatch.from_pydict(
                {"shard": [shard], "blob": [cb.to_bytes()], "n": [cb.count]},
                schema=_BLOB_SCHEMA_PA,
            )

    blob_df = sdf.mapInArrow(build_partition, schema=_BLOB_SCHEMA)
    filt, _ = _tree_merge(blob_df, seed, merge_fanin)
    if filt is None:
        return CountingBloom(capacity, error_rate, seed=seed)
    return filt


def build_scaling_bloom(
    df: DataFrame,
    key_col: str,
    id_col: str,
    capacity: int,
    error_rate: float,
    seed: int = DABLOOMS_SEED,
    num_shards: int | None = None,
    merge_fanin: int = 64,
) -> ScalingBloom:
    """Build a scaling counting bloom, distributed.

    Shards own disjoint, contiguous id ranges (repartitionByRange on
    the id column — ids are the reference's monotone insertion
    sequence, here a timestamp/row-id column), each shard runs the
    exact dablooms layer state machine over its range, and the merge
    concatenates layers. The per-shard error budget is ε/S so the
    compound false-positive bound stays ≤ ε after the union
    (nfuncs grows only by log2(S) — the cheap way to stay bounded).
    """
    spark = df.sparkSession
    if num_shards is None:
        num_shards = spark.sparkContext.defaultParallelism
    eps_shard = error_rate / num_shards

    sdf = (
        df.select(
            F.col(key_col).alias("key"), F.col(id_col).cast("long").alias("id")
        )
        .filter(F.col("key").isNotNull() & F.col("id").isNotNull())
        .repartitionByRange(num_shards, "id")
        .sortWithinPartitions("id")
    )

    def build_partition(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        shard = TaskContext.get().partitionId() if TaskContext.get() else 0
        sb = None
        for batch in batches:
            ids = batch.column(1).to_numpy(zero_copy_only=False).astype(np.int64)
            if len(ids) == 0:
                continue
            if sb is None:
                sb = ScalingBloom(capacity, eps_shard, seed=seed, start_id=int(ids[0]))
            buf, offs, lens = arrow_byte_view(batch.column(0))
            h1, h2 = dablooms_hash_words_buffer(buf, offs, lens, seed)
            sb.add_hashed(h1, h2, ids)
        if sb is not None:
            yield pa.RecordBatch.from_pydict(
                {"shard": [shard], "blob": [sb.to_bytes()], "n": [sb.count]},
                schema=_BLOB_SCHEMA_PA,
            )

    blob_df = sdf.mapInArrow(build_partition, schema=_BLOB_SCHEMA)
    filt, _ = _tree_merge(blob_df, seed, merge_fanin)
    if filt is None:
        return ScalingBloom(capacity, error_rate, seed=seed)
    return filt
