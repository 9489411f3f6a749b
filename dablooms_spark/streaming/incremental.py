"""Structured Streaming incremental sketch build.

The reference mutates one mmap'd filter as events arrive
(scaling_bloom_add, src/dablooms.c:≈487) and flushes seqnums for
crash consistency (≈552). The Spark-native equivalent is a stateful
streaming aggregation: `applyInPandasWithState` keeps one serialized
scaling filter per shard as group state; every micro-batch routes its
rows into the filter exactly like the batch builder, and emits the
updated blob (count + layer metrics) downstream — checkpointing and
replay come from Structured Streaming's own offset/state story, which
subsumes the reference's mem/disk seqnum protocol.

Late data: dablooms' id routing IS the late-data policy — a row whose
id precedes the filter's max_id decrements/increments the historic
layer that owned its id range (≈L490), so no watermark-drop is needed
for correctness; a watermark may still bound state for windowed
variants.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd

from dablooms_spark.core.scaling_bloom import ScalingBloom
from dablooms_spark.functions.murmur import DABLOOMS_SEED, dablooms_hash_words

OUTPUT_SCHEMA = "shard long, blob binary, n long, layers int, max_id long"
STATE_SCHEMA = "blob binary"


def make_bloom_updater(
    capacity: int,
    error_rate: float,
    num_shards: int,
    seed: int = DABLOOMS_SEED,
):
    """State-update function for applyInPandasWithState.

    Input rows per group: (shard long, key string, id long).
    Group state: one serialized ScalingBloom (ε budget ε/num_shards,
    exactly the batch builder's split so stream- and batch-built
    filters merge interchangeably).
    """
    eps_shard = error_rate / num_shards

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (blob,) = state.get
            sb = ScalingBloom.from_bytes(bytes(blob), seed=seed)
        else:
            sb = None
        for pdf in pdfs:
            if pdf.empty:
                continue
            pdf = pdf.sort_values("id")
            keys = pdf.key.to_numpy(dtype=object)
            ids = pdf.id.to_numpy(dtype=np.int64)
            if sb is None:
                sb = ScalingBloom(
                    capacity, eps_shard, seed=seed, start_id=int(ids[0])
                )
            h1, h2 = dablooms_hash_words(keys, seed)
            sb.add_hashed(h1, h2, ids)
        if sb is None:
            return
        state.update((bytearray(sb.to_bytes()),))
        yield pd.DataFrame(
            {
                "shard": [int(key[0])],
                "blob": [sb.to_bytes()],
                "n": [sb.count],
                "layers": [len(sb.layers)],
                "max_id": [sb.max_id],
            }
        )

    return update


def streaming_bloom_update(
    stream_df,
    key_col: str,
    id_col: str,
    capacity: int,
    error_rate: float,
    num_shards: int = 8,
    seed: int = DABLOOMS_SEED,
):
    """Wire a streaming DataFrame into per-shard incremental scaling
    blooms. Returns the (streaming) DataFrame of updated blob rows —
    attach your sink (`writeStream`, usually with availableNow or a
    processingTime trigger + checkpointLocation).

    Sharding is by key hash (a key always lands in the same shard, so
    per-shard filters stay consistent under removes); ids within a
    shard arrive unordered across micro-batches and route historically,
    and the ε/num_shards budget keeps the merged compound FP ≤ ε
    exactly as in the batch builder.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    shard = F.pmod(F.xxhash64(F.col(key_col)), F.lit(num_shards)).alias("shard")
    keyed = stream_df.select(
        shard,
        F.col(key_col).cast("string").alias("key"),
        F.col(id_col).cast("long").alias("id"),
    ).filter(F.col("key").isNotNull() & F.col("id").isNotNull())

    update = make_bloom_updater(capacity, error_rate, num_shards, seed)
    return keyed.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
