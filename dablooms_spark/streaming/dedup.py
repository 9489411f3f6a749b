"""Streaming first-seen dedup with bloom-bounded state.

Spark's native `dropDuplicates` on a stream keeps EVERY key in state
forever — unbounded memory on an unbounded key stream. This operator
makes the trade the reference library was built for (bitly: "have we
seen this URL?"): per-shard group state is ONE serialized counting
bloom, so state is bounded by the filter geometry regardless of
stream length, at the cost of an ε-bounded false-positive loss:

  * a key's FIRST occurrence is emitted unless the filter
    false-positives on it (probability ≤ error_rate at capacity);
  * a key's LATER occurrences are NEVER emitted (blooms have no
    false negatives — the dedup guarantee is hard).

Rows are emitted with their original columns. Within one micro-batch
a key is emitted at most once (first row in batch order).

State restore/replay comes from Structured Streaming's checkpoint;
the blob round-trips through the same serde as every other filter, so
a stream-built dedup filter can be merged or probed batch-side.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd

from dablooms_spark.core.counting_bloom import CountingBloom
from dablooms_spark.functions.murmur import DABLOOMS_SEED, dablooms_hash_words

STATE_SCHEMA = "blob binary"
_KEY = "__fs_key"
_SHARD = "__fs_shard"


def make_first_seen_updater(
    capacity: int,
    error_rate: float,
    num_shards: int,
    out_columns: list[str],
    seed: int = DABLOOMS_SEED,
    order_col: str | None = None,
):
    """State-update fn for applyInPandasWithState: group = shard,
    state = one counting-bloom blob, output = first-seen input rows
    (original columns).

    order_col: when given, ties within a chunk resolve to the row with
    the smallest order value (deterministic emitted payloads when a
    shard's micro-batch fits one Arrow chunk — the emitted KEY set is
    deterministic regardless). Without it, "first" is chunk order."""
    eps_shard = error_rate / num_shards

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            (blob,) = state.get
            cb = CountingBloom.from_bytes(bytes(blob), seed=seed)
        else:
            cb = CountingBloom(capacity, eps_shard, seed=seed)
        for pdf in pdfs:
            if pdf.empty:
                continue
            if order_col is not None:
                pdf = pdf.sort_values(order_col, kind="mergesort")
            # one candidate row per key per batch: first in (sorted)
            # chunk order
            firsts = pdf.drop_duplicates(subset=[_KEY], keep="first")
            keys = firsts[_KEY].to_numpy(dtype=object)
            h1, h2 = dablooms_hash_words(keys, seed)
            seen = cb.check_hashed(h1, h2)
            fresh = ~np.asarray(seen, dtype=bool)
            if fresh.any():
                cb.add_hashed(h1[fresh], h2[fresh])
                yield firsts.loc[fresh, out_columns]
        state.update((bytearray(cb.to_bytes()),))

    return update


def streaming_first_seen(
    stream_df,
    key_col: str,
    capacity: int,
    error_rate: float,
    num_shards: int = 8,
    seed: int = DABLOOMS_SEED,
    order_col: str | None = None,
):
    """Emit each stream row whose key has never been seen before, with
    bounded state (per-shard counting blooms, ε budget split across
    shards like the batch builder). Returns a streaming DataFrame with
    stream_df's columns; attach a sink + checkpointLocation.

    Key-hash sharding sends every occurrence of a key to the same
    group, so the no-duplicate guarantee holds across micro-batches
    and executors."""
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_columns = list(stream_df.columns)
    keyed = stream_df.withColumn(
        _KEY, F.col(key_col).cast("string")
    ).filter(F.col(_KEY).isNotNull())
    keyed = keyed.withColumn(
        _SHARD, F.pmod(F.xxhash64(F.col(_KEY)), F.lit(num_shards))
    )
    update = make_first_seen_updater(
        capacity, error_rate, num_shards, out_columns, seed, order_col
    )
    out_schema = keyed.select(*out_columns).schema
    return keyed.groupBy(_SHARD).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
