"""Distributed remove (counter decrement) — reference ops
counting_bloom_remove (src/dablooms.c:≈220) and scaling_bloom_remove
(≈517) lifted to a deletions DataFrame.

The text bytes are hashed map-side (mapInArrow, zero-copy); only the
16 B/row hash words (plus the 8 B routing id for scaling filters)
leave the executors. The driver applies the decrements vectorized —
deletion sets are small relative to corpora, and 16 B/row means a
10M-row deletion set moves 160 MB, not the text. For larger deletion
streams, build an id-routed decrement filter with
scaling_bloom_partials and subtract blobs instead.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dablooms_spark.functions.arrow_utils import arrow_byte_view
from dablooms_spark.functions.murmur import DABLOOMS_SEED, dablooms_hash_words_buffer


def _hashed_rows(df: DataFrame, key_col: str, id_col: str | None, seed: int):
    cols = [F.col(key_col).cast("string").alias("key")]
    if id_col is not None:
        cols.append(F.col(id_col).cast("long").alias("id"))
    sdf = df.select(*cols).filter(F.col("key").isNotNull())

    has_id = id_col is not None

    def hash_stage(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            buf, offs, lens = arrow_byte_view(batch.column(0))
            h1, h2 = dablooms_hash_words_buffer(buf, offs, lens, seed)
            packed = (h1.astype(np.uint64) << np.uint64(32)) | h2.astype(np.uint64)
            cols_ = {"hw": packed.view(np.int64)}
            fields = [("hw", pa.int64())]
            if has_id:
                cols_["id"] = batch.column(1).to_numpy(zero_copy_only=False).astype(
                    np.int64
                )
                fields.append(("id", pa.int64()))
            yield pa.RecordBatch.from_pydict(cols_, schema=pa.schema(fields))

    schema = "hw long, id long" if has_id else "hw long"
    return sdf.mapInArrow(hash_stage, schema=schema)


def bloom_remove(filt, deletions: DataFrame, key_col: str,
                 id_col: str | None = None, seed: int = DABLOOMS_SEED):
    """Apply a deletions DataFrame to a driver-side filter, mutating it.

    CountingBloom needs no ids; ScalingBloom routes every deletion to
    the layer that held the insert by id (pass the same id/timestamp
    column the build used). Returns the filter for chaining.
    """
    from dablooms_spark.core.counting_bloom import CountingBloom
    from dablooms_spark.core.scaling_bloom import ScalingBloom

    if isinstance(filt, ScalingBloom) and id_col is None:
        raise ValueError("scaling-bloom removal requires the routing id column")
    hashed = _hashed_rows(deletions, key_col, id_col, seed)
    rows = hashed.toArrow()
    hw = rows.column("hw").to_numpy(zero_copy_only=False).view(np.uint64)
    h1 = (hw >> np.uint64(32)).astype(np.uint32)
    h2 = hw.astype(np.uint32)
    if isinstance(filt, CountingBloom):
        filt.remove_hashed(h1, h2)
    else:
        ids = rows.column("id").to_numpy(zero_copy_only=False).astype(np.int64)
        filt.remove_hashed(h1, h2, ids)
    return filt
