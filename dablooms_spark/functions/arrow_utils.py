"""Zero-copy views over pyarrow string/binary columns.

A pyarrow string/binary array is (validity, offsets, data) — exactly
the flat-buffer layout the hash kernel consumes. Extracting it avoids
any per-row Python object materialization (the input_hint hard
requirement: vectorized Arrow/pandas UDFs, never per-row Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_OFFSET_DTYPES = {
    pa.string(): np.int32,
    pa.binary(): np.int32,
    pa.large_string(): np.int64,
    pa.large_binary(): np.int64,
}


def arrow_byte_view(arr: "pa.Array | pa.ChunkedArray") -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(data uint8 buffer, offsets int64, lengths int64) for a pyarrow
    string/binary array. Zero-copy for the data buffer; nulls are
    treated as empty strings (callers should filter nulls upstream —
    `df.filter(col.isNotNull())` pushes down to the scan).
    """
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if isinstance(arr, pa.ChunkedArray):  # zero-chunk edge
        arr = pa.concat_arrays(arr.chunks) if arr.chunks else pa.array([], type=pa.string())

    t = arr.type
    if t == pa.string_view():  # Arrow 14+ string_view needs conversion
        arr = arr.cast(pa.string())
        t = arr.type
    off_dtype = _OFFSET_DTYPES.get(t)
    if off_dtype is None:
        # dictionary or other layout: fall back to a cast
        arr = arr.cast(pa.large_string() if pa.types.is_string(t) else pa.large_binary())
        off_dtype = np.int64

    buffers = arr.buffers()
    validity, offsets_buf, data_buf = buffers[0], buffers[1], buffers[2]
    n = len(arr)
    raw_offsets = np.frombuffer(offsets_buf, dtype=off_dtype, count=n + 1 + arr.offset)
    offsets = raw_offsets[arr.offset : arr.offset + n + 1].astype(np.int64)
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, np.uint8)
    )
    starts = offsets[:-1].copy()
    lengths = offsets[1:] - offsets[:-1]
    if validity is not None and arr.null_count:
        mask = np.asarray(arr.is_null())
        lengths = np.where(mask, 0, lengths)
    return data, starts, lengths
