"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode step itself is STUBBED (no image/audio libraries in this
container): `decode_media` raises NotImplementedError unless
`fake=True`, in which case a deterministic hash-derived feature vector
stands in for real decoded features. Everything around the stub —
schema, Arrow batch shape, mapInPandas plumbing, partition-preserving
layout — is real and tested, so swapping in a real decoder (PIL,
ffmpeg, torchvision) is a one-function change on a cluster that has
the libraries.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# magic-byte sniffing — pure Catalyst, no Python. MP4 is handled
# separately: its signature is 'ftyp' at byte offset 4 (the first 4
# bytes are the box length), not a fixed prefix.
_MAGICS = [
    ("image/png", b"\x89PNG"),
    ("image/jpeg", b"\xff\xd8\xff"),
    ("image/gif", b"GIF8"),
    ("audio/wav", b"RIFF"),
    ("text/html", b"<htm"),
]


def with_media_meta(df: DataFrame, binary_col: str = "html") -> DataFrame:
    """Typed metadata columns from an opaque binary column:
    byte length and sniffed mime (JVM-side magic-byte CASE chain)."""
    mime = F.when(
        F.substring(F.col(binary_col), 5, 4) == F.lit(b"ftyp"), F.lit("video/mp4")
    ).otherwise(F.lit("application/octet-stream"))
    for name, magic in reversed(_MAGICS):
        mime = F.when(
            F.substring(F.col(binary_col), 1, len(magic)) == F.lit(magic), F.lit(name)
        ).otherwise(mime)
    return df.withColumn("media_bytes", F.length(F.col(binary_col))).withColumn(
        "media_mime", mime
    )


MEDIA_FEATURE_DIM = 16


def decode_media(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "row_id",
    fake: bool = False,
    batch_note: str = "image",
) -> DataFrame:
    """Decode/feature-extract a binary media column via mapInPandas.

    Output schema: (id, media_bytes long, features array<float>) —
    one Arrow batch in, one out, no row explosion; partitioning is
    preserved (no shuffle). With fake=False this raises
    NotImplementedError from the executors: the real decoder is not
    available in this environment (documented stub).
    """
    schema = f"{id_col} long, media_bytes long, features array<float>"

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    f"no {batch_note} decoder available in this environment; "
                    "pass fake=True for the deterministic stand-in"
                )
            import pyarrow as pa

            # deterministic fake features: normalized byte histogram
            # folded to MEDIA_FEATURE_DIM buckets — stable across runs.
            # Vectorized over the whole batch: one flat byte buffer +
            # offsets (Arrow binary layout), one bincount of
            # doc_index*DIM + byte%DIM — no per-row Python loop, the
            # same shape a real vectorized decoder would use.
            # large_binary: 64-bit offsets — a batch of ~1 MB blobs at
            # default Arrow batch sizes exceeds the 2 GiB int32 limit
            barr = pa.array(pdf[binary_col], type=pa.large_binary())
            if isinstance(barr, pa.ChunkedArray):
                barr = barr.combine_chunks()
            offsets = np.frombuffer(barr.buffers()[1], dtype=np.int64)[
                barr.offset : barr.offset + len(barr) + 1
            ].astype(np.int64)
            data_buf = barr.buffers()[2]
            flat = (
                np.frombuffer(data_buf, dtype=np.uint8)[offsets[0] : offsets[-1]]
                if data_buf is not None
                else np.empty(0, np.uint8)
            )
            offsets = offsets - offsets[0]
            n = len(barr)
            lens = np.diff(offsets)
            doc_of = np.repeat(np.arange(n, dtype=np.int64), lens)
            codes = doc_of * MEDIA_FEATURE_DIM + (flat % MEDIA_FEATURE_DIM)
            hist = np.bincount(codes, minlength=n * MEDIA_FEATURE_DIM).reshape(
                n, MEDIA_FEATURE_DIM
            )
            totals = np.maximum(lens, 1)
            feats = (hist / totals[:, None]).astype(np.float32)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "media_bytes": lens,
                    "features": list(feats),
                }
            )

    return df.select(id_col, binary_col).mapInPandas(decode, schema=schema)


def sample_frames(
    df: DataFrame,
    binary_col: str,
    id_col: str,
    every_n_bytes: int = 4096,
    max_frames: int = 8,
) -> DataFrame:
    """Frame-sampling plumbing: one output row per sampled 'frame'
    (byte-offset slice) — the explode-shaped transform a real video
    pipeline needs, with deterministic offsets. The slice itself is a
    real binary substring; only the *decoding* of a slice is stubbed.
    """
    n_frames = F.least(
        F.greatest((F.length(binary_col) / every_n_bytes).cast("int"), F.lit(1)),
        F.lit(max_frames),
    )
    frames = F.transform(
        F.sequence(F.lit(0), n_frames - 1),
        lambda i: F.substring(
            F.col(binary_col), i * every_n_bytes + 1, every_n_bytes
        ),
    )
    return (
        df.select(F.col(id_col), F.posexplode(frames).alias("frame_idx", "frame"))
        .withColumn("frame_bytes", F.length("frame"))
    )


def resize_media(
    df: DataFrame,
    binary_col: str = "html",
    id_col: str = "row_id",
    width: int = 8,
    height: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Resize plumbing for opaque image bytes via mapInPandas:
    (id, out_w, out_h, resized binary). As with decode_media the real
    decoder is STUBBED (no image libs in this container); fake=True
    treats the payload as a square single-channel bitmap (side =
    floor(sqrt(len))) and nearest-neighbor-samples it to width*height
    bytes — deterministic, so the batch shape, schema and partition
    behavior (no shuffle, no row explosion) are real and tested, and
    swapping in PIL/torchvision is a one-function change."""
    schema = f"{id_col} long, out_w int, out_h int, resized binary"

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "no image decoder available in this environment; "
                    "pass fake=True for the deterministic stand-in"
                )
            out = []
            for b in pdf[binary_col]:
                arr = np.frombuffer(b, dtype=np.uint8)
                if len(arr) == 0:
                    # empty payload: deterministic all-zero frame (the
                    # reshape below would raise on a 0-byte image)
                    out.append(bytes(width * height))
                    continue
                side = max(int(len(arr) ** 0.5), 1)
                img = arr[: side * side].reshape(side, side)
                yi = np.minimum((np.arange(height) * side) // height, side - 1)
                xi = np.minimum((np.arange(width) * side) // width, side - 1)
                out.append(img[np.ix_(yi, xi)].tobytes())
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "out_w": np.full(len(pdf), width, np.int32),
                    "out_h": np.full(len(pdf), height, np.int32),
                    "resized": out,
                }
            )

    return df.select(id_col, binary_col).mapInPandas(resize, schema=schema)
