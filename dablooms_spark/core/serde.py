"""Magic-dispatching sketch deserializer — all blobs self-describe."""

from __future__ import annotations

from dablooms_spark.core.cms import CountMinSketch
from dablooms_spark.core.counting_bloom import CountingBloom
from dablooms_spark.core.hll import HyperLogLog
from dablooms_spark.core.kll import KLLSketch
from dablooms_spark.core.mg import MisraGries
from dablooms_spark.core.scaling_bloom import ScalingBloom
from dablooms_spark.core.tdigest import TDigest
from dablooms_spark.core.theta import ThetaSketch
from dablooms_spark.functions.murmur import DABLOOMS_SEED

_BY_MAGIC = {
    b"DBSK": "counting_bloom",
    b"DBSC": "scaling_bloom",
    b"DBHL": "hll",
    b"DBCM": "cms",
    b"DBTD": "tdigest",
    b"DBKL": "kll",
    b"DBTH": "theta",
    b"DBMG": "mg",
}


def loads(blob: bytes, seed: int = DABLOOMS_SEED):
    if blob is None or len(blob) < 8:
        raise ValueError(f"not a sketch blob: {len(blob or b'')} bytes")
    magic = bytes(blob[:4])
    kind = _BY_MAGIC.get(magic)
    if kind == "counting_bloom":
        return CountingBloom.from_bytes(bytes(blob), seed=seed)
    if kind == "scaling_bloom":
        return ScalingBloom.from_bytes(bytes(blob), seed=seed)
    if kind == "hll":
        return HyperLogLog.from_bytes(bytes(blob))
    if kind == "cms":
        return CountMinSketch.from_bytes(bytes(blob))
    if kind == "tdigest":
        return TDigest.from_bytes(bytes(blob))
    if kind == "kll":
        return KLLSketch.from_bytes(bytes(blob))
    if kind == "theta":
        return ThetaSketch.from_bytes(bytes(blob))
    if kind == "mg":
        return MisraGries.from_bytes(bytes(blob))
    raise ValueError(f"unknown sketch blob magic {magic!r}")
