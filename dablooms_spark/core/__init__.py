from dablooms_spark.core.geometry import BloomGeometry, ERROR_TIGHTENING_RATIO
from dablooms_spark.core.counting_bloom import CountingBloom
from dablooms_spark.core.scaling_bloom import ScalingBloom
from dablooms_spark.core.hll import HyperLogLog
from dablooms_spark.core.cms import CountMinSketch
from dablooms_spark.core.tdigest import TDigest
from dablooms_spark.core.kll import KLLSketch
from dablooms_spark.core.mg import MisraGries

__all__ = [
    "BloomGeometry",
    "ERROR_TIGHTENING_RATIO",
    "CountingBloom",
    "ScalingBloom",
    "HyperLogLog",
    "CountMinSketch",
    "TDigest",
    "KLLSketch",
    "MisraGries",
]
