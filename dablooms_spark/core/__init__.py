from dablooms_spark.core.geometry import BloomGeometry, ERROR_TIGHTENING_RATIO
from dablooms_spark.core.counting_bloom import CountingBloom
from dablooms_spark.core.scaling_bloom import ScalingBloom

__all__ = [
    "BloomGeometry",
    "ERROR_TIGHTENING_RATIO",
    "CountingBloom",
    "ScalingBloom",
]
