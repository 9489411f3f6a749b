from dablooms_spark.operators.bloom_build import (
    build_counting_bloom,
    build_scaling_bloom,
)
from dablooms_spark.operators.bloom_probe import (
    bloom_probe_column,
    bloom_semi_join,
    bloom_anti_join,
)

__all__ = [
    "build_counting_bloom",
    "build_scaling_bloom",
    "bloom_probe_column",
    "bloom_semi_join",
    "bloom_anti_join",
]
