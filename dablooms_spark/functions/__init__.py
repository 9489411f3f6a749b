from dablooms_spark.functions.murmur import (
    murmur3_x64_128,
    murmur3_x64_128_scalar,
    dablooms_hash_words,
)
from dablooms_spark.functions.hashing import km_indexes

__all__ = [
    "murmur3_x64_128",
    "murmur3_x64_128_scalar",
    "dablooms_hash_words",
    "km_indexes",
]
