"""pydablooms-compatible API surface.

The reference ships a CPython binding exposing a `Dablooms` class
(public pydablooms/pydablooms.c: `add` ≈L90, `delete` ≈L115,
`check`/`__contains__` ≈L140, `flush`/`create_dablooms`/
`load_dablooms` ≈L160–220). A user of the reference can switch to
this class one-for-one; under the hood it is the same ScalingBloom
the distributed operators build, so filters created here merge with
cluster-built ones and vice versa.

Single-key calls exist for drop-in compatibility; they are the slow
path by design — the engine's native surface is batch/DataFrame
(`add_many`, `check_many`, operators.bloom_build / bloom_probe).
"""

from __future__ import annotations

import os

import numpy as np

from dablooms_spark.core.scaling_bloom import ScalingBloom
from dablooms_spark.functions.murmur import DABLOOMS_SEED


class Dablooms:
    """Scaling counting bloom with the reference's binding surface."""

    def __init__(self, capacity: int, error_rate: float, filepath: str,
                 _filter: ScalingBloom | None = None, seed: int = DABLOOMS_SEED):
        self.filepath = filepath
        self._filter = _filter or ScalingBloom(capacity, error_rate, seed=seed)

    # ---- reference surface -------------------------------------------------

    def add(self, key, id: int) -> bool:
        self._filter.add([_as_bytes(key)], [id])
        return True

    def delete(self, key, id: int) -> bool:
        self._filter.remove([_as_bytes(key)], [id])
        return True

    def check(self, key) -> bool:
        return bool(self._filter.check([_as_bytes(key)])[0])

    __contains__ = check

    def flush(self) -> None:
        """Durable write: temp file + atomic rename (the reference's
        msync + disk_seqnum commit, scaling_bloom_flush ≈L552)."""
        tmp = self.filepath + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(self._filter.to_bytes())
        os.replace(tmp, self.filepath)

    # ---- batch-native extensions -------------------------------------------

    def add_many(self, keys, ids) -> None:
        self._filter.add([_as_bytes(k) for k in keys], np.asarray(ids))

    def delete_many(self, keys, ids) -> None:
        self._filter.remove([_as_bytes(k) for k in keys], np.asarray(ids))

    def check_many(self, keys) -> np.ndarray:
        return self._filter.check([_as_bytes(k) for k in keys])

    @property
    def filter(self) -> ScalingBloom:
        return self._filter


def create_dablooms(capacity: int, error_rate: float, filepath: str) -> Dablooms:
    """Mirror of pydablooms.create_dablooms (≈L170)."""
    return Dablooms(capacity, error_rate, filepath)


def load_dablooms(capacity: int, error_rate: float, filepath: str) -> Dablooms:
    """Mirror of pydablooms.load_dablooms → new_scaling_bloom_from_file
    (≈L437). Unlike the reference, the blob is self-describing; the
    capacity/error_rate arguments are validated against it instead of
    trusted."""
    with open(filepath, "rb") as fh:
        filt = ScalingBloom.from_bytes(fh.read())
    if filt.capacity != capacity or abs(filt.error_rate - error_rate) > 1e-12:
        raise ValueError(
            f"stored filter is (capacity={filt.capacity}, error_rate="
            f"{filt.error_rate}); caller asked for ({capacity}, {error_rate})"
        )
    return Dablooms(capacity, error_rate, filepath, _filter=filt)


def _as_bytes(key) -> bytes:
    if isinstance(key, bytes):
        return key
    if isinstance(key, str):
        return key.encode("utf-8")
    return bytes(key)
