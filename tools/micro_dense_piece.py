"""Deterministic interleaved micro A/B: sparse vs dense layer pieces.

Reproduces the evidence behind the dense-piece drain encoding in
scaling_bloom_fixed_partials (BENCH/BASELINE.md "Dense layer pieces"):
one FULL layer slice at the paired-bench shape — 200k rows x nfuncs
indices into the 81-layer uniform-schedule geometry (capacity 200k,
eps 0.01) — pushed end-to-end through both piece paths:

  sparse: np.unique (whole-space sort) -> gap/exception delta codec ->
          merge via delta_decode + np.add.at scatter
  dense:  per-KM-band bincount (band space is L2-resident) ->
          raw clipped uint8 counters -> merge via vector add

Both paths must produce the identical merged counter array (asserted),
and min(15, sum(min(15, t_i))) == min(15, sum(t_i)) makes the shipped
artifact invariant to the choice. In-process interleaved trials cancel
host-epoch drift (the box swings ~3.5x between epochs, see
BENCH/BASELINE.md); min AND median are reported.

Usage: python tools/micro_dense_piece.py [rows_per_layer] [trials]
Prints one JSON line.
"""

import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from dablooms_spark.core.codec import delta_decode, delta_encode  # noqa: E402
from dablooms_spark.core.geometry import BloomGeometry  # noqa: E402
from dablooms_spark.operators.bloom_build import fixed_layer_eps  # noqa: E402


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    g = BloomGeometry(200_000, fixed_layer_eps(3, 0.01, 81))
    size, nf, cpf = g.size, g.nfuncs, g.counts_per_func
    rng = np.random.default_rng(3)

    def mk_slice(n: int) -> np.ndarray:
        # km_expand-shaped banded indices from random hash words
        h1 = rng.integers(0, 2**32, n, dtype=np.uint32)
        h2 = rng.integers(0, 2**32, n, dtype=np.uint32)
        i = np.arange(nf, dtype=np.uint32)
        with np.errstate(over="ignore"):
            mixed = h1[:, None] + i[None, :] * h2[:, None]
        idx = mixed % np.uint32(cpf)
        idx += (i * np.uint32(cpf))[None, :]
        return idx.ravel()

    # 8 Arrow-batch-sized chunks, as piece_stage would accumulate them
    chunks = [mk_slice(rows // 8) for _ in range(8)]

    def sparse_path(chs):
        nz, cnts = np.unique(np.concatenate(chs), return_counts=True)
        gaps, exc = delta_encode(nz.astype(np.int64))
        vals = np.minimum(cnts, 15).astype(np.uint8).tobytes()
        acc = np.zeros(size, dtype=np.int32)
        idx = delta_decode(gaps, exc)
        np.add.at(
            acc, idx, np.frombuffer(vals, dtype=np.uint8).astype(np.int32)
        )
        np.clip(acc, 0, 15, out=acc)
        return acc.astype(np.uint8), len(gaps) + len(exc) + len(vals)

    def dense_path(chs):
        cat = np.concatenate(chs).reshape(-1, nf)
        out = np.empty(size, dtype=np.uint8)
        for b in range(nf):
            db = np.bincount(cat[:, b] - b * cpf, minlength=cpf)
            np.minimum(db, 15, out=db)
            out[b * cpf:(b + 1) * cpf] = db
        payload = out.tobytes()
        acc = np.zeros(size, dtype=np.int32)
        acc += np.frombuffer(payload, dtype=np.uint8)
        np.clip(acc, 0, 15, out=acc)
        return acc.astype(np.uint8), len(payload)

    a, bytes_sparse = sparse_path(chunks)
    b, bytes_dense = dense_path(chunks)
    assert np.array_equal(a, b), "paths disagree — encoding bug"

    for _ in range(2):  # warm caches/allocator
        sparse_path(chunks)
        dense_path(chunks)
    ts, td = [], []
    for _ in range(trials):  # interleaved: epoch drift divides out
        t0 = time.perf_counter()
        sparse_path(chunks)
        ts.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        dense_path(chunks)
        td.append(time.perf_counter() - t0)
    print(json.dumps({
        "rows_per_layer": rows, "layer_size": size, "nfuncs": nf,
        "trials": trials, "identical": True,
        "payload_bytes": {"sparse": bytes_sparse, "dense": bytes_dense},
        "sparse_ms": {"min": round(min(ts) * 1000, 1),
                      "median": round(statistics.median(ts) * 1000, 1)},
        "dense_ms": {"min": round(min(td) * 1000, 1),
                     "median": round(statistics.median(td) * 1000, 1)},
        "speedup": {
            "min": round(min(ts) / min(td), 2),
            "median": round(
                statistics.median(ts) / statistics.median(td), 2
            ),
        },
    }))


if __name__ == "__main__":
    main()
