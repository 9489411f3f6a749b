"""Micro-bench: frequent_keys' local-candidate fold, Python-dict vs
Arrow-native (VERDICT r2 item 4).

The dict fold's cost scales with the number of distinct keys (one
Python str + dict op per key per batch); the Arrow fold's cost tracks
buffer sizes only. Run:  python tools/bench_candidate_fold.py
"""

import time

import numpy as np
import pyarrow as pa


def make_batches(n_batches: int, rows: int, distinct: int) -> list[pa.RecordBatch]:
    rng = np.random.default_rng(7)
    out = []
    for _ in range(n_batches):
        ks = rng.zipf(1.3, size=rows) % distinct
        arr = pa.array(np.char.add("user-", ks.astype(str))).cast(pa.large_string())
        out.append(pa.RecordBatch.from_arrays([arr], names=["k"]))
    return out


def dict_fold(batches, threshold):
    acc = {}
    for batch in batches:
        vc = pa.compute.value_counts(batch.column(0))
        ks = vc.field("values").to_pylist()
        cs = vc.field("counts").to_numpy(zero_copy_only=False)
        for kk, cc in zip(ks, cs):
            acc[kk] = acc.get(kk, 0) + int(cc)
    return sorted(k for k, c in acc.items() if c >= threshold)


def arrow_fold(batches, threshold):
    parts = []
    for batch in batches:
        vc = pa.compute.value_counts(batch.column(0))
        parts.append(pa.table({"k": vc.field("values"), "c": vc.field("counts")}))
    agg = pa.concat_tables(parts).group_by("k").aggregate([("c", "sum")])
    mask = pa.compute.greater_equal(agg.column("c_sum"), pa.scalar(threshold, pa.int64()))
    return sorted(agg.column("k").filter(mask).to_pylist())


def main():
    for distinct in (1_000, 100_000, 1_000_000):
        batches = make_batches(8, 250_000, distinct)
        threshold = 4
        t0 = time.perf_counter()
        a = dict_fold(batches, threshold)
        t_dict = time.perf_counter() - t0
        t0 = time.perf_counter()
        b = arrow_fold(batches, threshold)
        t_arrow = time.perf_counter() - t0
        assert a == b, "folds disagree"
        print(
            f"distinct={distinct:>9,}  dict={t_dict:6.3f}s  arrow={t_arrow:6.3f}s  "
            f"speedup={t_dict / t_arrow:4.1f}x"
        )


if __name__ == "__main__":
    main()
