"""Counting/scaling bloom core tests — reproduces the semantics of the
reference's test suite (public src/test_dablooms.c, see SURVEY.md §5.1)
on a synthetic word corpus, plus distributed-merge properties the
single-process reference never needed (north_rule).
"""

import random

import numpy as np
import pytest

from dablooms_spark.core import BloomGeometry, CountingBloom, ScalingBloom


def make_words(n: int, seed: int = 42, prefix: str = "w") -> list:
    rng = random.Random(seed)
    # distinct deterministic pseudo-words, lowercase ascii len 3-24
    out = []
    for i in range(n):
        ln = rng.randrange(3, 25)
        out.append(
            (prefix + "".join(chr(rng.randrange(97, 123)) for _ in range(ln)) + str(i)).encode()
        )
    return out


# ---- geometry ----------------------------------------------------------


def test_geometry_formulas():
    g = BloomGeometry(100000, 0.05)
    # nfuncs = ceil(log2(1/0.05)) = ceil(4.3219) = 5
    assert g.nfuncs == 5
    # cpf = ceil(100000 * |ln .05| / (5 * ln^2 2))
    import math

    expect = math.ceil(100000 * abs(math.log(0.05)) / (5 * math.log(2) ** 2))
    assert g.counts_per_func == expect
    assert g.size == 5 * expect
    assert g.num_nibble_bytes == (g.size + 1) // 2


def test_geometry_tightening_schedule():
    g = BloomGeometry(1000, 0.05)
    assert g.tightened(0).error_rate == pytest.approx(0.025)
    assert g.tightened(2).error_rate == pytest.approx(0.05 * 0.125)
    assert g.tightened(0).capacity == 1000  # constant per-layer capacity


# ---- counting bloom ----------------------------------------------------


def test_counting_bloom_no_false_negatives_and_fp_bound():
    cap, eps = 5000, 0.05
    words = make_words(cap)
    absent = make_words(cap, seed=99, prefix="absent")
    cb = CountingBloom(cap, eps)
    cb.add(words)
    assert cb.count == cap
    assert cb.check(words).all(), "false negative — bloom invariant violated"
    fp = cb.check(absent).sum() / len(absent)
    assert fp <= eps * 1.2, f"fp rate {fp} exceeds bound"


def test_counting_bloom_remove_then_negative():
    """Mirror of test_counting_remove_reopen: add all, remove every
    other, removed words report absent (mod FP), kept all present."""
    cap, eps = 4000, 0.05
    words = make_words(cap)
    cb = CountingBloom(cap, eps)
    cb.add(words)
    removed = words[::2]
    kept = words[1::2]
    cb.remove(removed)
    assert cb.check(kept).all()
    fp = cb.check(removed).sum() / len(removed)
    assert fp <= eps * 1.2


def test_counting_bloom_serde_roundtrip():
    cb = CountingBloom(1000, 0.01, first_id=7)
    words = make_words(500)
    cb.add(words)
    blob = cb.to_bytes()
    cb2 = CountingBloom.from_bytes(blob)
    assert np.array_equal(cb.counters, cb2.counters)
    assert cb2.count == 500 and cb2.first_id == 7
    assert cb2.geometry == cb.geometry
    assert cb2.to_bytes() == blob


def test_counting_bloom_saturation():
    cb = CountingBloom(100, 0.05)
    key = [b"same-key"]
    for _ in range(40):
        cb.add(key)
    assert cb.counters.max() == 15  # saturated, not wrapped
    cb2 = CountingBloom(100, 0.05)
    cb2.add(key * 40)  # same adds in one batch
    assert np.array_equal(cb.counters, cb2.counters)
    for _ in range(40):
        cb.remove(key)
    assert cb.counters.min() == 0  # clamped, never negative


def test_counting_merge_exactness_and_invariance():
    """Saturating counter-sum merge == single-node build, bit-identical,
    under any merge order (north_rule merge-order invariance)."""
    cap, eps = 3000, 0.05
    words = make_words(cap)
    single = CountingBloom(cap, eps)
    single.add(words)

    rng = random.Random(1)
    for trial in range(3):
        shuffled = words[:]
        rng.shuffle(shuffled)
        k = rng.choice([3, 5, 8])
        parts = [shuffled[i::k] for i in range(k)]
        shards = []
        for p in parts:
            cb = CountingBloom(cap, eps)
            cb.add(p)
            shards.append(cb)
        rng.shuffle(shards)
        merged = shards[0]
        for s in shards[1:]:
            merged = merged.merge(s)
        assert merged.to_bytes() == single.to_bytes(), f"trial {trial}"


def test_counting_merge_rejects_geometry_mismatch():
    a = CountingBloom(1000, 0.05)
    b = CountingBloom(2000, 0.05)
    with pytest.raises(ValueError):
        a.merge(b)


# ---- scaling bloom -----------------------------------------------------


def test_scaling_layer_growth_and_schedule():
    cap, eps = 1000, 0.05
    n = 3500  # > 3 * capacity → at least 4 layers
    words = make_words(n)
    sb = ScalingBloom(cap, eps)
    sb.add(words, np.arange(n))
    assert len(sb.layers) >= 4
    for i, layer in enumerate(sb.layers):
        assert layer.geometry.error_rate == pytest.approx(eps * 0.5 ** (i + 1))
        assert layer.count <= cap - 1  # grow at count >= capacity-1
    assert sb.count == n
    assert sb.max_id == n - 1


def test_scaling_accuracy():
    """Mirror of test_scaling_accuracy: add every other word with
    increasing id, check all; FP ≤ ε compound across layers, FN = 0."""
    cap, eps = 1000, 0.05
    n = 4000
    words = make_words(n)
    sb = ScalingBloom(cap, eps)
    evens = words[::2]
    sb.add(evens, np.arange(len(evens)))
    assert sb.check(evens).all(), "false negative"
    odds = words[1::2]
    fp = sb.check(odds).sum() / len(odds)
    assert fp <= eps * 1.2, f"compound fp {fp} exceeds bound"


def test_scaling_remove_routed_by_id():
    """Mirror of test_scaling_remove_reopen semantics."""
    cap, eps = 1000, 0.05
    n = 2500
    words = make_words(n)
    ids = np.arange(n)
    sb = ScalingBloom(cap, eps)
    sb.add(words, ids)
    rm_idx = np.arange(0, n, 2)
    sb.remove([words[i] for i in rm_idx], ids[rm_idx])
    kept_idx = np.arange(1, n, 2)
    assert sb.check([words[i] for i in kept_idx]).all()
    fp = sb.check([words[i] for i in rm_idx]).sum() / len(rm_idx)
    assert fp <= eps * 1.2


def test_scaling_serde_roundtrip():
    sb = ScalingBloom(500, 0.05)
    words = make_words(1200)
    sb.add(words, np.arange(1200))
    blob = sb.to_bytes()
    sb2 = ScalingBloom.from_bytes(blob)
    assert sb2.to_bytes() == blob
    assert sb2.count == sb.count and len(sb2.layers) == len(sb.layers)
    assert sb2.check(words[:100]).all()


def test_scaling_distributed_merge_disjoint_ranges():
    """Shards own disjoint id ranges (start_id set per shard); merge is
    layer concatenation, invariant to merge order, zero FN."""
    cap, eps = 500, 0.05
    n = 3000
    words = make_words(n)
    nshards = 4
    bounds = np.linspace(0, n, nshards + 1).astype(int)
    shards = []
    for s in range(nshards):
        lo, hi = bounds[s], bounds[s + 1]
        sb = ScalingBloom(cap, eps / nshards, start_id=lo)
        sb.add(words[lo:hi], np.arange(lo, hi))
        shards.append(sb)

    rng = random.Random(3)
    blobs = set()
    for _ in range(3):
        order = shards[:]
        rng.shuffle(order)
        m = order[0]
        for s in order[1:]:
            m = m.merge(s)
        blobs.add(m.to_bytes())
    assert len(blobs) == 1, "merge order changed the serialized filter"

    merged = ScalingBloom.from_bytes(next(iter(blobs)))
    assert merged.check(words).all(), "false negative after distributed merge"
    absent = make_words(2000, seed=5, prefix="nope")
    fp = merged.check(absent).sum() / len(absent)
    assert fp <= eps * 1.2


def test_scaling_historic_ids_route_to_old_layers():
    cap, eps = 500, 0.05
    words = make_words(1500)
    sb = ScalingBloom(cap, eps)
    sb.add(words, np.arange(1500))
    nlayers = len(sb.layers)
    counts_before = [l.count for l in sb.layers]
    # a late row with an old id must land in the historic layer, no growth
    sb.add([b"late-arrival"], [10])
    assert len(sb.layers) == nlayers
    assert sb.layers[0].count == counts_before[0] + 1
    assert sb.check([b"late-arrival"])[0]


def test_strict_overflow_mode_survives_serde():
    """ADVICE r2: on_overflow='error' must round-trip through
    to_bytes/from_bytes (header flag bit), keeping the reference-parity
    refusal semantics after a checkpoint/restore."""
    import pytest

    from dablooms_spark.core.counting_bloom import CountingBloom

    cb = CountingBloom(100, 0.05, on_overflow="error")
    cb.add([b"k%d" % i for i in range(50)])
    back = CountingBloom.from_bytes(cb.to_bytes())
    assert back.on_overflow == "error"
    assert back.to_bytes() == cb.to_bytes()
    with pytest.raises(OverflowError):
        back.remove([b"not-there"])
    # default mode still round-trips as saturate
    sat = CountingBloom(100, 0.05)
    sat.add([b"x"])
    assert CountingBloom.from_bytes(sat.to_bytes()).on_overflow == "saturate"
