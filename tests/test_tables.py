"""Unit tests for Huffman table derivation + the K.2 optimizer."""

import numpy as np
import pytest

from jpeg_tpu.constants import DEFAULT_HTABLES
from jpeg_tpu.tables import HuffSpec, derive_table, optimize_table


@pytest.mark.parametrize("key", sorted(DEFAULT_HTABLES))
def test_default_specs_consistent(key):
    spec = HuffSpec.from_pair(DEFAULT_HTABLES[key])
    assert sum(spec.counts) == len(spec.values)


@pytest.mark.parametrize("key", sorted(DEFAULT_HTABLES))
def test_derivation_canonical_properties(key):
    t = derive_table(HuffSpec.from_pair(DEFAULT_HTABLES[key]))
    n = t.n_codes
    # sizes ascending, codes strictly increasing within a size
    assert (np.diff(t.huffsize) >= 0).all()
    for length in range(1, 17):
        sel = t.huffsize == length
        if sel.any():
            codes = t.huffcode[sel]
            assert (np.diff(codes) == 1).all()
            assert codes.max() < (1 << length)
    # prefix-free: left-aligned intervals are disjoint
    starts = t.huffcode.astype(np.int64) << (16 - t.huffsize)
    ends = starts + (np.int64(1) << (16 - t.huffsize))
    order = np.argsort(starts)
    assert (ends[order][:-1] <= starts[order][1:]).all()
    # LUT covers exactly the union of code intervals
    covered = (t.lut16 >= 0).sum()
    assert covered == (ends - starts).sum()
    # ehufco/ehufsi round-trip through the LUT
    for k in range(n):
        v = int(t.huffval[k])
        size, code = int(t.ehufsi[v]), int(t.ehufco[v])
        window = code << (16 - size)
        packed = int(t.lut16[window])
        assert packed >> 8 == v
        assert packed & 0xFF == size


def test_decode_tables_match_lut():
    t = derive_table(HuffSpec.from_pair(DEFAULT_HTABLES[(1, 0)]))
    rng = np.random.default_rng(0)
    for window in rng.integers(0, 1 << 16, size=500):
        window = int(window)
        # canonical search
        val = None
        for length in range(1, 17):
            if t.maxcode[length] < 0:
                continue
            prefix = window >> (16 - length)
            if prefix <= t.maxcode[length]:
                idx = t.valptr[length] + prefix - t.mincode[length]
                val = (int(t.huffval[idx]), length)
                break
        packed = int(t.lut16[window])
        if packed < 0:
            assert val is None
        else:
            assert val == (packed >> 8, packed & 0xFF)


def test_optimizer_single_symbol():
    # One symbol + reserved point: symbol gets a 1-bit code.
    freq = np.zeros(256, dtype=np.int64)
    freq[42] = 100
    spec = optimize_table(freq)
    assert spec.counts[0] == 1
    assert spec.values[0] == 42


def test_optimizer_prefix_and_optimality():
    rng = np.random.default_rng(1)
    freq = np.zeros(256, dtype=np.int64)
    used = rng.choice(256, size=40, replace=False)
    freq[used] = rng.integers(1, 10_000, size=40)
    spec = optimize_table(freq)
    t = derive_table(spec)
    # every used symbol has a code; no symbol uses the all-ones max code
    for v in used:
        assert t.ehufsi[v] > 0
    assert sorted(spec.values) == sorted(used.tolist())
    # Kraft inequality holds strictly (< 1 because of the reserved point)
    kraft = sum(2.0 ** -s for s in t.huffsize)
    assert kraft <= 1.0
    # max length 16
    assert t.huffsize.max() <= 16


def test_optimizer_tie_break_largest_value():
    # All-equal frequencies: the reference merges largest indices first.
    freq = np.zeros(256, dtype=np.int64)
    freq[[1, 2, 3, 4]] = 5
    spec = optimize_table(freq)
    t = derive_table(spec)
    # Optimal code exists and is decodable; exact shape is pinned by the
    # golden encoder test -- here just check determinism.
    spec2 = optimize_table(freq)
    assert spec == spec2
