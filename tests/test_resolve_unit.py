"""Host-level unit tests for the speculative resolve walk.

`entropy/speculative._resolve` is a pure host function over the probe's
[L, 7] link table, so link misses, the optimistic walk-past-miss
continuation, and its mispredict/invalidate repair can be exercised
DETERMINISTICALLY with synthetic tables -- photographic test content
rarely produces misses at all.  (Reference semantics anchor: the serial
block walk these links shortcut, decoder.c:339-388.)
"""

from __future__ import annotations

import numpy as np
import pytest

from jpeg_tpu.entropy.speculative import (
    R_ALIVE,
    R_BLK,
    R_M,
    R_PAY,
    R_PRET,
    R_SIG,
    R_TAIL0,
    _resolve,
)
from jpeg_tpu.utils.metrics import default_metrics

BPM = 4
CB_BITS = 4096
OV_BITS = 1024


def sig_enc(rel2: int, slot: int) -> int:
    return ((rel2 << 4) | slot) + 1


def pay_enc(k: int, variant: int, slot: int) -> int:
    return (k << 8) | (variant << 4) | slot


class Chain:
    """A consistent single-frame truth chain over R_real rows."""

    def __init__(self, r_real: int, r_pad: int = 0, seed: int = 0):
        rng = np.random.default_rng(seed)
        self.R_real = r_real
        self.R = r_real + r_pad
        self.row_base = np.array([0, r_real], dtype=np.int64)
        self.win_bits = np.full(self.R, CB_BITS + OV_BITS, np.int64)
        self.win_bits[r_real:] = 0
        self.t = rng.integers(0, BPM, r_real)  # true variant per row
        self.t[0] = 0  # row 0's authority is variant 0 by protocol
        self.k = rng.integers(0, 5, r_real)  # sync-record blk ordinal
        self.k[0] = 0
        self.nb = rng.integers(20, 40, r_real)  # true blocks per row
        self.rel = rng.integers(0, OV_BITS - 1, r_real)  # link bit pos
        self.slot = rng.integers(0, BPM, r_real)
        self.res = np.zeros((self.R * BPM, 7), np.int64)

    def link(self, r: int, lane_v: int) -> None:
        """Give lane (r, lane_v) the true outgoing link into r+1."""
        ln = r * BPM + lane_v
        self.res[ln, R_SIG] = sig_enc(self.rel[r + 1], self.slot[r + 1])
        self.res[ln, R_PAY] = pay_enc(
            self.k[r + 1], self.t[r + 1], self.slot[r + 1]
        )
        self.res[ln, R_M] = self.k[r] + self.nb[r]

    def endrec(self, r: int, lane_v: int) -> None:
        self.res[r * BPM + lane_v, R_BLK] = self.k[r] + self.nb[r]

    def missrec(self, r: int, lane_v: int, handoff_rel: int = 7,
                handoff_slot: int = 2) -> None:
        """Lane (r, lane_v): no link, but a strip tail-0 handoff."""
        ln = r * BPM + lane_v
        self.res[ln, R_SIG] = 0
        self.res[ln, R_TAIL0] = ((CB_BITS + handoff_rel) << 4 | handoff_slot) + 1
        self.res[ln, R_PRET] = self.k[r] + self.nb[r]

    def truth_rec(self, r: int) -> np.ndarray:
        """What a re-probe of row r from its true handoff start returns
        (k counts restart at 0)."""
        rec = np.zeros(7, np.int64)
        if r < self.R_real - 1:
            rec[R_SIG] = sig_enc(self.rel[r + 1], self.slot[r + 1])
            rec[R_PAY] = pay_enc(
                self.k[r + 1], self.t[r + 1], self.slot[r + 1]
            )
            rec[R_M] = self.nb[r]  # k_of == 0 after a handoff
        rec[R_BLK] = self.nb[r]
        return rec

    def resolve(self, probe_calls: list):
        def probe(rows, sbit, sslot, nbits, vm, steps):
            probe_calls.append(list(rows))
            return np.stack([self.truth_rec(r) for r in rows]), vm

        return _resolve(
            self.res, None, 1, self.R, BPM, self.row_base, self.win_bits,
            CB_BITS, OV_BITS, 12, probe, None, 64, self.R * BPM,
            R_real=self.R_real,
        )


def counters():
    return dict(default_metrics.counters)


def test_clean_chain_zero_rounds():
    ch = Chain(10, r_pad=6)
    for r in range(9):
        ch.link(r, ch.t[r])
    ch.endrec(9, ch.t[9])
    calls = []
    out = ch.resolve(calls)
    assert not isinstance(out, str), out
    v_of, k_of, f_start, f_slot, nblk = out
    assert calls == []  # no re-probe round at all
    assert list(v_of[:10]) == list(ch.t)
    assert list(nblk[:10]) == list(ch.nb)
    assert list(k_of[1:10]) == list(ch.k[1:])
    assert list(f_start[1:10]) == list(ch.rel[1:])
    assert (nblk[10:] == 0).all()  # padding rows contribute nothing


def test_isolated_misses_repair_in_one_round():
    """Two isolated misses in ONE frame repair in a single re-probe
    round: the walk continues past each miss on the converged variants'
    majority vote (round-2 advisor finding: the old walk broke at the
    first miss, serializing one repair per round per frame)."""
    ch = Chain(12)
    for r in range(11):
        if r in (3, 6):
            ch.missrec(r, ch.t[r])
        else:
            ch.link(r, ch.t[r])
    # the missed-into rows still carry converged variant lanes (their
    # own outgoing links), enabling the optimistic vote
    for r in (4, 7):
        for v in range(BPM):
            if v != ch.t[r]:
                ch.link(r, v)
                ch.res[r * BPM + v, R_M] = 999  # vote uses sig/pay only
    ch.endrec(11, ch.t[11])
    before = counters().get("speculative.reprobe_rounds", 0)
    calls = []
    out = ch.resolve(calls)
    assert not isinstance(out, str), out
    v_of, k_of, f_start, f_slot, nblk = out
    assert calls == [[4, 7]]  # ONE batched round, both rows together
    assert counters()["speculative.reprobe_rounds"] == before + 1
    assert v_of[4] == BPM and v_of[7] == BPM  # re-probe authorities
    assert nblk[4] == ch.nb[4] and nblk[7] == ch.nb[7]
    # handoff starts at the predecessor's tail-0 record
    assert f_start[4] == 7 and f_slot[4] == 2
    # rows continued past the miss kept their true links
    assert list(nblk[:12]) == list(ch.nb)


def test_mispredicted_continuation_self_repairs():
    """All of row 4's variant lanes vote a WRONG link; the re-probe
    disagrees, the downstream rows invalidate, and the next rounds
    converge to the true chain anyway."""
    ch = Chain(10)
    for r in range(9):
        if r == 3:
            ch.missrec(r, ch.t[r])
        else:
            ch.link(r, ch.t[r])
    # row 4's other variants unanimously vote a bogus link (simulates
    # variants that converged to a common WRONG trajectory)
    bogus_sig = sig_enc(11, 1)
    bogus_pay = pay_enc(2, ch.t[5], 1)
    for v in range(BPM):
        if v != ch.t[4]:
            ln = 4 * BPM + v
            ch.res[ln, R_SIG] = bogus_sig
            ch.res[ln, R_PAY] = bogus_pay
    ch.res[4 * BPM + ch.t[4], R_SIG] = 0  # true variant lane: no link
    ch.endrec(9, ch.t[9])
    before = counters().get("speculative.optimistic_mispredicts", 0)
    calls = []
    out = ch.resolve(calls)
    assert not isinstance(out, str), out
    v_of, k_of, f_start, f_slot, nblk = out
    assert counters()["speculative.optimistic_mispredicts"] == before + 1
    assert calls[0] == [4]
    assert list(nblk[:10]) == list(ch.nb)
    assert f_start[5] == ch.rel[5]  # bogus rel=11 was rolled back


def test_unresolvable_miss_falls_back():
    """A miss whose target row has no converged variants and whose
    re-probe also fails to link -> the walk hands a string reason back
    (the caller falls back to the serial oracle)."""
    ch = Chain(6)
    for r in range(5):
        if r == 2:
            ch.missrec(r, ch.t[r])
        else:
            ch.link(r, ch.t[r])
    ch.endrec(5, ch.t[5])

    def probe(rows, sbit, sslot, nbits, vm, steps):
        return np.zeros((len(rows), 7), np.int64), vm  # no link, ever

    out = _resolve(
        ch.res, None, 1, ch.R, BPM, ch.row_base, ch.win_bits,
        CB_BITS, OV_BITS, 4, probe, None, 64, ch.R * BPM,
        R_real=ch.R_real,
    )
    assert isinstance(out, str)
