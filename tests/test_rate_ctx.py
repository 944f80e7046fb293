"""Context-exact rate estimator vs the golden CABAC coder.

estimate_tu_bits_ctx prices the exact residual_coding bin stream at
frozen I-slice-init context states. The reference here drives the golden
SliceEncoder._residual bin stream (codec/syntax.py) through a counting
engine whose contexts are frozen at init — the two must agree to float
rounding for every TU. A second check bounds the gap to the *adapting*
counter (the reference's TEncBinCABACCounter behavior) on random TUs.
"""

import numpy as np
import pytest

from hevctpu import rom
from hevctpu.codec import headers
from hevctpu.codec.cabac import CabacCounter, ContextSet
from hevctpu.codec.syntax import SliceEncoder
from hevctpu.ops import rate
from hevctpu.ops.rate_ctx import estimate_tu_bits_ctx


class _FrozenCounter(CabacCounter):
    """Counting engine that never advances context states."""

    def encode_bin(self, ctx, b):
        is_lps = 1 if b != ctx.mps else 0
        self.frac += int(CabacCounter._ENT[2 * ctx.state + is_lps])


class _TuCoder:
    """Minimal host shim: runs SliceEncoder._residual on one TU."""

    def __init__(self, qp, blk, comp, sbh=True, frozen=True):
        n = blk.shape[0]
        self.cfg = headers.StreamConfig(
            width=64, height=64, qp=qp, transform_skip=False,
            sign_data_hiding=sbh)
        self.levels = {comp: blk}
        self.ts4 = None
        self.ts_c = {}
        self.ctx = ContextSet(qp, init_type=0)
        self.c = _FrozenCounter() if frozen else CabacCounter()

    _residual = SliceEncoder._residual
    _code_last = SliceEncoder._code_last
    _code_remaining = SliceEncoder._code_remaining
    _last_prefix = staticmethod(SliceEncoder._last_prefix)


def _golden_bits(blk, qp, comp, mode=rom.DC_IDX, sbh=True, frozen=True):
    is_luma = comp == 0
    log2 = int(np.log2(blk.shape[0]))
    coder = _TuCoder(qp, blk, comp, sbh=sbh, frozen=frozen)
    coder._residual(0, 0, log2, comp, mode)
    return coder.c.bits


def _rand_tus(rng, n, count, density=0.2, mag=6):
    out = rng.integers(-mag, mag + 1, (count, n, n)).astype(np.int32)
    keep = rng.random((count, n, n)) < density
    out = np.where(keep, out, 0)
    # ensure at least one nonzero per TU (residual_coding precondition)
    out[:, 0, 0] = np.where((out != 0).any((-2, -1)), out[:, 0, 0], 1)
    return out


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("comp", [0, 1])
@pytest.mark.parametrize("qp", [22, 32])
def test_matches_frozen_golden(log2, comp, qp):
    if not (comp == 0 or log2 <= 4):
        pytest.skip("chroma TUs are at most 16x16")
    rng = np.random.default_rng(log2 * 10 + comp + qp)
    n = 1 << log2
    tus = np.concatenate([
        _rand_tus(rng, n, 24, density=0.15, mag=3),
        _rand_tus(rng, n, 24, density=0.5, mag=40),
        _rand_tus(rng, n, 8, density=0.03, mag=300),
    ])
    got = np.asarray(estimate_tu_bits_ctx(
        tus, log2, qp, is_luma=(comp == 0), include_cbf=False,
        calibrated=False)) \
        / rate.BITS_ONE
    for i in range(tus.shape[0]):
        want = _golden_bits(tus[i], qp, comp)
        assert abs(got[i] - want) < 0.02 + 1e-3 * want, (
            f"TU {i}: got {got[i]:.3f}, frozen-golden {want:.3f}")


@pytest.mark.parametrize("scan_idx", [rom.SCAN_HOR, rom.SCAN_VER])
def test_matches_frozen_golden_mode_scans(scan_idx):
    # 4x4/8x8 luma use hor/ver scans for near-vertical/horizontal modes
    mode = 8 if scan_idx == rom.SCAN_VER else 26
    qp = 32
    rng = np.random.default_rng(scan_idx)
    for log2 in (2, 3):
        n = 1 << log2
        tus = _rand_tus(rng, n, 24, density=0.3, mag=10)
        got = np.asarray(estimate_tu_bits_ctx(
            tus, log2, qp, is_luma=True, scan_idx=scan_idx,
            include_cbf=False, calibrated=False)) / rate.BITS_ONE
        for i in range(tus.shape[0]):
            want = _golden_bits(tus[i], qp, 0, mode=mode)
            assert abs(got[i] - want) < 0.02 + 1e-3 * want


def test_zero_tu_and_sbh_off():
    z = np.zeros((1, 8, 8), np.int32)
    got = np.asarray(estimate_tu_bits_ctx(z, 3, 32, include_cbf=False,
                                         calibrated=False))
    assert got[0] == 0.0
    rng = np.random.default_rng(0)
    tus = _rand_tus(rng, 8, 16, density=0.6, mag=4)
    on = np.asarray(estimate_tu_bits_ctx(tus, 3, 32, sbh=True,
                                         include_cbf=False,
                                         calibrated=False))
    off = np.asarray(estimate_tu_bits_ctx(tus, 3, 32, sbh=False,
                                          include_cbf=False,
                                          calibrated=False))
    for i in range(tus.shape[0]):
        want = _golden_bits(tus[i], 32, 0, sbh=False)
        assert abs(off[i] / rate.BITS_ONE - want) < 0.02 + 1e-3 * want
    assert (off >= on).all()


def test_tracks_adapting_counter_better_than_global_weights():
    """vs the *adapting* counter (true TEncBinCABACCounter pricing) the
    init-state estimate must beat the old global-weight estimate on
    mean relative error."""
    qp = 32
    rng = np.random.default_rng(99)
    tus = np.concatenate([
        _rand_tus(rng, 8, 40, density=0.25, mag=8),
        _rand_tus(rng, 16, 20, density=0.1, mag=8),
    ], axis=0) if False else _rand_tus(rng, 8, 60, density=0.25, mag=8)
    want = np.array([_golden_bits(t, qp, 0, frozen=False) for t in tus])
    got_ctx = np.asarray(estimate_tu_bits_ctx(
        tus, 3, qp, include_cbf=False, calibrated=False)) / rate.BITS_ONE
    got_old = np.asarray(rate.estimate_tu_bits(tus, 3, qp)) / rate.BITS_ONE
    err_ctx = np.abs(got_ctx - want) / np.maximum(want, 1.0)
    err_old = np.abs(got_old - want) / np.maximum(want, 1.0)
    assert err_ctx.mean() < err_old.mean()
    assert err_ctx.mean() < 0.08
