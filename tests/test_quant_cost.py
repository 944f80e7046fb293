"""Quantization and distortion metric tests."""

import numpy as np
import pytest

from hevctpu import rom
from hevctpu.ops import cost, quant, transforms


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("qp", [22, 27, 32, 37, 51])
def test_dequant_matches_spec_scalar(log2, qp):
    rng = np.random.default_rng(log2 * 100 + qp)
    lvl = rng.integers(-3000, 3000, size=(5, 1 << log2, 1 << log2)).astype(np.int32)
    bd_shift = 8 + log2 - 5
    scale = int(rom.INV_QUANT_SCALES[qp % 6]) * 16
    want = np.clip(
        ((lvl.astype(np.int64) * scale << (qp // 6)) + (1 << (bd_shift - 1)))
        >> bd_shift, -32768, 32767).astype(np.int32)
    got = np.asarray(quant.dequantize(lvl, log2, qp))
    assert (got == want).all()


@pytest.mark.parametrize("qp", [22, 32, 45])
def test_quant_dequant_roundtrip_error_bounded(qp):
    """Quant then dequant reproduces coefficients within one quant step."""
    log2 = 3
    rng = np.random.default_rng(qp)
    coef = rng.integers(-20000, 20000, size=(8, 8, 8)).astype(np.int32)
    lvl = quant.quantize(coef, log2, qp)
    back = np.asarray(quant.dequantize(np.asarray(lvl), log2, qp))
    # step size in coefficient domain
    qbits = rom.QUANT_SHIFT + qp // 6 + quant.transform_shift(log2)
    step = (1 << qbits) / int(rom.QUANT_SCALES[qp % 6])
    assert np.abs(back - coef).max() <= step * 0.75


def test_satd_matches_scalar_hadamard():
    rng = np.random.default_rng(3)
    for n in (4, 8, 16, 32):
        a = rng.integers(0, 256, size=(3, n, n)).astype(np.int32)
        b = rng.integers(0, 256, size=(3, n, n)).astype(np.int32)
        got = np.asarray(cost.satd(a, b))

        h = np.array([[1]])
        while h.shape[0] < min(n, 8):
            h = np.block([[h, h], [h, -h]])
        want = []
        for i in range(3):
            d = (a[i] - b[i]).astype(np.int64)
            total = 0
            if n == 4:
                t = h @ d @ h.T
                total = (np.abs(t).sum() + 1) >> 1
            else:
                for y in range(0, n, 8):
                    for x in range(0, n, 8):
                        t = h @ d[y:y + 8, x:x + 8] @ h.T
                        total += (np.abs(t).sum() + 2) >> 2
            want.append(total)
        assert (got == np.array(want)).all()


def test_sse():
    rng = np.random.default_rng(4)
    a = rng.integers(0, 256, size=(2, 8, 8)).astype(np.int32)
    b = rng.integers(0, 256, size=(2, 8, 8)).astype(np.int32)
    want = ((a.astype(np.int64) - b) ** 2).sum(axis=(1, 2))
    assert (np.asarray(cost.sse(a, b)) == want).all()
