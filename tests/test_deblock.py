"""Vectorized deblocking (ops/deblock) vs the scalar spec implementation
(codec/refimpl.deblock_frame_np)."""

import numpy as np
import pytest

from hevctpu.codec import refimpl
from hevctpu.ops import deblock


@pytest.mark.parametrize("qp", [22, 32, 45])
@pytest.mark.parametrize("seed", [0, 1])
def test_deblock_matches_scalar(qp, seed):
    rng = np.random.default_rng(seed)
    h, w = 128, 192
    b = 2
    # random recon with block-structured content so edges actually filter
    y = rng.integers(0, 256, (b, h, w)).astype(np.int32)
    y += rng.integers(-40, 40, (b, h // 16, w // 16)).repeat(16, 1).repeat(16, 2)
    y = np.clip(y, 0, 255)
    u = rng.integers(0, 256, (b, h // 2, w // 2)).astype(np.int32)
    v = rng.integers(0, 256, (b, h // 2, w // 2)).astype(np.int32)
    # random legal leaf-TU map: constant log2 size per 16x16 block, 2..5
    # (2/3 both mean 8-grid edges; 4/5 are coarser TU grids)
    t16 = rng.integers(2, 6, (b, h // 16, w // 16))
    tusz8 = t16.repeat(2, 1).repeat(2, 2).astype(np.int32)
    # legalize: a 32-TU slot must start 32-aligned — clamp misaligned ones
    for sy in range(h // 8):
        for sx in range(w // 8):
            if tusz8[:, sy, sx].max() == 5 and (sy % 4 or sx % 4):
                tusz8[:, sy, sx] = np.minimum(tusz8[:, sy, sx], 4)

    gy, gu, gv = (np.asarray(p) for p in deblock.deblock_frame(
        y, u, v, tusz8, qp, h, w))

    for i in range(b):
        wy, wu, wv = refimpl.deblock_frame_np(
            y[i].copy(), u[i].copy(), v[i].copy(), tusz8[i], qp, h, w)
        assert (gy[i] == wy).all(), (
            f"luma mismatch qp={qp}: {np.argwhere(gy[i] != wy)[:5]}")
        assert (gu[i] == wu).all()
        assert (gv[i] == wv).all()


def test_smooth_image_unchanged_inside_blocks():
    """Deblock only touches +-3 samples around 8-grid TU edges."""
    h, w = 64, 64
    y = np.full((1, h, w), 100, np.int32)
    y[:, :, 32:] = 160
    u = np.full((1, 32, 32), 128, np.int32)
    v = u.copy()
    tusz8 = np.full((1, 8, 8), 5, np.int32)
    gy, _, _ = (np.asarray(p) for p in deblock.deblock_frame(
        y, u, v, tusz8, 37, h, w))
    # columns far from any 8-grid edge are untouched
    assert (gy[0][:, 4:5] == 100).all()
    assert (gy[0][:, 60:61] == 160).all()
    # the step edge at x=32 got smoothed
    assert (gy[0][:, 29:35] != np.asarray(y)[0][:, 29:35]).any()
