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
    # random legal depth map: constant depth per 16x16 block, depth 1..3
    d16 = rng.integers(1, 4, (b, h // 16, w // 16))
    depth8 = d16.repeat(2, 1).repeat(2, 2).astype(np.int32)

    gy, gu, gv = (np.asarray(p) for p in deblock.deblock_frame(
        y, u, v, depth8, qp, h, w))

    for i in range(b):
        wy, wu, wv = refimpl.deblock_frame_np(
            y[i].copy(), u[i].copy(), v[i].copy(), depth8[i], qp, h, w)
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
    depth8 = np.full((1, 8, 8), 1, np.int32)
    gy, _, _ = (np.asarray(p) for p in deblock.deblock_frame(
        y, u, v, depth8, 37, h, w))
    # columns far from any 8-grid edge are untouched
    assert (gy[0][:, 4:5] == 100).all()
    assert (gy[0][:, 60:61] == 160).all()
    # the step edge at x=32 got smoothed
    assert (gy[0][:, 29:35] != np.asarray(y)[0][:, 29:35]).any()
