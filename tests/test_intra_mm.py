"""Matmul-form prediction (intra_mm) must match the gather-form (intra)
bit-exactly, and grid_boundaries must match explicit index extraction."""

import numpy as np
import pytest

from hevctpu.ops import ctu, intra, intra_mm


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("is_luma", [True, False])
def test_predict_all_modes_mm_matches_gather(n, is_luma):
    rng = np.random.default_rng(100 + n)
    b = 5
    top_ext = rng.integers(0, 256, (b, 2 * n + 1)).astype(np.int32)
    left_ext = rng.integers(0, 256, (b, 2 * n + 1)).astype(np.int32)
    left_ext[:, 0] = top_ext[:, 0]
    tf, lf = intra.smooth_reference(top_ext, left_ext, n)
    want = np.asarray(intra.predict_all_modes(
        top_ext, left_ext, tf, lf, n, is_luma=is_luma))
    got = np.asarray(intra_mm.predict_all_modes_mm(
        top_ext, left_ext, tf, lf, n, is_luma=is_luma))
    assert (got == want).all(), (
        f"n={n} luma={is_luma}: mismatch at modes "
        f"{np.unique(np.argwhere(got != want)[:, 1])}")


@pytest.mark.parametrize("n", [8, 16, 32, 64])
def test_grid_boundaries_matches_indexing(n):
    rng = np.random.default_rng(7)
    b, hp, wp = 2, 128, 192
    plane = rng.integers(0, 256, (b, hp, wp)).astype(np.int32)
    got = np.asarray(intra_mm.grid_boundaries(plane, n))

    dy, dx = ctu.boundary_offsets(n)
    for r in range(hp // n):
        for c in range(wp // n):
            yy = np.clip(r * n + dy, 0, hp - 1)
            xx = np.clip(c * n + dx, 0, wp - 1)
            want = plane[:, yy, xx]
            # positions that clamp differently (below-left / above-right
            # out-of-plane) are unavailable by construction; compare only
            # in-plane exact reads
            iny = (r * n + dy >= -1) & (r * n + dy < hp)
            inx = (c * n + dx >= -1) & (c * n + dx < wp)
            m = iny & inx
            assert (got[:, r, c, m] == want[:, m]).all(), (r, c)
