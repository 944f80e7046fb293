"""Transform kernels vs an independent scalar (numpy int64) implementation
and vs hardcoded H.265 spec matrices."""

import numpy as np
import pytest

from hevctpu import rom
from hevctpu.ops import transforms


# Full 8x8 spec matrix, hardcoded independently of the generator.
SPEC_T8 = np.array([
    [64, 64, 64, 64, 64, 64, 64, 64],
    [89, 75, 50, 18, -18, -50, -75, -89],
    [83, 36, -36, -83, -83, -36, 36, 83],
    [75, -18, -89, -50, 50, 89, 18, -75],
    [64, -64, -64, 64, 64, -64, -64, 64],
    [50, -89, 18, 75, -75, -18, 89, -50],
    [36, -83, 83, -36, -36, 83, -83, 36],
    [18, -50, 75, -89, 89, -75, 50, -18],
])

SPEC_T4 = np.array([
    [64, 64, 64, 64],
    [83, 36, -36, -83],
    [64, -64, -64, 64],
    [36, -83, 83, -36],
])


def test_dct_matrices_match_spec():
    assert (rom.dct_matrix(4) == SPEC_T4).all()
    assert (rom.dct_matrix(8) == SPEC_T8).all()
    t16, t32 = rom.dct_matrix(16), rom.dct_matrix(32)
    # Row 0 flat; even rows embed the half-size matrix; first column known.
    assert (t16[0] == 64).all() and (t32[0] == 64).all()
    assert (t32[0::2, :16] == t16).all()
    assert (t16[0::2, :8] == SPEC_T8).all()
    assert list(t32[:, 0][:8]) == [64, 90, 90, 90, 89, 88, 87, 85]
    # Near-orthogonality: off-diagonal gram entries are tiny vs diagonal.
    for t in (SPEC_T4, SPEC_T8, t16, t32):
        g = t @ t.T
        off = g - np.diag(np.diag(g))
        assert np.abs(off).max() <= np.diag(g).min() * 0.01


def _np_fwd(res, t, s1, s2):
    res = res.astype(np.int64)
    t = t.astype(np.int64)
    tmp = (t @ res.T + (1 << (s1 - 1))) >> s1
    return ((t @ tmp.T + (1 << (s2 - 1))) >> s2).astype(np.int32)


def _np_inv(coef, t, bd=8):
    coef = coef.astype(np.int64)
    t = t.astype(np.int64)
    tmp = (t.T @ coef + 64) >> 7
    tmp = np.clip(tmp, -32768, 32767)
    s2 = 20 - bd
    return (((t.T @ tmp.T + (1 << (s2 - 1))) >> s2).T).astype(np.int32)


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("dst", [False, True])
def test_forward_inverse_match_scalar(log2, dst):
    if dst and log2 != 2:
        pytest.skip("DST only 4x4")
    n = 1 << log2
    rng = np.random.default_rng(7 + log2)
    res = rng.integers(-255, 256, size=(11, n, n)).astype(np.int32)
    t = rom.DST4 if dst else rom.dct_matrix(n)
    want_f = np.stack([_np_fwd(r, t, log2 + 8 - 9, log2 + 6) for r in res])
    got_f = np.asarray(transforms.forward_transform(res, log2, dst=dst))
    assert (got_f == want_f).all()

    coef = rng.integers(-32768, 32768, size=(11, n, n)).astype(np.int32)
    want_i = np.stack([_np_inv(c, t) for c in coef])
    got_i = np.asarray(transforms.inverse_transform(coef, log2, dst=dst))
    assert (got_i == want_i).all()


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
def test_roundtrip_reconstruction_quality(log2):
    """Lossless-QP roundtrip: fwd then inv recovers residual almost exactly."""
    n = 1 << log2
    rng = np.random.default_rng(3)
    res = rng.integers(-200, 201, size=(4, n, n)).astype(np.int32)
    coef = transforms.forward_transform(res, log2)
    back = np.asarray(transforms.inverse_transform(np.asarray(coef), log2))
    # The spec matrices are only near-orthogonal; error grows with size.
    assert np.abs(back - res).max() <= {2: 1, 3: 2, 4: 3, 5: 6}[log2]
