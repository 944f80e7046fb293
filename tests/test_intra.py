"""Vectorized intra prediction vs the scalar spec implementation."""

import numpy as np
import pytest

from hevctpu.ops import intra
from tests import spec_intra


def _random_refs(n, rng):
    top = rng.integers(0, 256, 2 * n)
    left = rng.integers(0, 256, 2 * n)
    corner = int(rng.integers(0, 256))
    return top, left, corner


def _ext_arrays(top, left, corner):
    top_ext = np.concatenate([[corner], top]).astype(np.int32)
    left_ext = np.concatenate([[corner], left]).astype(np.int32)
    return top_ext, left_ext


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("is_luma", [True, False])
def test_all_modes_match_spec(n, is_luma):
    if not is_luma and n == 32:
        pytest.skip("chroma max 16 in 4:2:0 (up to 32 unused)")
    rng = np.random.default_rng(n)
    top, left, corner = _random_refs(n, rng)
    r = spec_intra.RefSamples(top, left, corner)
    rf = spec_intra.filter_refs(r, n)

    top_ext, left_ext = _ext_arrays(top, left, corner)
    tf = np.concatenate([[rf.corner], rf.top]).astype(np.int32)
    lf = np.concatenate([[rf.corner], rf.left]).astype(np.int32)
    got = np.asarray(intra.predict_all_modes(
        top_ext[None], left_ext[None], tf[None], lf[None], n, is_luma=is_luma))[0]

    for mode in range(35):
        use_f = spec_intra.should_filter(mode, n, is_luma)
        want = spec_intra.predict(rf if use_f else r, mode, n, is_luma=is_luma)
        assert (got[mode] == want).all(), (
            f"mode {mode} n {n} luma {is_luma}\n"
            f"got\n{got[mode][:4,:4]}\nwant\n{want[:4,:4]}")


@pytest.mark.parametrize("n", [4, 8, 16, 32])
def test_smooth_reference_matches_spec(n):
    rng = np.random.default_rng(10 + n)
    top, left, corner = _random_refs(n, rng)
    # Force the strong-filter path sometimes with a flat ramp.
    if n == 32:
        top = np.linspace(30, 200, 2 * n).astype(np.int64)
        left = np.linspace(30, 90, 2 * n).astype(np.int64)
        corner = 30
    r = spec_intra.RefSamples(top, left, corner)
    rf = spec_intra.filter_refs(r, n)
    top_ext, left_ext = _ext_arrays(top, left, corner)
    tf, lf = intra.smooth_reference(top_ext[None], left_ext[None], n)
    assert (np.asarray(tf)[0][1:] == rf.top).all()
    assert (np.asarray(lf)[0][1:] == rf.left).all()
    assert np.asarray(tf)[0][0] == rf.corner


def test_fill_reference_substitution():
    rng = np.random.default_rng(0)
    n = 8
    for trial in range(20):
        top = rng.integers(0, 256, 2 * n)
        left = rng.integers(0, 256, 2 * n)
        corner = int(rng.integers(0, 256))
        at = rng.random(2 * n) < 0.6
        al = rng.random(2 * n) < 0.6
        ac = bool(rng.random() < 0.6)
        if trial == 0:
            at[:], al[:], ac = False, False, False
        want = spec_intra.substitute(top, left, corner, at, al, ac)

        boundary = np.concatenate([left[::-1], [corner], top]).astype(np.int32)
        avail = np.concatenate([al[::-1], [ac], at])
        filled = np.asarray(intra.fill_reference(boundary[None], avail[None]))[0]
        top_ext, left_ext = intra.split_boundary(filled[None], n)
        assert (np.asarray(top_ext)[0][1:] == want.top).all()
        assert (np.asarray(left_ext)[0][1:] == want.left).all()
        assert np.asarray(top_ext)[0][0] == want.corner


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("is_luma", [True, False])
def test_predict_one_mode_matches_all(n, is_luma):
    rng = np.random.default_rng(77 + n)
    B = 6
    tops = rng.integers(0, 256, (B, 2 * n)).astype(np.int32)
    lefts = rng.integers(0, 256, (B, 2 * n)).astype(np.int32)
    corners = rng.integers(0, 256, (B, 1)).astype(np.int32)
    top_ext = np.concatenate([corners, tops], axis=-1)
    left_ext = np.concatenate([corners, lefts], axis=-1)
    tf, lf = intra.smooth_reference(top_ext, left_ext, n)
    allm = np.asarray(intra.predict_all_modes(
        top_ext, left_ext, tf, lf, n, is_luma=is_luma))
    modes = np.concatenate([np.arange(6), rng.integers(0, 35, B - 6)]).astype(np.int32)[:B]
    one = np.asarray(intra.predict_one_mode(
        top_ext, left_ext, tf, lf, modes, n, is_luma=is_luma))
    for i in range(B):
        assert (one[i] == allm[i, modes[i]]).all(), (i, modes[i], n, is_luma)
