"""Inter-prediction kernels vs scalar spec references.

Each kernel is pinned to an independent per-pixel transliteration of the
reference semantics: the two-pass 14-bit interpolation arithmetic
(TComInterpolationFilter.cpp:104-190), the bi-pred average
(TComYuv::addAvg), exhaustive SAD search, and the mvd_coding
binarization length.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from hevctpu.ops import inter


def _interp_scalar(plane, by, bx, mv, n, filters, fshift):
    """Per-pixel two-pass interpolation for one block (luma fshift=2,
    chroma fshift=3), with edge clamping as border extension."""
    taps = filters.shape[1]
    lo = taps // 2 - 1
    h, w = plane.shape
    iy, ix = int(mv[0]) >> fshift, int(mv[1]) >> fshift
    fy, fx = int(mv[0]) & ((1 << fshift) - 1), int(mv[1]) & ((1 << fshift) - 1)
    cfy, cfx = filters[fy], filters[fx]

    def at(y, x):
        return int(plane[min(max(y, 0), h - 1), min(max(x, 0), w - 1)])

    out = np.zeros((n, n), np.int64)
    if fy == 0 and fx == 0:
        for y in range(n):
            for x in range(n):
                out[y, x] = at(by + iy + y, bx + ix + x)
        return out
    if fy == 0:
        for y in range(n):
            for x in range(n):
                s = sum(int(cfx[k]) * at(by + iy + y, bx + ix + x - lo + k)
                        for k in range(taps))
                out[y, x] = np.clip((s + 32) >> 6, 0, 255)
        return out
    if fx == 0:
        for y in range(n):
            for x in range(n):
                s = sum(int(cfy[k]) * at(by + iy + y - lo + k, bx + ix + x)
                        for k in range(taps))
                out[y, x] = np.clip((s + 32) >> 6, 0, 255)
        return out
    # two-pass: horizontal into 14-bit intermediates, then vertical
    mid = np.zeros((n + taps - 1, n), np.int64)
    for y in range(n + taps - 1):
        for x in range(n):
            s = sum(int(cfx[k]) * at(by + iy + y - lo, bx + ix + x - lo + k)
                    for k in range(taps))
            mid[y, x] = s - (1 << 13)
    for y in range(n):
        for x in range(n):
            s = sum(int(cfy[k]) * mid[y + k, x] for k in range(taps))
            out[y, x] = np.clip((s + (1 << 11) + (1 << 19)) >> 12, 0, 255)
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_mc_luma_matches_scalar(seed):
    rng = np.random.default_rng(seed)
    n, h, w = 8, 32, 48
    plane = rng.integers(0, 256, (1, h, w), dtype=np.int32)
    mv = rng.integers(-12, 13, (1, h // n, w // n, 2), dtype=np.int32)
    got = np.asarray(inter.mc_luma_grid(plane, mv, n))
    for r in range(h // n):
        for c in range(w // n):
            want = _interp_scalar(plane[0], r * n, c * n, mv[0, r, c], n,
                                  inter.LUMA_FILTERS, 2)
            assert (got[0, r, c] == want).all(), (r, c, mv[0, r, c])


def test_mc_luma_all_fracs():
    rng = np.random.default_rng(7)
    n, h, w = 8, 16, 16
    plane = rng.integers(0, 256, (1, h, w), dtype=np.int32)
    for fy in range(4):
        for fx in range(4):
            mv = np.full((1, h // n, w // n, 2), 0, np.int32)
            mv[..., 0], mv[..., 1] = fy, fx
            got = np.asarray(inter.mc_luma_grid(plane, mv, n))
            want = _interp_scalar(plane[0], 0, 0, (fy, fx), n,
                                  inter.LUMA_FILTERS, 2)
            assert (got[0, 0, 0] == want).all(), (fy, fx)


def test_mc_chroma_matches_scalar():
    rng = np.random.default_rng(3)
    n, h, w = 4, 16, 24
    plane = rng.integers(0, 256, (1, h, w), dtype=np.int32)
    mv = rng.integers(-17, 18, (1, h // n, w // n, 2), dtype=np.int32)
    got = np.asarray(inter.mc_chroma_grid(plane, mv, n))
    for r in range(h // n):
        for c in range(w // n):
            want = _interp_scalar(plane[0], r * n, c * n, mv[0, r, c], n,
                                  inter.CHROMA_FILTERS, 3)
            assert (got[0, r, c] == want).all(), (r, c, mv[0, r, c])


def test_bi_average():
    rng = np.random.default_rng(1)
    a = rng.integers(-8192, 24576, (2, 8, 8)).astype(np.int32)
    b = rng.integers(-8192, 24576, (2, 8, 8)).astype(np.int32)
    got = np.asarray(inter.bi_average(a, b))
    want = np.clip((a.astype(np.int64) + b + 64 + 16384) >> 7, 0, 255)
    assert (got == want).all()


def test_sad_full_search_finds_planted_shift():
    rng = np.random.default_rng(5)
    n, h, w, sr = 8, 32, 32, 4
    ref = rng.integers(0, 256, (1, h, w), dtype=np.int32)
    dy, dx = 2, -3
    cur = np.roll(np.roll(ref, -dy, axis=1), -dx, axis=2)
    mv, sad = (np.asarray(x) for x in
               inter.sad_full_search(cur, ref, n, sr))
    # interior blocks (away from the wrap seam) must recover the shift
    assert (mv[0, 1:-1, 1:-1, 0] == dy * 4).all()
    assert (mv[0, 1:-1, 1:-1, 1] == dx * 4).all()
    assert (sad[0, 1:-1, 1:-1] == 0).all()


def test_frac_refine_recovers_half_pel():
    rng = np.random.default_rng(9)
    n, h, w = 8, 32, 32
    base = rng.integers(0, 256, (1, h + 8, w + 8), dtype=np.int32)
    ref = base[:, :h, :w]
    # build cur as the half-pel (2,2) interpolation of ref
    mvh = np.full((1, h // n, w // n, 2), 2, np.int32)
    cur = np.asarray(inter.mc_luma_grid(ref, mvh, n))
    cur = cur.swapaxes(2, 3).reshape(1, h, w)
    mv0 = np.zeros((1, h // n, w // n, 2), np.int32)
    mv, sad = (np.asarray(x) for x in
               inter.frac_refine(cur, ref, mv0, n))
    assert (mv[0, 1:-1, 1:-1] == 2).all()
    assert (sad[0, 1:-1, 1:-1] == 0).all()


def test_mvd_bits_matches_manual_eg1():
    def eg1_len(v):
        k, length = 1, 0
        while v >= (1 << k):
            v -= 1 << k
            k += 1
            length += 2
        return length + 1 + k

    vals = np.array([[0, 0], [1, -1], [2, 5], [-37, 300]], np.int32)
    got = np.asarray(inter.mvd_bits(vals))
    for i, (a, b) in enumerate(vals):
        want = 0
        for v in (abs(int(a)), abs(int(b))):
            if v == 0:
                want += 1
            elif v == 1:
                want += 3
            else:
                want += 2 + eg1_len(v - 2) + 1
        assert got[i] == want


def test_amvp_candidates_shift():
    f = np.arange(2 * 3 * 4 * 2, dtype=np.int32).reshape(2, 3, 4, 2)
    a, b = (np.asarray(x) for x in inter.amvp_candidates(f))
    assert (a[:, :, 1:] == f[:, :, :-1]).all() and (a[:, :, 0] == 0).all()
    assert (b[:, 1:] == f[:, :-1]).all() and (b[:, 0] == 0).all()


# ---------------------------------------------------------------------------
# Weighted prediction (WeightPredAnalysis.cpp:351-440,
# TComWeightPrediction.cpp:46-64)
# ---------------------------------------------------------------------------


def test_wp_estimate_identity():
    """Identical statistics -> default weight (1<<denom), zero offset."""
    w, o, ok = inter.wp_estimate(1000.0, 500.0, 1000.0, 500.0)
    assert int(w) == 64 and int(o) == 0 and bool(ok)


def test_wp_estimate_gain_and_offset():
    """A pure gain g maps to weight round(g*64); a pure DC shift maps to
    the offset (scalar arithmetic of xUpdatingWPParameters)."""
    n = 64 * 64
    # ref frame: per-sample DC 128, AC sum 10n; cur = 1.25x AC, +5 DC
    dc_r, ac_r = 128.0, 10.0 * n
    dc_c, ac_c = 133.0, 12.5 * n
    w, o, ok = inter.wp_estimate(dc_c, ac_c, dc_r, ac_r)
    assert bool(ok)
    assert int(w) == round(1.25 * 64)
    exp_off = ((int(dc_c) << 6) - int(w) * int(dc_r) + 32) >> 6
    assert int(o) == max(-128, min(127, exp_off))


def test_wp_apply_matches_scalar():
    """weightUnidir on the 14-bit intermediates vs the scalar formula."""
    rng = np.random.default_rng(0)
    pel = rng.integers(0, 256, (2, 8, 8)).astype(np.int32)
    p14 = (pel << 6) - (1 << 13)
    for w, o in ((64, 0), (80, -3), (40, 12)):
        got = np.asarray(inter.wp_apply(jnp.asarray(p14), w, o))
        shift = 6 + 6
        rnd = 1 << (shift - 1)
        exp = np.clip(((w * (p14 + (1 << 13)) + rnd) >> shift) + o, 0, 255)
        assert (got == exp).all(), (w, o)
    # default weight/offset reproduces the unweighted rounding exactly
    got = np.asarray(inter.wp_apply(jnp.asarray(p14), 64, 0))
    assert (got == pel).all()


def test_wp_apply_bi_matches_scalar():
    rng = np.random.default_rng(1)
    pel0 = rng.integers(0, 256, (1, 8, 8)).astype(np.int32)
    pel1 = rng.integers(0, 256, (1, 8, 8)).astype(np.int32)
    p0 = (pel0 << 6) - (1 << 13)
    p1 = (pel1 << 6) - (1 << 13)
    w0, o0, w1, o1 = 70, 2, 58, -1
    got = np.asarray(inter.wp_apply_bi(jnp.asarray(p0), jnp.asarray(p1),
                                       w0, o0, w1, o1))
    shift = 6 + 6 + 1
    rnd = 1 << (shift - 1)
    off = (o0 + o1 + 1) >> 1
    exp = np.clip((w0 * (p0 + (1 << 13)) + w1 * (p1 + (1 << 13))
                   + rnd + (off << (shift - 1))) >> shift, 0, 255)
    assert (got == exp).all()


def test_wp_select_prefers_weighting_on_fade():
    """A global fade: the weighted reference must win the SAD check."""
    rng = np.random.default_rng(2)
    ref = rng.integers(40, 200, (1, 32, 32)).astype(np.int32)
    cur = np.clip((ref * 0.7).astype(np.int32) + 10, 0, 255)
    dc_c, ac_c = (np.asarray(v) for v in inter.wp_acdc(jnp.asarray(cur)))
    dc_r, ac_r = (np.asarray(v) for v in inter.wp_acdc(jnp.asarray(ref)))
    w, o, ok = inter.wp_estimate(dc_c, ac_c, dc_r, ac_r)
    assert bool(ok.all())
    use = np.asarray(inter.wp_select(jnp.asarray(cur), jnp.asarray(ref),
                                     jnp.asarray(w)[:, None, None],
                                     jnp.asarray(o)[:, None, None]))
    assert bool(use.all())
    # and on an identical pair, weighting must NOT be selected
    use0 = np.asarray(inter.wp_select(jnp.asarray(ref), jnp.asarray(ref),
                                      64, 0))
    assert not bool(use0.any())


# ---------------------------------------------------------------------------
# Merge candidate derivation (8.5.3.2.3)
# ---------------------------------------------------------------------------


def test_merge_candidates_pruning():
    mvf = np.zeros((1, 3, 3, 2), np.int32)
    mvf[0, 0, 1] = (4, 0)     # above of center
    mvf[0, 1, 0] = (4, 0)     # left of center == above -> B1 pruned
    mvf[0, 0, 2] = (8, 8)     # above-right of center
    mvf[0, 2, 0] = (4, 0)     # below-left == A1 -> A0 pruned
    mvf[0, 0, 0] = (1, 2)     # above-left (B2)
    cands, valid = (np.asarray(a) for a in
                    inter.merge_candidates(jnp.asarray(mvf)))
    v = valid[0, 1, 1]
    c = cands[0, 1, 1]
    assert v[0] and (c[0] == (4, 0)).all()        # A1
    assert not v[1]                               # B1 pruned (== A1)
    assert v[2] and (c[2] == (8, 8)).all()        # B0 (differs from B1)
    assert not v[3]                               # A0 pruned (== A1)
    assert v[4] and (c[4] == (1, 2)).all()        # B2 (count < 4)
    # corner block: no left/above neighbors -> nothing valid
    assert not valid[0, 0, 0].any()
