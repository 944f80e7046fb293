"""SAO unit tests: the jnp applier and the scalar refimpl applier must
agree exactly, and the decided parameters must not increase distortion."""

import numpy as np

import jax.numpy as jnp

from hevctpu.codec import refimpl
from hevctpu.ops import sao


def _stats_and_params(org, rec, h, w, qp, span=64):
    ys = sao.ctu_stats(jnp.asarray(org), jnp.asarray(rec), h, w, span)
    # reuse the same stats for "chroma" so decide_params has all inputs
    st, se, sbp, soff = sao.decide_params(ys, ys, ys, qp, qp)
    return st, se, sbp, soff


def test_appliers_agree_and_gain():
    rng = np.random.default_rng(0)
    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w]
    org = (120 + 60 * np.sin(yy / 9.0) * np.cos(xx / 13.0)).astype(np.int32)
    rec = np.clip(org + rng.integers(-6, 7, (h, w)), 0, 255).astype(np.int32)
    st, se, sbp, soff = _stats_and_params(org[None], rec[None], h, w, 32)

    out_j = np.asarray(sao.apply_sao(jnp.asarray(rec[None]), st, se, sbp,
                                     soff, 0, h, w, 64))[0]
    params = {"type": np.asarray(st)[0], "eo": np.asarray(se)[0],
              "bp": np.asarray(sbp)[0], "off": np.asarray(soff)[0]}
    out_s = refimpl._sao_plane_np(rec.copy(), params, 0, h, w, 64)
    np.testing.assert_array_equal(out_j, out_s)

    sse_before = ((org - rec) ** 2).sum()
    sse_after = ((org - out_j) ** 2).sum()
    assert sse_after < sse_before  # noisy recon: SAO must help
    assert (np.asarray(st)[0] > 0).any()


def test_off_when_perfect():
    rng = np.random.default_rng(1)
    h, w = 64, 64
    org = rng.integers(0, 256, (h, w)).astype(np.int32)
    st, se, sbp, soff = _stats_and_params(org[None], org[None], h, w, 32)
    assert (np.asarray(st) == 0).all()  # zero residual: SAO off everywhere


def test_eo_category_matches_scalar():
    rng = np.random.default_rng(2)
    p = rng.integers(0, 256, (1, 32, 48)).astype(np.int32)
    h, w = 30, 45
    for cls in range(4):
        cat = np.asarray(sao.eo_category(jnp.asarray(p), cls, h, w))[0]
        dy, dx = sao.EO_NEIGHBORS[cls]
        for y in range(32):
            for x in range(48):
                ay, ax, by, bx = y - dy, x - dx, y + dy, x + dx
                if not (0 <= ay < h and 0 <= ax < w
                        and 0 <= by < h and 0 <= bx < w):
                    assert cat[y, x] == 0
                    continue
                s = int(np.sign(p[0, y, x] - p[0, ay, ax])) + int(
                    np.sign(p[0, y, x] - p[0, by, bx]))
                want = {-2: 1, -1: 2, 0: 0, 1: 3, 2: 4}[s]
                assert cat[y, x] == want, (cls, y, x)
