"""Batched HEVC intra prediction: reference-sample fill/filter and all-35-mode
prediction as vectorized gathers.

Equivalent of the reference's TComPattern (fillReferenceSamples /
initIntraPatternChType, TComPattern.cpp:119,326) and TComPrediction
(xPredIntraAng / xPredIntraPlanar / DC, TComPrediction.cpp:183-457) —
re-designed TPU-first: per-mode reference lines, fractional indices and
filter decisions are precomputed static tables, so predicting all 35 modes
for thousands of PUs is a handful of gathers + elementwise ops, with no
per-mode control flow.

Conventions:
  * ``top_ext``  [..., 2N+1]: index 0 is the corner p[-1][-1], index 1+x is
    p[x][-1] for x in [0, 2N).
  * ``left_ext`` [..., 2N+1]: index 0 is the corner, index 1+y is p[-1][y].
  * Predictions are [..., N, N] indexed [y, x].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hevctpu import rom

# ---------------------------------------------------------------------------
# Static per-size tables
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _angular_tables(n: int):
    """Static gather tables for the 33 angular modes at size n.

    Returns numpy arrays:
      src   [33, 3n+2]  0 -> gather from top_ext, 1 -> from left_ext
      idx   [33, 3n+2]  index into the chosen ext array (0..2n)
      didx  [33, n]     integer offset ((r+1)*angle)>>5
      fact  [33, n]     fractional weight ((r+1)*angle)&31
    Reference-line slot i holds ref[i - n] in spec terms (x in [-n, 2n+1]).
    """
    ln = 3 * n + 2
    src = np.zeros((33, ln), dtype=np.int32)
    idx = np.zeros((33, ln), dtype=np.int32)
    didx = np.zeros((33, n), dtype=np.int32)
    fact = np.zeros((33, n), dtype=np.int32)
    for mi, mode in enumerate(range(2, 35)):
        angle = int(rom.INTRA_PRED_ANGLE[mode - 2])
        vertical = mode >= 18
        main, side = (0, 1) if vertical else (1, 0)
        for i in range(ln):
            x = i - n
            if x >= 0:
                src[mi, i] = main
                idx[mi, i] = min(x, 2 * n)
            else:
                src[mi, i] = side
                if angle < 0:
                    inv = int(rom.INTRA_INV_ANGLE[mode - 11]) if 11 <= mode <= 25 else 0
                    j = (x * inv + 128) >> 8
                    idx[mi, i] = min(max(j, 0), 2 * n)
                else:
                    idx[mi, i] = 0  # unused
        for r in range(n):
            didx[mi, r] = ((r + 1) * angle) >> 5
            fact[mi, r] = ((r + 1) * angle) & 31
    return src, idx, didx, fact


@functools.lru_cache(maxsize=None)
def _filter_flags(n: int, strong_allowed: bool) -> np.ndarray:
    """use-filtered-reference flag per mode [35] (luma; H.265 8.4.4.2.3)."""
    del strong_allowed
    flags = np.zeros(35, dtype=bool)
    if n < 8:
        return flags
    thresh = rom.INTRA_FILTER_THRES[int(np.log2(n))]
    for mode in range(35):
        if mode == rom.DC_IDX:
            continue
        if mode == rom.PLANAR_IDX:
            flags[mode] = True
            continue
        min_dist = min(abs(mode - rom.HOR_IDX), abs(mode - rom.VER_IDX))
        flags[mode] = min_dist > thresh
    return flags


# ---------------------------------------------------------------------------
# Reference sample fill (availability substitution) and smoothing
# ---------------------------------------------------------------------------


def fill_reference(boundary: jnp.ndarray, avail: jnp.ndarray,
                   bit_depth: int = 8) -> jnp.ndarray:
    """Availability substitution over the boundary scan (H.265 8.4.4.2.2).

    ``boundary`` [..., 4N+1]: samples in scan order — left column bottom-to-top
    (p[-1][2N-1] ... p[-1][0]), corner, then top row left-to-right. ``avail``
    is a bool mask of the same shape. Unavailable samples take the value of
    the previous available one in scan order; leading unavailable samples
    take the first available; if none are available everything becomes
    1 << (bit_depth - 1)."""
    ln = boundary.shape[-1]
    pos = jnp.arange(ln, dtype=jnp.int32)
    marked = jnp.where(avail, pos, -1)
    fill_idx = jax.lax.cummax(marked, axis=boundary.ndim - 1)
    first = jnp.argmax(avail, axis=-1).astype(jnp.int32)[..., None]
    fill_idx = jnp.where(fill_idx < 0, first, fill_idx)
    out = jnp.take_along_axis(boundary, fill_idx, axis=-1)
    any_avail = jnp.any(avail, axis=-1, keepdims=True)
    return jnp.where(any_avail, out, 1 << (bit_depth - 1))


def split_boundary(boundary: jnp.ndarray, n: int):
    """Scan-order boundary [..., 4n+1] -> (top_ext, left_ext) [..., 2n+1]."""
    left = boundary[..., : 2 * n][..., ::-1]  # now p[-1][0] ... p[-1][2n-1]
    corner = boundary[..., 2 * n: 2 * n + 1]
    top = boundary[..., 2 * n + 1:]
    top_ext = jnp.concatenate([corner, top], axis=-1)
    left_ext = jnp.concatenate([corner, left], axis=-1)
    return top_ext, left_ext


def smooth_reference(top_ext: jnp.ndarray, left_ext: jnp.ndarray, n: int, *,
                     strong: bool = True, bit_depth: int = 8):
    """[1 2 1] smoothing of the reference arrays; for 32x32 with strong
    smoothing enabled, the bilinear strong filter replaces it when both
    boundaries are smooth (H.265 8.4.4.2.3)."""
    corner = top_ext[..., 0:1]

    def f121(ext):
        mid = (ext[..., :-2] + 2 * ext[..., 1:-1] + ext[..., 2:] + 2) >> 2
        c = (left_ext[..., 1:2] + 2 * corner + top_ext[..., 1:2] + 2) >> 2
        return jnp.concatenate([c, mid, ext[..., -1:]], axis=-1)

    top_f = f121(top_ext)
    left_f = f121(left_ext)

    if strong and n == 32:
        thr = 1 << (bit_depth - 5)
        flat_t = jnp.abs(corner + top_ext[..., 2 * n: 2 * n + 1]
                         - 2 * top_ext[..., n: n + 1]) < thr
        flat_l = jnp.abs(corner + left_ext[..., 2 * n: 2 * n + 1]
                         - 2 * left_ext[..., n: n + 1]) < thr
        use_strong = flat_t & flat_l
        i = jnp.arange(2 * n + 1, dtype=jnp.int32)

        def bilinear(ext):
            end = ext[..., 2 * n: 2 * n + 1]
            s = ((64 - i) * corner + i * end + 32) >> 6
            return jnp.concatenate([s[..., : 2 * n], end], axis=-1)

        top_f = jnp.where(use_strong, bilinear(top_ext), top_f)
        left_f = jnp.where(use_strong, bilinear(left_ext), left_f)
    return top_f, left_f


# ---------------------------------------------------------------------------
# Prediction
# ---------------------------------------------------------------------------


def _angular_all(top: jnp.ndarray, left: jnp.ndarray, n: int):
    """All 33 angular modes, generic orientation. Inputs [..., 33, 2n+1]
    already per-mode-selected (filtered or not). Output [..., 33, n, n] where
    modes >= 18 are [y, x] and modes < 18 are [x, y] (caller transposes)."""
    src, idx, didx, fact = _angular_tables(n)
    srcj = jnp.asarray(src)
    idxj = jnp.asarray(idx).reshape((1,) * (top.ndim - 2) + idx.shape)
    idxj = jnp.broadcast_to(idxj, top.shape[:-1] + (idx.shape[-1],))
    t = jnp.take_along_axis(top, idxj, axis=-1)
    l = jnp.take_along_axis(left, idxj, axis=-1)
    refline = jnp.where(srcj == 0, t, l)  # [..., 33, 3n+2]

    gidx = (np.arange(n)[None, None, :] + didx[:, :, None] + 1 + n)  # [33,n,n]
    gidx = np.minimum(gidx, 3 * n + 1)
    # Advanced-indexing gather: refline[..., m, gidx[m, r, c]]
    m_ix = np.broadcast_to(np.arange(33)[:, None, None], (33, n, n))
    a = refline[..., jnp.asarray(m_ix), jnp.asarray(gidx)]
    b = refline[..., jnp.asarray(m_ix), jnp.asarray(np.minimum(gidx + 1, 3 * n + 1))]
    f = jnp.asarray(fact)[:, :, None]
    return ((32 - f) * a + f * b + 16) >> 5


def predict_all_modes(top_ext: jnp.ndarray, left_ext: jnp.ndarray,
                      top_f: jnp.ndarray, left_f: jnp.ndarray, n: int, *,
                      is_luma: bool = True, bit_depth: int = 8) -> jnp.ndarray:
    """Predict all 35 intra modes. ext arrays [..., 2n+1]; out [..., 35, n, n].

    Chroma never filters references (4:2:0), and skips the DC/edge boundary
    filters, per H.265 8.4.4.2."""
    log2 = int(np.log2(n))
    maxv = (1 << bit_depth) - 1
    use_f = _filter_flags(n, True) if is_luma else np.zeros(35, dtype=bool)

    sel = jnp.asarray(use_f[2:], dtype=bool)[:, None]  # [33, 1] for angular
    topm = jnp.where(sel, top_f[..., None, :], top_ext[..., None, :])
    leftm = jnp.where(sel, left_f[..., None, :], left_ext[..., None, :])
    ang = _angular_all(topm, leftm, n)  # [..., 33, n, n]

    # Edge filters for exactly-horizontal / exactly-vertical (luma, n < 32):
    # in generic orientation both filter column 0 against the side reference.
    if is_luma and n < 32:
        corner = top_ext[..., 0:1]
        for mode, main, side in ((rom.VER_IDX, top_ext, left_ext),
                                 (rom.HOR_IDX, left_ext, top_ext)):
            mi = mode - 2
            col = jnp.clip(main[..., 1:2] + ((side[..., 1: n + 1] - corner) >> 1),
                           0, maxv)
            ang = ang.at[..., mi, :, 0].set(col)

    # Transpose the horizontal family (modes 2..17) back to [y, x].
    ang = jnp.where(jnp.asarray(np.arange(33) < 16)[:, None, None],
                    jnp.swapaxes(ang, -1, -2), ang)

    # Planar (filtered refs when luma allows it).
    tp = top_f if use_f[rom.PLANAR_IDX] else top_ext
    lp = left_f if use_f[rom.PLANAR_IDX] else left_ext
    xs = jnp.arange(n, dtype=jnp.int32)
    t_row = tp[..., 1: n + 1][..., None, :]          # [..., 1, n]
    l_col = lp[..., 1: n + 1][..., :, None]          # [..., n, 1]
    tr = tp[..., n + 1: n + 2][..., None, :]         # p[n][-1]
    bl = lp[..., n + 1: n + 2][..., :, None]         # p[-1][n]
    planar = ((n - 1 - xs)[None, :] * l_col + (xs + 1)[None, :] * tr
              + (n - 1 - xs)[:, None] * t_row + (xs + 1)[:, None] * bl
              + n) >> (log2 + 1)

    # DC (always unfiltered refs).
    dc = (jnp.sum(top_ext[..., 1: n + 1], axis=-1)
          + jnp.sum(left_ext[..., 1: n + 1], axis=-1) + n) >> (log2 + 1)
    dc_blk = jnp.broadcast_to(dc[..., None, None], planar.shape)
    if is_luma and n < 32:
        t_row_u = top_ext[..., 1: n + 1]
        l_col_u = left_ext[..., 1: n + 1]
        row0 = (t_row_u + 3 * dc[..., None] + 2) >> 2
        col0 = (l_col_u + 3 * dc[..., None] + 2) >> 2
        corner00 = (l_col_u[..., 0] + 2 * dc + t_row_u[..., 0] + 2) >> 2
        dc_blk = dc_blk.at[..., 0, :].set(row0)
        dc_blk = dc_blk.at[..., :, 0].set(col0)
        dc_blk = dc_blk.at[..., 0, 0].set(corner00)

    return jnp.concatenate(
        [planar[..., None, :, :], dc_blk[..., None, :, :], ang], axis=-3)


def predict_one_mode(top_ext, left_ext, top_f, left_f, mode, n, *,
                     is_luma=True, bit_depth=8):
    """Predict a single traced mode per batch element.

    ext arrays [..., 2n+1], mode [...] int32 in [0, 34]; out [..., n, n].
    Costs ~3 predictions (planar + DC + one angular) instead of 35: the
    per-mode gather tables are indexed by the traced mode.
    """
    log2 = int(np.log2(n))
    maxv = (1 << bit_depth) - 1
    use_f_tab = _filter_flags(n, True) if is_luma else np.zeros(35, dtype=bool)
    use_f = jnp.asarray(use_f_tab)[mode][..., None]          # [..., 1]
    top_in = jnp.where(use_f, top_f, top_ext)
    left_in = jnp.where(use_f, left_f, left_ext)

    # --- angular (generic orientation), tables gathered by mode ---
    src, idx, didx, fact = _angular_tables(n)
    mi = jnp.clip(mode - 2, 0, 32)
    src_r = jnp.asarray(src)[mi]                              # [..., 3n+2]
    idx_r = jnp.asarray(idx)[mi]
    t = jnp.take_along_axis(top_in, idx_r, axis=-1)
    l = jnp.take_along_axis(left_in, idx_r, axis=-1)
    refline = jnp.where(src_r == 0, t, l)                     # [..., 3n+2]
    didx_r = jnp.asarray(didx)[mi]                            # [..., n]
    fact_r = jnp.asarray(fact)[mi]
    gidx = jnp.minimum(didx_r[..., :, None] + np.arange(n)[None, :] + 1 + n,
                       3 * n + 1)                             # [..., n(r), n(c)]
    flat = gidx.reshape(*gidx.shape[:-2], n * n)
    a = jnp.take_along_axis(refline, flat, axis=-1).reshape(gidx.shape)
    b = jnp.take_along_axis(refline, jnp.minimum(flat + 1, 3 * n + 1),
                            axis=-1).reshape(gidx.shape)
    f = fact_r[..., :, None]
    ang = ((32 - f) * a + f * b + 16) >> 5

    corner = top_ext[..., 0:1]
    if is_luma and n < 32:
        is_ver = (mode == rom.VER_IDX)[..., None]
        is_hor = (mode == rom.HOR_IDX)[..., None]
        main = jnp.where(is_ver, top_ext[..., 1:2], left_ext[..., 1:2])
        side = jnp.where(is_ver, left_ext[..., 1: n + 1],
                         top_ext[..., 1: n + 1])
        col = jnp.clip(main + ((side - corner) >> 1), 0, maxv)
        ang = jnp.where((is_ver | is_hor)[..., None],
                        ang.at[..., :, 0].set(col), ang)
    ang = jnp.where((mode < 18)[..., None, None],
                    jnp.swapaxes(ang, -1, -2), ang)

    # --- planar (honors the mode-0 filter flag via top_in/left_in) ---
    tp = jnp.where(jnp.asarray(use_f_tab[rom.PLANAR_IDX]), top_f, top_ext)
    lp = jnp.where(jnp.asarray(use_f_tab[rom.PLANAR_IDX]), left_f, left_ext)
    xs = jnp.arange(n, dtype=jnp.int32)
    t_row = tp[..., 1: n + 1][..., None, :]
    l_col = lp[..., 1: n + 1][..., :, None]
    tr = tp[..., n + 1: n + 2][..., None, :]
    bl = lp[..., n + 1: n + 2][..., :, None]
    planar = ((n - 1 - xs)[None, :] * l_col + (xs + 1)[None, :] * tr
              + (n - 1 - xs)[:, None] * t_row + (xs + 1)[:, None] * bl
              + n) >> (log2 + 1)

    # --- DC ---
    dc = (jnp.sum(top_ext[..., 1: n + 1], axis=-1)
          + jnp.sum(left_ext[..., 1: n + 1], axis=-1) + n) >> (log2 + 1)
    dc_blk = jnp.broadcast_to(dc[..., None, None], planar.shape)
    if is_luma and n < 32:
        t_u = top_ext[..., 1: n + 1]
        l_u = left_ext[..., 1: n + 1]
        dc_blk = dc_blk.at[..., 0, :].set((t_u + 3 * dc[..., None] + 2) >> 2)
        dc_blk = dc_blk.at[..., 1:, 0].set(
            (l_u[..., 1:] + 3 * dc[..., None] + 2) >> 2)
        dc_blk = dc_blk.at[..., 0, 0].set(
            (l_u[..., 0] + 2 * dc + t_u[..., 0] + 2) >> 2)

    mode_b = mode[..., None, None]
    return jnp.where(mode_b == rom.PLANAR_IDX, planar,
                     jnp.where(mode_b == rom.DC_IDX, dc_blk, ang))
