"""All-35-mode intra prediction as ONE static integer matmul per block size.

TPU-first reformulation of the reference's per-mode prediction loop
(TComPrediction::predIntraAng / xPredIntraAng / xPredIntraPlanar / DC,
TComPrediction.cpp:183-457): after reference-sample fill and filtering,
every HEVC intra mode is an exact *linear* map of the 4-way reference
vector (unfiltered+filtered top/left extensions) followed by a single
rounding shift. We precompute that linear map as a static integer tensor
``P [4*(2N+1)+1, 35, N, N]`` (the +1 input slot is a constant 1 carrying
the rounding terms), so predicting all 35 modes for thousands of PUs is a
single MXU matmul instead of thousands of gathers.

Exactness: inputs are 8-bit samples (<= 255, bf16-exact); weights are
<= 64 (bf16-exact); every output dot product is <= 255*96 < 2^24, so a
bf16 x bf16 -> f32 matmul accumulates exact integers.

The mode-2..17 transpose (horizontal family) is folded into P's output
permutation. The nonlinear leftovers — the DC block's [1 3]/4 edge filter
and the VER/HOR edge columns (H.265 8.4.4.2.6, luma N<32 only) — have
nested integer floors, so they are applied afterwards as cheap elementwise
patches (exactly TComPrediction.cpp:183-228,349-365 semantics).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from hevctpu import rom
from hevctpu.ops import intra

# Input-vector layout offsets for the 4 reference arrays + constant slot.
# refs = [top_ext, left_ext, top_f, left_f, 1], each ext of length 2N+1.


@functools.lru_cache(maxsize=None)
def prediction_tensor(n: int, is_luma: bool):
    """Static (P, shift): P int32 [4*(2n+1)+1, 35, n, n] such that
    pred[m] = (refs @ P[:, m]) >> shift, exactly, for all 35 modes
    (before the DC/VER/HOR elementwise edge patches)."""
    log2 = int(np.log2(n))
    ln = 2 * n + 1
    k = 4 * ln + 1
    shift = max(5, log2 + 1)
    ang_scale = 1 << (shift - 5)
    pdc_scale = 1 << (shift - (log2 + 1))
    use_f = (intra._filter_flags(n, True) if is_luma
             else np.zeros(35, dtype=bool))
    p = np.zeros((k, 35, n, n), dtype=np.int64)

    def slot(arr_id: int, i: int) -> int:
        # arr_id: 0 top_ext, 1 left_ext, 2 top_f, 3 left_f
        return arr_id * ln + i

    const = k - 1

    # --- planar (mode 0): H.265 8.4.4.2.4 on (possibly) filtered refs ---
    t_id, l_id = (2, 3) if use_f[rom.PLANAR_IDX] else (0, 1)
    for y in range(n):
        for x in range(n):
            p[slot(l_id, 1 + y), 0, y, x] += (n - 1 - x) * pdc_scale
            p[slot(t_id, n + 1), 0, y, x] += (x + 1) * pdc_scale
            p[slot(t_id, 1 + x), 0, y, x] += (n - 1 - y) * pdc_scale
            p[slot(l_id, n + 1), 0, y, x] += (y + 1) * pdc_scale
    p[const, 0] += n * pdc_scale

    # --- DC (mode 1): mean of the unfiltered N-extent refs ---
    for i in range(1, n + 1):
        p[slot(0, i), 1] += pdc_scale
        p[slot(1, i), 1] += pdc_scale
    p[const, 1] += n * pdc_scale

    # --- angular modes 2..34 ---
    src, idx, didx, fact = intra._angular_tables(n)
    for mi in range(33):
        mode = mi + 2
        t_id, l_id = (2, 3) if use_f[mode] else (0, 1)

        def ref_slot(i: int) -> int:
            a = t_id if src[mi, i] == 0 else l_id
            return slot(a, idx[mi, i])

        for r in range(n):
            f = int(fact[mi, r])
            for c in range(n):
                g = min(c + int(didx[mi, r]) + 1 + n, 3 * n + 1)
                g1 = min(g + 1, 3 * n + 1)
                oy, ox = (r, c) if mode >= 18 else (c, r)
                p[ref_slot(g), mode, oy, ox] += (32 - f) * ang_scale
                p[ref_slot(g1), mode, oy, ox] += f * ang_scale
        p[const, mode] += 16 * ang_scale

    # bf16-exactness: every weight <= 255, every output's L1 <= 96, so all
    # partial sums stay integer-exact in float32 accumulation.
    assert p.max() <= 255 and p.sum(axis=0).max() <= 96
    return p.astype(np.int32), shift


@functools.lru_cache(maxsize=None)
def _pred_matrix_bf16(n: int, is_luma: bool):
    p, shift = prediction_tensor(n, is_luma)
    return np.ascontiguousarray(
        p.reshape(p.shape[0], 35 * n * n)).astype(np.float32), shift


def predict_all_modes_mm(top_ext, left_ext, top_f, left_f, n: int, *,
                         is_luma: bool = True, bit_depth: int = 8):
    """Exact replacement for intra.predict_all_modes as one MXU matmul.

    ext arrays [..., 2n+1] int32; out [..., 35, n, n] int32.
    """
    pmat, shift = _pred_matrix_bf16(n, is_luma)
    lead = top_ext.shape[:-1]
    ones = jnp.ones(lead + (1,), jnp.int32)
    refs = jnp.concatenate([top_ext, left_ext, top_f, left_f, ones], axis=-1)
    acc = jnp.einsum("...k,kp->...p", refs.astype(jnp.bfloat16),
                     jnp.asarray(pmat, jnp.bfloat16),
                     preferred_element_type=jnp.float32)
    pred = (acc.astype(jnp.int32) >> shift).reshape(lead + (35, n, n))

    if is_luma and n < 32:
        maxv = (1 << bit_depth) - 1
        corner = top_ext[..., 0:1]
        # VER (26): pred[y][0] gets the left-gradient correction.
        colv = jnp.clip(top_ext[..., 1:2]
                        + ((left_ext[..., 1: n + 1] - corner) >> 1), 0, maxv)
        pred = pred.at[..., rom.VER_IDX, :, 0].set(colv)
        # HOR (10): transposed family — the corrected column lands on row 0.
        rowh = jnp.clip(left_ext[..., 1:2]
                        + ((top_ext[..., 1: n + 1] - corner) >> 1), 0, maxv)
        pred = pred.at[..., rom.HOR_IDX, 0, :].set(rowh)
        # DC edge filter ([1 3]/4 on row 0 / col 0, [1 2 1]/4 corner).
        dc = pred[..., rom.DC_IDX, n - 1, n - 1]
        t_u = top_ext[..., 1: n + 1]
        l_u = left_ext[..., 1: n + 1]
        pred = pred.at[..., rom.DC_IDX, 0, :].set(
            (t_u + 3 * dc[..., None] + 2) >> 2)
        pred = pred.at[..., rom.DC_IDX, 1:, 0].set(
            (l_u[..., 1:] + 3 * dc[..., None] + 2) >> 2)
        pred = pred.at[..., rom.DC_IDX, 0, 0].set(
            (l_u[..., 0] + 2 * dc + t_u[..., 0] + 2) >> 2)
    return pred


def predict_selected_mode_mm(top_ext, left_ext, top_f, left_f, mode, n: int, *,
                             is_luma: bool = True, bit_depth: int = 8):
    """Predict one traced mode per batch row: all-35 matmul + select.

    ext arrays [..., 2n+1], mode [...] int32; out [..., n, n]. The matmul
    computes every mode (cheap on the MXU) and the per-row select happens
    after the edge patches, so the result is bit-identical to
    intra.predict_one_mode."""
    pred_all = predict_all_modes_mm(top_ext, left_ext, top_f, left_f, n,
                                    is_luma=is_luma, bit_depth=bit_depth)
    sel = jnp.take_along_axis(
        pred_all, mode[..., None, None, None].astype(jnp.int32), axis=-3)
    return sel[..., 0, :, :]


# ---------------------------------------------------------------------------
# Dense-grid boundary extraction via strided reshapes (no gathers)
# ---------------------------------------------------------------------------


def grid_boundaries(plane: jnp.ndarray, n: int):
    """Scan-order boundaries for every aligned n x n block of ``plane``.

    plane [B, HP, WP] with HP % n == WP % n == 0. Returns [B, R, C, 4n+1]
    in intra.fill_reference scan order (left bottom-to-top, corner, top
    left-to-right). Out-of-plane reads clamp to the edge — harmless, those
    positions are always masked unavailable. Built from row/column slices
    and block reshapes only; no gather ops.
    """
    b, hp, wp = plane.shape
    r, c = hp // n, wp // n

    # Rows y = r*n - 1 (clamped): row 0 duplicates for r=0.
    rows = jnp.concatenate([plane[:, :1, :], plane[:, n - 1:: n, :]], axis=1)
    rows = rows[:, :r, :]                                   # [B, R, WP]
    # Columns x = c*n - 1 (clamped).
    cols = jnp.concatenate([plane[:, :, :1], plane[:, :, n - 1:: n]], axis=2)
    cols = cols[:, :, :c]                                   # [B, HP, C]

    # Top windows [c*n-1, c*n+2n-1] from `rows`, via 3 block-aligned slices.
    rowp = jnp.concatenate(
        [rows[:, :, :1], rows, jnp.repeat(rows[:, :, -1:], 2 * n, axis=2)],
        axis=2)                                             # [B, R, 1+WP+2n]
    blk = rowp[:, :, : (c + 2) * n].reshape(b, r, c + 2, n)
    top = jnp.concatenate(
        [blk[:, :, :c, :], blk[:, :, 1: c + 1, :], blk[:, :, 2: c + 2, :1]],
        axis=-1)                                            # [B, R, C, 2n+1]
    corner = top[:, :, :, 0]

    # Left windows [r*n, r*n+2n) from `cols` (length 2n, below-extension
    # clamped to the bottom edge).
    colp = jnp.concatenate(
        [cols, jnp.repeat(cols[:, -1:, :], n, axis=1)], axis=1)
    cblk = colp.reshape(b, r + 1, n, c)
    left = jnp.concatenate([cblk[:, :r], cblk[:, 1: r + 1]], axis=2)
    left = jnp.moveaxis(left, -1, 2)                        # [B, R, C, 2n]

    # Scan order: left reversed (bottom-to-top), corner, top row (skip its
    # leading corner slot).
    return jnp.concatenate(
        [left[..., ::-1], corner[..., None], top[..., 1:]], axis=-1)
