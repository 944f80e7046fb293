"""Inter-prediction kernels: MC interpolation, dense motion search, MV costs.

The reference's inter half lives in TComInterpolationFilter.cpp (8-tap
luma / 4-tap chroma fractional-sample interpolation, :60-76 filter
tables, :104-190 the two-pass 14-bit arithmetic), TComPrediction.cpp:
495-683 (motionCompensation / xPredInterBlk / bi-pred average) and
TEncSearch.cpp:2954-4733 (predInterSearch with TZ search :4048 and
fractional-pel refinement :4538). These kernels are the TPU-first
restatement, inert in the All-Intra operating point but unit-tested
against scalar spec references (tests/test_inter.py):

  * interpolation = static shifted-slice stacks dotted with per-block
    filter rows gathered from the spec tables — dense over a whole grid
    of blocks, batched over frames;
  * motion search = the full SAD window evaluated densely (the TZ
    diamond exists because a CPU must visit candidates serially; a TPU
    evaluates the entire window as batched reductions and argmins) plus
    quarter-pel refinement around the integer best;
  * MV rate = the AMVP-predictor difference priced with the bypass
    Exp-Golomb model HM's motion estimation uses (TComRdCost
    getCostOfVectorWithPredictor semantics).

All arithmetic follows the 8-bit operating point: IF_INTERNAL_PREC=14,
IF_FILTER_PREC=6, headroom 6 (TComInterpolationFilter.h:49-51).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Fractional-sample filters (H.265 Tables 8-10/8-11; the same constants
# as TComInterpolationFilter.cpp:60-76 — spec-mandated).
LUMA_FILTERS = np.array([
    [0, 0, 0, 64, 0, 0, 0, 0],
    [-1, 4, -10, 58, 17, -5, 1, 0],
    [-1, 4, -11, 40, 40, -11, 4, -1],
    [0, 1, -5, 17, 58, -10, 4, -1]], np.int32)

CHROMA_FILTERS = np.array([
    [0, 64, 0, 0],
    [-2, 58, 10, -2],
    [-4, 54, 16, -2],
    [-6, 46, 28, -4],
    [-4, 36, 36, -4],
    [-4, 28, 46, -6],
    [-2, 16, 54, -4],
    [-2, 10, 58, -2]], np.int32)

_PREC = 14            # IF_INTERNAL_PREC
_FPREC = 6            # IF_FILTER_PREC
_OFFS = 1 << (_PREC - 1)
_HEADROOM = _PREC - 8  # = 6 at 8-bit


def _pad_ref(plane: jnp.ndarray, taps: int, extra: int = 0) -> jnp.ndarray:
    """Edge-replicate pad for out-of-picture MC reads (HM pads the
    reference picture margins the same way, TComPicYuv::extendPicBorder).
    Pads taps//2-1+extra left/top and taps//2+extra right/bottom."""
    lo = taps // 2 - 1 + extra
    hi = taps // 2 + extra
    return jnp.pad(plane, [(0, 0)] * (plane.ndim - 2)
                   + [(lo, hi), (lo, hi)], mode="edge")


def _filter_pass(win: jnp.ndarray, coeff: jnp.ndarray, axis: int,
                 taps: int, n: int) -> jnp.ndarray:
    """Apply one separable pass: win [..., H, W] (already padded along
    `axis` by taps-1), coeff [..., taps] per-block filters. Returns the
    un-normalized 32-bit accumulator with n output samples along axis."""
    outs = []
    for k in range(taps):
        sl = [slice(None)] * win.ndim
        sl[axis] = slice(k, k + n)
        outs.append(win[tuple(sl)] * coeff[..., k, None, None])
    return sum(outs)


def mc_luma_grid(plane: jnp.ndarray, mv: jnp.ndarray, n: int) -> jnp.ndarray:
    """Motion-compensated luma prediction for the aligned n x n grid.

    plane [B, H, W] int32 reference samples; mv [B, R, C, 2] quarter-pel
    motion vectors (mv[..., 0] = dy, mv[..., 1] = dx) for each grid
    block. Returns [B, R, C, n, n] int32 predictions in [0, 255] — the
    two-pass 8-tap arithmetic of TComInterpolationFilter::filter
    (horizontal first into 14-bit intermediates, vertical with the
    combined rounding, single-pass shortcuts when one frac is 0)."""
    b, h, w = plane.shape
    r, c = h // n, w // n
    ref = _pad_ref(plane, 8)                    # +3 lo, +4 hi
    iy = mv[..., 0] >> 2
    ix = mv[..., 1] >> 2
    fy = (mv[..., 0] & 3).astype(jnp.int32)
    fx = (mv[..., 1] & 3).astype(jnp.int32)

    # gather the (n+7) x (n+7) source patch per block, clamped in the
    # padded plane (edge-replication == HM's picture border extension)
    gy = jnp.arange(r) * n
    gx = jnp.arange(c) * n
    by = gy[None, :, None] + iy                 # [B, R, C] top-left y
    bx = gx[None, None, :] + ix
    oy = jnp.clip(by[..., None] + jnp.arange(n + 7), 0, h + 6)
    ox = jnp.clip(bx[..., None] + jnp.arange(n + 7), 0, w + 6)
    bi = jnp.arange(b)[:, None, None, None, None]
    patch = ref[bi, oy[..., :, None], ox[..., None, :]]  # [B,R,C,n+7,n+7]

    cfy = jnp.asarray(LUMA_FILTERS)[fy]          # [B, R, C, 8]
    cfx = jnp.asarray(LUMA_FILTERS)[fx]

    # horizontal pass (isFirst): shift 6-6=0, offset -OFFS<<0
    mid = _filter_pass(patch, cfx, -1, 8, n) - (_OFFS << 0)
    # vertical pass (isLast, not first): shift 12, offset as HM
    acc = _filter_pass(mid, cfy, -2, 8, n)
    two = (acc + (1 << 11) + (_OFFS << _FPREC)) >> 12

    # single-pass variants: frac_x only (shift 6 offset 32 on patch rows
    # 3..), frac_y only, and pure copy
    row3 = patch[..., 3:3 + n, :]
    col3 = patch[..., :, 3:3 + n]
    honly = (_filter_pass(row3, cfx, -1, 8, n) + 32) >> 6
    vonly = (_filter_pass(col3, cfy, -2, 8, n) + 32) >> 6
    copy = patch[..., 3:3 + n, 3:3 + n]

    fy_ = fy[..., None, None]
    fx_ = fx[..., None, None]
    out = jnp.where((fy_ == 0) & (fx_ == 0), copy,
                    jnp.where(fy_ == 0, honly,
                              jnp.where(fx_ == 0, vonly, two)))
    return jnp.clip(out, 0, 255)


def mc_chroma_grid(plane: jnp.ndarray, mv: jnp.ndarray,
                   n: int) -> jnp.ndarray:
    """Chroma MC for the aligned n x n chroma grid: 4-tap eighth-pel
    (mv is the LUMA quarter-pel vector; chroma frac = mv & 7 at half
    resolution, H.265 8.5.4.2.2.2)."""
    b, h, w = plane.shape
    r, c = h // n, w // n
    ref = _pad_ref(plane, 4)                    # +1 lo, +2 hi
    iy = mv[..., 0] >> 3
    ix = mv[..., 1] >> 3
    fy = (mv[..., 0] & 7).astype(jnp.int32)
    fx = (mv[..., 1] & 7).astype(jnp.int32)

    gy = jnp.arange(r) * n
    gx = jnp.arange(c) * n
    by = gy[None, :, None] + iy
    bx = gx[None, None, :] + ix
    oy = jnp.clip(by[..., None] + jnp.arange(n + 3), 0, h + 2)
    ox = jnp.clip(bx[..., None] + jnp.arange(n + 3), 0, w + 2)
    bi = jnp.arange(b)[:, None, None, None, None]
    patch = ref[bi, oy[..., :, None], ox[..., None, :]]

    cfy = jnp.asarray(CHROMA_FILTERS)[fy]
    cfx = jnp.asarray(CHROMA_FILTERS)[fx]

    mid = _filter_pass(patch, cfx, -1, 4, n) - (_OFFS << 0)
    two = (_filter_pass(mid, cfy, -2, 4, n)
           + (1 << 11) + (_OFFS << _FPREC)) >> 12
    row1 = patch[..., 1:1 + n, :]
    col1 = patch[..., :, 1:1 + n]
    honly = (_filter_pass(row1, cfx, -1, 4, n) + 32) >> 6
    vonly = (_filter_pass(col1, cfy, -2, 4, n) + 32) >> 6
    copy = patch[..., 1:1 + n, 1:1 + n]

    fy_ = fy[..., None, None]
    fx_ = fx[..., None, None]
    out = jnp.where((fy_ == 0) & (fx_ == 0), copy,
                    jnp.where(fy_ == 0, honly,
                              jnp.where(fx_ == 0, vonly, two)))
    return jnp.clip(out, 0, 255)


def bi_average(pred0: jnp.ndarray, pred1: jnp.ndarray) -> jnp.ndarray:
    """Default bi-prediction average of two 14-bit MC intermediates
    (H.265 8.5.4.2.3; TComYuv::addAvg semantics at 8-bit: shift 7)."""
    shift = _PREC + 1 - 8
    offset = (1 << (shift - 1)) + 2 * _OFFS
    return jnp.clip((pred0 + pred1 + offset) >> shift, 0, 255)


def sad_full_search(cur: jnp.ndarray, ref: jnp.ndarray, n: int,
                    srange: int):
    """Dense integer-pel motion search for every aligned n x n block.

    cur, ref [B, H, W] int32. Evaluates the FULL (2*srange+1)^2 SAD
    window for every block as batched reductions — the TPU-first
    equivalent of the reference's serial TZ diamond walk
    (TEncSearch::xTZSearch, TEncSearch.cpp:4048): same search range,
    exhaustive instead of pattern-pruned (a superset of TZ's candidate
    set, so the minimum is at least as good).

    Returns (mv [B, R, C, 2] int32 integer-pel in quarter-pel units,
    best_sad [B, R, C] int32)."""
    b, h, w = cur.shape
    r, c = h // n, w // n
    cb = cur.reshape(b, r, n, c, n).swapaxes(2, 3)           # [B,R,C,n,n]
    refp = jnp.pad(ref, [(0, 0), (srange, srange), (srange, srange)],
                   mode="edge")
    k = 2 * srange + 1

    def row_sads(dy):
        # all dx for one dy: shifted ref rows, SAD per block per dx
        sh = jax.lax.dynamic_slice(refp, (0, dy, 0), (b, h, w + 2 * srange))

        def one_dx(dx):
            rb = jax.lax.dynamic_slice(sh, (0, 0, dx), (b, h, w))
            rbb = rb.reshape(b, r, n, c, n).swapaxes(2, 3)
            return jnp.sum(jnp.abs(cb - rbb), axis=(-2, -1))  # [B,R,C]

        return jax.vmap(one_dx)(jnp.arange(k))               # [K,B,R,C]

    sads = jax.lax.map(row_sads, jnp.arange(k))              # [K,K,B,R,C]
    sads = jnp.moveaxis(sads.reshape(k * k, b, r, c), 0, -1)  # [B,R,C,K*K]
    best = jnp.argmin(sads, axis=-1)
    dy = best // k - srange
    dx = best % k - srange
    mv = jnp.stack([dy * 4, dx * 4], axis=-1).astype(jnp.int32)
    return mv, jnp.min(sads, axis=-1)


def frac_refine(cur: jnp.ndarray, ref: jnp.ndarray, mv: jnp.ndarray,
                n: int):
    """Quarter-pel refinement: evaluate the 8 half-pel then the 8
    quarter-pel neighbors of the running best (the reference's two-stage
    xPatternSearchFracDIF, TEncSearch.cpp:4538), SAD-scored on the
    interpolated prediction. mv [B, R, C, 2] quarter-pel. Returns the
    refined (mv, sad)."""
    b, h, w = cur.shape
    r, c = h // n, w // n
    cb = cur.reshape(b, r, n, c, n).swapaxes(2, 3)

    def sad_at(m):
        p = mc_luma_grid(ref, m, n)
        return jnp.sum(jnp.abs(cb - p), axis=(-2, -1))

    best_mv, best_sad = mv, sad_at(mv)
    for step in (2, 1):                       # half-pel, then quarter-pel
        center = best_mv                      # fixed stage center (HM's
        for dy in (-step, 0, step):           # xPatternRefinement walks
            for dx in (-step, 0, step):       # the 8 points around it)
                if dy == 0 and dx == 0:
                    continue
                cand = center + jnp.asarray([dy, dx], jnp.int32)
                s = sad_at(cand)
                take = s < best_sad
                best_mv = jnp.where(take[..., None], cand, best_mv)
                best_sad = jnp.minimum(s, best_sad)
    return best_mv, best_sad


def amvp_candidates(mv_field: jnp.ndarray):
    """Spatial AMVP predictors from a dense per-block MV field
    [B, R, C, 2]: candidate A = left neighbor, candidate B = above
    neighbor (the left/above groups of TEncSearch::xEstimateMvPredAMVP /
    TComDataCU::fillMvpCand reduced to the dense grid; out-of-picture
    neighbors fall back to the zero MV). Returns (mvp_a, mvp_b)."""
    za = jnp.pad(mv_field[:, :, :-1], ((0, 0), (0, 0), (1, 0), (0, 0)))
    zb = jnp.pad(mv_field[:, :-1, :], ((0, 0), (1, 0), (0, 0), (0, 0)))
    return za, zb


@functools.lru_cache(maxsize=None)
def _eg1_len_table(maxv: int = 1 << 15) -> np.ndarray:
    out = np.zeros(maxv, np.int32)
    for v in range(maxv):
        # 1st-order Exp-Golomb codeword length
        k, vv = 1, v
        length = 0
        while vv >= (1 << k):
            vv -= 1 << k
            k += 1
            length += 2
        out[v] = length + 1 + k
    return out


def mvd_bits(mvd: jnp.ndarray) -> jnp.ndarray:
    """Signaling bits of an MV difference [..., 2] under the mvd_coding
    binarization (7.3.8.9: greater0 + greater1 flags, EG1 remainder,
    sign) — the bypass-bin count HM's motion estimation prices MVs with
    (TComRdCost getCostOfVectorWithPredictor role). Returns [...]
    int32 bits."""
    a = jnp.abs(mvd).astype(jnp.int32)
    eg1 = jnp.asarray(_eg1_len_table())
    per = jnp.where(
        a == 0, 1,
        jnp.where(a == 1, 3,
                  2 + eg1[jnp.clip(a - 2, 0, eg1.shape[0] - 1)] + 1))
    return jnp.sum(per, axis=-1)
