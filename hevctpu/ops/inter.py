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


# ---------------------------------------------------------------------------
# Weighted prediction (TComWeightPrediction.cpp:46-64 sample formulas,
# WeightPredAnalysis.cpp:351-440 parameter estimation) — the dense
# restatement of the reference's WP half (SURVEY items WeightPredAnalysis
# / TComWeightPrediction).
# ---------------------------------------------------------------------------


def wp_acdc(plane: jnp.ndarray):
    """Per-frame (DC, AC) moments of [B, H, W] samples — the statistics
    WeightPredAnalysis::xCalcACDCParamSlice caches per picture: DC =
    the rounded per-sample mean ((Σx + N/2) / N), AC = Σ|x − DC| (the
    un-normalized absolute-deviation sum), both integer like HM's
    Int64 accumulation."""
    # float32 tree-sum: Σx of an 8-bit 4K frame (~2.1e9) overflows int32
    # and x64 is disabled under jit; XLA's pairwise reduction keeps the
    # f32 error well under the ±0.5 rounding granularity of the DC.
    xf = plane.astype(jnp.float32)
    n = plane.shape[-2] * plane.shape[-1]
    dc = jnp.floor((jnp.sum(xf, axis=(-2, -1)) + n / 2) / n).astype(
        jnp.int32)
    ac = jnp.sum(jnp.abs(xf - dc[..., None, None].astype(jnp.float32)),
                 axis=(-2, -1))
    return dc, ac


def wp_estimate(cur_dc, cur_ac, ref_dc, ref_ac, *, log2_denom: int = 6,
                bit_depth: int = 8, chroma: bool = False):
    """Explicit WP (weight, offset, valid) from current/reference moments
    — WeightPredAnalysis::xUpdatingWPParameters exactly: weight =
    round((AC_cur/AC_ref)·2^denom) with the ±16/15 ratio clip, offset =
    (DC_cur·2^denom − w·DC_ref + round) >> realDenom, luma offset
    clipped to [−128, 127], chroma offset clipped through the predicted
    form; valid = |w − 2^denom| < 128 (the range limitation that makes
    HM decrement the denom)."""
    cur_dc, cur_ac, ref_dc, ref_ac = (
        np.asarray(v, np.float64) for v in (cur_dc, cur_ac, ref_dc, ref_ac))
    rng = 128
    real_denom = log2_denom + (bit_depth - 8)
    real_off = 1 << max(real_denom - 1, 0)
    ratio = np.where(ref_ac == 0, 1.0,
                     np.clip(cur_ac / np.maximum(ref_ac, 1e-30),
                             -16.0, 15.0))
    weight = np.floor(0.5 + ratio * (1 << log2_denom)).astype(np.int64)
    offset = ((cur_dc.astype(np.int64) << log2_denom)
              - weight * ref_dc.astype(np.int64)
              + real_off) >> real_denom if real_denom > 0 else (
        (cur_dc.astype(np.int64) << log2_denom)
        - weight * ref_dc.astype(np.int64))
    if chroma:
        pred = rng - ((rng * weight) >> log2_denom)
        delta = np.clip(offset - pred, -4 * rng, 4 * rng - 1)
        offset = np.clip(delta + pred, -rng, rng - 1)
    else:
        offset = np.clip(offset, -rng, rng - 1)
    valid = np.abs(weight - (1 << log2_denom)) < rng
    return (weight.astype(np.int32), offset.astype(np.int32),
            valid.astype(bool))


def wp_apply(pred14: jnp.ndarray, weight, offset, *, log2_denom: int = 6,
             bit_depth: int = 8) -> jnp.ndarray:
    """Uni-directional weighted sample prediction (8.5.3.3.4.3;
    TComWeightPrediction::weightUnidir): pred14 are the 14-bit MC
    intermediates BEFORE the final rounding shift (what xPredInterBlk
    hands to the weighting stage, i.e. pel<<6 − IF_INTERNAL_OFFS lineage
    at 8-bit); returns clipped pels."""
    shift_num = max(2, _PREC - bit_depth)
    shift = log2_denom + shift_num
    rnd = 1 << (shift - 1) if shift > 0 else 0
    maxv = (1 << bit_depth) - 1
    w = jnp.asarray(weight)
    o = jnp.asarray(offset)
    out = ((w * (pred14 + _OFFS) + rnd) >> shift) + o
    return jnp.clip(out, 0, maxv)


def wp_apply_bi(pred14_0: jnp.ndarray, pred14_1: jnp.ndarray, w0, o0, w1,
                o1, *, log2_denom: int = 6,
                bit_depth: int = 8) -> jnp.ndarray:
    """Bi-directional weighted sample prediction
    (TComWeightPrediction::weightBidir)."""
    shift_num = max(2, _PREC - bit_depth)
    shift = log2_denom + shift_num + 1
    rnd = 1 << (shift - 1) if shift > 0 else 0
    maxv = (1 << bit_depth) - 1
    w0, o0, w1, o1 = (jnp.asarray(v) for v in (w0, o0, w1, o1))
    # weightBidir: (w0*(P0+OFFS) + w1*(P1+OFFS) + round + (offset <<
    # (shift-1))) >> shift with offset = (o0 + o1 + 1) >> 1
    off = (o0 + o1 + 1) >> 1
    out = (w0 * (pred14_0 + _OFFS) + w1 * (pred14_1 + _OFFS)
           + rnd + (off << (shift - 1))) >> shift
    return jnp.clip(out, 0, maxv)


def wp_select(cur: jnp.ndarray, ref: jnp.ndarray, weight, offset, *,
              log2_denom: int = 6) -> jnp.ndarray:
    """Per-frame WP on/off decision (WeightPredAnalysis::xSelectWP): use
    explicit weighting iff SAD(cur, weighted ref) < SAD(cur, ref) with
    the zero-MV alignment HM's fast check uses. cur/ref [B, H, W] pels;
    returns bool [B]."""
    # lift pels to the 14-bit intermediate domain the weighting stage
    # sees (pel << headroom, re-centered by -IF_INTERNAL_OFFS)
    p14 = (ref << _HEADROOM) - _OFFS
    wref = wp_apply(p14, weight, offset, log2_denom=log2_denom)
    sad_w = jnp.sum(jnp.abs(cur - wref), axis=(-2, -1))
    sad_0 = jnp.sum(jnp.abs(cur - ref), axis=(-2, -1))
    return sad_w < sad_0


# ---------------------------------------------------------------------------
# Merge candidate derivation (8.5.3.2.3; TComDataCU::getInterMergeCandidates)
# on the dense block grid — the TComMotionInfo role is carried by the
# dense MV planes themselves ([B, R, C, 2] quarter-pel fields).
# ---------------------------------------------------------------------------


def merge_candidates(mv_field: jnp.ndarray):
    """Spatial merge candidates per grid block from a dense MV field
    [B, R, C, 2]: the A1 (left), B1 (above), B0 (above-right), A0
    (below-left), B2 (above-left) positions with the spec's pairwise
    pruning (B1 vs A1, B0 vs B1, A0 vs A1; B2 only when fewer than four
    candidates and differing from both A1 and B1). Returns
    (cands [B, R, C, 5, 2], valid [B, R, C, 5]) in candidate order —
    merge_idx indexes the valid entries in order (compact with a
    cumulative count, exactly TComDataCU::getInterMergeCandidates'
    list construction)."""
    b, r, c, _ = mv_field.shape

    def shift2(dy, dx):
        m = jnp.roll(mv_field, (-dy, -dx), axis=(1, 2))
        ry = jnp.arange(r)[None, :, None] + dy
        rx = jnp.arange(c)[None, None, :] + dx
        ok = (ry >= 0) & (ry < r) & (rx >= 0) & (rx < c)
        return jnp.where(ok[..., None], m, 0), ok

    a1, va1 = shift2(0, -1)    # left
    b1, vb1 = shift2(-1, 0)    # above
    b0, vb0 = shift2(-1, 1)    # above-right
    a0, vb_a0 = shift2(1, -1)  # below-left (valid only under z-order walks)
    b2, vb2 = shift2(-1, -1)   # above-left

    def ne(x, y):
        return jnp.any(x != y, axis=-1)

    v1 = va1
    v2 = vb1 & (~va1 | ne(b1, a1))
    v3 = vb0 & (~vb1 | ne(b0, b1))
    v4 = vb_a0 & (~va1 | ne(a0, a1))
    count4 = (v1.astype(jnp.int32) + v2 + v3 + v4)
    v5 = vb2 & (count4 < 4) & (~va1 | ne(b2, a1)) & (~vb1 | ne(b2, b1))
    cands = jnp.stack([a1, b1, b0, a0, b2], axis=-2)
    valid = jnp.stack([v1, v2, v3, v4, v5], axis=-1)
    return cands, valid
