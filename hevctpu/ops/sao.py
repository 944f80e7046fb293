"""Sample Adaptive Offset: statistics, parameter decision, and application.

Equivalent of the reference's SAO pair — the normative applier
(TComSampleAdaptiveOffset::offsetBlock/offsetCTU,
TComSampleAdaptiveOffset.cpp:313,554) and the encoder-side estimator
(TEncSampleAdaptiveOffset: getBlkStats :943, deriveOffsets :498, RD type
decision deriveModeNewRDO/decideBlkParams :617,814, driven by SAOProcess
:244) — restated TPU-first: category maps for all four EO classes and the
band index are computed for the whole frame at once, per-CTU statistics
fall out of block reductions / one segment-sum, and the per-CTU type/
offset decision is a small vectorized argmin over (5 types x offset
candidates). No per-CTU loops, no branches.

Conventions: planes are [B, HP, WP] int32 (padded to CTU multiples);
`h, w` bound the real picture. SAO runs on the *deblocked* recon against
the original (HM applies deblock then SAO per picture, TEncGOP.cpp:
1742,1797). Offsets are full-pel, |off| <= 7 at 8-bit.

Parameter layout (per frame):
  sao_type [B, rc, cc, 2] int32  — 0 off, 1 BO, 2 EO (luma, chroma-joint)
  sao_eo   [B, rc, cc, 2] int32  — EO class 0..3 (luma, chroma-joint)
  sao_bp   [B, rc, cc, 3] int32  — BO band position per component
  sao_off  [B, rc, cc, 3, 4] int32 — signed offsets per component
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from hevctpu.ops import rate

# neighbor offset (dy, dx) of each EO class: 0 horizontal, 1 vertical,
# 2 diagonal 135° (\), 3 diagonal 45° (/)   (H.265 Table 7-9 order).
EO_NEIGHBORS = ((0, 1), (1, 0), (1, 1), (1, -1))

MAX_OFFSET = 7  # 8-bit: (1 << (min(bd,10)-5)) - 1


def _shift2(p, dy, dx):
    """Shift [B,H,W] by (dy, dx) with edge clamp (masked separately)."""
    if dy:
        p = jnp.roll(p, -dy, axis=1)
    if dx:
        p = jnp.roll(p, -dx, axis=2)
    return p


def eo_category(p: jnp.ndarray, cls: int, h: int, w: int) -> jnp.ndarray:
    """Edge-offset category map [B,H,W] in 0..4 for EO class `cls`
    (8.7.3: edgeIdx = 2 + sign(p-a) + sign(p-b), remapped so 1/2 are
    minima-side and 3/4 maxima-side; 0 = no offset). Pixels whose
    neighbors fall outside the picture get category 0."""
    dy, dx = EO_NEIGHBORS[cls]
    a = _shift2(p, -dy, -dx)
    b = _shift2(p, dy, dx)
    e = (2 + jnp.sign(p - a) + jnp.sign(p - b)).astype(jnp.int32)
    # remap 0,1,2,3,4 -> 1,2,0,3,4 with selects (jnp.choose lowers to a
    # per-pixel gather, which is slow on TPU).
    cat = jnp.where(e < 2, e + 1, jnp.where(e == 2, 0, e))
    yy = jnp.arange(p.shape[1])[:, None]
    xx = jnp.arange(p.shape[2])[None, :]
    ok = ((yy - abs(dy) >= 0) & (yy + abs(dy) < h)
          & (xx - dx >= 0) & (xx + dx < w) & (xx + dx >= 0) & (xx - dx < w))
    return jnp.where(ok[None], cat, 0)


def band_index(p: jnp.ndarray, bit_depth: int = 8) -> jnp.ndarray:
    return p >> (bit_depth - 5)


def _block_sum(x: jnp.ndarray, span: int) -> jnp.ndarray:
    b, hp, wp = x.shape
    return x.reshape(b, hp // span, span, wp // span, span).sum(axis=(2, 4))


def ctu_stats(org: jnp.ndarray, rec: jnp.ndarray, h: int, w: int,
              span: int = 64):
    """Per-CTU SAO statistics of one plane.

    Returns (eo_cnt [B,rc,cc,4,4], eo_sum [B,rc,cc,4,4],
             bo_cnt [B,rc,cc,32], bo_sum [B,rc,cc,32]) where the eo axes
    are (class, category-1) and sums are Σ(org - rec) over member pixels.
    """
    b, hp, wp = rec.shape
    rc, cc = hp // span, wp // span
    yy = jnp.arange(hp)[:, None]
    xx = jnp.arange(wp)[None, :]
    inside = (yy < h) & (xx < w)
    diff = jnp.where(inside[None], org - rec, 0)

    eo_cnt, eo_sum = [], []
    for cls in range(4):
        cat = eo_category(rec, cls, h, w)
        cnts, sums = [], []
        for c in range(1, 5):
            m = cat == c
            cnts.append(_block_sum(m.astype(jnp.int32), span))
            sums.append(_block_sum(jnp.where(m, diff, 0), span))
        eo_cnt.append(jnp.stack(cnts, axis=-1))
        eo_sum.append(jnp.stack(sums, axis=-1))
    eo_cnt = jnp.stack(eo_cnt, axis=-2)                 # [B,rc,cc,4,4]
    eo_sum = jnp.stack(eo_sum, axis=-2)

    # BO histogram as 32 masked block reductions (a segment_sum scatter
    # serializes badly on TPU; plain masks + reshape-reductions vectorize).
    band = band_index(rec)
    bo_cnt, bo_sum = [], []
    for k in range(32):
        m = (band == k) & inside[None]
        bo_cnt.append(_block_sum(m.astype(jnp.int32), span))
        bo_sum.append(_block_sum(jnp.where(m, diff, 0), span))
    return (eo_cnt, eo_sum,
            jnp.stack(bo_cnt, axis=-1), jnp.stack(bo_sum, axis=-1))


def _best_offset(cnt, sm, sign: int, lam: float):
    """Best offset for one statistics cell, candidates o in 0..7 with the
    given sign (0 = both signs). Returns (delta_j [(...)], off signed).
    ΔD(o) = o²·cnt − 2·o·sum (HM's estSaoDist); bits(o) ≈ |o|+1 TR bins
    (+1 sign bypass for BO nonzero offsets)."""
    if sign == 0:
        offs = np.concatenate([np.arange(0, 8), -np.arange(1, 8)])
        bits = np.minimum(np.abs(offs) + 1, 7) + (offs != 0)
    else:
        offs = sign * np.arange(0, 8)
        bits = np.minimum(np.abs(offs) + 1, 7)
    offs_j = jnp.asarray(offs, jnp.int32)
    d = (offs_j.astype(jnp.float32) ** 2 * cnt[..., None].astype(jnp.float32)
         - 2.0 * offs_j.astype(jnp.float32) * sm[..., None].astype(jnp.float32))
    j = d + lam * jnp.asarray(bits, jnp.float32)
    k = jnp.argmin(j, axis=-1)
    return jnp.take_along_axis(j, k[..., None], -1)[..., 0], offs_j[k]


def derive_component(eo_cnt, eo_sum, bo_cnt, bo_sum, lam: float,
                     dist_w: float = 1.0):
    """Per-CTU candidate ΔJ and offsets for one component.

    Returns (eo_j [.., 4], eo_off [.., 4, 4], bo_j [..], bo_pos [..],
    bo_off [.., 4]): the weighted RD delta (dist_w·ΔD + λ·offset-bits,
    negative = gain) and chosen offsets of every EO class and of the best
    4-band BO window. Type/class/bandpos signaling bits are added by
    decide_params."""
    lam_eff = lam / dist_w  # argmin(D + (λ/w)B) == argmin(wD + λB)

    # EO: categories 1,2 positive, 3,4 negative (signs inferred, 7.3.8.3).
    j_pos, off_pos = _best_offset(eo_cnt[..., :2], eo_sum[..., :2], 1,
                                  lam_eff)
    j_neg, off_neg = _best_offset(eo_cnt[..., 2:], eo_sum[..., 2:], -1,
                                  lam_eff)
    eo_j = dist_w * (jnp.concatenate([j_pos, j_neg], axis=-1)
                     .sum(axis=-1))                      # [.., 4cls]
    eo_off = jnp.concatenate([off_pos, off_neg], axis=-1)  # [.., 4cls, 4]

    # BO: best offset per band (free sign), then best 4-band window.
    bj, boff = _best_offset(bo_cnt, bo_sum, 0, lam_eff)  # [.., 32]
    wins = jnp.stack([bj[..., i: i + 4].sum(axis=-1) for i in range(29)],
                     axis=-1)                            # [.., 29]
    bo_pos = jnp.argmin(wins, axis=-1).astype(jnp.int32)
    bo_j = dist_w * jnp.min(wins, axis=-1)
    idx = bo_pos[..., None] + jnp.arange(4)
    bo_off = jnp.take_along_axis(boff, idx, axis=-1)     # [.., 4]
    return eo_j, eo_off, bo_j, bo_pos, bo_off


def _eval_params(stats, typ, cls, bp, off, dist_w: float):
    """ΔD of applying the given SAO params to one component's CTU stats.

    stats = (eo_cnt [..,4,4], eo_sum, bo_cnt [..,32], bo_sum); typ/cls/bp
    [B,rc,cc]; off [B,rc,cc,4]. ΔD(o) = o²·cnt − 2·o·sum per category
    (HM's estSaoDist). Returns dist_w-weighted ΔD [B,rc,cc]."""
    eo_cnt, eo_sum, bo_cnt, bo_sum = stats
    offf = off.astype(jnp.float32)
    cls_i = cls[..., None, None].astype(jnp.int32)
    cnt_c = jnp.take_along_axis(eo_cnt, cls_i, axis=-2)[..., 0, :]
    sum_c = jnp.take_along_axis(eo_sum, cls_i, axis=-2)[..., 0, :]
    dd_eo = jnp.sum(offf ** 2 * cnt_c.astype(jnp.float32)
                    - 2.0 * offf * sum_c.astype(jnp.float32), axis=-1)
    idx = bp[..., None].astype(jnp.int32) + jnp.arange(4)
    # bands past index 31 are simply not applied by apply_sao — mask them
    # out of the ΔD estimate too (no wrap, no double count at 31).
    in_range = idx <= 31
    idx = jnp.clip(idx, 0, 31)
    cnt_b = jnp.where(in_range, jnp.take_along_axis(bo_cnt, idx, axis=-1), 0)
    sum_b = jnp.where(in_range, jnp.take_along_axis(bo_sum, idx, axis=-1), 0)
    dd_bo = jnp.sum(offf ** 2 * cnt_b.astype(jnp.float32)
                    - 2.0 * offf * sum_b.astype(jnp.float32), axis=-1)
    dd = jnp.where(typ == 2, dd_eo, jnp.where(typ == 1, dd_bo, 0.0))
    return dist_w * dd


def decide_params(y_stats, u_stats, v_stats, qp: int, qp_c: int):
    """Full per-CTU SAO decision for a frame.

    y/u/v_stats are ctu_stats() tuples. Luma decides alone; Cb and Cr share
    type and EO class (the reference's joint chroma decision,
    TEncSampleAdaptiveOffset::decideBlkParams). Merge-left/up candidates
    are evaluated densely against each neighbor's new-params choice
    (deriveModeMergeRDO semantics, TEncSampleAdaptiveOffset.cpp:617-814):
    a CTU merges only from a neighbor that keeps its own new params, which
    makes the whole decision two dense passes instead of a raster scan.
    Returns (sao_type, sao_eo, sao_bp, sao_off, sao_merge) — the parameter
    arrays of the module docstring plus the per-CTU merge mode
    (0 new, 1 left, 2 up); type/eo/bp/off are the FINAL (post-merge)
    params every reconstruction path applies."""
    lam = rate.lambda_rd(qp)
    w_c = rate.chroma_dist_weight(qp, qp_c)

    ey, eoy, by, bpy, boy = derive_component(*y_stats, lam)
    eu, eou, bu, bpu, bou = derive_component(*u_stats, lam, w_c)
    ev, eov, bv, bpv, bov = derive_component(*v_stats, lam, w_c)

    # syntax-bit constants (in bins ~ bits): type TR2 = 2, eo class = 2,
    # band position = 5 (per component), OFF = 1 type bin.
    def pick(eo_j, bo_j, bits_eo, bits_bo, bits_off):
        cand = jnp.concatenate(
            [jnp.full(bo_j.shape + (1,), lam * bits_off),
             (bo_j + lam * bits_bo)[..., None],
             eo_j + lam * bits_eo], axis=-1)             # [.., 6]
        k = jnp.argmin(cand, axis=-1).astype(jnp.int32)
        typ = jnp.where(k == 0, 0, jnp.where(k == 1, 1, 2))
        cls = jnp.maximum(k - 2, 0)
        return typ, cls, jnp.min(cand, axis=-1)

    typ_y, cls_y, j_y = pick(ey, by, 2 + 2, 2 + 5, 1)
    typ_c, cls_c, j_c = pick(eu + ev, bu + bv, 2 + 2, 2 + 5 + 5, 1)

    sao_type = jnp.stack([typ_y, typ_c], axis=-1)
    sao_eo = jnp.stack([cls_y, cls_c], axis=-1)
    sao_bp = jnp.stack([bpy, bpu, bpv], axis=-1)

    def comp_off(typ, cls, eo_off, bo_off):
        eo_sel = jnp.take_along_axis(
            eo_off, cls[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
        return jnp.where(typ[..., None] == 2, eo_sel,
                         jnp.where(typ[..., None] == 1, bo_off, 0))

    sao_off = jnp.stack([comp_off(typ_y, cls_y, eoy, boy),
                         comp_off(typ_c, cls_c, eou, bou),
                         comp_off(typ_c, cls_c, eov, bov)], axis=-2)

    # -- merge-left / merge-up RD -----------------------------------------
    j_new = j_y + j_c + lam * 1.2          # two merge-flag zero bins

    def shift_params(axis):
        """Neighbor's params viewed from each CTU (left: axis=2, up: 1)."""
        def sh(x):
            pad = [(0, 0)] * x.ndim
            pad[axis] = (1, 0)
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(0, x.shape[axis] - 1)
            return jnp.pad(x[tuple(sl)], pad)
        return sh(sao_type), sh(sao_eo), sh(sao_bp), sh(sao_off)

    def j_of(params):
        t2, e2, b3, o34 = params
        j = _eval_params(y_stats, t2[..., 0], e2[..., 0], b3[..., 0],
                         o34[..., 0, :], 1.0)
        j += _eval_params(u_stats, t2[..., 1], e2[..., 1], b3[..., 1],
                          o34[..., 1, :], w_c)
        j += _eval_params(v_stats, t2[..., 1], e2[..., 1], b3[..., 2],
                          o34[..., 2, :], w_c)
        return j

    b_, rc_, cc_ = typ_y.shape
    col = jnp.arange(cc_)[None, None, :]
    row = jnp.arange(rc_)[None, :, None]
    pl = shift_params(2)
    pu_ = shift_params(1)
    j_left = jnp.where(col > 0, j_of(pl) + lam * 0.6, jnp.inf)
    j_up = jnp.where(row > 0, j_of(pu_) + lam * 1.2, jnp.inf)

    cand = jnp.stack([j_new, j_left, j_up], axis=-1)
    prov = jnp.argmin(cand, axis=-1).astype(jnp.int32)
    # a merge is only kept when the source CTU keeps its own new params
    # (so the copied params equal the evaluated ones; dropping a merge is
    # always stream-legal and never invalidates another decision).
    left_new = jnp.pad(prov[:, :, :-1] == 0, ((0, 0), (0, 0), (1, 0)))
    up_new = jnp.pad(prov[:, :-1, :] == 0, ((0, 0), (1, 0), (0, 0)))
    merge = jnp.where((prov == 1) & left_new, 1,
                      jnp.where((prov == 2) & up_new, 2, 0))

    def apply_merge(x, nbr_l, nbr_u):
        m = merge.reshape(merge.shape + (1,) * (x.ndim - 3))
        return jnp.where(m == 1, nbr_l, jnp.where(m == 2, nbr_u, x))

    sao_type = apply_merge(sao_type, pl[0], pu_[0])
    sao_eo = apply_merge(sao_eo, pl[1], pu_[1])
    sao_bp = apply_merge(sao_bp, pl[2], pu_[2])
    sao_off = apply_merge(sao_off, pl[3], pu_[3])
    return (sao_type.astype(jnp.int32), sao_eo.astype(jnp.int32),
            sao_bp.astype(jnp.int32), sao_off.astype(jnp.int32),
            merge.astype(jnp.int32))


def apply_sao(rec, sao_type, sao_eo, sao_bp, sao_off, comp: int, h: int,
              w: int, span: int = 64, bit_depth: int = 8):
    """Apply SAO params to one plane [B,HP,WP] -> filtered plane."""
    b, hp, wp = rec.shape
    rc, cc = hp // span, wp // span
    tix = 0 if comp == 0 else 1

    def up(x):
        # [B,rc,cc] -> [B,HP,WP] by pure broadcast+reshape (no gathers).
        return jnp.broadcast_to(
            x[:, :, None, :, None],
            (b, rc, span, cc, span)).reshape(b, hp, wp)

    t_pix = up(sao_type[..., tix])
    eo_pix = up(sao_eo[..., tix])
    bp_pix = up(sao_bp[..., comp])

    cat = jnp.zeros_like(rec)
    for cls in range(4):
        cat = jnp.where(eo_pix == cls, eo_category(rec, cls, h, w), cat)
    bidx = band_index(rec, bit_depth) - bp_pix

    # offset selection as a masked sum over the 4 offset slots — a
    # per-pixel take_along_axis gather is far slower on TPU.
    eo_val = jnp.zeros_like(rec)
    bo_val = jnp.zeros_like(rec)
    for k in range(4):
        off_k = up(sao_off[..., comp, k])
        eo_val = eo_val + jnp.where(cat == k + 1, off_k, 0)
        bo_val = bo_val + jnp.where(bidx == k, off_k, 0)

    delta = jnp.where(t_pix == 2, eo_val, jnp.where(t_pix == 1, bo_val, 0))
    maxv = (1 << bit_depth) - 1
    return jnp.clip(rec + delta, 0, maxv)
