"""HEVC deblocking filter as batched JAX ops (H.265 8.7.2).

Equivalent of the reference's TComLoopFilter (loopFilterPic,
TComLoopFilter.cpp:130; luma decision+filters xEdgeFilterLuma :557, chroma
:676, BS derivation xGetBoundaryStrengthSingle :416) — re-designed TPU-first:
all vertical edges of the picture filter in one vectorized pass (the 8-pel
edge grid folds into a block axis by reshape), then all horizontal edges on
the transposed, vertically-filtered planes. All-Intra means every TU/CU
boundary has bS = 2, so the bS map reduces to a static-shape TU-edge mask
derived from the per-slot depth map.

Intra prediction never sees these samples (it reads pre-deblock recon), so
this runs as a frame-level post-pass, exactly like HM's per-picture call
(TEncGOP.cpp:1742).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from hevctpu import rom

# H.265 Table 8-12: beta' and tc' indexed by Q.
BETA_TABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 20, 22, 24,
    26, 28, 30, 32, 34, 36, 38, 40, 42, 44, 46, 48, 50, 52, 54, 56,
    58, 60, 62, 64], dtype=np.int32)
TC_TABLE = np.array([
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 2, 2, 3,
    3, 3, 3, 4, 4, 4, 5, 5, 6, 6, 7, 8, 9, 10, 11, 13,
    14, 16, 18, 20, 22, 24], dtype=np.int32)


def _clip3(lo, hi, x):
    return jnp.clip(x, lo, hi)


def tu_edge_mask(tusz8: jnp.ndarray, w: int) -> jnp.ndarray:
    """Vertical TU-edge flags on the luma 8-grid.

    tusz8 [..., S_y, S_x] = leaf TU log2 per 8x8 slot (2..5; TU splits make
    this finer than the CU size — HEVC deblocks TRANSFORM boundaries,
    8.7.2, TComLoopFilter xSetEdgefilterTU); returns bool [..., S_y, S_x] —
    True when the left edge of slot (sy, sx) is a TU boundary inside the
    picture. All-Intra: bS = 2 exactly on these edges. 4x4 TUs (value 2)
    clip to the 8-grid — sub-8 edges are never filtered. (Horizontal edges
    use the same function on the transposed map.)"""
    tl = jnp.clip(tusz8, 3, 5)                      # deblock grid is 8x8
    step8 = (1 << (tl - 3)).astype(jnp.int32)       # TU size in slots
    pos = jnp.asarray(np.arange(tusz8.shape[-1]))[None, :]
    aligned = (pos % step8) == 0
    inside = (pos > 0) & (pos * 8 < w)
    return aligned & inside


def _luma_vertical(plane: jnp.ndarray, edge8: jnp.ndarray, qp,
                   bit_depth: int = 8):
    """Filter all vertical luma edges. plane [B, H, W] (H, W mult of 8);
    edge8 [B, H/8, W/8] slot edge flags. qp: static int, or (cu_qp_delta
    operating points) an int32 per-slot map [B, H/8, W/8] — each edge's
    threshold Q is then the average of the two sides' QPs per 8.7.2.5.3
    ((QpQ + QpP + 1) >> 1) and beta/tc become per-edge gathers. Returns
    the filtered plane."""
    b, h, w = plane.shape
    e = w // 8
    if isinstance(qp, (int, np.integer)):
        q_b = min(max(qp, 0), 51)
        q_t = min(max(qp + 2, 0), 53)
        beta = int(BETA_TABLE[q_b]) << (bit_depth - 8)
        tc = int(TC_TABLE[q_t]) << (bit_depth - 8)
        tc4 = tc                                     # broadcasts anywhere
        if tc == 0 and beta == 0:
            return plane
    else:
        qe = (qp[:, :, :-1] + qp[:, :, 1:] + 1) >> 1   # [B, H/8, E-1]
        qe = jnp.repeat(qe, 2, axis=1)                 # [B, H/4, E-1]
        beta = jnp.asarray(BETA_TABLE)[
            jnp.clip(qe, 0, 51)] << (bit_depth - 8)
        tc = jnp.asarray(TC_TABLE)[
            jnp.clip(qe + 2, 0, 53)] << (bit_depth - 8)
        tc4 = tc[:, :, None, :]                        # line axis
    maxv = (1 << bit_depth) - 1

    blk = jnp.asarray(plane).reshape(b, h, e, 8)
    # pq [B, H, E-0.. , 8]: samples p3..p0 q0..q3 around edge k (x = 8(k+1)).
    pq = jnp.concatenate([blk[:, :, :-1, 4:], blk[:, :, 1:, :4]], axis=-1)
    pq = pq.reshape(b, h // 4, 4, e - 1, 8)         # 4-line segments
    p3, p2, p1, p0 = (pq[..., i] for i in range(4))
    q0, q1, q2, q3 = (pq[..., 4 + i] for i in range(4))

    # decisions from lines 0 and 3 (8.7.2.5.3)
    dp = jnp.abs(p2 - 2 * p1 + p0)                  # [B, S, 4, E]
    dq = jnp.abs(q2 - 2 * q1 + q0)
    dp0, dp3 = dp[:, :, 0], dp[:, :, 3]
    dq0, dq3 = dq[:, :, 0], dq[:, :, 3]
    d = dp0 + dq0 + dp3 + dq3                       # [B, S, E]
    edge_seg = jnp.repeat(edge8, 2, axis=1)[..., 1:]  # [B, H/4, E-1]
    filt = (d < beta) & edge_seg

    def dsam(i):
        return ((2 * (dp[:, :, i] + dq[:, :, i]) < (beta >> 2))
                & (jnp.abs(p3[:, :, i] - p0[:, :, i])
                   + jnp.abs(q0[:, :, i] - q3[:, :, i]) < (beta >> 3))
                & (jnp.abs(p0[:, :, i] - q0[:, :, i])
                   < ((5 * tc + 1) >> 1)))

    strong = dsam(0) & dsam(3)                      # [B, S, E]
    dep1 = dp0 + dp3 < ((beta + (beta >> 1)) >> 3)
    deq1 = dq0 + dq3 < ((beta + (beta >> 1)) >> 3)

    # strong filter (8.7.2.5.7), clip +-2tc
    def sclip(orig, val):
        return _clip3(orig - 2 * tc4, orig + 2 * tc4, val)

    sp0 = sclip(p0, (p2 + 2 * p1 + 2 * p0 + 2 * q0 + q1 + 4) >> 3)
    sp1 = sclip(p1, (p2 + p1 + p0 + q0 + 2) >> 2)
    sp2 = sclip(p2, (2 * p3 + 3 * p2 + p1 + p0 + q0 + 4) >> 3)
    sq0 = sclip(q0, (p1 + 2 * p0 + 2 * q0 + 2 * q1 + q2 + 4) >> 3)
    sq1 = sclip(q1, (p0 + q0 + q1 + q2 + 2) >> 2)
    sq2 = sclip(q2, (p0 + q0 + q1 + 3 * q2 + 2 * q3 + 4) >> 3)

    # weak filter (8.7.2.5.7)
    delta = (9 * (q0 - p0) - 3 * (q1 - p1) + 8) >> 4
    weak_on = jnp.abs(delta) < tc4 * 10
    dlt = _clip3(-tc4, tc4, delta)
    wp0 = jnp.clip(p0 + dlt, 0, maxv)
    wq0 = jnp.clip(q0 - dlt, 0, maxv)
    dltp = _clip3(-(tc4 >> 1), tc4 >> 1,
                  (((p2 + p0 + 1) >> 1) - p1 + dlt) >> 1)
    wp1 = jnp.clip(p1 + dltp, 0, maxv)
    dltq = _clip3(-(tc4 >> 1), tc4 >> 1,
                  (((q2 + q0 + 1) >> 1) - q1 - dlt) >> 1)
    wq1 = jnp.clip(q1 + dltq, 0, maxv)

    st = strong[:, :, None, :] & filt[:, :, None, :]
    wk = (~strong[:, :, None, :]) & filt[:, :, None, :] & weak_on
    wkp1 = wk & dep1[:, :, None, :]
    wkq1 = wk & deq1[:, :, None, :]

    np0 = jnp.where(st, sp0, jnp.where(wk, wp0, p0))
    np1 = jnp.where(st, sp1, jnp.where(wkp1, wp1, p1))
    np2 = jnp.where(st, sp2, p2)
    nq0 = jnp.where(st, sq0, jnp.where(wk, wq0, q0))
    nq1 = jnp.where(st, sq1, jnp.where(wkq1, wq1, q1))
    nq2 = jnp.where(st, sq2, q2)

    out = jnp.stack([p3, np2, np1, np0, nq0, nq1, nq2, q3], axis=-1)
    out = out.reshape(b, h, e - 1, 8)
    blk = blk.at[:, :, :-1, 4:].set(out[..., :4])
    blk = blk.at[:, :, 1:, :4].set(out[..., 4:])
    return blk.reshape(b, h, w)


def _chroma_vertical(plane: jnp.ndarray, edge_rows: jnp.ndarray, qp_c,
                     bit_depth: int = 8):
    """Filter all vertical chroma edges (8.7.2.5.5; bS = 2 edges only).
    plane [B, Hc, Wc]; edge_rows [B, Hc, Wc/8] per-chroma-row edge flags
    (column k flags the edge at chroma x = 8k). qp_c: static int, or a
    per-edge chroma-QP array [B, Hc, Wc/8 - 1] (cu_qp_delta: derived from
    the two sides' averaged luma QPs through the chroma QP table)."""
    b, h, w = plane.shape
    e = w // 8
    if isinstance(qp_c, (int, np.integer)):
        q_t = min(max(qp_c + 2, 0), 53)
        tc = int(TC_TABLE[q_t]) << (bit_depth - 8)
        if tc == 0 or e < 2:
            return plane
    else:
        if e < 2:
            return plane
        tc = jnp.asarray(TC_TABLE)[
            jnp.clip(qp_c + 2, 0, 53)] << (bit_depth - 8)
    maxv = (1 << bit_depth) - 1
    blk = jnp.asarray(plane).reshape(b, h, e, 8)
    pq = jnp.concatenate([blk[:, :, :-1, 6:], blk[:, :, 1:, :2]], axis=-1)
    p1, p0, q0, q1 = (pq[..., i] for i in range(4))
    delta = _clip3(-tc, tc, ((((q0 - p0) << 2) + p1 - q1 + 4) >> 3))
    np0 = jnp.clip(p0 + delta, 0, maxv)
    nq0 = jnp.clip(q0 - delta, 0, maxv)
    filt = edge_rows[..., 1:]                            # [B, H, E-1]
    blk = blk.at[:, :, :-1, 7].set(jnp.where(filt, np0, p0))
    blk = blk.at[:, :, 1:, 0].set(jnp.where(filt, nq0, q0))
    return blk.reshape(b, h, w)


def deblock_frame(y, u, v, tusz8, qp, h: int, w: int,
                  bit_depth: int = 8):
    """Full-frame deblocking: vertical edges of all 3 planes, then
    horizontal edges on the transposed result (spec filter order).

    y [B, HP, WP], u/v [B, HP/2, WP/2] (CTU-padded recon; only in-picture
    edges filter), tusz8 [B, HP/8, WP/8] leaf TU log2 per slot. qp:
    static int, or a per-slot luma QP map [B, HP/8, WP/8] (cu_qp_delta:
    per-edge thresholds from the averaged side QPs, 8.7.2.5.3/8.7.2.5.5).
    Returns the filtered planes.
    """
    scalar_qp = isinstance(qp, (int, np.integer))
    qp_c = rom.chroma_qp_from_luma(qp) if scalar_qp else None

    def chroma_edge_qp(qmap):
        """[B, S_y, S_x] luma slot QPs -> [B, Hc, Ec-1] per-chroma-edge
        chroma QP (sides averaged, then Table 8-10)."""
        ec = qmap.shape[-1] // 2           # chroma 8-blocks per row
        qa = qmap[:, :, 1::2][:, :, :ec - 1]
        qb = qmap[:, :, 2::2][:, :, :ec - 1]
        qavg = (qa + qb + 1) >> 1
        qc = jnp.asarray(rom.CHROMA_QP_TABLE)[jnp.clip(qavg, 0, 57)]
        return jnp.repeat(qc, 4, axis=1)   # luma slot row = 4 chroma rows

    def run(yy, uu, vv, d8, qmap, width):
        ey = tu_edge_mask(d8, width)
        # chroma edges live on the chroma 8-grid = luma 16-grid: take every
        # 2nd luma slot column, and expand slot rows to chroma rows (one
        # luma slot row = 4 chroma rows) so bS follows luma structure
        # per-line.
        ec_rows = jnp.repeat(ey[:, :, ::2], 4, axis=1)
        qc = qp_c if scalar_qp else chroma_edge_qp(qmap)
        yy = _luma_vertical(yy, ey, qp if scalar_qp else qmap, bit_depth)
        uu = _chroma_vertical(uu, ec_rows, qc, bit_depth)
        vv = _chroma_vertical(vv, ec_rows, qc, bit_depth)
        return yy, uu, vv

    # vertical pass, then horizontal pass = vertical pass on the transpose
    qmap = None if scalar_qp else jnp.asarray(qp)
    y, u, v = run(y, u, v, tusz8, qmap, w)
    yt, ut, vt = (jnp.swapaxes(p, -1, -2) for p in (y, u, v))
    d8t = jnp.swapaxes(tusz8, -1, -2)
    qt = None if scalar_qp else jnp.swapaxes(qmap, -1, -2)
    yt, ut, vt = run(yt, ut, vt, d8t, qt, h)
    return (jnp.swapaxes(yt, -1, -2), jnp.swapaxes(ut, -1, -2),
            jnp.swapaxes(vt, -1, -2))
