"""The TPU frame encoder: CNN-pruned All-Intra mode decision + wavefront
reconstruction, as one jitted program per frame batch.

This replaces the reference's CTU-serial recursive search
(TEncCu::compressCtu/xCompressCU, TEncCu.cpp:234-1104 + TEncSearch
estIntraPredLumaQT, TEncSearch.cpp:2203) with a TPU-first two-stage design:

  Stage 1 (fully parallel "search"): for every possible CU at every depth,
  predict all 35 modes from *original* neighbors and pick the SATD-best
  mode. Dense over the frame: pure batched gathers + matmuls, no recursion.
  (HM's pass-1 also uses SATD, TEncSearch.cpp:2296-2320; we drop the
  recon-feedback coupling so the whole frame batches — decisions only,
  conformance is unaffected.)

  Stage 2 (wavefront reconstruction): with the partition fixed by the CNN
  labels (TEncCu.cpp:509-520 gate semantics -> ops/ctu.py) and modes fixed
  by stage 1, reconstruct exactly like a decoder would: CTUs in wavefront
  diagonals (d = 2r + c, so left/above/above-right neighbors are done — the
  same availability set as HM's raster order), TUs in z-order within the
  CTU via a static 84-step schedule. Produces the quantized coefficients,
  CBFs and bit-exact reconstruction the (host) CABAC stage serializes.

All shapes are static per (H, W); frames batch along a leading axis.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from hevctpu import rom
from hevctpu.ops import (cost, ctu, deblock, intra, intra_mm, quant, rate,
                         rd, sao, satd_fused, transforms)


def _use_fused_satd() -> bool:
    """Fused Pallas stage-1 kernel on TPU (HEVCTPU_FUSED=0/1 overrides)."""
    import os
    v = os.environ.get("HEVCTPU_FUSED")
    if v is not None:
        return v not in ("0", "false")
    return jax.default_backend() == "tpu"

# ---------------------------------------------------------------------------
# Geometry
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class Geometry:
    h: int
    w: int

    @property
    def rc(self) -> int:
        return -(-self.h // 64)

    @property
    def cc(self) -> int:
        return -(-self.w // 64)

    @property
    def hp(self) -> int:
        return self.rc * 64

    @property
    def wp(self) -> int:
        return self.cc * 64

    @functools.cached_property
    def wavefront(self):
        """(act_r, act_c, act_mask) [D, A]: CTUs active on each diagonal
        d = 2r + c (the WPP dependency order, TEncSlice.cpp:808-823)."""
        rc, cc = self.rc, self.cc
        diags = [[(r, c) for r in range(rc) for c in range(cc)
                  if 2 * r + c == d] for d in range(2 * (rc - 1) + cc)]
        a = max(len(x) for x in diags)
        d = len(diags)
        act_r = np.zeros((d, a), dtype=np.int32)
        act_c = np.zeros((d, a), dtype=np.int32)
        act_m = np.zeros((d, a), dtype=bool)
        for i, cells in enumerate(diags):
            for j, (r, c) in enumerate(cells):
                act_r[i, j], act_c[i, j], act_m[i, j] = r, c, True
        return act_r, act_c, act_m

    @functools.cached_property
    def bh_bw(self):
        bh = np.clip(self.h - 64 * np.arange(self.rc), 0, 64).astype(np.int32)
        bw = np.clip(self.w - 64 * np.arange(self.cc), 0, 64).astype(np.int32)
        return bh, bw

    @functools.lru_cache(maxsize=None)
    def wavefront_tiled(self, tiles: int):
        """Per-tile wavefront tables [T, D, A]: each tile owns cc/tiles
        contiguous CTU columns; a diagonal's active set is restricted to
        the tile's own columns (act_c stays GLOBAL for coordinate math;
        subtract the tile's base for local indexing). A is the max
        per-tile per-diagonal occupancy — the tile axis divides stage-2
        step width by ~T, which is where its speedup comes from."""
        rc, cc = self.rc, self.cc
        assert cc % tiles == 0, (cc, tiles)
        cl = cc // tiles
        d_tot = 2 * (rc - 1) + cc
        sets = [[[(r, c) for r in range(rc) for c in range(cc)
                  if 2 * r + c == d and t * cl <= c < (t + 1) * cl]
                 for d in range(d_tot)] for t in range(tiles)]
        a = max(len(cells) for per_t in sets for cells in per_t)
        a = max(a, 1)
        act_r = np.zeros((tiles, d_tot, a), dtype=np.int32)
        act_c = np.zeros((tiles, d_tot, a), dtype=np.int32)
        act_m = np.zeros((tiles, d_tot, a), dtype=bool)
        for t in range(tiles):
            for d, cells in enumerate(sets[t]):
                for j, (r, c) in enumerate(cells):
                    act_r[t, d, j], act_c[t, d, j] = r, c
                    act_m[t, d, j] = True
        return act_r, act_c, act_m


def pad_plane(p: jnp.ndarray, hp: int, wp: int) -> jnp.ndarray:
    """Edge-replicate pad [..., H, W] -> [..., hp, wp] (HM pads the source
    to CTU multiples the same way, TVideoIOYuv readPlane)."""
    return jnp.pad(p, [(0, 0)] * (p.ndim - 2)
                   + [(0, hp - p.shape[-2]), (0, wp - p.shape[-1])],
                   mode="edge")


def to_blocked(plane: jnp.ndarray, n: int) -> jnp.ndarray:
    """[..., R*n, C*n] -> [..., R, C, n, n]."""
    s = plane.shape
    r, c = s[-2] // n, s[-1] // n
    return plane.reshape(*s[:-2], r, n, c, n).swapaxes(-3, -2)


def from_blocked(b: jnp.ndarray) -> jnp.ndarray:
    s = b.shape
    return b.swapaxes(-3, -2).reshape(*s[:-4], s[-4] * s[-2], s[-3] * s[-1])


# ---------------------------------------------------------------------------
# Stage 1: dense SATD mode decision
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _grid_avail(geom: Geometry, n: int, scale: int = 1) -> np.ndarray:
    """Static availability mask [R, C, 4n+1] for every aligned n x n block
    of the plane (scale=2 for chroma: CTU span 32, half-res picture)."""
    span = 64 // scale
    hp, wp = geom.hp // scale, geom.wp // scale
    gy, gx = np.meshgrid(np.arange(0, hp, n), np.arange(0, wp, n),
                         indexing="ij")
    gy, gx = gy.ravel(), gx.ravel()
    zm = ctu.morton(span // 4)
    with jax.ensure_compile_time_eval():
        av = np.asarray(ctu.boundary_available(
            gy % span, gx % span, n, zm[(gy % span) // 4, (gx % span) // 4],
            (gy // span) * span, (gx // span) * span,
            geom.h // scale, geom.w // scale, scale=scale))
    return av.reshape(hp // n, wp // n, 4 * n + 1)


def _dense_costs(plane: jnp.ndarray, geom: Geometry, n: int,
                 qp: int | None = None, lam: float = 0.0, *,
                 is_luma: bool = True, scale: int = 1,
                 bsrc: jnp.ndarray | None = None,
                 rate_model: str = "ctx") -> jnp.ndarray:
    """Cost of all 35 modes for every aligned n x n position.

    plane [B, hp, wp] (luma). Returns [B, R, C, 35]. With qp=None this is
    the SATD cost (int32, the reference's pass-1 measure,
    TEncSearch.cpp:2296-2320); with a qp it is the dense RD estimate
    (float32): transform-domain SSE + λ·estimated CABAC bits (ops/rd.py),
    i.e. the reference's pass-2 full-RD trial (TEncSearch.cpp:1129-1549)
    evaluated for *every* mode at *every* position as batched matmuls.
    Rows are chunked with lax.map so the [*, 35, n, n] intermediates stay
    bounded.

    bsrc (default: plane) is the plane neighbor boundaries are read from.
    Passing a prior-pass reconstruction approximates HM's recon-feedback
    mode decision (references are reconstructed neighbors mid-search,
    TEncSearch.cpp:1129-1170) while keeping the search dense.
    """
    b, hp, wp = plane.shape
    r_n, c_n = hp // n, wp // n
    bounds = intra_mm.grid_boundaries(
        plane if bsrc is None else bsrc, n)                   # [B,R,C,4n+1]
    av = _grid_avail(geom, n, scale)
    blocks = to_blocked(plane, n)                             # [B,R,C,n,n]

    if qp is None and _use_fused_satd():
        # Fused Pallas path: predictions never leave VMEM, so no chunking
        # is needed — the [.., 35, n, n] intermediate does not exist.
        filled = intra.fill_reference(
            bounds, jnp.broadcast_to(jnp.asarray(av), bounds.shape))
        top_e, left_e = intra.split_boundary(filled, n)
        top_f, left_f = intra.smooth_reference(top_e, left_e, n)
        return satd_fused.dense_mode_costs(top_e, left_e, top_f, left_f,
                                           blocks, n)

    # Chunk rows: keep the [B, rows, C, 35, n, n] intermediates <= ~256 MB
    # (the RD path keeps ~6 of them live: pred/res/coef/lvl/deq/err).
    live = 2 if qp is None else 6
    per_row = b * c_n * 35 * n * n * 4 * live
    rows_chunk = int(max(1, min(r_n, (256 << 20) // max(per_row, 1))))
    k = -(-r_n // rows_chunk)
    pad_r = k * rows_chunk - r_n

    def pad_rows(x):
        return jnp.pad(x, [(0, 0), (0, pad_r)] + [(0, 0)] * (x.ndim - 2))

    bd = pad_rows(bounds).reshape(b, k, rows_chunk, c_n, 4 * n + 1)
    bk = pad_rows(blocks).reshape(b, k, rows_chunk, c_n, n, n)
    avp = np.pad(av, [(0, pad_r), (0, 0), (0, 0)])
    avk = jnp.asarray(avp.reshape(k, rows_chunk, c_n, 4 * n + 1))

    def chunk_fn(args):
        bd_c, bk_c, av_c = args                # [B,rows,C,L], [B,rows,C,n,n]
        filled = intra.fill_reference(bd_c, jnp.broadcast_to(av_c, bd_c.shape))
        top_e, left_e = intra.split_boundary(filled, n)
        top_f, left_f = intra.smooth_reference(top_e, left_e, n)
        preds = intra_mm.predict_all_modes_mm(top_e, left_e, top_f, left_f, n,
                                              is_luma=is_luma)
        if qp is None:
            return cost.satd(preds, bk_c[..., None, :, :])    # [B,rows,C,35]
        log2 = int(np.log2(n))
        rdc, _, _ = rd.mode_rd_costs(preds, bk_c, log2, qp, lam=lam,
                                     dst=(is_luma and n == 4),
                                     is_luma=is_luma, rate_model=rate_model)
        return rdc

    if k == 1:
        costs = chunk_fn((bd[:, 0], bk[:, 0], avk[0]))[:, None]
    else:
        costs = jax.lax.map(
            chunk_fn, (jnp.moveaxis(bd, 1, 0), jnp.moveaxis(bk, 1, 0), avk))
        costs = jnp.moveaxis(costs, 0, 1)
    costs = costs.reshape(b, k * rows_chunk, c_n, 35)[:, :r_n]
    return costs


_MODE_IDX = np.arange(35, dtype=np.int32)


def _mpm_modes(best: jnp.ndarray):
    """3-entry MPM list per grid position (H.265 8.4.2) derived from the
    grid of provisional neighbor decisions `best` [B, R, C] (left/above
    same-size neighbors; unavailable counts as DC). Returns (m0, m1, m2)
    each [B, R, C] int32."""
    left = jnp.pad(best[:, :, :-1], ((0, 0), (0, 0), (1, 0)),
                   constant_values=rom.DC_IDX)
    above = jnp.pad(best[:, :-1, :], ((0, 0), (1, 0), (0, 0)),
                    constant_values=rom.DC_IDX)
    a, bm = left, above
    eq = a == bm
    a_small = a < 2
    m0 = jnp.where(eq, jnp.where(a_small, rom.PLANAR_IDX, a), a)
    m1 = jnp.where(eq, jnp.where(a_small, rom.DC_IDX, 2 + ((a + 29) % 32)),
                   bm)
    m2_eq = jnp.where(a_small, rom.VER_IDX, 2 + ((a - 1) % 32))
    has_pl = (a == rom.PLANAR_IDX) | (bm == rom.PLANAR_IDX)
    has_dc = (a == rom.DC_IDX) | (bm == rom.DC_IDX)
    m2_ne = jnp.where(~has_pl, rom.PLANAR_IDX,
                      jnp.where(~has_dc, rom.DC_IDX, rom.VER_IDX))
    m2 = jnp.where(eq, m2_eq, m2_ne)
    return (m0.astype(jnp.int32), m1.astype(jnp.int32), m2.astype(jnp.int32))


_MB_GLOBAL = (1.8, 2.8, 5.8)  # legacy fitted (mpm0, mpm1/2, rem) bits


def _mode_bits_tab(qp: int, rate_model: str):
    """(mpm_idx0, mpm_idx1/2, non-mpm) signaling bits."""
    if rate_model == "ctx":
        from hevctpu.ops import rate_ctx
        return rate_ctx.mode_signal_bits(qp)
    return _MB_GLOBAL


def _mode_bits_at(cand: jnp.ndarray, m0, m1, m2, scale: float,
                  mb=_MB_GLOBAL) -> jnp.ndarray:
    """scale-weighted signaling cost of the candidate modes [..., K] given
    the MPM triple [...] (the reference's λ·xModeBitsIntra term,
    TEncSearch.cpp:2296-2320,5530): prev_intra_luma_pred_flag ctx bin +
    mpm_idx truncated-unary bypass, or flag + 5 bypass. mb holds the
    three totals — init-context-state exact under rate_model "ctx"."""
    is0 = cand == m0[..., None]
    is12 = (cand == m1[..., None]) | (cand == m2[..., None])
    bits = jnp.where(is0, mb[0], jnp.where(is12, mb[1], mb[2]))
    return (scale * bits).astype(jnp.float32)


def _dense_rd_candidates(plane: jnp.ndarray, geom: Geometry, n: int,
                         cand: jnp.ndarray, qp: int, lam: float, *,
                         is_luma: bool = True, scale: int = 1,
                         bsrc: jnp.ndarray | None = None,
                         rate_model: str = "ctx",
                         cbf_ctx: int | None = None) -> jnp.ndarray:
    """Full-RD cost of the selected candidate modes at every aligned
    n x n position: predict (all 35, one MXU matmul) -> gather the K
    candidates -> transform + quant + rate estimate only for those.

    plane [B, hp, wp]; cand [B, R, C, K] int32. Returns [B, R, C, K]
    float32 (residual RD only — mode-signaling bits are the caller's).
    This is the reference's pass-2 structure (full RD over the 3..8
    SATD-preselected candidates + MPMs, TEncSearch.cpp:2267-2345) instead
    of dense 35-mode RD — ~5x less transform/quant/rate work.
    """
    b, hp, wp = plane.shape
    r_n, c_n = hp // n, wp // n
    kc = cand.shape[-1]
    bounds = intra_mm.grid_boundaries(
        plane if bsrc is None else bsrc, n)                   # [B,R,C,4n+1]
    av = _grid_avail(geom, n, scale)
    blocks = to_blocked(plane, n)                             # [B,R,C,n,n]
    log2 = int(np.log2(n))

    # Chunk rows: the [B, rows, C, 35, n, n] predictions plus ~6 live
    # [.., K, n, n] RD intermediates must stay <= ~256 MB.
    live = 35 + 6 * kc
    per_row = b * c_n * live * n * n * 4
    rows_chunk = int(max(1, min(r_n, (256 << 20) // max(per_row, 1))))
    k = -(-r_n // rows_chunk)
    pad_r = k * rows_chunk - r_n

    def pad_rows(x):
        return jnp.pad(x, [(0, 0), (0, pad_r)] + [(0, 0)] * (x.ndim - 2))

    bd = pad_rows(bounds).reshape(b, k, rows_chunk, c_n, 4 * n + 1)
    bk = pad_rows(blocks).reshape(b, k, rows_chunk, c_n, n, n)
    cd = pad_rows(cand).reshape(b, k, rows_chunk, c_n, kc)
    avp = np.pad(av, [(0, pad_r), (0, 0), (0, 0)])
    avk = jnp.asarray(avp.reshape(k, rows_chunk, c_n, 4 * n + 1))

    def chunk_fn(args):
        bd_c, bk_c, cd_c, av_c = args
        filled = intra.fill_reference(bd_c, jnp.broadcast_to(av_c, bd_c.shape))
        top_e, left_e = intra.split_boundary(filled, n)
        top_f, left_f = intra.smooth_reference(top_e, left_e, n)
        preds = intra_mm.predict_all_modes_mm(top_e, left_e, top_f, left_f, n,
                                              is_luma=is_luma)
        sel = jnp.take_along_axis(
            preds, cd_c[..., None, None].astype(jnp.int32), axis=-3)
        rdc, _, _ = rd.mode_rd_costs(sel, bk_c, log2, qp, lam=lam,
                                     dst=(is_luma and n == 4),
                                     is_luma=is_luma, rate_model=rate_model,
                                     cbf_ctx=cbf_ctx)
        return rdc

    if k == 1:
        costs = chunk_fn((bd[:, 0], bk[:, 0], cd[:, 0], avk[0]))[:, None]
    else:
        costs = jax.lax.map(
            chunk_fn, (jnp.moveaxis(bd, 1, 0), jnp.moveaxis(bk, 1, 0),
                       jnp.moveaxis(cd, 1, 0), avk))
        costs = jnp.moveaxis(costs, 0, 1)
    return costs.reshape(b, k * rows_chunk, c_n, kc)[:, :r_n]


# SATD-preselection candidate count per block size (the reference's
# g_aucIntraModeNumFast_UseMPM = {3,8,8,3,3,3} for 2..64, TComRom.cpp:
# 544-552); the 3 MPMs are force-included on top (TEncSearch.cpp:2322-2345).
_NUM_CAND = {4: 8, 8: 8, 16: 3, 32: 3, 64: 3}


def _pass1_candidates(satd: jnp.ndarray, lam: float, n: int,
                      mb=_MB_GLOBAL):
    """HM's pass-1 preselection: SATD + sqrt(λ)·mode-bits, keep top-N, then
    force-include the 3 MPMs. satd [B, R, C, 35] -> (cand [B,R,C,N+3],
    (m0,m1,m2)). MPMs derive from the provisional SATD argmin grid."""
    prov = jnp.argmin(satd, axis=-1).astype(jnp.int32)
    m0, m1, m2 = _mpm_modes(prov)
    sqlam = float(np.sqrt(lam))
    all_modes = jnp.broadcast_to(jnp.asarray(_MODE_IDX),
                                 satd.shape)
    p1 = satd.astype(jnp.float32) + _mode_bits_at(all_modes, m0, m1, m2,
                                                  sqlam, mb)
    _, topn = jax.lax.top_k(-p1, _NUM_CAND[n])
    cand = jnp.concatenate(
        [topn.astype(jnp.int32), m0[..., None], m1[..., None],
         m2[..., None]], axis=-1)
    return cand, (m0, m1, m2)


def _dense_mode_decision(plane: jnp.ndarray, geom: Geometry, qp: int,
                         bsrc: jnp.ndarray | None = None,
                         rate_model: str = "ctx"):
    """RD-best mode + cost for every CU/PU position at every depth.

    Two-pass, exactly the reference's structure vectorized: pass 1 scores
    all 35 modes by SATD + sqrt(λ)·mode-bits everywhere (one fused kernel),
    pass 2 full-RDs only the top-N + 3 MPM candidates
    (TEncSearch.cpp:2203-2345). Returns (modes {n: [B, R, C] int32},
    costs {n: [B, R, C] float32}) for n in (64, 32, 16, 8, 4); costs
    include residual + λ·mode-signaling bits. The 64 entry evaluates its
    candidates as four 32x32 TUs (max TU is 32) with the mode signaled
    once; the 4 entry is the per-PU cost of PART_NxN at depth 3
    (TEncCu.cpp:815-827)."""
    lam = rate.lambda_rd(qp)
    mb = _mode_bits_tab(qp, rate_model)
    modes, costs = {}, {}
    satd32 = None
    for n in (32, 16, 8, 4):
        satd = _dense_costs(plane, geom, n, None, 0.0, bsrc=bsrc)
        cand, (m0, m1, m2) = _pass1_candidates(satd, lam, n, mb)
        rdc = _dense_rd_candidates(plane, geom, n, cand, qp, lam, bsrc=bsrc,
                                   rate_model=rate_model)
        rdc = rdc + _mode_bits_at(cand, m0, m1, m2, lam, mb)
        best = jnp.argmin(rdc, axis=-1)
        modes[n] = jnp.take_along_axis(cand, best[..., None],
                                       axis=-1)[..., 0]
        costs[n] = jnp.min(rdc, axis=-1)
        if n == 32:
            satd32 = satd
    # 64-CU: pool quadrant SATDs per mode, preselect, then RD the four
    # 32x32 TUs at each shared candidate mode.
    b, r32, c32n = satd32.shape[:3]
    s64 = satd32.reshape(b, r32 // 2, 2, c32n // 2, 2, 35).sum(axis=(2, 4))
    cand64, (m0, m1, m2) = _pass1_candidates(s64, lam, 64, mb)
    cand64_32 = jnp.repeat(jnp.repeat(cand64, 2, axis=1), 2, axis=2)
    rd_q = _dense_rd_candidates(plane, geom, 32, cand64_32, qp, lam,
                                bsrc=bsrc, rate_model=rate_model)
    rd64 = (rd_q.reshape(b, r32 // 2, 2, c32n // 2, 2, cand64.shape[-1])
            .sum(axis=(2, 4))) + _mode_bits_at(cand64, m0, m1, m2, lam, mb)
    best = jnp.argmin(rd64, axis=-1)
    modes[64] = jnp.take_along_axis(cand64, best[..., None], axis=-1)[..., 0]
    costs[64] = jnp.min(rd64, axis=-1)
    return modes, costs


_CHROMA_LIST = np.array([rom.PLANAR_IDX, rom.VER_IDX, rom.HOR_IDX,
                         rom.DC_IDX], np.int32)


def _dense_chroma_decision(up, vp, geom: Geometry, qp: int, qp_c: int,
                           luma_modes: dict, bsrc_u=None, bsrc_v=None,
                           rate_model: str = "ctx"):
    """Per-CU chroma mode selection (intra_chroma_pred_mode search).

    The reference searches DM + {planar, ver, hor, DC} per chroma PU with
    full RD (TEncSearch::estIntraPredChromaQT, TEncSearch.cpp:2588); the
    mode is shared by Cb and Cr. Dense equivalent: joint Cb+Cr RD of all
    35 modes per chroma block, gathered at the 5 legal candidates (with
    the ==luma -> 34 substitution of H.265 Table 8-3). Returns, keyed by
    *luma* CU size n in (64, 32, 16, 8):
      csel  {n: [B,R,C] int32} — signaled symbol (0..3 list index, 4 = DM)
      cmode {n: [B,R,C] int32} — resolved chroma prediction mode
      ccost {n: [B,R,C] f32}  — w_c-weighted joint chroma RD at the choice
    """
    lam = rate.lambda_rd(qp)
    w_c = rate.chroma_dist_weight(qp, qp_c)
    lam_c = lam / w_c
    if rate_model == "ctx":
        from hevctpu.ops import rate_ctx
        sel_bits = rate_ctx.chroma_sel_bits(qp)
    else:
        sel_bits = (2.6, 2.6, 2.6, 2.6, 0.6)
    csel, cmode, ccost = {}, {}, {}
    for n in (64, 32, 16, 8):
        m = n // 2
        lm = luma_modes[n]                                   # [B,R,C]
        cand = jnp.broadcast_to(jnp.asarray(_CHROMA_LIST), lm.shape + (4,))
        cand = jnp.where(cand == lm[..., None], 34, cand)
        cand = jnp.concatenate([cand, lm[..., None]], axis=-1)  # slot 4 = DM
        rd_u = _dense_rd_candidates(up, geom, m, cand, qp_c, lam_c,
                                    is_luma=False, scale=2, bsrc=bsrc_u,
                                    rate_model=rate_model, cbf_ctx=0)
        rd_v = _dense_rd_candidates(vp, geom, m, cand, qp_c, lam_c,
                                    is_luma=False, scale=2, bsrc=bsrc_v,
                                    rate_model=rate_model, cbf_ctx=0)
        jc = rd_u + rd_v                                     # [B,R,C,5]
        # signaling: DM = 1 ctx bin; list entry = 1 ctx + 2 bypass bins
        # (init-context-state exact under rate_model "ctx").
        jc = jc + jnp.asarray(sel_bits, jnp.float32) * lam_c
        best = jnp.argmin(jc, axis=-1).astype(jnp.int32)
        csel[n] = best
        cmode[n] = jnp.take_along_axis(cand, best[..., None],
                                       axis=-1)[..., 0]
        ccost[n] = w_c * jnp.min(jc, axis=-1)
    return csel, cmode, ccost


def _rd_split_labels(costs: dict, qp: int,
                     rate_model: str = "ctx") -> jnp.ndarray:
    """Bottom-up RD quadtree decision -> per-CTU 16-label vectors.

    The reference compares the merged cost of the four children against the
    parent CU after adding the split-flag bits (TEncCu::xCompressCU
    :858-867 + xCheckBestMode :1084). Dense equivalent: pool child costs
    2x2 and take the min at each level.

    Under rate_model "ctx" every syntax element is already counted where
    it is coded (cbf/chroma-mode/part_mode in the per-CU costs), so the
    only cross-level terms are the split_cu_flag bins themselves, priced
    at init state (middle neighbor-depth context). The legacy "global"
    model keeps the fitted oh_cu/oh_split scalars.
    Returns labels [B, rc*cc, 16] int32 in the CNN-label layout."""
    lam = rate.lambda_rd(qp)
    if rate_model == "ctx":
        from hevctpu.ops import rate_ctx
        s0, s1 = rate_ctx.split_cu_bits(qp)
        oh_cu = 0.0
        oh_self, oh_split = lam * s0, lam * s1
    else:
        oh_cu = lam * 3.2    # per-CU fixed bins: chroma mode + cbf flags
        oh_self, oh_split = 0.0, lam * 0.8  # split_cu_flag bin

    def pool4(x):
        b, r, c = x.shape
        return x.reshape(b, r // 2, 2, c // 2, 2).sum(axis=(2, 4))

    c8 = costs[8] + oh_cu                    # min CU: no split flag
    c16_split = pool4(c8) + oh_split
    c16_self = costs[16] + oh_cu + oh_self
    take16 = c16_self <= c16_split                     # [B, R16, C16]
    c16 = jnp.minimum(c16_self, c16_split)

    c32_split = pool4(c16) + oh_split
    c32_self = costs[32] + oh_cu + oh_self
    take32 = c32_self <= c32_split
    c32 = jnp.minimum(c32_self, c32_split)

    c64_split = pool4(c32) + oh_split
    c64_self = costs[64] + 4 * oh_cu + oh_self         # codes as 4 TU32s
    take64 = c64_self <= c64_split

    # labels per 16x16 block: 0/1/2/3 by the nesting decisions.
    def up2(x):
        return jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)

    lab = jnp.where(up2(up2(take64)), 0,
                    jnp.where(up2(take32), 1, jnp.where(take16, 2, 3)))
    b, r16, c16n = lab.shape
    rc, cc = r16 // 4, c16n // 4
    lab = lab.reshape(b, rc, 4, cc, 4).transpose(0, 1, 3, 2, 4)
    return lab.reshape(b, rc * cc, 16).astype(jnp.int32)


def _tu_tree_decision(plane: jnp.ndarray, geom: Geometry, qp: int,
                      cu_log2: int, mode_cu: jnp.ndarray, bsrc=None,
                      rate_model: str = "ctx"):
    """Intra TU quadtree RD decision (the reference's checkFull-vs-
    checkSplit recursion, TEncSearch::xRecurIntraCodingLumaQT,
    TEncSearch.cpp:1430-1448, searched to max_transform_hierarchy_depth_
    intra = 3, encoder_intra_main.cfg:26-29) — evaluated densely: for every
    CU position of size 2^cu_log2 with per-CU mode `mode_cu` [B, Rc, Cc],
    the RD of each TU size in the budget is computed for the whole frame at
    once and the tree is folded bottom-up.

    Returns (cost [B, Rc, Cc] best-tree luma RD, rd_full [B, Rc, Cc] the
    unsplit-TU RD, tusz [B, h8, w8] per-slot leaf log2 ∈ {2..5} under the
    assumption this CU size is chosen everywhere).
    """
    lam = rate.lambda_rd(qp)
    top = min(cu_log2, 5)
    bottom = max(2, cu_log2 - 3)     # MaxTrafoDepth = 3 (CU64 stops at 8)
    b = plane.shape[0]

    rd_map = {}
    for s_log2 in range(bottom, top + 1):
        rep = 1 << (cu_log2 - s_log2)
        mode_s = jnp.repeat(jnp.repeat(mode_cu, rep, axis=-2), rep, axis=-1)
        rd_map[s_log2] = _dense_rd_candidates(
            plane, geom, 1 << s_log2, mode_s[..., None], qp, lam,
            bsrc=bsrc, rate_model=rate_model,
            cbf_ctx=1 if s_log2 == top else 0)[..., 0]

    def pool4(x):
        b_, r_, c_ = x.shape
        return x.reshape(b_, r_ // 2, 2, c_ // 2, 2).sum(axis=(2, 4))

    t = rd_map[bottom]
    split = {}
    for s_log2 in range(bottom + 1, top + 1):
        if rate_model == "ctx":
            # split_transform_flag at ctx 5-log2 (init state) + ~1 bin of
            # duplicated chroma cbf signaling at the split node.
            from hevctpu.ops import rate_ctx
            st0, st1 = rate_ctx.split_tu_bits(qp, s_log2)
            oh = lam * (st1 - st0 + 1.0)
        else:
            # split_transform_flag bin + duplicated chroma cbf (~1 ctx
            # bin each) — the legacy fitted constant.
            oh = lam * 1.8
        tsplit = pool4(t) + oh
        split[s_log2] = tsplit < rd_map[s_log2]
        t = jnp.minimum(rd_map[s_log2], tsplit)

    if top < cu_log2:                 # CU64: four 32 trees, split inferred
        cost = pool4(t)
        rd_full = pool4(rd_map[5])
    else:
        cost = t
        rd_full = rd_map[top]

    # leaf-size map at 8x8-slot granularity, top-down.
    h8, w8 = geom.hp // 8, geom.wp // 8
    tusz = jnp.full((b, h8, w8), top, jnp.int32)

    def up_slot(x, s_log2):
        rep = max((1 << s_log2) // 8, 1)
        return jnp.repeat(jnp.repeat(x, rep, axis=-2), rep, axis=-1)

    ex = None
    for s_log2 in range(top, bottom, -1):
        sp = split[s_log2]
        if ex is not None:
            sp = sp & ex
        tusz = jnp.where(up_slot(sp, s_log2), s_log2 - 1, tusz)
        ex = jnp.repeat(jnp.repeat(sp, 2, axis=-2), 2, axis=-1)
    return cost, rd_full, tusz


# ---------------------------------------------------------------------------
# Wire packing (host link is the bottleneck: ~5-10 MB/s via the TPU
# tunnel, see PROFILE.md). The lite encode path shrinks the device->host
# dict: recon planes are replaced by a device-computed positional checksum
# (the reference's checksum picture-hash, TComPicYuvMD5.cpp:141-166 — the
# one hash type that is a parallel reduction), levels ship as int8 with a
# sparse escape sidecar, and boolean planes ship bitpacked.
# ---------------------------------------------------------------------------

_ESC_MAX = 4096  # escape slots per plane per frame (|level| > 127)


def _checksum_plane_device(plane):
    """[B, H, W] int32 pels -> [B] uint32, TComPicYuvMD5::compChecksum."""
    h, w = plane.shape[-2:]
    x = jnp.arange(w, dtype=jnp.uint32)
    y = jnp.arange(h, dtype=jnp.uint32)
    xm = (x & 0xff) ^ (x >> 8)
    ym = (y & 0xff) ^ (y >> 8)
    mask = (ym[:, None] ^ xm[None, :]) & 0xff
    vals = (plane.astype(jnp.uint32) & 0xff) ^ mask
    return jnp.sum(vals, axis=(-2, -1), dtype=jnp.uint32)


def _pack_bits_device(x):
    """Boolean [B, ...] -> uint8 [B, ceil(N/8)] (row-major bit order,
    np.unpackbits-compatible)."""
    b = x.shape[0]
    flat = x.reshape(b, -1).astype(jnp.uint8)
    n = flat.shape[1]
    pad = (-n) % 8
    flat = jnp.pad(flat, ((0, 0), (0, pad)))
    w = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.uint8)
    return (flat.reshape(b, -1, 8) * w).sum(axis=-1, dtype=jnp.uint32) \
        .astype(jnp.uint8)


def _unpack_bits_host(packed, shape):
    import numpy as _np
    b = packed.shape[0]
    n = int(_np.prod(shape))
    bits = _np.unpackbits(_np.asarray(packed, _np.uint8), axis=1)[:, :n]
    return bits.reshape((b,) + tuple(shape)).astype(bool)


def _pack_levels_device(lvl):
    """int32 levels [B, H, W] -> (int8 plane, esc_pos [B, E] int32,
    esc_val [B, E] int32, esc_n [B] int32). Escapes are |v| > 127."""
    b = lvl.shape[0]
    flat = lvl.reshape(b, -1)
    esc = jnp.abs(flat) > 127
    esc_n = esc.sum(axis=-1).astype(jnp.int32)
    pos = jax.vmap(
        lambda m: jnp.nonzero(m, size=_ESC_MAX, fill_value=-1)[0])(esc)
    val = jnp.take_along_axis(flat, jnp.maximum(pos, 0), axis=-1)
    val = jnp.where(pos >= 0, val, 0)
    lv8 = jnp.clip(lvl, -127, 127).astype(jnp.int8)
    return lv8, pos.astype(jnp.int32), val.astype(jnp.int32), esc_n


def _unpack_levels_host(lv8, pos, val, esc_n, dtype):
    import numpy as _np
    n_max = int(_np.max(esc_n)) if esc_n.size else 0
    if n_max > _ESC_MAX:
        raise ValueError(
            f"level escape sidecar overflow ({n_max} > {_ESC_MAX}): "
            "re-encode without lite transfer (lite=False)")
    out = _np.asarray(lv8).astype(dtype)
    if n_max:
        b = out.shape[0]
        flat = out.reshape(b, -1)
        for i in range(b):
            p = pos[i][pos[i] >= 0]
            flat[i, p] = val[i][: len(p)]
    return out


# lite-dict wire keys: {std key: (pack kind)}; bools are bitpacked with
# their logical shapes carried host-side from the geometry.
_LITE_BOOL_KEYS = ("cbf_y", "cbf_u", "cbf_v", "cbf4_y", "ts4_y",
                   "ts8_u", "ts8_v")


# ---------------------------------------------------------------------------
# Stage 2: wavefront reconstruction
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _zorder_avail_np(oy: int, ox: int, n: int, span: int) -> np.ndarray:
    """Static decoded-before mask [4n+1] for a TU at CTU-local origin
    (oy, ox): z-order within the CTU, wavefront order (left/above/above-*)
    across CTUs. The traced in-picture check is applied separately."""
    dy, dx = ctu.boundary_offsets(n)
    ly, lx = oy + dy, ox + dx
    same = (ly >= 0) & (lx >= 0) & (ly < span) & (lx < span)
    zmap = ctu.morton(span // 4)
    zb = zmap[np.clip(ly, 0, span - 1) // 4, np.clip(lx, 0, span - 1) // 4]
    z_tu = zmap[oy // 4, ox // 4]
    above = ly < 0
    left_of = (lx < 0) & (ly >= 0) & (ly < span)
    return np.where(same, zb < z_tu, above | left_of)


def _tu_step_dyn(ext, levels, orig, mode, fire, oy, ox, n: int, qp, av_z, *,
                 is_luma, ctu_yx, frame_hw, span: int, rdoq_lam=0.0,
                 sbh: bool = False, dst: bool = False, ts_lam=0.0,
                 rate_qp: int | None = None):
    """One masked TU at traced origin (oy, ox): predict -> transform ->
    quant -> dequant -> reconstruct, as dynamic slices + MXU matmuls.

    ext [BA, span+1+span//2, 2span+2] is the extended CTU-local recon:
    row 0 = above-neighbor strip (corner + above + above-right), column 0 =
    left-neighbor strip, (1+y, 1+x) = local pixel (y, x); the extra bottom
    rows and right cols are never-available filler that keeps the below-CTU
    boundary reads unclamped. av_z [4n+1] is the static decoded-before mask
    for this origin (z-order in-CTU, wavefront across CTUs); the traced
    in-picture check joins it here. Returns (ext, levels, cbf & fire).
    """
    ba = ext.shape[0]
    # Boundary in scan order: left col bottom-to-top, corner, top row.
    leftcol = jax.lax.dynamic_slice(ext, (0, oy + 1, ox),
                                    (ba, 2 * n, 1))[:, :, 0]
    toprow = jax.lax.dynamic_slice(ext, (0, oy, ox),
                                   (ba, 1, 2 * n + 1))[:, 0]
    vals = jnp.concatenate([leftcol[:, ::-1], toprow], axis=1)

    dy, dx = ctu.boundary_offsets(n)
    fy = ctu_yx[0][:, None] + oy + jnp.asarray(dy)[None, :]
    fx = ctu_yx[1][:, None] + ox + jnp.asarray(dx)[None, :]
    inside = (fy >= 0) & (fx >= 0) & (fy < frame_hw[0]) & (fx < frame_hw[1])
    av = inside & av_z

    filled = intra.fill_reference(vals, av)
    top_e, left_e = intra.split_boundary(filled, n)
    top_f, left_f = intra.smooth_reference(top_e, left_e, n)
    pred = intra_mm.predict_selected_mode_mm(top_e, left_e, top_f, left_f,
                                             mode, n, is_luma=is_luma)
    orig_blk = jax.lax.dynamic_slice(orig, (0, oy, ox), (ba, n, n))
    res = orig_blk - pred
    log2 = int(np.log2(n))
    coef = transforms.forward_transform(res, log2, dst=dst)
    scan_tu = quant.scan_sel(mode, log2, is_luma)
    # per-CTU QP (cu_qp_delta): qp/rdoq_lam/ts_lam may be [BA] arrays;
    # rate tables stay at the static slice QP (contexts init at SliceQpY).
    vec_qp = not isinstance(qp, (int, np.integer))
    rq = rate_qp if vec_qp else (qp if rate_qp is None else rate_qp)
    # a scalar 0.0 λ disables the trial (callers pass arrays only when on)
    rdoq_on = not (isinstance(rdoq_lam, (int, float)) and rdoq_lam == 0.0)
    ts_on = not (isinstance(ts_lam, (int, float)) and ts_lam == 0.0)
    if rdoq_on:
        lvl = quant.quantize_rdoq(coef, log2, qp, rdoq_lam, scan=scan_tu,
                                  rate_qp=rq)
    else:
        lvl = quant.quantize(coef, log2, qp)
    use_ts = jnp.zeros((ba,), bool)
    if ts_on and n == 4:
        # transform-skip trial (TComTrQuant xTransformSkip + the RD trial
        # loop TEncSearch.cpp:1519-1549): the scaled residual quantizes in
        # the same dynamic range as the transform, so the two candidates
        # compare directly in the coefficient domain.
        from hevctpu.ops import rate as _rate
        shift = rom.MAX_TR_DYNAMIC_RANGE - 8 - log2
        coef_s = res * (1 << shift)
        if rdoq_on:
            lvl_s = quant.quantize_rdoq(coef_s, log2, qp, rdoq_lam,
                                        scan=scan_tu, rate_qp=rq)
        else:
            lvl_s = quant.quantize(coef_s, log2, qp)
        dscale = 4.0 ** (log2 - 7)
        lam_u = ts_lam / _rate.BITS_ONE
        if not isinstance(lam_u, float):
            lam_u = jnp.asarray(lam_u)

        def j_cost(lv, cf):
            err = (cf - quant.dequantize(lv, log2, qp)).astype(jnp.float32)
            d = jnp.sum(err * err, axis=(-2, -1)) * dscale
            return d + lam_u * _rate.estimate_tu_bits(lv, log2, rq).astype(
                jnp.float32)

        use_ts = j_cost(lvl_s, coef_s) < j_cost(lvl, coef)
        lvl = jnp.where(use_ts[:, None, None], lvl_s, lvl)
        coef = jnp.where(use_ts[:, None, None], coef_s, coef)
    if sbh:
        lvl = quant.sign_bit_hide(lvl, coef, log2, qp, scan_tu)
    cbf = jnp.any(lvl != 0, axis=(-2, -1))
    deq = quant.dequantize(lvl, log2, qp)
    rinv_t = transforms.inverse_transform(deq, log2, dst=dst)
    if ts_on and n == 4:
        shift = rom.MAX_TR_DYNAMIC_RANGE - 8 - log2
        rinv_s = (deq + (1 << (shift - 1))) >> shift
        rinv = jnp.where(use_ts[:, None, None], rinv_s, rinv_t)
    else:
        rinv = rinv_t
    recon = jnp.clip(pred + rinv, 0, 255)

    fb = fire[:, None, None]
    cur = jax.lax.dynamic_slice(ext, (0, oy + 1, ox + 1), (ba, n, n))
    ext = jax.lax.dynamic_update_slice(
        ext, jnp.where(fb, recon, cur), (0, oy + 1, ox + 1))
    cur_l = jax.lax.dynamic_slice(levels, (0, oy, ox), (ba, n, n))
    levels = jax.lax.dynamic_update_slice(
        levels, jnp.where(fb, lvl, cur_l), (0, oy, ox))
    return ext, levels, cbf & fire, use_ts & cbf & fire


@functools.lru_cache(maxsize=None)
def _block16_schedule():
    """Static per-iteration tables for the z-order scan over the 16 16-pel
    blocks of a CTU: origins, quadrant-leader flags, and decoded-before
    availability vectors for the TU32/TU16/TU8 substeps (luma + chroma)."""
    ty = np.zeros(16, np.int32)
    tx = np.zeros(16, np.int32)
    is_q = np.zeros(16, bool)
    av32 = np.zeros((16, 129), bool)
    av32c = np.zeros((16, 65), bool)
    av16 = np.zeros((16, 65), bool)
    av16c = np.zeros((16, 33), bool)
    av8 = np.zeros((16, 4, 33), bool)
    av8c = np.zeros((16, 4, 17), bool)
    av4 = np.zeros((16, 4, 4, 17), bool)
    for t in range(16):
        qy, qx = ((t // 4) // 2) * 32, ((t // 4) % 2) * 32
        y, x = qy + ((t % 4) // 2) * 16, qx + ((t % 4) % 2) * 16
        ty[t], tx[t], is_q[t] = y, x, (t % 4) == 0
        av32[t] = _zorder_avail_np(qy, qx, 32, 64)
        av32c[t] = _zorder_avail_np(qy // 2, qx // 2, 16, 32)
        av16[t] = _zorder_avail_np(y, x, 16, 64)
        av16c[t] = _zorder_avail_np(y // 2, x // 2, 8, 32)
        for e in range(4):
            ey, ex = y + (e // 2) * 8, x + (e % 2) * 8
            av8[t, e] = _zorder_avail_np(ey, ex, 8, 64)
            av8c[t, e] = _zorder_avail_np(ey // 2, ex // 2, 4, 32)
            for q in range(4):  # NxN: the four 4x4 luma TUs, z-order
                av4[t, e, q] = _zorder_avail_np(ey + (q // 2) * 4,
                                                ex + (q % 2) * 4, 4, 64)
    return ty, tx, is_q, av32, av32c, av16, av16c, av8, av8c, av4


class FrameEncoder:
    """Encodes batches of frames of one fixed geometry at one QP.

    search selects the partition source:
      * "cnn"  — the CU quadtree is the CNN's pruned prediction, exactly the
        reference pipeline's gate semantics (TEncCu.cpp:509-520); this is
        the fast path the labels argument feeds.
      * "rd"   — full RD quadtree search: per-depth dense RD costs compared
        bottom-up like HM's merged-children-vs-parent decision
        (TEncCu.cpp:858-867,1084); labels are ignored (the unpruned-anchor
        capability, TAppEncoder_original).
    """

    def __init__(self, h: int, w: int, qp: int, *, deblock: bool = True,
                 search: str = "cnn", rdoq: bool = True, sao: bool = True,
                 sbh: bool = True, nxn: bool = True, tu_split: bool = True,
                 ts: bool = True, two_pass: bool = False,
                 rate_model: str = "global"):
        assert h % 8 == 0 and w % 8 == 0, "HEVC requires dims % minCU == 0"
        assert search in ("cnn", "rd")
        assert rate_model in ("ctx", "global")
        self.rate_model = rate_model
        # Set by ShardedEncoder: (mesh, frame_axis, tile_axis). When set,
        # the reconstruct stage runs under shard_map with explicit
        # per-tile wavefront tables + ppermute halo exchange.
        self.shard_cfg = None
        self.two_pass = two_pass
        self.geom = Geometry(h, w)
        self.qp = qp
        self.qp_c = rom.chroma_qp_from_luma(qp)
        self.deblock = deblock
        self.sao = sao
        self.sbh = sbh
        self.nxn = nxn
        self.tu_split = tu_split
        self.ts = ts
        self.ts_lam = rate.lambda_rd(qp) if ts else 0.0
        self.ts_lam_c = (self.ts_lam
                         / rate.chroma_dist_weight(qp, self.qp_c))
        self.search = search
        self.rdoq_lam = rate.lambda_rd(qp) if rdoq else 0.0
        # chroma RDOQ: distortion is weighted by w_c in the RD cost, so the
        # effective per-component λ is λ / w_c (HM's chroma lambda).
        self.rdoq_lam_c = (self.rdoq_lam
                           / rate.chroma_dist_weight(qp, self.qp_c))
        self._encode = jax.jit(self._encode_impl)
        self._encode_qp = None  # lazily-jitted per-CTU-QP variant

    # -- public API --------------------------------------------------------

    def encode(self, y, u, v, labels=None, qp_map=None):
        """y [B,H,W], u/v [B,H/2,W/2] uint8/int32; labels [B, rc*cc, 16]
        (required for search="cnn"). qp_map [B, rc, cc] optional per-CTU
        absolute QPs (cu_qp_delta / LCU-level rate control,
        TEncRateCtrl.cpp:845): quantization, λ and deblocking follow the
        map; the returned dict carries the inheritance-consistent
        effective map as "qp_ctu" for the entropy coder. Returns a dict
        of numpy arrays."""
        if labels is None:
            assert self.search == "rd", "cnn search needs labels"
            labels = np.zeros((np.shape(y)[0], self.geom.rc * self.geom.cc,
                               16), np.int8)
        # ship 8-bit across the (slow) host->device link; the jitted
        # program upcasts on device.
        args = [jnp.asarray(np.asarray(y, np.uint8)),
                jnp.asarray(np.asarray(u, np.uint8)),
                jnp.asarray(np.asarray(v, np.uint8)),
                jnp.asarray(np.asarray(labels, np.int8))]
        if qp_map is None:
            out = self._encode(*args)
        else:
            if self._encode_qp is None:
                self._encode_qp = jax.jit(functools.partial(
                    lambda s, yy, uu, vv, ll, qq: s._encode_impl(
                        yy, uu, vv, ll, qp_map=qq), self))
            out = self._encode_qp(
                *args, jnp.asarray(np.asarray(qp_map, np.uint8)))
        out = {k: np.asarray(val) for k, val in out.items()}
        # record coder-affecting settings so encode_stream can refuse a
        # mismatched StreamConfig (hidden signs decode silently wrong).
        out["sbh"] = np.bool_(self.sbh)
        return out

    def encode_fused(self, cnn_params: dict, y, u, v, *, lite: bool = False):
        """CNN depth prediction + encode as ONE jitted device program (the
        reference's txt-file handshake, TEncCu.cpp:243-255, as a value
        dependency): the clip crosses the host->device link once.

        lite=True ships the wire-packed output dict (no recon planes —
        the hash SEI comes from the device checksum; int8 levels;
        bitpacked flags): ~3x fewer device->host bytes, for encode-only
        pipelines where the host link is the bottleneck."""
        return self.collect(self.encode_fused_dispatch(
            cnn_params, y, u, v, lite=lite), lite=lite)

    def encode_fused_dispatch(self, cnn_params: dict, y, u, v, *,
                              lite: bool = False):
        """Async half of encode_fused: enqueue the device program and
        return the on-device output dict WITHOUT blocking, so the caller
        can overlap the (slow) device->host transfer of one batch with
        the compute of the next. Pass the result to collect()."""
        return self._encode_cnn(lite)(
            cnn_params,
            jnp.asarray(np.asarray(y, np.uint8)),
            jnp.asarray(np.asarray(u, np.uint8)),
            jnp.asarray(np.asarray(v, np.uint8)))

    def collect(self, dev_out: dict, *, lite: bool = False) -> dict:
        """Fetch a dispatched output dict to host numpy (unpacking the
        lite wire format back to the standard layout)."""
        out = {k: np.asarray(val) for k, val in dev_out.items()}
        if lite:
            out = self._unpack_lite(out)
        out["sbh"] = np.bool_(self.sbh)
        return out

    @functools.lru_cache(maxsize=None)
    def _encode_cnn(self, lite: bool = False):
        from hevctpu.models import convnet2

        def impl(params, y, u, v):
            g = self.geom
            labels = jax.vmap(
                lambda yy, uu, vv: convnet2.predict_frame_labels(
                    params, yy.astype(jnp.int32), uu.astype(jnp.int32),
                    vv.astype(jnp.int32), g.h, g.w))(y, u, v)
            out = self._encode_impl(y, u, v, labels.astype(jnp.int32))
            out["labels"] = labels.astype(jnp.int8)
            if lite:
                out = self._pack_lite(out)
            return out

        return jax.jit(impl)

    def _pack_lite(self, out: dict) -> dict:
        """Device-side wire packing (see the module-level note)."""
        packed = dict(out)
        for k in ("recon_y", "recon_u", "recon_v"):
            del packed[k]
        for comp in ("y", "u", "v"):
            lv8, pos, val, n = _pack_levels_device(
                out[f"levels_{comp}"].astype(jnp.int32))
            packed[f"levels_{comp}"] = lv8
            packed[f"esc_pos_{comp}"] = pos
            packed[f"esc_val_{comp}"] = val
            packed[f"esc_n_{comp}"] = n
        for k in _LITE_BOOL_KEYS:
            if k in packed:
                packed[k] = _pack_bits_device(out[k])
        return packed

    def _unpack_lite(self, out: dict) -> dict:
        g = self.geom
        shapes = {"cbf_y": (g.hp // 8, g.wp // 8),
                  "cbf_u": (g.hp // 8, g.wp // 8),
                  "cbf_v": (g.hp // 8, g.wp // 8),
                  "cbf4_y": (g.hp // 4, g.wp // 4),
                  "ts4_y": (g.hp // 4, g.wp // 4),
                  "ts8_u": (g.hp // 8, g.wp // 8),
                  "ts8_v": (g.hp // 8, g.wp // 8)}
        res = dict(out)
        for comp, (hh, ww) in (("y", (g.hp, g.wp)),
                               ("u", (g.hp // 2, g.wp // 2)),
                               ("v", (g.hp // 2, g.wp // 2))):
            lv8 = out[f"levels_{comp}"]
            res[f"levels_{comp}"] = _unpack_levels_host(
                lv8, out.pop(f"esc_pos_{comp}"),
                out.pop(f"esc_val_{comp}"),
                out.pop(f"esc_n_{comp}"), np.int16)
            for kk in (f"esc_pos_{comp}", f"esc_val_{comp}",
                       f"esc_n_{comp}"):
                res.pop(kk, None)
        for k in _LITE_BOOL_KEYS:
            if k in res:
                res[k] = _unpack_bits_host(out[k], shapes[k])
        return res

    # -- implementation ----------------------------------------------------

    def _encode_impl(self, y, u, v, labels, qp_map=None):
        g = self.geom
        y, u, v = (a.astype(jnp.int32) for a in (y, u, v))
        labels = labels.astype(jnp.int32)
        yp = pad_plane(y, g.hp, g.wp)
        up = pad_plane(u, g.hp // 2, g.wp // 2)
        vp = pad_plane(v, g.hp // 2, g.wp // 2)
        if qp_map is not None:
            assert self.shard_cfg is None, \
                "per-CTU QP maps are not supported under tile sharding yet"
            qp_map = qp_map.astype(jnp.int32)

        rec_fn = functools.partial(self._reconstruct, qp_map=qp_map)
        if self.shard_cfg is not None:
            from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as _P

            mesh, f_ax, t_ax = self.shard_cfg
            tiles = mesh.shape[t_ax]
            ps = _P(f_ax, None, t_ax)
            pb = _P(f_ax, None, t_ax, None, None)
            out_keys = ["recon_y", "recon_u", "recon_v", "levels_y",
                        "levels_u", "levels_v", "cbf_y", "cbf_u", "cbf_v",
                        "cbf4_y", "ts4_y", "ts8_u", "ts8_v"]
            rec_fn = shard_map(
                lambda a1, a2, a3, a4, a5, a6, a7, a8: self._reconstruct(
                    a1, a2, a3, a4, a5, a6, a7, a8,
                    shard=(t_ax, tiles)),
                mesh=mesh,
                in_specs=(ps, ps, ps, pb, pb, pb, pb, pb),
                out_specs={k: ps for k in out_keys},
                check_rep=False)

        dec = self._decide(yp, up, vp, labels)
        if self.two_pass:
            # Recon-feedback refinement (HM decides against reconstructed
            # neighbors mid-search, TEncSearch.cpp:1129-1170;
            # TEncCu.cpp:1091-1093): re-run the dense decision pass with
            # neighbor boundaries read from the pass-1 pre-filter recon —
            # the references the decoder will approximately see — then
            # reconstruct with the refined decisions.
            out1 = rec_fn(
                yp, up, vp, dec["mode_slot"], dec["cmode_slot"],
                to_blocked(dec["tusz_frame"], 8), dec["coded8"],
                to_blocked(dec["mode4_frame"], 16))
            ry = pad_plane(out1["recon_y"].astype(jnp.int32), g.hp, g.wp)
            ru = pad_plane(out1["recon_u"].astype(jnp.int32),
                           g.hp // 2, g.wp // 2)
            rv = pad_plane(out1["recon_v"].astype(jnp.int32),
                           g.hp // 2, g.wp // 2)
            dec = self._decide(yp, up, vp, labels, bsrc=(ry, ru, rv))

        # Stage 2: wavefront reconstruction.
        out = rec_fn(yp, up, vp, dec["mode_slot"],
                     dec["cmode_slot"],
                     to_blocked(dec["tusz_frame"], 8),
                     dec["coded8"],
                     to_blocked(dec["mode4_frame"], 16))
        if qp_map is not None:
            # Effective wire QP map: a CTU with no coded cbf signals no
            # delta, so its QP IS the predicted (previous effective) QP —
            # a "last CTU with residual wins" scan in raster order
            # (8.6.1 qPY_PREV semantics for QG == CTB). Deblocking and
            # the entropy coder must see this map, not the desired one.
            def pool_ctu(x, s):
                return x.reshape(x.shape[0], g.rc, s, g.cc, s).any(
                    axis=(2, 4))

            any_c = (pool_ctu(out["cbf_y"], 8) | pool_ctu(out["cbf_u"], 8)
                     | pool_ctu(out["cbf_v"], 8))
            if "cbf4_y" in out:
                any_c = any_c | pool_ctu(out["cbf4_y"], 16)
            des = qp_map.reshape(qp_map.shape[0], -1)
            anyf = any_c.reshape(any_c.shape[0], -1)

            def comb(a, c):
                return (jnp.where(c[1], c[0], a[0]), a[1] | c[1])

            vals, valid = jax.lax.associative_scan(comb, (des, anyf),
                                                   axis=1)
            out["qp_ctu"] = jnp.where(valid, vals, self.qp).reshape(
                qp_map.shape)
        out["depth8"] = from_blocked(dec["depth8"])
        out["coded8"] = from_blocked(dec["coded8"])
        out["mode8"] = dec["mode8_frame"]
        out["csel8"] = dec["csel8_frame"]
        out["nxn8"] = dec["nxn8_frame"]
        out["mode4"] = dec["mode4_frame"]
        tusz_frame = dec["tusz_frame"]
        if self.tu_split:
            out["tusz8"] = tusz_frame
        if not self.ts:
            for k in ("ts4_y", "ts8_u", "ts8_v"):
                del out[k]
        return self._loop_filters_and_cast(yp, up, vp, out, tusz_frame)

    def _qp_slot_map(self, qp_ctu):
        """[B, rc, cc] effective CTU QPs -> per-8x8-slot map for the
        deblocker."""
        return jnp.repeat(jnp.repeat(qp_ctu, 8, axis=1), 8, axis=2)

    def _decide(self, yp, up, vp, labels, bsrc=None):
        """Stage 1: all mode/partition/TU decisions for the batch.

        bsrc = optional (y, u, v) planes neighbor boundaries are read from
        (pass-2 recon feedback); None reads them from the original planes.
        """
        g = self.geom
        b = yp.shape[0]
        by, bu, bv = bsrc if bsrc is not None else (None, None, None)

        # Dense RD mode decision per depth (luma, then chroma).
        modes, costs = _dense_mode_decision(yp, g, self.qp, bsrc=by,
                                            rate_model=self.rate_model)

        # Intra TU quadtree search per CU size (TEncSearch.cpp:1430-1448):
        # replace each CU's full-TU cost with its best-tree cost and keep
        # the per-slot leaf-size maps for stage 2 / the entropy coder.
        tz = {}
        if self.tu_split:
            for n, cu_log2 in ((64, 6), (32, 5), (16, 4), (8, 3)):
                t_cost, rd_full, tz[n] = _tu_tree_decision(
                    yp, g, self.qp, cu_log2, modes[n], bsrc=by,
                    rate_model=self.rate_model)
                costs[n] = costs[n] + (t_cost - rd_full)

        # PART_NxN vs PART_2Nx2N at depth 3 (the reference checks both at
        # max depth, TEncCu.cpp:815-827): four 4x4 DST TUs with their own
        # modes vs one 8x8 TU. Mode-signaling bits are inside both cost
        # maps; the part_mode bin is coded either way.
        def pool2x2(x):
            b_, r_, c_ = x.shape
            return x.reshape(b_, r_ // 2, 2, c_ // 2, 2).sum(axis=(2, 4))

        if self.nxn:
            c_nxn = pool2x2(costs[4])                  # [B, hp/8, wp/8]
            if self.rate_model == "ctx":
                # part_mode bin at max-depth CUs (TEncSbac codePartSize:
                # bin 1 = 2Nx2N, 0 = NxN), init-state priced.
                from hevctpu.ops import rate_ctx
                pm_nxn, pm_2n = rate_ctx.part_mode_bits(self.qp)
                lam_pm = rate.lambda_rd(self.qp)
                c_nxn = c_nxn + lam_pm * pm_nxn
                costs[8] = costs[8] + lam_pm * pm_2n
            nxn_map = c_nxn < costs[8]
            costs[8] = jnp.minimum(costs[8], c_nxn)
        else:
            nxn_map = jnp.zeros_like(costs[8], bool)

        csel, cmodes, ccosts = _dense_chroma_decision(
            up, vp, g, self.qp, self.qp_c, modes, bsrc_u=bu, bsrc_v=bv,
            rate_model=self.rate_model)

        # Partition: CNN labels (pruned-search gate semantics) or the RD
        # quadtree decision; plus implicit boundary splits either way.
        if self.search == "rd":
            # ccosts has no NxN key; costs[8] already folded the NxN
            # alternative in above, and its chroma cost is ccosts[8]
            # either way (one 4x4 chroma TU per 8x8 luma CU).
            total = {n: costs[n] + ccosts[n] for n in ccosts}
            labels = _rd_split_labels(total, self.qp, self.rate_model)
        bh, bw = g.bh_bw
        labels_rc = labels.reshape(b, g.rc, g.cc, 16)
        depth8, coded8 = ctu.derive_slot_depths(
            labels_rc, jnp.asarray(bh)[None, :, None],
            jnp.asarray(bw)[None, None, :])          # [B, rc, cc, 8, 8]

        # Per-slot mode map (the CU's luma mode at every 8x8 slot), for the
        # entropy stage's quadtree walk and MPM derivation.
        def up2(x, k):  # [B, rc, cc, m, m] -> [B, rc, cc, 8, 8]
            return jnp.repeat(jnp.repeat(x, k, axis=-2), k, axis=-1)

        def slot_map(per_size):
            return jnp.where(
                depth8 == 0, per_size[64][..., None, None],
                jnp.where(depth8 == 1, up2(to_blocked(per_size[32], 2), 4),
                          jnp.where(depth8 == 2,
                                    up2(to_blocked(per_size[16], 4), 2),
                                    to_blocked(per_size[8], 8))))

        mode_slot = slot_map(modes)
        cmode_slot = slot_map(cmodes)
        csel_slot = slot_map(csel)

        # NxN slots + per-4x4 luma mode map. The 4x4 map carries the CU mode
        # everywhere except NxN CUs, where each PU has its own mode — it is
        # the granularity MPM derivation works at (H.265 8.4.2).
        nxn_slot = (to_blocked(nxn_map, 8) & (depth8 == 3)
                    & coded8)                          # [B, rc, cc, 8, 8]
        nxn8_frame = from_blocked(nxn_slot)            # [B, hp/8, wp/8]
        mode8_frame = from_blocked(mode_slot)

        def up2f(x):  # frame-layout upsample x2
            return jnp.repeat(jnp.repeat(x, 2, axis=-2), 2, axis=-1)

        mode4_frame = jnp.where(up2f(nxn8_frame), modes[4], up2f(mode8_frame))

        # chroma DM for NxN CUs resolves against PU0's luma mode
        # (H.265 8.4.3: the corresponding luma PU is the top-left one).
        csel8_frame = from_blocked(csel_slot)
        cmode8_frame = from_blocked(cmode_slot)
        pu0 = modes[4][:, ::2, ::2]                    # [B, hp/8, wp/8]
        cand = jnp.asarray(_CHROMA_LIST)[jnp.clip(csel8_frame, 0, 3)]
        cand = jnp.where(cand == pu0, 34, cand)
        resolved = jnp.where(csel8_frame == 4, pu0, cand)
        cmode8_frame = jnp.where(nxn8_frame, resolved, cmode8_frame)
        cmode_slot = to_blocked(cmode8_frame, 8)

        # Per-slot leaf TU size (log2; 2 = the 8x8 slot codes as four 4x4
        # TUs — NxN PUs or a TU split): select the chosen CU size's tree.
        d8f = from_blocked(depth8)
        if self.tu_split:
            tusz_frame = jnp.where(
                d8f == 0, tz[64],
                jnp.where(d8f == 1, tz[32],
                          jnp.where(d8f == 2, tz[16], tz[8])))
        else:
            tusz_frame = jnp.minimum(6 - d8f, 5)
        tusz_frame = jnp.where(nxn8_frame, 2, tusz_frame).astype(jnp.int32)

        return dict(mode_slot=mode_slot, cmode_slot=cmode_slot,
                    tusz_frame=tusz_frame, coded8=coded8, depth8=depth8,
                    mode4_frame=mode4_frame, mode8_frame=mode8_frame,
                    csel8_frame=csel8_frame, nxn8_frame=nxn8_frame)

    def _loop_filters_and_cast(self, yp, up, vp, out, tusz_frame):
        g = self.geom
        # In-loop filters (frame post-pass; intra prediction reads the
        # pre-filter recon, exactly as HM applies them per picture after
        # compressSlice: deblock TEncGOP.cpp:1742, then SAO :1797 using
        # the deblocked recon vs the original).
        fy = pad_plane(out["recon_y"], g.hp, g.wp)
        fu = pad_plane(out["recon_u"], g.hp // 2, g.wp // 2)
        fv = pad_plane(out["recon_v"], g.hp // 2, g.wp // 2)
        if self.deblock:
            db_qp = (self._qp_slot_map(out["qp_ctu"]) if "qp_ctu" in out
                     else self.qp)
            fy, fu, fv = deblock.deblock_frame(
                fy, fu, fv, tusz_frame, db_qp, g.h, g.w)
        if self.sao:
            ys = sao.ctu_stats(yp, fy, g.h, g.w, 64)
            us = sao.ctu_stats(up, fu, g.h // 2, g.w // 2, 32)
            vs = sao.ctu_stats(vp, fv, g.h // 2, g.w // 2, 32)
            st, se, sbp, soff, smrg = sao.decide_params(ys, us, vs, self.qp,
                                                        self.qp_c)
            fy = sao.apply_sao(fy, st, se, sbp, soff, 0, g.h, g.w, 64)
            fu = sao.apply_sao(fu, st, se, sbp, soff, 1, g.h // 2,
                               g.w // 2, 32)
            fv = sao.apply_sao(fv, st, se, sbp, soff, 2, g.h // 2,
                               g.w // 2, 32)
            out["sao_type"], out["sao_eo"] = st, se
            out["sao_bp"], out["sao_off"] = sbp, soff
            out["sao_merge"] = smrg
        # crop to the conformance window (the reconstruct stage returns
        # full padded geometry so its sharded variant concatenates evenly)
        out["recon_y"] = fy[:, : g.h, : g.w]
        out["recon_u"] = fu[:, : g.h // 2, : g.w // 2]
        out["recon_v"] = fv[:, : g.h // 2, : g.w // 2]
        # Device-side picture digests + distortion: the checksum hash type
        # of the decoded-picture-hash SEI (TComPicYuvMD5.cpp:141-166) is a
        # parallel reduction, so the conforming hash SEI can be emitted
        # without ever transferring the recon planes; the per-plane SSE
        # feeds PSNR reporting (TEncGOP xCalculateAddPSNR role) the same
        # way.
        out["hash_checksum"] = jnp.stack(
            [_checksum_plane_device(out["recon_y"]),
             _checksum_plane_device(out["recon_u"]),
             _checksum_plane_device(out["recon_v"])], axis=-1)
        out["sse"] = jnp.stack(
            [jnp.sum(jnp.square((out["recon_y"]
                                 - yp[:, : g.h, : g.w]).astype(jnp.float32)),
                     axis=(-2, -1)),
             jnp.sum(jnp.square((out["recon_u"]
                                 - up[:, : g.h // 2, : g.w // 2]
                                 ).astype(jnp.float32)), axis=(-2, -1)),
             jnp.sum(jnp.square((out["recon_v"]
                                 - vp[:, : g.h // 2, : g.w // 2]
                                 ).astype(jnp.float32)), axis=(-2, -1))],
            axis=-1)
        # Downcast outputs to their value ranges: the result dict crosses
        # the (slow) device->host link, and at int32 it is ~3x larger than
        # it needs to be. Consumers upcast at their boundaries.
        cast = {"recon_y": jnp.uint8, "recon_u": jnp.uint8,
                "recon_v": jnp.uint8, "levels_y": jnp.int16,
                "levels_u": jnp.int16, "levels_v": jnp.int16,
                "depth8": jnp.int8, "mode8": jnp.int8, "mode4": jnp.int8,
                "csel8": jnp.int8, "tusz8": jnp.int8, "sao_type": jnp.int8,
                "sao_eo": jnp.int8, "sao_bp": jnp.int8, "sao_off": jnp.int8,
                "sao_merge": jnp.int8, "qp_ctu": jnp.int8}
        return {k: (v.astype(cast[k]) if k in cast else v)
                for k, v in out.items()}

    def _reconstruct(self, yp, up, vp, mode_slot, cmode_slot, tusz_slot,
                     coded8, mode4_blk, shard: tuple | None = None,
                     qp_map=None):
        """Wavefront reconstruction. shard=(axis_name, tiles) runs the
        SPMD per-tile variant (called under shard_map over CTU-column
        tiles): each instance scans its own tile's wavefront table and
        the cross-tile recon dependencies — the left CTU's right edge
        and the above-right CTU's bottom row (TComPattern.cpp:326-457)
        — arrive via jax.lax.ppermute halo exchanges of ~KB-scale strips
        per diagonal instead of GSPMD all-gathers of the full frame."""
        g = self.geom
        b = yp.shape[0]
        if shard is not None:
            axis_name, tiles = shard
            cl = g.cc // tiles
            ti = jax.lax.axis_index(axis_name)
            tr, tc, tm = g.wavefront_tiled(tiles)
            act_r = jnp.asarray(tr)[ti]
            act_c = jnp.asarray(tc)[ti]
            act_m = jnp.asarray(tm)[ti]
            cb = ti * cl
            perm_r = [(i, i + 1) for i in range(tiles - 1)]
            perm_l = [(i, i - 1) for i in range(1, tiles)]
            a = tr.shape[2]
        else:
            cl = g.cc
            cb = 0
            act_r, act_c, act_m = g.wavefront
            a = act_r.shape[1]
        ba = b * a

        oy_b = to_blocked(yp, 64)                      # [B, rc, cc, 64, 64]
        ou_b = to_blocked(up, 32)
        ov_b = to_blocked(vp, 32)

        def make_ext(top, left, span):
            """[BA, span+1+span//2, 2span+2] extended local buffer: row 0 =
            above strip (corner+above+above-right, clamped), col 0 = left
            strip, interior zeros (filled by TU writes); the extra bottom
            rows / right cols are never-available filler that keeps all
            boundary reads unclamped."""
            nb = top.shape[0]
            row0 = jnp.concatenate([top, top[:, -1:]], axis=1)[:, None, :]
            body = jnp.concatenate(
                [left[:, :, None],
                 jnp.zeros((nb, span, 2 * span + 1), jnp.int32)], axis=2)
            filler = jnp.zeros((nb, span // 2, 2 * span + 2), jnp.int32)
            return jnp.concatenate([row0, body, filler], axis=1)

        def diagonal_body(carry, xs):
            (ry, ru, rv, lvy, lvu, lvv, cby, cbu, cbv, cb4,
             t4b, tub, tvb, halos) = carry
            dr, dc, dm = xs
            bi = jnp.broadcast_to(jnp.arange(b)[:, None], (b, a))
            ri = jnp.broadcast_to(dr[None, :], (b, a))
            ci = jnp.broadcast_to(dc[None, :], (b, a))   # GLOBAL column
            cil = ci - cb                                # local (tile) column
            mk = jnp.broadcast_to(dm[None, :], (b, a))

            def gath(blocked):
                return blocked[bi, ri, cil].reshape(ba, *blocked.shape[3:])

            # neighbor strips (clamped indices; masked by availability)
            rim = jnp.maximum(ri - 1, 0)
            cim = jnp.maximum(cil - 1, 0)
            cip = jnp.minimum(cil + 1, cl - 1)

            def strips(rp, span, hl=None, hb=None):
                corner = rp[bi, rim, cim, span - 1, span - 1][..., None]
                above = rp[bi, rim, cil, span - 1, :]
                above_r = rp[bi, rim, cip, span - 1, :]
                left = rp[bi, ri, cim, :, span - 1]
                if hl is not None:
                    # tile-boundary halos: the left neighbor CTU lives on
                    # the previous device (hl = its right-edge columns,
                    # one per CTU row), the above-right CTU of the last
                    # local column lives on the next (hb = its first
                    # column's bottom rows). Values at true picture edges
                    # are dead (availability masks them off).
                    at_l = (cil == 0)[..., None]
                    left = jnp.where(at_l, hl[bi, ri], left)
                    corner = jnp.where(at_l, hl[bi, rim][..., span - 1:],
                                       corner)
                    at_r = (cil == cl - 1)[..., None]
                    above_r = jnp.where(at_r, hb[bi, rim], above_r)
                top = jnp.concatenate([corner, above, above_r], axis=-1)
                return top.reshape(ba, 2 * span + 1), left.reshape(ba, span)

            if shard is not None:
                hly, hlu, hlv, hby, hbu, hbv = halos
                top_y, left_y = strips(ry, 64, hly, hby)
                top_u, left_u = strips(ru, 32, hlu, hbu)
                top_v, left_v = strips(rv, 32, hlv, hbv)
            else:
                top_y, left_y = strips(ry, 64)
                top_u, left_u = strips(ru, 32)
                top_v, left_v = strips(rv, 32)

            tz = gath(tusz_slot)                       # [BA, 8, 8] leaf log2
            c8 = gath(coded8)
            oyl = gath(oy_b)
            ouv = jnp.concatenate([gath(ou_b), gath(ov_b)], axis=0)  # [2BA,..]
            msl = gath(mode_slot)                      # [BA, 8, 8] CU mode
            cm8 = gath(cmode_slot)                     # [BA, 8, 8]
            mm4 = gath(mode4_blk)                      # [BA, 16, 16]

            ctu_y = (ri * 64).reshape(ba)
            ctu_x = (ci * 64).reshape(ba)
            ctu_yc2 = jnp.tile((ri * 32).reshape(ba), 2)
            ctu_xc2 = jnp.tile((ci * 32).reshape(ba), 2)

            # per-CTU QP (cu_qp_delta): gather the active CTUs' QPs and
            # scale the λs by 2^((qp-sliceQP)/3); rate tables stay at the
            # slice QP (rate_qp below).
            if qp_map is None:
                qp_l, qp_c2 = self.qp, self.qp_c
                rl_y, rl_c = self.rdoq_lam, self.rdoq_lam_c
                tl_y, tl_c = self.ts_lam, self.ts_lam_c
            else:
                qp_l = qp_map[bi, ri, ci].reshape(ba)
                sc = jnp.exp2((qp_l - self.qp).astype(jnp.float32) / 3.0)
                qp_c2 = jnp.tile(jnp.asarray(rom.CHROMA_QP_TABLE)[
                    jnp.clip(qp_l, 0, 57)], 2)
                sc2 = jnp.tile(sc, 2)
                rl_y = self.rdoq_lam * sc if self.rdoq_lam else 0.0
                rl_c = self.rdoq_lam_c * sc2 if self.rdoq_lam_c else 0.0
                tl_y = self.ts_lam * sc if self.ts_lam else 0.0
                tl_c = self.ts_lam_c * sc2 if self.ts_lam_c else 0.0

            ext_y = make_ext(top_y, left_y, 64)
            ext_c = make_ext(jnp.concatenate([top_u, top_v], axis=0),
                             jnp.concatenate([left_u, left_v], axis=0), 32)
            vy = jnp.zeros((ba, 64, 64), jnp.int32)
            vc = jnp.zeros((2 * ba, 32, 32), jnp.int32)
            cy8 = jnp.zeros((ba, 8, 8), bool)
            cc8 = jnp.zeros((2 * ba, 8, 8), bool)
            cy4 = jnp.zeros((ba, 16, 16), bool)
            ty4 = jnp.zeros((ba, 16, 16), bool)
            tc8 = jnp.zeros((2 * ba, 8, 8), bool)
            mk_flat = mk.reshape(ba)

            # Z-order scan over the 16 16-pel blocks; each iteration runs a
            # masked TU32 step (quadrant leaders only), the TU16 step, and
            # the four TU8 steps — the exact tu_schedule() order.
            sched = _block16_schedule()

            def pick(arr2d, sy, sx):
                return jax.lax.dynamic_slice(
                    arr2d, (0, sy, sx), (arr2d.shape[0], 1, 1))[:, 0, 0]

            def do_tu(st, mode, cmode, fire_l, fire_c, oy, ox, size, av_z,
                      av_zc, sy, sx):
                ext_y, ext_c, vy, vc, cy8, cc8, cy4, ty4, tc8 = st
                fire_l = fire_l & mk_flat
                fire2 = jnp.tile(fire_c & mk_flat, 2)
                ext_y, vy, cbf_l, _ = _tu_step_dyn(
                    ext_y, vy, oyl, mode, fire_l, oy, ox, size, qp_l, av_z,
                    is_luma=True, ctu_yx=(ctu_y, ctu_x), frame_hw=(g.h, g.w),
                    span=64, rdoq_lam=rl_y, sbh=self.sbh, rate_qp=self.qp)
                ext_c, vc, cbf_c, ts_c = _tu_step_dyn(
                    ext_c, vc, ouv, jnp.tile(cmode, 2), fire2, oy // 2,
                    ox // 2, size // 2, qp_c2, av_zc, is_luma=False,
                    ctu_yx=(ctu_yc2, ctu_xc2), frame_hw=(g.h // 2, g.w // 2),
                    span=32, rdoq_lam=rl_c, sbh=self.sbh,
                    ts_lam=tl_c, rate_qp=self.qp_c)
                cy8 = jax.lax.dynamic_update_slice(
                    cy8, jnp.where(fire_l, cbf_l,
                                   pick(cy8, sy, sx))[:, None, None],
                    (0, sy, sx))
                cc8 = jax.lax.dynamic_update_slice(
                    cc8, jnp.where(fire2, cbf_c,
                                   pick(cc8, sy, sx))[:, None, None],
                    (0, sy, sx))
                tc8 = jax.lax.dynamic_update_slice(
                    tc8, jnp.where(fire2, ts_c,
                                   pick(tc8, sy, sx))[:, None, None],
                    (0, sy, sx))
                return (ext_y, ext_c, vy, vc, cy8, cc8, cy4, ty4, tc8)

            def do_tu4(st, mode, fire, oy, ox, av_z, s4y, s4x):
                """One 4x4 luma TU (DST-VII; NxN PU or TU-split leaf) at
                static origin; cbf/ts go to the 4x4-granularity planes."""
                ext_y, ext_c, vy, vc, cy8, cc8, cy4, ty4, tc8 = st
                fire = fire & mk_flat
                ext_y, vy, cbf_l, ts_l = _tu_step_dyn(
                    ext_y, vy, oyl, mode, fire, oy, ox, 4, qp_l, av_z,
                    is_luma=True, ctu_yx=(ctu_y, ctu_x), frame_hw=(g.h, g.w),
                    span=64, rdoq_lam=rl_y, sbh=self.sbh, dst=True,
                    ts_lam=tl_y, rate_qp=self.qp)
                cy4 = jax.lax.dynamic_update_slice(
                    cy4, jnp.where(fire, cbf_l,
                                   pick(cy4, s4y, s4x))[:, None, None],
                    (0, s4y, s4x))
                ty4 = jax.lax.dynamic_update_slice(
                    ty4, jnp.where(fire, ts_l,
                                   pick(ty4, s4y, s4x))[:, None, None],
                    (0, s4y, s4x))
                return (ext_y, ext_c, vy, vc, cy8, cc8, cy4, ty4, tc8)

            def sub16_body(st, xs):
                """TU16 + TU8 (+4x4) steps of one 16-pel block. Firing is
                by leaf TU size (tz): a TU of size s fires where the slot's
                leaf is s, whatever the CU size — this realizes both the
                CU partition and the intra TU quadtree split."""
                ty, tx, av16, av16c, av8m, av8c, av4m = xs
                sy, sx = ty // 8, tx // 8
                tz_t = pick(tz, sy, sx)
                coded_t = pick(c8, sy, sx)
                fire_b = (tz_t == 4) & coded_t
                st = do_tu(st, pick(msl, sy, sx), pick(cm8, sy, sx),
                           fire_b, fire_b, ty, tx, 16, av16, av16c, sy, sx)
                # TU8 x4 (z-order within the block). A slot with leaf 2
                # codes four 4x4 luma TUs (NxN PUs with their own modes, or
                # a TU split with the CU mode — mode4 carries either); its
                # 4x4 chroma TU fires at the 8x8 step either way.
                for e in range(4):
                    ey, ex = ty + (e // 2) * 8, tx + (e % 2) * 8
                    esy, esx = ey // 8, ex // 8
                    tz_e = pick(tz, esy, esx)
                    coded_e = pick(c8, esy, esx)
                    st = do_tu(st, pick(msl, esy, esx), pick(cm8, esy, esx),
                               (tz_e == 3) & coded_e, (tz_e <= 3) & coded_e,
                               ey, ex, 8, av8m[e], av8c[e], esy, esx)
                    if self.nxn or self.tu_split:
                        fire4 = (tz_e == 2) & coded_e
                        for q in range(4):
                            qy, qx = ey + (q // 2) * 4, ex + (q % 2) * 4
                            mode_q = pick(mm4, qy // 4, qx // 4)
                            st = do_tu4(st, mode_q, fire4, qy, qx,
                                        av4m[e, q], qy // 4, qx // 4)
                return st, None

            def quad_body(st, xs):
                """One 32-pel quadrant: the TU32 step (hoisted out of the
                16-block scan — it can only fire at the quadrant leader),
                then the z-order scan over its four 16-blocks."""
                (qy, qx, av32, av32c, sub_xs) = xs
                sy, sx = qy // 8, qx // 8
                tz_t = pick(tz, sy, sx)
                coded_t = pick(c8, sy, sx)
                fire_a = (tz_t == 5) & coded_t
                st = do_tu(st, pick(msl, sy, sx), pick(cm8, sy, sx), fire_a,
                           fire_a, qy, qx, 32, av32, av32c, sy, sx)
                st, _ = jax.lax.scan(sub16_body, st, sub_xs)
                return st, None

            st = (ext_y, ext_c, vy, vc, cy8, cc8, cy4, ty4, tc8)
            (s_ty, s_tx, _s_isq, s_av32, s_av32c, s_av16, s_av16c, s_av8,
             s_av8c, s_av4) = (np.asarray(x) for x in sched)
            sub_xs = tuple(jnp.asarray(x.reshape(4, 4, *x.shape[1:]))
                           for x in (s_ty, s_tx, s_av16, s_av16c, s_av8,
                                     s_av8c, s_av4))
            quad_xs = (jnp.asarray(s_ty[::4]), jnp.asarray(s_tx[::4]),
                       jnp.asarray(s_av32[::4]), jnp.asarray(s_av32c[::4]),
                       sub_xs)
            st, _ = jax.lax.scan(quad_body, st, quad_xs)
            (ext_y, ext_c, vy, vc, cy8, cc8, cy4, ty4, tc8) = st

            ly = ext_y[:, 1: 65, 1: 65]
            lu = ext_c[:ba, 1: 33, 1: 33]
            lv = ext_c[ba:, 1: 33, 1: 33]
            vu, vv = vc[:ba], vc[ba:]
            cu8, cv8 = cc8[:ba], cc8[ba:]
            tu8_, tv8_ = tc8[:ba], tc8[ba:]

            # scatter local results; inactive slots dropped via an
            # out-of-range row (negative indices would WRAP in jax .at[]).
            ris = jnp.where(mk, ri, g.rc)

            def scat(blocked, val, shp):
                return blocked.at[bi, ris, cil].set(
                    val.reshape(b, a, *shp), mode="drop")

            ry = scat(ry, ly, (64, 64))
            ru = scat(ru, lu, (32, 32))
            rv = scat(rv, lv, (32, 32))
            lvy = scat(lvy, vy, (64, 64))
            lvu = scat(lvu, vu, (32, 32))
            lvv = scat(lvv, vv, (32, 32))
            cby = scat(cby, cy8, (8, 8))
            cbu = scat(cbu, cu8, (8, 8))
            cbv = scat(cbv, cv8, (8, 8))
            cb4 = scat(cb4, cy4, (16, 16))
            t4b = scat(t4b, ty4, (16, 16))
            tub = scat(tub, tu8_, (8, 8))
            tvb = scat(tvb, tv8_, (8, 8))
            if shard is not None:
                # Halo exchange for the next diagonal: ship the tile-edge
                # strips (right-edge columns rightward; first-column
                # bottom rows leftward), ~KB per diagonal per component.
                def xch(rp, span):
                    nl = jax.lax.ppermute(rp[:, :, cl - 1, :, span - 1],
                                          axis_name, perm_r)
                    nb = jax.lax.ppermute(rp[:, :, 0, span - 1, :],
                                          axis_name, perm_l)
                    return nl, nb
                nly, nby = xch(ry, 64)
                nlu, nbu = xch(ru, 32)
                nlv, nbv = xch(rv, 32)
                halos = (nly, nlu, nlv, nby, nbu, nbv)
            return (ry, ru, rv, lvy, lvu, lvv, cby, cbu, cbv, cb4,
                    t4b, tub, tvb, halos), None

        if shard is not None:
            halos0 = (jnp.zeros((b, g.rc, 64), jnp.int32),
                      jnp.zeros((b, g.rc, 32), jnp.int32),
                      jnp.zeros((b, g.rc, 32), jnp.int32),
                      jnp.zeros((b, g.rc, 64), jnp.int32),
                      jnp.zeros((b, g.rc, 32), jnp.int32),
                      jnp.zeros((b, g.rc, 32), jnp.int32))
        else:
            halos0 = ()
        init = (
            jnp.zeros((b, g.rc, cl, 64, 64), jnp.int32),
            jnp.zeros((b, g.rc, cl, 32, 32), jnp.int32),
            jnp.zeros((b, g.rc, cl, 32, 32), jnp.int32),
            jnp.zeros((b, g.rc, cl, 64, 64), jnp.int32),
            jnp.zeros((b, g.rc, cl, 32, 32), jnp.int32),
            jnp.zeros((b, g.rc, cl, 32, 32), jnp.int32),
            jnp.zeros((b, g.rc, cl, 8, 8), bool),
            jnp.zeros((b, g.rc, cl, 8, 8), bool),
            jnp.zeros((b, g.rc, cl, 8, 8), bool),
            jnp.zeros((b, g.rc, cl, 16, 16), bool),
            jnp.zeros((b, g.rc, cl, 16, 16), bool),
            jnp.zeros((b, g.rc, cl, 8, 8), bool),
            jnp.zeros((b, g.rc, cl, 8, 8), bool),
            halos0,
        )
        xs = (jnp.asarray(act_r), jnp.asarray(act_c), jnp.asarray(act_m))
        (ry, ru, rv, lvy, lvu, lvv, cby, cbu, cbv, cb4,
         t4b, tub, tvb, _h), _ = jax.lax.scan(diagonal_body, init, xs)

        g_ = self.geom
        cw = cl * 64          # local frame width (global when unsharded)
        return {
            "recon_y": from_blocked(ry)[:, : g_.hp, : cw],
            "recon_u": from_blocked(ru)[:, : g_.hp // 2, : cw // 2],
            "recon_v": from_blocked(rv)[:, : g_.hp // 2, : cw // 2],
            "levels_y": from_blocked(lvy),
            "levels_u": from_blocked(lvu),
            "levels_v": from_blocked(lvv),
            "cbf_y": from_blocked(cby),
            "cbf_u": from_blocked(cbu),
            "cbf_v": from_blocked(cbv),
            "cbf4_y": from_blocked(cb4),
            "ts4_y": from_blocked(t4b),
            "ts8_u": from_blocked(tub),
            "ts8_v": from_blocked(tvb),
        }
