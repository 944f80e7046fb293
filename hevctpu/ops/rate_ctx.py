"""Context-exact stateless rate estimation for residual coding.

The reference prices every RD trial with a counting CABAC whose context
states persist across TUs (TEncBinCABACCounter.cpp:63 under FAST_BIT_EST,
TEncTop.h:101-103) and freezes those states for the whole of a TU's RDOQ
(estBitsSbac, TComTrQuant.cpp:2119ff). The previous estimator here
(ops/rate.estimate_tu_bits) collapsed all contexts of a bin type into one
fitted weight — cheap, but blind to the strong per-context skew of the
real models (a sig_coeff_flag at the DC position and one at a high-
frequency position differ by >1 bit at init).

This module prices the EXACT bin stream of residual_coding (7.3.8.11,
mirrored bin-for-bin from codec/syntax.py SliceEncoder._residual) with
each context-coded bin costed at its I-slice *initialization* state for
the slice QP (rom.cabac_init_state + the 9.3.4.3.2.2 state-probability
line — the same curve HM's entropy table is generated from). That is:
HM's frozen-state pricing, with "frozen at slice init" instead of
"frozen at wherever the raster scan happens to be" — fully stateless and
therefore fully data-parallel over every TU of a frame at once.

All per-position context classes, scan permutations, neighbor maps and
per-context bit costs are static per (TU size, scan, component, QP);
runtime is pure gathers/cumsums/reductions. The gt1-context chain and
Golomb-Rice adaptation, which are scan-sequential in the spec, vectorize
as within-CG cumulative ops plus a 16-step unrolled recurrence.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hevctpu import rom
from hevctpu.ops import rate

_BITS = rate.BITS_ONE  # fixed-point scale of the returned costs


@functools.lru_cache(maxsize=None)
def _ent_table() -> np.ndarray:
    """[64, 2] bits of coding (mps, lps) in state s: the CABAC state line
    p_lps(s) = 0.5 * alpha^s, alpha = (0.01875/0.5)^(1/63)."""
    alpha = (0.01875 / 0.5) ** (1.0 / 63.0)
    s = np.arange(64, dtype=np.float64)
    p_lps = 0.5 * alpha ** s
    return np.stack([-np.log2(1.0 - p_lps), -np.log2(p_lps)],
                    axis=-1).astype(np.float32)


# CABAC probability range: the state line's most-skewed LPS probability.
# The real engine can never price a bin outside [-log2(1-pmin), -log2(pmin)].
_P_MIN = 0.5 * ((0.01875 / 0.5) ** (63.0 / 63.0))   # p_lps at state 63

# Dirichlet prior weight on the init-state probability when blending the
# calibrated corpus counts (ops/ctx_probs.py) — small counts fall back to
# the init state, large counts dominate.
_PRIOR_K = 32.0


@functools.lru_cache(maxsize=None)
def _init_probs(name: str, qp: int) -> np.ndarray:
    """[n_ctx] P(bin=1) at the I-slice init state for qp."""
    row = rom.CTX_INIT[name][0]
    alpha = (0.01875 / 0.5) ** (1.0 / 63.0)
    out = np.zeros(len(row), np.float64)
    for i, iv in enumerate(row):
        state, mps = rom.cabac_init_state(iv, qp)
        p_lps = 0.5 * alpha ** state
        out[i] = (1.0 - p_lps) if mps == 1 else p_lps
    return out


@functools.lru_cache(maxsize=None)
def ctx_cost(name: str, qp: int, calibrated: bool = True) -> np.ndarray:
    """[n_ctx, 2] float32: bits of coding bin b in context (name, idx).

    Pricing follows the reference's counting-CABAC discipline with the
    states taken at their content steady-state rather than slice start:
    P(bin|ctx) is the calibrated corpus frequency (ops/ctx_probs.py,
    tools/fit_ctx_probs.py) blended with the init-state probability as a
    prior, clipped to the CABAC state line's reachable range. Without a
    calibration entry the cost degrades to the exact init-state price."""
    p1 = _init_probs(name, qp).copy()
    if not calibrated:
        p1 = np.clip(p1, _P_MIN, 1.0 - _P_MIN)
        return np.stack([-np.log2(1.0 - p1), -np.log2(p1)],
                        axis=-1).astype(np.float32)
    try:
        from hevctpu.ops.ctx_probs import COUNTS
    except ImportError:
        COUNTS = {}
    qps = sorted(COUNTS) if COUNTS else []
    if qps:
        near = min(qps, key=lambda q: abs(q - qp))
        d = COUNTS[near].get(name, {})
        for i in range(len(p1)):
            c0, c1 = d.get(i, (0, 0))
            n = c0 + c1
            if n:
                p1[i] = (c1 + _PRIOR_K * p1[i]) / (n + _PRIOR_K)
    p1 = np.clip(p1, _P_MIN, 1.0 - _P_MIN)
    return np.stack([-np.log2(1.0 - p1), -np.log2(p1)],
                    axis=-1).astype(np.float32)


def _last_prefix(val: int) -> int:
    if val <= 3:
        return val
    k = val.bit_length() - 1
    return 2 * k + (1 if val >= (3 << (k - 1)) else 0)


@functools.lru_cache(maxsize=None)
def _last_cost(log2: int, is_luma: bool, qp: int,
               calibrated: bool = True) -> np.ndarray:
    """[n] float32: exact bits of coding one last-position coordinate
    value (ctx prefix per 9.3.4.2.3 + bypass suffix), at init states."""
    n = 1 << log2
    name = "last_sig_x_luma" if is_luma else "last_sig_x_chroma"
    cost = ctx_cost(name, qp, calibrated)
    if is_luma:
        offset = 3 * (log2 - 2) + ((log2 - 1) >> 2)
        shift = (log2 + 1) >> 2
    else:
        offset, shift = 0, log2 - 2
    gmax = (log2 << 1) - 1
    out = np.zeros(n, np.float32)
    for v in range(n):
        prefix = _last_prefix(v)
        b = 0.0
        for i in range(min(prefix, gmax)):
            b += cost[offset + (i >> shift), 1]
        if prefix < gmax:
            b += cost[offset + (prefix >> shift), 0]
        if prefix > 3:
            b += (prefix >> 1) - 1          # bypass suffix bits
        out[v] = b
    return out


def _sig_ctx_static(x: int, y: int, log2: int, scan_idx: int,
                    is_luma: bool, prev_csbf: int) -> int:
    """sig_coeff_flag ctxInc (9.3.4.2.5) — mirror of syntax._sig_ctx."""
    if log2 == 2:
        return int(rom.SIG_CTX_4X4[4 * y + x])
    if x == 0 and y == 0:
        return 0
    xp, yp = x & 3, y & 3
    if prev_csbf == 0:
        s = 2 if xp + yp == 0 else (1 if xp + yp < 3 else 0)
    elif prev_csbf == 1:
        s = 2 if yp == 0 else (1 if yp == 1 else 0)
    elif prev_csbf == 2:
        s = 2 if xp == 0 else (1 if xp == 1 else 0)
    else:
        s = 2
    if is_luma and (x >= 4 or y >= 4):
        s += 3
    if log2 == 3:
        s += (9 if scan_idx == rom.SCAN_DIAG else 15) if is_luma else 9
    else:
        s += 21 if is_luma else 12
    return s


class _Tables:
    __slots__ = ("perm", "posy", "posx", "sigctx", "right_nb", "below_nb",
                 "last_cost", "sig_cost", "csbf_cost", "g1_cost",
                 "g2_cost", "cbf_cost")


@functools.lru_cache(maxsize=None)
def _tables(log2: int, scan_idx: int, is_luma: bool, qp: int,
            calibrated: bool = True) -> _Tables:
    n = 1 << log2
    n2 = n * n
    m = max(n2 // 16, 1)
    t = _Tables()
    scan = rom.tb_scan(scan_idx, log2) if n > 4 else rom.scan_order(
        scan_idx, 4)
    t.posy = scan[:, 0].astype(np.int32)
    t.posx = scan[:, 1].astype(np.int32)
    t.perm = (t.posy * n + t.posx).astype(np.int32)

    sigctx = np.zeros((4, n2), np.int32)
    for p in range(4):
        for i in range(n2):
            sigctx[p, i] = _sig_ctx_static(
                int(t.posx[i]), int(t.posy[i]), log2, scan_idx, is_luma, p)
    t.sigctx = sigctx

    ncg = max(n // 4, 1)
    cgs = rom.scan_order(scan_idx, ncg)
    pos_of = {(int(cy), int(cx)): g for g, (cy, cx) in enumerate(cgs)}
    right = np.full(m, -1, np.int32)
    below = np.full(m, -1, np.int32)
    for g, (cy, cx) in enumerate(cgs):
        right[g] = pos_of.get((int(cy), int(cx) + 1), -1)
        below[g] = pos_of.get((int(cy) + 1, int(cx)), -1)
    t.right_nb, t.below_nb = right, below

    c = "luma" if is_luma else "chroma"
    t.last_cost = _last_cost(log2, is_luma, qp, calibrated)
    t.sig_cost = ctx_cost(f"sig_coeff_{c}", qp, calibrated)
    t.csbf_cost = ctx_cost(f"coded_sub_block_{c}", qp, calibrated)
    t.g1_cost = ctx_cost(f"coeff_abs_gt1_{c}", qp, calibrated)
    t.g2_cost = ctx_cost(f"coeff_abs_gt2_{c}", qp, calibrated)
    t.cbf_cost = ctx_cost("cbf_luma" if is_luma else "cbf_chroma", qp,
                          calibrated)
    return t


@functools.lru_cache(maxsize=None)
def mode_signal_bits(qp: int) -> tuple[float, float, float]:
    """(mpm_idx0, mpm_idx1/2, non-mpm) luma mode signaling bits at init
    states: prev_intra_luma_pred_flag ctx bin + TU bypass / 5 bypass
    (TEncSearch::xModeBitsIntra semantics, TEncSearch.cpp:5530)."""
    c = ctx_cost("prev_intra_luma_pred", qp)
    return (float(c[0, 1]) + 1.0, float(c[0, 1]) + 2.0,
            float(c[0, 0]) + 5.0)


@functools.lru_cache(maxsize=None)
def chroma_sel_bits(qp: int) -> tuple[float, ...]:
    """Signaling bits of the 5 intra_chroma_pred_mode symbols (4 list
    entries then DM): ctx bin + 2 bypass for a list entry, ctx bin for
    DM (9.3.3.8 binarization as coded by codec/syntax.py)."""
    c = ctx_cost("intra_chroma_pred_mode", qp)
    lst = float(c[0, 1]) + 2.0
    return (lst, lst, lst, lst, float(c[0, 0]))


@functools.lru_cache(maxsize=None)
def split_cu_bits(qp: int, ctx: int = 1) -> tuple[float, float]:
    """(split=0, split=1) bits of split_cu_flag at init state; ctx is the
    neighbor-depth context (0..2), default the middle class."""
    c = ctx_cost("split_cu_flag", qp)
    return float(c[ctx, 0]), float(c[ctx, 1])


@functools.lru_cache(maxsize=None)
def part_mode_bits(qp: int) -> tuple[float, float]:
    """(PART_NxN, PART_2Nx2N) bits of the part_mode bin coded at
    max-depth intra CUs (bin 1 = 2Nx2N)."""
    c = ctx_cost("part_mode", qp)
    return float(c[0, 0]), float(c[0, 1])


@functools.lru_cache(maxsize=None)
def split_tu_bits(qp: int, log2: int) -> tuple[float, float]:
    """(no-split, split) bits of split_transform_flag at ctx 5-log2."""
    c = ctx_cost("split_transform_flag", qp)
    return float(c[5 - log2, 0]), float(c[5 - log2, 1])


def _rem_len(val: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
    """Exact coeff_abs_level_remaining length (9.3.3.9; mirror of
    syntax._code_remaining): prefix 0..3 -> q+1+c bits; escape -> the
    growing Exp-Golomb ladder."""
    q = val >> c
    small = q < 4
    w = jnp.maximum(val - (2 << c), 1)
    k = jnp.maximum(
        jnp.int32(jnp.floor(jnp.log2(w.astype(jnp.float32) + 0.5))), c + 1)
    return jnp.where(small, q + 1 + c, 4 + 2 * k - c)


def estimate_tu_bits_ctx(levels: jnp.ndarray, log2: int, qp: int, *,
                         is_luma: bool = True,
                         scan_idx: int = rom.SCAN_DIAG,
                         sbh: bool = True, cbf_ctx: int = 0,
                         include_cbf: bool = True,
                         calibrated: bool = True) -> jnp.ndarray:
    """Bits of residual_coding(levels) [..., N, N] -> [...] float32 in
    1/BITS_ONE units: the exact 7.3.8.11 bin stream priced at I-slice
    init context states (see module docstring). A zero TU costs the
    cbf=0 bin; include_cbf=False drops the cbf bin from both sides."""
    n = 1 << log2
    n2 = n * n
    m = max(n2 // 16, 1)
    t = _tables(log2, scan_idx, is_luma, qp, calibrated)
    lead = levels.shape[:-2]
    s = levels.reshape(*lead, n2)[..., jnp.asarray(t.perm)]
    a = jnp.abs(s).astype(jnp.int32)
    nz = a > 0
    iota = jnp.arange(n2, dtype=jnp.int32)
    last = jnp.max(jnp.where(nz, iota, -1), axis=-1)
    any_nz = last >= 0
    lastc = jnp.maximum(last, 0)

    # --- last position ---------------------------------------------------
    ly = jnp.asarray(t.posy)[lastc]
    lx = jnp.asarray(t.posx)[lastc]
    if scan_idx == rom.SCAN_VER:
        lx, ly = ly, lx
    lcost = jnp.asarray(t.last_cost)
    last_bits = lcost[lx] + lcost[ly]

    # --- CG structure ----------------------------------------------------
    ac = a.reshape(*lead, m, 16)
    nzc = nz.reshape(*lead, m, 16)
    cg_nz = jnp.any(nzc, axis=-1)
    last_cg = lastc >> 4
    cg_iota = jnp.arange(m, dtype=jnp.int32)
    csbf_coded = (cg_iota > 0) & (cg_iota < last_cg[..., None])

    def nb_gather(idx):
        safe = jnp.maximum(jnp.asarray(idx), 0)
        got = jnp.take(cg_nz, safe, axis=-1)
        return got & jnp.asarray(idx >= 0)

    p = (nb_gather(t.right_nb).astype(jnp.int32)
         + 2 * nb_gather(t.below_nb).astype(jnp.int32))    # [..., m]
    csbf_cost = jnp.asarray(t.csbf_cost)
    csbf_bits = jnp.sum(
        jnp.where(csbf_coded,
                  csbf_cost[jnp.minimum(p, 1), cg_nz.astype(jnp.int32)],
                  0.0), axis=-1)

    proc = (cg_iota <= last_cg[..., None]) & (cg_nz | ~csbf_coded)

    # --- significance map ------------------------------------------------
    others_nz = jnp.any(nzc[..., 1:], axis=-1)            # positions 1..15
    rep16 = lambda x: jnp.repeat(x, 16, axis=-1)          # noqa: E731
    before_last = iota < last[..., None]
    dc_skip = ((iota & 15) == 0) & rep16(csbf_coded) & ~rep16(others_nz)
    sig_mask = rep16(proc) & before_last & ~dc_skip
    ctx_sig = jnp.asarray(t.sigctx)[rep16(p), iota]       # [..., n2]
    sig_cost = jnp.asarray(t.sig_cost)
    sig_bits = jnp.sum(
        jnp.where(sig_mask, sig_cost[ctx_sig, nz.astype(jnp.int32)], 0.0),
        axis=-1)

    # --- gt1 / gt2 (reverse scan within CG) ------------------------------
    ar = ac[..., ::-1]
    nzr = nzc[..., ::-1]
    rank = jnp.cumsum(nzr, axis=-1)                       # 1-based at nz
    first8 = nzr & (rank <= 8)
    f = (ar > 1) & first8                                 # gt1 flags

    # previous processed-with-coeffs CG (descending cg order) -> ctx_set +1
    has1 = jnp.any(f, axis=-1)
    idxv = jnp.where(proc & cg_nz, cg_iota, m)
    revmin = jax.lax.cummin(idxv[..., ::-1], axis=idxv.ndim - 1)[..., ::-1]
    prev_idx = jnp.concatenate(
        [revmin[..., 1:], jnp.full(revmin.shape[:-1] + (1,), m,
                                   revmin.dtype)], axis=-1)
    prev_has1 = (jnp.take_along_axis(
        has1, jnp.minimum(prev_idx, m - 1), axis=-1)
        & (prev_idx < m))
    base_set = 0 if not is_luma else 2
    ctx_set = (jnp.where(cg_iota == 0, 0, base_set)
               + prev_has1.astype(jnp.int32))             # [..., m]

    cnt_prev = jnp.cumsum(first8, axis=-1) - first8       # coded before
    any1_prev = (jnp.cumsum(f, axis=-1) - f) > 0
    g1ctx = jnp.where(any1_prev, 0, jnp.minimum(1 + cnt_prev, 3))
    g1_cost = jnp.asarray(t.g1_cost)
    gt1_bits = jnp.sum(
        jnp.where(first8,
                  g1_cost[ctx_set[..., None] * 4 + g1ctx,
                          f.astype(jnp.int32)], 0.0), axis=(-2, -1))

    firstg1 = f & (jnp.cumsum(f, axis=-1) == 1)
    g2_bin = jnp.any(firstg1 & (ar > 2), axis=-1)
    g2_cost = jnp.asarray(t.g2_cost)
    g2_idx = ctx_set if is_luma else jnp.minimum(ctx_set, 1)
    gt2_bits = jnp.sum(
        jnp.where(has1, g2_cost[g2_idx, g2_bin.astype(jnp.int32)], 0.0),
        axis=-1)

    # --- signs (with sign-bit-hiding) ------------------------------------
    w_iota = jnp.arange(16, dtype=jnp.int32)
    wmin = jnp.min(jnp.where(nzc, w_iota, 16), axis=-1)
    wmax = jnp.max(jnp.where(nzc, w_iota, -1), axis=-1)
    nnz_cg = jnp.sum(nzc, axis=-1)
    hidden = (wmax - wmin > 3) if sbh else jnp.zeros_like(cg_nz)
    sign_bits = jnp.sum(
        jnp.where(cg_nz, nnz_cg - hidden.astype(jnp.int32), 0),
        axis=-1).astype(jnp.float32)

    # --- remaining levels (Golomb-Rice with within-CG adaptation) --------
    coded_rem = (first8 & f & ~(firstg1 & (ar == 2))) | (nzr & (rank > 8))
    basev = jnp.where(rank > 8, 1, jnp.where(firstg1, 3, 2))
    vrem = jnp.maximum(ar - basev, 0)
    rice = jnp.zeros(lead + (m,), jnp.int32)
    rem_bits = jnp.zeros(lead + (m,), jnp.float32)
    for j in range(16):
        cj = coded_rem[..., j]
        rem_bits = rem_bits + jnp.where(
            cj, _rem_len(vrem[..., j], rice).astype(jnp.float32), 0.0)
        rice = jnp.where(cj & (ar[..., j] > (3 << rice)),
                         jnp.minimum(rice + 1, 4), rice)
    rem_bits = jnp.sum(rem_bits, axis=-1)

    total = (last_bits + csbf_bits + sig_bits + gt1_bits + gt2_bits
             + sign_bits + rem_bits)
    cbf_cost = jnp.asarray(t.cbf_cost)
    if include_cbf:
        total = total + cbf_cost[cbf_ctx, 1]
        zero = cbf_cost[cbf_ctx, 0]
    else:
        zero = jnp.float32(0.0)
    return jnp.where(any_nz, total, zero) * float(_BITS)
