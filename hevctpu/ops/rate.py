"""Vectorized rate estimation: λ and approximate CABAC bit counts.

Equivalent in role to the reference's counting CABAC used for every RD
trial (TEncBinCABACCounter, TEncBinCoderCABACCounter.cpp:63, enabled by
FAST_BIT_EST TEncTop.h:101-103) and the RDOQ rate tables (estBitsSbac,
TComTrQuant.cpp:2119-3050): HM never pays for exact arithmetic coding
during the search, it *estimates*. We go one step further — a stateless,
fully data-parallel estimate (static weights per bin type instead of
evolving context states) so the rate of every candidate TU in a frame is
one fused elementwise+reduction pass on TPU.

Bit costs are returned in fixed point (1/BITS_ONE bit units, int32).
The per-bin-type weights were calibrated by least squares against the
exact Python CABAC slice coder (codec/syntax.py) over random TU
populations; see tests/test_rate.py for the enforced rank-correlation.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from hevctpu import rom

BITS_ONE = 256  # fixed-point scale: 256 == one bit

# Default per-bin-type costs, in 1/256-bit units. A context-coded bin
# whose state is usually skewed costs well under 1 bit; bypass bins cost
# exactly 1. Hand-calibrated against the exact CABAC coder; superseded at
# the CTC QPs by the regression-fitted per-QP table in rate_weights.py
# (tools/fit_rate_constants.py) — context-state skew varies with QP, so
# one global table systematically biases cross-size split decisions.
W_SIG0 = int(0.35 * BITS_ONE)       # sig_coeff_flag = 0
W_SIG1 = int(0.95 * BITS_ONE)       # sig_coeff_flag = 1
W_GT1_0 = int(0.55 * BITS_ONE)      # coeff_abs_level_greater1 = 0
W_GT1_1 = int(1.25 * BITS_ONE)      # coeff_abs_level_greater1 = 1
W_GT2_0 = int(0.60 * BITS_ONE)      # coeff_abs_level_greater2 = 0
W_GT2_1 = int(1.05 * BITS_ONE)      # coeff_abs_level_greater2 = 1
W_CSBF = int(0.80 * BITS_ONE)       # coded_sub_block_flag
W_LAST = int(0.80 * BITS_ONE)       # last_sig prefix ctx bin
W_CBF1 = int(0.80 * BITS_ONE)       # cbf = 1
W_CBF0 = int(0.50 * BITS_ONE)       # cbf = 0 (cost of signaling no residual)
W_SIGN = BITS_ONE                   # sign bypass

_W_FIELDS = ("sig0", "sig1", "gt1_0", "gt1_1", "gt2_0", "gt2_1",
             "csbf", "last", "cbf1", "cbf0")
_W_DEFAULT = {"sig0": W_SIG0, "sig1": W_SIG1, "gt1_0": W_GT1_0,
              "gt1_1": W_GT1_1, "gt2_0": W_GT2_0, "gt2_1": W_GT2_1,
              "csbf": W_CSBF, "last": W_LAST, "cbf1": W_CBF1,
              "cbf0": W_CBF0}


@functools.lru_cache(maxsize=None)
def bin_weights(qp: int | None) -> dict:
    """Per-bin-type weights for a given (static) QP: the fitted table when
    available, else the hand-calibrated defaults."""
    if qp is None:
        return _W_DEFAULT
    try:
        from hevctpu.ops.rate_weights import FITTED
    except ImportError:
        return _W_DEFAULT
    if not FITTED:
        return _W_DEFAULT
    qps = sorted(FITTED)
    near = min(qps, key=lambda q: abs(q - qp))
    return dict(zip(_W_FIELDS, FITTED[near]))


def lambda_rd(qp: int) -> float:
    """HM's I-slice λ (TEncSlice::initEncSlice, TEncSlice.cpp:159-433):
    λ = 0.57 · 2^((QP-12)/3) for All-Intra (no B-frame scale)."""
    return 0.57 * 2.0 ** ((qp - 12) / 3.0)


def lambda_per_unit(qp: int) -> float:
    """λ in distortion-per-(1/BITS_ONE-bit) units: multiply an
    estimate_tu_bits() result by this to get a distortion-comparable cost."""
    return lambda_rd(qp) / BITS_ONE


def chroma_dist_weight(qp: int, qp_c: int) -> float:
    """HM weights chroma SSE by 2^((QP-QPc)/3) when summing into the RD
    cost (TComRdCost::setLambda chroma weighting, TComRdCost.cpp:109)."""
    return 2.0 ** ((qp - qp_c) / 3.0)


# ---------------------------------------------------------------------------
# Static per-size tables
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _last_pos_bits(n: int, w_last: int = W_LAST) -> np.ndarray:
    """Approximate bits of coding one axis of the last-sig position
    (9.3.3.8 binarization: ctx-coded truncated-unary prefix per group +
    bypass suffix). [n] in 1/BITS_ONE units."""
    out = np.zeros(n, dtype=np.int64)
    g = 4 if n == 4 else (6 if n == 8 else (8 if n == 16 else 10))
    for pos in range(n):
        group = 0
        while group + 1 < g and pos >= _group_min(group + 1):
            group += 1
        prefix_bins = min(group + 1, g)
        suffix_bits = max(0, (group >> 1) - 1)
        out[pos] = prefix_bins * w_last + suffix_bits * BITS_ONE
    return out


@functools.lru_cache(maxsize=None)
def _last_pos_counts(n: int) -> np.ndarray:
    """(prefix ctx bins, suffix bypass bits) per position — the feature
    split behind _last_pos_bits, for the weight-fitting regression."""
    out = np.zeros((n, 2), dtype=np.int64)
    g = 4 if n == 4 else (6 if n == 8 else (8 if n == 16 else 10))
    for pos in range(n):
        group = 0
        while group + 1 < g and pos >= _group_min(group + 1):
            group += 1
        out[pos] = (min(group + 1, g), max(0, (group >> 1) - 1))
    return out


def _group_min(group: int) -> int:
    if group < 2:
        return group
    return (2 + (group & 1)) << ((group >> 1) - 1)


@functools.lru_cache(maxsize=None)
def _scan_pos(n: int) -> np.ndarray:
    """[n, n] scan position (diag CG-composed scan) of each (y, x)."""
    log2 = int(np.log2(n))
    scan = (rom.tb_scan(rom.SCAN_DIAG, log2) if n >= 4
            else rom.scan_order(rom.SCAN_DIAG, n))
    pos = np.zeros((n, n), dtype=np.int32)
    for i, (y, x) in enumerate(scan):
        pos[y, x] = i
    return pos


def golomb_rice_bits(v: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Exact coeff_abs_level_remaining length (9.3.3.9 / HM xGetICRate
    semantics), in whole bits. v, k int32 arrays (k in [0, 4])."""
    small = (v >> k) < 3
    bits_small = (v >> k) + 1 + k
    # Escape: L = floor(log2(u + 2^k)) with u = v - 3·2^k; total length
    # 3 + (L - k) + 1 + L (prefix continuation + terminator + suffix).
    u = jnp.maximum(v - (3 << k), 0)
    big = jnp.maximum(u + (1 << k), 1)
    l = jnp.int32(jnp.floor(jnp.log2(big.astype(jnp.float32) + 0.5)))
    bits_big = 4 + 2 * l - k
    return jnp.where(small, bits_small, bits_big)


def level_bits(absl: jnp.ndarray, k: jnp.ndarray,
               w: dict | None = None) -> jnp.ndarray:
    """Approximate bits to code one coefficient of |level| = absl (>= 0),
    Golomb-Rice parameter k. In 1/BITS_ONE units. Stateless model of the
    sig/gt1/gt2/remaining/sign ladder (7.3.8.11)."""
    w = w or _W_DEFAULT
    b0 = jnp.where(absl > 0, w["sig1"], w["sig0"])
    b1 = jnp.where(absl > 1, w["gt1_1"],
                   jnp.where(absl == 1, w["gt1_0"], 0))
    b2 = jnp.where(absl > 2, w["gt2_1"],
                   jnp.where(absl == 2, w["gt2_0"], 0))
    rem = golomb_rice_bits(jnp.maximum(absl - 3, 0), k) * BITS_ONE
    b3 = jnp.where(absl > 2, rem, 0)
    sign = jnp.where(absl > 0, W_SIGN, 0)
    return b0 + b1 + b2 + b3 + sign


def estimate_tu_bits(levels: jnp.ndarray, log2: int,
                     qp: int | None = None) -> jnp.ndarray:
    """Approximate CABAC bits for a quantized TU [..., N, N] -> [...] int32
    (1/BITS_ONE units). Includes cbf, last-position, coded_sub_block_flags,
    and the per-coefficient ladder. Zero TU costs the cbf=0 weight. qp
    (static) selects the regression-fitted weight set for that QP."""
    w = bin_weights(qp)
    n = 1 << log2
    absl = jnp.abs(levels).astype(jnp.int32)
    nz = absl > 0
    any_nz = jnp.any(nz, axis=(-2, -1))

    pos = jnp.asarray(_scan_pos(n))
    last_scan = jnp.max(jnp.where(nz, pos, -1), axis=(-2, -1))     # [...]

    # last position (x, y) bits: gather the coords of the last coeff.
    flat_pos = pos.reshape(-1)
    order = jnp.zeros(n * n, jnp.int32).at[flat_pos].set(
        jnp.arange(n * n, dtype=jnp.int32))  # scanpos -> flat (y*n+x)
    last_flat = order[jnp.maximum(last_scan, 0)]
    ly, lx = last_flat // n, last_flat % n
    lb = jnp.asarray(_last_pos_bits(n, w["last"]))
    last_bits = lb[ly] + lb[lx]

    # per-CG: coded flags + per-coeff ladder with per-CG rice k.
    cg = absl.reshape(*absl.shape[:-2], n // 4, 4, n // 4, 4)
    cg_sum = cg.sum(axis=(-3, -1))                       # [..., n/4, n/4]
    cg_nz = cg_sum > 0
    # rice k per CG from the mean magnitude (monotone heuristic standing in
    # for HM's per-coefficient adaptation).
    k_cg = jnp.clip(
        jnp.int32(jnp.floor(jnp.log2(1.0 + cg_sum.astype(jnp.float32) / 8.0))),
        0, 4)
    k_full = jnp.repeat(jnp.repeat(k_cg, 4, axis=-2), 4, axis=-1)

    # csbf bins: one per CG in scan range up to the last, minus the DC CG
    # and the last CG (both implied).
    cg_pos = jnp.asarray(_scan_pos(max(n // 4, 1))) if n > 4 else None
    if n > 4:
        last_cg_scan = jnp.max(
            jnp.where(cg_nz, cg_pos, -1), axis=(-2, -1))
        csbf_bits = jnp.maximum(last_cg_scan - 1, 0) * w["csbf"]
        # coefficients in zero CGs cost nothing (skipped by csbf=0).
        coeff_mask = jnp.repeat(jnp.repeat(cg_nz, 4, axis=-2), 4, axis=-1)
    else:
        csbf_bits = jnp.zeros(absl.shape[:-2], jnp.int32)
        coeff_mask = jnp.ones_like(nz)

    # sig/level bits only for scan positions strictly before the last
    # (the last coeff's sig flag is implied = 1 -> count it via level_bits
    # but remove one W_SIG1... modeling detail absorbed by calibration).
    in_range = pos <= last_scan[..., None, None]
    lb_coeff = level_bits(absl, k_full, w)
    coeff_bits = jnp.sum(
        jnp.where(coeff_mask & in_range, lb_coeff, 0), axis=(-2, -1))

    total = (w["cbf1"] + last_bits + csbf_bits + coeff_bits)
    return jnp.where(any_nz, total, w["cbf0"]).astype(jnp.int32)


def tu_bit_features(levels: np.ndarray, log2: int) -> np.ndarray:
    """Per-bin-type counts behind estimate_tu_bits, for the offline weight
    regression (tools/fit_rate_constants.py). levels [N, N] int. Returns
    [len(_W_FIELDS) + 1] float64: counts for (sig0, sig1, gt1_0, gt1_1,
    gt2_0, gt2_1, csbf, last-prefix, cbf1, cbf0) followed by the fixed
    bypass bits (remainders + signs + last suffix), so that
      estimate = counts . weights + bypass * BITS_ONE
    reproduces estimate_tu_bits exactly for the same weights."""
    n = 1 << log2
    absl = np.abs(np.asarray(levels, np.int64))
    nz = absl > 0
    f = np.zeros(len(_W_FIELDS) + 1, np.float64)
    if not nz.any():
        f[_W_FIELDS.index("cbf0")] = 1
        return f
    f[_W_FIELDS.index("cbf1")] = 1

    pos = _scan_pos(n)
    last_scan = int(np.max(np.where(nz, pos, -1)))
    ly, lx = np.argwhere(pos == last_scan)[0]
    lc = _last_pos_counts(n)
    f[_W_FIELDS.index("last")] = lc[ly, 0] + lc[lx, 0]
    bypass = float(lc[ly, 1] + lc[lx, 1])

    cg = absl.reshape(n // 4, 4, n // 4, 4)
    cg_sum = cg.sum(axis=(1, 3))
    cg_nz = cg_sum > 0
    k_cg = np.clip(np.floor(np.log2(1.0 + cg_sum / 8.0)).astype(np.int64),
                   0, 4)
    k_full = np.repeat(np.repeat(k_cg, 4, axis=0), 4, axis=1)
    if n > 4:
        cg_pos = _scan_pos(n // 4)
        last_cg = int(np.max(np.where(cg_nz, cg_pos, -1)))
        f[_W_FIELDS.index("csbf")] = max(last_cg - 1, 0)
        coeff_mask = np.repeat(np.repeat(cg_nz, 4, axis=0), 4, axis=1)
    else:
        coeff_mask = np.ones_like(nz)
    in_range = (pos <= last_scan) & coeff_mask

    a = absl[in_range]
    f[_W_FIELDS.index("sig0")] = int((a == 0).sum())
    f[_W_FIELDS.index("sig1")] = int((a > 0).sum())
    f[_W_FIELDS.index("gt1_0")] = int((a == 1).sum())
    f[_W_FIELDS.index("gt1_1")] = int((a > 1).sum())
    f[_W_FIELDS.index("gt2_0")] = int((a == 2).sum())
    f[_W_FIELDS.index("gt2_1")] = int((a > 2).sum())
    big = a > 2
    if big.any():
        import jax.numpy as _jnp
        rem = np.asarray(golomb_rice_bits(
            _jnp.asarray(np.maximum(a[big] - 3, 0).astype(np.int32)),
            _jnp.asarray(k_full[in_range][big].astype(np.int32))))
        bypass += float(rem.sum())
    bypass += float((a > 0).sum())       # signs
    f[-1] = bypass
    return f


def estimate_mode_bits(is_mpm: jnp.ndarray, mpm_idx: jnp.ndarray):
    """Luma intra mode signaling cost (TEncSearch::xModeBitsIntra
    semantics, TEncSearch.cpp:5530): prev_intra_luma_pred_flag ctx bin +
    either mpm_idx truncated-unary bypass (1..2 bins) or 5 bypass bins.
    In 1/BITS_ONE units."""
    mpm_flag = int(0.8 * BITS_ONE)
    bits_mpm = mpm_flag + jnp.where(mpm_idx == 0, BITS_ONE, 2 * BITS_ONE)
    bits_rem = mpm_flag + 5 * BITS_ONE
    return jnp.where(is_mpm, bits_mpm, bits_rem)
