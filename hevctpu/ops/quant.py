"""Scalar quantization / dequantization + vectorized RDOQ.

Encoder-side forward quant follows the reference's hard-decision quantizer
(TComTrQuant.cpp:1126 semantics); dequantization is the normative H.265
8.6.3 formula (flat 16 scaling matrix), which the decoder must reproduce
bit-exactly. quantize_rdoq is the TPU-first restatement of the reference's
rate-distortion-optimized quantization (xRateDistOptQuant,
TComTrQuant.cpp:2119-3050): instead of a serial per-coefficient scan with
evolving contexts, every coefficient picks among {round, round-1, 0} by
transform-domain distortion + λ·(stateless bit estimate), then whole 4x4
coefficient groups are zeroed when that is RD-cheaper (HM's CG-zeroing
decision, TComTrQuant.cpp:2416ff) — all elementwise ops and reductions.
Everything is batched over TUs.
"""

from __future__ import annotations

import functools

import os

import jax.numpy as jnp
import numpy as np

from hevctpu import rom

# RDOQ last-position pass kill switch, read ONCE at import (the flag is
# baked into every traced program; flipping the env var after the first
# compile would otherwise be silently ignored — pass rdoq_lastpos=False
# explicitly for per-encoder control).
RDOQ_LASTPOS_DEFAULT = os.environ.get(
    "HEVCTPU_RDOQ_LASTPOS", "1") not in ("0", "false")


def transform_shift(log2_size: int, bit_depth: int = 8) -> int:
    return rom.MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size


def _qp_bc(qp, ref) -> jnp.ndarray:
    """Broadcast a per-TU qp array against a [..., N, N]-like operand."""
    q = jnp.asarray(qp)
    return q.reshape(q.shape + (1,) * (ref.ndim - q.ndim))


def quantize(coef: jnp.ndarray, log2_size: int, qp, *,
             bit_depth: int = 8, intra: bool = True) -> jnp.ndarray:
    """Hard-decision quantization of [..., N, N] coefficients -> levels.

    qp is a static int, or (cu_qp_delta operating points) an int32 array
    over the leading TU dims — per-CTU QP maps gather to per-TU values and
    the scale/shift become elementwise (TComTrQuant setQpParam semantics).
    """
    tshift = transform_shift(log2_size, bit_depth)
    if isinstance(qp, (int, np.integer)):
        qbits = rom.QUANT_SHIFT + int(qp) // 6 + tshift
        scale = int(rom.QUANT_SCALES[qp % 6])
        add = (171 if intra else 85) << (qbits - 9)
        level = (jnp.abs(coef) * scale + add) >> qbits
    else:
        q = _qp_bc(qp, coef)
        qbits = rom.QUANT_SHIFT + q // 6 + tshift
        scale = jnp.asarray(np.asarray(rom.QUANT_SCALES, np.int32))[q % 6]
        add = jnp.left_shift(171 if intra else 85, qbits - 9)
        level = jnp.right_shift(jnp.abs(coef) * scale + add, qbits)
    level = jnp.clip(level, 0, 32767)
    return jnp.where(coef < 0, -level, level)


@functools.lru_cache(maxsize=None)
def _tb_scan_tables(log2_size: int):
    """Static full-TB scan tables: (pos [3, N, N] scan position of each
    (y, x), idx [3, N*N] flat (y*N+x) of each scan position) for
    diag/hor/ver (H.265 6.5.3, CG-composed)."""
    n = 1 << log2_size
    pos = np.zeros((3, n, n), np.int32)
    idx = np.zeros((3, n * n), np.int32)
    for s in range(3):
        order = (rom.tb_scan(s, log2_size) if n > 4
                 else rom.scan_order(s, n))
        for i, (y, x) in enumerate(order):
            pos[s, y, x] = i
            idx[s, i] = y * n + x
    return pos, idx


def _last_bits_scan(log2_size: int, w_last: int) -> np.ndarray:
    """[3, N*N] last-position signaling bits (1/256 units) if scan pos p
    is the last significant coefficient, per scan type."""
    from hevctpu.ops import rate
    n = 1 << log2_size
    _, idx = _tb_scan_tables(log2_size)
    lb = rate._last_pos_bits(n, w_last)
    ys, xs = idx // n, idx % n
    return np.asarray(lb)[ys] + np.asarray(lb)[xs]


def quantize_rdoq(coef: jnp.ndarray, log2_size: int, qp, lam, *,
                  bit_depth: int = 8, scan: jnp.ndarray | None = None,
                  lastpos: bool | None = None,
                  rate_qp: int | None = None) -> jnp.ndarray:
    """RD-optimized quantization of [..., N, N] coefficients -> levels.

    Per coefficient, choose l ∈ {round(c/q), round(c/q)-1, 0} minimizing
    pixel-domain distortion (transform-domain error x 4^(log2-7)) plus
    λ x estimated bits (ops/rate.py ladder); then zero any 4x4 coefficient
    group whose total coded cost exceeds its zeroed cost (+ the csbf bin);
    then optimize the last-significant position (HM's d64 lastpos pass,
    TComTrQuant.cpp:2619ff): truncating the scan at an earlier nonzero
    coefficient drops every later coefficient's ladder bits at the price
    of its zeroing distortion and a shorter last-position prefix. scan
    [...] int32 (0=diag 1=hor 2=ver, per TU) selects the coefficient scan;
    None = diagonal.
    """
    from hevctpu.ops import rate  # local import: rate imports quant

    # qp/lam may be per-TU arrays (cu_qp_delta); the RATE tables stay at
    # the static slice QP (rate_qp) — context initialization depends on
    # SliceQpY only (9.3.2.2), cu_qp_delta never re-inits contexts.
    vec = not isinstance(qp, (int, np.integer))
    if rate_qp is None:
        assert not vec, "per-TU qp needs an explicit static rate_qp"
        rate_qp = int(qp)
    absc = jnp.abs(coef)
    tshift = transform_shift(log2_size, bit_depth)
    if vec:
        qv = _qp_bc(qp, coef)
        qbits = rom.QUANT_SHIFT + qv // 6 + tshift
        scale = jnp.asarray(np.asarray(rom.QUANT_SCALES, np.int32))[qv % 6]
        l1 = jnp.clip(jnp.right_shift(
            absc * scale + jnp.left_shift(1, qbits - 1), qbits), 0, 32767)
    else:
        qbits = rom.QUANT_SHIFT + qp // 6 + tshift
        scale = int(rom.QUANT_SCALES[qp % 6])
        l1 = jnp.clip((absc * scale + (1 << (qbits - 1))) >> qbits, 0, 32767)
    l0 = jnp.maximum(l1 - 1, 0)

    # rice parameter per CG from the provisional level magnitudes.
    n = 1 << log2_size
    cg_sum = l1.reshape(*l1.shape[:-2], n // 4, 4, n // 4, 4).sum(
        axis=(-3, -1))
    k_cg = jnp.clip(
        jnp.int32(jnp.floor(jnp.log2(1.0 + cg_sum.astype(jnp.float32) / 8.0))),
        0, 4)
    k = jnp.repeat(jnp.repeat(k_cg, 4, axis=-2), 4, axis=-1)

    dscale = 4.0 ** (log2_size - 7)
    lam_u = lam / rate.BITS_ONE
    if isinstance(lam, (int, float)):
        lam2 = lam1 = lam_u                 # scalar λ broadcasts anywhere
    else:                                   # per-TU λ [...]: explicit axes
        lam_a = jnp.asarray(lam_u)
        lam2 = lam_a[..., None, None]
        lam1 = lam_a[..., None]
    wq = rate.bin_weights(rate_qp)

    def cost(lvl):
        deq = dequantize(lvl, log2_size, qp, bit_depth=bit_depth)
        err = (absc - deq).astype(jnp.float32)
        return err * err * dscale + lam2 * rate.level_bits(
            lvl, k, wq).astype(jnp.float32)

    c1, c0, cz = cost(l1), cost(l0), cost(jnp.zeros_like(l1))
    best = jnp.where((c0 < c1) & (l0 < l1), l0, l1)
    cbest = jnp.minimum(jnp.where(l0 < l1, c0, c1), c1)
    lvl = jnp.where(cz <= cbest, 0, best)
    csel = jnp.minimum(cz, cbest)

    # CG zeroing: compare the group's coded cost (+ csbf bin) to all-zero.
    def pool_cg(x):
        return x.reshape(*x.shape[:-2], n // 4, 4, n // 4, 4).sum(
            axis=(-3, -1))

    if n > 4:
        coded_cost = pool_cg(csel) + lam2 * wq["csbf"]
        zero_cost = pool_cg(cz)
        kill = (zero_cost < coded_cost)[..., :, None, :, None]
        kill = jnp.broadcast_to(
            kill, lvl.shape[:-2] + (n // 4, 4, n // 4, 4)).reshape(lvl.shape)
        lvl = jnp.where(kill, 0, lvl)
        csel = jnp.where(kill, cz, csel)

    # Last-position optimization: pick the scan position q that minimizes
    #   sum_{p<=q} chosen-cost(p) + sum_{p>q} zero-distortion(p)
    #   + λ·last_pos_bits(q)
    # over nonzero candidates q (HM walks this backward serially with
    # context-exact deltas, TComTrQuant.cpp:2619ff; here it is two
    # cumulative sums over the scan axis, batched over all TUs). Scans are
    # applied as STATIC permutations (constant-index gathers XLA folds
    # into layout shuffles): mode-dependent scans exist only for 4x4/8x8
    # (H.265 7.4.9.11), where the three variants are evaluated and the
    # right one selected — cheaper inside the wavefront than a per-TU
    # traced gather.
    if lastpos is None:
        lastpos = RDOQ_LASTPOS_DEFAULT
    if not lastpos:
        hdq = jnp.abs(quantize(coef, log2_size, qp, bit_depth=bit_depth))

        def full_j0(lv):
            deq = dequantize(lv, log2_size, qp, bit_depth=bit_depth)
            err = (absc - deq).astype(jnp.float32)
            d = jnp.sum(err * err, axis=(-2, -1)) * dscale
            return d + lam_u * rate.estimate_tu_bits(
                lv, log2_size, rate_qp).astype(jnp.float32)

        take = (full_j0(lvl) <= full_j0(hdq))[..., None, None]
        lvl = jnp.where(take, lvl, hdq)
        return jnp.where(coef < 0, -lvl, lvl)

    pos_t, idx_t = _tb_scan_tables(log2_size)
    lastb = _last_bits_scan(log2_size, wq["last"])
    dz = (absc.astype(jnp.float32) ** 2) * dscale    # zero-out distortion
    mdcs = scan is not None and n <= 8
    n_scans = 3 if mdcs else 1

    keep_any = None
    zero_any = None
    for s in range(n_scans):
        idx = idx_t[s]                                # static [N*N]
        flat = (lambda x: x.reshape(*x.shape[:-2], n * n)[..., idx])
        c_scan = flat(csel)
        z_scan = flat(dz)
        l_scan = flat(lvl)
        csum = jnp.cumsum(c_scan, axis=-1)
        zsum = jnp.cumsum(z_scan, axis=-1)
        tail_zero = zsum[..., -1:] - zsum
        j_q = (csum + tail_zero
               + lam1 * (jnp.asarray(lastb[s], jnp.float32)
                          + float(wq["cbf1"])))
        j_q = jnp.where(l_scan != 0, j_q, jnp.inf)
        q_best = jnp.argmin(j_q, axis=-1)
        j_best = jnp.min(j_q, axis=-1)
        # all-zero TU alternative (cbf = 0)
        j_zero = zsum[..., -1] + lam_u * float(wq["cbf0"])
        any_nz = jnp.any(l_scan != 0, axis=-1)
        keep_s = jnp.asarray(pos_t[s]) <= q_best[..., None, None]
        zero_s = (~any_nz) | (j_zero < j_best)
        if not mdcs:
            keep_any, zero_any = keep_s, zero_s
        else:
            sel = (scan == s)[..., None, None]
            keep_any = keep_s if keep_any is None else jnp.where(
                sel, keep_s, keep_any)
            zero_any = (zero_s if zero_any is None else jnp.where(
                (scan == s), zero_s, zero_any))
    lvl = jnp.where(zero_any[..., None, None] | ~keep_any, 0, lvl)

    # Final arbitration against the hard-decision result with the *full*
    # TU estimator (which sees CG/csbf couplings the per-coefficient model
    # above does not).
    hdq = jnp.abs(quantize(coef, log2_size, qp, bit_depth=bit_depth))

    def full_j(lv):
        deq = dequantize(lv, log2_size, qp, bit_depth=bit_depth)
        err = (absc - deq).astype(jnp.float32)
        d = jnp.sum(err * err, axis=(-2, -1)) * dscale
        return d + lam_u * rate.estimate_tu_bits(
            lv, log2_size, rate_qp).astype(jnp.float32)

    take_rdoq = (full_j(lvl) <= full_j(hdq))[..., None, None]
    lvl = jnp.where(take_rdoq, lvl, hdq)
    return jnp.where(coef < 0, -lvl, lvl)


@functools.lru_cache(maxsize=None)
def _pos_in_cg() -> np.ndarray:
    """[3, 4, 4] within-coefficient-group scan position (0..15) of each
    (y, x) for diag / horizontal / vertical scans (H.265 6.5.3)."""
    out = np.zeros((3, 4, 4), np.int32)
    for s in range(3):
        order = rom.scan_order(s, 4)
        for i, (y, x) in enumerate(order):
            out[s, y, x] = i
    return out


def scan_sel(mode: jnp.ndarray, log2_size: int, is_luma: bool) -> jnp.ndarray:
    """Traced mode-dependent scan index (H.265 7.4.9.11; jnp twin of
    rom.coef_scan_idx): 0=diag, 1=hor, 2=ver."""
    if log2_size == 2 or (log2_size == 3 and is_luma):
        ver = (mode >= 6) & (mode <= 14)
        hor = (mode >= 22) & (mode <= 30)
        return jnp.where(ver, 2, jnp.where(hor, 1, 0)).astype(jnp.int32)
    return jnp.zeros(jnp.shape(mode), jnp.int32)


def sign_bit_hide(lvl: jnp.ndarray, coef: jnp.ndarray, log2_size: int,
                  qp: int, scan: jnp.ndarray, *,
                  bit_depth: int = 8) -> jnp.ndarray:
    """Encoder-side sign-data-hiding adjustment (TComTrQuant::
    signBitHidingHDQ, TComTrQuant.cpp:991, vectorized over all TUs).

    For each 4×4 coefficient group whose nonzero span in scan order exceeds
    the SBH threshold (lastNZ - firstNZ > 3), the decoder infers the sign of
    the first-in-scan nonzero coefficient from the parity of the group's
    absolute sum; when the parity disagrees, nudge the ±1-cheapest
    coefficient (by transform-domain distortion) so it agrees. Candidate
    moves never change the group's first/last nonzero positions, so the
    hide condition and hidden coefficient are stable.

    lvl/coef [..., N, N] signed; scan [...] int32 per TU (0/1/2).
    """
    n = 1 << log2_size
    nc = n // 4
    pos3 = jnp.asarray(_pos_in_cg())                       # [3, 4, 4]
    pos = pos3[scan]                                       # [..., 4, 4]

    def cgv(x):  # [..., N, N] -> [..., nc, nc, 4, 4]
        return x.reshape(*x.shape[:-2], nc, 4, nc, 4).swapaxes(-3, -2)

    def uncgv(x):
        return x.swapaxes(-3, -2).reshape(*x.shape[:-4], n, n)

    lc = cgv(lvl)
    absl = jnp.abs(lc)
    nz = absl > 0
    p = pos[..., None, None, :, :]                         # [..., 1, 1, 4, 4]
    p = jnp.broadcast_to(p, lc.shape)
    first = jnp.min(jnp.where(nz, p, 16), axis=(-2, -1))   # [..., nc, nc]
    last = jnp.max(jnp.where(nz, p, -1), axis=(-2, -1))
    hide = (last - first) > 3
    sum_abs = absl.sum(axis=(-2, -1))
    at_first = nz & (p == first[..., None, None])
    first_neg = jnp.any(at_first & (lc < 0), axis=(-2, -1))
    bad = hide & (((sum_abs & 1) == 1) != first_neg)

    # candidate costs: transform-domain distortion delta of |l| ± 1.
    absc = cgv(jnp.abs(coef)).astype(jnp.float32)

    def err(a):
        return jnp.square(absc - dequantize(a, log2_size, qp,
                                            bit_depth=bit_depth)
                          .astype(jnp.float32))

    e0 = err(absl)
    d_up = err(absl + 1) - e0
    d_dn = err(jnp.maximum(absl - 1, 0)) - e0
    interior = (p > first[..., None, None]) & (p < last[..., None, None])
    up_ok = nz | interior
    dn_ok = (absl >= 2) | ((absl == 1) & ~at_first
                           & (p != last[..., None, None]))
    inf = jnp.float32(np.inf)
    flat = jnp.concatenate(
        [jnp.where(up_ok, d_up, inf).reshape(*lc.shape[:-2], 16),
         jnp.where(dn_ok, d_dn, inf).reshape(*lc.shape[:-2], 16)], axis=-1)
    idx = jnp.argmin(flat, axis=-1)                        # [..., nc, nc]
    onehot = idx[..., None] == jnp.arange(32)
    up_m = onehot[..., :16].reshape(lc.shape) & bad[..., None, None]
    dn_m = onehot[..., 16:].reshape(lc.shape) & bad[..., None, None]
    sgn = jnp.where(lc != 0, jnp.sign(lc),
                    jnp.where(cgv(coef) < 0, -1, 1)).astype(lc.dtype)
    out = lc + jnp.where(up_m, sgn, 0) - jnp.where(dn_m, sgn, 0)
    return uncgv(out)


def dequantize(level: jnp.ndarray, log2_size: int, qp, *,
               bit_depth: int = 8) -> jnp.ndarray:
    """Normative dequant (H.265 8.6.3, m=16): levels -> coefficients.

    qp: static int, or int32 array over the leading TU dims (see
    quantize) — both shift directions of the spec formula evaluate
    elementwise with clamped shift amounts."""
    bd_shift = bit_depth + log2_size - 5
    if isinstance(qp, (int, np.integer)):
        scale = int(rom.INV_QUANT_SCALES[qp % 6]) * 16
        e = int(qp) // 6 - bd_shift
        if e < 0:
            d = (level * scale + (1 << (-e - 1))) >> (-e)
        else:
            d = (level * scale) << e
    else:
        q = _qp_bc(qp, level)
        scale = jnp.asarray(
            np.asarray(rom.INV_QUANT_SCALES, np.int32))[q % 6] * 16
        e = q // 6 - bd_shift
        neg = jnp.maximum(-e, 0)
        rnd = jnp.where(e < 0, jnp.left_shift(1, jnp.maximum(neg - 1, 0)), 0)
        d = jnp.where(e < 0,
                      jnp.right_shift(level * scale + rnd, neg),
                      jnp.left_shift(level * scale, jnp.maximum(e, 0)))
    return jnp.clip(d, -32768, 32767)
