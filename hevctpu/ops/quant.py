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

import jax.numpy as jnp

from hevctpu import rom


def transform_shift(log2_size: int, bit_depth: int = 8) -> int:
    return rom.MAX_TR_DYNAMIC_RANGE - bit_depth - log2_size


def quantize(coef: jnp.ndarray, log2_size: int, qp: int, *,
             bit_depth: int = 8, intra: bool = True) -> jnp.ndarray:
    """Hard-decision quantization of [..., N, N] coefficients -> levels."""
    qbits = rom.QUANT_SHIFT + qp // 6 + transform_shift(log2_size, bit_depth)
    scale = int(rom.QUANT_SCALES[qp % 6])
    add = (171 if intra else 85) << (qbits - 9)
    level = (jnp.abs(coef) * scale + add) >> qbits
    level = jnp.clip(level, 0, 32767)
    return jnp.where(coef < 0, -level, level)


def quantize_rdoq(coef: jnp.ndarray, log2_size: int, qp: int, lam: float, *,
                  bit_depth: int = 8) -> jnp.ndarray:
    """RD-optimized quantization of [..., N, N] coefficients -> levels.

    Per coefficient, choose l ∈ {round(c/q), round(c/q)-1, 0} minimizing
    pixel-domain distortion (transform-domain error x 4^(log2-7)) plus
    λ x estimated bits (ops/rate.py ladder); then zero any 4x4 coefficient
    group whose total coded cost exceeds its zeroed cost (+ the csbf bin).
    """
    from hevctpu.ops import rate  # local import: rate imports quant

    qbits = rom.QUANT_SHIFT + qp // 6 + transform_shift(log2_size, bit_depth)
    scale = int(rom.QUANT_SCALES[qp % 6])
    absc = jnp.abs(coef)
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

    def cost(lvl):
        deq = dequantize(lvl, log2_size, qp, bit_depth=bit_depth)
        err = (absc - deq).astype(jnp.float32)
        return err * err * dscale + lam_u * rate.level_bits(
            lvl, k).astype(jnp.float32)

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
        coded_cost = pool_cg(csel) + lam_u * rate.W_CSBF
        zero_cost = pool_cg(cz)
        kill = (zero_cost < coded_cost)[..., :, None, :, None]
        kill = jnp.broadcast_to(
            kill, lvl.shape[:-2] + (n // 4, 4, n // 4, 4)).reshape(lvl.shape)
        lvl = jnp.where(kill, 0, lvl)

    # Final arbitration against the hard-decision result with the *full*
    # TU estimator (which sees last-position and scan-range couplings the
    # per-coefficient model above does not — HM covers these with its
    # serial last-pos optimization, TComTrQuant.cpp:2619ff).
    hdq = jnp.abs(quantize(coef, log2_size, qp, bit_depth=bit_depth))

    def full_j(lv):
        deq = dequantize(lv, log2_size, qp, bit_depth=bit_depth)
        err = (absc - deq).astype(jnp.float32)
        d = jnp.sum(err * err, axis=(-2, -1)) * dscale
        return d + lam_u * rate.estimate_tu_bits(lv, log2_size).astype(
            jnp.float32)

    take_rdoq = (full_j(lvl) <= full_j(hdq))[..., None, None]
    lvl = jnp.where(take_rdoq, lvl, hdq)
    return jnp.where(coef < 0, -lvl, lvl)


def dequantize(level: jnp.ndarray, log2_size: int, qp: int, *,
               bit_depth: int = 8) -> jnp.ndarray:
    """Normative dequant (H.265 8.6.3, m=16): levels -> coefficients."""
    bd_shift = bit_depth + log2_size - 5
    scale = int(rom.INV_QUANT_SCALES[qp % 6]) * 16
    e = qp // 6 - bd_shift
    if e < 0:
        d = (level * scale + (1 << (-e - 1))) >> (-e)
    else:
        d = (level * scale) << e
    return jnp.clip(d, -32768, 32767)
