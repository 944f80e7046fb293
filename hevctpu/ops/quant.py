"""Scalar quantization / dequantization.

Encoder-side forward quant follows the reference's hard-decision quantizer
(TComTrQuant.cpp:1126 semantics); dequantization is the normative H.265
8.6.3 formula (flat 16 scaling matrix), which the decoder must reproduce
bit-exactly. Everything is elementwise int32, batched over TUs.
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
