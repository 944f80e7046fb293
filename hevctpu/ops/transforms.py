"""HEVC core transforms as batched MXU matmuls.

Equivalent of the reference's partial-butterfly transform stack
(TComTrQuant.cpp:388-989 in /root/reference), re-designed for TPU: an NxN
forward/inverse transform is two small matmuls against the spec matrices,
batched over thousands of TUs at once. Bit-exactness with the (normative)
inverse transform is preserved by doing integer matmuls exactly on the MXU
via a hi/lo split into float32 (each partial product stays below 2^24, the
float32 exact-integer range).

All entry points take [..., N, N] int32 residual/coefficient blocks and are
jit/vmap friendly with static size arguments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hevctpu import rom


@functools.lru_cache(maxsize=None)
def _mat_np(log2_size: int, dst: bool, transpose: bool) -> np.ndarray:
    m = rom.DST4 if dst else rom.dct_matrix(1 << log2_size)
    if transpose:
        m = m.T
    return np.ascontiguousarray(m).astype(np.int32)


def _mat(log2_size: int, dst: bool, transpose: bool) -> jnp.ndarray:
    return jnp.asarray(_mat_np(log2_size, dst, transpose))


def exact_i32_matmul(t: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """t @ x computed exactly for |t| <= 255 and |x| < 2^23.

    The TPU MXU multiplies bf16 operands (8-bit mantissa) with float32
    accumulation, so a product is exact only when both factors are integers
    of magnitude <= 256. We split x into three 8-bit limbs; every partial
    matmul then accumulates exact integers (|sum| <= 255*256*32 < 2^24) and
    the limbs recombine in int32. The transform matrices themselves fit in
    8 bits (|coeff| <= 90).
    """
    l0 = x & 0xFF
    r = (x - l0) >> 8
    l1 = r & 0xFF
    l2 = (r - l1) >> 8
    tb = t.astype(jnp.bfloat16)

    def mm(limb):
        return jnp.einsum(
            "kn,...nm->...km", tb, limb.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32).astype(jnp.int32)

    return ((mm(l2) << 8) + mm(l1) << 8) + mm(l0)


def _round_shift(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    return (x + (1 << (shift - 1))) >> shift


def forward_transform(res: jnp.ndarray, log2_size: int, *, bit_depth: int = 8,
                      dst: bool = False) -> jnp.ndarray:
    """Forward 2-D transform of residual blocks [..., N, N] -> coefficients.

    Matches the encoder-side scaling of the reference (horizontal stage then
    vertical stage with shifts log2+bd-9 and log2+6)."""
    t = _mat(log2_size, dst, transpose=False)
    s1 = rom.fwd_shift_1st(log2_size, bit_depth)
    s2 = rom.fwd_shift_2nd(log2_size)
    # Horizontal: tmp[k, y] = sum_x T[k, x] * res[y, x]
    tmp = _round_shift(exact_i32_matmul(t, jnp.swapaxes(res, -1, -2)), s1)
    # Vertical: out[ky, kx] = sum_y T[ky, y] * tmp'[y, kx]
    out = _round_shift(exact_i32_matmul(t, jnp.swapaxes(tmp, -1, -2)), s2)
    return out


def inverse_transform(coef: jnp.ndarray, log2_size: int, *, bit_depth: int = 8,
                      dst: bool = False) -> jnp.ndarray:
    """Normative inverse 2-D transform (H.265 8.6.4): vertical stage, shift 7
    with 16-bit clip, then horizontal stage, shift 20-bitDepth."""
    tt = _mat(log2_size, dst, transpose=True)
    s2 = rom.inv_shift_2nd(bit_depth)
    tmp = _round_shift(exact_i32_matmul(tt, coef), rom.INV_SHIFT_1ST)
    tmp = jnp.clip(tmp, -32768, 32767)
    out = exact_i32_matmul(tt, jnp.swapaxes(tmp, -1, -2))
    out = _round_shift(out, s2)
    return jnp.swapaxes(out, -1, -2)
