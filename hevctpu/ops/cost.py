"""Distortion metrics: SSE and Hadamard SATD as batched MXU matmuls.

Equivalent of the reference's TComRdCost SAD/SSE/Hadamard stack
(TComRdCost.cpp:518-1795), restructured so the 8x8 Hadamard butterflies
become two small matmuls, batched over (blocks x modes).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from hevctpu.ops.transforms import exact_i32_matmul


@functools.lru_cache(maxsize=None)
def _hadamard(n: int) -> np.ndarray:
    h = np.array([[1]], dtype=np.int32)
    while h.shape[0] < n:
        h = np.block([[h, h], [h, -h]])
    return h


def sse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Sum of squared differences over the trailing two axes."""
    d = (a - b).astype(jnp.int32)
    return jnp.sum(d * d, axis=(-2, -1))


def _hadamard_abs_sum(diff: jnp.ndarray, n: int) -> jnp.ndarray:
    h = jnp.asarray(_hadamard(n))
    t = exact_i32_matmul(h, diff)
    t = exact_i32_matmul(h, jnp.swapaxes(t, -1, -2))
    return jnp.sum(jnp.abs(t), axis=(-2, -1))


def satd(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hadamard SATD over trailing [N, N] axes, N in {4, 8, 16, 32, 64}.

    Matches the reference's normalization: 4x4 -> (sum+1)>>1; sizes >= 8 use
    8x8 Hadamard per subblock with (sum+2)>>2."""
    n = a.shape[-1]
    d = (a - b).astype(jnp.int32)
    if n == 4:
        return (_hadamard_abs_sum(d, 4) + 1) >> 1
    if n > 8:
        k = n // 8
        d = d.reshape(*d.shape[:-2], k, 8, k, 8).swapaxes(-3, -2)
        s = (_hadamard_abs_sum(d, 8) + 2) >> 2
        return jnp.sum(s, axis=(-2, -1))
    return (_hadamard_abs_sum(d, 8) + 2) >> 2
