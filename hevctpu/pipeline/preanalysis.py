"""Source pre-analysis: TM5-step-3 adaptive-QP activity (TEncPreanalyzer).

Equivalent of the reference's TEncPreanalyzer::xPreanalyze
(TEncPreanalyzer.cpp in /root/reference/HM_dl, off by default in the shipped
config): per coding block, the minimum variance of its 8×8 sub-blocks is the
"activity"; activities are normalized against the picture mean and mapped to
a per-block QP offset dqp = 6·log2(normAct) clipped to ±max_dqp. The
reference loops block-by-block on the CPU; here the whole picture is one
jitted reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("block", "max_dqp"))
def adaptive_qp_map(y: jnp.ndarray, *, block: int = 64,
                    max_dqp: int = 6) -> jnp.ndarray:
    """Per-block QP offsets for a luma plane [..., H, W] (H, W multiples of
    `block`). Returns int32 [..., H/block, W/block] in [-max_dqp, max_dqp].
    """
    h, w = y.shape[-2:]
    f = y.astype(jnp.float32)
    # variance of every 8×8 sub-block
    sub = f.reshape(*f.shape[:-2], h // 8, 8, w // 8, 8).swapaxes(-3, -2)
    mean = sub.mean(axis=(-2, -1))
    var = (sub * sub).mean(axis=(-2, -1)) - mean * mean
    # activity of each block = 1 + min sub-block variance (TM5 step 3)
    k = block // 8
    v = var.reshape(*var.shape[:-2], h // block, k, w // block, k)
    act = 1.0 + v.min(axis=(-3, -1))
    avg = act.mean(axis=(-2, -1), keepdims=True)
    norm = (2.0 * act + avg) / (act + 2.0 * avg)
    dqp = 6.0 * jnp.log2(norm)
    return jnp.clip(jnp.round(dqp), -max_dqp, max_dqp).astype(jnp.int32)


def frame_qp_offset(y, *, max_dqp: int = 3) -> int:
    """Whole-frame QP offset from mean activity — the frame-level use of the
    preanalysis when per-CU delta-QP signaling is not enabled (our default
    operating point, like the reference's)."""
    dqp = adaptive_qp_map(jnp.asarray(y, jnp.int32), max_dqp=max_dqp)
    return int(jnp.round(dqp.astype(jnp.float32).mean()))
