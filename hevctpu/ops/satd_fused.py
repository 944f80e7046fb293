"""Fused stage-1 mode search as a Pallas TPU kernel: all-35-mode intra
prediction + Hadamard SATD with the predictions never leaving VMEM.

The unfused path (ops/intra_mm.predict_all_modes_mm + ops/cost.satd — the
TPU restructuring of the reference's pass-1 SATD loop, TEncSearch.cpp:
2296-2320 over TComPrediction.cpp:183-457 and TComRdCost.cpp:1549-1795)
materializes a [M, 35, n, n] prediction tensor in HBM and reads it back
for the Hadamard transform: for a 416x240 frame at n=8 that is ~112 MB of
intermediate traffic per batch — pure HBM-bandwidth waste, since only the
[M, 35] costs survive. This kernel runs the whole chain per (M-tile, mode)
grid cell inside VMEM:

    acc  = refs @ P_mode          (MXU; exact bf16-limb integer matmul)
    pred = acc >> shift
    diff = pred - orig
    t    = diff @ (Hbd (x) Hbd)   (MXU; vec(H D H^T) = (H(x)H) vec(D))
    cost = sum over 8x8 subblocks of (sum|t| + 2) >> 2

where Hbd is the block-diagonal 8x8 Hadamard (so one [n^2, n^2] matmul
transforms every 8x8 subblock at once) and P is intra_mm's static
prediction tensor. Exactness: every operand is an integer <= 255 —
bf16-exact — and every dot product stays < 2^24, so f32 accumulation is
integer-exact end to end (same argument as intra_mm.prediction_tensor).

The DC/VER/HOR boundary patches (TComPrediction.cpp:183-228, luma n < 32)
are *nonlinear* in the references, so those three modes are recomputed
exactly by the caller (dense_mode_costs) and overwrite the kernel's three
columns — 3/35 of the work, on tiny [M, n, n] tensors.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from hevctpu import rom
from hevctpu.ops import cost, intra, intra_mm

# M-tile rows per grid step, by block size.
_TM = {4: 256, 8: 256, 16: 128, 32: 64}
# Modes per grid step: MG*n^2 must be lane-aligned (divisible by 128) so the
# P-matrix block shape is legal; the out block is one 128-lane group per step.
_MG = {4: 8, 8: 6, 16: 5, 32: 5}


@functools.lru_cache(maxsize=None)
def _kron_hadamard(n: int) -> np.ndarray:
    """(Hbd (x) Hbd) [n^2, n^2] for row-major vec: Hbd = blockdiag of 8x8
    Sylvester Hadamards (4x4 for n=4), so diff_flat @ kron applies
    H8 D_ab H8^T to every 8x8 subblock in one matmul (Hbd symmetric)."""
    k = min(n, 8)
    h = np.array([[1]], dtype=np.int64)
    while h.shape[0] < k:
        h = np.block([[h, h], [h, -h]])
    hbd = np.kron(np.eye(n // k, dtype=np.int64), h)
    return np.kron(hbd, hbd).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _subblock_group(n: int) -> np.ndarray:
    """0/1 matrix [n^2, (n/8)^2] mapping flat pixel -> 8x8 subblock id."""
    k = min(n, 8)
    s = n // k
    g = np.zeros((n * n, s * s), dtype=np.float32)
    for y in range(n):
        for x in range(n):
            g[y * n + x, (y // k) * s + (x // k)] = 1.0
    return g


def _make_kernel(n: int, shift: int, mg: int):
    n2 = n * n
    rshift = 1 if n == 4 else 2
    round_ = 1 if n == 4 else 2

    def kernel(refs_ref, orig_ref, p_ref, kron_ref, g_ref, out_ref):
        acc = jnp.dot(refs_ref[:], p_ref[:],
                      preferred_element_type=jnp.float32)       # [tm, mg*n2]
        pred = acc.astype(jnp.int32) >> shift
        orig = orig_ref[:]
        cols = []
        for mi in range(mg):
            diff = (pred[:, mi * n2: (mi + 1) * n2]
                    - orig).astype(jnp.bfloat16)
            t = jnp.dot(diff, kron_ref[:],
                        preferred_element_type=jnp.float32)
            # |t| <= 64*255 exceeds bf16's exact-int range: group in f32.
            s = jnp.dot(jnp.abs(t), g_ref[:],
                        preferred_element_type=jnp.float32)
            sb = (s.astype(jnp.int32) + round_) >> rshift
            cols.append(jnp.sum(sb, axis=-1, keepdims=True))
        zero = jnp.zeros((acc.shape[0], 128 - mg), jnp.int32)
        out_ref[:] = jnp.concatenate(cols + [zero], axis=-1)
    return kernel


def mode_satd_costs(refs: jnp.ndarray, orig_flat: jnp.ndarray, n: int, *,
                    is_luma: bool = True, interpret: bool = False):
    """SATD of all 35 modes, fused. refs [M, K] int32 (intra_mm layout:
    top_ext | left_ext | top_f | left_f | 1), orig_flat [M, n*n] int32.
    Returns [M, 35] int32 (DC/VER/HOR columns unpatched for luma n<32)."""
    pmat, shift = intra_mm._pred_matrix_bf16(n, is_luma)
    k = pmat.shape[0]
    m = refs.shape[0]
    tm, mg = _TM[n], _MG[n]
    ng = -(-35 // mg)                     # mode groups (grid dim 1)
    mp = -(-m // tm) * tm
    refs_p = jnp.pad(refs, ((0, mp - m), (0, 0))).astype(jnp.bfloat16)
    orig_p = jnp.pad(orig_flat, ((0, mp - m), (0, 0)))
    n2 = n * n
    s2 = (max(n // 8, 1)) ** 2
    pmat_p = np.pad(pmat, ((0, 0), (0, (ng * mg - 35) * n2)))

    out = pl.pallas_call(
        _make_kernel(n, shift, mg),
        grid=(mp // tm, ng),
        in_specs=[
            pl.BlockSpec((tm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, n2), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, mg * n2), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, n2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n2, s2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, 128), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, ng * 128), jnp.int32),
        interpret=interpret,
    )(refs_p, orig_p,
      jnp.asarray(pmat_p, jnp.bfloat16),
      jnp.asarray(_kron_hadamard(n), jnp.bfloat16),
      jnp.asarray(_subblock_group(n)))
    costs = out.reshape(mp, ng, 128)[:m, :, :mg].reshape(m, ng * mg)
    return costs[:, :35]


def _patch_mode_costs(costs, top_ext, left_ext, blocks, n, bit_depth=8):
    """Recompute DC/VER/HOR exactly (with the 8.4.4.2.5/6 boundary
    filters) and overwrite those three cost columns. All inputs [M, ...]."""
    log2 = int(np.log2(n))
    maxv = (1 << bit_depth) - 1
    corner = top_ext[..., 0:1]
    t_u = top_ext[..., 1: n + 1]
    l_u = left_ext[..., 1: n + 1]

    # DC + [1 3]/4 edge filter (TComPrediction.cpp:183-228).
    dc = (jnp.sum(t_u, -1) + jnp.sum(l_u, -1) + n) >> (log2 + 1)
    dcb = jnp.broadcast_to(dc[..., None, None], dc.shape + (n, n))
    row0 = (t_u + 3 * dc[..., None] + 2) >> 2
    col0 = (l_u + 3 * dc[..., None] + 2) >> 2
    pdc = dcb.at[..., 0, :].set(row0)
    pdc = pdc.at[..., 1:, 0].set(col0[..., 1:])
    pdc = pdc.at[..., 0, 0].set((l_u[..., 0] + 2 * dc + t_u[..., 0] + 2) >> 2)

    # VER (26): columns of top, col 0 gradient-corrected.
    pver = jnp.broadcast_to(t_u[..., None, :], t_u.shape[:-1] + (n, n))
    colv = jnp.clip(top_ext[..., 1:2] + ((l_u - corner) >> 1), 0, maxv)
    pver = pver.at[..., :, 0].set(colv)

    # HOR (10): rows of left, row 0 gradient-corrected.
    phor = jnp.broadcast_to(l_u[..., :, None], l_u.shape[:-1] + (n, n))
    rowh = jnp.clip(left_ext[..., 1:2] + ((t_u - corner) >> 1), 0, maxv)
    phor = phor.at[..., 0, :].set(rowh)

    preds = jnp.stack([pdc, phor, pver], axis=-3)        # [M, 3, n, n]
    c3 = cost.satd(preds, blocks[..., None, :, :])       # [M, 3]
    costs = costs.at[..., rom.DC_IDX].set(c3[..., 0])
    costs = costs.at[..., rom.HOR_IDX].set(c3[..., 1])
    costs = costs.at[..., rom.VER_IDX].set(c3[..., 2])
    return costs


def dense_mode_costs(top_ext, left_ext, top_f, left_f, blocks, n: int, *,
                     is_luma: bool = True, interpret: bool = False):
    """Drop-in fused equivalent of predict_all_modes_mm + cost.satd.

    ext arrays [..., 2n+1], blocks [..., n, n] int32; out [..., 35] int32,
    bit-identical to the unfused path (patched modes recomputed exactly).
    """
    lead = blocks.shape[:-2]
    m = int(np.prod(lead)) if lead else 1
    ones = jnp.ones(lead + (1,), jnp.int32)
    refs = jnp.concatenate([top_ext, left_ext, top_f, left_f, ones], axis=-1)
    costs = mode_satd_costs(refs.reshape(m, -1),
                            blocks.reshape(m, n * n).astype(jnp.int32),
                            n, is_luma=is_luma, interpret=interpret)
    costs = costs.reshape(lead + (35,))
    if is_luma and n < 32:
        costs = _patch_mode_costs(costs, top_ext, left_ext,
                                  blocks.astype(jnp.int32), n)
    return costs
