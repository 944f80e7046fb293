"""Dense rate-distortion candidate evaluation for the mode search.

The reference's pass-2 full-RD loop evaluates each intra candidate by
predict -> transform -> quant -> inverse -> reconstruct -> SSE + exact
counting-CABAC rate (TEncSearch::xRecurIntraCodingLumaQT /
xIntraCodingTUBlock, TEncSearch.cpp:1129-1549). TPU-first restatement:
evaluate *every* mode of *every* CU position in one batched pass, with

  * distortion measured in the transform domain — HEVC's integer DCT is
    2^(7-log2N) times an orthonormal transform, so pixel-domain SSE equals
    transform-domain SSE x 4^(log2N-7) up to rounding/clipping (the same
    errScale identity HM's RDOQ rests on, TComTrQuant.cpp:2119ff) — which
    removes the inverse transform + reconstruction from the hot loop, and
  * rate from the stateless estimator (ops/rate.py).

The result is an RD score per (position, mode): pure matmuls + elementwise
ops + reductions, no recursion, no per-candidate control flow.
"""

from __future__ import annotations

import jax.numpy as jnp

from hevctpu.ops import quant, rate, transforms


def mode_rd_costs(preds: jnp.ndarray, orig: jnp.ndarray, log2: int, qp: int,
                  *, lam: float, dst: bool = False, is_luma: bool = True,
                  rate_model: str = "ctx", cbf_ctx: int | None = None):
    """RD cost of coding each candidate prediction.

    preds [..., M, N, N] int32, orig [..., N, N] int32. Returns
    (rd [..., M] float32, bits [..., M] float32 in 1/BITS_ONE units,
    dist [..., M] float32 ~ pixel-domain SSE).

    rate_model "ctx" prices the exact residual bin stream at init context
    states (ops/rate_ctx — the counting-CABAC discipline of the
    reference's FAST_BIT_EST trials); "global" is the per-bin-type
    weight model (ops/rate). cbf_ctx is the cbf flag's context index
    (luma: 1 at CU-root TUs, else 0; chroma: the transform depth).
    """
    res = orig[..., None, :, :] - preds
    coef = transforms.forward_transform(res, log2, dst=dst)
    lvl = quant.quantize(coef, log2, qp)
    deq = quant.dequantize(lvl, log2, qp)
    err = (coef - deq).astype(jnp.float32)
    dscale = 4.0 ** (log2 - 7)
    dist = jnp.sum(err * err, axis=(-2, -1)) * dscale
    if rate_model == "ctx":
        from hevctpu.ops import rate_ctx
        bits = rate_ctx.estimate_tu_bits_ctx(
            lvl, log2, qp, is_luma=is_luma,
            cbf_ctx=1 if cbf_ctx is None and is_luma else (cbf_ctx or 0))
    else:
        bits = rate.estimate_tu_bits(lvl, log2, qp)
    rd = dist + (lam / rate.BITS_ONE) * bits.astype(jnp.float32)
    return rd, bits, dist
