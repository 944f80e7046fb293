"""RDOQ validation: the vectorized RD-optimized quantizer must dominate
hard-decision quant on the J = D + λR objective it optimizes (the property
HM's xRateDistOptQuant guarantees by construction)."""

import numpy as np
import pytest

import jax.numpy as jnp

from hevctpu.ops import quant, rate, transforms


def _j_cost(coef, lvl, log2, qp, lam):
    deq = quant.dequantize(lvl, log2, qp)
    err = np.asarray(coef - deq, np.float64)
    d = (err * err).sum(axis=(-2, -1)) * 4.0 ** (log2 - 7)
    bits = np.asarray(rate.estimate_tu_bits(jnp.asarray(lvl), log2),
                      np.float64) / rate.BITS_ONE
    return d + lam * bits


@pytest.mark.parametrize("log2,qp", [(2, 32), (3, 27), (4, 37), (5, 32)])
def test_rdoq_improves_j(log2, qp):
    rng = np.random.default_rng(log2 * 10 + qp)
    n = 1 << log2
    sig = rng.uniform(1, 40, 48)
    res = (rng.normal(0, 1, (48, n, n)) * sig[:, None, None]).astype(np.int32)
    coef = np.asarray(transforms.forward_transform(jnp.asarray(res), log2))
    lam = rate.lambda_rd(qp)

    hdq = np.asarray(quant.quantize(jnp.asarray(coef), log2, qp))
    rdq = np.asarray(quant.quantize_rdoq(jnp.asarray(coef), log2, qp, lam))

    j_hdq = _j_cost(coef, hdq, log2, qp, lam)
    j_rdq = _j_cost(coef, rdq, log2, qp, lam)
    # RDOQ must win on average and essentially never lose badly (the CG
    # decision uses the same estimator, up to csbf/last-pos couplings).
    assert j_rdq.mean() < j_hdq.mean()
    assert (j_rdq <= j_hdq * 1.02 + 1.0).mean() > 0.95
    # levels only move toward zero (candidates are round, round-1, 0).
    assert (np.abs(rdq) <= np.abs(hdq) + 1).all()


def test_rdoq_zero_block():
    z = jnp.zeros((3, 8, 8), jnp.int32)
    out = np.asarray(quant.quantize_rdoq(z, 3, 32, rate.lambda_rd(32)))
    assert (out == 0).all()
