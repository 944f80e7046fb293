"""Fused Pallas stage-1 kernel vs the unfused reference path.

The kernel (ops/satd_fused.py) must be bit-identical to
predict_all_modes_mm + cost.satd — the unfused formulation that is itself
tested against the spec-scalar golden (test_intra_mm.py). Runs the kernel
in interpret mode on CPU."""

import jax.numpy as jnp
import numpy as np
import pytest

from hevctpu.ops import cost, intra, intra_mm, satd_fused


def _rand_inputs(rng, m, n):
    ext = lambda: jnp.asarray(rng.integers(0, 256, (m, 2 * n + 1)), jnp.int32)
    top_e, left_e = ext(), ext()
    top_f, left_f = intra.smooth_reference(top_e, left_e, n)
    blocks = jnp.asarray(rng.integers(0, 256, (m, n, n)), jnp.int32)
    return top_e, left_e, top_f, left_f, blocks


@pytest.mark.parametrize("n", [4, 8, 16, 32])
@pytest.mark.parametrize("is_luma", [True, False])
def test_fused_matches_unfused(n, is_luma):
    rng = np.random.default_rng(n)
    m = 37  # deliberately not a tile multiple
    top_e, left_e, top_f, left_f, blocks = _rand_inputs(rng, m, n)

    want_pred = intra_mm.predict_all_modes_mm(
        top_e, left_e, top_f, left_f, n, is_luma=is_luma)
    want = np.asarray(cost.satd(want_pred, blocks[:, None]))

    got = np.asarray(satd_fused.dense_mode_costs(
        top_e, left_e, top_f, left_f, blocks, n,
        is_luma=is_luma, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fused_leading_axes():
    rng = np.random.default_rng(7)
    n, shape = 8, (2, 3, 5)
    m = int(np.prod(shape))
    top_e, left_e, top_f, left_f, blocks = _rand_inputs(rng, m, n)
    r = lambda x: x.reshape(shape + x.shape[1:])
    got = satd_fused.dense_mode_costs(
        r(top_e), r(left_e), r(top_f), r(left_f), r(blocks), n,
        interpret=True)
    assert got.shape == shape + (35,)
    want = satd_fused.dense_mode_costs(
        top_e, left_e, top_f, left_f, blocks, n, interpret=True)
    np.testing.assert_array_equal(np.asarray(got).reshape(m, 35),
                                  np.asarray(want))
