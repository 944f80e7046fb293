"""Rate-estimator validation: the stateless TPU bit estimate must track the
exact CABAC coder closely enough to drive RD decisions.

The reference makes every search decision on *estimated* bits too (counting
CABAC, TEncBinCoderCABACCounter.cpp:63); what matters is rank fidelity
across candidates, not absolute bit counts.
"""

import numpy as np
import pytest

from hevctpu import rom
from hevctpu.codec import headers
from hevctpu.codec.bitio import BitWriter
from hevctpu.codec.cabac import CabacCounter, CabacEncoder, ContextSet
from hevctpu.codec.syntax import SliceEncoder
from hevctpu.ops import quant, rate, transforms


def _true_residual_bits(blk: np.ndarray, log2: int, qp: int,
                        mode: int = 1, comp: int = 0) -> float:
    """Counting-CABAC bits to code one TU's levels (fresh contexts) — the
    same fractional-bit measure HM uses for its own RD decisions."""
    enc = SliceEncoder.__new__(SliceEncoder)
    # minimal harness state: _residual reads cfg.sign_data_hiding; keep it
    # off — estimate_tu_bits models the plain sign-bypass coding and the
    # sampled levels carry no SBH parity fix.
    enc.cfg = headers.StreamConfig(width=64, height=64, qp=qp,
                                   sign_data_hiding=False,
                                   transform_skip=False)
    enc.levels = {comp: blk}
    enc.ctx = ContextSet(qp, init_type=0)
    enc.c = CabacCounter()
    enc._residual(0, 0, log2, comp, mode)
    return enc.c.bits


def _sample_tus(log2: int, qp: int, n_samples: int, seed: int):
    rng = np.random.default_rng(seed)
    n = 1 << log2
    sigmas = rng.uniform(1.0, 60.0, n_samples)
    res = rng.normal(0, 1, (n_samples, n, n)) * sigmas[:, None, None]
    import jax.numpy as jnp
    coef = transforms.forward_transform(jnp.asarray(res, jnp.int32), log2)
    lvl = np.asarray(quant.quantize(coef, log2, qp))
    return lvl[np.abs(lvl).sum(axis=(1, 2)) > 0]


@pytest.mark.parametrize("log2,qp", [(2, 27), (3, 32), (4, 32), (5, 37),
                                     (3, 22)])
def test_rank_correlation(log2, qp):
    lvl = _sample_tus(log2, qp, 64, seed=log2 * 100 + qp)
    assert len(lvl) >= 16
    import jax.numpy as jnp
    est = np.asarray(rate.estimate_tu_bits(jnp.asarray(lvl), log2),
                     np.float64) / rate.BITS_ONE
    true = np.array([_true_residual_bits(b, log2, qp) for b in lvl])
    # Spearman rank correlation (no scipy dependency).
    def ranks(x):
        r = np.empty_like(x)
        r[np.argsort(x)] = np.arange(len(x))
        return r
    re_, rt = ranks(est), ranks(true)
    rho = np.corrcoef(re_, rt)[0, 1]
    assert rho > 0.97, f"rank corr {rho:.4f}"
    # absolute scale sanity: means within 35%.
    ratio = est.mean() / true.mean()
    assert 0.65 < ratio < 1.35, f"scale ratio {ratio:.3f}"


def test_golomb_rice_exact():
    """golomb_rice_bits must match the spec binarization length exactly."""
    import jax.numpy as jnp

    def ref_len(v, k):
        if (v >> k) < 3:
            return (v >> k) + 1 + k
        v -= 3 << k
        length = k
        while v >= (1 << length):
            v -= 1 << length
            length += 1
        return 3 + (length - k) + 1 + length

    vs = np.arange(0, 4000)
    for k in range(5):
        got = np.asarray(rate.golomb_rice_bits(
            jnp.asarray(vs), jnp.full_like(jnp.asarray(vs), k)))
        want = np.array([ref_len(int(v), k) for v in vs])
        np.testing.assert_array_equal(got, want)


def test_zero_tu_cost():
    import jax.numpy as jnp
    z = jnp.zeros((2, 8, 8), jnp.int32)
    b = np.asarray(rate.estimate_tu_bits(z, 3))
    assert (b == rate.W_CBF0).all()


def _frame_tus(out):
    """Extract every coded luma TU (levels block, log2) from a frame dict,
    walking the per-slot leaf map the entropy coder uses."""
    tz = out["tusz8"][0]
    coded = out["coded8"][0]
    lv = out["levels_y"][0]
    cbf = out["cbf_y"][0]
    cbf4 = out["cbf4_y"][0]
    h8, w8 = tz.shape
    tus = []
    seen = set()
    for sy in range(h8):
        for sx in range(w8):
            if not coded[sy, sx]:
                continue
            s = int(tz[sy, sx])
            if s == 2:
                for q in range(4):
                    qy, qx = sy * 2 + q // 2, sx * 2 + q % 2
                    if cbf4[qy, qx]:
                        tus.append((lv[qy * 4: qy * 4 + 4,
                                       qx * 4: qx * 4 + 4], 2))
                continue
            step = 1 << (s - 3)
            oy, ox = (sy // step) * step, (sx // step) * step
            if (oy, ox, s) in seen:
                continue
            seen.add((oy, ox, s))
            if cbf[oy, ox]:
                n = 1 << s
                tus.append((lv[oy * 8: oy * 8 + n, ox * 8: ox * 8 + n], s))
    return tus


def test_rate_estimate_on_real_frame():
    """Rank fidelity of the stateless estimator on a real encoded frame's
    TU population (not synthetic TUs): the measure that actually drives
    every RD decision in the dense search."""
    import jax
    from hevctpu.models import convnet2
    from hevctpu.pipeline.encoder import FrameEncoder

    h, w, qp = 128, 192, 27
    rng = np.random.default_rng(11)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 70 * np.sin(yy / 6) * np.cos(xx / 9)
         + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.int32)[None]
    u = (128 + 40 * np.cos(yy[::2, ::2] / 9)).astype(np.int32)[None]
    v = rng.integers(60, 200, (1, h // 2, w // 2)).astype(np.int32)
    lab = np.asarray(convnet2.assemble_ctu_labels(
        rng.integers(0, 4, (1, 6, 4, 4))))
    out = FrameEncoder(h, w, qp, sbh=False, ts=False).encode(y, u, v, lab)
    tus = _frame_tus(out)
    assert len(tus) >= 30
    import jax.numpy as jnp
    per_log2 = {}
    for blk, log2 in tus:
        per_log2.setdefault(log2, []).append(np.asarray(blk, np.int32))
    ests, trues = [], []
    for log2, blocks in per_log2.items():
        arr = np.stack(blocks)
        est = np.asarray(rate.estimate_tu_bits(jnp.asarray(arr), log2),
                         np.float64) / rate.BITS_ONE
        true = np.array([_true_residual_bits(b, log2, qp) for b in arr])
        ests.append(est)
        trues.append(true)
    est = np.concatenate(ests)
    true = np.concatenate(trues)

    def ranks(x):
        r = np.empty_like(x)
        r[np.argsort(x)] = np.arange(len(x))
        return r

    rho = np.corrcoef(ranks(est), ranks(true))[0, 1]
    assert rho > 0.95, f"on-frame rank corr {rho:.4f}"
    ratio = est.sum() / true.sum()
    assert 0.7 < ratio < 1.4, f"on-frame scale ratio {ratio:.3f}"


def test_split_cost_model_total_bits():
    """The RD cost model's per-CU overhead constants (encoder.py
    _rd_split_labels: oh_cu, oh_split) plus the TU estimates must predict
    the actual slice payload within a reasonable scale factor — this is
    the model every quadtree split decision leans on."""
    from hevctpu.codec import decoder as streamlib
    from hevctpu.codec.syntax import SliceEncoder
    from hevctpu.models import convnet2
    from hevctpu.pipeline.encoder import FrameEncoder

    h, w, qp = 128, 192, 32
    rng = np.random.default_rng(12)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 70 * np.sin(yy / 6) * np.cos(xx / 9)
         + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.int32)[None]
    u = (128 + 40 * np.cos(yy[::2, ::2] / 9)).astype(np.int32)[None]
    v = rng.integers(60, 200, (1, h // 2, w // 2)).astype(np.int32)
    lab = np.asarray(convnet2.assemble_ctu_labels(
        rng.integers(0, 4, (1, 6, 4, 4))))
    out = FrameEncoder(h, w, qp, sao=False, sbh=False,
                       ts=False).encode(y, u, v, lab)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp, sao=False,
                               sign_data_hiding=False, transform_skip=False)
    actual_bits = len(SliceEncoder(cfg, out, 0).encode()) * 8

    import jax.numpy as jnp
    # predicted: TU residual estimates + per-CU fixed overhead (3.2 bins:
    # chroma mode + cbf flags) + per-PU mode bits (~3.5 avg) + split flags
    tus = _frame_tus(out)
    tu_bits = sum(
        float(np.asarray(rate.estimate_tu_bits(
            jnp.asarray(b[None]), log2))[0]) / rate.BITS_ONE
        for b, log2 in tus)
    # chroma TU bits
    for comp, key in ((1, "levels_u"), (2, "levels_v")):
        cb = out["cbf_" + key[-1]][0]
        lvc = out[key][0]
        tzc = np.maximum(out["tusz8"][0] - 1, 2)
        seen = set()
        for sy in range(cb.shape[0]):
            for sx in range(cb.shape[1]):
                s = int(tzc[sy, sx])
                step = max(1 << (s - 2), 1)
                oy, ox = (sy // step) * step, (sx // step) * step
                if (oy, ox) in seen or not cb[oy, ox]:
                    continue
                seen.add((oy, ox))
                n = 1 << s
                blk = lvc[oy * 4: oy * 4 + n, ox * 4: ox * 4 + n]
                if blk.shape != (n, n) or not blk.any():
                    continue
                tu_bits += float(np.asarray(rate.estimate_tu_bits(
                    jnp.asarray(blk[None].astype(np.int32)), s))[0]
                ) / rate.BITS_ONE
    d8 = out["depth8"][0]
    n_cu = sum(int((d8 == d).sum()) // ((8 >> d) ** 2) for d in range(4))
    predicted = tu_bits + n_cu * (3.2 + 3.5) + n_cu * 0.8
    ratio = predicted / actual_bits
    assert 0.5 < ratio < 2.0, (
        f"cost-model scale off: predicted {predicted:.0f} vs actual "
        f"{actual_bits} bits (ratio {ratio:.2f})")
