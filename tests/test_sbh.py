"""Sign-data-hiding: encoder parity fix (ops/quant.sign_bit_hide) +
syntax round-trip of the hidden sign."""

import numpy as np
import jax.numpy as jnp
import pytest

from hevctpu import rom
from hevctpu.codec import decoder as dec
from hevctpu.codec import headers
from hevctpu.codec.syntax import SliceDecoder, SliceEncoder
from hevctpu.ops import quant
from tests.test_roundtrip import _synth_frames


def _cg_parity_ok(lvl, scan_idx):
    """Check the SBH invariant on one [N, N] level block."""
    n = lvl.shape[-1]
    order = rom.scan_order(scan_idx, 4)
    pos = np.zeros((4, 4), np.int32)
    for i, (yy, xx) in enumerate(order):
        pos[yy, xx] = i
    for cy in range(n // 4):
        for cx in range(n // 4):
            cg = lvl[4 * cy: 4 * cy + 4, 4 * cx: 4 * cx + 4]
            nzp = pos[cg != 0]
            if len(nzp) == 0 or nzp.max() - nzp.min() <= 3:
                continue
            first_val = cg[pos == nzp.min()][0]
            want_neg = (np.abs(cg).sum() & 1) == 1
            if want_neg != (first_val < 0):
                return False
    return True


@pytest.mark.parametrize("log2", [2, 3, 4, 5])
@pytest.mark.parametrize("scan", [0, 1, 2])
def test_parity_invariant(log2, scan):
    if scan != 0 and log2 > 3:
        pytest.skip("hor/ver scans only exist for 4x4/8x8")
    n = 1 << log2
    qp = 27
    rng = np.random.default_rng(log2 * 10 + scan)
    coef = rng.integers(-4000, 4000, (64, n, n)).astype(np.int32)
    lvl = quant.quantize(jnp.asarray(coef), log2, qp)
    fixed = np.asarray(quant.sign_bit_hide(
        lvl, jnp.asarray(coef), log2, qp,
        jnp.full((64,), scan, jnp.int32)))
    base = np.asarray(lvl)
    for b in range(64):
        assert _cg_parity_ok(fixed[b], scan), b
        # the fix changes at most one level per CG, by one
        diff = np.abs(fixed[b].astype(np.int64) - base[b])
        assert diff.max() <= 1
        ncg = n // 4
        d4 = diff.reshape(ncg, 4, ncg, 4).sum(axis=(1, 3))
        assert d4.max() <= 1


def test_scan_sel_matches_rom():
    modes = jnp.arange(35)
    for log2 in (2, 3, 4):
        for is_luma in (True, False):
            got = np.asarray(quant.scan_sel(modes, log2, is_luma))
            want = [rom.coef_scan_idx(m, log2, is_luma) for m in range(35)]
            np.testing.assert_array_equal(got, want)


def test_syntax_roundtrip_with_sbh():
    """Full pipeline levels (parity-fixed) survive the CABAC round trip
    with sign_data_hiding on, and hidden signs are actually exercised."""
    from hevctpu.pipeline.encoder import FrameEncoder

    h, w, qp = 64, 128, 27
    y, u, v = _synth_frames(h, w, 1, seed=11)
    labels = np.full((1, 2, 16), 2, np.int32)
    out = FrameEncoder(h, w, qp).encode(y, u, v, labels)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp)
    assert cfg.sign_data_hiding
    rbsp = SliceEncoder(cfg, out, 0).encode()
    hdr = headers.write_slice_header(cfg).data()
    sd = SliceDecoder(cfg, rbsp, len(hdr)).decode()
    np.testing.assert_array_equal(sd.levels[0], out["levels_y"][0])
    np.testing.assert_array_equal(sd.levels[1], out["levels_u"][0])
    np.testing.assert_array_equal(sd.levels[2], out["levels_v"][0])
    # stream must be smaller than without SBH (hidden signs saved bits)
    import dataclasses
    cfg_off = dataclasses.replace(cfg, sign_data_hiding=False)
    rbsp_off = SliceEncoder(cfg_off, out, 0).encode()
    assert len(rbsp) < len(rbsp_off)


def test_full_decoder_with_sbh():
    from hevctpu.pipeline.encoder import FrameEncoder

    h, w, qp = 64, 64, 32
    y, u, v = _synth_frames(h, w, 1, seed=13)
    labels = np.full((1, 1, 16), 1, np.int32)
    out = FrameEncoder(h, w, qp).encode(y, u, v, labels)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp)
    stream = dec.encode_stream(cfg, [out])
    (ry, ru, rv), = dec.Decoder().decode(stream)
    assert (ry == out["recon_y"][0]).all()
    assert (ru == out["recon_u"][0]).all()
    assert (rv == out["recon_v"][0]).all()
