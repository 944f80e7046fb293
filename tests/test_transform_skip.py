"""Transform-skip (4x4 TUs) tests.

The reference operating point enables TS + RDOQTS
(encoder_intra_main.cfg:36-37; TComTrQuant xTransformSkip,
TComTrQuant.cpp:2011; the RD trial loop TEncSearch.cpp:1519-1549). The
encoder tries TS per 4x4 TU in the wavefront stage; the flag is the first
element of residual_coding (7.3.8.11).
"""

import os
import subprocess

import numpy as np
import pytest

from hevctpu import native
from hevctpu.codec import decoder as dec
from hevctpu.codec import headers
from hevctpu.codec.syntax import SliceDecoder, SliceEncoder
from hevctpu.models import convnet2
from hevctpu.pipeline.encoder import FrameEncoder

HM_DECODER = os.environ.get("HM_DECODER", "/tmp/hm/bin/TAppDecoderStatic")


def _screen_clip(b, h, w, seed=3):
    """Sharp sign-pattern content where skipping the transform wins."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.stack([
        (128 + 90 * np.sign(np.sin(yy * 0.8 + i) * np.cos(xx * 0.7))
         + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.int32)
        for i in range(b)])
    u = rng.integers(90, 170, (b, h // 2, w // 2)).astype(np.int32)
    v = rng.integers(60, 200, (b, h // 2, w // 2)).astype(np.int32)
    n_ctu = -(-h // 64) * -(-w // 64)
    lab = np.asarray(convnet2.assemble_ctu_labels(
        rng.integers(2, 4, (b, n_ctu, 4, 4))))
    return y, u, v, lab


@pytest.fixture(scope="module")
def encoded():
    h, w, qp = 128, 192, 32
    y, u, v, lab = _screen_clip(2, h, w)
    enc = FrameEncoder(h, w, qp)
    out = enc.encode(y, u, v, lab)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp)
    return cfg, out


def test_ts_fires(encoded):
    cfg, out = encoded
    assert out["ts4_y"].any() or out["ts8_u"].any() or out["ts8_v"].any(), \
        "transform-skip never chosen on screen content"


def test_ts_mirror_roundtrip(encoded):
    cfg, out = encoded
    rbsp = SliceEncoder(cfg, out, 0).encode()
    hdr = headers.write_slice_header(cfg).data()
    sd = SliceDecoder(cfg, rbsp, len(hdr)).decode()
    np.testing.assert_array_equal(sd.levels[0], out["levels_y"][0])
    np.testing.assert_array_equal(sd.ts4, out["ts4_y"][0])
    np.testing.assert_array_equal(sd.ts_c[1], out["ts8_u"][0])
    np.testing.assert_array_equal(sd.ts_c[2], out["ts8_v"][0])


def test_ts_full_decode_matches_recon(encoded):
    cfg, out = encoded
    stream = dec.encode_stream(cfg, [out], use_native=False)
    d = dec.Decoder()
    frames = d.decode(stream)
    assert all(d.hashes_ok)
    for i, (ry, ru, rv) in enumerate(frames):
        assert (ry == out["recon_y"][i]).all()
        assert (ru == out["recon_u"][i]).all()
        assert (rv == out["recon_v"][i]).all()


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_ts_native_matches_python(encoded):
    cfg, out = encoded
    hdr = headers.write_slice_header(cfg).data()
    for i in range(2):
        golden = SliceEncoder(cfg, out, i).encode()
        got = native.encode_slice_data(
            cfg.width, cfg.height, cfg.qp, out, i,
            max_tu_depth=cfg.max_tu_depth_intra,
            transform_skip=cfg.transform_skip)
        assert got == golden[len(hdr):], i


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM oracle not built")
def test_ts_hm_decoder_agrees(encoded, tmp_path):
    cfg, out = encoded
    stream = dec.encode_stream(cfg, [out])
    bs = tmp_path / "ts.bin"
    bs.write_bytes(stream)
    dec_yuv = tmp_path / "ts.yuv"
    r = subprocess.run([HM_DECODER, "-b", str(bs), "-o", str(dec_yuv)],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "ERROR" not in r.stdout
    h, w = cfg.height, cfg.width
    raw = np.frombuffer(dec_yuv.read_bytes(), np.uint8)
    fs = h * w * 3 // 2
    for i in range(2):
        fy = raw[i * fs: i * fs + h * w].reshape(h, w)
        assert (fy == out["recon_y"][i]).all(), f"frame {i}"


def test_ts_off_config_roundtrips():
    h, w, qp = 64, 128, 32
    y, u, v, lab = _screen_clip(1, h, w, seed=9)
    enc = FrameEncoder(h, w, qp, ts=False)
    out = enc.encode(y, u, v, lab)
    assert "ts4_y" not in out
    cfg = headers.StreamConfig(width=w, height=h, qp=qp,
                               transform_skip=False)
    stream = dec.encode_stream(cfg, [out], use_native=False)
    d = dec.Decoder()
    d.decode(stream)
    assert all(d.hashes_ok)
