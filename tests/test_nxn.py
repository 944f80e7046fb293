"""PART_NxN at depth 3: four 4x4 DST luma TUs with per-PU modes.

The reference evaluates NxN alongside 2Nx2N at max depth
(TEncCu.cpp:815-827); these tests force depth-3 partitions on detailed
content so the NxN decision actually fires, then require (a) our
verification decoder reproduces the reconstruction bit-exactly, (b) the
native C++ entropy coder stays byte-identical to the Python golden, and
(c) the HM 16.20 reference decoder agrees (in test_conformance style).
"""

import os
import subprocess

import numpy as np
import pytest

from hevctpu import native
from hevctpu.codec import decoder as dec
from hevctpu.codec import headers
from hevctpu.codec.syntax import SliceDecoder, SliceEncoder
from hevctpu.pipeline.encoder import FrameEncoder

HM_DECODER = os.environ.get("HM_DECODER", "/tmp/hm/bin/TAppDecoderStatic")


def _detail_frames(h, w, b, seed=0):
    """High-detail content: NxN wins often at depth 3."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.stack([
        (128 + 55 * np.sign(np.sin(yy * 1.1 + i) * np.cos(xx * 0.9))
         + rng.normal(0, 12, (h, w))).clip(0, 255).astype(np.int64)
        for i in range(b)])
    u = rng.integers(90, 170, (b, h // 2, w // 2))
    v = rng.integers(60, 200, (b, h // 2, w // 2))
    return y, u, v


@pytest.fixture(scope="module")
def encoded():
    h, w, qp = 64, 128, 27
    y, u, v = _detail_frames(h, w, 1, seed=5)
    labels = np.full((1, 2, 16), 3, np.int32)  # all depth 3
    enc = FrameEncoder(h, w, qp)
    out = enc.encode(y, u, v, labels)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp)
    return cfg, out


def test_nxn_fires_and_roundtrips(encoded):
    cfg, out = encoded
    assert out["nxn8"].any(), "NxN never chosen on detail content"
    # per-PU modes differ somewhere inside an NxN CU
    m4 = out["mode4"][0]
    nx = np.repeat(np.repeat(out["nxn8"][0], 2, 0), 2, 1)
    blocks = m4[nx].reshape(-1)
    assert len(set(blocks.tolist())) > 1

    rbsp = SliceEncoder(cfg, out, 0).encode()
    hdr = headers.write_slice_header(cfg).data()
    sd = SliceDecoder(cfg, rbsp, len(hdr)).decode()
    np.testing.assert_array_equal(sd.levels[0], out["levels_y"][0])
    np.testing.assert_array_equal(sd.mode4, out["mode4"][0])
    np.testing.assert_array_equal(sd.nxn8, out["nxn8"][0])


def test_nxn_full_decode_matches_recon(encoded):
    cfg, out = encoded
    stream = dec.encode_stream(cfg, [out], use_native=False)
    (ry, ru, rv), = dec.Decoder().decode(stream)
    assert (ry == out["recon_y"][0]).all(), \
        int((ry != out["recon_y"][0]).sum())
    assert (ru == out["recon_u"][0]).all()
    assert (rv == out["recon_v"][0]).all()


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
def test_nxn_native_matches_python(encoded):
    cfg, out = encoded
    hdr = headers.write_slice_header(cfg).data()
    golden = SliceEncoder(cfg, out, 0).encode()
    got = native.encode_slice_data(cfg.width, cfg.height, cfg.qp, out, 0,
                                   max_tu_depth=cfg.max_tu_depth_intra,
            transform_skip=cfg.transform_skip)
    assert got == golden[len(hdr):]


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM oracle not built")
def test_nxn_hm_decoder_agrees(encoded, tmp_path):
    cfg, out = encoded
    stream = dec.encode_stream(cfg, [out])
    bs = tmp_path / "nxn.bin"
    bs.write_bytes(stream)
    dec_yuv = tmp_path / "nxn.yuv"
    r = subprocess.run([HM_DECODER, "-b", str(bs), "-o", str(dec_yuv)],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, (r.stdout, r.stderr)
    h, w = cfg.height, cfg.width
    raw = np.frombuffer(dec_yuv.read_bytes(), np.uint8)
    got_y = raw[: h * w].reshape(h, w)
    assert (got_y == out["recon_y"][0]).all()
    got_u = raw[h * w: h * w * 5 // 4].reshape(h // 2, w // 2)
    got_v = raw[h * w * 5 // 4:].reshape(h // 2, w // 2)
    assert (got_u == out["recon_u"][0]).all()
    assert (got_v == out["recon_v"][0]).all()


def test_rd_search_with_nxn_decodes():
    h, w, qp = 64, 64, 32
    y, u, v = _detail_frames(h, w, 1, seed=8)
    enc = FrameEncoder(h, w, qp, search="rd")
    out = enc.encode(y, u, v)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp)
    stream = dec.encode_stream(cfg, [out])
    (ry, _, _), = dec.Decoder().decode(stream)
    assert (ry == out["recon_y"][0]).all()
