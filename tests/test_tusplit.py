"""Intra TU quadtree split (split_transform_flag) tests.

The reference operating point searches TU splits to depth 3
(encoder_intra_main.cfg:26-29; TEncSearch::xRecurIntraCodingLumaQT,
TEncSearch.cpp:1430-1448). These tests cover the dense TU-tree decision,
the per-slot leaf map's legality, the syntax roundtrip through the mirror
decoder, native-coder byte parity, and HM-oracle conformance (TU-split
streams are real HEVC, including TU-edge deblocking, 8.7.2).
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


def _clip(b, h, w, seed=1):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.stack([
        (128 + 70 * np.sin(yy / 6) * np.cos(xx / 9)
         + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.int32)
        for _ in range(b)])
    u = np.stack([(128 + 40 * np.cos(yy[::2, ::2] / 9)).astype(np.int32)] * b)
    v = rng.integers(60, 200, (b, h // 2, w // 2)).astype(np.int32)
    lab = np.asarray(convnet2.assemble_ctu_labels(
        rng.integers(0, 4, (b, (h // 64 + (h % 64 > 0))
                            * (w // 64 + (w % 64 > 0)), 4, 4))))
    return y, u, v, lab


@pytest.fixture(scope="module")
def encoded():
    h, w, qp = 128, 192, 27
    y, u, v, lab = _clip(2, h, w)
    enc = FrameEncoder(h, w, qp)
    out = enc.encode(y, u, v, lab)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp)
    return cfg, out


def test_tusz_map_legal(encoded):
    cfg, out = encoded
    tz = out["tusz8"]
    assert ((tz >= 2) & (tz <= 5)).all()
    b, h8, w8 = tz.shape
    for i in range(b):
        for sy in range(h8):
            for sx in range(w8):
                s = int(tz[i, sy, sx])
                if s <= 3:
                    continue
                step = 1 << (s - 3)
                oy, ox = (sy // step) * step, (sx // step) * step
                blkvals = tz[i, oy: oy + step, ox: ox + step]
                # a TU of size s must tile aligned and cover its block
                assert (blkvals == s).all(), (i, sy, sx, s)
                # the TU may not cross its CU: depth inside must be uniform
                d = out["depth8"][i, oy: oy + step, ox: ox + step]
                assert (d == d[0, 0]).all()
                assert 6 - int(d[0, 0]) >= s  # TU <= CU
                # CU64's depth budget stops at TU8 (MaxTrafoDepth = 3)
    # somewhere there must be an actual split (TU < CU) or the test clip
    # is too easy to exercise the feature
    cu_log2 = np.minimum(6 - out["depth8"], 5)
    assert (tz < cu_log2).any() | out["nxn8"].any()


def test_mirror_decoder_roundtrip(encoded):
    cfg, out = encoded
    rbsp = SliceEncoder(cfg, out, 0).encode()
    hdr = headers.write_slice_header(cfg).data()
    sd = SliceDecoder(cfg, rbsp, len(hdr)).decode()
    np.testing.assert_array_equal(sd.levels[0], out["levels_y"][0])
    np.testing.assert_array_equal(sd.tusz8, out["tusz8"][0])
    np.testing.assert_array_equal(sd.cbf4, out["cbf4_y"][0])


def test_full_decode_matches_recon(encoded):
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
def test_native_matches_python(encoded):
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
@pytest.mark.parametrize("qp", [22, 32])
def test_hm_decoder_agrees(tmp_path, qp):
    h, w = 128, 192
    y, u, v, lab = _clip(2, h, w, seed=qp)
    enc = FrameEncoder(h, w, qp)
    out = enc.encode(y, u, v, lab)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp)
    stream = dec.encode_stream(cfg, [out])
    bs = tmp_path / "tus.bin"
    bs.write_bytes(stream)
    dec_yuv = tmp_path / "tus.yuv"
    r = subprocess.run([HM_DECODER, "-b", str(bs), "-o", str(dec_yuv)],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert "ERROR" not in r.stdout
    raw = np.frombuffer(dec_yuv.read_bytes(), np.uint8)
    fs = h * w + 2 * (h // 2) * (w // 2)
    for i in range(2):
        fy = raw[i * fs: i * fs + h * w].reshape(h, w)
        assert (fy == out["recon_y"][i]).all(), f"frame {i} luma"
