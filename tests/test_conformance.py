"""Conformance against the real HM 16.20 reference decoder.

The reference's de-facto integration test is "the bitstream decodes on the
bundled HM decoder and reconstruction matches" (decoded-picture-hash
discipline, TEncGOP.cpp:1948). Here we literally run the HM decoder
(built by tools/build_hm_oracle.sh) on our encoder's output and require a
byte-exact reconstruction match. Skipped when the oracle binary is absent.
"""

import os
import subprocess

import numpy as np
import pytest

from hevctpu.codec import decoder as streamlib
from hevctpu.codec import headers
from hevctpu.pipeline.encoder import FrameEncoder

HM_DECODER = os.environ.get("HM_DECODER", "/tmp/hm/bin/TAppDecoderStatic")

pytestmark = pytest.mark.skipif(
    not os.path.exists(HM_DECODER),
    reason="HM oracle not built (tools/build_hm_oracle.sh)")


@pytest.mark.parametrize("qp", [22, 32, 42])
def test_hm_decoder_matches_recon(tmp_path, qp):
    h, w = 64, 128
    rng = np.random.default_rng(qp)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 70 * np.sin(yy / 5.0) * np.cos(xx / 9.0)
         + rng.normal(0, 5, (h, w))).clip(0, 255).astype(np.int64)[None]
    u = (128 + 40 * np.cos(yy[::2, ::2] / 7.0)).astype(np.int64)[None]
    v = rng.integers(60, 200, (1, h // 2, w // 2))
    labels = rng.integers(0, 4, (1, 2, 16))

    enc = FrameEncoder(h, w, qp)
    out = enc.encode(y, u, v, labels)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp)
    stream = streamlib.encode_stream(cfg, [out])
    bs = tmp_path / "t.bin"
    bs.write_bytes(stream)

    dec_yuv = tmp_path / "t.yuv"
    r = subprocess.run([HM_DECODER, "-b", str(bs), "-o", str(dec_yuv)],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, (r.stdout, r.stderr)

    raw = np.frombuffer(dec_yuv.read_bytes(), np.uint8)
    assert raw.size == h * w * 3 // 2
    got_y = raw[: h * w].reshape(h, w)
    got_u = raw[h * w: h * w * 5 // 4].reshape(h // 2, w // 2)
    got_v = raw[h * w * 5 // 4:].reshape(h // 2, w // 2)
    assert (got_y == out["recon_y"][0]).all()
    assert (got_u == out["recon_u"][0]).all()
    assert (got_v == out["recon_v"][0]).all()


HM_ENCODER = os.environ.get("HM_ENCODER", "/tmp/hm/bin/TAppEncoderStatic")


@pytest.mark.skipif(not os.path.exists(HM_ENCODER),
                    reason="HM oracle encoder not built")
@pytest.mark.parametrize("qp", [27, 32])
def test_our_decoder_decodes_hm_anchor_stream(tmp_path, qp):
    """The reverse oracle direction: OUR decoder must decode the HM
    anchor's own All-Intra output (IDR + CRA pictures, RPS-bearing SPS,
    MD5 hash SEIs — TEncCavlc/TEncGOP header choices) and reproduce HM's
    reconstruction bit-exactly (VERDICT r4 item 5; TDecCAVLC.cpp /
    TDecSlice.cpp:71 role)."""
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from measure_anchor import run_hm

    from hevctpu.pipeline.clips import make_clip, write_yuv

    h, w, n = 240, 416, 2
    y, u, v = make_clip("pink", n, h, w)
    yuv = tmp_path / "in.yuv"
    write_yuv(str(yuv), y, u, v)
    run_hm(HM_ENCODER, str(yuv), w, h, n, qp, str(tmp_path))

    stream = (tmp_path / f"q{qp}.bin").read_bytes()
    d = streamlib.Decoder()
    d.decode(stream)
    assert len(d.frames) == n
    assert d.hashes_ok == [True] * n      # MD5 SEIs verified

    rec = np.fromfile(tmp_path / f"q{qp}.yuv", np.uint8)
    fs = h * w * 3 // 2
    for i, (ry, ru, rv) in enumerate(d.frames):
        fr = rec[i * fs: (i + 1) * fs]
        assert np.array_equal(ry, fr[: h * w].reshape(h, w))
        assert np.array_equal(
            ru, fr[h * w: h * w * 5 // 4].reshape(h // 2, w // 2))
        assert np.array_equal(
            rv, fr[h * w * 5 // 4:].reshape(h // 2, w // 2))
