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
