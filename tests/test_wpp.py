"""WPP (entropy_coding_sync) bitstream support.

The encoder's reconstruction has always been a wavefront; this is its
bitstream form (VERDICT r4 missing item 5): one CABAC substream per CTU
row, contexts synced from the row above's second CTU (9.3.1,
TEncSlice.cpp:1118-1141), entry-point offsets in the slice header
(7.3.6.1, TEncCavlc::codeTilesWPPEntryPoint). With cu_qp_delta, the
first quantization group of each row predicts from SliceQpY (8.6.1).
"""

import os
import subprocess

import numpy as np
import pytest

from hevctpu.codec import headers
from hevctpu.codec import decoder as streamlib
from hevctpu.codec.decoder import Decoder
from hevctpu.pipeline.encoder import FrameEncoder

HM_DECODER = os.environ.get("HM_DECODER", "/tmp/hm/bin/TAppDecoderStatic")


def _clip(b, h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.stack([(128 + 70 * np.sin(yy / 6) * np.cos(xx / 9)
                   + rng.normal(0, 8, (h, w))).clip(0, 255).astype(np.int32)
                  for _ in range(b)])
    u = np.stack([(128 + 40 * np.cos(yy[::2, ::2] / 9)).astype(np.int32)] * b)
    v = rng.integers(60, 200, (b, h // 2, w // 2)).astype(np.int32)
    return y, u, v


@pytest.fixture(scope="module")
def encoded():
    h, w, qp = 192, 256, 32          # 3x4 CTU grid: real row sync
    y, u, v = _clip(1, h, w)
    enc = FrameEncoder(h, w, qp, search="rd")
    out = enc.encode(y, u, v)
    rng = np.random.default_rng(11)
    qmap = rng.integers(qp - 3, qp + 4,
                        (1, enc.geom.rc, enc.geom.cc)).astype(np.int32)
    out_q = enc.encode(y, u, v, qp_map=qmap)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp, wpp=True)
    cfg_q = headers.StreamConfig(width=w, height=h, qp=qp, wpp=True,
                                 cu_qp_delta=True)
    return (cfg, out, streamlib.encode_stream(cfg, [out]),
            cfg_q, out_q, streamlib.encode_stream(cfg_q, [out_q]))


def test_wpp_roundtrip(encoded):
    cfg, out, stream, *_ = encoded
    d = Decoder()
    frames = d.decode(stream)
    assert all(d.hashes_ok)
    assert (frames[0][0] == out["recon_y"][0]).all()
    assert (frames[0][1] == out["recon_u"][0]).all()


def test_wpp_entry_points_parse(encoded):
    cfg, _, stream, *_ = encoded
    from hevctpu.codec import bitio
    nals = {t: r for t, _tid, r in bitio.split_annexb(stream)}
    pps = headers.parse_pps(nals[headers.NAL_PPS])
    assert pps["wpp"]
    sps = headers.parse_sps(nals[headers.NAL_SPS])
    sh = headers.parse_slice_header(nals[headers.NAL_IDR_W_RADL], sps, pps,
                                    headers.NAL_IDR_W_RADL)
    assert len(sh["entry_points"]) == cfg.height // 64 + \
        (1 if cfg.height % 64 else 0) - 1
    assert all(e > 0 for e in sh["entry_points"])


def test_wpp_with_cu_qp_delta(encoded):
    *_, cfg_q, out_q, stream_q = encoded
    d = Decoder()
    frames = d.decode(stream_q)
    assert all(d.hashes_ok)
    assert (frames[0][0] == out_q["recon_y"][0]).all()


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM oracle not built (tools/build_hm_oracle.sh)")
@pytest.mark.parametrize("which", ["plain", "cuqp"])
def test_hm_decoder_agrees(encoded, tmp_path, which):
    cfg, out, stream, cfg_q, out_q, stream_q = encoded
    out, stream = (out, stream) if which == "plain" else (out_q, stream_q)
    h, w = cfg.height, cfg.width
    bs = tmp_path / "wpp.bin"
    yuv = tmp_path / "wpp.yuv"
    bs.write_bytes(stream)
    r = subprocess.run([HM_DECODER, "-b", str(bs), "-o", str(yuv)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "(OK)" in r.stdout
    rec = np.fromfile(yuv, np.uint8)
    fs = h * w + 2 * (h // 2) * (w // 2)
    assert (rec[:h * w].reshape(h, w) == out["recon_y"][0]).all()
