"""Prefix-SEI surface + CRA/POC stream shape (SEIEncoder/SEIwrite and
the TEncGOP POC/IRAP plumbing for All-Intra, VERDICT r4 missing items
3/4): active_parameter_sets (D.2.21), recovery_point (D.2.8),
user_data_unregistered (D.2.7), and DecodingRefreshType=1 streams
(IDR then CRA with POC)."""

import os
import subprocess

import numpy as np
import pytest

from hevctpu.codec import headers
from hevctpu.codec import decoder as streamlib
from hevctpu.codec.decoder import Decoder
from hevctpu.pipeline.encoder import FrameEncoder

HM_DECODER = os.environ.get("HM_DECODER", "/tmp/hm/bin/TAppDecoderStatic")


@pytest.fixture(scope="module")
def encoded():
    rng = np.random.default_rng(7)
    h = w = 64
    y = rng.integers(0, 255, (3, h, w)).astype(np.int32)
    u = np.tile(np.full((1, 32, 32), 120, np.int32), (3, 1, 1))
    v = np.tile(np.full((1, 32, 32), 140, np.int32), (3, 1, 1))
    enc = FrameEncoder(h, w, 32, search="rd")
    out = enc.encode(y, u, v)
    cfg = headers.StreamConfig(width=w, height=h, qp=32)
    return cfg, out


def test_prefix_seis_roundtrip(encoded):
    cfg, out = encoded
    s = streamlib.encode_stream(cfg, [out], prefix_seis=True)
    d = Decoder()
    d.decode(s)
    assert all(d.hashes_ok)
    types = [t for t, _ in d.prefix_seis]
    assert types.count(headers.SEI_ACTIVE_PARAMETER_SETS) == 1
    assert types.count(headers.SEI_RECOVERY_POINT) == 1


def test_sei_framing_roundtrip():
    """7.3.5 ff-escaped type/size framing incl. a >255-byte payload."""
    uuid = bytes(range(16))
    data = bytes((i * 7) & 0xFF for i in range(300))
    rbsp = headers.write_user_data_sei(uuid, data)
    msgs = headers.parse_sei_messages(rbsp)
    assert msgs == [(headers.SEI_USER_DATA_UNREGISTERED, uuid + data)]


def test_cra_refresh_roundtrip(encoded):
    cfg, out = encoded
    s = streamlib.encode_stream(cfg, [out], cra_refresh=True)
    d = Decoder()
    frames = d.decode(s)
    assert len(frames) == 3 and all(d.hashes_ok)
    for i in range(3):
        assert (frames[i][0] == out["recon_y"][i]).all()
    # the stream really holds one IDR then CRAs
    from hevctpu.codec import bitio
    nal_types = [t for t, _, _ in bitio.split_annexb(s)
                 if t in (headers.NAL_IDR_W_RADL, 21)]
    assert nal_types == [headers.NAL_IDR_W_RADL, 21, 21]


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM oracle not built (tools/build_hm_oracle.sh)")
def test_hm_decodes_sei_and_cra(encoded, tmp_path):
    cfg, out = encoded
    s = streamlib.encode_stream(cfg, [out], prefix_seis=True,
                                cra_refresh=True)
    bs = tmp_path / "cra.bin"
    yuv = tmp_path / "cra.yuv"
    bs.write_bytes(s)
    r = subprocess.run([HM_DECODER, "-b", str(bs), "-o", str(yuv)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert r.stdout.count("(OK)") == 3
    assert "POC    2" in r.stdout  # POCs advanced
    h, w = cfg.height, cfg.width
    rec = np.fromfile(yuv, np.uint8)
    fs = h * w + 2 * (h // 2) * (w // 2)
    for i in range(3):
        assert (rec[i * fs:i * fs + h * w].reshape(h, w)
                == out["recon_y"][i]).all()
