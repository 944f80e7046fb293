"""cu_qp_delta / LCU-level rate control (VERDICT r4 item 8).

Per-CTU QP maps: quantization, λ and deblocking follow the map
(TComTrQuant setQpParam, 8.7.2.5.3 per-edge Q averaging), the delta is
signaled at the first cbf-carrying transform_unit of each CTB-sized
quantization group (7.3.8.10, TEncSbac::codeDeltaQP), and QP prediction
is qPY_PREV inheritance in raster order (8.6.1 with QG == CTB).
LCU-level R-λ allocation mirrors TEncRCPic::getLCUTargetBpp /
getLCUEstLambda (TEncRateCtrl.cpp:845-940).
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
    h, w, qp = 128, 192, 32
    y, u, v = _clip(2, h, w)
    enc = FrameEncoder(h, w, qp, search="rd")
    rng = np.random.default_rng(11)
    qmap = rng.integers(qp - 3, qp + 4,
                        (2, enc.geom.rc, enc.geom.cc)).astype(np.int32)
    out = enc.encode(y, u, v, qp_map=qmap)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp, cu_qp_delta=True)
    return cfg, out, streamlib.encode_stream(cfg, [out]), (y, u, v)


def test_qp_map_roundtrip(encoded):
    cfg, out, stream, _ = encoded
    dec = Decoder()
    frames = dec.decode(stream)
    assert len(frames) == 2 and all(dec.hashes_ok)
    for i, (ry, ru, rv) in enumerate(frames):
        assert (ry == out["recon_y"][i]).all()
        assert (ru == out["recon_u"][i]).all()
        assert (rv == out["recon_v"][i]).all()
    # the map actually varied (deltas were coded, not all inherited)
    assert len(np.unique(out["qp_ctu"])) > 1


@pytest.mark.skipif(not os.path.exists(HM_DECODER),
                    reason="HM oracle not built (tools/build_hm_oracle.sh)")
def test_hm_decoder_agrees(encoded, tmp_path):
    cfg, out, stream, _ = encoded
    h, w = cfg.height, cfg.width
    bs = tmp_path / "cuqp.bin"
    yuv = tmp_path / "cuqp.yuv"
    bs.write_bytes(stream)
    r = subprocess.run([HM_DECODER, "-b", str(bs), "-o", str(yuv)],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "(OK)" in r.stdout and "***ERROR***" not in r.stdout
    rec = np.fromfile(yuv, np.uint8)
    fs = h * w + 2 * (h // 2) * (w // 2)
    assert rec.size == 2 * fs
    for i in range(2):
        f = rec[i * fs:(i + 1) * fs]
        assert (f[:h * w].reshape(h, w) == out["recon_y"][i]).all()


def test_constant_map_matches_scalar_path(encoded):
    """qp_map filled with the slice QP must reproduce the no-map encode
    bit-exactly (the vectorized quant/λ/deblock paths are equivalences,
    not approximations)."""
    h, w, qp = 64, 128, 27
    y, u, v = _clip(1, h, w, seed=3)
    enc = FrameEncoder(h, w, qp, search="rd")
    base = enc.encode(y, u, v)
    qmap = np.full((1, enc.geom.rc, enc.geom.cc), qp, np.int32)
    mapped = enc.encode(y, u, v, qp_map=qmap)
    for k in ("recon_y", "recon_u", "recon_v", "levels_y", "levels_u",
              "levels_v"):
        assert (np.asarray(base[k]) == np.asarray(mapped[k])).all(), k
    assert (mapped["qp_ctu"] == qp).all()


def test_native_matches_python_bytes(encoded):
    from hevctpu import native
    from hevctpu.codec.syntax import SliceEncoder
    if not native.available():
        pytest.skip("native entropy unavailable")
    cfg, out, _, _ = encoded
    for i in range(2):
        py_rbsp = SliceEncoder(cfg, out, i).encode()
        nat = headers.write_slice_header(cfg).data() + \
            native.encode_slice_data(
                cfg.width, cfg.height, cfg.qp, out, i,
                sbh=cfg.sign_data_hiding,
                max_tu_depth=cfg.max_tu_depth_intra,
                transform_skip=cfg.transform_skip)
        assert py_rbsp == nat


def test_config_mismatch_guards(encoded):
    cfg, out, _, _ = encoded
    import dataclasses
    off = dataclasses.replace(cfg, cu_qp_delta=False)
    with pytest.raises(ValueError, match="cu_qp_delta"):
        streamlib.encode_frame_nals(off, out)
    no_map = {k: v for k, v in out.items() if k != "qp_ctu"}
    with pytest.raises(ValueError, match="qp_ctu"):
        streamlib.encode_frame_nals(cfg, no_map)


def test_lcu_rate_control_allocates():
    """LCU-level R-λ: per-CTU QPs track complexity (flat CTUs get the
    high-QP end, busy CTUs the low end) and a target-bitrate encode with
    the map emits decodable per-CTU QP variation."""
    from hevctpu.pipeline.ratectrl import RateController
    h, w = 128, 256
    rng = np.random.default_rng(5)
    y = np.full((h, w), 128, np.int32)
    y[:, w // 2:] = rng.integers(0, 256, (h, w // 2))  # right half busy
    rc = RateController(800.0 * 1000, 30.0, w, h)
    qp, _lam = rc.start_picture(rc.complexity(y))
    qmap = rc.lcu_qp_map(y)
    assert qmap.shape == (2, 4)
    assert (qmap >= qp - 2).all() and (qmap <= qp + 2).all()
    # busy half should not get a higher QP than the flat half
    assert qmap[:, 2:].mean() <= qmap[:, :2].mean()

    u = np.full((1, h // 2, w // 2), 128, np.int32)
    v = np.full((1, h // 2, w // 2), 128, np.int32)
    enc = FrameEncoder(h, w, int(qp), search="rd")
    out = enc.encode(y[None], u, v, qp_map=qmap[None])
    cfg = headers.StreamConfig(width=w, height=h, qp=int(qp),
                               cu_qp_delta=True)
    stream = streamlib.encode_stream(cfg, [out])
    rc.update(len(stream) * 8)
    dec = Decoder()
    dec.decode(stream)
    assert all(dec.hashes_ok)
