"""End-to-end conformance: TPU encoder -> Annex-B stream -> independent
decoder -> bit-exact reconstruction match (the decoded-picture-hash
discipline of the reference, TEncGOP.cpp:1948)."""

import numpy as np
import pytest

from hevctpu.codec import decoder as dec
from hevctpu.codec import headers
from hevctpu.models import convnet2
from hevctpu.pipeline.encoder import FrameEncoder


def _synth_frames(h, w, b, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.stack([
        (128 + 70 * np.sin(yy / (7 + i)) * np.cos(xx / (11 + 2 * i))
         + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.int64)
        for i in range(b)])
    u = np.stack([
        (128 + 40 * np.cos(yy[::2, ::2] / (9 + i))).astype(np.int64)
        for i in range(b)])
    v = rng.integers(60, 200, (b, h // 2, w // 2))
    return y, u, v


@pytest.mark.parametrize("qp", [27, 37])
def test_encode_decode_recon_matches(qp):
    h, w = 128, 192
    b = 2
    y, u, v = _synth_frames(h, w, b)
    rng = np.random.default_rng(3)
    quads = rng.integers(0, 4, size=(b, 6, 4, 4))
    labels = np.asarray(convnet2.assemble_ctu_labels(quads)).reshape(b, 6, 16)

    enc = FrameEncoder(h, w, qp)
    out = enc.encode(y, u, v, labels)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp)
    stream = dec.encode_stream(cfg, [out])
    assert len(stream) > 100

    frames = dec.Decoder().decode(stream)
    assert len(frames) == b
    for i, (ry, ru, rv) in enumerate(frames):
        assert (ry == out["recon_y"][i]).all(), (
            qp, i, np.abs(ry - out["recon_y"][i]).max(),
            int((ry != out["recon_y"][i]).sum()))
        assert (ru == out["recon_u"][i]).all()
        assert (rv == out["recon_v"][i]).all()


def test_boundary_frame_roundtrip():
    h, w = 120, 176  # non-multiple-of-64
    y, u, v = _synth_frames(h, w, 1, seed=9)
    labels = np.full((1, 6, 16), 2)
    labels[0, 0] = 3
    enc = FrameEncoder(h, w, 32)
    out = enc.encode(y, u, v, labels)
    cfg = headers.StreamConfig(width=w, height=h, qp=32)
    stream = dec.encode_stream(cfg, [out])
    (ry, ru, rv), = dec.Decoder().decode(stream)
    assert (ry == out["recon_y"][0]).all()
    assert (ru == out["recon_u"][0]).all()
    assert (rv == out["recon_v"][0]).all()
