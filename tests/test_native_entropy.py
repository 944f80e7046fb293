"""Native C++ CABAC slice coder vs the Python golden (codec/syntax.py).

The native coder (hevctpu/native/entropy.cpp) must be byte-identical to
SliceEncoder on every frame — it is the production serializer, the Python
engine is the reference (the same discipline the reference applies between
TEncBinCABAC and its counting twin, TEncBinCoderCABACCounter.cpp:63)."""

import numpy as np
import pytest

from hevctpu import native
from hevctpu.codec import decoder as dec
from hevctpu.codec import headers
from hevctpu.codec.syntax import SliceEncoder
from hevctpu.models import convnet2
from hevctpu.pipeline.encoder import FrameEncoder
from tests.test_roundtrip import _synth_frames

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


@pytest.mark.parametrize("qp", [22, 32, 45])
def test_native_matches_python_bytes(qp):
    h, w = 128, 192
    b = 2
    y, u, v = _synth_frames(h, w, b, seed=qp)
    rng = np.random.default_rng(qp)
    quads = rng.integers(0, 4, size=(b, 6, 4, 4))
    labels = np.asarray(convnet2.assemble_ctu_labels(quads)).reshape(b, 6, 16)

    out = FrameEncoder(h, w, qp).encode(y, u, v, labels)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp)
    hdr = headers.write_slice_header(cfg).data()
    for i in range(b):
        golden = SliceEncoder(cfg, out, i).encode()
        assert golden[: len(hdr)] == hdr
        got = native.encode_slice_data(w, h, qp, out, i,
                                       max_tu_depth=cfg.max_tu_depth_intra,
                                       transform_skip=cfg.transform_skip)
        assert got == golden[len(hdr):], (qp, i)


def test_native_stream_decodes(qp=32):
    h, w = 64, 128
    y, u, v = _synth_frames(h, w, 1, seed=7)
    labels = np.zeros((1, 2, 16), np.int32) + 1
    out = FrameEncoder(h, w, qp).encode(y, u, v, labels)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp)
    s_native = dec.encode_stream(cfg, [out], use_native=True)
    s_python = dec.encode_stream(cfg, [out], use_native=False)
    assert s_native == s_python
    frames = dec.Decoder().decode(s_native)
    assert (frames[0][0] == out["recon_y"][0]).all()
