"""Verification-decoder hardening: malformed / unsupported streams are
rejected with typed DecodeError messages, never silently accepted (the
TDecConformance reject role; VERDICT r3 item 9). Works under python -O
(no bare asserts guard the parse path)."""

import numpy as np
import pytest

from hevctpu.codec import bitio, headers
from hevctpu.codec.decoder import Decoder
from hevctpu.pipeline.encoder import FrameEncoder


@pytest.fixture(scope="module")
def stream():
    rng = np.random.default_rng(11)
    h = w = 64
    y = rng.integers(0, 255, (1, h, w)).astype(np.uint8)
    u = np.full((1, 32, 32), 120, np.uint8)
    v = np.full((1, 32, 32), 140, np.uint8)
    enc = FrameEncoder(h, w, 32, search="rd")
    out = enc.encode(y, u, v)
    from hevctpu.codec import decoder as streamlib
    cfg = headers.StreamConfig(width=w, height=h, qp=32)
    return streamlib.encode_stream(cfg, [out])


def test_good_stream_decodes(stream):
    frames = Decoder().decode(stream)
    assert len(frames) == 1


def test_truncated_stream_rejected(stream):
    with pytest.raises(headers.DecodeError):
        Decoder().decode(stream[: len(stream) - 24])


def test_corrupt_slice_payload_rejected_or_hash_fails(stream):
    bad = bytearray(stream)
    bad[-40] ^= 0x5A  # flip bits inside the last slice/SEI region
    with pytest.raises(headers.DecodeError):
        Decoder().decode(bytes(bad))


def test_unsupported_nal_type_rejected(stream):
    # append a TRAIL_R (type 1, inter slice) NAL the all-intra
    # verification decoder does not support (CRA/IDR variants now decode)
    extra = bitio.nal_unit(1, b"\x80")
    with pytest.raises(headers.DecodeError, match="unsupported NAL"):
        Decoder().decode(stream + extra)


def test_slice_before_parameter_sets_rejected(stream):
    # strip everything before the first IDR NAL: slice with no SPS/PPS
    nals = list(bitio.split_annexb(stream))
    idr_payloads = [i for i, (t, _, _) in enumerate(nals)
                    if t == headers.NAL_IDR_W_RADL]
    assert idr_payloads
    # rebuild a stream holding only the IDR slice NAL
    start = stream.find(b"\x00\x00\x01", 30)  # somewhere past VPS
    # simpler: craft from the parsed rbsp
    from hevctpu.codec.bitio import nal_unit, rbsp_to_ebsp  # noqa: F401
    t, _tid, rbsp = nals[idr_payloads[0]]
    only_slice = bitio.nal_unit(t, rbsp)
    with pytest.raises(headers.DecodeError, match="SPS/PPS"):
        Decoder().decode(only_slice)


def test_tiles_pps_rejected():
    """A PPS with tiles on must be rejected (WPP now decodes; tiles do
    not). Flip every bit of a good PPS: any accepted parse never claims
    tiles, since the tiles_enabled_flag path raises DecodeError."""
    cfg = headers.StreamConfig(width=64, height=64, qp=32)
    good = headers.write_pps(cfg)
    rejected = 0
    for bit in range(8 * len(good)):
        bad = bytearray(good)
        bad[bit // 8] ^= 0x80 >> (bit % 8)
        try:
            headers.parse_pps(bytes(bad))
        except (headers.DecodeError, IndexError):
            rejected += 1
    assert rejected > 0  # at least the tiles/transquant/WPP-adjacent bits
