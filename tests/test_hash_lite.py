"""Decoded-picture-hash types (MD5/CRC/checksum) + the lite wire format.

The reference supports three picture-hash types in the decoded-picture-
hash SEI (TComPicYuvMD5.cpp:129-227: compCRC :90, compChecksum :141,
calcMD5 :185). These tests pin our host implementations to bit-serial
transliterations of those loops, roundtrip each type through the SEI
writer/parser and the verification decoder, and prove the lite transfer
path (device checksum + int8/escape levels + bitpacked flags) produces
byte-identical streams to the full path.
"""

import numpy as np
import pytest

from hevctpu.codec import decoder as streamlib
from hevctpu.codec import headers


def _hm_crc_bits(data: bytes) -> bytes:
    crc = 0xffff
    for byte in data:
        for bit in range(8):
            msb = (crc >> 15) & 1
            bitval = (byte >> (7 - bit)) & 1
            crc = (((crc << 1) + bitval) & 0xffff) ^ (msb * 0x1021)
    for _ in range(16):
        msb = (crc >> 15) & 1
        crc = ((crc << 1) & 0xffff) ^ (msb * 0x1021)
    return bytes([(crc >> 8) & 0xff, crc & 0xff])


def _hm_checksum_scalar(p: np.ndarray) -> bytes:
    h, w = p.shape
    s = 0
    for y in range(h):
        for x in range(w):
            xor_mask = ((x & 0xff) ^ (y & 0xff) ^ (x >> 8) ^ (y >> 8)) & 0xff
            s = (s + ((int(p[y, x]) & 0xff) ^ xor_mask)) & 0xffffffff
    return bytes([(s >> 24) & 0xff, (s >> 16) & 0xff,
                  (s >> 8) & 0xff, s & 0xff])


@pytest.mark.parametrize("shape", [(3, 5), (16, 16), (17, 31)])
def test_crc_checksum_vs_bit_serial(shape):
    rng = np.random.default_rng(7)
    p = rng.integers(0, 256, shape, dtype=np.uint8)
    assert headers.plane_crc(p) == _hm_crc_bits(p.tobytes())
    assert headers.plane_checksum(p) == _hm_checksum_scalar(p)


@pytest.mark.parametrize("htype", ["md5", "crc", "checksum"])
def test_hash_sei_roundtrip(htype):
    rng = np.random.default_rng(1)
    planes = [rng.integers(0, 256, (16, 24), dtype=np.uint8)
              for _ in range(3)]
    sei = headers.write_hash_sei(*planes, hash_type=htype)
    name, digests = headers.parse_hash_sei(sei)
    assert name == htype
    assert digests == [headers._HASH_FN[htype](p) for p in planes]


def test_device_checksum_matches_host():
    import jax.numpy as jnp

    from hevctpu.pipeline.encoder import _checksum_plane_device

    rng = np.random.default_rng(3)
    p = rng.integers(0, 256, (2, 40, 72), dtype=np.int32)
    dev = np.asarray(_checksum_plane_device(jnp.asarray(p)))
    for b in range(2):
        want = int.from_bytes(headers.plane_checksum(p[b]), "big")
        assert int(dev[b]) == want


def test_pack_bits_roundtrip():
    import jax.numpy as jnp

    from hevctpu.pipeline.encoder import (_pack_bits_device,
                                          _unpack_bits_host)

    rng = np.random.default_rng(5)
    x = rng.random((3, 7, 11)) < 0.4
    packed = np.asarray(_pack_bits_device(jnp.asarray(x)))
    assert (_unpack_bits_host(packed, (7, 11)) == x).all()


def test_pack_levels_roundtrip_with_escapes():
    import jax.numpy as jnp

    from hevctpu.pipeline.encoder import (_pack_levels_device,
                                          _unpack_levels_host)

    rng = np.random.default_rng(9)
    lvl = rng.integers(-40, 41, (2, 16, 16), dtype=np.int32)
    lvl[0, 3, 4] = 900
    lvl[0, 0, 0] = -301
    lvl[1, 15, 15] = -128
    lv8, pos, val, n = (np.asarray(a) for a in
                        _pack_levels_device(jnp.asarray(lvl)))
    got = _unpack_levels_host(lv8, pos, val, n, np.int16)
    assert (got == lvl).all()
    assert n[0] == 2 and n[1] == 1


def _synth(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.stack([(128 + 70 * np.sin(yy / (7 + i)) * np.cos(xx / (11 + i))
                   + rng.normal(0, 6, (h, w))).clip(0, 255)
                  for i in range(n)]).astype(np.int32)
    u = np.stack([(128 + 40 * np.cos(yy[::2, ::2] / (9 + i))).clip(0, 255)
                  for i in range(n)]).astype(np.int32)
    v = rng.integers(60, 200, (n, h // 2, w // 2)).astype(np.int32)
    return y, u, v


def test_lite_stream_identical_and_checksum_verifies():
    from hevctpu.models import convnet2
    from hevctpu.pipeline.encoder import FrameEncoder

    h, w = 64, 128
    y, u, v = _synth(2, h, w)
    enc = FrameEncoder(h, w, qp=32)
    params = convnet2.init_params(0)

    full = enc.encode_fused(params, y, u, v)
    lite = enc.encode_fused(params, y, u, v, lite=True)

    assert "recon_y" not in lite
    for k in ("levels_y", "levels_u", "levels_v", "cbf_y", "cbf_u",
              "cbf_v", "cbf4_y", "ts4_y", "ts8_u", "ts8_v", "depth8",
              "mode4", "tusz8"):
        assert (np.asarray(full[k]) == np.asarray(lite[k])).all(), k

    cfg = headers.StreamConfig(width=w, height=h, qp=32,
                               hash_type="checksum")
    s_full = streamlib.encode_stream(cfg, [full])
    s_lite = streamlib.encode_stream(cfg, [lite])
    assert s_full == s_lite

    d = streamlib.Decoder()
    d.decode(s_lite)
    assert len(d.frames) == 2 and all(d.hashes_ok)


@pytest.mark.parametrize("htype", ["md5", "crc", "checksum"])
def test_decoder_verifies_each_hash_type(htype):
    from hevctpu.models import convnet2
    from hevctpu.pipeline.encoder import FrameEncoder

    h, w = 64, 64
    y, u, v = _synth(1, h, w, seed=2)
    enc = FrameEncoder(h, w, qp=32)
    out = enc.encode_fused(convnet2.init_params(0), y, u, v)
    cfg = headers.StreamConfig(width=w, height=h, qp=32, hash_type=htype)
    stream = streamlib.encode_stream(cfg, [out])
    d = streamlib.Decoder()
    d.decode(stream)
    assert d.hashes_ok == [True]

    # a corrupted digest must be rejected with a typed DecodeError
    bad = bytearray(stream)
    sei_at = bad.rfind(bytes([headers.SEI_DECODED_PICTURE_HASH]))
    bad[sei_at + 3] ^= 0xFF
    with pytest.raises(headers.DecodeError):
        streamlib.Decoder().decode(bytes(bad))
