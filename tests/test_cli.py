"""End-to-end CLI tests on a tiny clip (64x64): encode (rd search, rate
control), decode, genlabels, bytecount."""

import numpy as np
import pytest

from hevctpu import cli
from hevctpu.pipeline import yuv


@pytest.fixture(scope="module")
def clip(tmp_path_factory):
    rng = np.random.default_rng(7)
    h, w, n = 64, 64, 2
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.stack([(128 + 60 * np.sin(yy / 6 + i) * np.cos(xx / 9)
                   + rng.normal(0, 4, (h, w))).clip(0, 255)
                  for i in range(n)]).astype(np.uint8)
    u = np.full((n, h // 2, w // 2), 120, np.uint8)
    v = rng.integers(100, 160, (n, h // 2, w // 2)).astype(np.uint8)
    p = tmp_path_factory.mktemp("clip") / "in.yuv"
    yuv.write_yuv420(str(p), y, u, v)
    return str(p), (y, u, v)


def test_encode_rd_decode_roundtrip(clip, tmp_path, capsys):
    path, (y, u, v) = clip
    bs = str(tmp_path / "out.bin")
    rec = str(tmp_path / "rec.yuv")
    rc = cli.main(["encode", "-i", path, "--width", "64", "--height", "64",
                   "-q", "32", "-b", bs, "--recon", rec, "--search", "rd"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "SUMMARY" in out or "Bytes written" in out

    dec = str(tmp_path / "dec.yuv")
    assert cli.main(["decode", "-b", bs, "-o", dec]) == 0
    ry, _, _ = yuv.read_yuv420(rec, 64, 64, 2)
    dy, _, _ = yuv.read_yuv420(dec, 64, 64, 2)
    np.testing.assert_array_equal(ry, dy)
    # quality sanity at QP 32
    assert float(np.square(ry.astype(float) - y.astype(float)).mean()) < 200


def test_encode_rate_control(clip, tmp_path, capsys):
    path, _ = clip
    bs = str(tmp_path / "rc.bin")
    rc = cli.main(["encode", "-i", path, "--width", "64", "--height", "64",
                   "-b", bs, "--target-kbps", "200", "--search", "rd"])
    assert rc == 0
    assert cli.main(["bytecount", bs]) == 0
    out = capsys.readouterr().out
    assert "NAL units" in out


def test_genlabels(clip, tmp_path):
    path, _ = clip
    out = str(tmp_path / "PartitionInfo.txt")
    rc = cli.main(["genlabels", "-i", path, "--width", "64", "--height", "64",
                   "-q", "32", "-o", out])
    assert rc == 0
    lines = open(out).read().splitlines()
    assert len(lines) == 2  # 1 CTU x 2 frames
    assert all(len(ln) == 16 and set(ln) <= set("0123") for ln in lines)
