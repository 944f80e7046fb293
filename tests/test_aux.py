"""Tests for the auxiliary subsystems: rate control, preanalysis, utils,
label generation, training, checkpointing."""

import numpy as np
import pytest

from hevctpu.models import checkpoint, convnet2, train
from hevctpu.pipeline import labels, preanalysis, ratectrl
from hevctpu import utils


# -- rate control -----------------------------------------------------------


def test_ratectrl_converges_to_target():
    """Against a synthetic encoder with a known R-QP law (rate halves every
    6 QP), the controller must land within 15% of the target bitrate."""
    w, h, fps = 416, 240, 30.0
    target = 800_000.0  # bps

    def encoder_bits(qp):  # synthetic: ~2 Mbps at QP 22
        return 2_000_000 / fps * 2.0 ** ((22 - qp) / 6.0)

    rc = ratectrl.RateController(target, fps, w, h)
    for _ in range(60):
        qp, lam = rc.start_picture()
        assert 0 <= qp <= 51 and lam > 0
        rc.update(int(encoder_bits(qp)))
    got = np.mean([p.actual_bits for p in rc.pics[-20:]]) * fps
    assert abs(got - target) / target < 0.15, got


def test_ratectrl_qp_clip_between_pictures():
    rc = ratectrl.RateController(10_000_000, 30.0, 416, 240)
    qp0, _ = rc.start_picture()
    rc.update(4_000_000)  # huge overshoot
    qp1, _ = rc.start_picture()
    assert abs(qp1 - qp0) <= 2


def test_ratectrl_complexity_is_positive():
    rng = np.random.default_rng(0)
    y = rng.integers(0, 255, (64, 64))
    rc = ratectrl.RateController(1e6, 30.0, 64, 64)
    flat = rc.complexity(np.full((64, 64), 128))
    tex = rc.complexity(y)
    assert tex > flat >= 0


# -- preanalysis ------------------------------------------------------------


def test_adaptive_qp_map_sign():
    """Flat blocks get negative dqp (more bits), textured positive."""
    rng = np.random.default_rng(1)
    y = np.zeros((128, 128), np.int32)
    y[:64] = 128                                    # flat top
    y[64:] = rng.integers(0, 255, (64, 128))        # noisy bottom
    dqp = np.asarray(preanalysis.adaptive_qp_map(y, block=64))
    assert dqp.shape == (2, 2)
    assert dqp[0, 0] < dqp[1, 0]
    assert abs(preanalysis.frame_qp_offset(y)) <= 3


# -- utils ------------------------------------------------------------------


def test_annexb_bytecount_roundtrip():
    from hevctpu.codec import bitio

    s = (bitio.nal_unit(32, b"\x01\x02") + bitio.nal_unit(33, b"\x03" * 10)
         + bitio.nal_unit(19, b"\x04" * 5))
    rows = utils.annexb_bytecount(s)
    assert [r[0] for r in rows] == [32, 33, 19]
    assert sum(r[2] for r in rows) == len(s)


def test_convert_bitdepth_roundtrip():
    rng = np.random.default_rng(2)
    p8 = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    p10 = utils.convert_bitdepth(p8, 8, 10)
    assert p10.dtype == np.uint16 and p10.max() <= 1023
    back = utils.convert_bitdepth(p10, 10, 8)
    np.testing.assert_array_equal(back, p8)


def test_bitrate_targeting_interpolates():
    pts = [(22, 8000.0), (27, 4000.0), (32, 2000.0), (37, 1000.0)]
    qf, qi = utils.bitrate_targeting(pts, 2800.0)
    assert 27 < qf < 32 and qi in (29, 30)


# -- labels / training ------------------------------------------------------


def test_depth8_to_ctu_labels_layout():
    rc, cc = 1, 2
    d8 = np.zeros((1, 8, 16), np.int32)
    d8[0, :2, :2] = 1          # top-left 16x16 of CTU0 at depth 1
    d8[0, 6:8, 14:16] = 3      # bottom-right 16x16 of CTU1 at depth 3
    lab = labels.depth8_to_ctu_labels(d8, rc, cc)
    assert lab.shape == (1, 2, 16)
    assert lab[0, 0, 0] == 1 and lab[0, 1, 15] == 3
    assert lab.sum() == 4


def test_make_dataset_and_train_step():
    rng = np.random.default_rng(3)
    y = rng.integers(0, 255, (1, 64, 128)).astype(np.int32)
    u = rng.integers(0, 255, (1, 32, 64)).astype(np.int32)
    v = rng.integers(0, 255, (1, 32, 64)).astype(np.int32)
    lab = rng.integers(0, 4, (1, 2, 16)).astype(np.int32)
    x32, x64, digits = labels.make_dataset(y, u, v, lab)
    assert x32.shape == (8, 32, 32, 3)
    assert x64.shape == (8, 64, 64, 3)
    assert digits.shape == (8, 4)
    # quadrant-digit layout: quadrant q of CTU c = labels 16x16 blocks
    # (2*(q//2)+dy, 2*(q%2)+dx)
    l0 = lab[0, 0].reshape(4, 4)
    assert digits[1, 0] == l0[0, 2] and digits[2, 3] == l0[3, 1]

    params, hist = train.train(x32, x64, digits, epochs=2, batch=8, lr=1e-3)
    assert hist[-1]["loss"] <= hist[0]["loss"] * 1.5


def test_write_partition_info(tmp_path):
    lab = np.arange(32, dtype=np.int32).reshape(1, 2, 16) % 4
    p = tmp_path / "PartitionInfo.txt"
    labels.write_partition_info(str(p), lab, append=False)
    lines = p.read_text().splitlines()
    assert len(lines) == 2 and all(len(x) == 16 for x in lines)


# -- checkpoint -------------------------------------------------------------


def test_checkpoint_npz_roundtrip(tmp_path):
    params = convnet2.init_params(0)
    path = str(tmp_path / "model.npz")
    checkpoint.save(path, params)
    back = checkpoint.load(path)
    for k in params:
        for kk in params[k]:
            np.testing.assert_array_equal(back[k][kk], params[k][kk])


def test_bit_stats_accounts_for_stream():
    """tools/bit_stats.frame_bit_stats (TComCodingStatistics role): the
    per-syntax attribution must sum to ~the real slice bits."""
    import os
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, os.path.join(root, "tools"))
    import numpy as np
    from bit_stats import frame_bit_stats
    from hevctpu.codec import decoder as streamlib
    from hevctpu.codec import headers
    from hevctpu.pipeline.encoder import FrameEncoder

    rng = np.random.default_rng(2)
    h = w = 64
    y = rng.integers(0, 255, (1, h, w)).astype(np.int32)
    u = np.full((1, 32, 32), 120, np.int32)
    v = np.full((1, 32, 32), 140, np.int32)
    enc = FrameEncoder(h, w, 32, search="rd")
    out = enc.encode(y, u, v)
    cfg = headers.StreamConfig(width=w, height=h, qp=32, hash_type="none")
    stats = frame_bit_stats(cfg, out, 0)
    est = sum(stats.values())
    real = len(streamlib.encode_frame_nals(cfg, out)) * 8
    assert 0.9 * real <= est <= 1.02 * real, (est, real)
    assert stats.get("sig_coeff_luma", 0) > 0
