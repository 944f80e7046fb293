"""Frame encoder pipeline tests (stage 1 + stage 2)."""

import numpy as np
import pytest

from hevctpu.pipeline.encoder import FrameEncoder


def _chroma(h, w, val):
    return np.full((1, h // 2, w // 2), val)


def test_constant_image_reconstructs_exactly():
    h, w = 128, 128
    y = np.full((1, h, w), 120)
    enc = FrameEncoder(h, w, 32)
    out = enc.encode(y, _chroma(h, w, 100), _chroma(h, w, 160),
                     np.full((1, 4, 16), 2))
    # first TU quantizes the DC offset from the all-128 substituted refs;
    # everything after predicts from recon, so the plane is flat within +-2.
    assert np.abs(out["recon_y"].astype(int) - 120).max() <= 2
    assert np.abs(out["recon_u"].astype(int) - 100).max() <= 2
    assert np.abs(out["recon_v"].astype(int) - 160).max() <= 2
    assert np.ptp(out["recon_y"][0, 8:, 8:]) == 0


def test_gradient_psnr_reasonable():
    h, w = 128, 192
    yy, xx = np.mgrid[0:h, 0:w]
    y = ((yy + 2 * xx) % 256).astype(np.int64)[None]
    enc = FrameEncoder(h, w, 27)
    out = enc.encode(y, _chroma(h, w, 100), _chroma(h, w, 160),
                     np.full((1, 6, 16), 2))
    mse = ((out["recon_y"].astype(np.int64) - y) ** 2).mean()
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > 38, psnr


def test_nonaligned_frame_and_mixed_depths():
    h, w = 120, 176  # boundary CTUs on both axes
    rng = np.random.default_rng(0)
    yy, xx = np.mgrid[0:h, 0:w]
    y = (128 + 60 * np.sin(yy / 9.0) * np.cos(xx / 13.0)
         + rng.normal(0, 4, (h, w))).clip(0, 255).astype(np.int64)[None]
    u = (128 + 40 * np.sin(xx[::2, ::2] / 17.0)).astype(np.int64)[None]
    v = np.full((1, h // 2, w // 2), 90)
    from hevctpu.models import convnet2
    quads = rng.integers(0, 4, size=(1, 2 * 3, 4, 4))
    labels = np.asarray(convnet2.assemble_ctu_labels(quads)).reshape(1, 6, 16)
    enc = FrameEncoder(h, w, 32)
    out = enc.encode(y, u, v, labels)
    mse = ((out["recon_y"].astype(np.int64) - y) ** 2).mean()
    psnr = 10 * np.log10(255 ** 2 / mse)
    assert psnr > 30, psnr
    # uncoded slots (outside picture) exist on the boundary
    assert not out["coded8"][0, -1].all() or h % 64 == 0
    # coded slots have sane depth range
    d = out["depth8"][0][out["coded8"][0]]
    assert d.min() >= 0 and d.max() <= 3


def test_batch_consistency():
    h, w = 64, 128
    rng = np.random.default_rng(1)
    y = rng.integers(0, 256, (2, h, w))
    u = rng.integers(0, 256, (2, h // 2, w // 2))
    v = rng.integers(0, 256, (2, h // 2, w // 2))
    labels = np.full((2, 2, 16), 3)
    enc = FrameEncoder(h, w, 32)
    both = enc.encode(y, u, v, labels)
    one = enc.encode(y[1:], u[1:], v[1:], labels[1:])
    assert (both["recon_y"][1] == one["recon_y"][0]).all()
    assert (both["levels_y"][1] == one["levels_y"][0]).all()
