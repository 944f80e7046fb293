"""CNN predictor equivalence vs the reference torch checkpoint and scalar
post-processing rules."""

import os

import numpy as np
import pytest

from hevctpu.models import convnet2

PT = "/root/reference/rec/hevc_encoder_model.pt"


@pytest.mark.skipif(not os.path.exists(PT), reason="reference weights absent")
def test_forward_matches_torch():
    import torch
    import torch.nn as nn

    class TorchNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Sequential(nn.Conv2d(3, 16, 5, padding=2),
                                       nn.BatchNorm2d(16), nn.ReLU(),
                                       nn.MaxPool2d(2))
            self.conv2 = nn.Sequential(nn.Conv2d(32, 64, 3, padding=1),
                                       nn.BatchNorm2d(64), nn.ReLU(),
                                       nn.MaxPool2d(2))
            self.conv3 = nn.Sequential(nn.Conv2d(64, 128, 3, padding=1),
                                       nn.BatchNorm2d(128), nn.ReLU(),
                                       nn.MaxPool2d(2))
            self.fc1 = nn.Sequential(nn.Linear(128 * 16, 256), nn.ReLU())
            self.fc2 = nn.Sequential(nn.Linear(256, 64), nn.ReLU())
            self.fc3 = nn.Linear(64, 16)
            self.conv64 = nn.Sequential(nn.Conv2d(3, 16, 5, padding=2),
                                        nn.BatchNorm2d(16), nn.ReLU(),
                                        nn.MaxPool2d(4))

        def forward(self, x32, x64):
            out = torch.cat([self.conv1(x32), self.conv64(x64)], dim=1)
            out = self.conv3(self.conv2(out)).reshape(x32.size(0), -1)
            return self.fc3(self.fc2(self.fc1(out)))

    tm = TorchNet()
    tm.load_state_dict(torch.load(PT, map_location="cpu"))
    tm.eval()

    rng = np.random.default_rng(0)
    x32 = rng.random((5, 32, 32, 3), dtype=np.float32)
    x64 = rng.random((5, 64, 64, 3), dtype=np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x32.transpose(0, 3, 1, 2)),
                  torch.from_numpy(x64.transpose(0, 3, 1, 2))).numpy()

    params = convnet2.load_torch_params(PT)
    got = np.asarray(convnet2.forward(params, x32, x64))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
    # classification decisions must agree exactly
    assert (got.reshape(5, 4, 4).argmax(-1) == want.reshape(5, 4, 4).argmax(-1)).all()


def _scalar_postprocess(quads):
    """Direct reimplementation of the reference's string-rule loop."""
    label = [None] * 16
    places = {0: (0, 1, 4, 5), 1: (2, 3, 6, 7), 2: (8, 9, 12, 13),
              3: (10, 11, 14, 15)}
    checks = {1: 0, 2: 2, 3: 8}
    for l2 in range(4):
        pred = "".join(str(d) for d in quads[l2])
        if "0" in pred and pred != "0000":
            pred = pred.replace("0", "1")
        if "1" in pred and pred != "1111":
            pred = pred.replace("1", "2")
        if l2 in checks and pred == "0000" and label[checks[l2]] != "0":
            pred = "1111"
        for j, pos in enumerate(places[l2]):
            label[pos] = pred[j]
    return np.array([int(c) for c in label])


def test_postprocess_matches_reference_rules():
    rng = np.random.default_rng(1)
    quads = rng.integers(0, 4, size=(200, 4, 4))
    got = np.asarray(convnet2.assemble_ctu_labels(quads))
    for i in range(200):
        want = _scalar_postprocess(quads[i])
        assert (got[i] == want).all(), (i, quads[i], got[i], want)


def test_frame_to_crops_layout():
    rng = np.random.default_rng(2)
    h, w = 70, 130  # 2x3 CTUs with padding
    rgb = rng.random((h, w, 3), dtype=np.float32)
    x32, x64 = convnet2.frame_to_crops(rgb, h, w)
    x32, x64 = np.asarray(x32), np.asarray(x64)
    assert x64.shape == (6, 64, 64, 3) and x32.shape == (24, 32, 32, 3)
    # CTU (row 1, col 2) top-left pixel
    assert (x64[5, 0, 0] == rgb[64, 128]).all()
    # quadrant 3 of CTU 0 = pixels (32..63, 32..63)
    assert (x32[3] == np.pad(rgb, ((0, 58), (0, 62), (0, 0)))[32:64, 32:64]).all()
    # padding is zero
    assert (x64[5, :, 2:] == 0).all()
