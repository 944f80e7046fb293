"""Benchmark: All-Intra encode throughput (frames/s) on one chip.

Measures the full pipeline — fused CNN depth inference, device frame encode
(dense SATD mode decision + wavefront reconstruction), and CABAC entropy
serialization — on a synthetic 416x240 clip (the reference cfg's class,
bitstream.cfg:1-9) at QP 32. Compile time is excluded (one warmup batch).

Baseline: the HM 16.20 anchor's single-thread CPU fps at the same operating
point, read from BASELINE_MEASURED.json if the anchor has been measured in
this environment, else the documented estimate. Prints ONE JSON line.
"""

import json
import os
import time

import numpy as np

H, W, QP = 240, 416, 32
FRAMES = 32
BATCH = 32
REPS = 3

# HM 16.20 TAppEncoder, All-Intra main, 416x240, single CPU thread: ~1.3 fps
# (typical for this class on a modern core; replaced by a measured number in
# BASELINE_MEASURED.json when the anchor build has been run here).
DEFAULT_ANCHOR_FPS = 1.3


def synth_clip(n, h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.stack([
        (128 + 70 * np.sin(yy / (7 + i)) * np.cos(xx / (11 + 2 * i))
         + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.int32)
        for i in range(n)])
    u = np.stack([(128 + 40 * np.cos(yy[::2, ::2] / (9 + i))).astype(np.int32)
                  for i in range(n)])
    v = rng.integers(60, 200, (n, h // 2, w // 2)).astype(np.int32)
    return y, u, v


def main():
    from hevctpu.codec import decoder as streamlib
    from hevctpu.codec import headers
    from hevctpu.models import convnet2
    from hevctpu.pipeline.encoder import FrameEncoder

    y, u, v = synth_clip(FRAMES, H, W)

    model_path = "/root/reference/rec/hevc_encoder_model.pt"
    if os.path.exists(model_path):
        params = convnet2.load_torch_params(model_path)
    else:
        params = convnet2.init_params(0)

    enc = FrameEncoder(H, W, QP)
    cfg = headers.StreamConfig(width=W, height=H, qp=QP)

    def run(i, j):
        # fused device step: CNN depth inference + frame encode in one jit
        out = enc.encode_fused(params, y[i:j], u[i:j], v[i:j])
        return streamlib.encode_stream(cfg, [out])

    # Warmup compiles every batch shape the measured loop will use.
    for i in range(0, FRAMES, BATCH):
        run(i, min(i + BATCH, FRAMES))

    # median of REPS full passes (the device link has noisy latency)
    times, total_bytes = [], 0
    for _ in range(REPS):
        t0 = time.time()
        total_bytes = 0
        for i in range(0, FRAMES, BATCH):
            total_bytes += len(run(i, min(i + BATCH, FRAMES)))
        times.append(time.time() - t0)
    dt = sorted(times)[len(times) // 2]
    fps = FRAMES / dt

    anchor = DEFAULT_ANCHOR_FPS
    mpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BASELINE_MEASURED.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            anchor = json.load(f).get("hm_ai_416x240_fps", anchor)

    print(json.dumps({
        "metric": "ai_encode_fps_416x240_qp32",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / anchor, 3),
    }))


if __name__ == "__main__":
    main()
