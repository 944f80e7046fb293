"""Benchmark: All-Intra encode throughput (frames/s) on one chip.

Measures the full pipeline — fused CNN depth inference, device frame encode
(dense SATD mode decision + wavefront reconstruction), and CABAC entropy
serialization — at the target operating point, 1080p AI QP 32 (the north
star's ">=5x 1080p fps/chip vs HM CPU"), plus the 416x240 class the
reference cfg ships (bitstream.cfg:1-9). Compile time is excluded (warmup
batch per shape).

Prints ONE JSON line (the 1080p point) on stdout; both points are written
to BENCH_DETAIL.json. Baselines are the HM 16.20 anchor's single-thread
CPU fps measured in this environment (BASELINE_MEASURED.json /
BASELINE_1080P.json), with documented fallbacks.
"""

import json
import os
import sys
import time

import numpy as np

H, W, QP = 240, 416, 32
FRAMES = 32
BATCH = 32
REPS = 3

H2, W2 = 1088, 1920
FRAMES2 = 8
BATCH2 = 8   # bigger batch amortizes the wavefront's fixed per-diagonal
REPS2 = 3    # cost (stage 2 is latency-bound, see PROFILE.md)

# HM 16.20 TAppEncoder, All-Intra main, single CPU thread fallbacks
# (replaced by measured numbers when the anchor has been run here).
DEFAULT_ANCHOR_FPS = 1.3
DEFAULT_ANCHOR_1080P_FPS = 0.1


def synth_clip(n, h, w, seed=0):
    """Legacy bench clip (kept: measurement continuity with rounds 1-3;
    the RD corpus lives in hevctpu/pipeline/clips.py)."""
    from hevctpu.pipeline import clips
    return clips.clip_sine(n, h, w, seed=seed)


def _load_params():
    from hevctpu.models import convnet2
    root = os.path.dirname(os.path.abspath(__file__))
    dom = os.path.join(root, "CKPT_DOMAIN.npz")
    if os.path.exists(dom):
        from hevctpu.models import checkpoint
        return checkpoint.load(dom)
    model_path = "/root/reference/rec/hevc_encoder_model.pt"
    if os.path.exists(model_path):
        return convnet2.load_torch_params(model_path)
    return convnet2.init_params(0)


def measure(params, h, w, frames, batch, reps, qp=QP):
    from hevctpu.codec import decoder as streamlib
    from hevctpu.codec import headers
    from hevctpu.pipeline.encoder import FrameEncoder

    y, u, v = synth_clip(frames, h, w)
    enc = FrameEncoder(h, w, qp)
    cfg = headers.StreamConfig(width=w, height=h, qp=qp)

    def run(i, j):
        # fused device step: CNN depth inference + frame encode in one jit
        out = enc.encode_fused(params, y[i:j], u[i:j], v[i:j])
        return streamlib.encode_stream(cfg, [out])

    # Warmup compiles every batch shape the measured loop will use.
    for i in range(0, frames, batch):
        run(i, min(i + batch, frames))

    times = []
    for _ in range(reps):
        t0 = time.time()
        for i in range(0, frames, batch):
            run(i, min(i + batch, frames))
        times.append(time.time() - t0)
    dt = sorted(times)[len(times) // 2]
    return frames / dt


def _baseline(path, key, default):
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)), path)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f).get(key, default)
    return default


def main():
    params = _load_params()

    fps_sd = measure(params, H, W, FRAMES, BATCH, REPS)
    anchor_sd = _baseline("BASELINE_MEASURED.json", "hm_ai_416x240_fps",
                          DEFAULT_ANCHOR_FPS)
    line_sd = {
        "metric": "ai_encode_fps_416x240_qp32",
        "value": round(fps_sd, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps_sd / anchor_sd, 3),
    }
    print(json.dumps(line_sd), file=sys.stderr, flush=True)

    fps_hd = measure(params, H2, W2, FRAMES2, BATCH2, REPS2)
    anchor_hd = _baseline("BASELINE_1080P.json", "hm_ai_1080p_fps",
                          DEFAULT_ANCHOR_1080P_FPS)
    line_hd = {
        "metric": "ai_encode_fps_1080p_qp32",
        "value": round(fps_hd, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps_hd / anchor_hd, 3),
    }

    detail = {"points": [dict(line_sd, anchor_fps=anchor_sd),
                         dict(line_hd, anchor_fps=anchor_hd)]}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)

    print(json.dumps(line_hd))


if __name__ == "__main__":
    main()
