"""Benchmark: All-Intra encode throughput (frames/s) on one chip.

Measures the full pipeline — fused CNN depth inference, device frame encode
(dense SATD mode decision + wavefront reconstruction), and CABAC entropy
serialization — at the target operating point, 1080p AI QP 32 (the north
star's ">=5x 1080p fps/chip vs HM CPU"), plus the 416x240 class the
reference cfg ships (bitstream.cfg:1-9). Compile time is excluded (warmup
batch per shape).

Methodology notes (round 5):
  * The device->host link in this environment is a remote TPU tunnel at
    ~4-10 MB/s with 2-3x run-to-run variance (PROFILE.md) — it, not the
    chip, used to dominate and destabilize this benchmark. The encode
    therefore uses the lite wire format (device-computed checksum
    picture-hash instead of recon planes, int8+escape levels, bitpacked
    flags) and batches are double-buffered: batch k+1's device compute
    overlaps batch k's transfer + host CABAC.
  * Each rep's fps and the rep spread are written to BENCH_DETAIL.json;
    the reported value is the median rep.

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
FRAMES = 64
BATCH = 32
REPS = 3

H2, W2 = 1088, 1920
FRAMES2 = 16
BATCH2 = 8   # two batches double-buffer: compute overlaps transfer
REPS2 = 3

# HM 16.20 TAppEncoder, All-Intra main, single CPU thread fallbacks
# (replaced by measured numbers when the anchor has been run here).
DEFAULT_ANCHOR_FPS = 1.3
DEFAULT_ANCHOR_1080P_FPS = 0.1


def synth_clip(n, h, w, seed=0):
    """Legacy bench clip (kept: measurement continuity with rounds 1-4;
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
    cfg = headers.StreamConfig(width=w, height=h, qp=qp,
                               hash_type="checksum")
    spans = [(i, min(i + batch, frames)) for i in range(0, frames, batch)]

    def run_all():
        # Double-buffered: enqueue every batch's device program up front
        # (XLA executes them back-to-back), then drain — each batch's
        # device->host transfer and host CABAC overlap the later batches'
        # device compute.
        pend = [enc.encode_fused_dispatch(params, y[i:j], u[i:j], v[i:j],
                                          lite=True) for i, j in spans]
        streams = []
        for dev_out in pend:
            out = enc.collect(dev_out, lite=True)
            streams.append(streamlib.encode_stream(cfg, [out]))
        return streams

    run_all()  # warmup: compiles every batch shape the loop uses
    fps = []
    for _ in range(reps):
        t0 = time.time()
        run_all()
        fps.append(frames / (time.time() - t0))
    fps.sort()
    return fps[len(fps) // 2], fps


def _baseline(path, key, default):
    p = os.path.join(os.path.dirname(os.path.abspath(__file__)), path)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f).get(key, default)
    return default


def main():
    params = _load_params()

    fps_sd, reps_sd = measure(params, H, W, FRAMES, BATCH, REPS)
    anchor_sd = _baseline("BASELINE_MEASURED.json", "hm_ai_416x240_fps",
                          DEFAULT_ANCHOR_FPS)
    line_sd = {
        "metric": "ai_encode_fps_416x240_qp32",
        "value": round(fps_sd, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps_sd / anchor_sd, 3),
    }
    print(json.dumps(line_sd), file=sys.stderr, flush=True)

    fps_hd, reps_hd = measure(params, H2, W2, FRAMES2, BATCH2, REPS2)
    anchor_hd = _baseline("BASELINE_1080P.json", "hm_ai_1080p_fps",
                          DEFAULT_ANCHOR_1080P_FPS)
    line_hd = {
        "metric": "ai_encode_fps_1080p_qp32",
        "value": round(fps_hd, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps_hd / anchor_hd, 3),
    }

    detail = {"points": [
        dict(line_sd, anchor_fps=anchor_sd,
             rep_fps=[round(f, 3) for f in reps_sd]),
        dict(line_hd, anchor_fps=anchor_hd,
             rep_fps=[round(f, 3) for f in reps_hd]),
    ]}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)

    print(json.dumps(line_hd))


if __name__ == "__main__":
    main()
