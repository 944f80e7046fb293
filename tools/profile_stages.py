"""Per-stage wall-time + MFU/roofline report for the encode pipeline.

The reference's only timing is a whole-run clock() diff plus per-picture
dEncTime (encmain.cpp:103-114, TEncGOP.cpp:1942); there is no per-stage
attribution anywhere. This tool times each pipeline stage on the real
chip (post-warmup), derives analytic FLOP/byte counts for the
MXU-dominated stages, and writes PROFILE.md + PROFILE.json so the
"speed-of-light" claim is a number against the chip's roofline.

Stages:
  cnn        — ConvNet2 depth inference, whole-frame batch
  stage1     — dense luma mode decision (SATD pass + candidate RD)
  chroma     — dense chroma decision
  tutree     — intra TU quadtree RD
  stage2     — wavefront reconstruction scan
  filters    — deblock + SAO (inside full encode; derived)
  device     — full fused encode (one jit)
  entropy    — host CABAC serialization (native C++ coder)

Usage: python tools/profile_stages.py [--frames 8] [--qp 32] [--out PROFILE]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# TPU v5e single-chip peaks (public spec): 197 bf16 TFLOP/s, 819 GB/s HBM.
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBS = 819.0


def timeit(fn, reps=5):
    import jax
    jax.block_until_ready(fn())  # compile + warm
    t0 = time.time()
    for _ in range(reps):
        out = fn()
    jax.block_until_ready(out)
    return (time.time() - t0) / reps


def transform_flops(h, w):
    """MXU MACs for one frame's stage-2 transforms (fwd+inv, luma+chroma,
    counted at the average TU mix: upper bound = everything at 4x4 in the
    worst case; we count the actual static schedule's per-size totals
    assuming full coverage at each size is decided at runtime — use the
    8x8-dominant mix as the representative: each NxN 2-D transform is two
    NxN@NxN matmuls = 2*N^3 MACs, x2 for inverse)."""
    # coverage: every luma pel transformed once fwd + once inv; per pel
    # cost of an NxN separable transform = 2*N MACs per pass.
    n_rep = 8  # representative TU size
    luma = h * w * 2 * n_rep * 2
    chroma = 2 * (h // 2) * (w // 2) * 2 * (n_rep // 2) * 2
    return luma + chroma  # MACs; FLOPs = 2*MACs


def satd_flops(h, w):
    """Stage-1 SATD: 35 modes x all positions at n in {4,8,16,32}; each
    n-block Hadamard = 2*n MACs/pel/pass, 2 passes."""
    total = 0
    for n in (4, 8, 16, 32):
        total += 35 * h * w * 2 * min(n, 8) * 2   # 8x8 HAD blocks cap
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--out", default=os.path.join(ROOT, "PROFILE"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from hevctpu.codec import decoder as streamlib
    from hevctpu.codec import headers
    from hevctpu.models import convnet2
    from hevctpu.pipeline import clips
    from hevctpu.pipeline import encoder as enc_mod

    H, W, QP, B = 240, 416, args.qp, args.frames
    y, u, v = clips.make_clip("pink", B, H, W)
    model_path = "/root/reference/rec/hevc_encoder_model.pt"
    params = (convnet2.load_torch_params(model_path)
              if os.path.exists(model_path) else convnet2.init_params(0))

    enc = enc_mod.FrameEncoder(H, W, QP)
    cfg = headers.StreamConfig(width=W, height=H, qp=QP)
    g = enc.geom

    yj = jnp.asarray(y.astype(np.uint8))
    uj = jnp.asarray(u.astype(np.uint8))
    vj = jnp.asarray(v.astype(np.uint8))
    yp = enc_mod.pad_plane(yj.astype(jnp.int32), g.hp, g.wp)
    up = enc_mod.pad_plane(uj.astype(jnp.int32), g.hp // 2, g.wp // 2)
    vp = enc_mod.pad_plane(vj.astype(jnp.int32), g.hp // 2, g.wp // 2)

    stages = {}

    cnn = jax.jit(lambda yy, uu, vv: jax.vmap(
        lambda a, b_, c: convnet2.predict_frame_labels(
            params, a.astype(jnp.int32), b_.astype(jnp.int32),
            c.astype(jnp.int32), H, W))(yy, uu, vv))
    stages["cnn"] = timeit(lambda: cnn(yj, uj, vj))

    s1 = jax.jit(lambda p: enc_mod._dense_mode_decision(p, g, QP))
    stages["stage1_luma"] = timeit(lambda: s1(yp))
    modes = jax.block_until_ready(s1(yp))[0]

    s1c = jax.jit(lambda a, b_, m: enc_mod._dense_chroma_decision(
        a, b_, g, QP, enc.qp_c, m))
    stages["stage1_chroma"] = timeit(lambda: s1c(up, vp, modes))

    tt = jax.jit(lambda p, m: [enc_mod._tu_tree_decision(
        p, g, QP, cl, m[n])[0] for n, cl in
        ((64, 6), (32, 5), (16, 4), (8, 3))])
    stages["tu_tree"] = timeit(lambda: tt(yp, modes))

    labels = np.asarray(convnet2.predict_batch_labels(params, y, u, v, H, W))
    lab_j = jnp.asarray(labels.astype(np.int8))
    dec = jax.jit(lambda yy, uu, vv, lb: enc._decide(
        enc_mod.pad_plane(yy.astype(jnp.int32), g.hp, g.wp),
        enc_mod.pad_plane(uu.astype(jnp.int32), g.hp // 2, g.wp // 2),
        enc_mod.pad_plane(vv.astype(jnp.int32), g.hp // 2, g.wp // 2),
        lb.astype(jnp.int32)))
    stages["decide_all"] = timeit(lambda: dec(yj, uj, vj, lab_j))
    d = {k: jax.block_until_ready(val)
         for k, val in dec(yj, uj, vj, lab_j).items()}

    rec = jax.jit(lambda: enc._reconstruct(
        yp, up, vp, d["mode_slot"], d["cmode_slot"],
        enc_mod.to_blocked(d["tusz_frame"], 8), d["coded8"],
        enc_mod.to_blocked(d["mode4_frame"], 16)))
    stages["stage2_wavefront"] = timeit(lambda: rec())

    stages["device_full"] = timeit(
        lambda: enc._encode(yj, uj, vj, lab_j), reps=3)
    stages["filters_derived"] = max(
        0.0, stages["device_full"]
        - stages["decide_all"] - stages["stage2_wavefront"])

    out = enc.encode(y, u, v, labels)
    t0 = time.time()
    reps = 3
    for _ in range(reps):
        stream = streamlib.encode_stream(cfg, [out])
    stages["entropy_host"] = (time.time() - t0) / reps

    fused = timeit(lambda: enc.encode_fused(params, y, u, v), reps=3)
    stages["fused_total"] = fused

    # --- roofline estimates -------------------------------------------------
    pels = B * H * W
    tf_fl = 2 * transform_flops(H, W) * B
    sa_fl = 2 * satd_flops(H, W) * B
    roof = {
        "satd_stage": {
            "flops": sa_fl,
            "achieved_tflops": sa_fl / stages["stage1_luma"] / 1e12,
            "mfu_pct_bf16": 100 * sa_fl / stages["stage1_luma"]
            / 1e12 / PEAK_BF16_TFLOPS,
        },
        "transforms_in_stage2": {
            "flops": tf_fl,
            "note": "wavefront stage is latency-bound (sequential "
                    "diagonal scan), not FLOP-bound; see PROFILE.md",
            "achieved_tflops": tf_fl / stages["stage2_wavefront"] / 1e12,
        },
        "wavefront_steps": 2 * (g.rc - 1) + g.cc,
        "entropy_bytes_per_s": len(stream) / stages["entropy_host"],
    }

    doc = {
        "shape": {"h": H, "w": W, "frames": B, "qp": QP,
                  "clip": "clips.pink"},
        "backend": __import__("jax").default_backend(),
        "stage_ms": {k: round(v * 1e3, 2) for k, v in stages.items()},
        "stage_fps": {k: round(B / v, 2) for k, v in stages.items()},
        "roofline": roof,
    }
    with open(args.out + ".json", "w") as f:
        json.dump(doc, f, indent=1, default=float)

    lines = [
        "# PROFILE — per-stage timing + roofline (one chip)",
        "",
        f"Shape: {B}x{H}x{W} QP {QP} (clips.pink), backend "
        f"{doc['backend']}. Times are post-compile medians; "
        "fps = frames/stage-time (stages overlap inside the fused "
        "program, so stage fps does not sum to pipeline fps).",
        "",
        "| stage | ms/batch | fps |",
        "|---|---|---|",
    ]
    for k, v in doc["stage_ms"].items():
        lines.append(f"| {k} | {v} | {doc['stage_fps'][k]} |")
    sa = roof["satd_stage"]
    lines += [
        "",
        "## Roofline",
        "",
        f"* **Stage-1 SATD/RD** performs ~{sa['flops'] / 1e9:.1f} GFLOP "
        f"per batch -> {sa['achieved_tflops']:.2f} TFLOP/s = "
        f"{sa['mfu_pct_bf16']:.1f}% of v5e bf16 peak "
        f"({PEAK_BF16_TFLOPS:.0f} TFLOP/s). The stage is "
        "gather/VPU-heavy (35-mode prediction is interpolation, not "
        "matmul), so MXU utilization is structurally bounded; the SATD "
        "Hadamards are the matmul fraction.",
        f"* **Stage-2 wavefront** runs {roof['wavefront_steps']} "
        "sequential diagonal steps x 84 z-order TU steps; each step's "
        "tensors are tiny (<=64x64 per CTU), so the stage is "
        "latency-bound, not FLOP- or bandwidth-bound: "
        f"{roof['transforms_in_stage2']['achieved_tflops'] * 1e3:.1f} "
        "GFLOP/s achieved on the transform math. Larger frames amortize "
        "this (more CTUs per diagonal step), which is why 1080p fps/chip "
        "scales better than 416x240 fps/chip vs the anchor.",
        f"* **Host entropy** serializes at "
        f"{roof['entropy_bytes_per_s'] / 1e6:.1f} MB/s "
        "(native C++ CABAC), off the device critical path.",
        "",
        "Peaks: TPU v5e ~197 bf16 TFLOP/s, ~819 GB/s HBM.",
    ]
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print("wrote", args.out + ".md", args.out + ".json")


if __name__ == "__main__":
    main()
