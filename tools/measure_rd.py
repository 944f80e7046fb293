"""Measure our encoder's RD curve and BD-rate/BD-PSNR vs the HM anchor.

Runs the TPU encoder on bench.py's synthetic clip at the CTC QP sweep
{22,27,32,37} (calc_BDBR/README.md:12 protocol), computes per-QP
(bitrate kbps @30fps, Y/U/V PSNR), and — when BASELINE_MEASURED.json has
the anchor curve (tools/measure_anchor.py) — the Bjontegaard deltas
(BjontegaardMetric_Python3 semantics, hevctpu/pipeline/metrics.py).

Usage: python tools/measure_rd.py [--frames 8] [--out RD_MEASURED.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

QPS = (22, 27, 32, 37)
FPS = 30.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--modes", default="cnn,rd")
    ap.add_argument("--model", default=None,
                    help="CNN checkpoint (.pt or .npz) for the cnn mode; "
                    "defaults to the reference torch checkpoint")
    ap.add_argument("--out", default=os.path.join(ROOT, "RD_MEASURED.json"))
    args = ap.parse_args()

    import bench
    from hevctpu.codec import decoder as streamlib
    from hevctpu.codec import headers
    from hevctpu.models import convnet2
    from hevctpu.pipeline import metrics
    from hevctpu.pipeline.encoder import FrameEncoder

    h, w = bench.H, bench.W
    y, u, v = bench.synth_clip(args.frames, h, w)

    model_path = args.model or "/root/reference/rec/hevc_encoder_model.pt"
    if model_path.endswith(".npz"):
        from hevctpu.models import checkpoint
        params = checkpoint.load(model_path)
    elif os.path.exists(model_path):
        params = convnet2.load_torch_params(model_path)
    else:
        params = convnet2.init_params(0)

    labels = np.asarray(
        convnet2.predict_batch_labels(params, y, u, v, h, w))

    result = {"clip": {"w": w, "h": h, "frames": args.frames,
                       "generator": "bench.synth_clip(seed=0)"}}

    for search in args.modes.split(","):
        points = []
        for qp in QPS:
            enc = FrameEncoder(h, w, qp, search=search)
            out = enc.encode(y, u, v, labels)
            cfg = headers.StreamConfig(width=w, height=h, qp=qp)
            t0 = time.time()
            stream = streamlib.encode_stream(cfg, [out])
            dt = time.time() - t0
            bits = len(stream) * 8
            py = metrics.psnr(y, out["recon_y"])
            pu = metrics.psnr(u, out["recon_u"])
            pv = metrics.psnr(v, out["recon_v"])
            kbps = bits * FPS / args.frames / 1000.0
            points.append(dict(qp=qp, bitrate_kbps=round(kbps, 2),
                               psnr_y=round(py, 4), psnr_u=round(pu, 4),
                               psnr_v=round(pv, 4)))
            print(f"[{search}] QP {qp}: {kbps:9.2f} kbps  Y {py:7.4f}  "
                  f"U {pu:7.4f} V {pv:7.4f}  (entropy {dt:.2f}s)")
        result[f"rd_test_{search}"] = points
        if search == "cnn":
            result["rd_test"] = points  # back-compat key

        rt = [p["bitrate_kbps"] for p in points]
        pt = [p["psnr_y"] for p in points]
        for tag, path, key in (
                ("hm_anchor", "BASELINE_MEASURED.json", "rd_anchor"),
                ("pruned_hm", "PRUNED_HM_MEASURED.json", "rd_pruned_hm")):
            mpath = os.path.join(ROOT, path)
            if not os.path.exists(mpath):
                continue
            with open(mpath) as f:
                anchor = json.load(f)[key]
            ra = [p["bitrate_kbps"] for p in anchor]
            pa = [p["psnr_y"] for p in anchor]
            bdr = metrics.bd_rate(ra, pa, rt, pt)
            bdp = metrics.bd_psnr(ra, pa, rt, pt)
            result[f"bd_rate_pct_{search}_vs_{tag}"] = round(bdr, 3)
            result[f"bd_psnr_db_{search}_vs_{tag}"] = round(bdp, 4)
            print(f"[{search}] BD-rate vs {tag}: {bdr:+.2f}%   "
                  f"BD-PSNR: {bdp:+.3f} dB")
    if "bd_rate_pct_cnn_vs_hm_anchor" in result:
        result["bd_rate_pct_vs_hm_anchor"] = \
            result["bd_rate_pct_cnn_vs_hm_anchor"]
        result["bd_psnr_db_vs_hm_anchor"] = \
            result["bd_psnr_db_cnn_vs_hm_anchor"]

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
