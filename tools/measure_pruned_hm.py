"""Measure the *reference pipeline* RD: HM 16.20 with CNN depth pruning.

Reproduces the reference's exact configuration — HM's recursive search
gated by ConvNet2's per-16x16 depth labels (TEncCu.cpp:496-520) — using
our JAX ConvNet2 port to produce the labels and the portable oracle build
(tools/build_hm_oracle.sh) with HM_USE_PRED=1 consuming them via the
./pred/<frame>/ctu<i>.txt protocol (use_model.py:121-125).

This isolates how much of our BD-rate delta vs the unpruned anchor comes
from the depth pruning itself (shared with the reference pipeline) vs our
own mode-decision / quantization approximations.

Output: PRUNED_HM_MEASURED.json
Usage:  python tools/measure_pruned_hm.py [--frames 8]
"""

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from measure_anchor import run_hm  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--hm", default="/tmp/hm/bin/TAppEncoderStatic")
    ap.add_argument("--qps", default="22,27,32,37")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PRUNED_HM_MEASURED.json"))
    args = ap.parse_args()

    import numpy as np

    import bench
    from hevctpu.models import convnet2
    from hevctpu.pipeline import metrics

    h, w = bench.H, bench.W
    y, u, v = bench.synth_clip(args.frames, h, w)

    model_path = "/root/reference/rec/hevc_encoder_model.pt"
    params = (convnet2.load_torch_params(model_path)
              if os.path.exists(model_path) else convnet2.init_params(0))
    labels = np.asarray(
        convnet2.predict_batch_labels(params, y, u, v, h, w))  # [B, nctu, 16]

    with tempfile.TemporaryDirectory() as td:
        yuv = os.path.join(td, "in.yuv")
        with open(yuv, "wb") as f:
            for k in range(args.frames):
                f.write(y[k].astype(np.uint8).tobytes())
                f.write(u[k].astype(np.uint8).tobytes())
                f.write(v[k].astype(np.uint8).tobytes())
        for k in range(args.frames):
            d = os.path.join(td, "pred", str(k))
            os.makedirs(d, exist_ok=True)
            for i in range(labels.shape[1]):
                with open(os.path.join(d, f"ctu{i}.txt"), "w") as f:
                    f.write(" ".join(str(int(x)) for x in labels[k, i]))

        os.environ["HM_USE_PRED"] = "1"
        points = []
        for qp in [int(q) for q in args.qps.split(",")]:
            p = run_hm(args.hm, yuv, w, h, args.frames, qp, td)
            print(json.dumps(p))
            points.append(p)

    doc = {"clip": {"w": w, "h": h, "frames": args.frames,
                    "generator": "bench.synth_clip(seed=0)"},
           "rd_pruned_hm": [{k: p[k] for k in
                             ("qp", "bitrate_kbps", "psnr_y", "psnr_u",
                              "psnr_v", "time_s", "fps")} for p in points],
           "encoder": "HM 16.20 + ConvNet2 depth pruning (reference "
                      "pipeline, HM_USE_PRED=1), single thread"}

    mpath = os.path.join(os.path.dirname(args.out), "BASELINE_MEASURED.json")
    if os.path.exists(mpath):
        with open(mpath) as f:
            anchor = json.load(f)["rd_anchor"]
        ra = [p["bitrate_kbps"] for p in anchor]
        pa = [p["psnr_y"] for p in anchor]
        rt = [p["bitrate_kbps"] for p in points]
        pt = [p["psnr_y"] for p in points]
        doc["bd_rate_pct_vs_hm_anchor"] = round(metrics.bd_rate(ra, pa, rt, pt), 3)
        doc["bd_psnr_db_vs_hm_anchor"] = round(metrics.bd_psnr(ra, pa, rt, pt), 4)
        at = sum(p["time_s"] for p in anchor)
        tt = sum(p["time_s"] for p in points)
        doc["time_saving_pct"] = round(100.0 * (at - tt) / at, 2)
        print(f"pruned HM vs anchor: BD-rate {doc['bd_rate_pct_vs_hm_anchor']:+.2f}%"
              f"  BD-PSNR {doc['bd_psnr_db_vs_hm_anchor']:+.3f} dB"
              f"  time saving {doc['time_saving_pct']:.1f}%")

    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
