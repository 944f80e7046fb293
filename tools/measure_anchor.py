"""Measure the HM 16.20 anchor encoder in this environment.

Runs the unmodified-search HM build (tools/build_hm_oracle.sh) on the same
synthetic 416x240 clip bench.py uses, at the CTC QP sweep {22,27,32,37}
(calc_BDBR/README.md:12 protocol), single CPU thread, and records:

  * hm_ai_416x240_fps       — anchor frames/s at QP 32 (bench.py baseline)
  * rd_anchor               — per-QP (bitrate kbps, Y-PSNR) points for the
                              Bjontegaard BD-rate flow (hevctpu/eval/bdrate.py)

Output: /root/repo/BASELINE_MEASURED.json
Usage:  python tools/measure_anchor.py [--frames 8] [--hm /tmp/hm/bin/...]
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CFG_TEMPLATE = """\
Profile                       : main
MaxCUWidth                    : 64
MaxCUHeight                   : 64
MaxPartitionDepth             : 4
QuadtreeTULog2MaxSize         : 5
QuadtreeTULog2MinSize         : 2
QuadtreeTUMaxDepthInter       : 3
QuadtreeTUMaxDepthIntra       : 3
IntraPeriod                   : 1
DecodingRefreshType           : 1
GOPSize                       : 1
FastSearch                    : 1
SearchRange                   : 64
HadamardME                    : 1
FEN                           : 1
FDM                           : 1
QP                            : {qp}
RDOQ                          : 1
RDOQTS                        : 1
LoopFilterOffsetInPPS         : 1
LoopFilterDisable             : 0
InternalBitDepth              : 8
SAO                           : 1
AMP                           : 1
TransformSkip                 : 1
TransformSkipFast             : 1
SliceMode                     : 0
SEIDecodedPictureHash         : 1
InputFile                     : {yuv}
InputBitDepth                 : 8
InputChromaFormat             : 420
FrameRate                     : 30
FrameSkip                     : 0
SourceWidth                   : {w}
SourceHeight                  : {h}
FramesToBeEncoded             : {n}
Level                         : 3.1
BitstreamFile                 : {bs}
ReconFile                     : {rec}
"""


def run_hm(enc_bin, yuv, w, h, n, qp, workdir):
    cfg = os.path.join(workdir, f"q{qp}.cfg")
    bs = os.path.join(workdir, f"q{qp}.bin")
    rec = os.path.join(workdir, f"q{qp}.yuv")
    with open(cfg, "w") as f:
        f.write(CFG_TEMPLATE.format(qp=qp, yuv=yuv, w=w, h=h, n=n,
                                    bs=bs, rec=rec))
    r = subprocess.run([enc_bin, "-c", cfg], capture_output=True, text=True,
                       timeout=3600, cwd=workdir)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    out = r.stdout
    # SUMMARY row: "  <frames>  a  <bitrate> <Y> <U> <V> <YUV>"
    m = re.search(r"SUMMARY ---.*?\n.*?\n\s+(\d+)\s+[a-z]\s+([\d.]+)\s+"
                  r"([\d.]+)\s+([\d.]+)\s+([\d.]+)\s+([\d.]+)", out, re.S)
    assert m, out[-3000:]
    t = re.search(r"Total Time:\s+([\d.]+)\s+sec", out)
    assert t, out[-2000:]
    return {
        "qp": qp,
        "frames": int(m.group(1)),
        "bitrate_kbps": float(m.group(2)),
        "psnr_y": float(m.group(3)),
        "psnr_u": float(m.group(4)),
        "psnr_v": float(m.group(5)),
        "time_s": float(t.group(1)),
        "fps": int(m.group(1)) / float(t.group(1)),
        "bytes": os.path.getsize(bs),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--hm", default="/tmp/hm/bin/TAppEncoderStatic")
    ap.add_argument("--qps", default="22,27,32,37")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BASELINE_MEASURED.json"))
    args = ap.parse_args()

    import numpy as np

    import bench

    h, w = bench.H, bench.W
    y, u, v = bench.synth_clip(args.frames, h, w)

    with tempfile.TemporaryDirectory() as td:
        yuv = os.path.join(td, "in.yuv")
        with open(yuv, "wb") as f:
            for k in range(args.frames):
                f.write(y[k].astype(np.uint8).tobytes())
                f.write(u[k].astype(np.uint8).tobytes())
                f.write(v[k].astype(np.uint8).tobytes())
        points = []
        for qp in [int(q) for q in args.qps.split(",")]:
            p = run_hm(args.hm, yuv, w, h, args.frames, qp, td)
            print(json.dumps(p))
            points.append(p)

    fps32 = next((p["fps"] for p in points if p["qp"] == 32),
                 points[len(points) // 2]["fps"])
    doc = {
        "hm_ai_416x240_fps": round(fps32, 4),
        "clip": {"w": w, "h": h, "frames": args.frames,
                 "generator": "bench.synth_clip(seed=0)"},
        "rd_anchor": [{k: p[k] for k in
                       ("qp", "bitrate_kbps", "psnr_y", "psnr_u", "psnr_v",
                        "time_s", "fps")} for p in points],
        "encoder": "HM 16.20 anchor (tools/build_hm_oracle.sh, pred=99 "
                   "full search), single thread",
    }
    with open(args.out, "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
