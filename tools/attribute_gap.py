"""Attribute the RD gap vs the HM anchor to specific approximations.

The encoder replaces several of HM's serial mechanisms with dense
approximations; this tool isolates what each one costs by measuring
BD-rate/BD-PSNR of matched encoder variants against matched HM anchors
on the natural-statistics corpus:

  base    ours(rd)                 vs HM(full)   — the headline gap
  2pass   ours(rd, two_pass)       vs HM(full)   — recon-feedback decisions
                                                   (TEncSearch.cpp:1129-1170)
  nolf    ours(rd, sao=deblock=off) vs HM(LoopFilterDisable=1, SAO=0)
                                                 — removes in-loop-filter
                                                   quality from the gap
  hdq     ours(rd, rdoq=off)       vs HM(RDOQ=0, RDOQTS=0, SignHide=0)
                                                 — removes RDOQ/SBH quality

If the nolf gap ~= the base gap, the loop filters are not the problem and
the deficit is in mode/split decisions or the rate model; if 2pass closes
a chunk of base, original-neighbor decisions were costing that much.

Writes GAP_ATTRIBUTION.json. HM runs are cached in CORPUS_HM_VARIANTS.json.

Usage: python tools/attribute_gap.py [--clips pink,scene] [--frames 8]
"""

import argparse
import json
import os
import sys
import tempfile

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from measure_anchor import CFG_TEMPLATE  # noqa: E402
from measure_corpus import bd, ours_points  # noqa: E402


def run_hm_variant(enc_bin, yuv, w, h, n, qp, workdir, cfg_overrides):
    """run_hm with HM cfg-line overrides (e.g. SAO: 0)."""
    import re
    import subprocess

    cfg = os.path.join(workdir, f"q{qp}v.cfg")
    bs = os.path.join(workdir, f"q{qp}v.bin")
    rec = os.path.join(workdir, f"q{qp}v.yuv")
    text = CFG_TEMPLATE.format(qp=qp, yuv=yuv, w=w, h=h, n=n, bs=bs, rec=rec)
    for key, val in cfg_overrides.items():
        text = re.sub(rf"(?m)^{key}\s*:.*$", f"{key} : {val}", text)
    with open(cfg, "w") as f:
        f.write(text)
    r = subprocess.run([enc_bin, "-c", cfg], capture_output=True, text=True,
                       timeout=3600, cwd=workdir)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    m = re.search(r"SUMMARY ---.*?\n.*?\n\s+(\d+)\s+[a-z]\s+([\d.]+)\s+"
                  r"([\d.]+)\s+([\d.]+)\s+([\d.]+)\s+([\d.]+)", r.stdout,
                  re.S)
    assert m, r.stdout[-3000:]
    return {"qp": qp, "bitrate_kbps": float(m.group(2)),
            "psnr_y": float(m.group(3)), "psnr_u": float(m.group(4)),
            "psnr_v": float(m.group(5)), "time_s": 0.0}


VARIANTS = {
    "base": (dict(), dict()),
    "2pass": (dict(two_pass=True), dict()),
    "nolf": (dict(sao=False, deblock=False),
             {"SAO": 0, "LoopFilterDisable": 1}),
    "hdq": (dict(rdoq=False, sbh=False),
            {"RDOQ": 0, "RDOQTS": 0, "SignHideFlag": 0}),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--clips", default="pink,scene")
    ap.add_argument("--qps", default="22,27,32,37")
    ap.add_argument("--variants", default="base,2pass,nolf,hdq")
    ap.add_argument("--hm", default="/tmp/hm/bin/TAppEncoderStatic")
    ap.add_argument("--skip-hm", action="store_true")
    ap.add_argument("--out", default=os.path.join(ROOT,
                                                  "GAP_ATTRIBUTION.json"))
    args = ap.parse_args()

    from hevctpu.codec import decoder as streamlib
    from hevctpu.codec import headers
    from hevctpu.pipeline import clips, metrics
    from hevctpu.pipeline.encoder import FrameEncoder

    h, w = 240, 416
    qps = [int(q) for q in args.qps.split(",")]
    cache_path = os.path.join(ROOT, "CORPUS_HM_VARIANTS.json")
    cache = {}
    if os.path.exists(cache_path):
        with open(cache_path) as f:
            cache = json.load(f)

    result = {"protocol": {"clips": args.clips, "frames": args.frames,
                           "qps": qps}}
    for name in args.clips.split(","):
        y, u, v = clips.make_clip(name, args.frames, h, w)
        cdoc = {}
        for vname in args.variants.split(","):
            enc_kw, hm_over = VARIANTS[vname]
            hk = f"{name}_{args.frames}f_{vname}"
            if hk not in cache:
                assert not args.skip_hm, f"no cached HM for {hk}"
                with tempfile.TemporaryDirectory() as td:
                    yuv = os.path.join(td, "in.yuv")
                    clips.write_yuv(yuv, y, u, v)
                    cache[hk] = [run_hm_variant(args.hm, yuv, w, h,
                                                args.frames, qp, td,
                                                hm_over)
                                 for qp in qps]
                with open(cache_path, "w") as f:
                    json.dump(cache, f, indent=1)
            anchor = cache[hk]

            pts = []
            import time as _t
            for qp in qps:
                enc = FrameEncoder(h, w, qp, search="rd", **enc_kw)
                sc_kw = {}
                if not enc_kw.get("sao", True):
                    sc_kw = dict(sao=False, deblock=False)
                if vname == "hdq":
                    sc_kw = dict(sign_data_hiding=False)
                cfg = headers.StreamConfig(width=w, height=h, qp=qp,
                                           **sc_kw)
                out = enc.encode(y, u, v)
                stream = streamlib.encode_stream(cfg, [out])
                kbps = len(stream) * 8 * 30.0 / args.frames / 1000.0
                pts.append(dict(qp=qp, bitrate_kbps=round(kbps, 2),
                                psnr_y=round(metrics.psnr(
                                    y, out["recon_y"]), 4)))
                print(f"[{name}/{vname}] QP {qp}: {kbps:9.2f} kbps "
                      f"Y {pts[-1]['psnr_y']:.4f}", flush=True)
            bdr, bdp = bd(metrics, anchor, pts)
            cdoc[vname] = {"points": pts, "bd_rate_pct": bdr,
                           "bd_psnr_db": bdp}
            print(f"[{name}/{vname}] BD-rate {bdr:+.2f}%  "
                  f"BD-PSNR {bdp:+.3f} dB", flush=True)
            # incremental write: long runs survive interruption
            result[name] = cdoc
            with open(args.out, "w") as f:
                json.dump(result, f, indent=1)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
