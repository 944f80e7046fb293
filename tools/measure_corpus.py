"""Multi-sequence RD measurement: anchor vs pruned-HM vs our encoder.

Implements the reference's evaluation protocol (calc_BDBR/README.md:12 —
>=4 QP points per encoder, Bjontegaard deltas on (bitrate, Y-PSNR)) over
the natural-statistics corpus (hevctpu/pipeline/clips.py), per sequence
and averaged, for four encoders:

  * hm anchor    — unmodified HM 16.20 (tools/build_hm_oracle.sh build)
  * pruned HM    — the reference pipeline: HM gated by ConvNet2 labels
                   (HM_USE_PRED=1, TEncCu.cpp:496-520 semantics) using
                   the reference torch checkpoint
  * ours cnn     — our fused CNN-pruned path (FrameEncoder.encode_fused:
                   the SAME one-jit program bench.py times)
  * ours rd      — our full-RD quadtree search path

HM results are cached in CORPUS_HM.json (keyed by clip/frames/qps) so our
side can be re-measured cheaply after encoder changes.

Output: RD_MEASURED.json (per-sequence tables + averaged BD; legacy
single-clip keys preserved from the sine clip when measured).

Usage: python tools/measure_corpus.py [--frames 8] [--clips pink,scene,pan,detail]
       [--model CKPT_DOMAIN.npz] [--skip-hm] [--out RD_MEASURED.json]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FPS = 30.0


def hm_points(enc_bin, yuv, w, h, n, qps, workdir, labels=None):
    """Run the HM oracle at each QP; labels!=None switches on the
    reference pipeline's pred-file pruning (use_model.py:121-125 txt
    protocol consumed by the patched TEncCu)."""
    from measure_anchor import run_hm

    if labels is not None:
        for k in range(n):
            d = os.path.join(workdir, "pred", str(k))
            os.makedirs(d, exist_ok=True)
            for i in range(labels.shape[1]):
                with open(os.path.join(d, f"ctu{i}.txt"), "w") as f:
                    f.write(" ".join(str(int(x)) for x in labels[k, i]))
        os.environ["HM_USE_PRED"] = "1"
    else:
        os.environ.pop("HM_USE_PRED", None)
    pts = []
    for qp in qps:
        p = run_hm(enc_bin, yuv, w, h, n, qp, workdir)
        pts.append({k: p[k] for k in ("qp", "bitrate_kbps", "psnr_y",
                                      "psnr_u", "psnr_v", "time_s", "fps")})
        print(f"    [hm{'/pred' if labels is not None else ''}] "
              f"QP {qp}: {p['bitrate_kbps']:9.2f} kbps  Y {p['psnr_y']:7.4f}"
              f"  ({p['time_s']:.1f}s)", flush=True)
    return pts


def parse_mode(mode: str):
    """Mode spec -> (base, FrameEncoder kwargs). Base "cnn"|"rd" plus
    dash suffixes: -global (legacy per-bin-type rate model),
    -2p (two_pass recon-feedback refinement)."""
    parts = mode.split("-")
    base = parts[0]
    assert base in ("cnn", "rd"), mode
    kw = {"search": base}
    for s in parts[1:]:
        if s == "global":
            kw["rate_model"] = "global"
        elif s == "2p":
            kw["two_pass"] = True
        else:
            raise ValueError(f"unknown mode suffix {s!r} in {mode!r}")
    return base, kw


_ENC_CACHE = {}


def _get_encoder(h, w, qp, enc_kw):
    """Memoize FrameEncoder instances across clips: each instance owns
    its jitted programs, so re-instantiating per clip recompiles the
    same (h, w, qp, mode) program 4x over the corpus — the dominant cost
    of a corpus sweep on the TPU tunnel."""
    from hevctpu.pipeline.encoder import FrameEncoder
    key = (h, w, qp, tuple(sorted(enc_kw.items())))
    if key not in _ENC_CACHE:
        _ENC_CACHE[key] = FrameEncoder(h, w, qp, **enc_kw)
    return _ENC_CACHE[key]


def ours_points(y, u, v, qps, mode, params, metrics_mod, *, batch=8):
    """Our encoder sweep. cnn mode uses the fused one-jit program
    (CNN inference + encode), the same operating point bench.py times."""
    from hevctpu.codec import decoder as streamlib
    from hevctpu.codec import headers

    h, w = y.shape[-2:]
    n = y.shape[0]
    base, enc_kw = parse_mode(mode)
    pts = []
    for qp in qps:
        enc = _get_encoder(h, w, qp, enc_kw)
        cfg = headers.StreamConfig(width=w, height=h, qp=qp)
        t0 = time.time()
        outs = []
        for i in range(0, n, batch):
            j = min(i + batch, n)
            if base == "cnn":
                outs.append(enc.encode_fused(params, y[i:j], u[i:j], v[i:j]))
            else:
                outs.append(enc.encode(y[i:j], u[i:j], v[i:j]))
        stream = streamlib.encode_stream(cfg, outs)
        dt = time.time() - t0
        bits = len(stream) * 8
        ry = np.concatenate([o["recon_y"] for o in outs])
        ru = np.concatenate([o["recon_u"] for o in outs])
        rv = np.concatenate([o["recon_v"] for o in outs])
        kbps = bits * FPS / n / 1000.0
        pts.append(dict(qp=qp, bitrate_kbps=round(kbps, 2),
                        psnr_y=round(metrics_mod.psnr(y, ry), 4),
                        psnr_u=round(metrics_mod.psnr(u, ru), 4),
                        psnr_v=round(metrics_mod.psnr(v, rv), 4),
                        time_s=round(dt, 3)))
        print(f"    [ours/{mode}] QP {qp}: {kbps:9.2f} kbps  "
              f"Y {pts[-1]['psnr_y']:7.4f}  ({dt:.1f}s)", flush=True)
    return pts


def bd(metrics_mod, anchor, test):
    ra = [p["bitrate_kbps"] for p in anchor]
    pa = [p["psnr_y"] for p in anchor]
    rt = [p["bitrate_kbps"] for p in test]
    pt = [p["psnr_y"] for p in test]
    return (round(metrics_mod.bd_rate(ra, pa, rt, pt), 3),
            round(metrics_mod.bd_psnr(ra, pa, rt, pt), 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--clips", default="pink,scene,pan,detail")
    ap.add_argument("--qps", default="22,27,32,37")
    ap.add_argument("--modes", default="cnn,rd")
    ap.add_argument("--model", default=None,
                    help="checkpoint for OUR cnn mode (.npz or .pt); "
                    "default = reference torch checkpoint")
    ap.add_argument("--hm", default="/tmp/hm/bin/TAppEncoderStatic")
    ap.add_argument("--skip-hm", action="store_true",
                    help="reuse cached CORPUS_HM.json without running HM")
    ap.add_argument("--hm-cache",
                    default=os.path.join(ROOT, "CORPUS_HM.json"))
    ap.add_argument("--out", default=os.path.join(ROOT, "RD_MEASURED.json"))
    args = ap.parse_args()

    import tempfile

    from hevctpu.models import convnet2
    from hevctpu.pipeline import clips, metrics
    from hevctpu.pipeline.clips import make_clip, write_yuv

    h, w = 240, 416
    qps = [int(q) for q in args.qps.split(",")]
    names = args.clips.split(",")
    modes = [m for m in args.modes.split(",") if m and m != "none"]

    ref_pt = "/root/reference/rec/hevc_encoder_model.pt"
    ref_params = (convnet2.load_torch_params(ref_pt)
                  if os.path.exists(ref_pt) else convnet2.init_params(0))
    model_path = args.model or ref_pt
    if model_path.endswith(".npz"):
        from hevctpu.models import checkpoint
        our_params = checkpoint.load(model_path)
    elif os.path.exists(model_path):
        our_params = convnet2.load_torch_params(model_path)
    else:
        our_params = convnet2.init_params(0)

    cache = {}
    if os.path.exists(args.hm_cache):
        with open(args.hm_cache) as f:
            cache = json.load(f)

    result = {"protocol": {
        "w": w, "h": h, "frames": args.frames, "qps": qps,
        "corpus": names, "generator": "hevctpu/pipeline/clips.py",
        "cnn_checkpoint": os.path.basename(model_path)}}
    per_clip = {}

    for name in names:
        print(f"== clip {name} ==", flush=True)
        y, u, v = make_clip(name, args.frames, h, w)
        ck = f"{name}_{args.frames}f_{'-'.join(map(str, qps))}"
        entry = cache.get(ck)
        if entry is None or (not args.skip_hm and entry.get("stale")):
            entry = {}
        if "anchor" not in entry:
            assert not args.skip_hm, f"no cached HM for {ck}"
            with tempfile.TemporaryDirectory() as td:
                yuv = os.path.join(td, "in.yuv")
                write_yuv(yuv, y, u, v)
                entry["anchor"] = hm_points(
                    args.hm, yuv, w, h, args.frames, qps, td)
            cache[ck] = entry
        if "pruned" not in entry:
            assert not args.skip_hm, f"no cached pruned-HM for {ck}"
            labels = np.asarray(convnet2.predict_batch_labels(
                ref_params, y, u, v, h, w))
            with tempfile.TemporaryDirectory() as td:
                yuv = os.path.join(td, "in.yuv")
                write_yuv(yuv, y, u, v)
                entry["pruned"] = hm_points(
                    args.hm, yuv, w, h, args.frames, qps, td, labels=labels)
            cache[ck] = entry
        with open(args.hm_cache, "w") as f:
            json.dump(cache, f, indent=1)

        cdoc = {"anchor": entry["anchor"], "pruned_hm": entry["pruned"]}
        bdr, bdp = bd(metrics, entry["anchor"], entry["pruned"])
        cdoc["bd_rate_pct_pruned_hm"] = bdr
        cdoc["bd_psnr_db_pruned_hm"] = bdp
        at = sum(p["time_s"] for p in entry["anchor"])
        cdoc["time_saving_pct_pruned_hm"] = round(
            100 * (at - sum(p["time_s"] for p in entry["pruned"])) / at, 2)

        for mode in modes:
            pts = ours_points(y, u, v, qps, mode,
                              our_params if mode.startswith("cnn") else None,
                              metrics)
            cdoc[f"ours_{mode}"] = pts
            bdr, bdp = bd(metrics, entry["anchor"], pts)
            cdoc[f"bd_rate_pct_{mode}"] = bdr
            cdoc[f"bd_psnr_db_{mode}"] = bdp
            bdr2, bdp2 = bd(metrics, entry["pruned"], pts)
            cdoc[f"bd_rate_pct_{mode}_vs_pruned_hm"] = bdr2
            cdoc[f"bd_psnr_db_{mode}_vs_pruned_hm"] = bdp2
            cdoc[f"time_saving_pct_{mode}"] = round(
                100 * (at - sum(p["time_s"] for p in pts)) / at, 2)
            print(f"  [{name}/{mode}] BD-rate vs anchor {bdr:+.2f}%  "
                  f"BD-PSNR {bdp:+.3f} dB | vs pruned-HM {bdr2:+.2f}% "
                  f"{bdp2:+.3f} dB", flush=True)
        per_clip[name] = cdoc

    result["per_clip"] = per_clip

    def avg(key):
        vals = [per_clip[n][key] for n in names if key in per_clip[n]]
        return round(float(np.mean(vals)), 3) if vals else None

    summary = {}
    for key in ("bd_rate_pct_pruned_hm", "bd_psnr_db_pruned_hm",
                "time_saving_pct_pruned_hm"):
        summary[key] = avg(key)
    for mode in modes:
        for stem in (f"bd_rate_pct_{mode}", f"bd_psnr_db_{mode}",
                     f"bd_rate_pct_{mode}_vs_pruned_hm",
                     f"bd_psnr_db_{mode}_vs_pruned_hm",
                     f"time_saving_pct_{mode}"):
            summary[stem] = avg(stem)
    result["average"] = summary
    # legacy headline keys consumed by earlier-round readers
    if "cnn" in modes:
        result["bd_rate_pct_cnn_vs_hm_anchor"] = summary["bd_rate_pct_cnn"]
        result["bd_psnr_db_cnn_vs_hm_anchor"] = summary["bd_psnr_db_cnn"]
        result["bd_rate_pct_cnn_vs_pruned_hm"] = \
            summary["bd_rate_pct_cnn_vs_pruned_hm"]
        result["bd_psnr_db_cnn_vs_pruned_hm"] = \
            summary["bd_psnr_db_cnn_vs_pruned_hm"]
    if "rd" in modes:
        result["bd_rate_pct_rd_vs_hm_anchor"] = summary["bd_rate_pct_rd"]
        result["bd_psnr_db_rd_vs_hm_anchor"] = summary["bd_psnr_db_rd"]

    print("\n== corpus average ==")
    for k, val in summary.items():
        print(f"  {k}: {val:+.3f}" if val is not None else f"  {k}: n/a")

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
