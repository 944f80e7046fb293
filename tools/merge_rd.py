"""Merge per-mode measure_corpus outputs into one RD_MEASURED.json.

measure_corpus.py can be run per mode (rd / cnn) to pipeline device
compiles; this merges the per-clip tables and recomputes the averaged
headline keys.

Usage: python tools/merge_rd.py out.json in1.json in2.json ...
"""

import json
import sys

import numpy as np


def main():
    out_path, *ins = sys.argv[1:]
    docs = [json.load(open(p)) for p in ins]
    base = docs[0]
    for d in docs[1:]:
        for clip, cdoc in d.get("per_clip", {}).items():
            base.setdefault("per_clip", {}).setdefault(clip, {}).update(cdoc)
        proto = base.setdefault("protocol", {})
        for k, v in d.get("protocol", {}).items():
            if k == "cnn_checkpoint" or k not in proto:
                proto[k] = v

    per_clip = base["per_clip"]
    names = list(per_clip)

    def avg(key):
        vals = [per_clip[n][key] for n in names if key in per_clip[n]]
        return round(float(np.mean(vals)), 3) if vals else None

    keys = set()
    for c in per_clip.values():
        keys |= {k for k in c if k.startswith(("bd_", "time_saving"))}
    base["average"] = {k: avg(k) for k in sorted(keys)}
    s = base["average"]
    for mode in ("cnn", "rd"):
        if s.get(f"bd_rate_pct_{mode}") is not None:
            base[f"bd_rate_pct_{mode}_vs_hm_anchor"] = s[f"bd_rate_pct_{mode}"]
            base[f"bd_psnr_db_{mode}_vs_hm_anchor"] = s[f"bd_psnr_db_{mode}"]
    if s.get("bd_rate_pct_cnn_vs_pruned_hm") is not None:
        base["bd_rate_pct_cnn_vs_pruned_hm"] = s["bd_rate_pct_cnn_vs_pruned_hm"]
        base["bd_psnr_db_cnn_vs_pruned_hm"] = s["bd_psnr_db_cnn_vs_pruned_hm"]

    with open(out_path, "w") as f:
        json.dump(base, f, indent=1)
    print("wrote", out_path)
    for k, v in base["average"].items():
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
