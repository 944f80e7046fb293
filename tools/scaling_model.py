"""Measured communication volume + scaling-efficiency model for the
(frame, tile) mesh.

The reference has no distributed backend at all (SURVEY §2.5); our
multi-chip story is frames data-parallel across hosts (All-Intra frames
independent -> zero inter-frame communication) and CTU-column tiles
across chips with GSPMD-inserted halo collectives for the wavefront's
left/above recon dependencies (TComPattern.cpp:326-457 semantics).

This tool does not trust the analytic story: it compiles the actual
sharded program on a virtual mesh, walks the optimized HLO, and sums the
bytes of every collective (collective-permute / all-gather / all-reduce /
all-to-all), then combines them with the analytic FLOP count and chip
specs into a scaling-efficiency estimate for the 2-host target.

Writes SCALING.md + SCALING.json.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python tools/scaling_model.py [--h 1088 --w 1920 --tile 4]
"""

import argparse
import json
import os
import re
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

# public chip specs (TPU v5e)
BF16_TFLOPS = 197.0
ICI_GBS = 186.0          # ~1.6 Tbps aggregate ICI per chip, each direction
DCN_GBS = 25.0           # per-host data-center network, order of magnitude

_DTYPE_BYTES = {"f32": 4, "s32": 4, "u32": 4, "bf16": 2, "f16": 2,
                "s16": 2, "u16": 2, "s8": 1, "u8": 1, "pred": 1, "f64": 8,
                "s64": 8, "u64": 8}


def hlo_collective_bytes(hlo_text: str):
    """Sum output bytes of collective ops in optimized HLO text."""
    out = {}
    pat = re.compile(
        r"(\w[\w\.\-]*)\s*=\s*((?:\(|)[a-z0-9]+\[[^=]*?)"
        r"(collective-permute|all-gather|all-reduce|all-to-all|"
        r"reduce-scatter)\(", re.I)
    for m in pat.finditer(hlo_text):
        shapes, op = m.group(2), m.group(3).lower()
        total = 0
        for sm in re.finditer(r"([a-z0-9]+)\[([\d,]*)\]", shapes):
            dt, dims = sm.group(1), sm.group(2)
            if dt not in _DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * _DTYPE_BYTES[dt]
        out[op] = out.get(op, 0) + total
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--h", type=int, default=1088)
    ap.add_argument("--w", type=int, default=1920)
    ap.add_argument("--tile", type=int, default=4)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--out", default=os.path.join(ROOT, "SCALING"))
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hevctpu.parallel import ShardedEncoder, make_mesh

    devs = jax.devices()
    mesh = make_mesh(devs, tile=args.tile)
    fr = mesh.shape["frame"]
    b = args.batch * fr
    h, w = args.h, args.w
    enc = ShardedEncoder(h, w, qp=32, mesh=mesh, fixed_depth=1)

    spec = NamedSharding(mesh, P("frame", None, "tile"))
    y = jax.ShapeDtypeStruct((b, h, w), np.int32, sharding=spec)
    u = jax.ShapeDtypeStruct((b, h // 2, w // 2), np.int32, sharding=spec)
    v = jax.ShapeDtypeStruct((b, h // 2, w // 2), np.int32, sharding=spec)
    print(f"lowering sharded step at {h}x{w} tile={args.tile} "
          f"frame={fr} batch={b} ...", flush=True)
    compiled = enc._step.lower(y, u, v).compile()
    txt = compiled.as_text()
    coll = hlo_collective_bytes(txt)
    total_coll = sum(coll.values())

    # analytic per-batch compute (stage-1 dense search dominates):
    # ~35 modes x 4 sizes x 2*8 MAC/pel SATD + candidate RD ~ equal share.
    pels = b * h * w
    flops = pels * 35 * 4 * 2 * 8 * 2 * 2
    t_compute_s = flops / (BF16_TFLOPS * 1e12)
    t_ici_s = total_coll / (ICI_GBS * 1e9)

    # 2-host frame-parallel model: frames split across hosts, no
    # cross-host tensor traffic (AI frames independent); the only DCN
    # cost is shipping each host's bitstream/recon outputs (device->host
    # per-host, host0 gathers ~levels+recon only if muxing centrally; the
    # per-frame payload is the coded stream, ~0.1-1 Mb/frame).
    bitstream_bytes = 0.2e6 * b  # generous 0.2 MB/frame coded payload
    t_dcn_s = bitstream_bytes / (DCN_GBS * 1e9)
    eff_2host = t_compute_s / (t_compute_s / 1 + t_dcn_s)  # per-host work
    # tile-axis efficiency: collectives vs compute on one host
    eff_tile = t_compute_s / (t_compute_s + t_ici_s)

    doc = {
        "shape": {"h": h, "w": w, "batch": b, "tile": args.tile,
                  "frame_axis": fr},
        "collective_bytes": coll,
        "collective_bytes_total": total_coll,
        "collective_bytes_per_frame": total_coll / b,
        "analytic_flops": flops,
        "model": {
            "t_compute_s_at_peak": t_compute_s,
            "t_ici_s": t_ici_s,
            "tile_axis_efficiency": eff_tile,
            "two_host_frame_parallel_efficiency": eff_2host,
            "ici_gbs": ICI_GBS, "dcn_gbs": DCN_GBS,
            "bf16_tflops": BF16_TFLOPS,
        },
    }
    with open(args.out + ".json", "w") as f:
        json.dump(doc, f, indent=1, default=float)

    per_frame_kb = total_coll / b / 1024
    lines = [
        "# SCALING — measured communication volume + efficiency model",
        "",
        f"Compiled the real sharded encode step at {h}x{w}, batch {b}, "
        f"mesh (frame={fr}, tile={args.tile}), and summed every "
        "collective in the optimized HLO:",
        "",
        "| collective | bytes/batch |",
        "|---|---|",
    ]
    for k, vbytes in sorted(coll.items()):
        lines.append(f"| {k} | {vbytes:,} |")
    lines += [
        f"| **total** | **{total_coll:,}** ({per_frame_kb:.1f} KiB/frame) |",
        "",
        "## Model",
        "",
        f"* Tile axis (intra-host, ICI): {per_frame_kb:.1f} KiB/frame of "
        f"halo traffic vs ~{flops / b / 1e9:.1f} GFLOP/frame of search "
        f"compute -> communication/compute time ratio "
        f"{doc['model']['t_ici_s'] / max(doc['model']['t_compute_s_at_peak'], 1e-12):.4f}; "
        f"tile-axis efficiency ~{100 * eff_tile:.1f}% (bounded in practice "
        "by wavefront load imbalance, not bytes).",
        f"* Frame axis (2 hosts, DCN): All-Intra frames are independent "
        "(IntraPeriod=1) — zero cross-host tensor traffic; the only DCN "
        "payload is the coded bitstream (~0.2 MB/frame) -> modeled "
        f"2-host efficiency {100 * eff_2host:.1f}% "
        "(>=85% target met by construction; the residual loss is "
        "batch-tail imbalance when frames % hosts != 0).",
        "",
        f"Specs used: v5e ~{BF16_TFLOPS:.0f} bf16 TFLOP/s, ICI "
        f"~{ICI_GBS:.0f} GB/s/chip, DCN ~{DCN_GBS:.0f} GB/s/host.",
    ]
    with open(args.out + ".md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))


if __name__ == "__main__":
    main()
