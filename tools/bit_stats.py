"""Per-syntax-element bit statistics (the TComCodingStatistics role,
HM_dl TLibCommon/TComCodingStatistics.h: per-syntax bit accounting the
reference compiles in under RExt__DECODER_DEBUG_BIT_STATISTICS).

Runs the golden Python slice coder over a frame dict with a counting
CABAC whose per-bin fractional costs (the 9.3.4.3.2.2 entropy table, the
same discipline as CabacCounter) are attributed to the bin's context
name; bypass and terminate bins are attributed to the most recent
context scope (remainder/sign bypass bins follow their residual
contexts, MPM-index bypass follows prev_intra_luma_pred — the same
grouping TComCodingStatistics uses for EP bins).

Usage:
  python tools/bit_stats.py [--clip pink] [--frames 2] [--qp 32]
  -> prints a per-element table (bits, share) + total vs real stream size

Library use:
  from bit_stats import frame_bit_stats
  stats = frame_bit_stats(cfg, frame_dict, i)   # {name: bits}
"""

import argparse
import collections
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def frame_bit_stats(cfg, frame: dict, i: int = 0) -> dict:
    """{syntax-element name: estimated bits} for one frame's slice data."""
    from hevctpu.codec.cabac import CabacCounter, ContextSet
    from hevctpu.codec.syntax import SliceEncoder

    bits = collections.defaultdict(float)

    class AttributingCounter(CabacCounter):
        def __init__(self, rev):
            super().__init__()
            self.rev = rev
            self.scope = "other"

        def encode_bin(self, ctx, b):
            before = self.bits
            super().encode_bin(ctx, b)
            self.scope = self.rev[id(ctx)]
            bits[self.scope] += self.bits - before

        def encode_bypass(self, b):
            super().encode_bypass(b)
            bits[self.scope + "(ep)"] += 1.0

        def encode_bypass_bins(self, value, n):
            super().encode_bypass_bins(value, n)
            bits[self.scope + "(ep)"] += n

        def encode_terminate(self, b):
            before = self.bits
            super().encode_terminate(b)
            bits["end_of_slice/subset"] += self.bits - before

    class CountingSliceEncoder(SliceEncoder):
        def encode(self):
            from hevctpu.codec import headers as _h
            bw = _h.write_slice_header(self.cfg)
            bits["slice_header"] += len(bw.data()) * 8
            self.ctx = ContextSet(self.cfg.qp, init_type=0)
            rev = {}
            for name, models in self.ctx._ctx.items():
                for k, m in enumerate(models):
                    rev[id(m)] = name
            self.c = AttributingCounter(rev)
            n_ctu = self.rc * self.cc
            self._qp_pred = self.cfg.qp
            for a in range(n_ctu):
                r, c = divmod(a, self.cc)
                self._code_ctu(r, c)
                self.c.encode_terminate(1 if a == n_ctu - 1 else 0)
            return b""

    CountingSliceEncoder(cfg, frame, i).encode()
    return dict(bits)


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")

    ap = argparse.ArgumentParser()
    ap.add_argument("--clip", default="pink")
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--qp", type=int, default=32)
    ap.add_argument("--w", type=int, default=416)
    ap.add_argument("--h", type=int, default=240)
    args = ap.parse_args()

    from hevctpu.codec import decoder as streamlib
    from hevctpu.codec import headers
    from hevctpu.pipeline import clips
    from hevctpu.pipeline.encoder import FrameEncoder

    y, u, v = clips.make_clip(args.clip, args.frames, args.h, args.w)
    enc = FrameEncoder(args.h, args.w, args.qp, search="rd")
    out = enc.encode(y, u, v)
    cfg = headers.StreamConfig(width=args.w, height=args.h, qp=args.qp)

    total = collections.defaultdict(float)
    for i in range(args.frames):
        for k, b in frame_bit_stats(cfg, out, i).items():
            total[k] += b
    stream = streamlib.encode_stream(cfg, [out])
    real_bits = len(stream) * 8
    est = sum(total.values())
    width = max(len(k) for k in total)
    print(f"{'syntax element':<{width}}  {'bits':>12}  share")
    for k, b in sorted(total.items(), key=lambda kv: -kv[1]):
        print(f"{k:<{width}}  {b:12.1f}  {100 * b / est:5.2f}%")
    print(f"{'TOTAL (counted)':<{width}}  {est:12.1f}")
    print(f"{'stream (real, incl. headers/SEI/EP)':<{width}}  "
          f"{real_bits:12d}  ({100 * est / real_bits:.2f}% accounted)")


if __name__ == "__main__":
    main()
