"""Per-stage wall-time breakdown of the encode pipeline on the real chip.

Times (post-warmup): CNN depth inference, stage-1 dense mode decision,
stage-2 wavefront reconstruction (by re-jitting the full encode and the
mode-decision alone), and host CABAC serialization. Prints one line per
stage so optimization targets the measured bottleneck.
"""

import time

import jax
import numpy as np

import bench
from hevctpu.codec import decoder as streamlib
from hevctpu.codec import headers
from hevctpu.models import convnet2
from hevctpu.pipeline import encoder as enc_mod

H, W, QP = bench.H, bench.W, bench.QP
FRAMES = 8


def timeit(name, fn, reps=3):
    fn()  # warmup/compile
    t0 = time.time()
    for _ in range(reps):
        out = fn()
        jax.block_until_ready(out) if hasattr(out, "block_until_ready") or (
            isinstance(out, (list, tuple, dict))) else None
    dt = (time.time() - t0) / reps
    print(f"{name:35s} {dt * 1e3:9.1f} ms  ({FRAMES / dt:7.2f} fps)")
    return dt


def main():
    y, u, v = bench.synth_clip(FRAMES, H, W)
    params = convnet2.init_params(0)
    enc = enc_mod.FrameEncoder(H, W, QP)
    cfg = headers.StreamConfig(width=W, height=H, qp=QP)
    g = enc.geom

    yj = np.asarray(y)
    labels = np.asarray(convnet2.predict_batch_labels(params, y, u, v, H, W))

    timeit("cnn predict_batch_labels", lambda: np.asarray(
        convnet2.predict_batch_labels(params, y, u, v, H, W)))

    import jax.numpy as jnp
    yp = enc_mod.pad_plane(jnp.asarray(yj, jnp.int32), g.hp, g.wp)

    md = jax.jit(lambda p: enc_mod._dense_mode_decision(p, g, QP))
    timeit("stage1 dense_mode_decision", lambda: jax.block_until_ready(md(yp)))

    up = enc_mod.pad_plane(jnp.asarray(u, jnp.int32), g.hp // 2, g.wp // 2)
    vp = enc_mod.pad_plane(jnp.asarray(v, jnp.int32), g.hp // 2, g.wp // 2)
    modes = jax.jit(lambda p: enc_mod._dense_mode_decision(p, g, QP))(yp)[0]
    cd = jax.jit(lambda a, b_, m: enc_mod._dense_chroma_decision(
        a, b_, g, QP, enc.qp_c, m))
    timeit("stage1 dense_chroma_decision",
           lambda: jax.block_until_ready(cd(up, vp, modes)))

    full = timeit("full encode (s1+s2+deblock)",
                  lambda: enc.encode(y, u, v, labels))

    out = enc.encode(y, u, v, labels)
    timeit("host CABAC encode_stream",
           lambda: streamlib.encode_stream(cfg, [out]))
    print(f"total fps incl. entropy ~ see bench.py; device encode {full*1e3:.0f} ms")


if __name__ == "__main__":
    main()
