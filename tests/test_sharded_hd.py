"""Multi-chip parity at 1080p-class geometry with tile=4 (VERDICT r3
item 5): >=3 CTU columns per shard, multiple CTU rows, so GSPMD halo
exchange crosses real shard boundaries in both wavefront directions.

Bit-exact parity between the sharded program on the virtual 8-device
mesh and the single-device encoder is the whole test: any halo/
availability mismatch corrupts reconstruction deterministically.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.mark.slow
def test_tile4_parity_1080p_class():
    from hevctpu.parallel import ShardedEncoder, make_mesh
    from hevctpu.pipeline import clips
    from hevctpu.pipeline.encoder import FrameEncoder

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(jax.devices()[:8], tile=4)
    # 1080p-class: full 1088 height (17 CTU rows); width 768 = 12 CTU
    # columns -> 3 per shard (>=2 per the verdict's ask). Full 1920 width
    # triples the runtime on the 2-core CI box for no extra boundary
    # structure; the shard-boundary pattern is identical.
    h, w = 1088, 768
    y, u, v = clips.make_clip("scene", 2, h, w)

    enc = ShardedEncoder(h, w, qp=32, mesh=mesh, fixed_depth=1)
    out = enc.encode(y, u, v)

    single = FrameEncoder(h, w, qp=32)
    ref = single.encode(y, u, v, np.asarray(out["labels"]))
    for k in ("recon_y", "recon_u", "recon_v", "levels_y", "levels_u",
              "levels_v", "depth8", "mode4", "cbf_y", "tusz8"):
        np.testing.assert_array_equal(
            np.asarray(out[k]), np.asarray(ref[k]),
            err_msg=f"sharded/single mismatch in {k}")
