"""Multi-chip parity: the sharded SPMD encoder must reproduce the
single-device encoder bit-exactly.

The tile axis shards CTU columns across devices; GSPMD inserts halo
collectives for the wavefront's left/above/above-right reconstructed-pixel
dependencies (the reference's availability semantics,
TComPattern.cpp:326-457). Every decision and reconstruction array must be
identical to the unsharded program — any drift would silently change the
bitstream.

Runs on the 8-device virtual CPU mesh from conftest.py.
"""

import jax
import numpy as np
import pytest

from hevctpu.parallel import ShardedEncoder, make_mesh
from hevctpu.pipeline.encoder import FrameEncoder


def _clip(b, h, w, seed=7):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    y = np.stack([
        (128 + 70 * np.sin(yy / (7 + i)) * np.cos(xx / (11 + 2 * i))
         + rng.normal(0, 6, (h, w))).clip(0, 255).astype(np.int32)
        for i in range(b)])
    u = np.stack([(128 + 40 * np.cos(yy[::2, ::2] / (9 + i))).astype(np.int32)
                  for i in range(b)])
    v = rng.integers(60, 200, (b, h // 2, w // 2)).astype(np.int32)
    return y, u, v


COMPARED = ["recon_y", "recon_u", "recon_v", "levels_y", "levels_u",
            "levels_v", "cbf_y", "cbf_u", "cbf_v", "cbf4_y", "depth8",
            "coded8", "mode8", "mode4", "nxn8", "csel8", "sao_type",
            "sao_eo", "sao_bp", "sao_off"]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_matches_single_device():
    mesh = make_mesh(jax.devices()[:8], tile=2)     # (frame=4, tile=2)
    assert mesh.shape == {"frame": 4, "tile": 2}
    h, w = 128, 128                                  # 2x2 CTUs, 1 CTU/tile
    b = 4
    y, u, v = _clip(b, h, w)

    sh = ShardedEncoder(h, w, qp=32, mesh=mesh, fixed_depth=1)
    out_s = sh.encode(y, u, v)

    enc = FrameEncoder(h, w, qp=32)
    labels = np.ones((b, enc.geom.rc * enc.geom.cc, 16), np.int32)
    out_1 = enc.encode(y, u, v, labels)

    for k in COMPARED:
        np.testing.assert_array_equal(
            out_s[k], out_1[k], err_msg=f"sharded/single mismatch in {k}")


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_cnn_labels_match():
    """Fused-CNN sharded step == host-labelled single-device encode."""
    from hevctpu.models import convnet2

    mesh = make_mesh(jax.devices()[:8], tile=2)
    h, w = 64, 128
    b = 4
    y, u, v = _clip(b, h, w, seed=3)
    params = convnet2.init_params(0)

    sh = ShardedEncoder(h, w, qp=37, mesh=mesh, cnn_params=params)
    out_s = sh.encode(y, u, v)

    enc = FrameEncoder(h, w, qp=37)
    labels = np.asarray(convnet2.predict_batch_labels(
        params, y, u, v, h, w))
    np.testing.assert_array_equal(out_s["labels"], labels)
    out_1 = enc.encode(y, u, v, labels)
    for k in ("recon_y", "levels_y", "depth8", "mode4"):
        np.testing.assert_array_equal(
            out_s[k], out_1[k], err_msg=f"sharded/single mismatch in {k}")


def test_make_mesh_shapes():
    """Fast tier: mesh factorization invariants (no device compile)."""
    import jax

    from hevctpu.parallel import make_mesh

    devs = jax.devices()
    if len(devs) >= 2:
        m = make_mesh(devs[:2])
        assert m.shape["frame"] * m.shape["tile"] == 2
    m1 = make_mesh(devs[:1])
    assert m1.shape == {"frame": 1, "tile": 1}


def test_wavefront_tiled_tables():
    """Fast tier: the per-tile wavefront tables partition the global
    wavefront exactly — same cells, tile-local column ranges, and the
    per-tile occupancy bound that gives the tile axis its speedup."""
    from hevctpu.pipeline.encoder import Geometry

    g = Geometry(4 * 64, 8 * 64)
    gr, gc, gm = g.wavefront
    for tiles in (1, 2, 4):
        tr, tc, tm = g.wavefront_tiled(tiles)
        assert tr.shape[0] == tiles and tr.shape[1] == gr.shape[0]
        cl = g.cc // tiles
        cells_g = {(d, r, c) for d in range(gr.shape[0])
                   for r, c, m in zip(gr[d], gc[d], gm[d]) if m}
        cells_t = set()
        for t in range(tiles):
            for d in range(tr.shape[0+1] if False else tr.shape[1]):
                for r, c, m in zip(tr[t, d], tc[t, d], tm[t, d]):
                    if m:
                        assert t * cl <= c < (t + 1) * cl
                        cells_t.add((d, int(r), int(c)))
        assert cells_t == cells_g
    # occupancy shrinks with the tile count
    assert g.wavefront_tiled(4)[0].shape[2] <= g.wavefront[0].shape[1]
