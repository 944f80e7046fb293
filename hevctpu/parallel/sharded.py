"""Multi-chip SPMD encoding over a jax.sharding.Mesh.

The reference has no parallelism at all (SURVEY §2.5: single-threaded CTU
raster loop, TEncSlice.cpp:792, plus one detached Python thread). Every axis
here is new TPU-first design, mapped onto structures the reference implies:

  frame axis — data parallel over the frame batch. All-Intra frames are
      independent (IntraPeriod=1, encoder_intra_main.cfg:20-23), so frames
      shard across chips/hosts with zero communication.
  tile axis — spatial sharding of CTU columns. Stage-1 dense mode decision
      is embarrassingly parallel over CU positions; the stage-2 wavefront's
      left/above recon dependencies (TComPattern.cpp:326-457) become XLA
      GSPMD-inserted halo collectives over ICI.

The CNN depth predictor (use_model.py equivalent) is fused into the same
jitted step — the reference's txt-file handshake (TEncCu.cpp:243-255)
becomes a value dependency inside one XLA program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from hevctpu.models import convnet2
from hevctpu.pipeline.encoder import FrameEncoder


def make_mesh(devices=None, tile: int | None = None) -> Mesh:
    """Build a (frame, tile) mesh over the given devices.

    The tile (spatial) axis rides the faster interconnect dimension when the
    device order exposes one; frames shard over the rest.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if tile is None:
        tile = 2 if n % 2 == 0 and n > 1 else 1
    frame = n // tile
    grid = np.asarray(devices[: frame * tile]).reshape(frame, tile)
    return Mesh(grid, ("frame", "tile"))


class ShardedEncoder:
    """One jitted SPMD step: CNN depth inference + full frame encode.

    Inputs are sharded P("frame", None, "tile"): the batch across the frame
    axis, frame columns across the tile axis. The per-frame batch size must
    be a multiple of the mesh's frame-axis size and the padded width a
    multiple of 64*tile.
    """

    def __init__(self, h: int, w: int, qp: int, mesh: Mesh,
                 cnn_params: dict | None = None,
                 fixed_depth: int | None = None,
                 halo_exchange: bool = True):
        assert (cnn_params is None) != (fixed_depth is None), (
            "pass exactly one of cnn_params / fixed_depth")
        self.enc = FrameEncoder(h, w, qp)
        if halo_exchange and mesh.shape["tile"] > 1:
            # Explicit SPMD stage 2: per-tile wavefront tables + ppermute
            # halo exchange of the left-edge/above-right recon strips
            # (~KB per diagonal), replacing the full-width all-gathers
            # GSPMD inserts for the wavefront's traced gathers.
            assert self.enc.geom.cc % mesh.shape["tile"] == 0, (
                "CTU columns must divide the tile axis")
            self.enc.shard_cfg = (mesh, "frame", "tile")
        self.mesh = mesh
        self.cnn_params = cnn_params
        self.fixed_depth = fixed_depth
        spec = NamedSharding(mesh, P("frame", None, "tile"))
        self._step = jax.jit(self._step_impl, in_shardings=(spec, spec, spec))

    def _step_impl(self, y, u, v):
        g = self.enc.geom
        if self.cnn_params is not None:
            labels = jax.vmap(
                lambda yy, uu, vv: convnet2.predict_frame_labels(
                    self.cnn_params, yy, uu, vv, g.h, g.w))(y, u, v)
        else:
            labels = jnp.full((y.shape[0], g.rc * g.cc, 16),
                              self.fixed_depth, jnp.int32)
        out = self.enc._encode_impl(y.astype(jnp.int32),
                                    u.astype(jnp.int32),
                                    v.astype(jnp.int32),
                                    labels.astype(jnp.int32))
        out["labels"] = labels.astype(jnp.int8)
        return out

    def encode(self, y, u, v):
        """y [B,H,W], u/v [B,H/2,W/2] -> dict of numpy arrays (see
        FrameEncoder._encode_impl) plus the derived labels."""
        out = self._step(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v))
        out = {k: np.asarray(val) for k, val in out.items()}
        # same coder-settings marker FrameEncoder.encode sets, so
        # encode_frame_nals' sign-data-hiding guard applies uniformly.
        out["sbh"] = np.bool_(self.enc.sbh)
        return out
