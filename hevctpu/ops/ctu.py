"""CTU partition derivation and static scheduling tables.

The reference prunes HM's recursive CU search with a 3-way gate on the CNN's
per-16x16 depth label (TEncCu.cpp:496-520,929-965): pred > cur recurses
without evaluating, pred == cur evaluates without recursing, so after the
predictor's legality post-processing the CU quadtree is a *pure function* of
the 16 labels. This module materializes that function (plus HEVC's implicit
picture-boundary splits) as vectorized ops over an 8x8 grid of "slots"
(8x8-pel units) per CTU — no recursion, no data-dependent shapes.

Slot grid conventions: slot (sy, sx) covers pixels [8*sy, 8*sy+8) x [8*sx,
8*sx+8) of the CTU. depth in {0,1,2,3} -> CU size {64,32,16,8}. A slot's CU
is the depth-aligned block containing it; "coded" means the slot's 8x8 area
lies inside the picture.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Label -> depth derivation
# ---------------------------------------------------------------------------

# For each slot (sy, sx): the raster index of its 16x16 block in the label
# array, and of that block's quadrant-leader block.
_SY, _SX = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
_BLK16 = (_SY // 2) * 4 + (_SX // 2)                       # [8,8] -> 0..15
_QLEADER = ((_SY // 4) * 2) * 4 + ((_SX // 4) * 2)         # leader block of quadrant


def derive_slot_depths(labels: jnp.ndarray, bh: jnp.ndarray, bw: jnp.ndarray):
    """labels [..., 16] (legal, post-processed), bh/bw [...] = number of CTU
    rows/cols inside the picture (1..64). Returns (depth8, coded8), both
    [..., 8, 8]: per-slot CU depth (label-derived, max'd with the implicit
    boundary splits) and whether the slot is inside the picture."""
    lab_blk = jnp.take_along_axis(
        labels, jnp.broadcast_to(jnp.asarray(_BLK16.ravel()),
                                 labels.shape[:-1] + (64,)), axis=-1)
    lab_blk = lab_blk.reshape(labels.shape[:-1] + (8, 8))
    lab_q = jnp.take_along_axis(
        labels, jnp.broadcast_to(jnp.asarray(_QLEADER.ravel()),
                                 labels.shape[:-1] + (64,)), axis=-1)
    lab_q = lab_q.reshape(labels.shape[:-1] + (8, 8))
    lab0 = labels[..., 0:1, None]

    d_lab = jnp.where(lab_blk == 2, 2, 3)
    d_lab = jnp.where(lab_q == 1, 1, d_lab)
    d_lab = jnp.where(lab0 == 0, 0, d_lab)

    bh = bh[..., None, None]
    bw = bw[..., None, None]
    sy = jnp.asarray(_SY)
    sx = jnp.asarray(_SX)
    d_bnd = jnp.where((bh < 64) | (bw < 64), 1, 0)
    cross32 = ((sy // 4) * 32 + 32 > bh) | ((sx // 4) * 32 + 32 > bw)
    d_bnd = jnp.where(cross32, 2, d_bnd)
    cross16 = ((sy // 2) * 16 + 16 > bh) | ((sx // 2) * 16 + 16 > bw)
    d_bnd = jnp.where(cross16, 3, d_bnd)

    coded = (sy * 8 < bh) & (sx * 8 < bw)
    depth = jnp.maximum(d_lab, d_bnd)
    return depth, jnp.broadcast_to(coded, depth.shape)


# ---------------------------------------------------------------------------
# Z-order tables
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def morton(n: int) -> np.ndarray:
    """[n, n] z-scan index of each (y, x) cell."""
    out = np.zeros((n, n), dtype=np.int32)
    for y in range(n):
        for x in range(n):
            z = 0
            for b in range(n.bit_length()):
                z |= ((x >> b) & 1) << (2 * b)
                z |= ((y >> b) & 1) << (2 * b + 1)
            out[y, x] = z
    return out


@functools.lru_cache(maxsize=None)
def tu_schedule():
    """The static per-CTU TU schedule: a list of steps, each one of
    (size, origin_y, origin_x, z_of_origin_in_4x4_units). Steps are emitted
    in z-order; a step fires only where the partition says a TU of that size
    starts there (decided by masks at run time).

    Layout: for each quadrant q (z-order): a 32-step; for each 16-block t
    inside: a 16-step; for each 8-slot e inside: an 8-step. 84 steps total.
    """
    steps = []
    z16 = morton(16)
    for q in range(4):
        qy, qx = (q // 2) * 32, (q % 2) * 32
        steps.append((32, qy, qx, int(z16[qy // 4, qx // 4])))
        for t in range(4):
            ty, tx = qy + (t // 2) * 16, qx + (t % 2) * 16
            steps.append((16, ty, tx, int(z16[ty // 4, tx // 4])))
            for e in range(4):
                ey, ex = ty + (e // 2) * 8, tx + (e % 2) * 8
                steps.append((8, ey, ex, int(z16[ey // 4, ex // 4])))
    return steps


def tu_size_for_slot(depth8: jnp.ndarray) -> jnp.ndarray:
    """Per-slot luma TU size log2: CU size clamped to the 32 max TU."""
    return jnp.minimum(6 - depth8, 5)


# ---------------------------------------------------------------------------
# Boundary-sample availability
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def boundary_offsets(n: int):
    """Static scan-order boundary sample offsets relative to a TU origin:
    (dy, dx) arrays of length 4n+1 — left column bottom-to-top, corner, top
    row left-to-right (matches intra.fill_reference's expected order)."""
    dy = np.concatenate([np.arange(2 * n - 1, -1, -1), [-1],
                         np.full(2 * n, -1)]).astype(np.int32)
    dx = np.concatenate([np.full(2 * n, -1), [-1],
                         np.arange(0, 2 * n)]).astype(np.int32)
    return dy, dx


def boundary_available(oy: int, ox: int, n: int, z_tu: int,
                       ctu_y: jnp.ndarray, ctu_x: jnp.ndarray,
                       h: int, w: int, scale: int = 1):
    """Availability mask [..., 4n+1] for a TU at static CTU-local origin
    (oy, ox), size n, z-index z_tu (4x4 units). ctu_y/ctu_x are the CTU pixel
    origins (luma coords); `scale` is 2 for chroma planes (all coords here
    are in the component's own sampling grid, CTU span 64/scale).

    Availability = inside picture AND decoded before this TU: within the same
    CTU, z-order; in another CTU, wavefront order (left / above / above-right
    of the current CTU — identical to HM's raster availability).
    """
    span = 64 // scale
    dy, dx = boundary_offsets(n)
    oy = np.asarray(oy)
    ox = np.asarray(ox)
    ly = oy[..., None] + dy if oy.ndim else oy + dy  # CTU-local, static numpy
    lx = ox[..., None] + dx if ox.ndim else ox + dx
    fy = jnp.asarray(ctu_y)[..., None] + ly  # picture coords (may be traced)
    fx = jnp.asarray(ctu_x)[..., None] + lx
    inside = (fy >= 0) & (fx >= 0) & (fy < h) & (fx < w)

    same_ctu = (ly >= 0) & (lx >= 0) & (ly < span) & (lx < span)
    zmap = morton(span // 4)  # z index of each 4-sample unit in this plane
    zb = zmap[np.clip(ly, 0, span - 1) // 4, np.clip(lx, 0, span - 1) // 4]
    z_tu = np.asarray(z_tu)
    decoded_same = zb < (z_tu[..., None] if z_tu.ndim else z_tu)

    # another CTU: for the only reachable cases — left, above, above-left,
    # above-right — the wavefront order d = 2r + c has already decoded it;
    # the below-left region (ly >= span) has not.
    above = ly < 0
    left_of = (lx < 0) & (ly >= 0) & (ly < span)
    decoded = np.where(same_ctu, decoded_same, above | left_of)
    return inside & jnp.asarray(decoded)


def boundary_available_traced(oy, ox, n: int, ctu_y, ctu_x, h: int, w: int,
                              scale: int = 1):
    """Same availability rule as boundary_available, but with *traced* TU
    origins (oy, ox): used inside lax.scan bodies where the TU position is a
    loop index. The TU z-index is derived from the origin via the morton
    table."""
    span = 64 // scale
    dy, dx = boundary_offsets(n)
    ly = oy + jnp.asarray(dy)
    lx = ox + jnp.asarray(dx)
    fy = jnp.asarray(ctu_y)[..., None] + ly
    fx = jnp.asarray(ctu_x)[..., None] + lx
    inside = (fy >= 0) & (fx >= 0) & (fy < h) & (fx < w)

    same_ctu = (ly >= 0) & (lx >= 0) & (ly < span) & (lx < span)
    zmap = jnp.asarray(morton(span // 4))
    zb = zmap[jnp.clip(ly, 0, span - 1) // 4, jnp.clip(lx, 0, span - 1) // 4]
    z_tu = zmap[oy // 4, ox // 4]
    decoded_same = zb < z_tu

    above = ly < 0
    left_of = (lx < 0) & (ly >= 0) & (ly < span)
    decoded = jnp.where(same_ctu, decoded_same, above | left_of)
    return inside & decoded
