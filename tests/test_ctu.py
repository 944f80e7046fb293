"""Partition derivation vs a scalar simulation of the reference's 3-way gate
(TEncCu.cpp:496-520 semantics) plus HEVC implicit boundary splits."""

import numpy as np

from hevctpu.ops import ctu


def _gate_depths(labels, bh, bw):
    """Scalar quadtree recursion mirroring the pruned reference search."""
    depth = np.full((8, 8), -1)
    coded = np.zeros((8, 8), dtype=bool)

    def rec(y0, x0, size, d):
        inside = (y0 + size <= bh) and (x0 + size <= bw)
        if y0 >= bh or x0 >= bw:
            return
        if not inside:
            # implicit boundary split
            h = size // 2
            for dy in (0, h):
                for dx in (0, h):
                    rec(y0 + dy, x0 + dx, h, d + 1)
            return
        pred = labels[(y0 % 64) // 16 * 4 + (x0 % 64) // 16]
        if pred > d and d < 3:
            h = size // 2
            for dy in (0, h):
                for dx in (0, h):
                    rec(y0 + dy, x0 + dx, h, d + 1)
        else:
            s = slice(y0 // 8, (y0 + size) // 8)
            t = slice(x0 // 8, (x0 + size) // 8)
            depth[s, t] = d
            coded[s, t] = True

    rec(0, 0, 64, 0)
    return depth, coded


def test_depths_match_gate_simulation():
    rng = np.random.default_rng(5)
    from hevctpu.models import convnet2

    for trial in range(100):
        quads = rng.integers(0, 4, size=(1, 4, 4))
        labels = np.asarray(convnet2.assemble_ctu_labels(quads))[0]
        bh = int(rng.choice([8, 16, 24, 32, 48, 56, 64]))
        bw = int(rng.choice([8, 16, 24, 32, 48, 56, 64]))
        want_d, want_c = _gate_depths(labels, bh, bw)
        got_d, got_c = ctu.derive_slot_depths(
            labels[None], np.array([bh]), np.array([bw]))
        got_d, got_c = np.asarray(got_d)[0], np.asarray(got_c)[0]
        assert (got_c == want_c).all(), (labels, bh, bw)
        assert (got_d[want_c] == want_d[want_c]).all(), (
            labels, bh, bw, got_d, want_d)


def test_morton():
    z = ctu.morton(4)
    assert z[0, 0] == 0 and z[0, 1] == 1 and z[1, 0] == 2 and z[1, 1] == 3
    assert z[2, 2] == 12 and z[3, 3] == 15


def test_tu_schedule_covers_ctu():
    steps = ctu.tu_schedule()
    assert len(steps) == 84
    # The 8-steps alone tile the CTU
    cover = np.zeros((64, 64), dtype=int)
    for size, oy, ox, _ in steps:
        if size == 8:
            cover[oy:oy + 8, ox:ox + 8] += 1
    assert (cover == 1).all()
    # z-order of emitted origins is nondecreasing per size class
    for s in (8, 16, 32):
        zs = [z for sz, _, _, z in steps if sz == s]
        assert zs == sorted(zs)


def test_boundary_available_basic():
    h, w = 240, 416
    # TU16 at CTU-local (16, 0) in CTU (1, 1): left neighbor is previous CTU.
    av = np.asarray(ctu.boundary_available(
        16, 0, 16, int(ctu.morton(16)[4, 0]),
        np.array([64]), np.array([64]), h, w))[0]
    n = 16
    # left column: rows 47..16 from the left CTU — but rows >= 32 (below the
    # TU) are inside the left *current-row* CTU... local x=-1 -> left CTU,
    # decoded; all inside picture => available up to ly<64.
    assert av[: 2 * n].all()      # left col (ly in [16..47] all < 64)
    assert av[2 * n]              # corner
    assert av[2 * n + 1:].all()   # top row, within CTU z-before + left CTU? in-CTU above region decoded
