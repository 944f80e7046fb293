"""Independent scalar (numpy) implementation of H.265 intra prediction,
written directly from the spec text (8.4.4.2) in the spec's p[x][y]
convention. Used as the golden model for the vectorized TPU kernels.
"""

import numpy as np

ANGLES = [32, 26, 21, 17, 13, 9, 5, 2, 0, -2, -5, -9, -13, -17, -21, -26, -32,
          -26, -21, -17, -13, -9, -5, -2, 0, 2, 5, 9, 13, 17, 21, 26, 32]
INV_ANGLES = {11: -4096, 12: -1638, 13: -910, 14: -630, 15: -482, 16: -390,
              17: -315, 18: -256, 19: -315, 20: -390, 21: -482, 22: -630,
              23: -910, 24: -1638, 25: -4096}


class RefSamples:
    """p[x][-1] for x in [-1, 2N) and p[-1][y] for y in [-1, 2N)."""

    def __init__(self, top, left, corner):
        self.top = np.asarray(top, dtype=np.int64)      # length 2N: p[0..2N-1][-1]
        self.left = np.asarray(left, dtype=np.int64)    # length 2N: p[-1][0..2N-1]
        self.corner = int(corner)

    def p(self, x, y):
        if x == -1 and y == -1:
            return self.corner
        if y == -1:
            return int(self.top[x])
        assert x == -1
        return int(self.left[y])


def substitute(top, left, corner, avail_top, avail_left, avail_corner, bd=8):
    """8.4.4.2.2 reference sample substitution. avail_* are bool arrays."""
    n2 = len(top)
    scan_vals = [left[n2 - 1 - i] for i in range(n2)] + [corner] + list(top)
    scan_av = [avail_left[n2 - 1 - i] for i in range(n2)] + [avail_corner] + \
        list(avail_top)
    if not any(scan_av):
        v = 1 << (bd - 1)
        return RefSamples([v] * n2, [v] * n2, v)
    first = next(i for i, a in enumerate(scan_av) if a)
    # leading unavailable take the first available; others take previous
    res = []
    prev = scan_vals[first]
    for i in range(len(scan_vals)):
        if scan_av[i]:
            prev = scan_vals[i]
        res.append(prev)
    left_o = [res[n2 - 1 - y] for y in range(n2)]
    corner_o = res[n2]
    top_o = res[n2 + 1:]
    return RefSamples(top_o, left_o, corner_o)


def filter_refs(r: RefSamples, n, strong=True, bd=8):
    """8.4.4.2.3 [1 2 1] filter / strong bilinear filter."""
    n2 = 2 * n
    use_strong = False
    if strong and n == 32:
        thr = 1 << (bd - 5)
        if (abs(r.corner + r.p(n2 - 1, -1) - 2 * r.p(n - 1, -1)) < thr and
                abs(r.corner + r.p(-1, n2 - 1) - 2 * r.p(-1, n - 1)) < thr):
            use_strong = True
    top = np.zeros(n2, dtype=np.int64)
    left = np.zeros(n2, dtype=np.int64)
    if use_strong:
        corner = r.corner
        for x in range(n2 - 1):
            top[x] = ((63 - x) * r.corner + (x + 1) * r.p(63, -1) + 32) >> 6
        top[n2 - 1] = r.p(n2 - 1, -1)
        for y in range(n2 - 1):
            left[y] = ((63 - y) * r.corner + (y + 1) * r.p(-1, 63) + 32) >> 6
        left[n2 - 1] = r.p(-1, n2 - 1)
    else:
        corner = (r.p(-1, 0) + 2 * r.corner + r.p(0, -1) + 2) >> 2
        for x in range(n2 - 1):
            top[x] = (r.p(x - 1, -1) + 2 * r.p(x, -1) + r.p(x + 1, -1) + 2) >> 2
        top[n2 - 1] = r.p(n2 - 1, -1)
        for y in range(n2 - 1):
            left[y] = (r.p(-1, y - 1) + 2 * r.p(-1, y) + r.p(-1, y + 1) + 2) >> 2
        left[n2 - 1] = r.p(-1, n2 - 1)
    return RefSamples(top, left, corner)


def should_filter(mode, n, is_luma=True):
    """8.4.4.2.3 filterFlag."""
    if not is_luma or mode == 1 or n == 4:
        return False
    min_dist = min(abs(mode - 26), abs(mode - 10))
    thresh = {8: 7, 16: 1, 32: 0}[n]
    return mode == 0 or min_dist > thresh


def predict(r: RefSamples, mode, n, is_luma=True, bd=8):
    """Returns pred indexed [y][x]."""
    maxv = (1 << bd) - 1
    pred = np.zeros((n, n), dtype=np.int64)
    if mode == 0:  # planar 8.4.4.2.4
        for y in range(n):
            for x in range(n):
                pred[y, x] = ((n - 1 - x) * r.p(-1, y) + (x + 1) * r.p(n, -1)
                              + (n - 1 - y) * r.p(x, -1) + (y + 1) * r.p(-1, n)
                              + n) >> (int(np.log2(n)) + 1)
        return pred
    if mode == 1:  # DC 8.4.4.2.5
        dc = (sum(r.p(x, -1) for x in range(n))
              + sum(r.p(-1, y) for y in range(n)) + n) >> (int(np.log2(n)) + 1)
        pred[:, :] = dc
        if is_luma and n < 32:
            pred[0, 0] = (r.p(-1, 0) + 2 * dc + r.p(0, -1) + 2) >> 2
            for x in range(1, n):
                pred[0, x] = (r.p(x, -1) + 3 * dc + 2) >> 2
            for y in range(1, n):
                pred[y, 0] = (r.p(-1, y) + 3 * dc + 2) >> 2
        return pred
    # angular 8.4.4.2.6
    angle = ANGLES[mode - 2]
    ref = {}
    if mode >= 18:
        for x in range(0, n + 1):
            ref[x] = r.p(-1 + x, -1)
        if angle < 0:
            if (n * angle) >> 5 < -1:
                inv = INV_ANGLES[mode]
                for x in range(-1, ((n * angle) >> 5) - 1, -1):
                    ref[x] = r.p(-1, -1 + ((x * inv + 128) >> 8))
        else:
            for x in range(n + 1, 2 * n + 1):
                ref[x] = r.p(-1 + x, -1)
        for y in range(n):
            i_idx = ((y + 1) * angle) >> 5
            i_fact = ((y + 1) * angle) & 31
            for x in range(n):
                if i_fact:
                    pred[y, x] = ((32 - i_fact) * ref[x + i_idx + 1]
                                  + i_fact * ref[x + i_idx + 2] + 16) >> 5
                else:
                    pred[y, x] = ref[x + i_idx + 1]
        if mode == 26 and is_luma and n < 32:
            for y in range(n):
                pred[y, 0] = np.clip(
                    r.p(0, -1) + ((r.p(-1, y) - r.corner) >> 1), 0, maxv)
    else:
        for x in range(0, n + 1):
            ref[x] = r.p(-1, -1 + x)
        if angle < 0:
            if (n * angle) >> 5 < -1:
                inv = INV_ANGLES[mode]
                for x in range(-1, ((n * angle) >> 5) - 1, -1):
                    ref[x] = r.p(-1 + ((x * inv + 128) >> 8), -1)
        else:
            for x in range(n + 1, 2 * n + 1):
                ref[x] = r.p(-1, -1 + x)
        for x in range(n):
            i_idx = ((x + 1) * angle) >> 5
            i_fact = ((x + 1) * angle) & 31
            for y in range(n):
                if i_fact:
                    pred[y, x] = ((32 - i_fact) * ref[y + i_idx + 1]
                                  + i_fact * ref[y + i_idx + 2] + 16) >> 5
                else:
                    pred[y, x] = ref[y + i_idx + 1]
        if mode == 10 and is_luma and n < 32:
            for x in range(n):
                pred[0, x] = np.clip(
                    r.p(-1, 0) + ((r.p(x, -1) - r.corner) >> 1), 0, maxv)
    return pred
