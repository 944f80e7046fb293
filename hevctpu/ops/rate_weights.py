"""Per-QP bin-weight correction for ops/rate.py (see
tools/fit_rate_constants.py).

Derivation (2026-08-21, corpus = clips pink/scene/detail, 1200 coded
luma TUs per QP, exact fresh-context CABAC bits from the counting coder):
the hand-calibrated global weights over/under-price the context-coded
bins systematically with QP — measured (estimated context bits / exact
context bits):

    qp 22: 1.136      qp 27: 0.969      qp 32: 0.842      qp 37: 0.796

i.e. context states are less skewed than the global table assumes at low
QP (dense significance maps) and more skewed at high QP (sparse ones).
The correction below scales every ladder/csbf/last context weight by the
inverse measured ratio per QP (cbf weights pinned: they sit outside the
measured residual syntax). A full per-bin least-squares refit is
ill-conditioned (collinear count columns) and was rejected by holdout
validation; the scalar correction captures the dominant, QP-dependent
bias term.
"""

from hevctpu.ops import rate as _rate

_SCALE = {22: 1 / 1.136, 27: 1 / 0.969, 32: 1 / 0.842, 37: 1 / 0.796}
_PIN = ("cbf1", "cbf0")

FITTED = {
    qp: tuple(
        int(round(_rate._W_DEFAULT[f] * (1.0 if f in _PIN else s)))
        for f in _rate._W_FIELDS)
    for qp, s in _SCALE.items()
}
