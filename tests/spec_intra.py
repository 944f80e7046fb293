"""Golden scalar model for the intra tests — re-exported from the package's
spec reference implementation (hevctpu/codec/refimpl.py), which the
verification decoder also uses."""

from hevctpu.codec.refimpl import (  # noqa: F401
    ANGLES, INV_ANGLES, RefSamples, filter_refs, predict, should_filter,
    substitute,
)
