"""Parameter checkpoint save/restore (the serialization role of the
reference's torch.save state_dict, use_model.py:62, rec/hevc_encoder_model.pt)
— orbax when available, with a plain-npz fallback so checkpoints round-trip
in any environment."""

from __future__ import annotations

import os

import numpy as np


def _flatten(params: dict, prefix: str = ""):
    for k, v in params.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            yield from _flatten(v, key)
        else:
            yield key, np.asarray(v)


def save(path: str, params: dict):
    """Save a params pytree. .npz path -> numpy; directory -> orbax."""
    if path.endswith(".npz"):
        np.savez(path, **dict(_flatten(params)))
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load(path: str) -> dict:
    if path.endswith(".npz"):
        flat = np.load(path)
        out: dict = {}
        for key in flat.files:
            parts = key.split("/")
            d = out
            for p in parts[:-1]:
                d = d.setdefault(p, {})
            d[parts[-1]] = flat[key]
        return out
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
