"""hevctpu — a TPU-native HEVC All-Intra encoder with a fused CNN CU-depth
predictor, built from scratch in JAX/XLA/Pallas.

Capability target: the wolverinn/HEVC-deep-learning-pipeline reference
(HM 16.20 All-Intra + ConvNet2 CU-depth pruning), re-designed TPU-first:
batched on-device CNN depth inference prunes the CU quadtree, the intra
search/transform/quant path runs as fused XLA/Pallas programs over CTU
wavefronts, and only the final CABAC write is serial (host/native).
"""

__version__ = "0.1.0"

import os as _os


def _enable_compilation_cache():
    """Persistent XLA compilation cache: the encoder jits one program per
    (geometry, QP) and TPU compiles are expensive (minutes through a remote
    tunnel), so cache them across processes. Opt out with
    HEVCTPU_NO_COMPILE_CACHE=1."""
    if _os.environ.get("HEVCTPU_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        path = _os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            _os.path.join(_os.path.expanduser("~"), ".cache", "hevctpu-xla"))
        _os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_enable_compilation_cache()
