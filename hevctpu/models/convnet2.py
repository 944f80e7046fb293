"""ConvNet2 CU-depth predictor in JAX, with torch checkpoint import.

Equivalent of the reference's PyTorch model + per-CTU serial driver
(use_model.py:16-127 in /root/reference): a two-branch CNN that maps a 32x32
RGB crop plus its containing 64x64 crop to 4 depth labels (one per 16x16
quarter). Differences by design:

  * BatchNorm (eval mode) is folded into the conv weights at import time.
  * Inference is batched over every (CTU, quadrant) of a frame in one jitted
    call, instead of one forward pass per crop behind a txt-file handoff.
  * The legality post-processing (use_model.py:102-118) is vectorized.
  * Input comes straight from the YUV planes on device (BT.601 -> RGB),
    instead of a ffmpeg-JPEG roundtrip on disk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_BN_EPS = 1e-5


def load_torch_params(pt_path: str) -> dict:
    """Load the reference checkpoint and fold BN into conv/linear weights.

    Returns a dict of numpy arrays: conv kernels in HWIO, linear weights as
    [in, out] with the fc1 input reordered from torch's CHW flatten to our
    HWC flatten.
    """
    import torch

    sd = torch.load(pt_path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    params = {}

    def fold_conv(prefix):
        w = sd[f"{prefix}.0.weight"]            # OIHW
        b = sd[f"{prefix}.0.bias"]
        gamma = sd[f"{prefix}.1.weight"]
        beta = sd[f"{prefix}.1.bias"]
        mean = sd[f"{prefix}.1.running_mean"]
        var = sd[f"{prefix}.1.running_var"]
        scale = gamma / np.sqrt(var + _BN_EPS)
        w = w * scale[:, None, None, None]
        b = (b - mean) * scale + beta
        params[prefix] = {
            "w": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),  # HWIO
            "b": b.astype(np.float32),
        }

    for p in ("conv1", "conv64", "conv2", "conv3"):
        fold_conv(p)

    def linear(prefix, torch_key):
        w = sd[f"{torch_key}.weight"]  # [out, in]
        b = sd[f"{torch_key}.bias"]
        params[prefix] = {"w": w.T.astype(np.float32), "b": b.astype(np.float32)}

    linear("fc1", "fc1.0")
    linear("fc2", "fc2.0")
    linear("fc3", "fc3")

    # Reorder fc1 input from torch CHW (128,4,4) to our HWC (4,4,128) flatten.
    w = params["fc1"]["w"]  # [2048, 256] indexed by c*16 + h*4 + w
    idx = np.arange(2048)
    c, rem = idx // 16, idx % 16
    h, wcol = rem // 4, rem % 4
    hwc = h * (4 * 128) + wcol * 128 + c
    w_new = np.zeros_like(w)
    w_new[hwc] = w
    params["fc1"]["w"] = w_new
    return params


def init_params(seed: int = 0) -> dict:
    """Random parameters with the checkpoint's shapes (He-scaled), for tests,
    dry runs and training from scratch — same pytree as load_torch_params."""
    rng = np.random.default_rng(seed)

    def conv(kh, kw, ci, co):
        std = float(np.sqrt(2.0 / (kh * kw * ci)))
        return {"w": rng.normal(0, std, (kh, kw, ci, co)).astype(np.float32),
                "b": np.zeros(co, np.float32)}

    def lin(ci, co):
        std = float(np.sqrt(2.0 / ci))
        return {"w": rng.normal(0, std, (ci, co)).astype(np.float32),
                "b": np.zeros(co, np.float32)}

    return {"conv1": conv(5, 5, 3, 16), "conv64": conv(5, 5, 3, 16),
            "conv2": conv(3, 3, 32, 64), "conv3": conv(3, 3, 64, 128),
            "fc1": lin(2048, 256), "fc2": lin(256, 64), "fc3": lin(64, 16)}


def _conv(x, p, stride=1):
    out = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["w"]), (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return out + jnp.asarray(p["b"])


def _maxpool(x, k):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, k, k, 1), "VALID")


def forward(params: dict, x32: jnp.ndarray, x64: jnp.ndarray) -> jnp.ndarray:
    """x32 [B,32,32,3], x64 [B,64,64,3] in [0,1] -> logits [B, 16]."""
    a = _maxpool(jax.nn.relu(_conv(x32, params["conv1"])), 2)   # [B,16,16,16]
    b = _maxpool(jax.nn.relu(_conv(x64, params["conv64"])), 4)  # [B,16,16,16]
    out = jnp.concatenate([a, b], axis=-1)                      # [B,16,16,32]
    out = _maxpool(jax.nn.relu(_conv(out, params["conv2"])), 2)  # [B,8,8,64]
    out = _maxpool(jax.nn.relu(_conv(out, params["conv3"])), 2)  # [B,4,4,128]
    out = out.reshape(out.shape[0], -1)                          # HWC flatten
    out = jax.nn.relu(out @ jnp.asarray(params["fc1"]["w"]) + jnp.asarray(params["fc1"]["b"]))
    out = jax.nn.relu(out @ jnp.asarray(params["fc2"]["w"]) + jnp.asarray(params["fc2"]["b"]))
    return out @ jnp.asarray(params["fc3"]["w"]) + jnp.asarray(params["fc3"]["b"])


# ---------------------------------------------------------------------------
# Legality post-processing (vectorized form of use_model.py:101-119)
# ---------------------------------------------------------------------------


def postprocess_quadrant(digits: jnp.ndarray) -> jnp.ndarray:
    """Per-quadrant upgrade rules on [..., 4] depth digits in {0..3}:
    any 0 mixed with non-0 -> 0s become 1; then any 1 mixed with non-1 ->
    1s become 2."""
    has0 = jnp.any(digits == 0, axis=-1, keepdims=True)
    all0 = jnp.all(digits == 0, axis=-1, keepdims=True)
    digits = jnp.where(has0 & ~all0 & (digits == 0), 1, digits)
    has1 = jnp.any(digits == 1, axis=-1, keepdims=True)
    all1 = jnp.all(digits == 1, axis=-1, keepdims=True)
    digits = jnp.where(has1 & ~all1 & (digits == 1), 2, digits)
    return digits


def assemble_ctu_labels(quad_digits: jnp.ndarray) -> jnp.ndarray:
    """[..., 4 quadrants, 4 digits] -> [..., 16] labels in 16x16 raster order,
    applying the cross-quadrant consistency chain: quadrant q>0 may only stay
    all-zero if quadrant q-1's first digit is zero (use_model.py:108-118)."""
    q = postprocess_quadrant(quad_digits)
    z = jnp.all(q == 0, axis=-1)  # [..., 4]
    keep0 = z[..., 0]
    keep1 = z[..., 1] & keep0
    keep2 = z[..., 2] & keep1
    keep3 = z[..., 3] & keep2
    keep = jnp.stack([keep0, keep1, keep2, keep3], axis=-1)
    q = jnp.where((z & ~keep)[..., None], jnp.full_like(q, 1), q)
    # quadrant digits are the 2x2 16x16-blocks of that quadrant, row-major;
    # scatter into the CTU's 4x4 raster of 16x16 blocks.
    out = q.reshape(*q.shape[:-2], 2, 2, 2, 2)   # [qy, qx, dy, dx]
    out = jnp.moveaxis(out, (-4, -3, -2, -1), (-4, -2, -3, -1))
    return out.reshape(*q.shape[:-2], 16)


def logits_to_labels(logits: jnp.ndarray) -> jnp.ndarray:
    """[..., 16] logits -> [..., 4] depth digits via per-group argmax."""
    return jnp.argmax(logits.reshape(*logits.shape[:-1], 4, 4), axis=-1)


# ---------------------------------------------------------------------------
# Frame -> CTU crops (replaces gen_frames.py + PIL cropping)
# ---------------------------------------------------------------------------


def yuv_to_rgb01(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Limited-range BT.601 YUV420 planes -> RGB in [0,1], [H,W,3].
    U/V are upsampled 2x nearest (matches the consumer-grade path the
    reference takes through ffmpeg JPEGs closely enough for the classifier)."""
    u2 = jnp.repeat(jnp.repeat(u, 2, axis=0), 2, axis=1).astype(jnp.float32)
    v2 = jnp.repeat(jnp.repeat(v, 2, axis=0), 2, axis=1).astype(jnp.float32)
    yf = y.astype(jnp.float32)
    c = 1.164 * (yf - 16.0)
    d = u2 - 128.0
    e = v2 - 128.0
    r = c + 1.596 * e
    g = c - 0.392 * d - 0.813 * e
    b = c + 2.017 * d
    rgb = jnp.stack([r, g, b], axis=-1)
    return jnp.clip(jnp.round(rgb), 0, 255) / 255.0


def frame_to_crops(rgb: jnp.ndarray, h: int, w: int):
    """RGB [H,W,3] -> (x32 [nCTU*4,32,32,3], x64 [nCTU,64,64,3]) with
    out-of-frame area zero-padded (PIL-crop semantics). CTUs row-major,
    quadrants row-major within each CTU."""
    ctus_y, ctus_x = -(-h // 64), -(-w // 64)
    ph, pw = ctus_y * 64, ctus_x * 64
    rgb = jnp.pad(rgb, ((0, ph - h), (0, pw - w), (0, 0)))
    x64 = rgb.reshape(ctus_y, 64, ctus_x, 64, 3).transpose(0, 2, 1, 3, 4)
    x64 = x64.reshape(-1, 64, 64, 3)
    x32 = x64.reshape(-1, 2, 32, 2, 32, 3).transpose(0, 1, 3, 2, 4, 5)
    x32 = x32.reshape(-1, 32, 32, 3)
    return x32, x64


@functools.partial(jax.jit, static_argnums=(4, 5))
def predict_frame_labels(params, y, u, v, h: int, w: int) -> jnp.ndarray:
    """Full fused predictor: YUV planes -> [nCTU, 16] legal depth labels."""
    rgb = yuv_to_rgb01(y, u, v)
    x32, x64 = frame_to_crops(rgb, h, w)
    n_ctu = x64.shape[0]
    x64_rep = jnp.repeat(x64, 4, axis=0)
    logits = forward(params, x32, x64_rep)               # [nCTU*4, 16]
    digits = logits_to_labels(logits)                    # [nCTU*4, 4]
    return assemble_ctu_labels(digits.reshape(n_ctu, 4, 4))


@functools.partial(jax.jit, static_argnums=(4, 5))
def predict_batch_labels(params, y, u, v, h: int, w: int) -> jnp.ndarray:
    """Batched predictor: YUV planes [B, ...] -> [B, nCTU, 16] labels.

    One device program for the whole frame batch — the reference runs the
    CNN per-CTU at batch size 1 on a detached thread (use_model.py:85-101);
    here every (frame, CTU, quadrant) is one fused batch."""
    fn = lambda yy, uu, vv: predict_frame_labels(params, yy, uu, vv, h, w)
    return jax.vmap(fn)(y, u, v)
