"""ConvNet2 training: the offline step that produced the reference's
hevc_encoder_model.pt (the reference repo ships only the weights; its
training pipeline consumed DEBUG_CTU_DEPTH partition dumps — TEncCu.cpp:
258-275 — paired with the same crops use_model.py:89-99 feeds at inference).

Loss: 4 independent 4-way cross-entropies over the 16 logits (one depth
class per 16×16 quadrant sub-block), matching the per-group argmax the
predictor applies (use_model.py:100-101). The trainer operates on the same
BN-folded parametrization inference uses (models/convnet2.init_params), so
a trained pytree drops straight into the fused predictor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from hevctpu.models import convnet2


def loss_fn(params, x32, x64, digits):
    """Mean grouped cross-entropy. digits [B, 4] in {0..3}."""
    logits = convnet2.forward(params, x32, x64).reshape(-1, 4, 4)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, digits[..., None], axis=-1)[..., 0]
    return nll.mean()


def accuracy(params, x32, x64, digits):
    logits = convnet2.forward(params, x32, x64).reshape(-1, 4, 4)
    return float((jnp.argmax(logits, -1) == digits).mean())


@functools.partial(jax.jit, static_argnums=(0,))
def _train_step(tx, params, opt_state, x32, x64, digits):
    loss, grads = jax.value_and_grad(loss_fn)(params, x32, x64, digits)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def train(x32, x64, digits, *, params=None, epochs: int = 5,
          batch: int = 256, lr: float = 1e-3, seed: int = 0,
          log=print):
    """Train (or fine-tune, when params given) ConvNet2.

    x32 [N,32,32,3], x64 [N,64,64,3] float in [0,1]; digits [N,4] int.
    Returns (params, history). Batches run on the default device."""
    n = x32.shape[0]
    if params is None:
        params = convnet2.init_params(seed)
    params = jax.tree.map(jnp.asarray, params)
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    rng = np.random.default_rng(seed)
    history = []
    for ep in range(epochs):
        order = rng.permutation(n)
        tot = 0.0
        nb = 0
        for i in range(0, n - batch + 1, batch) or [0]:
            idx = order[i: i + batch]
            params, opt_state, loss = _train_step(
                tx, params, opt_state, jnp.asarray(x32[idx]),
                jnp.asarray(x64[idx]), jnp.asarray(digits[idx]))
            tot += float(loss)
            nb += 1
        acc = accuracy(params, jnp.asarray(x32[:2048]), jnp.asarray(x64[:2048]),
                       jnp.asarray(digits[:2048]))
        history.append({"epoch": ep, "loss": tot / max(nb, 1), "acc": acc})
        if log:
            log(f"epoch {ep}: loss {tot / max(nb, 1):.4f} acc {acc:.3f}")
    return jax.tree.map(np.asarray, params), history
