"""Dropout MLP with heteroscedastic variance head.

Rebuilds the reference ``DNN`` (01:389-438) as a pure-functional pytree:

- hidden trunk: Linear → Tanh → Dropout(p) per hidden layer (01:400-404);
- mean head: single Linear (01:410);
- variance head: Linear(h→h/2) → Tanh → Dropout(p) → Linear(h/2→h/4) → Tanh
  → Linear(h/4→1), then ``logvar = log(softplus(v) + 1e-6)`` (01:412-434).

Dropout is an explicit argument (rate + PRNG key + train flag) instead of
module state, which is what makes the MC-dropout sampler a single ``vmap``
over keys (see pinnfc_tpu.uq.mc_dropout) rather than the reference's serial
p-mutation loop (01:1448-1464).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

# A pytree: {'hidden': [{'w','b'}...], 'mean': {'w','b'}, 'var': [{'w','b'}x3]}
MLPParams = Dict[str, Any]


def _init_linear(key, fan_in: int, fan_out: int, dtype=jnp.float32):
    """torch.nn.Linear default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for
    both weight and bias — kept so training dynamics match the reference."""
    kw, kb = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    w = jax.random.uniform(kw, (fan_in, fan_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (fan_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def init_mlp(key, layers: Sequence[int] = (8, 256, 256, 256, 1), dtype=jnp.float32) -> MLPParams:
    """Initialize parameters for layer sizes ``layers`` (reference 01:2139).

    Jitted: one compiled program (persistent-cache friendly) instead of
    ~28 eager PRNG dispatches — material through a remote-compile relay."""
    return _init_mlp_jit(key, tuple(layers), dtype)


@partial(jax.jit, static_argnames=("layers", "dtype"))
def _init_mlp_jit(key, layers, dtype):
    depth = len(layers) - 1
    keys = jax.random.split(key, depth + 3)
    hidden = [
        _init_linear(keys[i], layers[i], layers[i + 1], dtype)
        for i in range(depth - 1)
    ]
    h = layers[-2]
    mean = _init_linear(keys[depth - 1], h, layers[-1], dtype)
    var = [
        _init_linear(keys[depth], h, h // 2, dtype),
        _init_linear(keys[depth + 1], h // 2, h // 4, dtype),
        _init_linear(keys[depth + 2], h // 4, layers[-1], dtype),
    ]
    return {"hidden": hidden, "mean": mean, "var": var}


def _dropout(x, rate: float, key):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(key, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def mlp_forward(
    params: MLPParams,
    x: jnp.ndarray,
    *,
    dropout_p: float = 0.2,
    train: bool = False,
    rng: Optional[jax.Array] = None,
    logvar: bool = True,
    precision: str = "highest",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward pass → (mean, logvar), both (N, 1).

    ``train=True`` activates dropout (needs ``rng``); ``train=False`` is the
    torch ``eval()`` path.  ``dropout_p`` is a traced-or-static scalar so the
    MC sampler can override the rate (reference 01:1448-1454) without
    rebuilding anything.

    ``precision``: matmul precision request.  The backend's default truncates
    f32 matmuls MXU-style (~1e-2 relative error), which breaks parity with
    the f32 torch reference; 'highest' restores full f32 accumulation.  Pass
    'default' for the throughput-first bf16 path.
    """

    def mm(a, w):
        return jnp.matmul(a, w, precision=precision)

    h = x
    n_hidden = len(params["hidden"])
    if train:
        if rng is None:
            raise ValueError("train=True requires a dropout rng key")
        keys = jax.random.split(rng, n_hidden + 1)
    for i, layer in enumerate(params["hidden"]):
        h = jnp.tanh(mm(h, layer["w"]) + layer["b"])
        if train:
            h = _dropout(h, dropout_p, keys[i])

    mean = mm(h, params["mean"]["w"]) + params["mean"]["b"]

    if not logvar:
        return mean, jnp.zeros_like(mean)

    v = jnp.tanh(mm(h, params["var"][0]["w"]) + params["var"][0]["b"])
    if train:
        v = _dropout(v, dropout_p, keys[n_hidden])
    v = jnp.tanh(mm(v, params["var"][1]["w"]) + params["var"][1]["b"])
    v = mm(v, params["var"][2]["w"]) + params["var"][2]["b"]
    log_var = jnp.log(jax.nn.softplus(v) + 1e-6)
    return mean, log_var


def aleatoric_loss(y_true, y_pred, log_var, reg_weight: float = 0.01):
    """Heteroscedastic Gaussian NLL + L1 logvar regularizer (01:916-927)."""
    precision = jnp.exp(-log_var)
    nll = jnp.mean(0.5 * precision * (y_true - y_pred) ** 2 + 0.5 * log_var)
    return nll + reg_weight * jnp.mean(jnp.abs(log_var))
