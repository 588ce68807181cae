"""MC-dropout uncertainty quantification, vmapped.

The reference's ``get_MC_samples`` (01:1413-1491) runs two serial Python
phases over the full dataset:

1. eval mode, ``mc_times`` *identical* deterministic passes → pred_mean
   (01:1441-1445; the mean of identical passes equals one pass, so here it is
   computed with a single forward — numerically identical, 1999 passes saved);
2. dropout rate overridden to ``dropout`` (01:1448-1454), train mode,
   ``mc_times`` stochastic passes → aleatoric = sqrt(exp(mean(logvar)))
   (01:1483), epistemic = sqrt(population-var(preds)) (01:1486).

Here phase 2 is a ``vmap`` over PRNG keys executed in fixed-size chunks under
``lax.scan`` (bounded memory for huge ``mc_times``), accumulating the exact
sufficient statistics: Σ logvar, Σ (pred − base), Σ (pred − base)² — the
base-centred moments avoid catastrophic cancellation in f32.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pinnfc_tpu.models.mlp import MLPParams, mlp_forward


class MCSamples(NamedTuple):
    """(pred_mean, aleatoric_std, epistemic_std), normalized domain, (N,)."""

    pred_mean: jnp.ndarray
    aleatoric_std: jnp.ndarray
    epistemic_std: jnp.ndarray


# rows × samples per device pass; the widest activation is (chunk, N, 256)
# f32, so 1.5e6 row-samples ≈ 1.5 GB peak — safe on a 16 GB chip
_CHUNK_ROW_BUDGET = 1_500_000


def mc_dropout_samples(
    mlp_params: MLPParams,
    x: jnp.ndarray,
    rng: jax.Array,
    mc_times: int = 2000,
    dropout: float = 0.4,
    chunk: int = 100,
) -> MCSamples:
    """Vectorized two-phase MC-dropout sampler.

    Args:
      x: (N, 8) normalized inputs.
      mc_times: stochastic passes (reference default 2000, 01:2157).
      dropout: override rate for phase 2 (reference 0.4, 01:2158).
      chunk: samples per device pass, auto-clamped so chunk·N stays inside
        the activation-memory budget and never exceeds ``mc_times`` (a
        small request must not silently run a full default-sized chunk).
        When ``mc_times`` is not a multiple of the effective chunk it is
        rounded UP — the extra passes are additional unbiased samples and
        the statistics divide by the count actually executed.
    """
    n = x.shape[0]
    chunk = max(1, min(chunk, mc_times, _CHUNK_ROW_BUDGET // max(n, 1)))
    return _mc_dropout_jit(
        mlp_params, x, rng, mc_times=mc_times, dropout=dropout, chunk=chunk
    )


@partial(jax.jit, static_argnames=("mc_times", "dropout", "chunk"))
def _mc_dropout_jit(
    mlp_params: MLPParams,
    x: jnp.ndarray,
    rng: jax.Array,
    mc_times: int,
    dropout: float,
    chunk: int,
) -> MCSamples:
    n_chunks = -(-mc_times // chunk)
    total = n_chunks * chunk

    # Phase 1: deterministic eval pass = the reference's mean over
    # mc_times identical eval passes (01:1480).
    base, _ = mlp_forward(mlp_params, x, train=False)
    base = base[:, 0]

    def one_pass(key):
        pred, log_var = mlp_forward(
            mlp_params, x, dropout_p=dropout, train=True, rng=key
        )
        return pred[:, 0], log_var[:, 0]

    def body(carry, key):
        s_lv, s_d, s_d2 = carry
        preds, log_vars = jax.vmap(one_pass)(jax.random.split(key, chunk))
        d = preds - base[None, :]
        return (
            s_lv + jnp.sum(log_vars, axis=0),
            s_d + jnp.sum(d, axis=0),
            s_d2 + jnp.sum(d * d, axis=0),
        ), None

    zeros = jnp.zeros_like(base)
    keys = jax.random.split(rng, n_chunks)
    (s_lv, s_d, s_d2), _ = jax.lax.scan(body, (zeros, zeros, zeros), keys)

    m = jnp.asarray(total, base.dtype)
    mean_lv = s_lv / m
    mean_d = s_d / m
    var = jnp.maximum(s_d2 / m - mean_d**2, 0.0)  # population variance (01:1486)
    return MCSamples(
        pred_mean=base,
        aleatoric_std=jnp.sqrt(jnp.exp(mean_lv)),
        epistemic_std=jnp.sqrt(var),
    )


def mc_dropout_samples_loop(
    mlp_params: MLPParams,
    x: jnp.ndarray,
    rng: jax.Array,
    mc_times: int = 64,
    dropout: float = 0.4,
) -> MCSamples:
    """Literal per-sample loop with the same key layout as the vmapped
    sampler — the statistical-parity oracle for tests (SURVEY §4e)."""
    base, _ = mlp_forward(mlp_params, x, train=False)
    base = base[:, 0]
    chunkless = jax.random.split(rng, 1)[0]  # mirror scan's split(rng, n_chunks)
    keys = jax.random.split(chunkless, mc_times)
    preds, log_vars = [], []
    for k in keys:
        p, lv = mlp_forward(mlp_params, x, dropout_p=dropout, train=True, rng=k)
        preds.append(p[:, 0])
        log_vars.append(lv[:, 0])
    preds = jnp.stack(preds)
    log_vars = jnp.stack(log_vars)
    return MCSamples(
        pred_mean=base,
        aleatoric_std=jnp.sqrt(jnp.exp(jnp.mean(log_vars, axis=0))),
        epistemic_std=jnp.sqrt(jnp.var(preds, axis=0)),
    )
