"""Fused MC-dropout sampler (Pallas TPU).

The MC-dropout export phase is the reference's single most expensive block:
2000 stochastic forward passes over the full dataset (01:1456-1464).  The
vmapped sampler (`pinnfc_tpu.uq.mc_dropout`) already collapses the Python
loop, but XLA still materializes (chunk, N, width) activation tensors in HBM
between layers.  This kernel runs the ENTIRE sample loop per row-block inside
VMEM:

- grid over row blocks; each block loads x (BN, 8) and every weight matrix
  into VMEM once;
- an eval-mode pass produces the base prediction (reference phase 1);
- a `fori_loop` over samples generates dropout masks with a counter-based
  Wang-hash PRNG in plain uint32 VPU ops — deterministic given the seed,
  identical on TPU hardware and in interpret mode (the pltpu hardware PRNG
  has no CPU-interpret lowering), unique per (block, sample, layer, element);
- the trunk + variance head run per sample, accumulating the sufficient
  statistics Σ(pred−base), Σ(pred−base)², Σ logvar in VMEM registers —
  per-sample activations NEVER touch HBM;
- outputs are 4 columns per row: [base, Σd, Σd², Σlogvar].

Bit-level RNG differs from `jax.random.bernoulli` (different generator), so
parity with the vmap sampler is *statistical* (SURVEY §4e), asserted in
tests/test_pallas_mc.py.  Specialized to the flagship MLP topology
(tanh trunk + tanh/dropout variance head, models/mlp.py); the layer count is
flexible (Python loop unrolls at trace time).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pinnfc_tpu.uq.mc_dropout import MCSamples

_BLOCK_N = 256


def _wang_hash(x: jnp.ndarray) -> jnp.ndarray:
    """Counter-based uint32 hash (Wang); uniform enough for dropout masks."""
    x = (x ^ jnp.uint32(61)) ^ (x >> 16)
    x = x * jnp.uint32(9)
    x = x ^ (x >> 4)
    x = x * jnp.uint32(0x27D4EB2D)
    x = x ^ (x >> 15)
    # second round for better low-bit diffusion
    x = x * jnp.uint32(2654435761)
    x = x ^ (x >> 13)
    return x


def _random_bits(shape, salt: jnp.ndarray) -> jnp.ndarray:
    """(shape) uint32 stream keyed by ``salt`` (scalar uint32)."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    ctr = rows * jnp.uint32(shape[1]) + cols
    return _wang_hash(ctr ^ _wang_hash(salt + jnp.uint32(0x9E3779B9)))


def _make_kernel(n_hidden: int, mc_times: int, dropout: float):
    thresh = np.uint32(min(int(dropout * (1 << 32)), (1 << 32) - 1))
    inv_keep = 1.0 / (1.0 - dropout)

    def kernel(seed_ref, x_ref, *refs):
        # refs: h_w0, h_b0, ..., mean_w, mean_b, v_w0, v_b0, v_w1, v_b1,
        #       v_w2, v_b2, out_ref
        out_ref = refs[-1]
        wrefs = refs[:-1]
        h_ws = [(wrefs[2 * i][:], wrefs[2 * i + 1][:]) for i in range(n_hidden)]
        k = 2 * n_hidden
        mean_w, mean_b = wrefs[k][:], wrefs[k + 1][:]
        v1w, v1b = wrefs[k + 2][:], wrefs[k + 3][:]
        v2w, v2b = wrefs[k + 4][:], wrefs[k + 5][:]
        v3w, v3b = wrefs[k + 6][:], wrefs[k + 7][:]

        x = x_ref[:]  # (BN, D)

        def mm(a, w, precision=None):
            return jnp.dot(
                a, w, preferred_element_type=jnp.float32, precision=precision
            )

        # unique stream per (kernel seed, row block); layer index and sample
        # index are folded into the per-mask salt
        block_salt = (
            jnp.uint32(seed_ref[0]) * jnp.uint32(7919)
            + jnp.uint32(pl.program_id(0)) * jnp.uint32(104729)
        )

        def forward(h, salt, precision=None):
            """salt=None → eval mode (no dropout).  ``precision`` controls
            MXU passes: the exported base prediction runs HIGHEST to match
            the f32 eager forward; the stochastic samples use the fast
            default — the variance statistics are shift-invariant, and the
            MXU rounding (~1e-3) is negligible against dropout noise."""
            layer = 0
            for w, b in h_ws:
                h = jnp.tanh(mm(h, w, precision) + b)
                if salt is not None:
                    bits = _random_bits(h.shape, salt + jnp.uint32(layer))
                    h = jnp.where(bits >= thresh, h * inv_keep, 0.0)
                layer += 1
            pred = mm(h, mean_w, precision) + mean_b  # (BN, 1)
            v = jnp.tanh(mm(h, v1w, precision) + v1b)
            if salt is not None:
                bits = _random_bits(v.shape, salt + jnp.uint32(layer))
                v = jnp.where(bits >= thresh, v * inv_keep, 0.0)
            v = jnp.tanh(mm(v, v2w, precision) + v2b)
            v = mm(v, v3w, precision) + v3b
            log_var = jnp.log(jax.nn.softplus(v) + 1e-6)
            return pred, log_var

        base, _ = forward(x, None, jax.lax.Precision.HIGHEST)  # phase 1

        def body(s, carry):
            s_d, s_d2, s_lv = carry
            salt = block_salt + jnp.uint32(s) * jnp.uint32(15485863)
            pred, log_var = forward(x, salt)
            d = pred - base
            return s_d + d, s_d2 + d * d, s_lv + log_var

        zeros = jnp.zeros_like(base)
        s_d, s_d2, s_lv = jax.lax.fori_loop(
            0, mc_times, body, (zeros, zeros, zeros)
        )

        out_ref[:] = jnp.concatenate([base, s_d, s_d2, s_lv], axis=1)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("mc_times", "dropout", "block_n", "interpret")
)
def mc_dropout_pallas(
    mlp_params,
    x: jnp.ndarray,
    seed,
    mc_times: int = 2000,
    dropout: float = 0.4,
    block_n: int = _BLOCK_N,
    interpret: bool = False,
) -> MCSamples:
    """Fused sampler → MCSamples (same contract as uq.mc_dropout_samples)."""
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    n_pad = -(-n // block_n) * block_n
    x_p = jnp.pad(x, ((0, n_pad - n), (0, 0)), mode="edge")

    hidden = mlp_params["hidden"]
    n_hidden = len(hidden)
    weights = []
    for layer in hidden:
        weights += [layer["w"], layer["b"].reshape(1, -1)]
    weights += [mlp_params["mean"]["w"], mlp_params["mean"]["b"].reshape(1, -1)]
    for layer in mlp_params["var"]:
        weights += [layer["w"], layer["b"].reshape(1, -1)]
    weights = [jnp.asarray(w, jnp.float32) for w in weights]

    kernel = _make_kernel(n_hidden, mc_times, dropout)
    grid = (n_pad // block_n,)
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
            pl.BlockSpec((block_n, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec(
            (block_n, 4), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), x_p, *weights)

    out = out[:n]
    base = out[:, 0]
    m = jnp.asarray(mc_times, jnp.float32)
    mean_d = out[:, 1] / m
    var = jnp.maximum(out[:, 2] / m - mean_d**2, 0.0)
    mean_lv = out[:, 3] / m
    return MCSamples(
        pred_mean=base,
        aleatoric_std=jnp.sqrt(jnp.exp(mean_lv)),
        epistemic_std=jnp.sqrt(var),
    )
