"""VMEM-resident training kernel (Pallas TPU) — experimental speed-of-light
path for the stage-1 DNN trainer.

The flagship MLP is tiny: weights ≈ 1.2 MB, Adam state ≈ 2.4 MB, the whole
training set ≈ 0.2 MB.  Everything fits in one core's 16 MB VMEM, so an
entire training *stage* can run as ONE kernel with zero HBM traffic between
steps: weights, optimizer moments, and gradients live in VMEM scratch; each
step loops over row blocks recomputing forward+backward in registers;
dropout masks come from the same counter-based Wang-hash PRNG as
`ops.pallas_mc_dropout` (deterministic, interpret-mode compatible).

Semantics mirror `training.train_dnn_stage` exactly except the RNG stream:
full-batch aleatoric loss (01:916-927), Adam(β=0.9/0.999, ε=1e-8) with the
StepLR staircase (γ^⌊t/step⌋), dropout after every hidden/first-var layer.
The backward pass is hand-derived (tests check it against `jax.grad` to
float tolerance with dropout off).

Specialized to the (8, 256, 256, 256, 1) flagship topology with the
256→128→64→1 variance head.

Measured outcome (v5e, N=6144, block 512): 3.1k steps/s at `highest`
precision and 9.9k steps/s at `default` — on par with the XLA scan trainer
(3.3k / 9.6k with rbg keys), NOT faster: XLA already keeps this model's
working set effectively on-chip, and both paths saturate on small-matmul
MXU latency (~25 TFLOP/s achieved).  Kept as a verified demonstrator of a
fully VMEM-resident train loop (hand-derived backward == jax.grad);
`training.train_dnn_stage` remains the production path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pinnfc_tpu.ops.pallas_mc_dropout import _random_bits
from pinnfc_tpu.training.stages import StageResult

_BLOCK_N = 512


def _make_train_kernel(
    n: int,
    block_n: int,
    n_iter: int,
    lr: float,
    lr_step: int,
    lr_gamma: float,
    dropout: float,
    reg_weight: float = 0.01,
    precision: str = "highest",
):
    mxu_prec = (
        jax.lax.Precision.HIGHEST if precision == "highest" else None
    )
    thresh = np.uint32(min(int(dropout * (1 << 32)), (1 << 32) - 1))
    inv_keep = 1.0 / (1.0 - dropout)
    n_blocks = n // block_n
    assert n_blocks * block_n == n, "N must be divisible by block_n"
    inv_n = 1.0 / n
    b1, b2, eps = 0.9, 0.999, 1e-8
    log_gamma = float(np.log(lr_gamma))

    # weight tensor order (shapes):
    # W1(8,256) b1(1,256) W2(256,256) b2 W3(256,256) b3
    # Wm(256,1) bm(1,1) V1(256,128) c1(1,128) V2(128,64) c2(1,64) V3(64,1) c3(1,1)
    N_W = 14

    def kernel(seed_ref, x_ref, y_ref, *refs):
        # refs: 14 weight inputs, then outputs: 14 updated weights + loss
        # (n_iter, 1), then scratch: w[14], m[14], v[14], g[14]
        w_in = refs[:N_W]
        w_out = refs[N_W : 2 * N_W]
        loss_ref = refs[2 * N_W]
        scratch = refs[2 * N_W + 1 :]
        w = scratch[:N_W]
        mo = scratch[N_W : 2 * N_W]
        vo = scratch[2 * N_W : 3 * N_W]
        g = scratch[3 * N_W : 4 * N_W]

        for i in range(N_W):
            w[i][:] = w_in[i][:]
            mo[i][:] = jnp.zeros_like(w_in[i][:])
            vo[i][:] = jnp.zeros_like(w_in[i][:])

        seed = jnp.uint32(seed_ref[0])

        def mm(a, bmat):
            return jnp.dot(
                a, bmat, preferred_element_type=jnp.float32, precision=mxu_prec
            )

        def train_step(t, _):
            for i in range(N_W):
                g[i][:] = jnp.zeros_like(g[i][:])
            step_salt = seed * jnp.uint32(2654435761) + jnp.uint32(t) * jnp.uint32(40503)

            def block_body(bidx, loss_acc):
                x = x_ref[pl.ds(bidx * block_n, block_n), :]
                y = y_ref[pl.ds(bidx * block_n, block_n), :]
                salt = step_salt + jnp.uint32(bidx) * jnp.uint32(7919)

                def mask(shape, layer):
                    bits = _random_bits(shape, salt + jnp.uint32(layer))
                    return bits >= thresh

                # ---- forward ----
                a1 = mm(x, w[0][:]) + w[1][:]
                h1 = jnp.tanh(a1)
                m1 = mask(h1.shape, 0)
                h1d = jnp.where(m1, h1 * inv_keep, 0.0)
                a2 = mm(h1d, w[2][:]) + w[3][:]
                h2 = jnp.tanh(a2)
                m2 = mask(h2.shape, 1)
                h2d = jnp.where(m2, h2 * inv_keep, 0.0)
                a3 = mm(h2d, w[4][:]) + w[5][:]
                h3 = jnp.tanh(a3)
                m3 = mask(h3.shape, 2)
                h3d = jnp.where(m3, h3 * inv_keep, 0.0)
                pred = mm(h3d, w[6][:]) + w[7][:]
                q1 = mm(h3d, w[8][:]) + w[9][:]
                t1 = jnp.tanh(q1)
                mv = mask(t1.shape, 3)
                t1d = jnp.where(mv, t1 * inv_keep, 0.0)
                q2 = mm(t1d, w[10][:]) + w[11][:]
                t2 = jnp.tanh(q2)
                q3 = mm(t2, w[12][:]) + w[13][:]
                sp = jax.nn.softplus(q3)
                lv = jnp.log(sp + 1e-6)

                r = y - pred
                e = jnp.exp(-lv)
                block_loss = jnp.sum(
                    0.5 * e * r * r + 0.5 * lv + reg_weight * jnp.abs(lv)
                )

                # ---- backward (d loss/N w.r.t. each tensor) ----
                dpred = (-e * r) * inv_n
                dlv = (0.5 * (1.0 - e * r * r) + reg_weight * jnp.sign(lv)) * inv_n
                dq3 = dlv * jax.nn.sigmoid(q3) / (sp + 1e-6)
                g[12][:] += mm(t2.T, dq3)
                g[13][:] += jnp.sum(dq3, axis=0, keepdims=True)
                dt2 = mm(dq3, w[12][:].T)
                dq2 = dt2 * (1.0 - t2 * t2)
                g[10][:] += mm(t1d.T, dq2)
                g[11][:] += jnp.sum(dq2, axis=0, keepdims=True)
                dt1d = mm(dq2, w[10][:].T)
                dt1 = jnp.where(mv, dt1d * inv_keep, 0.0)
                dq1 = dt1 * (1.0 - t1 * t1)
                g[8][:] += mm(h3d.T, dq1)
                g[9][:] += jnp.sum(dq1, axis=0, keepdims=True)
                g[6][:] += mm(h3d.T, dpred)
                g[7][:] += jnp.sum(dpred, axis=0, keepdims=True)
                dh3d = mm(dpred, w[6][:].T) + mm(dq1, w[8][:].T)
                dh3 = jnp.where(m3, dh3d * inv_keep, 0.0)
                da3 = dh3 * (1.0 - h3 * h3)
                g[4][:] += mm(h2d.T, da3)
                g[5][:] += jnp.sum(da3, axis=0, keepdims=True)
                dh2d = mm(da3, w[4][:].T)
                dh2 = jnp.where(m2, dh2d * inv_keep, 0.0)
                da2 = dh2 * (1.0 - h2 * h2)
                g[2][:] += mm(h1d.T, da2)
                g[3][:] += jnp.sum(da2, axis=0, keepdims=True)
                dh1d = mm(da2, w[2][:].T)
                dh1 = jnp.where(m1, dh1d * inv_keep, 0.0)
                da1 = dh1 * (1.0 - h1 * h1)
                g[0][:] += mm(x.T, da1)
                g[1][:] += jnp.sum(da1, axis=0, keepdims=True)

                return loss_acc + block_loss

            loss = jax.lax.fori_loop(0, n_blocks, block_body, jnp.zeros((1, 1)))
            loss_ref[pl.ds(t, 1), :] = loss * inv_n  # (1,1) block store

            # ---- Adam + StepLR staircase ----
            tf = jnp.float32(t + 1)
            lr_t = lr * jnp.exp(log_gamma * jnp.floor(jnp.float32(t) / lr_step))
            bc1 = 1.0 - jnp.exp(tf * jnp.log(jnp.float32(b1)))
            bc2 = 1.0 - jnp.exp(tf * jnp.log(jnp.float32(b2)))
            for i in range(N_W):
                gi = g[i][:]
                mo[i][:] = b1 * mo[i][:] + (1.0 - b1) * gi
                vo[i][:] = b2 * vo[i][:] + (1.0 - b2) * gi * gi
                mhat = mo[i][:] / bc1
                vhat = vo[i][:] / bc2
                w[i][:] = w[i][:] - lr_t * mhat / (jnp.sqrt(vhat) + eps)
            return 0

        jax.lax.fori_loop(0, n_iter, train_step, 0)

        for i in range(N_W):
            w_out[i][:] = w[i][:]

    return kernel, N_W


def _flatten_weights(mlp_params):
    h = mlp_params["hidden"]
    var = mlp_params["var"]
    ws = [
        h[0]["w"], h[0]["b"].reshape(1, -1),
        h[1]["w"], h[1]["b"].reshape(1, -1),
        h[2]["w"], h[2]["b"].reshape(1, -1),
        mlp_params["mean"]["w"], mlp_params["mean"]["b"].reshape(1, -1),
        var[0]["w"], var[0]["b"].reshape(1, -1),
        var[1]["w"], var[1]["b"].reshape(1, -1),
        var[2]["w"], var[2]["b"].reshape(1, -1),
    ]
    return [jnp.asarray(w, jnp.float32) for w in ws]


def _unflatten_weights(ws, template):
    return {
        "hidden": [
            {"w": ws[0], "b": ws[1][0]},
            {"w": ws[2], "b": ws[3][0]},
            {"w": ws[4], "b": ws[5][0]},
        ],
        "mean": {"w": ws[6], "b": ws[7][0]},
        "var": [
            {"w": ws[8], "b": ws[9][0]},
            {"w": ws[10], "b": ws[11][0]},
            {"w": ws[12], "b": ws[13][0]},
        ],
    }


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_iter", "lr", "lr_step", "lr_gamma", "dropout_p", "block_n",
        "interpret", "precision",
    ),
)
def train_dnn_pallas(
    mlp_params,
    x: jnp.ndarray,
    y: jnp.ndarray,
    seed,
    n_iter: int,
    lr: float = 0.01,
    lr_step: int = 1000,
    lr_gamma: float = 0.8,
    dropout_p: float = 0.2,
    block_n: int = _BLOCK_N,
    interpret: bool = False,
    precision: str = "highest",
) -> StageResult:
    """Run the whole DNN stage in one VMEM-resident kernel.

    Requires the flagship topology (8,256,256,256,1) and N divisible by
    ``block_n`` (pad with `parallel.mesh.pad_to_multiple` if needed — padded
    rows DO enter the mean loss)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    n = x.shape[0]

    ws = _flatten_weights(mlp_params)
    kernel, n_w = _make_train_kernel(
        n, block_n, n_iter, lr, lr_step, lr_gamma, dropout_p,
        precision=precision,
    )

    w_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in ws]
    out_shapes = w_shapes + [jax.ShapeDtypeStruct((n_iter, 1), jnp.float32)]
    scratch = [pltpu.VMEM(w.shape, jnp.float32) for w in ws] * 4  # w, m, v, g

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # seed
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),  # y
            *[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in ws],
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in out_shapes],
        scratch_shapes=scratch,
        interpret=interpret,
    )(jnp.asarray([seed], jnp.int32), x, y, *ws)

    new_ws = outs[:n_w]
    losses = outs[n_w][:, 0]
    return StageResult(_unflatten_weights(new_ws, mlp_params), losses)
