"""Linear SVM, one-vs-one, on device.

The reference's "SVM (RBF)" method is actually ``SVC(kernel='linear',
C=0.05, class_weight='balanced')`` (05:329-331 — the docstring/kernel
mismatch is an upstream quirk, preserved: this IS a linear SVM).  libsvm
solves the dual hinge-loss QP with one-vs-one voting; here each of the
K·(K−1)/2 pairwise problems is solved in the primal with a smooth squared
hinge (LinearSVC-style) via L-BFGS, all pairs **vmapped** into one device
program — padded per-pair sample masks make the shapes static.

Prediction: OvO votes; ties broken by summed decision-function confidence
(sklearn's ``decision_function_shape='ovr'`` aggregation idea).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax


class SVMModel(NamedTuple):
    coef: jnp.ndarray  # (P, D) one row per class pair
    intercept: jnp.ndarray  # (P,)
    pairs: jnp.ndarray  # (P, 2) class indices (i, j); +1 margin = j
    x_mean: jnp.ndarray
    x_scale: jnp.ndarray


def _pair_list(n_classes: int) -> np.ndarray:
    return np.array(
        [(i, j) for i in range(n_classes) for j in range(i + 1, n_classes)],
        dtype=np.int32,
    )


@partial(jax.jit, static_argnames=("n_classes", "c_svm", "balanced", "max_iter"))
def svm_fit(
    x: jnp.ndarray,
    y: jnp.ndarray,
    n_classes: int,
    c_svm: float = 0.05,
    balanced: bool = True,
    max_iter: int = 500,
) -> SVMModel:
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.int32)
    n, d = x.shape

    x_mean = jnp.mean(x, axis=0)
    x_std = jnp.std(x, axis=0)
    x_scale = jnp.where(x_std == 0.0, 1.0, x_std)
    xs = (x - x_mean) / x_scale

    if balanced:
        counts = jnp.bincount(y, length=n_classes).astype(jnp.float32)
        w_class = n / (n_classes * jnp.maximum(counts, 1.0))
    else:
        w_class = jnp.ones((n_classes,), jnp.float32)

    if n_classes > 16:
        raise ValueError(
            f"svm_fit supports at most 16 classes (the OvO vote table in "
            f"svm_predict is fixed at length 16), got {n_classes}"
        )
    pairs = jnp.asarray(_pair_list(n_classes))

    def fit_pair(pair):
        ci, cj = pair[0], pair[1]
        in_pair = (y == ci) | (y == cj)
        sign = jnp.where(y == cj, 1.0, -1.0)  # +1 for the larger class index
        w_i = jnp.where(in_pair, w_class[y] * c_svm, 0.0)

        def loss_fn(p):
            # full-f32 matmul: bf16 gradient noise on TPU would float the
            # L-BFGS convergence check above its 1e-6 tolerance (see the
            # identical note in logreg.py)
            margin = jnp.matmul(xs, p["w"], precision="highest") + p["b"]
            hinge = jnp.maximum(0.0, 1.0 - sign * margin)
            return 0.5 * jnp.sum(p["w"] ** 2) + jnp.sum(w_i * hinge**2)

        params = {"w": jnp.zeros((d,), jnp.float32), "b": jnp.asarray(0.0)}
        solver = optax.lbfgs()
        vg = optax.value_and_grad_from_state(loss_fn)

        def cond(carry):
            _, state, g_norm, it = carry
            return (it < max_iter) & (g_norm > 1e-6)

        def step(carry):
            p, state, _, it = carry
            value, grad = vg(p, state=state)
            updates, state = solver.update(
                grad, state, p, value=value, grad=grad, value_fn=loss_fn
            )
            p = optax.apply_updates(p, updates)
            return p, state, optax.global_norm(grad), it + 1

        p, _, _, _ = jax.lax.while_loop(
            cond, step, (params, solver.init(params), jnp.asarray(jnp.inf), 0)
        )
        return p["w"], p["b"]

    coefs, intercepts = jax.vmap(fit_pair)(pairs)
    return SVMModel(coefs, intercepts, pairs, x_mean, x_scale)


@jax.jit
def svm_predict(model: SVMModel, x: jnp.ndarray) -> jnp.ndarray:
    xs = (jnp.asarray(x, jnp.float32) - model.x_mean) / model.x_scale
    margins = jnp.matmul(
        xs, model.coef.T, precision="highest"
    ) + model.intercept[None, :]  # (N, P)
    # votes: margin > 0 → class j, else class i (vote length 16 caps n_classes)
    winner = jnp.where(margins > 0, model.pairs[None, :, 1], model.pairs[None, :, 0])
    votes = jax.vmap(lambda row: jnp.bincount(row, length=16))(winner)
    # confidence tiebreak: accumulate |margin| toward the winning class
    conf = jnp.zeros_like(votes, dtype=jnp.float32)
    conf = jax.vmap(
        lambda c_row, w_row, m_row: c_row.at[w_row].add(jnp.abs(m_row))
    )(conf, winner, margins)
    score = votes.astype(jnp.float32) + conf / (1.0 + jnp.sum(conf, axis=1, keepdims=True))
    return jnp.argmax(score, axis=1)
