"""Multinomial logistic regression on device (sklearn-parity objective).

Replaces the reference's ``Pipeline(StandardScaler → LogisticRegression(
multi_class='multinomial', solver='lbfgs', max_iter=1000, class_weight))``
(02:195-207, 05:284-309).  The optimization problem is sklearn's exactly:

    min_{W,b}  0.5·‖W‖²_F + C · Σ_i w_i · CE(softmax(x_i W + b), y_i)

with ``C=1.0`` and optional 'balanced' class weights
``n_samples / (n_classes · count_k)``.  Solved with optax L-BFGS under jit;
standardization is fused into the same device program.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


class LogRegModel(NamedTuple):
    coef: jnp.ndarray  # (D, K)
    intercept: jnp.ndarray  # (K,)
    x_mean: jnp.ndarray  # (D,) standardization constants
    x_scale: jnp.ndarray  # (D,)
    n_iter: jnp.ndarray  # ()


def balanced_class_weights(y: jnp.ndarray, n_classes: int) -> jnp.ndarray:
    """sklearn 'balanced': n_samples / (n_classes * bincount)."""
    counts = jnp.bincount(y, length=n_classes).astype(jnp.float32)
    n = y.shape[0]
    return n / (n_classes * jnp.maximum(counts, 1.0))


@partial(jax.jit, static_argnames=("n_classes", "max_iter", "balanced", "c_reg", "tol"))
def logreg_fit(
    x: jnp.ndarray,
    y: jnp.ndarray,
    n_classes: int,
    max_iter: int = 1000,
    balanced: bool = True,
    c_reg: float = 1.0,
    tol: float = 1e-6,
) -> LogRegModel:
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.int32)
    n, d = x.shape

    # StandardScaler (population std, sklearn semantics)
    x_mean = jnp.mean(x, axis=0)
    x_std = jnp.std(x, axis=0)
    x_scale = jnp.where(x_std == 0.0, 1.0, x_std)
    xs = (x - x_mean) / x_scale

    if balanced:
        w_class = balanced_class_weights(y, n_classes)
        w = w_class[y]
    else:
        w = jnp.ones((n,), jnp.float32)

    onehot = jax.nn.one_hot(y, n_classes, dtype=jnp.float32)

    def loss_fn(params):
        logits = xs @ params["coef"] + params["intercept"]
        logp = jax.nn.log_softmax(logits, axis=1)
        ce = -jnp.sum(onehot * logp, axis=1)
        return 0.5 * jnp.sum(params["coef"] ** 2) + c_reg * jnp.sum(w * ce)

    params = {
        "coef": jnp.zeros((d, n_classes), jnp.float32),
        "intercept": jnp.zeros((n_classes,), jnp.float32),
    }
    solver = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def cond(carry):
        _, state, g_norm, it = carry
        return (it < max_iter) & (g_norm > tol)

    def step(carry):
        params, state, _, it = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = solver.update(
            grad, state, params, value=value, grad=grad, value_fn=loss_fn
        )
        params = optax.apply_updates(params, updates)
        g_norm = optax.global_norm(grad)
        return params, state, g_norm, it + 1

    state = solver.init(params)
    params, _, _, n_iter = jax.lax.while_loop(
        cond, step, (params, state, jnp.asarray(jnp.inf), jnp.asarray(0))
    )
    return LogRegModel(params["coef"], params["intercept"], x_mean, x_scale, n_iter)


@jax.jit
def logreg_predict_proba(model: LogRegModel, x: jnp.ndarray) -> jnp.ndarray:
    xs = (jnp.asarray(x, jnp.float32) - model.x_mean) / model.x_scale
    return jax.nn.softmax(xs @ model.coef + model.intercept, axis=1)


def logreg_predict(model: LogRegModel, x: jnp.ndarray) -> jnp.ndarray:
    return jnp.argmax(logreg_predict_proba(model, x), axis=1)


def explain_coefficients(
    model: LogRegModel,
    feature_names,
    class_names,
    topn: int = 5,
):
    """Top-N positive / negative LR coefficients per class in standardized
    space (reference explain_coefficients, 02:209-229), as structured data
    instead of prints."""
    import numpy as np

    coefs = np.asarray(model.coef).T  # (K, D)
    out = {}
    for c_idx, cname in enumerate(class_names):
        w = coefs[c_idx]
        pos = np.argsort(-w)[:topn]
        neg = np.argsort(w)[:topn]
        out[cname] = {
            "positive": [(feature_names[i], float(w[i])) for i in pos],
            "negative": [(feature_names[i], float(w[i])) for i in neg],
        }
    return out
