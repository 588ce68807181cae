"""Multinomial logistic regression on device (sklearn-parity objective).

Replaces the reference's ``Pipeline(StandardScaler → LogisticRegression(
multi_class='multinomial', solver='lbfgs', max_iter=1000, class_weight))``
(02:195-207, 05:284-309).  The optimization problem is sklearn's exactly:

    min_{W,b}  0.5·‖W‖²_F + C · Σ_i w_i · CE(softmax(x_i W + b), y_i)

with ``C=1.0`` and optional 'balanced' class weights
``n_samples / (n_classes · count_k)``.  Standardization is fused into the
same device program.

Solver (``solver="auto"``): for the small (D+1)·K parameter blocks this
pipeline actually fits (4 features × 4 classes), exact Newton/IRLS — the
full Hessian is a tiny dense matrix built by one einsum over the batch, and
~10 undamped Newton steps reach the optimum where L-BFGS needs hundreds
of sequential line-search evaluations (the fit went 0.342 s → ~0.03 s on
one v5e, PERFORMANCE.md).  The softmax shift-invariance leaves one flat
intercept direction; a 1e-8 ridge on the Hessian handles it (the gradient
never points along it from the zero init).  L-BFGS remains for large
(D+1)·K where the dense Hessian would not pay.
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


# dense-Hessian Newton pays while the packed parameter block stays small
_NEWTON_MAX_PARAMS = 256


def _newton_solve(xs, onehot, w, c_reg, tol, max_iter):
    """Exact Newton on the sklearn objective; returns (coef, intercept, it)."""
    n, d = xs.shape
    k = onehot.shape[1]
    xt = jnp.concatenate([xs, jnp.ones((n, 1), xs.dtype)], axis=1)  # (N, D+1)
    dk = (d + 1) * k
    # L2 penalty applies to coef rows only (sklearn never penalizes b)
    pen = jnp.concatenate([jnp.ones((d,)), jnp.zeros((1,))])  # per (D+1) row
    pen_diag = jnp.repeat(pen, k)  # packed (a, l) order of theta.reshape(-1)
    eye_k = jnp.eye(k, dtype=xs.dtype)

    def grad_and_hess(theta):
        # full-f32 matmuls: bf16 gradient noise would stall the quadratic
        # convergence at ~1e-3 on TPU (repo convention: 'highest' where
        # numerics matter)
        p = jax.nn.softmax(jnp.matmul(xt, theta, precision="highest"), axis=1)
        g = c_reg * jnp.matmul(xt.T, w[:, None] * (p - onehot),
                               precision="highest") + pen[:, None] * theta
        s = p[..., None] * eye_k[None] - p[:, :, None] * p[:, None, :]  # (N,K,K)
        h = c_reg * jnp.einsum("n,na,nkl,nb->akbl", w, xt, s, xt,
                               precision="highest")
        h = h.reshape(dk, dk) + jnp.diag(pen_diag)
        # the softmax shift direction has zero curvature; a ridge scaled to
        # the Hessian's own magnitude keeps the f32 solve well-posed without
        # measurably moving the curved directions
        ridge = 1e-6 * jnp.trace(h) / dk + 1e-8
        return g, h + ridge * jnp.eye(dk)

    def cond(carry):
        _, step_norm, it = carry
        # quadratic convergence → the step collapses to f32 rounding noise
        # within ~10 iterations; the gradient norm itself has an f32 floor
        # well above the L-BFGS path's tol, so convergence is on the step
        return (it < max_iter) & (step_norm > jnp.maximum(tol, 5e-6))

    def step(carry):
        theta, _, it = carry
        g, h = grad_and_hess(theta)
        delta = jnp.linalg.solve(h, g.reshape(-1)).reshape(d + 1, k)
        # project out the flat softmax-shift direction: its true gradient is
        # zero, so the solve only amplifies f32 noise there (curvature comes
        # solely from the tiny ridge)
        delta = delta.at[d].add(-jnp.mean(delta[d]))
        return theta - delta, jnp.max(jnp.abs(delta)), it + 1

    theta0 = jnp.zeros((d + 1, k), xs.dtype)
    theta, _, it = jax.lax.while_loop(
        cond, step, (theta0, jnp.asarray(jnp.inf), jnp.asarray(0))
    )
    return theta[:d], theta[d], it


@partial(jax.jit, static_argnames=(
    "n_classes", "max_iter", "balanced", "c_reg", "tol", "solver"))
def logreg_fit(
    x: jnp.ndarray,
    y: jnp.ndarray,
    n_classes: int,
    max_iter: int = 1000,
    balanced: bool = True,
    c_reg: float = 1.0,
    tol: float = 1e-6,
    solver: str = "auto",
    mask: jnp.ndarray | None = None,
) -> LogRegModel:
    """``mask`` (N,) of 1/0 gives padded rows zero weight everywhere
    (standardization statistics, balanced class counts, loss, gradient,
    Hessian) — the objective is EXACTLY the unpadded one, which is how
    arbitrary N row-shards over a device mesh (parallel.diagnosis)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.int32)
    n, d = x.shape
    if solver not in ("auto", "newton", "lbfgs"):
        raise ValueError(f"unknown solver {solver!r}")

    # StandardScaler (population std, sklearn semantics)
    if mask is None:
        x_mean = jnp.mean(x, axis=0)
        x_std = jnp.std(x, axis=0)
    else:
        n_eff = jnp.sum(mask)
        x_mean = jnp.sum(x * mask[:, None], axis=0) / n_eff
        x_std = jnp.sqrt(
            jnp.sum(mask[:, None] * (x - x_mean) ** 2, axis=0) / n_eff
        )
    x_scale = jnp.where(x_std == 0.0, 1.0, x_std)
    xs = (x - x_mean) / x_scale

    if balanced:
        if mask is None:
            w_class = balanced_class_weights(y, n_classes)
        else:
            counts = jnp.bincount(y, weights=mask, length=n_classes)
            w_class = jnp.sum(mask) / (n_classes * jnp.maximum(counts, 1.0))
        w = w_class[y]
    else:
        w = jnp.ones((n,), jnp.float32)
    if mask is not None:
        w = w * mask

    onehot = jax.nn.one_hot(y, n_classes, dtype=jnp.float32)

    use_newton = solver == "newton" or (
        solver == "auto" and (d + 1) * n_classes <= _NEWTON_MAX_PARAMS
    )
    if use_newton:
        coef, intercept, n_iter = _newton_solve(
            xs, onehot, w, c_reg, tol, min(max_iter, 100)
        )
        return LogRegModel(coef, intercept, x_mean, x_scale, n_iter)

    def loss_fn(params):
        logits = xs @ params["coef"] + params["intercept"]
        logp = jax.nn.log_softmax(logits, axis=1)
        ce = -jnp.sum(onehot * logp, axis=1)
        return 0.5 * jnp.sum(params["coef"] ** 2) + c_reg * jnp.sum(w * ce)

    params = {
        "coef": jnp.zeros((d, n_classes), jnp.float32),
        "intercept": jnp.zeros((n_classes,), jnp.float32),
    }
    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(loss_fn)

    def cond(carry):
        _, state, g_norm, it = carry
        return (it < max_iter) & (g_norm > tol)

    def step(carry):
        params, state, _, it = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=loss_fn
        )
        params = optax.apply_updates(params, updates)
        g_norm = optax.global_norm(grad)
        return params, state, g_norm, it + 1

    state = opt.init(params)
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
