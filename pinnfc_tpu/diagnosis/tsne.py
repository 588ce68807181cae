"""On-device exact t-SNE, replacing the sklearn CPU fallback — the last
CPU-bound algorithm anywhere in the pipeline (reference usage: 02:319 with
TSNE_PARAMS at 02:63, 03:451-460, 05 scatter views).

Semantics follow ``sklearn.manifold.TSNE(method="exact")``:

1. conditional P per row via the same bisection on the Gaussian precision
   beta as sklearn's ``_binary_search_perplexity`` (100 steps, entropy
   tolerance 1e-5, freeze-on-convergence) — vmapped over rows, the row
   kernels are (N,) vector ops the VPU chews through;
2. joint ``P = max((P_c + P_cᵀ)/sum, eps)`` then early exaggeration ×12
   (sklearn ``_joint_probabilities``);
3. PCA init scaled to std 1e-4 on the first component (sklearn ``_fit``),
   or random normal × 1e-4;
4. two-phase batch gradient descent with individual gains
   (sklearn ``_gradient_descent``: momentum 0.5 for 250 exploration
   iterations on the exaggerated P, then momentum 0.8), learning-rate
   "auto" = max(N/early_exaggeration/4, 50);
5. exact KL gradient ``4·(diag(W·1) − W)·Y`` with ``W = (P − Q)·num``,
   ``num = (1+‖yi−yj‖²)⁻¹`` (degrees_of_freedom = 1 for 2-D output).

Everything is one jit: the N×N distance/Q matrices are MXU-shaped matmuls
and the 1000-iteration schedule is two ``lax.scan``s, so the whole fit is a
single compiled program — no per-iteration host round trips.  sklearn stops
early when KL stalls for 300 iterations (rare at these sizes); we run the
full budget, which can only improve the embedding.  Parity is therefore
quality-level (same P matrix to f32 tolerance, same optimizer update rule
step-for-step, comparable final KL / trustworthiness), not bit-level —
t-SNE is stochastic in spirit and the reference only consumes it as a
scatter-plot embedding.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# sklearn floors P and Q at np.finfo(np.double).eps (MACHINE_EPSILON)
_EPS = float(np.finfo(np.float64).eps)
_PERPLEXITY_TOL = 1e-5  # sklearn _utils PERPLEXITY_TOLERANCE
_N_BISECT = 100  # sklearn binary-search step budget
_EXPLORATION_ITER = 250  # sklearn TSNE._EXPLORATION_MAX_ITER
_MIN_GAIN = 0.01


class TsneResult(NamedTuple):
    embedding: jnp.ndarray  # (N, n_components) float32
    kl_divergence: jnp.ndarray  # () float32, final (unexaggerated) KL


def _pairwise_sq_dists(x: jnp.ndarray) -> jnp.ndarray:
    """(N,N) squared euclidean distances; full-f32 matmul (repo convention:
    'highest' where numerics matter — the expansion cancels for neighbors)."""
    sq = jnp.sum(x * x, axis=1)
    gram = jnp.matmul(x, x.T, precision="highest")
    d2 = sq[:, None] + sq[None, :] - 2.0 * gram
    return jnp.maximum(d2, 0.0)


def conditional_p(d2: jnp.ndarray, perplexity: jnp.ndarray) -> jnp.ndarray:
    """Per-row Gaussian conditional probabilities at the desired perplexity.

    Mirrors sklearn's ``_binary_search_perplexity``: bisection on beta with
    doubling/halving while a bound is open, H = log(ΣP) + β·Σ(dP)/ΣP against
    desired_entropy = ln(perplexity), tolerance 1e-5; rows freeze once
    converged (sklearn breaks out of the loop) so extra bisection steps do
    not perturb them.
    """
    d2 = jnp.asarray(d2, jnp.float32)
    n = d2.shape[0]
    desired_entropy = jnp.log(perplexity).astype(jnp.float32)
    mask = 1.0 - jnp.eye(n, dtype=jnp.float32)  # exclude self (j != i)

    def entropy(beta, d_row, m_row):
        p = jnp.exp(-d_row * beta) * m_row
        sum_p = jnp.maximum(jnp.sum(p), _EPS)
        h = jnp.log(sum_p) + beta * jnp.sum(d_row * p) / sum_p
        return h

    def row_beta(d_row, m_row):
        def body(_, carry):
            beta, bmin, bmax, done = carry
            h = entropy(beta, d_row, m_row)
            diff = h - desired_entropy
            now_done = jnp.abs(diff) <= _PERPLEXITY_TOL
            too_high = diff > 0.0  # entropy too high -> raise beta
            nbmin = jnp.where(too_high, beta, bmin)
            nbmax = jnp.where(too_high, bmax, beta)
            nbeta = jnp.where(
                too_high,
                jnp.where(jnp.isinf(bmax), beta * 2.0, 0.5 * (beta + bmax)),
                jnp.where(jnp.isinf(bmin), beta * 0.5, 0.5 * (beta + bmin)),
            )
            keep = done | now_done
            return (
                jnp.where(keep, beta, nbeta),
                jnp.where(keep, bmin, nbmin),
                jnp.where(keep, bmax, nbmax),
                keep,
            )

        beta0 = jnp.float32(1.0)
        carry = (beta0, -jnp.inf, jnp.inf, jnp.bool_(False))
        beta, _, _, _ = jax.lax.fori_loop(0, _N_BISECT, body, carry)
        return beta

    betas = jax.vmap(row_beta)(d2, mask)
    p = jnp.exp(-d2 * betas[:, None]) * mask
    return p / jnp.maximum(jnp.sum(p, axis=1, keepdims=True), _EPS)


def joint_p(cond_p: jnp.ndarray) -> jnp.ndarray:
    """Symmetrized joint probabilities (sklearn ``_joint_probabilities``,
    square form: zero diagonal carries eps after the floor, harmless — it
    cancels in both the KL sum and the gradient)."""
    p = cond_p + cond_p.T
    return jnp.maximum(p / jnp.maximum(jnp.sum(p), _EPS), _EPS)


def kl_and_grad(y: jnp.ndarray, p: jnp.ndarray):
    """Exact KL divergence and gradient (sklearn ``_kl_divergence``,
    degrees_of_freedom = 1): Q ∝ (1+d²)⁻¹, grad = 4·(diag(W·1) − W)·Y."""
    n = y.shape[0]
    num = 1.0 / (1.0 + _pairwise_sq_dists(y))
    num = num * (1.0 - jnp.eye(n, dtype=num.dtype))
    q = jnp.maximum(num / jnp.maximum(jnp.sum(num), _EPS), _EPS)
    # full-matrix sum == 2 × condensed sum (sklearn's factor 2.0)
    kl = jnp.sum(p * jnp.log(jnp.maximum(p, _EPS) / q))
    w = (p - q) * num
    grad = 4.0 * (y * jnp.sum(w, axis=1, keepdims=True)
                  - jnp.matmul(w, y, precision="highest"))
    return kl, grad


def descent_phase(y, update, gains, p, momentum, learning_rate, n_iter):
    """One gradient-descent phase as a lax.scan (sklearn
    ``_gradient_descent`` update rule: individual gains +0.2/×0.8 clipped at
    0.01, momentum step, no early abort)."""

    def step(carry, _):
        y, update, gains = carry
        kl, grad = kl_and_grad(y, p)
        inc = update * grad < 0.0
        gains = jnp.maximum(jnp.where(inc, gains + 0.2, gains * 0.8), _MIN_GAIN)
        grad = grad * gains
        update = momentum * update - learning_rate * grad
        return (y + update, update, gains), kl

    (y, update, gains), kls = jax.lax.scan(step, (y, update, gains), None,
                                           length=n_iter)
    return y, update, gains, kls


def pca_init(x: jnp.ndarray, n_components: int) -> jnp.ndarray:
    """PCA init scaled so std(component 0) = 1e-4 (sklearn TSNE._fit;
    deterministic svd_flip sign convention)."""
    xc = x - jnp.mean(x, axis=0)
    u, s, _ = jnp.linalg.svd(xc, full_matrices=False)
    u = u[:, :n_components] * s[:n_components]
    signs = jnp.sign(u[jnp.argmax(jnp.abs(u), axis=0), jnp.arange(u.shape[1])])
    u = u * signs[None, :]
    return u / jnp.std(u[:, 0]) * 1e-4


@partial(jax.jit, static_argnames=("n_components", "max_iter", "init"))
def _tsne_jit(x, key, perplexity, early_exaggeration, learning_rate,
              n_components, max_iter, init):
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    p = joint_p(conditional_p(_pairwise_sq_dists(x), perplexity))

    if init == "pca":
        y0 = pca_init(x, n_components)
    else:  # "random": sklearn uses standard_normal × 1e-4
        y0 = 1e-4 * jax.random.normal(key, (n, n_components), jnp.float32)

    update = jnp.zeros_like(y0)
    gains = jnp.ones_like(y0)

    # phase 1: early exaggeration, momentum 0.5 (sklearn TSNE._tsne)
    n1 = min(_EXPLORATION_ITER, max_iter)
    y, update, gains, _ = descent_phase(
        y0, update, gains, p * early_exaggeration, 0.5, learning_rate, n1)
    # phase 2: plain P, momentum 0.8
    n2 = max(max_iter - n1, 0)
    if n2:
        y, update, gains, _ = descent_phase(
            y, update, gains, p, 0.8, learning_rate, n2)
    kl, _ = kl_and_grad(y, p)
    return TsneResult(y, kl)


def tsne_fit(
    x,
    key: jax.Array | None = None,
    *,
    perplexity: float = 30.0,
    n_components: int = 2,
    max_iter: int = 1000,
    early_exaggeration: float = 12.0,
    learning_rate: float | str = "auto",
    init: str = "pca",
) -> TsneResult:
    """Fit exact t-SNE on device. Defaults mirror the reference's
    ``TSNE_PARAMS`` (02:63: perplexity 30, lr "auto", init "pca") and
    script 03's n_iter=1000 (03:451-460)."""
    if init not in ("pca", "random"):
        raise ValueError(f"init must be 'pca' or 'random', got {init!r}")
    n = np.shape(x)[0]
    if perplexity >= n:
        # exactly sklearn's validity domain (it raises for perplexity >=
        # n_samples); clamp instead of failing a one-off figure.  Any
        # perplexity sklearn accepts is left untouched for parity.
        perplexity = max((n - 1) / 3.0, 2.0)
    if learning_rate == "auto":  # sklearn TSNE._fit
        learning_rate = max(n / early_exaggeration / 4.0, 50.0)
    if key is None:
        key = jax.random.key(0)
    return _tsne_jit(
        jnp.asarray(x, jnp.float32), key,
        jnp.float32(perplexity), jnp.float32(early_exaggeration),
        jnp.float32(learning_rate), n_components, int(max_iter), init,
    )
