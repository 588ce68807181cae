"""Gaussian-mixture EM on device (TPU-native GaussianMixture).

The reference fits ``sklearn.GaussianMixture(n_components=20,
covariance_type='full')`` on the four physics residuals (03:384-389).  Here
EM runs entirely in jnp under ``jit``: Cholesky-based log-densities, one
``lax.scan`` over EM iterations with sklearn's convergence rule (change in
mean per-sample log-likelihood < tol) implemented as an update-freeze, and
k-means initialization (sklearn's default ``init_params='kmeans'``).

Shapes: X (N, D), means (C, D), covariances (C, D, D).  The E-step is a
batched matmul/triangular-solve — MXU work; no Python loops anywhere.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pinnfc_tpu.diagnosis.kmeans import kmeans_fit


class GMMParams(NamedTuple):
    weights: jnp.ndarray  # (C,)
    means: jnp.ndarray  # (C, D)
    covariances: jnp.ndarray  # (C, D, D)
    converged: jnp.ndarray  # () bool
    n_iter: jnp.ndarray  # () int
    lower_bound: jnp.ndarray  # () mean per-sample log-likelihood


def _log_gaussian_prob(x: jnp.ndarray, means: jnp.ndarray, covs: jnp.ndarray):
    """log N(x | μ_c, Σ_c) for all samples × components, in sklearn's own
    formulation: precompute the precision Cholesky ``B = L⁻ᵀ`` per component
    (sklearn ``_compute_precision_cholesky``) and evaluate the Mahalanobis
    term as ``‖x·B − μ·B‖²`` (sklearn ``_estimate_log_gaussian_prob``).

    This shape matters for SPMD: a batched ``triangular_solve`` against the
    row-sharded diff forced the partitioner to all-gather the sample axis
    (the whole E-step ran replicated on every device).  Here the only solve
    is the tiny replicated (C, D, D) inversion; everything touching the N
    axis is a plain matmul, which shards row-parallel with zero collectives
    (the psums appear only in the M-step contractions, as intended)."""
    d = x.shape[1]
    chol = jnp.linalg.cholesky(covs)  # (C, D, D)
    eye = jnp.broadcast_to(jnp.eye(d, dtype=x.dtype), chol.shape)
    l_inv = jax.lax.linalg.triangular_solve(
        chol, eye, left_side=True, lower=True
    )  # L⁻¹, (C, D, D)
    prec_chol = jnp.swapaxes(l_inv, 1, 2)  # B = L⁻ᵀ
    xb = jnp.einsum("nd,cde->cne", x, prec_chol,
                    precision="highest")  # (C, N, D), row-sharded
    mub = jnp.einsum("cd,cde->ce", means, prec_chol, precision="highest")
    maha = jnp.sum((xb - mub[:, None, :]) ** 2, axis=2)  # (C, N)
    # log|Σ_c|⁻¹ᐟ² = Σ log diag(B_c)  (diag(L⁻ᵀ) = 1/diag(L))
    log_det = jnp.sum(
        jnp.log(jnp.diagonal(prec_chol, axis1=1, axis2=2)), axis=1
    )  # (C,)
    return (-0.5 * (d * jnp.log(2.0 * jnp.pi) + maha) + log_det[:, None]).T  # (N, C)


def _e_step(x, params, mask=None):
    """``mask`` (N,) of 1/0 excludes padded rows from the mean
    log-likelihood (row padding is how arbitrary N shards over a device
    mesh — see parallel.diagnosis); their log_resp rows are garbage but
    the masked M-step never reads them.

    Note reg_covar is NOT re-added here: like sklearn, the covariances
    coming out of the M-step already carry it on the diagonal, and the
    E-step Choleskys them as stored."""
    weights, means, covs = params
    log_prob = _log_gaussian_prob(x, means, covs) + jnp.log(weights)[None, :]
    log_norm = jax.scipy.special.logsumexp(log_prob, axis=1, keepdims=True)
    log_resp = log_prob - log_norm
    if mask is None:
        lb = jnp.mean(log_norm)
    else:
        lb = jnp.sum(log_norm[:, 0] * mask) / jnp.sum(mask)
    return lb, log_resp


def _gaussian_parameters(x, resp, reg, mask=None):
    """sklearn ``_estimate_gaussian_parameters`` for 'full' covariances:
    returns (nk, means, covariances-with-reg-on-the-diagonal)."""
    if mask is not None:
        resp = resp * mask[:, None]
    nk = jnp.sum(resp, axis=0) + 10.0 * jnp.finfo(resp.dtype).eps  # (C,)
    means = jnp.einsum("nc,nd->cd", resp, x,
                       precision="highest") / nk[:, None]  # (C, D)
    diff = x[None, :, :] - means[:, None, :]  # (C, N, D)
    wdiff = diff * resp.T[:, :, None]
    covs = jnp.einsum("cnd,cne->cde", wdiff, diff,
                      precision="highest") / nk[:, None, None]
    covs = covs + reg * jnp.eye(x.shape[1], dtype=x.dtype)[None, :, :]
    return nk, means, covs


@partial(
    jax.jit,
    static_argnames=(
        "n_components", "max_iter", "tol", "reg_covar", "kmeans_iters", "dtype",
    ),
)
def gmm_fit(
    x: jnp.ndarray,
    key: jax.Array,
    n_components: int,
    max_iter: int = 100,
    tol: float = 1e-3,
    reg_covar: float = 1e-6,
    kmeans_iters: int = 50,
    mask: jnp.ndarray | None = None,
    init_resp: jnp.ndarray | None = None,
    dtype=jnp.float32,
) -> GMMParams:
    """Fit by EM.  Matches sklearn's loop structure: converged when the mean
    per-sample log-likelihood improves by < tol between iterations
    (03:384-389).  The loop is a ``lax.while_loop`` so a fit that converges
    in k iterations runs k E/M steps, not max_iter (the round-1 freeze-scan
    burned all 100 regardless; results are numerically identical — the
    converging iteration still applies its update, like sklearn's break).

    ``mask`` (N,) of 1/0 excludes padded rows exactly (their responsibility
    mass and log-likelihood contribution are zeroed) — row padding is how
    arbitrary N shards over a device mesh (parallel.diagnosis.gmm_fit_dp).
    A mask requires ``init_resp`` (the k-means initializer is unmasked and
    would see the padded rows).  ``init_resp`` (N, C) replaces the k-means
    one-hot initialization when given — ``sklearn_kmeans_init_resp``
    produces sklearn's own initialization, making the EM trajectory
    directly comparable to ``GaussianMixture.fit`` (exactly so under
    ``dtype=jnp.float64`` with x64 enabled — sklearn's update equations
    are reproduced term for term, including the weights' nk/Σnk vs nk/N
    normalization split between the M-step and the initialization)."""
    x = jnp.asarray(x, dtype)
    n, d = x.shape
    if mask is not None and init_resp is None:
        raise ValueError("mask requires init_resp (k-means init is unmasked)")

    if init_resp is None:
        # kmeans init → one-hot resp → initial M-step (sklearn default)
        km = kmeans_fit(x, key, n_components, max_iter=kmeans_iters)
        resp0 = jax.nn.one_hot(km.assignments, n_components, dtype=x.dtype)
    else:
        resp0 = jnp.asarray(init_resp, x.dtype)
    nk0, means0, covs0 = _gaussian_parameters(x, resp0, reg_covar, mask)
    # sklearn _initialize: weights = nk / n_samples (NOT nk / Σnk)
    n_eff = jnp.asarray(n, x.dtype) if mask is None else jnp.sum(mask)
    params0 = (nk0 / n_eff, means0, covs0)

    def cond(carry):
        _params, _prev_lb, converged, n_iter = carry
        return jnp.logical_and(~converged, n_iter < max_iter)

    def body(carry):
        params, prev_lb, _converged, n_iter = carry
        lb, log_resp = _e_step(x, params, mask)
        nk, means, covs = _gaussian_parameters(x, jnp.exp(log_resp), reg_covar, mask)
        # sklearn _m_step: weights = nk / Σnk
        new_params = (nk / jnp.sum(nk), means, covs)
        just_converged = jnp.abs(lb - prev_lb) < tol
        return (new_params, lb, just_converged, n_iter + 1)

    init = (params0, jnp.asarray(-jnp.inf, x.dtype), jnp.asarray(False), jnp.asarray(0))
    params, lb, converged, n_iter = jax.lax.while_loop(cond, body, init)
    weights, means, covs = params
    return GMMParams(weights, means, covs, converged, n_iter, lb)


def sklearn_kmeans_init_resp(
    x: np.ndarray, n_components: int, random_state: int = 42
) -> np.ndarray:
    """sklearn ``GaussianMixture``'s own initialization, computed with
    sklearn itself (one CPU k-means, a trivial fraction of the fit): the
    one-hot responsibilities of ``KMeans(n_clusters, n_init=1,
    random_state=check_random_state(seed))`` labels — byte-for-byte the
    ``_initialize_parameters(init_params='kmeans')`` resp (sklearn
    mixture/_base.py).  Injecting this via ``gmm_fit(init_resp=...)``
    pins our EM to the same starting point as the reference's
    ``GaussianMixture(random_state=...)`` (03:384-389)."""
    from sklearn import cluster
    from sklearn.utils import check_random_state

    x = np.asarray(x)
    labels = (
        cluster.KMeans(
            n_clusters=n_components, n_init=1,
            random_state=check_random_state(random_state),
        )
        .fit(x)
        .labels_
    )
    resp = np.zeros((x.shape[0], n_components), dtype=np.float64)
    resp[np.arange(x.shape[0]), labels] = 1.0
    return resp


@jax.jit
def gmm_predict_proba(model: GMMParams, x: jnp.ndarray) -> jnp.ndarray:
    """Responsibilities P(component | x) (sklearn predict_proba)."""
    x = jnp.asarray(x, model.means.dtype)
    _, log_resp = _e_step(x, (model.weights, model.means, model.covariances))
    return jnp.exp(log_resp)


def gmm_score_samples(model: GMMParams, x: jnp.ndarray):
    """Per-sample log-likelihood under the mixture."""
    x = jnp.asarray(x, model.means.dtype)
    log_prob = _log_gaussian_prob(x, model.means, model.covariances)
    return jax.scipy.special.logsumexp(log_prob + jnp.log(model.weights)[None, :], axis=1)
