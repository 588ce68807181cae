"""KMeans on device: k-means++ seeding + Lloyd iterations under jit.

TPU-native replacement for sklearn KMeans as used by script 05's
"KMeans posterior" method (05:346-393) and as the GMM initializer
(sklearn ``init_params='kmeans'``).  Distances are one big matmul
(‖x‖² − 2x·μᵀ + ‖μ‖²) — MXU-friendly; Lloyd runs as a fixed-length
``lax.scan`` with an update freeze once assignments stop changing.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class KMeansResult(NamedTuple):
    centers: jnp.ndarray  # (C, D)
    assignments: jnp.ndarray  # (N,)
    inertia: jnp.ndarray  # () sum of squared distances
    n_iter: jnp.ndarray  # ()


def _pairwise_sq_dists(x, centers):
    x2 = jnp.sum(x**2, axis=1, keepdims=True)  # (N, 1)
    c2 = jnp.sum(centers**2, axis=1)[None, :]  # (1, C)
    # full-f32 matmul: the ||a||²+||b||²−2ab expansion cancels
    # catastrophically in bf16 and flips argmin for near-tied points
    # (same guard as spectral/tsne/ward)
    return jnp.maximum(
        x2 - 2.0 * jnp.matmul(x, centers.T, precision="highest") + c2, 0.0
    )


def _kmeans_plus_plus(x: jnp.ndarray, key: jax.Array, n_clusters: int) -> jnp.ndarray:
    """k-means++ seeding (sequential by nature → lax.fori_loop of length C)."""
    n, d = x.shape
    k0, key = jax.random.split(key)
    first = x[jax.random.randint(k0, (), 0, n)]
    centers = jnp.zeros((n_clusters, d), x.dtype).at[0].set(first)
    min_d2 = jnp.sum((x - first) ** 2, axis=1)

    def body(i, state):
        centers, min_d2, key = state
        key, sub = jax.random.split(key)
        probs = min_d2 / jnp.maximum(jnp.sum(min_d2), 1e-30)
        idx = jax.random.choice(sub, n, p=probs)
        c = x[idx]
        centers = centers.at[i].set(c)
        min_d2 = jnp.minimum(min_d2, jnp.sum((x - c) ** 2, axis=1))
        return centers, min_d2, key

    centers, _, _ = jax.lax.fori_loop(1, n_clusters, body, (centers, min_d2, key))
    return centers


@partial(jax.jit, static_argnames=("n_clusters", "max_iter", "tol", "n_init"))
def kmeans_fit(
    x: jnp.ndarray,
    key: jax.Array,
    n_clusters: int,
    max_iter: int = 300,
    tol: float = 1e-4,
    n_init: int = 4,
) -> KMeansResult:
    """Best of ``n_init`` restarts (sklearn-style), all restarts vmapped into
    one device program."""
    x = jnp.asarray(x, jnp.float32)
    if n_init > 1:
        keys = jax.random.split(key, n_init)
        results = jax.vmap(
            lambda k: _kmeans_single(x, k, n_clusters, max_iter, tol)
        )(keys)
        best = jnp.argmin(results.inertia)
        return jax.tree_util.tree_map(lambda a: a[best], results)
    return _kmeans_single(x, key, n_clusters, max_iter, tol)


@partial(jax.jit, static_argnames=("n_clusters", "max_iter", "tol"))
def _kmeans_single(
    x: jnp.ndarray,
    key: jax.Array,
    n_clusters: int,
    max_iter: int = 300,
    tol: float = 1e-4,
) -> KMeansResult:
    x = jnp.asarray(x, jnp.float32)

    centers0 = _kmeans_plus_plus(x, key, n_clusters)

    def lloyd(carry, _):
        centers, done, n_iter = carry
        d2 = _pairwise_sq_dists(x, centers)
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, n_clusters, dtype=x.dtype)  # (N, C)
        counts = jnp.sum(onehot, axis=0)  # (C,)
        sums = onehot.T @ x  # (C, D)
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
        )
        shift = jnp.sum((new_centers - centers) ** 2)
        new_done = done | (shift <= tol)
        centers = jnp.where(done, centers, new_centers)
        n_iter = jnp.where(done, n_iter, n_iter + 1)
        return (centers, new_done, n_iter), None

    init = (centers0, jnp.asarray(False), jnp.asarray(0))
    (centers, _, n_iter), _ = jax.lax.scan(lloyd, init, None, length=max_iter)

    d2 = _pairwise_sq_dists(x, centers)
    assignments = jnp.argmin(d2, axis=1)
    inertia = jnp.sum(jnp.min(d2, axis=1))
    return KMeansResult(centers, assignments, inertia, n_iter)


def kmeans_predict(centers: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-center assignment (test-set path of 05:385-392)."""
    return jnp.argmin(_pairwise_sq_dists(jnp.asarray(x, jnp.float32), centers), axis=1)
