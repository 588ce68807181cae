"""On-device spectral clustering (kNN affinity + normalized-Laplacian eigh
+ vmapped k-means), replacing the sklearn CPU fallback (05:455-512).

Pipeline, matching sklearn.SpectralClustering(affinity='nearest_neighbors',
assign_labels='kmeans'):

1. kNN connectivity A from pairwise squared distances (one (N,N) matmul —
   MXU-shaped), self included, symmetrized 0.5·(A + Aᵀ);
2. normalized Laplacian L = I − D^{-1/2} A D^{-1/2}; full ``jnp.linalg.eigh``
   (ascending eigenvalues → the first n_clusters columns are the embedding);
3. rows rescaled by D^{-1/2} (sklearn's spectral_embedding recovers
   u = D^{-1/2}·v) and sign-fixed deterministically;
4. k-means on the embedding (pinnfc_tpu.diagnosis.kmeans, vmapped restarts).

A full eigh computes all N eigenpairs where sklearn's ARPACK/LOBPCG finds
only n_clusters — but eigh is ONE fused dense kernel the TPU compiler
pipelines well at these N (≤ tens of thousands), whereas iterative sparse
solvers are scalar-heavy and host-bound.  Labels agree with sklearn up to
clustering-seed noise; cluster IDs are arbitrary in both (the comparison
pipeline calibrates them away).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pinnfc_tpu.diagnosis.kmeans import kmeans_fit


class SpectralResult(NamedTuple):
    assignments: jnp.ndarray  # (N,) int cluster labels
    embedding: jnp.ndarray  # (N, n_clusters) spectral embedding


@partial(jax.jit, static_argnames=("n_clusters", "n_neighbors"))
def spectral_fit(
    x: jnp.ndarray,
    key: jax.Array,
    n_clusters: int,
    n_neighbors: int = 10,
) -> SpectralResult:
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]

    # pairwise squared distances via the ‖a‖²+‖b‖²−2ab expansion; the
    # expansion cancels catastrophically for near neighbors, so the matmul
    # must run full-f32 (repo convention: 'highest' where numerics matter)
    sq = jnp.sum(x**2, axis=1)
    gram = jnp.matmul(x, x.T, precision="highest")
    d2 = sq[:, None] + sq[None, :] - 2.0 * gram

    # kNN graph, self included (sklearn kneighbors_graph(include_self=True))
    _, idx = jax.lax.top_k(-d2, n_neighbors)
    rows = jnp.repeat(jnp.arange(n), n_neighbors)
    a = jnp.zeros((n, n), jnp.float32).at[rows, idx.reshape(-1)].set(1.0)
    a = 0.5 * (a + a.T)

    # normalized Laplacian
    d = jnp.sum(a, axis=1)
    d_isqrt = 1.0 / jnp.sqrt(jnp.maximum(d, 1e-12))
    lap = jnp.eye(n) - (d_isqrt[:, None] * a) * d_isqrt[None, :]

    # ascending eigenvalues → first n_clusters eigenvectors span the
    # smallest-eigenvalue subspace
    _, vecs = jnp.linalg.eigh(lap)
    emb = vecs[:, :n_clusters] * d_isqrt[:, None]  # u = D^{-1/2} v

    # deterministic sign flip (sklearn _deterministic_vector_sign_flip)
    flip = jnp.sign(emb[jnp.argmax(jnp.abs(emb), axis=0), jnp.arange(n_clusters)])
    emb = emb * flip[None, :]

    km = kmeans_fit(emb, key, n_clusters)
    return SpectralResult(km.assignments, emb)
