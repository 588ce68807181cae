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

Eigensolver choice is size-dependent (``solver="auto"``):

- small N: full ``jnp.linalg.eigh`` — ONE fused dense kernel the TPU
  compiler pipelines well, and sklearn-exact eigenvectors;
- large N: full eigh only needs the bottom n_clusters eigenvectors but
  computes all N, and its QDWH factorization materializes O(N²) temps that
  blow past HBM around N ≈ 10k (measured: OOM at N = 11,700 on one v5e).
  Instead, block orthogonal iteration on ``2I − L`` (eigenvalues of L lie
  in [0, 2], so the bottom-k of L are the top-k of 2I − L): each step is an
  (N,N)×(N,k) matmul — pure MXU work — plus a tiny (N,k) QR.  k-means on
  the converged subspace is EXACTLY equivalent to k-means on the true
  eigenvectors: any basis of the invariant subspace differs by a k×k
  rotation, which preserves all pairwise row distances (the row rescale by
  D^{-1/2} commutes with the rotation).

Labels agree with sklearn up to clustering-seed noise; cluster IDs are
arbitrary in both (the comparison pipeline calibrates them away).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from pinnfc_tpu.diagnosis.kmeans import kmeans_fit

# above this N the dense-eigh temps no longer fit in HBM; flip to subspace
# iteration (measured: eigh OOMs at N=11,700, benchmarks/diagnosis_bench.py)
_EIGH_MAX_N = 4096


class SpectralResult(NamedTuple):
    assignments: jnp.ndarray  # (N,) int cluster labels
    embedding: jnp.ndarray  # (N, n_clusters) spectral embedding


def _bottom_k_subspace(lap, k, key, tol=1e-5, max_iter=3000):
    """Orthonormal basis of the bottom-k eigenspace of ``lap`` via block
    orthogonal iteration on 2I − lap; columns sorted by Rayleigh quotient
    (ascending in lap's spectrum, matching eigh's ordering convention).

    Converges at rate ((2−μ_{k+1})/(2−μ_k)) per step, so a small eigengap
    needs many steps — the loop therefore runs to an explicit invariance
    criterion (max Rayleigh-Ritz residual ‖A·q − q·(qᵀAq)‖∞ ≤ tol) instead
    of a fixed trip count, with a generous iteration cap.  Each step is one
    (N,N)×(N,k) MXU matmul + a tiny QR; the residual check reuses the same
    product, so checking every step is free.
    """
    n = lap.shape[0]
    a = 2.0 * jnp.eye(n, dtype=lap.dtype) - lap
    q0 = jnp.linalg.qr(jax.random.normal(key, (n, k), lap.dtype))[0]

    def cond(carry):
        _, res, it = carry
        return (it < max_iter) & (res > tol)

    def body(carry):
        q, _, it = carry
        z = jnp.matmul(a, q, precision="highest")
        # Rayleigh-Ritz residual of the CURRENT q, from the same product
        h = jnp.matmul(q.T, z, precision="highest")  # (k, k)
        res = jnp.max(jnp.abs(z - jnp.matmul(q, h, precision="highest")))
        return jnp.linalg.qr(z)[0], res, it + 1

    q, _, _ = jax.lax.while_loop(cond, body, (q0, jnp.asarray(jnp.inf), 0))
    theta = jnp.sum(q * jnp.matmul(lap, q, precision="highest"), axis=0)
    return q[:, jnp.argsort(theta)]


@partial(jax.jit, static_argnames=("n_clusters", "n_neighbors", "solver"))
def spectral_fit(
    x: jnp.ndarray,
    key: jax.Array,
    n_clusters: int,
    n_neighbors: int = 10,
    solver: str = "auto",
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

    # bottom-n_clusters eigenspace of the Laplacian
    if solver not in ("auto", "eigh", "subspace"):
        raise ValueError(f"unknown solver {solver!r}")
    use_eigh = solver == "eigh" or (solver == "auto" and n <= _EIGH_MAX_N)
    if use_eigh:
        # ascending eigenvalues → first n_clusters columns
        _, vecs_full = jnp.linalg.eigh(lap)
        vecs = vecs_full[:, :n_clusters]
    else:
        key, sub_key = jax.random.split(key)
        vecs = _bottom_k_subspace(lap, n_clusters, sub_key)
    emb = vecs * d_isqrt[:, None]  # u = D^{-1/2} v

    # deterministic sign flip (sklearn _deterministic_vector_sign_flip)
    flip = jnp.sign(emb[jnp.argmax(jnp.abs(emb), axis=0), jnp.arange(n_clusters)])
    emb = emb * flip[None, :]

    km = kmeans_fit(emb, key, n_clusters)
    return SpectralResult(km.assignments, emb)
