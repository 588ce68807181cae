"""On-device Ward agglomerative clustering.

The last diagnosis method still on CPU after round 2's spectral/isoforest
work (reference: sklearn ``AgglomerativeClustering(linkage='ward')``,
05:416-425).  Ward greedily merges the pair of clusters minimizing the
variance increase Δ(i,j) = (nᵢnⱼ/(nᵢ+nⱼ))·‖cᵢ−cⱼ‖².

TPU shape: a fixed-trip ``lax.fori_loop`` of N−k merges over STATIC-shape
state (centroids (N, D), sizes (N,), per-point cluster ids (N,)).  Each
iteration recomputes the full masked (N, N) merge-cost matrix — one fused
matmul + elementwise program, which the VPU/MXU stream far faster than any
clever mutating-heap bookkeeping would run on the scalar unit.  Merged
slots are deactivated by +inf cost masking; shapes never change, so the
whole fit is one compiled program.

Merge order equals sklearn's for distinct costs (ties may resolve
differently — cluster IDs are arbitrary either way and the comparison
pipeline's posterior calibration absorbs permutations).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class WardResult(NamedTuple):
    assignments: jnp.ndarray  # (N,) int in [0, n_clusters)
    centers: jnp.ndarray  # (n_clusters, D) cluster means


@partial(jax.jit, static_argnames=("n_clusters",))
def ward_fit(x: jnp.ndarray, n_clusters: int) -> WardResult:
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    if n_clusters >= n:
        raise ValueError(f"n_clusters={n_clusters} must be < n={n}")

    def merge_step(_, state):
        centroids, sizes, active, assign = state
        # pairwise squared centroid distances (‖a‖²+‖b‖²−2ab; full f32 —
        # the expansion cancels for near centroids)
        sq = jnp.sum(centroids**2, axis=1)
        gram = jnp.matmul(centroids, centroids.T, precision="highest")
        d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * gram, 0.0)
        w = (sizes[:, None] * sizes[None, :]) / (sizes[:, None] + sizes[None, :])
        cost = w * d2
        pair_ok = active[:, None] & active[None, :] & ~jnp.eye(n, dtype=bool)
        cost = jnp.where(pair_ok, cost, jnp.inf)

        flat = jnp.argmin(cost)
        i, j = flat // n, flat % n
        i, j = jnp.minimum(i, j), jnp.maximum(i, j)  # keep the lower slot

        n_i, n_j = sizes[i], sizes[j]
        c_new = (n_i * centroids[i] + n_j * centroids[j]) / (n_i + n_j)
        centroids = centroids.at[i].set(c_new)
        sizes = sizes.at[i].set(n_i + n_j)
        active = active.at[j].set(False)
        assign = jnp.where(assign == j, i, assign)
        return centroids, sizes, active, assign

    state = (
        x,
        jnp.ones((n,), jnp.float32),
        jnp.ones((n,), bool),
        jnp.arange(n),
    )
    centroids, sizes, active, assign = jax.lax.fori_loop(
        0, n - n_clusters, merge_step, state
    )

    # relabel surviving slots to dense 0..k-1 (active slots, ascending)
    slot_rank = jnp.cumsum(active) - 1  # rank of each slot among active ones
    labels = slot_rank[assign]
    # gather the k surviving centroids in the same rank order
    order = jnp.argsort(jnp.where(active, jnp.arange(n), n))[:n_clusters]
    return WardResult(labels.astype(jnp.int32), centroids[order])
