"""On-device Ward agglomerative clustering.

Reference: sklearn ``AgglomerativeClustering(linkage='ward')`` (05:416-425).
Ward greedily merges the pair of clusters minimizing the variance increase
Δ(i,j) = (nᵢnⱼ/(nᵢ+nⱼ))·‖cᵢ−cⱼ‖².

Two exact algorithms, chosen by size (``algorithm="auto"``):

- ``"global"`` (small N): a fixed-trip ``lax.fori_loop`` of N−k merges,
  each recomputing the full masked (N, N) merge-cost matrix — one fused
  matmul + argmin program.  Simple and exactly sklearn's greedy order, but
  each step streams N² elements: measured 56 s at N = 11,700 on one v5e
  (benchmarks/diagnosis_bench.py).
- ``"nn-chain"`` (large N): the nearest-neighbor-chain algorithm sklearn
  and scipy themselves use.  Ward is a *reducible* linkage, so merging
  reciprocal nearest neighbors found by walking a NN chain yields the same
  dendrogram as global greedy search; each chain step is one O(N·D) row of
  centroid costs + an (N,) argmin — no (N,N) state at all (Ward costs come
  straight from centroids, which IS the Lance-Williams recurrence's fixed
  point for this linkage).  The ~≤3N sequential steps run in one
  ``lax.while_loop``.  NN-chain merge *execution* order is not
  cost-monotone, so the k-cluster partition is recovered the way scipy's
  ``label`` does: sort the N−1 recorded merges by height and replay the
  cheapest N−k through a label-propagation union-find (reducibility
  guarantees sorted replay reconstructs the dendrogram).

Cluster IDs are arbitrary (as in sklearn) — the comparison pipeline's
posterior calibration absorbs permutations.  Exact cost TIES (duplicate
rows, symmetric configurations) may resolve differently than sklearn's
tie rule — in the global path at the argmin, in the NN-chain at the
sorted-replay boundary — giving a different but equally-valid dendrogram;
for distinct costs the result is identical (ARI = 1.0 tests).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

# above this N the global algorithm's per-merge (N,N) streams dominate;
# flip to the NN-chain (measured crossover well below campaign scale)
_GLOBAL_MAX_N = 2048


class WardResult(NamedTuple):
    assignments: jnp.ndarray  # (N,) int in [0, n_clusters)
    centers: jnp.ndarray  # (n_clusters, D) cluster means


def _ward_global(x: jnp.ndarray, n_clusters: int) -> jnp.ndarray:
    """Greedy global-minimum merges; returns per-point slot assignments and
    the active-slot mask."""
    n, _ = x.shape

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
    _, _, active, assign = jax.lax.fori_loop(0, n - n_clusters, merge_step, state)

    # relabel surviving slots to dense 0..k-1 (active slots, ascending)
    slot_rank = jnp.cumsum(active) - 1
    return (slot_rank[assign]).astype(jnp.int32)


def _ward_nn_chain(x: jnp.ndarray, n_clusters: int) -> jnp.ndarray:
    """NN-chain Ward; returns per-point labels in [0, n_clusters)."""
    n, _ = x.shape
    ar = jnp.arange(n)
    inf = jnp.float32(jnp.inf)

    def row_cost(centroids, sizes, active, i):
        diff = centroids - centroids[i]
        d2 = jnp.sum(diff * diff, axis=1)
        w = sizes * sizes[i] / (sizes + sizes[i])
        return jnp.where(active & (ar != i), w * d2, inf)

    def cond(s):
        return s[-1] < n - 1

    def body(s):
        centroids, sizes, active, chain, clen, m_a, m_b, m_h, mcount = s
        # (re)start the chain from the first active cluster when empty
        empty = clen == 0
        top = jnp.where(empty, jnp.argmax(active),
                        chain[jnp.maximum(clen - 1, 0)])
        chain = chain.at[0].set(jnp.where(empty, top, chain[0]))
        clen = jnp.where(empty, 1, clen)

        row = row_cost(centroids, sizes, active, top)
        y0 = jnp.argmin(row)
        # prefer the previous chain element on cost ties (scipy's rule —
        # guarantees the chain's costs strictly decrease, hence termination)
        prev = chain[jnp.maximum(clen - 2, 0)]
        reciprocal = (clen >= 2) & (row[prev] <= row[y0])
        y = jnp.where(reciprocal, prev, y0)

        def merge(ops):
            centroids, sizes, active, chain, clen, m_a, m_b, m_h, mcount = ops
            a, b = jnp.minimum(top, y), jnp.maximum(top, y)
            na, nb = sizes[a], sizes[b]
            centroids = centroids.at[a].set(
                (na * centroids[a] + nb * centroids[b]) / (na + nb)
            )
            sizes = sizes.at[a].set(na + nb)
            active = active.at[b].set(False)
            m_a = m_a.at[mcount].set(a)
            m_b = m_b.at[mcount].set(b)
            m_h = m_h.at[mcount].set(row[y])
            return (centroids, sizes, active, chain, clen - 2,
                    m_a, m_b, m_h, mcount + 1)

        def push(ops):
            centroids, sizes, active, chain, clen, m_a, m_b, m_h, mcount = ops
            return (centroids, sizes, active, chain.at[clen].set(y), clen + 1,
                    m_a, m_b, m_h, mcount)

        return jax.lax.cond(
            reciprocal, merge, push,
            (centroids, sizes, active, chain, clen, m_a, m_b, m_h, mcount),
        )

    state = (
        x,
        jnp.ones((n,), jnp.float32),
        jnp.ones((n,), bool),
        jnp.zeros((n + 2,), jnp.int32),
        jnp.int32(0),
        jnp.zeros((n - 1,), jnp.int32),
        jnp.zeros((n - 1,), jnp.int32),
        jnp.zeros((n - 1,), jnp.float32),
        jnp.int32(0),
    )
    *_, m_a, m_b, m_h, _ = jax.lax.while_loop(cond, body, state)

    # sorted replay: apply the N−k cheapest merges via label propagation
    order = jnp.argsort(m_h)

    def apply(t, lbl):
        m = order[t]
        ra, rb = lbl[m_a[m]], lbl[m_b[m]]
        return jnp.where(lbl == rb, ra, lbl)

    lbl = jax.lax.fori_loop(0, n - n_clusters, apply, jnp.arange(n))
    reps = jnp.unique(lbl, size=n_clusters, fill_value=n)
    return jnp.searchsorted(reps, lbl).astype(jnp.int32)


@partial(jax.jit, static_argnames=("n_clusters", "algorithm"))
def ward_fit(
    x: jnp.ndarray, n_clusters: int, algorithm: str = "auto"
) -> WardResult:
    x = jnp.asarray(x, jnp.float32)
    n, _ = x.shape
    if n_clusters >= n:
        raise ValueError(f"n_clusters={n_clusters} must be < n={n}")
    if algorithm not in ("auto", "global", "nn-chain"):
        raise ValueError(f"unknown algorithm {algorithm!r}")
    use_global = algorithm == "global" or (
        algorithm == "auto" and n <= _GLOBAL_MAX_N
    )
    labels = (_ward_global if use_global else _ward_nn_chain)(x, n_clusters)

    # cluster means via one-hot matmul (MXU-shaped segment means)
    onehot = (labels[:, None] == jnp.arange(n_clusters)[None, :]).astype(x.dtype)
    counts = jnp.maximum(jnp.sum(onehot, axis=0), 1.0)
    centers = jnp.matmul(onehot.T, x, precision="highest") / counts[:, None]
    return WardResult(labels, centers)
