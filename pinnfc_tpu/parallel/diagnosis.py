"""Mesh-sharded diagnosis estimators — the multi-device story for the
downstream pipeline stages (scripts 02/03/05).

The single-device estimators (`diagnosis.gmm.gmm_fit`,
`diagnosis.logreg.logreg_fit`) are already sharding-transparent: the GMM
E-step and the per-sample logistic losses are embarrassingly row-parallel,
and every reduction over samples — the M-step moments ``respᵀX`` /
``einsum('cnd,cne->cde')`` (03:360-426 semantics), the Newton gradient
``Xᵀ(p−y)`` and Hessian einsum (02:195-207 semantics) — is a contraction
over the row axis that XLA's SPMD partitioner lowers to per-device partial
reductions plus one ``psum`` over ICI.  These wrappers only do the data
placement: pad the sample axis to a multiple of the mesh's 'data' axis
(device_put requires divisibility), shard rows, and pass the 1/0 row mask
through so the padded rows carry EXACTLY zero weight — the fitted model is
the unpadded one, not an approximation.

This is the scaling-book recipe end-to-end: pick a mesh, annotate
shardings, let XLA insert the collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pinnfc_tpu.diagnosis.gmm import GMMParams, gmm_fit
from pinnfc_tpu.diagnosis.kmeans import kmeans_fit
from pinnfc_tpu.diagnosis.logreg import LogRegModel, logreg_fit


def _data_axis_size(mesh) -> int:
    return mesh.shape["data"]


def _pad_rows(arr: np.ndarray, multiple: int):
    """Zero-pad axis 0 to a multiple; returns (padded, mask) — zeros are
    correct (not edge copies) because every consumer weights rows by the
    mask, so the pad content is mathematically irrelevant."""
    n = arr.shape[0]
    pad = (-n) % multiple
    mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
    if pad:
        arr = np.concatenate(
            [arr, np.zeros((pad,) + arr.shape[1:], arr.dtype)], axis=0
        )
    return arr, mask


def _shard_rows(mesh, arr, ndim):
    spec = P("data") if ndim == 1 else P("data", *([None] * (ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def gmm_fit_dp(
    x,
    key: jax.Array,
    n_components: int,
    mesh,
    max_iter: int = 100,
    tol: float = 1e-3,
    reg_covar: float = 1e-6,
    kmeans_iters: int = 50,
    init_resp=None,
    dtype=jnp.float32,
) -> GMMParams:
    """Data-parallel GMM EM over the mesh's 'data' axis.

    The k-means initialization runs replicated on the unpadded rows (it is
    a trivial fraction of the fit and its sequential k-means++ seeding does
    not shard well); the EM loop — the heavy part, C full-covariance
    Cholesky E-steps per iteration — runs row-sharded with the padded rows
    masked to exactly zero responsibility mass.  ``init_resp`` (N, C)
    replaces the on-device k-means init (e.g. sklearn_kmeans_init_resp for
    reference-exact trajectories)."""
    x = np.asarray(x, dtype)
    n_dev = _data_axis_size(mesh)

    if init_resp is not None:
        resp0 = np.asarray(init_resp, dtype)
    else:
        km = kmeans_fit(jnp.asarray(x), key, n_components, max_iter=kmeans_iters)
        # host-side one-hot (posterior.hard_responsibilities): an eager
        # device one_hot costs a multi-second remote compile per process on
        # relay-attached TPUs (CLAUDE.md), and the result is immediately
        # padded on host anyway
        from pinnfc_tpu.diagnosis.posterior import hard_responsibilities

        resp0 = hard_responsibilities(
            np.asarray(km.assignments), n_components
        ).astype(dtype)

    x_pad, mask = _pad_rows(x, n_dev)
    resp0_pad, _ = _pad_rows(resp0, n_dev)
    return gmm_fit(
        _shard_rows(mesh, x_pad, 2),
        key,
        n_components,
        max_iter=max_iter,
        tol=tol,
        reg_covar=reg_covar,
        mask=_shard_rows(mesh, np.asarray(mask, dtype), 1),
        init_resp=_shard_rows(mesh, resp0_pad, 2),
        dtype=dtype,
    )


def logreg_fit_dp(
    x,
    y,
    n_classes: int,
    mesh,
    max_iter: int = 1000,
    balanced: bool = True,
    c_reg: float = 1.0,
    tol: float = 1e-6,
    solver: str = "auto",
) -> LogRegModel:
    """Data-parallel multinomial logistic regression over the mesh's 'data'
    axis: rows sharded, padded rows at exactly zero weight in the
    standardization statistics, balanced class counts, and the Newton
    gradient/Hessian — the solve itself is a tiny replicated (D+1)K system."""
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.int64)
    n_dev = _data_axis_size(mesh)
    x_pad, mask = _pad_rows(x, n_dev)
    y_pad, _ = _pad_rows(y, n_dev)
    return logreg_fit(
        _shard_rows(mesh, x_pad, 2),
        _shard_rows(mesh, y_pad.astype(np.int32), 1),
        n_classes,
        max_iter=max_iter,
        balanced=balanced,
        c_reg=c_reg,
        tol=tol,
        solver=solver,
        mask=_shard_rows(mesh, mask, 1),
    )
