"""Identifiability analysis of the 17 physics parameters (λ's).

The reference *identifies* its physics parameters by gradient descent
(train_lambda / train_thermal / train_hydrogen / train_oxygen,
01:966-1399) but never asks HOW WELL they are identified — it prints the
point estimates and moves on.  For an *explainable* diagnosis framework
the natural next question is the curvature of each stage's own loss at
the optimum:

* a **Gauss-Newton 95% confidence interval** per parameter
  (``Cov(λ) ≈ σ̂²(JᵀJ)⁻¹`` with ``J = ∂r/∂λ`` the residual Jacobian and
  ``σ̂² = Σr²/(N−k)`` — the standard nonlinear-least-squares asymptotics),
* a **sensitivity** per parameter (RMS of its Jacobian column — how much
  one unit of λ moves the residuals at all),
* an **unidentifiable** flag for parameters the loss simply does not see
  (zero Jacobian column).  This formally detects the reference's two
  dead parameters: λ4 of the voltage group (the upstream ``lambda_3``
  name-shadowing bug, 01:468 — models/pinn.py LAMBDA_NAMES) and λ4 of
  the oxygen group (enters no formula), and
* an **at-bound** flag where the box clamp (01:1040-1047 etc.) is
  active, since interval asymptotics are meaningless on an active
  constraint (e.g. ``i_l`` pinned at its lower bound 2.0).

The residual vector per group is exactly the one its training stage
minimizes (training/stages.py): ``voltage_residual(...).f`` for λV
(the ``dnn_para=True`` stage loss, 01:1029), and
``thermal_residual_simple/hydrogen_residual/oxygen_residual(...).f`` for
the others.  Jacobians come from one jitted ``jax.jacfwd`` per group
(k ≤ 6 parameters — forward mode is the cheap direction); the k×k linear
algebra runs in float64 on the host.

``cli identify`` drives this from a checkpoint + exported artifact.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.mlp import mlp_forward
from pinnfc_tpu.models.pinn import LAMBDA_BOUNDS, LAMBDA_NAMES
from pinnfc_tpu.physics.hydrogen import hydrogen_residual
from pinnfc_tpu.physics.oxygen import oxygen_residual
from pinnfc_tpu.physics.thermal import thermal_residual_simple
from pinnfc_tpu.physics.voltage import voltage_residual


class GroupIdentifiability(NamedTuple):
    """Per-λ-group identifiability report (arrays of length k)."""

    group: str
    names: Tuple[str, ...]
    values: np.ndarray
    stderr: np.ndarray  # inf where unidentifiable
    ci_lo: np.ndarray
    ci_hi: np.ndarray
    sensitivity: np.ndarray  # RMS ∂r/∂λ_j over the N residuals
    identifiable: np.ndarray  # bool — non-zero Jacobian column
    at_bound: np.ndarray  # bool — box clamp active at the optimum
    n_residuals: int  # finite rows that informed the interval
    n_dropped: int  # rows dropped as non-finite at this λ
    dof: int
    sigma2: float  # σ̂² residual variance estimate
    # (k, k) estimate correlation matrix: |corr| → 1 means the two
    # parameters trade off along a sloppy direction of the loss (they are
    # only jointly identified); NaN rows/cols for unidentifiable params
    corr: np.ndarray


def gauss_newton_ci(
    r: np.ndarray,
    jac: np.ndarray,
    z: float = 1.959964,
    sens_rtol: float = 1e-9,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, float, int, np.ndarray]:
    """Pure Gauss-Newton interval math: residuals (N,) + Jacobian (N,k) →
    (stderr, sensitivity, identifiable, dof, σ̂², n_used, corr).

    Unidentifiable columns (RMS sensitivity ≤ ``sens_rtol`` × the largest
    column's, or exactly zero) are excluded from the normal matrix; their
    stderr is +inf.  The reduced JᵀJ is inverted by pseudo-inverse, so a
    residual rank deficiency degrades gracefully instead of raising.

    Rows whose residual or Jacobian is non-finite are dropped first —
    these are the rows where the physics is undefined at the current λ
    (log of a non-positive concentration etc.; the reference's training
    try/excepts exist for the same reason).  Returns the row counts so
    callers can report how many rows informed the interval.
    """
    r = np.asarray(r, np.float64).ravel()
    jac = np.asarray(jac, np.float64).reshape(r.shape[0], -1)
    finite = np.isfinite(r) & np.isfinite(jac).all(axis=1)
    r, jac = r[finite], jac[finite]
    if r.shape[0] == 0:
        raise ValueError(
            "every residual row is non-finite at this λ — nothing to "
            "analyze (is the model trained?)"
        )
    n, k = jac.shape
    sens = np.sqrt(np.mean(jac**2, axis=0))
    identifiable = sens > max(sens.max(), 0.0) * sens_rtol
    k_id = int(identifiable.sum())
    dof = max(n - k_id, 1)
    sigma2 = float(np.sum(r**2) / dof)
    stderr = np.full(k, np.inf)
    corr = np.full((k, k), np.nan)
    if k_id:
        j_id = jac[:, identifiable]
        cov = sigma2 * np.linalg.pinv(j_id.T @ j_id)
        se_id = np.sqrt(np.maximum(np.diag(cov), 0.0))
        stderr[identifiable] = se_id
        # estimate correlations — the sloppy-direction diagnostic
        denom = np.outer(se_id, se_id)
        with np.errstate(invalid="ignore", divide="ignore"):
            c_id = np.where(denom > 0, cov / denom, np.nan)
        idx = np.flatnonzero(identifiable)
        corr[np.ix_(idx, idx)] = np.clip(c_id, -1.0, 1.0)
    return stderr, sens, identifiable, dof, sigma2, n, corr


def _residual_fn(group: str, params, x_norm, scaler_x, scaler_y):
    """The residual vector each training stage minimizes, as a function of
    that stage's λ alone (everything else frozen — matching the staged
    freeze/unfreeze optimization)."""
    if group == "lam_v":
        u_pred, _ = mlp_forward(params["mlp"], x_norm, train=False)

        def r_fn(lam):
            return voltage_residual(
                lam, x_norm, u_pred, scaler_x, scaler_y
            ).f.ravel()

        return r_fn
    residual = {
        "lam_t": thermal_residual_simple,
        "lam_h": hydrogen_residual,
        "lam_o": oxygen_residual,
    }[group]

    def r_fn(lam):
        return residual(lam, x_norm, scaler_x).f.ravel()

    return r_fn


@jax.jit
def _r_and_jac_lam_v(params, x_norm, scaler_x: AffineScaler, scaler_y):
    fn = _residual_fn("lam_v", params, x_norm, scaler_x, scaler_y)
    return fn(params["lam_v"]), jax.jacfwd(fn)(params["lam_v"])


@partial(jax.jit, static_argnames=("group",))
def _r_and_jac_residual(params, x_norm, scaler_x: AffineScaler, group: str):
    fn = _residual_fn(group, params, x_norm, scaler_x, None)
    return fn(params[group]), jax.jacfwd(fn)(params[group])


def lambda_identifiability(
    params,
    x_norm: jnp.ndarray,
    scaler_x: AffineScaler,
    scaler_y: AffineScaler,
    groups: Sequence[str] = ("lam_v", "lam_t", "lam_h", "lam_o"),
    z: float = 1.959964,
    bound_rtol: float = 1e-4,
    mesh=None,
) -> Dict[str, GroupIdentifiability]:
    """Identifiability report for every λ group at the trained optimum.

    ``x_norm`` are normalized input rows (the same domain the stages
    trained on); pass the training or exported-artifact rows.  One jitted
    residual+Jacobian evaluation per group; interval math on the host.

    With ``mesh`` the residual rows shard over its 'data' axis (edge-row
    padding, trimmed on host BEFORE the interval math so pad rows never
    bias σ²/dof): each residual row depends only on its own input row,
    so the Jacobian programs run collective-free on every shard.
    """
    n = int(x_norm.shape[0])
    if mesh is not None:
        from pinnfc_tpu.parallel.mesh import (
            batch_sharding, pad_to_multiple, replicate)

        x_pad, _ = pad_to_multiple(
            np.asarray(x_norm, np.float32), mesh.shape["data"]
        )
        x_norm = jax.device_put(x_pad, batch_sharding(mesh))
        params = replicate(mesh, params)
    out: Dict[str, GroupIdentifiability] = {}
    for group in groups:
        if group == "lam_v":
            r, jac = _r_and_jac_lam_v(params, x_norm, scaler_x, scaler_y)
        else:
            r, jac = _r_and_jac_residual(params, x_norm, scaler_x, group)
        r, jac = jax.device_get((r, jac))
        r, jac = np.asarray(r)[:n], np.asarray(jac)[:n]
        (stderr, sens, identifiable, dof, sigma2, n_used,
         corr) = gauss_newton_ci(r, jac, z)
        lam = np.asarray(params[group], np.float64).ravel()
        lo, hi = LAMBDA_BOUNDS[group]
        span = np.maximum(np.abs(np.asarray(hi) - np.asarray(lo)), 1e-30)
        at_bound = (
            (np.abs(lam - np.asarray(lo)) <= bound_rtol * span)
            | (np.abs(lam - np.asarray(hi)) <= bound_rtol * span)
        )
        out[group] = GroupIdentifiability(
            group=group,
            names=LAMBDA_NAMES[group],
            values=lam,
            stderr=stderr,
            ci_lo=lam - z * stderr,
            ci_hi=lam + z * stderr,
            sensitivity=sens,
            identifiable=identifiable,
            at_bound=np.asarray(at_bound, bool),
            n_residuals=n_used,
            n_dropped=int(np.asarray(r).shape[0]) - n_used,
            dof=dof,
            sigma2=sigma2,
            corr=corr,
        )
    return out
