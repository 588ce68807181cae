"""Hydrogen stoichiometry residual (reference net_f_H, 01:621-722).

Faraday-law theoretical H₂ consumption vs measured flow; residual is the
difference between the actual excess ratio and a piecewise-linear target
ratio in stack current, saturated above the learned threshold λH3."""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.physics import constants as C


class StoichOutputs(NamedTuple):
    """Return bundle of net_f_H / net_f_O (01:722, 01:612)."""

    f: jnp.ndarray
    actual_ratio: jnp.ndarray
    target_ratio: jnp.ndarray
    aux: jnp.ndarray  # I_total (H) or theoretical flow (O)
    threshold: jnp.ndarray


def hydrogen_residual(
    lam_h: jnp.ndarray,
    x_norm: jnp.ndarray,
    scaler_x: AffineScaler,
) -> StoichOutputs:
    real = scaler_x.inverse(x_norm)
    i = real[:, 0:1] / C.A_CELL + 0.00001
    h2_flow = real[:, 6:7] + 1e-6

    i_total = i * C.A_CELL

    # Theoretical consumption: n_H2 = I/(2F)·N_cells [mol/s] → slpm (01:660-674).
    n_h2_rate = i_total / (2.0 * C.F_CONST) * C.N_CELLS
    q_theoretical = n_h2_rate * C.V_MOLAR_STP * 60.0
    q_theoretical = jnp.maximum(q_theoretical, 1e-8)

    # Piecewise target excess ratio (01:687-701); NO clamp here — the clamp
    # line is commented out in the reference (01:704).
    threshold = lam_h[2]
    i_norm = i_total / C.I_NORM_BASE
    target = jnp.where(
        i_total <= threshold,
        lam_h[0] + lam_h[1] * i_norm,
        lam_h[0] + lam_h[1] * (threshold / C.I_NORM_BASE),
    )

    actual = h2_flow / q_theoretical
    f = actual - target
    return StoichOutputs(
        f=f,
        actual_ratio=actual,
        target_ratio=target,
        aux=i_total,
        threshold=threshold * jnp.ones((1, 1)),
    )
