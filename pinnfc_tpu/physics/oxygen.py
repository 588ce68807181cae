"""Oxygen stoichiometry residual (reference net_f_O, 01:535-619).

Same shape as the hydrogen model with three differences preserved exactly:
O₂ = 21 % of air flow (01:598), 4 electrons per O₂ (01:564), the target
excess ratio clamped to [1.05, 15] (01:593), the saturation threshold taken
as |λO3| (01:578), and a starvation penalty ``10·max(0, 1 − actual)``
(01:609-610).  The reference's try/except-zeros guard (01:614-619) is not
needed: this is a total function of finite inputs."""

from __future__ import annotations

import jax.numpy as jnp

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.physics import constants as C
from pinnfc_tpu.physics.hydrogen import StoichOutputs


def oxygen_residual(
    lam_o: jnp.ndarray,
    x_norm: jnp.ndarray,
    scaler_x: AffineScaler,
) -> StoichOutputs:
    real = scaler_x.inverse(x_norm)
    i = real[:, 0:1] / C.A_CELL + 0.00001
    air_flow = real[:, 7:8] + 1e-6

    i_stack = i * C.A_CELL
    n_o2_rate = (i_stack * C.N_CELLS) / (4.0 * C.F_CONST)
    q_theoretical = n_o2_rate * C.V_MOLAR_STP * 60.0
    q_theoretical = jnp.maximum(q_theoretical, 1e-8)

    threshold = jnp.abs(lam_o[2])
    i_norm = i_stack / C.I_NORM_BASE
    target = jnp.where(
        i_stack <= threshold,
        lam_o[0] + lam_o[1] * i_norm,
        lam_o[0] + lam_o[1] * (threshold / C.I_NORM_BASE),
    )
    target = jnp.clip(target, 1.05, 15.0)

    o2_actual = air_flow * C.O2_FRACTION
    actual = o2_actual / q_theoretical

    f = actual - target
    penalty = jnp.maximum(1.0 - actual, 0.0)
    f = f + penalty * 10.0
    return StoichOutputs(
        f=f,
        actual_ratio=actual,
        target_ratio=target,
        aux=q_theoretical,
        threshold=threshold * jnp.ones((1, 1)),
    )
