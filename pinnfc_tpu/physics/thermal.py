"""Thermal residuals (reference net_f_T_simple 01:869-914, net_f_T 01:767-867).

Two variants, as in the reference:

- ``thermal_residual_simple`` — the linear model actually used by the
  thermal training stage and the exporter (01:1109, 01:1953):
  ``T_pred = λT1·I + λT3·m_cool + 0.5·T_in + λT5``; λT2/λT4 receive no
  gradient and stay at their init (documented quirk).
- ``thermal_residual_euler`` — the time-series lumped energy balance used
  only for plot statistics (01:1670): one Euler step from each *measured*
  temperature, which vectorizes with a shift (no sequential scan needed —
  the recurrence never feeds predictions back).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.physics import constants as C


class ThermalOutputs(NamedTuple):
    f: jnp.ndarray  # T_real - T_pred
    t_pred: jnp.ndarray
    t_real: jnp.ndarray


def thermal_residual_simple(
    lam_t: jnp.ndarray,
    x_norm: jnp.ndarray,
    scaler_x: AffineScaler,
) -> ThermalOutputs:
    """Linear temperature model (01:905).  The reference also runs the DNN
    here (01:874-877) but the chosen formula never uses its output, so the
    DNN call is elided — numerics identical, one matmul saved per step."""
    real = scaler_x.inverse(x_norm)
    i = real[:, 0:1] / C.A_CELL + 1e-6
    m_coolant = real[:, 1:2] + 1e-6
    t_in = real[:, 2:3]
    t_out_real = real[:, 5:6]

    i_total = i * C.A_CELL
    t_pred = lam_t[0] * i_total + lam_t[2] * m_coolant + 0.5 * t_in + lam_t[4]
    return ThermalOutputs(f=t_out_real - t_pred, t_pred=t_pred, t_real=t_out_real)


def thermal_residual_euler(
    lam_t: jnp.ndarray,
    x_norm: jnp.ndarray,
    u_norm: jnp.ndarray,
    scaler_x: AffineScaler,
    scaler_y: AffineScaler,
) -> ThermalOutputs:
    """Euler-step lumped energy balance (01:806-865).

    ``T_pred[t+1] = T[t] + dt · (Q_electrochem − Q_coolant − Q_radiation) / λT2``
    with electrochemical heat from the (detached) DNN voltage (01:827-838).
    The first prediction is seeded with the first measured temperature
    (01:857).
    """
    n = x_norm.shape[0]
    real = scaler_x.inverse(x_norm)
    u_norm = jax.lax.stop_gradient(u_norm)
    v_single = scaler_y.inverse(u_norm) / C.N_CELLS

    i = real[:, 0:1] / C.A_CELL + 1e-5
    m_coolant = real[:, 1:2] + 1e-6
    t_in = real[:, 2:3]
    t_out = real[:, 5:6]

    # previous-step slices [0 .. N-2]
    i_prev = i[:-1]
    m_prev = m_coolant[:-1]
    t_in_prev = t_in[:-1]
    t_out_prev = t_out[:-1]
    v_prev = v_single[:-1]

    i_total = i_prev * C.A_CELL
    tk_prev = t_out_prev + C.KELVIN
    v_rev = 1.229 - 0.0009 * (tk_prev - 298.15)

    q_electro = (i_total * v_rev - i_total * v_prev) * lam_t[3]
    q_coolant = m_prev * C.CP_COOLANT * (t_out_prev - t_in_prev) * lam_t[0]
    q_rad = C.H_AIR * C.A_SURFACE * (t_out_prev - C.T_AMBIENT) * lam_t[2]
    dt_dt = (q_electro - q_coolant - q_rad) / lam_t[1]
    t_next = t_out_prev + dt_dt * C.DT_EULER

    t_pred = jnp.concatenate([t_out[0:1], t_next], axis=0)
    return ThermalOutputs(f=t_out - t_pred, t_pred=t_pred, t_real=t_out)
