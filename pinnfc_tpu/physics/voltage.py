"""Electrochemical voltage residual (reference net_f_V, 01:724-765).

Polarization model: Nernst potential + activation + ohmic + concentration
losses, with the λ_V parameters (r = λ1, i0 = λ2, i_l = λ3; λ4 unused by the
formula, preserved from the reference).

TPU-first notes vs the reference:
- the reference detaches the DNN output and round-trips it through CPU numpy
  inverse scaling every step (01:733-737); here the inverse scaling is an
  on-device affine and the detach becomes ``jax.lax.stop_gradient`` — the
  physics loss reaches only the λ's, matching the reference's gradient flow;
- everything is a pure function of (λ_V, x_norm, u_norm, scalers), so it jits,
  vmaps over ensembles, and shards over meshes for free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.physics import constants as C


class VoltageOutputs(NamedTuple):
    """Return bundle of net_f_V (01:765)."""

    f: jnp.ndarray  # residual V_est - V_out (per cell)
    v_act: jnp.ndarray
    v_ohmic: jnp.ndarray
    v_conc: jnp.ndarray
    e_nernst: jnp.ndarray
    v_out_est_stack: jnp.ndarray  # physics stack voltage estimate (×5)
    i: jnp.ndarray  # current density [A/cm²]
    il: jnp.ndarray
    v_out_stack: jnp.ndarray  # measured/DNN stack voltage (×5)


def voltage_residual(
    lam_v: jnp.ndarray,
    x_norm: jnp.ndarray,
    u_norm: jnp.ndarray,
    scaler_x: AffineScaler,
    scaler_y: AffineScaler,
    stop_grad_u: bool = True,
) -> VoltageOutputs:
    """Compute the voltage physics residual.

    Args:
      lam_v: (4,) voltage parameters [r, i0, i_l, reserved].
      x_norm: (N, 8) normalized inputs.
      u_norm: (N, 1) normalized DNN voltage prediction.
      stop_grad_u: detach the DNN output (reference 01:734) so the physics
        loss trains only λ's.
    """
    real = scaler_x.inverse(x_norm)
    if stop_grad_u:
        u_norm = jax.lax.stop_gradient(u_norm)
    v_out = scaler_y.inverse(u_norm) / C.N_CELLS  # per-cell voltage

    i = real[:, 0:1] / C.A_CELL + 1e-5
    t_out = real[:, 5:6]
    # Gauge pressures divided by 101 (kPa→atm-ish; reference 01:746-747 —
    # note net_f_H divides by 101325 instead; both preserved verbatim).
    p_h2 = real[:, 3:4] / 101.0 + 1.0
    p_air = real[:, 4:5] / 101.0 + 1.0

    r = lam_v[0]
    i0 = lam_v[1]
    il = lam_v[2]

    tk = t_out + C.KELVIN
    p_h2o = C.saturation_pressure()
    pp_h2 = 0.5 * (p_h2 / jnp.exp(1.653 * i / tk**1.334) - p_h2o)
    pp_o2 = p_air / jnp.exp(4.192 * i / tk**1.334) - p_h2o
    b = C.R_GAS * tk / (2.0 * C.ALPHA * C.F_CONST)

    v_act = -b * jnp.log(i / i0)
    v_ohmic = -(i * r)
    v_conc = C.ALPHA * b * jnp.log(1.0 - (i / il))
    e_nernst = -C.GF_LIQ / (2.0 * C.F_CONST) - (
        (C.R_GAS * tk) * jnp.log(p_h2o / (pp_h2 * pp_o2**0.5))
    ) / (2.0 * C.F_CONST)

    v_out_est = e_nernst + v_act + v_ohmic + v_conc
    f = v_out_est - v_out
    return VoltageOutputs(
        f=f,
        v_act=v_act,
        v_ohmic=v_ohmic,
        v_conc=v_conc,
        e_nernst=e_nernst,
        v_out_est_stack=v_out_est * C.N_CELLS,
        i=i,
        il=il * jnp.ones_like(i[:1]),
        v_out_stack=v_out * C.N_CELLS,
    )
