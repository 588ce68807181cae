"""Fused evaluation of all four physics residuals.

The exporter (01:1943-1964) evaluates net_f_V, net_f_T_simple, net_f_H and
net_f_O back-to-back, each with its own CPU round trip.  Here one jitted
function produces the whole bundle on-device; ``pinnfc_tpu.ops`` provides a
Pallas TPU kernel with the same contract for the hot path."""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.physics.hydrogen import hydrogen_residual
from pinnfc_tpu.physics.oxygen import oxygen_residual
from pinnfc_tpu.physics.thermal import thermal_residual_simple
from pinnfc_tpu.physics.voltage import voltage_residual


class ResidualBundle(NamedTuple):
    """Everything the 22-column exporter needs (01:1943-2007)."""

    f_v: jnp.ndarray  # col 13
    f_t: jnp.ndarray  # col 14
    f_h: jnp.ndarray  # col 15
    f_o: jnp.ndarray  # col 16
    v_phys_stack: jnp.ndarray  # col 18
    t_phys: jnp.ndarray  # col 19
    ratio_h: jnp.ndarray  # col 20
    ratio_o: jnp.ndarray  # col 21


def all_residuals(
    params,
    x_norm: jnp.ndarray,
    u_norm: jnp.ndarray,
    scaler_x: AffineScaler,
    scaler_y: AffineScaler,
) -> ResidualBundle:
    """Evaluate fV/fT/fH/fO and the physics-model outputs in one pass.

    ``params`` is the PINN pytree ({'lam_v','lam_t','lam_h','lam_o',...});
    ``u_norm`` the normalized DNN prediction for ``x_norm``."""
    v = voltage_residual(params["lam_v"], x_norm, u_norm, scaler_x, scaler_y)
    t = thermal_residual_simple(params["lam_t"], x_norm, scaler_x)
    h = hydrogen_residual(params["lam_h"], x_norm, scaler_x)
    o = oxygen_residual(params["lam_o"], x_norm, scaler_x)
    return ResidualBundle(
        f_v=v.f,
        f_t=t.f,
        f_h=h.f,
        f_o=o.f,
        v_phys_stack=v.v_out_est_stack,
        t_phys=t.t_pred,
        ratio_h=h.actual_ratio,
        ratio_o=o.actual_ratio,
    )
