"""PINN parameter pytree: MLP weights + 17 learnable physics parameters.

The reference registers four λ groups on the torch module (01:453-528):

- voltage   λ1..λ4 (ohmic r, exchange i0, limiting i_l, reserved)
  — note upstream registers λ4 under the *name* 'lambda_3' (01:468), a
  shadowing bug documented here; functionally λ4 is never used by net_f_V, so
  it stays at its init and only feels the clamp (preserved behavior);
- thermal   λT1..λT5 (linear temperature model coefficients, init 10.0);
- hydrogen  λH1..λH4 (target-excess-ratio piecewise model);
- oxygen    λO1..λO4 (same shape with |λO3| as the saturation threshold).

Here each group is a flat jnp vector in one params dict — the natural JAX
shape for masked optax stages and for clamp projections.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pinnfc_tpu.models.mlp import init_mlp

PinnParams = Dict[str, Any]

# Initial values (01:453-456, 01:477-481, 01:497-500, 01:514-517).
LAMBDA_INIT = {
    "lam_v": np.array(
        [0.167897923477715, 2.36682075851268e-06, 2.43414469188443, 1.0],
        dtype=np.float32,
    ),
    "lam_t": np.array([10.0, 10.0, 10.0, 10.0, 10.0], dtype=np.float32),
    "lam_h": np.array([5.0, -1.559, 197.715, 1.20], dtype=np.float32),
    "lam_o": np.array([2.0, 0.5, 200.0, 1.0], dtype=np.float32),
}

# Hard clamp bounds applied after every optimizer step
# (01:992-997, 01:1089-1095, 01:1336-1341, 01:1183-1188).
LAMBDA_BOUNDS = {
    "lam_v": (
        np.array([0.167 * 0.5, 2.36e-6 * 0.1, 2.0, 0.1], dtype=np.float32),
        np.array([0.167 * 5.0, 2.36e-6 * 2.1, 2.0 * 5.2, 10.0], dtype=np.float32),
    ),
    "lam_t": (
        np.full(5, -10000.0, dtype=np.float32),
        np.full(5, 10000.0, dtype=np.float32),
    ),
    "lam_h": (
        np.array([0.5, -20.0, 50.0, 0.0], dtype=np.float32),
        np.array([50.0, 20.0, 1000.0, 20.0], dtype=np.float32),
    ),
    "lam_o": (
        np.array([1.5, -20.0, 50.0, 0.0], dtype=np.float32),
        np.array([8.0, 20.0, 1000.0, 20.0], dtype=np.float32),
    ),
}

LAMBDA_GROUPS = ("lam_v", "lam_t", "lam_h", "lam_o")

# Physical meaning of each identified λ — the "explainable" parameters the
# schedule trains (formulas: physics/voltage.py, thermal.py, hydrogen.py,
# oxygen.py; reference registrations 01:441-533).  'reserved' entries are
# registered upstream but enter no formula (λ4's 'lambda_3' name shadowing
# is the documented quirk; λH4/λO4 are likewise unused).
LAMBDA_NAMES = {
    "lam_v": (
        "r — area-specific ohmic resistance [Ω·cm²]",
        "i0 — exchange current density [A/cm²]",
        "i_l — limiting current density [A/cm²]",
        "reserved (no gradient: upstream 'lambda_3' name shadowing, 01:468)",
    ),
    "lam_t": (
        "kT1 — current coeff (simple T) / coolant-heat scale (Euler)",
        "kT2 — thermal mass (Euler denominator; no grad in simple stage)",
        "kT3 — coolant-flow coeff (simple T) / radiation scale (Euler)",
        "kT4 — electrochemical-heat scale (Euler; no grad in simple stage)",
        "kT5 — simple-model temperature offset [°C]",
    ),
    "lam_h": (
        "H2 target excess ratio at low current",
        "H2 ratio slope per normalized current",
        "H2 piecewise-knee current threshold [A]",
        "reserved (enters no formula)",
    ),
    "lam_o": (
        "O2 target excess ratio at low current",
        "O2 ratio slope per normalized current",
        "O2 piecewise-knee current threshold [A]",
        "reserved (enters no formula)",
    ),
}


def init_pinn(key, layers: Sequence[int] = (8, 256, 256, 256, 1)) -> PinnParams:
    """Fresh PINN parameter pytree."""
    params: PinnParams = {"mlp": init_mlp(key, layers)}
    for name, val in LAMBDA_INIT.items():
        params[name] = jnp.asarray(val)
    return params


def clamp_lambdas(params: PinnParams, groups: Sequence[str] = LAMBDA_GROUPS) -> PinnParams:
    """Project λ groups onto their box bounds (post-step clamp, 01:1040-1047
    et al.).  Only the listed groups are touched."""
    out = dict(params)
    for g in groups:
        lo, hi = LAMBDA_BOUNDS[g]
        out[g] = jnp.clip(params[g], jnp.asarray(lo), jnp.asarray(hi))
    return out
