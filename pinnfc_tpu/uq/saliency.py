"""Input-channel saliency of the trained PINN — which operating variable
drives the prediction.

The reference is titled *explainable* fault diagnosis, and explains at two
levels: feature-group AUC / coefficient inspection downstream
(02:469-611) and the physics-layer decomposition of the risk function
(04:244-259, our risk.ConditionAdvance.layer_shares).  What it never
answers is the first question an operator asks about the *model itself*:
per sample, which of the 8 measured inputs (current, coolant flow, inlet
temperatures, gas pressures/flows — data/contract.py INPUT_CHANNELS,
01:2162-2169) is the voltage prediction — and its aleatoric
uncertainty — most sensitive to?

Here that is one jitted reverse-mode program: because every sample's
output depends only on its own input row, ``∂(Σ_n v̂_n)/∂X`` IS the
per-sample Jacobian stack (N, 8) — one backward pass for the whole batch,
no per-sample loop, no vmapped jacrev blow-up.  Both heads (mean voltage
and aleatoric σ) are differentiated in the same program so XLA shares the
trunk forward pass.

Units: the model works in the MinMax-normalized domain (01:271-274), so
raw ``∂v_norm/∂x_norm`` is dimensionless.  The report carries three
calibrations:

* ``jac_norm``  — ∂v_norm/∂x_norm, the model's own view;
* ``jac_phys``  — ∂v_phys/∂x_phys via the exact affine chain rule
  (volts per ampere / per slpm / per °C ...), for physics sanity checks;
* ``jac_range`` — ∂v_phys/∂x_phys × the channel's TRAINING range:
  "volts of predicted swing per full-range swing of this channel" —
  the cross-channel comparable, operator-facing number.

``cli explain`` drives this from a checkpoint + exported artifact and
aggregates per fault class (mean |jac_range| over each label's rows).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pinnfc_tpu.data.contract import INPUT_CHANNELS
from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.mlp import mlp_forward


class SaliencyReport(NamedTuple):
    """Per-sample input-saliency stacks (all (N, 8) float32 numpy)."""

    channel_names: Tuple[str, ...]
    jac_norm: np.ndarray  # ∂v̂_norm/∂x_norm — dimensionless
    jac_phys: np.ndarray  # ∂v̂_phys/∂x_phys — volts per channel unit
    jac_range: np.ndarray  # volts per full training-range swing
    sigma_jac_range: np.ndarray  # same calibration for aleatoric σ
    labels: Optional[np.ndarray] = None  # (N,) int, when known


@partial(jax.jit, static_argnames=("precision",))
def _saliency_jit(params, x_norm, precision: str = "highest"):
    """(N, 8) normalized-domain Jacobians of both heads in ONE program.

    ``grad`` of the batch SUM gives exact per-sample rows because sample n's
    output depends only on x[n] (the trunk is row-wise); the two heads share
    one trunk forward under the same jit so XLA CSEs it.
    """

    def heads(x):
        mean, log_var = mlp_forward(
            params, x, train=False, logvar=True, precision=precision
        )
        # normalized-domain aleatoric std, exporter convention
        # (uq/mc_dropout: σ_a = exp(0.5·logvar))
        return jnp.sum(mean), jnp.sum(jnp.exp(0.5 * log_var))

    jac_v, jac_s = jax.jacrev(heads)(x_norm)
    return jac_v, jac_s


def input_saliency(
    params,
    x_phys: np.ndarray,
    scaler_x: AffineScaler,
    scaler_y: AffineScaler,
    labels: Optional[np.ndarray] = None,
    precision: str = "highest",
    mesh=None,
) -> SaliencyReport:
    """Saliency report over physical-domain rows ``x_phys`` (N, 8).

    Chain rule through the frozen affine scalers (data/scaling.py):
    ``x_norm = x·s_x + m_x`` and ``v_phys = (v_norm − m_y)/s_y`` give
    ``∂v_phys/∂x_phys = (s_x/s_y)·∂v_norm/∂x_norm`` exactly; the range
    calibration multiplies by the training span ``data_max − data_min``
    (zero-span channels were constant in training — their span is reported
    as 0, i.e. "no in-distribution swing exists").

    With ``mesh`` the rows are sharded over its 'data' axis (edge-row
    padding to a multiple of the axis size, trimmed after): each Jacobian
    row depends only on its own input row, so the sharded program needs
    no collectives at all — the same argument that makes the batch-sum
    gradient exact makes it embarrassingly parallel.
    """
    x_phys = np.asarray(x_phys, np.float32)
    if x_phys.ndim != 2 or x_phys.shape[1] != len(INPUT_CHANNELS):
        raise ValueError(
            f"x_phys must be (N, {len(INPUT_CHANNELS)}); got {x_phys.shape}"
        )
    mlp = params["mlp"] if isinstance(params, dict) and "mlp" in params else params
    n = x_phys.shape[0]
    # transform stays in numpy for numpy input — no eager device dispatch
    x_norm_np = scaler_x.transform(x_phys)
    if mesh is not None:
        from pinnfc_tpu.parallel.mesh import (
            batch_sharding, pad_to_multiple, replicate)

        x_pad, _ = pad_to_multiple(
            np.asarray(x_norm_np, np.float32), mesh.shape["data"]
        )
        x_norm = jax.device_put(x_pad, batch_sharding(mesh))
        mlp = replicate(mesh, mlp)
    else:
        x_norm = jnp.asarray(x_norm_np)
    jac_v, jac_s = _saliency_jit(mlp, x_norm, precision=precision)
    # ONE batched fetch (remote-attached TPUs pay ~23 ms per read); any
    # pad rows are trimmed on host — a device-side slice would be an
    # eager op
    jac_v, jac_s = (np.asarray(a, np.float32)[:n]
                    for a in jax.device_get((jac_v, jac_s)))

    s_x = np.asarray(scaler_x.scale, np.float64)
    s_y = float(np.asarray(scaler_y.scale, np.float64).ravel()[0])
    # subtract on host — scalers may hold device arrays; a bare device
    # subtract would be an eager op (~10-17 s remote compile on axon)
    span = (np.asarray(scaler_x.data_max, np.float64)
            - np.asarray(scaler_x.data_min, np.float64))

    jac_phys = jac_v * (s_x / s_y)[None, :]
    jac_range = jac_phys * span[None, :]
    sigma_jac_range = jac_s * (s_x / s_y)[None, :] * span[None, :]
    return SaliencyReport(
        channel_names=INPUT_CHANNELS,
        jac_norm=jac_v,
        jac_phys=np.asarray(jac_phys, np.float32),
        jac_range=np.asarray(jac_range, np.float32),
        sigma_jac_range=np.asarray(sigma_jac_range, np.float32),
        labels=None if labels is None else np.asarray(labels, int),
    )


def class_mean_saliency(
    report: SaliencyReport, field: str = "jac_range"
) -> Dict[int, np.ndarray]:
    """Mean |saliency| per label class → {label: (8,)} — the per-fault
    "which input drives the prediction here" table.  Requires labels."""
    if report.labels is None:
        raise ValueError("report carries no labels — pass labels to input_saliency")
    jac = np.abs(getattr(report, field))
    return {
        int(lbl): jac[report.labels == lbl].mean(axis=0)
        for lbl in np.unique(report.labels)
    }


def coarse_class_saliency(
    report: SaliencyReport, field: str = "jac_range"
) -> Dict[str, np.ndarray]:
    """Mean |saliency| per coarse class → {name: (8,)}: 'normal' (label 0)
    plus the four fault families of FAULT_RANGE_MAP (04:75-80, detail
    labels 1-12 → 4 classes).  Classes absent from the rows are omitted."""
    from pinnfc_tpu.config import FAULT_NAMES_EN, FAULT_RANGE_MAP

    if report.labels is None:
        raise ValueError("report carries no labels — pass labels to input_saliency")
    jac = np.abs(getattr(report, field))
    out: Dict[str, np.ndarray] = {}
    mask = report.labels == 0
    if mask.any():
        out["normal"] = jac[mask].mean(axis=0)
    for zh, rng in FAULT_RANGE_MAP.items():
        mask = np.isin(report.labels, list(rng))
        if mask.any():
            out[FAULT_NAMES_EN.get(zh, zh)] = jac[mask].mean(axis=0)
    return out
