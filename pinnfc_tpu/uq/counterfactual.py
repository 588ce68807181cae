"""Counterfactual recovery — the minimal actuation change that clears a
voltage alarm, according to the trained PINN.

The explainability surface so far answers *which residual fired*
(risk.ConditionAdvance.layer_shares, 04:244-259 decomposition), *which
sensor the prediction leans on* (uq/saliency.py), and *when the alarm
comes* (04:389 dynamic threshold V(0) − 0.1).  The question an operator
asks next is prescriptive: **what would have to change at the inputs for
the model to predict a healthy voltage again?**  This module answers it
with a per-sample box-constrained inverse problem

    min_δ  α·mean(δ²)  +  mean relu(v* − v̂(clip(x₀+δ)))²

solved in the normalized input domain (so "minimal" compares across
channels the same way the model sees them), where

* ``v*`` is the recovery target in volts.  Two target modes:

  - **gain mode** (the default for risk conditions): the PINN detects a
    fault as the RESIDUAL between measured and input-predicted voltage
    (02:497-545 uses exactly that residual as the fault feature), so at
    alarmed rows the model's absolute prediction typically still sits
    above the alarm line — asking it to "predict above the line" is
    vacuous.  The actionable question is which actuation gains back the
    MEASURED shortfall, with the model as a local sensitivity
    surrogate: the solve targets ``v̂(x₀+δ) − v̂(x₀) ≥
    relu(v_thr + margin − v_meas)``, i.e. the expected measured voltage
    after actuation ``v_meas + Δv̂`` clears the 04:389 alarm line.
  - **absolute mode**: target the model's own prediction,
    ``v̂(x₀+δ) ≥ v* + margin`` — the right question when the model is
    trusted as the voltage oracle (e.g. healthy-regime setpoint search);

  by default the alarm line is the same dynamic threshold script 04
  uses (V(0) − voltage_drop, 04:389) plus a margin, so "recovered"
  literally means "above the alarm line";
* the box is the MinMax training range (01:271-274), widened per row so
  δ = 0 stays feasible for inputs already outside it: counterfactual
  *actuation* never extrapolates beyond the distribution the model was
  fit on, and channels that were constant in training are frozen;
* an **actuatable mask** freezes channels the operator cannot command —
  by default the stack current (a load demand, not a recovery knob) and
  the coolant *outlet* temperature (an outcome of the stack, not an
  actuator); the remaining six (coolant flow, coolant inlet temperature,
  gas inlet pressures and flows — data/contract.py INPUT_CHANNELS) are
  the real control handles of a PEM test bench.

TPU shape: one jitted program for the WHOLE batch — δ for all rows is a
single (N, 8) tensor, Adam runs as a ``lax.scan`` over a static step
count, and row independence makes the batch gradient exactly the stack
of per-row gradients (same argument as uq/saliency.py).  No per-sample
Python loop, one device dispatch, one batched fetch.

Masked channels cannot drift: δ enters the forward only as ``δ·mask``,
so their gradient — and hence every Adam update — is identically zero.
Rows that already satisfy ``v̂ ≥ v*`` keep δ = 0 exactly (zero hinge
gradient at the zero init, and the α-penalty's gradient vanishes at 0).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pinnfc_tpu.data.contract import INPUT_CHANNELS
from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.mlp import mlp_forward

# Channels an operator can actually command on the test bench; stack
# current is the externally imposed load and coolant_t_out is a measured
# consequence of the thermal state (01:2162-2169 channel semantics).
DEFAULT_ACTUATABLE: Tuple[str, ...] = (
    "coolant_flow",
    "coolant_t_in",
    "p_h2_in",
    "p_air_in",
    "h2_flow",
    "air_flow",
)


@dataclasses.dataclass(frozen=True)
class CounterfactualConfig:
    """Optimizer knobs for the recovery inverse problem."""

    steps: int = 400  # Adam iterations (static → one compile)
    lr: float = 0.05  # in normalized-input units
    alpha: float = 0.05  # pull toward the smallest actuation (L2 on δ)
    margin: float = 0.01  # volts above the target before "recovered"
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8


class CounterfactualReport(NamedTuple):
    """Batched recovery result (numpy, one device fetch)."""

    channel_names: Tuple[str, ...]
    actuatable: np.ndarray  # (8,) bool — which channels were free
    x_phys: np.ndarray  # (N, 8) original inputs
    x_cf_phys: np.ndarray  # (N, 8) counterfactual inputs
    delta_phys: np.ndarray  # (N, 8) x_cf − x, physical units
    delta_range: np.ndarray  # (N, 8) delta as a fraction of training range
    v_before: np.ndarray  # (N,) model voltage at x
    v_after: np.ndarray  # (N,) model voltage at x_cf
    v_target: np.ndarray  # (N,) recovery target (volts, absolute)
    recovered: np.ndarray  # (N,) bool — the mode's recovery criterion
    v_meas: Optional[np.ndarray] = None  # (N,) measured volts (gain mode)
    v_expected: Optional[np.ndarray] = None  # (N,) v_meas + (v_after − v_before)


def actuatable_mask(channels: Sequence[str]) -> np.ndarray:
    """(8,) float32 mask from channel names; unknown names raise."""
    unknown = set(channels) - set(INPUT_CHANNELS)
    if unknown:
        raise ValueError(
            f"unknown channels {sorted(unknown)}; valid: {INPUT_CHANNELS}"
        )
    return np.asarray(
        [1.0 if c in set(channels) else 0.0 for c in INPUT_CHANNELS],
        np.float32,
    )


@partial(jax.jit, static_argnames=("steps", "gain_mode", "precision"))
def _recover_jit(
    params,
    x0_norm,  # (N, 8)
    v_target,  # (N,) volts (absolute) or required gain ≥ 0 (gain mode)
    y_scale,  # () scaler_y affine: v_volts = (v_norm − y_min)/y_scale
    y_min,  # ()
    mask,  # (8,)
    box_lo,  # (8,) normalized box
    box_hi,  # (8,)
    lr,
    alpha,
    b1,
    b2,
    eps,
    steps: int,
    gain_mode: bool = False,
    precision: str = "highest",
):
    """Adam on δ (N, 8) under one ``lax.scan``; returns
    ``(x_cf_norm, v_after, v_before)`` with voltages in volts.

    In gain mode ``v_target`` carries the required GAIN per row and the
    hinge targets ``v̂(x₀) + gain``; otherwise it is the absolute target.

    The objective is a batch MEAN so lr is batch-size invariant; rows stay
    independent because the model is row-wise (the mean only rescales every
    per-row gradient by the same 1/N, absorbed into lr·N below).

    The hinge lives in PHYSICAL volts while the α-penalty lives in
    normalized-δ units: the normalized voltage scale is tiny (~2/range per
    volt), and a normalized-domain hinge would equilibrate against the
    penalty with every row parked visibly below the target."""
    n = x0_norm.shape[0]

    # widen the training-range box per row so δ = 0 is always feasible:
    # an input already outside the training range stays exactly where it
    # is until the optimizer chooses to move it back toward the box
    lo_eff = jnp.minimum(box_lo, x0_norm)
    hi_eff = jnp.maximum(box_hi, x0_norm)

    def v_hat(delta):
        x = jnp.clip(x0_norm + delta * mask, lo_eff, hi_eff)
        mean, _ = mlp_forward(
            params, x, train=False, logvar=False, precision=precision
        )
        return (mean[:, 0] - y_min) / y_scale  # volts

    zeros = jnp.zeros_like(x0_norm)
    v0 = v_hat(zeros)
    tgt = v0 + v_target if gain_mode else jnp.broadcast_to(v_target, v0.shape)

    def loss(delta):
        short = jax.nn.relu(tgt - v_hat(delta))
        return jnp.mean(short**2) + alpha * jnp.mean((delta * mask) ** 2)

    grad = jax.grad(loss)

    def step(carry, _):
        delta, m, v, t = carry
        g = grad(delta) * n  # undo the batch-mean 1/N → per-row scale
        t = t + 1
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g**2
        mh = m / (1 - b1**t)
        vh = v / (1 - b2**t)
        delta = delta - lr * mh / (jnp.sqrt(vh) + eps)
        return (delta, m, v, t), None

    (delta, _, _, _), _ = jax.lax.scan(
        step, (zeros, zeros, zeros, jnp.zeros((), jnp.int32)), None, length=steps
    )
    x_cf = jnp.clip(x0_norm + delta * mask, lo_eff, hi_eff)
    return x_cf, v_hat(delta), v0


def counterfactual_recovery(
    params,
    x_phys: np.ndarray,
    v_target: np.ndarray,
    scaler_x: AffineScaler,
    scaler_y: AffineScaler,
    actuatable: Optional[Sequence[str]] = None,
    config: CounterfactualConfig = CounterfactualConfig(),
    v_meas: Optional[np.ndarray] = None,
    precision: str = "highest",
    mesh=None,
) -> CounterfactualReport:
    """Solve the recovery problem for every row of ``x_phys`` (N, 8).

    ``v_target`` is in physical volts — scalar or (N,).  With ``v_meas``
    (the measured voltage per row) the solve runs in GAIN mode: the
    required model-voltage gain is ``relu(v_target + margin − v_meas)``
    and ``recovered`` means the expected measured voltage
    ``v_meas + (v̂_after − v̂_before)`` clears ``v_target``.  Without it
    the target is absolute: ``v̂_after ≥ v_target + margin``, recovered
    when ``v̂_after ≥ v_target``.  Either way the ``margin`` makes
    ``recovered`` robust to sitting exactly on the line, and the
    reported ``v_target`` stays the caller's.

    With ``mesh`` the rows are sharded over its 'data' axis (edge-row
    padding, trimmed after): the gradient of the batch-mean hinge is
    exactly per-row (no cross-row sums appear in the backward pass), so
    the whole Adam solve runs collective-free on every device's shard.
    """
    x_phys = np.asarray(x_phys, np.float32)
    if x_phys.ndim != 2 or x_phys.shape[1] != len(INPUT_CHANNELS):
        raise ValueError(
            f"x_phys must be (N, {len(INPUT_CHANNELS)}); got {x_phys.shape}"
        )
    n = x_phys.shape[0]
    v_target = np.broadcast_to(
        np.asarray(v_target, np.float32).reshape(-1), (n,)
    ).copy()
    gain_mode = v_meas is not None
    if gain_mode:
        v_meas = np.broadcast_to(
            np.asarray(v_meas, np.float32).reshape(-1), (n,)
        ).copy()

    mlp = params["mlp"] if isinstance(params, dict) and "mlp" in params else params
    # subtract on host — the scalers may hold device arrays, and a bare
    # device subtract is an eager op (~10-17 s remote compile on axon)
    span = (np.asarray(scaler_x.data_max, np.float64)
            - np.asarray(scaler_x.data_min, np.float64))
    # zero-span channels were constant in training — suggesting actuation
    # on them would be pure extrapolation, so they are frozen regardless
    # of the caller's actuatable set
    mask = actuatable_mask(
        DEFAULT_ACTUATABLE if actuatable is None else actuatable
    ) * (span > 0)
    mask = mask.astype(np.float32)

    # normalized-domain constants (scalers are affine: data/scaling.py);
    # the box is the transform of the training extrema — feature_range for
    # ordinary channels, a collapsed point for zero-span ones
    x0_norm = scaler_x.transform(x_phys)  # numpy in → numpy out
    box_lo = scaler_x.transform(
        np.asarray(scaler_x.data_min, np.float32)[None, :]
    ).reshape(-1).astype(np.float32)
    box_hi = scaler_x.transform(
        np.asarray(scaler_x.data_max, np.float32)[None, :]
    ).reshape(-1).astype(np.float32)

    y_scale = np.float32(np.asarray(scaler_y.scale).ravel()[0])
    y_min = np.float32(np.asarray(scaler_y.min).ravel()[0])
    if gain_mode:
        # required model-voltage gain; rows at/above the line need none
        solve_target = np.maximum(0.0, v_target + config.margin - v_meas)
    else:
        solve_target = v_target + config.margin
    if mesh is None:
        x0_dev = jnp.asarray(x0_norm, jnp.float32)
        tgt_dev = jnp.asarray(solve_target, jnp.float32)
    else:
        from pinnfc_tpu.parallel.mesh import (
            batch_sharding, pad_to_multiple, replicate)

        x_pad, _ = pad_to_multiple(
            np.asarray(x0_norm, np.float32), mesh.shape["data"]
        )
        t_pad, _ = pad_to_multiple(
            np.asarray(solve_target, np.float32), mesh.shape["data"]
        )
        x0_dev = jax.device_put(x_pad, batch_sharding(mesh))
        tgt_dev = jax.device_put(
            t_pad, jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec("data"))
        )
        mlp = replicate(mesh, mlp)
    x_cf_norm, v_after, v_before = _recover_jit(
        mlp,
        x0_dev,
        tgt_dev,
        jnp.asarray(y_scale),
        jnp.asarray(y_min),
        jnp.asarray(mask),
        jnp.asarray(box_lo),
        jnp.asarray(box_hi),
        jnp.float32(config.lr),
        jnp.float32(config.alpha),
        jnp.float32(config.adam_b1),
        jnp.float32(config.adam_b2),
        jnp.float32(config.adam_eps),
        steps=config.steps,
        gain_mode=gain_mode,
        precision=precision,
    )
    # ONE batched fetch (remote-attached TPUs pay ~23 ms per read); any
    # mesh pad rows are trimmed on host — a device-side slice would be
    # an eager op
    x_cf_norm, v_after, v_before = (
        np.asarray(a, np.float32)[:n]
        for a in jax.device_get((x_cf_norm, v_after, v_before))
    )

    x_cf_phys = np.asarray(scaler_x.inverse(x_cf_norm), np.float32)
    # entries the solver did not move (frozen channels, rows already above
    # target, zero-span channels): return the ORIGINAL values exactly - the
    # round trip through the affine pair is identity only up to f32 rounding
    unchanged = x_cf_norm == np.asarray(x0_norm, np.float32)
    x_cf_phys[unchanged] = x_phys[unchanged]
    delta_phys = x_cf_phys - x_phys
    safe_span = np.where(span == 0, 1.0, span)
    delta_range = (delta_phys / safe_span[None, :]).astype(np.float32)
    if gain_mode:
        v_expected = (v_meas + (v_after - v_before)).astype(np.float32)
        recovered = v_expected >= v_target
    else:
        v_expected = None
        recovered = v_after >= v_target
    return CounterfactualReport(
        channel_names=INPUT_CHANNELS,
        actuatable=mask.astype(bool),
        x_phys=x_phys,
        x_cf_phys=x_cf_phys,
        delta_phys=delta_phys.astype(np.float32),
        delta_range=delta_range,
        v_before=v_before,
        v_after=v_after,
        v_target=v_target,
        recovered=recovered,
        v_meas=v_meas,
        v_expected=v_expected,
    )


class ConditionRecovery(NamedTuple):
    """Recovery analysis for one (current, fault) risk condition."""

    fault_name: str  # English name (config.FAULT_NAMES_EN)
    current_target: float
    v_threshold: float  # the 04:389 dynamic alarm line V(0) − drop
    idx_v_alarm: Optional[int]  # within the condition sub-sequence
    n_rows: int  # alarmed rows actually solved
    report: Optional[CounterfactualReport]  # None when never alarmed


def condition_recovery(
    results,
    params,
    scaler_x: AffineScaler,
    scaler_y: AffineScaler,
    conditions=None,
    risk_config=None,
    config: CounterfactualConfig = CounterfactualConfig(),
    actuatable: Optional[Sequence[str]] = None,
    max_rows: int = 64,
    target: str = "gain",
    precision: str = "highest",
    mesh=None,
):
    """Per-risk-condition counterfactual recovery over an exported artifact.

    Mirrors the 12-condition table of `cli risk` (04:145-161 conditions,
    04:389 dynamic threshold): for each condition the alarmed tail — rows
    at/after the first measured-voltage crossing of V(0) − voltage_drop —
    is solved for the minimal actuation that recovers the alarm line.
    ``target='gain'`` (default) solves for the actuation whose
    model-predicted voltage GAIN covers each row's measured shortfall
    below the line (the module docstring explains why the absolute
    prediction is the wrong target for a residual-based detector);
    ``target='absolute'`` targets the model's own prediction instead.
    Row independence lets all conditions share ONE batched solve (one
    compile, one dispatch); tails longer than ``max_rows`` are subsampled
    evenly."""
    from pinnfc_tpu.config import (
        DEFAULT_RF_CONDITIONS,
        FAULT_NAMES_EN,
        RiskConfig,
    )
    from pinnfc_tpu.data.contract import INDEX, ComprehensiveResults
    from pinnfc_tpu.risk.rf import condition_row_indices, find_first_alarm_index

    arr = (
        results.array
        if isinstance(results, ComprehensiveResults)
        else np.asarray(results)
    )
    if target not in ("gain", "absolute"):
        raise ValueError(f"target must be 'gain' or 'absolute'; got {target!r}")
    if conditions is None:
        conditions = DEFAULT_RF_CONDITIONS
    if risk_config is None:
        risk_config = RiskConfig()

    entries = []
    for current, fault, index_range in conditions:
        idx = condition_row_indices(arr, fault, current, risk_config, index_range)
        if idx is None:
            continue
        v_sub = arr[idx, INDEX["y_true"]].astype(float)
        v_thr = float(v_sub[0]) - risk_config.voltage_drop
        i_alarm = find_first_alarm_index(v_sub, v_thr, mode="below")
        rows = np.empty(0, int)
        if i_alarm is not None:
            rows = idx[i_alarm:]
            if len(rows) > max_rows:
                sel = np.unique(
                    np.linspace(0, len(rows) - 1, max_rows).round().astype(int)
                )
                rows = rows[sel]
        entries.append(
            dict(
                fault=FAULT_NAMES_EN.get(fault, fault),
                current=float(current),
                v_threshold=v_thr,
                idx_v_alarm=i_alarm,
                rows=rows,
            )
        )

    sizes = [len(e["rows"]) for e in entries]
    full = None
    if sum(sizes) > 0:
        all_rows = np.concatenate([e["rows"] for e in entries if len(e["rows"])])
        x = arr[all_rows, : len(INPUT_CHANNELS)].astype(np.float32)
        v_t = np.concatenate(
            [
                np.full(len(e["rows"]), e["v_threshold"], np.float32)
                for e in entries
                if len(e["rows"])
            ]
        )
        v_m = (
            arr[all_rows, INDEX["y_true"]].astype(np.float32)
            if target == "gain"
            else None
        )
        full = counterfactual_recovery(
            params, x, v_t, scaler_x, scaler_y,
            actuatable=actuatable, config=config, v_meas=v_m,
            precision=precision, mesh=mesh,
        )

    out = []
    off = 0
    for e in entries:
        n = len(e["rows"])
        rep = None
        if n and full is not None:
            sl = slice(off, off + n)
            rep = CounterfactualReport(
                channel_names=full.channel_names,
                actuatable=full.actuatable,
                x_phys=full.x_phys[sl],
                x_cf_phys=full.x_cf_phys[sl],
                delta_phys=full.delta_phys[sl],
                delta_range=full.delta_range[sl],
                v_before=full.v_before[sl],
                v_after=full.v_after[sl],
                v_target=full.v_target[sl],
                recovered=full.recovered[sl],
                v_meas=None if full.v_meas is None else full.v_meas[sl],
                v_expected=(
                    None if full.v_expected is None else full.v_expected[sl]
                ),
            )
            off += n
        out.append(
            ConditionRecovery(
                fault_name=e["fault"],
                current_target=e["current"],
                v_threshold=e["v_threshold"],
                idx_v_alarm=e["idx_v_alarm"],
                n_rows=n,
                report=rep,
            )
        )
    return out


def summarize_recovery(
    report: CounterfactualReport,
) -> Dict[str, np.ndarray]:
    """Aggregate a report into the operator-facing row: mean SIGNED delta
    per channel (fraction of training range AND physical units, moved rows
    only — rows that needed no move would dilute the signal), the dominant
    actuator (name + index), and the recovered fraction.  This is the ONE
    definition of "moved"/"mean move" — every printout, JSON field and
    figure reads it from here."""
    moved = ~np.isclose(report.delta_range, 0.0).all(axis=1)
    sel = moved if moved.any() else slice(None)
    rows = report.delta_range[sel]
    rows_phys = report.delta_phys[sel]
    n_ch = len(report.channel_names)
    mean_delta = rows.mean(axis=0) if rows.size else np.zeros(n_ch, np.float32)
    mean_phys = (
        rows_phys.mean(axis=0) if rows_phys.size else np.zeros(n_ch, np.float32)
    )
    k = int(np.argmax(np.abs(mean_delta))) if np.abs(mean_delta).max() > 0 else -1
    return {
        "mean_delta_range": mean_delta,
        "mean_delta_phys": mean_phys,
        "dominant": report.channel_names[k] if k >= 0 else None,
        "dominant_index": k,
        "recovered_frac": float(report.recovered.mean()) if len(
            report.recovered
        ) else float("nan"),
        "n_moved": int(moved.sum()),
    }
