"""RF(t) risk function & early-warning index (reference script 04).

Pipeline (04:201-285):  z-score the 5 residual channels against
normal-operation statistics → |z| → truncate below the safe band →
per-layer weighted p-norms → weighted layer sum S_tot → leaky integral
``C[t] = λ·C[t-1] + S_tot[t]`` (with C[0] = 0, loop starts at t=1) →
rescaled logistic map → EMA smoothing.  The two sequential recurrences run
as associative scans (pinnfc_tpu.ops.recurrences); everything else is
vectorized jnp, so a whole (current, fault) condition evaluates in one
device pass.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pinnfc_tpu.config import DEFAULT_RF_CONDITIONS, FAULT_RANGE_MAP, RiskConfig
from pinnfc_tpu.data.contract import INDEX, ComprehensiveResults
from pinnfc_tpu.ops.recurrences import ema, leaky_integral


def estimate_mu_sigma_normal(
    results: np.ndarray,
    res_keys: Sequence[str] = RiskConfig.res_keys,
    normal_labels: Sequence[int] = (0,),
) -> Tuple[np.ndarray, np.ndarray]:
    """μ/σ (ddof=1, zero→1e-6 floor) of the residual channels over
    normal-labelled rows (04:181-197)."""
    results = np.asarray(results)
    labels = results[:, INDEX["label"]].astype(int)
    mask = np.isin(labels, list(normal_labels))
    if not mask.any():
        raise ValueError(f"no rows with normal labels {tuple(normal_labels)}")
    r = np.stack([results[mask, INDEX[k]].astype(float) for k in res_keys], axis=1)
    mu = np.nanmean(r, axis=0)
    sigma = np.nanstd(r, axis=0, ddof=1)
    sigma[sigma == 0] = 1e-6
    return mu, sigma


def compute_rf_time_series(
    residuals,
    mu: np.ndarray,
    sigma: np.ndarray,
    config: RiskConfig = RiskConfig(),
    backend: str = "jax",
) -> Dict:
    """RF over a residual matrix (N, D) with channel order = config.res_keys.

    Returns {'rf_inst', 'rf_smooth', 'c', 's_tot', 's_layers'} (04:281-285).

    ``backend``: 'jax' (f32, associative scans — the on-device path) or
    'numpy' (f64, ``scipy.signal.lfilter`` recurrences — bit-parity with the
    reference's sequential loops for exact warning-time reproduction).
    """
    if backend == "numpy":
        return _compute_rf_numpy(residuals, mu, sigma, config)
    r = np.asarray(residuals, np.float32)
    n = r.shape[0]
    # Bucket-pad the row count to a power of two (min 512) so the whole
    # campaign's 12 condition lengths compile into a handful of programs
    # that live in the PERSISTENT cache.  The previous eager op chain cost
    # ~10-17 s of remote compile per op per distinct length on a
    # relay-attached TPU, and eager compiles never persist — measured
    # 137 s for the 12-condition table even "warm"
    # (benchmarks/run_all_bench.py round 5).  Every step is causal
    # (z-score/p-norms are rowwise; the leaky integral and EMA run
    # forward in time), so zero-padding trailing rows leaves rows [0, n)
    # bit-identical — sliced off after ONE device fetch.
    n_pad = max(512, 1 << (n - 1).bit_length())
    r_pad = np.zeros((n_pad, r.shape[1]), np.float32)
    r_pad[:n] = r
    out = _rf_series_device(
        jnp.asarray(r_pad), jnp.asarray(mu, jnp.float32),
        jnp.asarray(sigma, jnp.float32), config,
    )
    host = jax.device_get(out)
    return {
        "rf_inst": host["rf_inst"][:n],
        "rf_smooth": host["rf_smooth"][:n],
        "c": host["c"][:n],
        "s_tot": host["s_tot"][:n],
        "s_layers": {k: v[:n] for k, v in host["s_layers"].items()},
    }


@partial(jax.jit, static_argnames=("config",))
def _rf_series_device(r, mu, sigma, config: RiskConfig):
    """The whole RF chain (04:234-279) as ONE compiled program.
    ``config`` is a frozen dataclass of tuples/floats → hashable static."""
    n = r.shape[0]
    w_feat = jnp.asarray(config.feature_weights, jnp.float32)
    key_to_idx = {k: i for i, k in enumerate(config.res_keys)}
    layer_w = dict(config.layer_weights)

    # 1-2) |z|-score, safe-band truncation (04:234-238)
    a = jnp.abs((r - mu[None, :]) / sigma[None, :])
    a_trunc = jnp.maximum(0.0, a - config.z_safe)

    # 3-4) per-layer weighted p-norm, weighted layer sum (04:244-259)
    s_layers: Dict[str, jnp.ndarray] = {}
    s_tot = jnp.zeros((n,), jnp.float32)
    for layer_name, keys in config.layer_config:
        idxs = [key_to_idx[k] for k in keys if k in key_to_idx]
        if not idxs:
            s_layers[layer_name] = jnp.zeros((n,), jnp.float32)
            continue
        a_l = a_trunc[:, jnp.asarray(idxs)]
        w_l = w_feat[jnp.asarray(idxs)][None, :]
        s_l = jnp.power(
            jnp.sum(w_l * jnp.power(a_l, config.p_layer), axis=1), 1.0 / config.p_layer
        )
        s_layers[layer_name] = s_l
        s_tot = s_tot + layer_w.get(layer_name, 1.0) * s_l

    # 5) leaky integral with C[0] = 0 (loop starts at t=1, 04:262-264)
    s_shift = s_tot.at[0].set(0.0)
    c = leaky_integral(s_shift, config.lambda_decay)

    # 6) rescaled logistic map (04:267-273)
    c_clip = jnp.clip(c, 0.0, config.c_max)
    k, c0 = config.k_logistic, config.c0_logistic
    l_0 = 1.0 / (1.0 + math.exp(-k * (0.0 - c0)))
    l_max = 1.0 / (1.0 + math.exp(-k * (config.c_max - c0)))
    denom = (l_max - l_0) if (l_max - l_0) != 0 else 1e-6
    rf_inst = (1.0 / (1.0 + jnp.exp(-k * (c_clip - c0))) - l_0) / denom
    rf_inst = jnp.clip(rf_inst, 0.0, 1.0)

    # 7) EMA smoothing seeded with rf_inst[0] (04:276-279)
    rf_smooth = ema(rf_inst, config.alpha_smooth)

    return {
        "rf_inst": rf_inst,
        "rf_smooth": rf_smooth,
        "c": c,
        "s_tot": s_tot,
        "s_layers": s_layers,
    }


def _leaky_integral_f64(s: np.ndarray, lam: float) -> np.ndarray:
    """C[t] = λ·C[t-1] + S[t] with C[0] = 0 (the loop starts at t=1,
    04:262-264) ≡ IIR filter b=[1], a=[1, -λ] on S with S[0] zeroed —
    exact f64, shared by the numpy backend and the per-layer attribution."""
    from scipy.signal import lfilter

    s_shift = np.asarray(s, np.float64).copy()
    s_shift[0] = 0.0
    return lfilter([1.0], [1.0, -lam], s_shift)


def _compute_rf_numpy(residuals, mu, sigma, config: RiskConfig) -> Dict:
    """f64 CPU path, exact w.r.t. the reference's sequential loops: the two
    first-order recurrences run through ``scipy.signal.lfilter`` (IIR filters
    evaluate the identical recurrence in f64)."""
    from scipy.signal import lfilter

    r = np.asarray(residuals, np.float64)
    mu = np.asarray(mu, np.float64)
    sigma = np.asarray(sigma, np.float64)
    n = r.shape[0]

    w_feat = np.asarray(config.feature_weights, np.float64)
    key_to_idx = {k: i for i, k in enumerate(config.res_keys)}
    layer_w = dict(config.layer_weights)

    a_trunc = np.maximum(0.0, np.abs((r - mu[None, :]) / sigma[None, :]) - config.z_safe)
    s_layers: Dict[str, np.ndarray] = {}
    s_tot = np.zeros(n)
    for layer_name, keys in config.layer_config:
        idxs = [key_to_idx[k] for k in keys if k in key_to_idx]
        if not idxs:
            s_layers[layer_name] = np.zeros(n)
            continue
        a_l = a_trunc[:, idxs]
        w_l = w_feat[idxs][None, :]
        s_l = np.power((w_l * np.power(a_l, config.p_layer)).sum(axis=1),
                       1.0 / config.p_layer)
        s_layers[layer_name] = s_l
        s_tot += layer_w.get(layer_name, 1.0) * s_l

    c = _leaky_integral_f64(s_tot, config.lambda_decay)

    c_clip = np.clip(c, 0.0, config.c_max)
    k, c0 = config.k_logistic, config.c0_logistic
    l_0 = 1.0 / (1.0 + math.exp(-k * (0.0 - c0)))
    l_max = 1.0 / (1.0 + math.exp(-k * (config.c_max - c0)))
    denom = (l_max - l_0) if (l_max - l_0) != 0 else 1e-6
    rf_inst = np.clip(
        (1.0 / (1.0 + np.exp(-k * (c_clip - c0))) - l_0) / denom, 0.0, 1.0
    )

    # EMA with y[0]=x[0]: filter y[t] = α·x[t] + (1-α)·y[t-1] with initial
    # condition matching y[-1] = x[0]
    alpha = config.alpha_smooth
    zi = np.array([(1.0 - alpha) * rf_inst[0]])
    rf_smooth, _ = lfilter([alpha], [1.0, -(1.0 - alpha)], rf_inst, zi=zi)

    return {
        "rf_inst": rf_inst,
        "rf_smooth": rf_smooth,
        "c": c,
        "s_tot": s_tot,
        "s_layers": s_layers,
    }


def find_first_alarm_index(
    series: np.ndarray, threshold: float, mode: str = "above"
) -> Optional[int]:
    """First index where series ≥ (or ≤) threshold, else None (04:289-300)."""
    series = np.asarray(series)
    if mode == "above":
        idxs = np.where(series >= threshold)[0]
    elif mode == "below":
        idxs = np.where(series <= threshold)[0]
    else:
        raise ValueError("mode must be 'above' or 'below'")
    return int(idxs[0]) if len(idxs) else None


@dataclasses.dataclass
class ConditionAdvance:
    """Per-(current, fault) early-warning summary (04:395-408)."""

    fault_name: str
    current_target: float
    n_samples: int
    v_threshold: float
    idx_v_alarm: Optional[int]
    idx_rf_alarm: Optional[int]
    advance: Optional[int]  # idx_v - idx_rf; positive → RF warned earlier
    rf_inst: np.ndarray
    rf_smooth: np.ndarray
    voltage: np.ndarray
    row_indices: np.ndarray
    # explainability: each physics layer's share of the accumulated
    # (layer-weighted) S up to the RF alarm — which of voltage/gas/temp
    # DROVE the warning (04:244-259 decomposition); {} when no layer
    # accumulated anything in the window
    layer_shares: Dict[str, float] = dataclasses.field(default_factory=dict)
    # per-layer decayed risk-integral series: C_l[t] = λ·C_l[t−1] +
    # w_l·S_l[t] (C_l[0] = 0), so Σ_l C_l[t] = C[t] exactly — the time-
    # resolved composition of the risk (viz.plot_rf_attribution)
    layer_c: Dict[str, np.ndarray] = dataclasses.field(default_factory=dict)

    @property
    def dominant_layer(self) -> Optional[str]:
        if not self.layer_shares:
            return None
        return max(self.layer_shares, key=self.layer_shares.get)


def condition_row_indices(
    arr: np.ndarray,
    fault_name: str,
    current_target: float,
    config: RiskConfig = RiskConfig(),
    index_range: Optional[Tuple[int, Optional[int]]] = None,
) -> Optional[np.ndarray]:
    """Row indices of one (fault, current) evaluation condition: fault
    class ∧ |I − target| ≤ tol, then the optional relative slice
    (04:304-340 selection semantics).  Returns None when the condition is
    absent from the artifact — shared by the offline advance table and the
    streaming fleet replay so both select the exact same sub-sequences."""
    labels = arr[:, INDEX["label"]].astype(int)
    current = arr[:, INDEX["x0"]].astype(float)

    if fault_name not in FAULT_RANGE_MAP:
        raise ValueError(f"unknown fault '{fault_name}'")
    fault_range = FAULT_RANGE_MAP[fault_name]
    mask = np.isin(labels, list(fault_range)) & (
        np.abs(current - current_target) <= config.current_tol
    )
    if not mask.any():
        return None

    idx_all = np.sort(np.where(mask)[0])
    total = len(idx_all)
    if index_range is not None:
        start, end = index_range
        start = max(start, 0)
        end = total if end is None or end > total else end
        if start >= end:
            return None
        idx_all = idx_all[start:end]
    return idx_all


def compute_rf_advance_for_condition(
    results,
    mu: np.ndarray,
    sigma: np.ndarray,
    fault_name: str,
    current_target: float,
    config: RiskConfig = RiskConfig(),
    index_range: Optional[Tuple[int, Optional[int]]] = None,
    backend: str = "jax",
) -> Optional[ConditionAdvance]:
    """Mask rows by fault class ∧ |I − target| ≤ tol, evaluate RF on the
    sub-sequence, compare against the dynamic voltage threshold
    V(0) − voltage_drop (04:304-408)."""
    arr = results.array if isinstance(results, ComprehensiveResults) else np.asarray(results)
    voltage = arr[:, INDEX["y_true"]].astype(float)

    idx_all = condition_row_indices(
        arr, fault_name, current_target, config, index_range
    )
    if idx_all is None:
        return None

    sub = arr[idx_all]
    v_sub = voltage[idx_all]
    res_matrix = np.stack(
        [sub[:, INDEX[k]].astype(float) for k in config.res_keys], axis=1
    )
    rf = compute_rf_time_series(res_matrix, mu, sigma, config, backend=backend)
    rf_smooth = np.asarray(rf["rf_smooth"])

    v_threshold = float(v_sub[0]) - config.voltage_drop
    idx_v = find_first_alarm_index(v_sub, v_threshold, mode="below")
    idx_rf = find_first_alarm_index(rf_smooth, config.warn_threshold, mode="above")
    advance = idx_v - idx_rf if (idx_v is not None and idx_rf is not None) else None

    # attribute the alarm: C[t] is linear in the layer terms, so running
    # each layer's weighted S through the SAME leaky integral decomposes
    # the risk exactly — Σ_l C_l[t] = C[t], and the shares of C_l at the
    # alarm instant (last sample when the RF never fired) tell the
    # operator WHICH physics layer drove the warning.
    layer_w = dict(config.layer_weights)
    t_anchor = idx_rf if idx_rf is not None else len(idx_all) - 1
    # compute_rf_time_series returns host numpy for both backends (the
    # jax path fetches everything in its one device_get)
    s_layers_host = rf["s_layers"]
    layer_c = {
        name: _leaky_integral_f64(
            layer_w.get(name, 1.0) * np.asarray(s, float),
            config.lambda_decay,
        )
        for name, s in s_layers_host.items()
    }
    sums = {name: float(c[t_anchor]) for name, c in layer_c.items()}
    total_s = sum(sums.values())
    layer_shares = (
        {k: v / total_s for k, v in sums.items()} if total_s > 0 else {}
    )

    return ConditionAdvance(
        fault_name=fault_name,
        current_target=current_target,
        n_samples=len(idx_all),
        v_threshold=v_threshold,
        idx_v_alarm=idx_v,
        idx_rf_alarm=idx_rf,
        advance=advance,
        rf_inst=np.asarray(rf["rf_inst"]),
        rf_smooth=rf_smooth,
        voltage=v_sub,
        row_indices=idx_all,
        layer_shares=layer_shares,
        layer_c=layer_c,
    )


def run_risk_pipeline(
    results,
    config: RiskConfig = RiskConfig(),
    conditions=DEFAULT_RF_CONDITIONS,
    backend: str = "jax",
) -> List[ConditionAdvance]:
    """Script-04 main: normal stats → all conditions → advance table
    (04:479-528)."""
    arr = results.array if isinstance(results, ComprehensiveResults) else np.asarray(results)
    mu, sigma = estimate_mu_sigma_normal(arr, config.res_keys, config.normal_labels)
    out: List[ConditionAdvance] = []
    for current_target, fault_name, index_range in conditions:
        adv = compute_rf_advance_for_condition(
            arr, mu, sigma, fault_name, current_target, config, index_range,
            backend=backend,
        )
        if adv is not None:
            out.append(adv)
    return out
