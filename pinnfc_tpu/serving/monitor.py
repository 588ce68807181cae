"""Online streaming fault monitor (serving layer).

The reference is a batch research pipeline; deployment needs the same
physics in streaming form.  ``OnlineMonitor`` scores measurements as they
arrive, O(1) state per step:

1. one jitted device pass evaluates the DNN voltage prediction and all four
   physics residuals for the incoming row block (the same math as the
   exporter, pinnfc_tpu.physics.all_residuals);
2. the RF(t) recurrences carry across calls — the leaky risk integral
   ``C[t] = λ·C[t-1] + S[t]`` (04:262-264) and the EMA smoother
   (04:276-279) continue exactly where the previous block ended, so feeding
   one row at a time or a thousand at a time produces the identical series;
3. alarms follow script 04's semantics: RF warn/danger thresholds plus the
   dynamic voltage threshold V(0) − 0.1 V captured from the first sample;
4. optionally, a ``DiagnosisHead`` (script 03's calibrated-GMM posterior,
   03:360-426) classifies the fault *type* of every incoming sample from
   the same residual features, fully on device in the same jitted step.
   The head is stateless per sample, so streaming probabilities are
   block-size invariant and identical to the batch pipeline's on the same
   residual rows (the batch pipeline consumes the *exported, segment-
   smoothed* residual columns; a live stream has no future samples to
   smooth with — same policy as the RF path above);
5. optionally, a conformal calibration vector (uq/conformal, |res| scores
   on normal rows) bakes into the step and every sample gets a calibrated
   anomaly p-value — uniform on normal-like data by the conformal
   guarantee, collapsing under shift — via one on-device searchsorted.

Normal-operation statistics (μ/σ of the residual channels) come from the
training campaign (`estimate_mu_sigma_normal`), and model parameters +
scalers load from a checkpoint (`utils.checkpoint`).
"""

from __future__ import annotations

import os
import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from pinnfc_tpu.config import RiskConfig
from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.mlp import mlp_forward
from pinnfc_tpu.models.pinn import PinnParams
from pinnfc_tpu.ops.recurrences import linear_recurrence_scan
from pinnfc_tpu.physics.residuals import all_residuals


# monitor residual-stack columns (matches RiskConfig.res_keys order, 04:88)
_R_COLUMN = {"res": 0, "pV": 1, "pT": 2, "pH": 3, "pO": 4}

# single source for the consecutive-glitch sensor alarm default (the CLI
# flags and from_checkpoint all reference this)
DEFAULT_GLITCH_ALARM_N = 25


class DiagnosisHead(NamedTuple):
    """Calibrated-GMM fault-type classifier applied to the monitor's
    residual stack (script 03 semantics, streaming)."""

    gmm: "GMMParams"  # fitted mixture (diagnosis.gmm)
    comp_fault_prob: jnp.ndarray  # (C, K) P(fault | component)
    class_names: tuple  # K class names (calibration order)
    feature_indices: tuple  # columns of the residual stack r fed to the GMM

    @classmethod
    def from_gmm_result(cls, result, features: str | None = None):
        """Build from a ``run_gmm_pipeline`` result. The feature spec is
        taken from the result itself (what the mixture was actually fitted
        on); pass ``features`` only to override, and it must then equal the
        fitted spec. Only channels the monitor computes live are streamable
        (res/pV/pT/pH/pO — epi/x* need the MC sampler or raw inputs)."""
        fitted = getattr(result, "features", None)
        if features is None:
            features = fitted or "pV,pT,pH,pO"
        elif fitted is not None and [f.strip() for f in features.split(",")] != [
            f.strip() for f in fitted.split(",")
        ]:
            raise ValueError(
                f"features {features!r} do not match the spec the mixture "
                f"was fitted on ({fitted!r})"
            )
        names = [f.strip() for f in features.split(",") if f.strip()]
        unknown = [f for f in names if f not in _R_COLUMN]
        if unknown:
            raise ValueError(
                f"features {unknown} are not streamable monitor channels "
                f"(available: {sorted(_R_COLUMN)})"
            )
        return cls(
            gmm=result.model,
            comp_fault_prob=jnp.asarray(result.comp_fault_prob, jnp.float32),
            class_names=tuple(result.class_names),
            feature_indices=tuple(_R_COLUMN[f] for f in names),
        )

    def save(self, path: str) -> str:
        """Persist the head (npz) so a restarted scorer diagnoses without
        refitting — the production companion to `utils.checkpoint` for the
        model weights.  Returns the path actually written."""
        from pinnfc_tpu.utils.io import atomic_savez

        g = self.gmm
        path = path if path.endswith(".npz") else path + ".npz"
        atomic_savez(
            path,
            gmm_weights=np.asarray(g.weights),
            gmm_means=np.asarray(g.means),
            gmm_covariances=np.asarray(g.covariances),
            gmm_converged=np.asarray(g.converged),
            gmm_n_iter=np.asarray(g.n_iter),
            gmm_lower_bound=np.asarray(g.lower_bound),
            comp_fault_prob=np.asarray(self.comp_fault_prob),
            class_names=np.asarray(self.class_names),
            feature_indices=np.asarray(self.feature_indices, np.int32),
        )
        return path

    @classmethod
    def load(cls, path: str) -> "DiagnosisHead":
        from pinnfc_tpu.diagnosis.gmm import GMMParams

        d = np.load(path if path.endswith(".npz") else path + ".npz")
        feature_indices = tuple(int(i) for i in d["feature_indices"])
        bad = [i for i in feature_indices if not 0 <= i < len(_R_COLUMN)]
        if bad:
            raise ValueError(
                f"head file has feature indices {bad} outside the monitor's "
                f"residual channels 0..{len(_R_COLUMN) - 1}"
            )
        comp = d["comp_fault_prob"]
        if comp.shape[1] != len(d["class_names"]):
            raise ValueError(
                f"comp_fault_prob has {comp.shape[1]} classes but "
                f"{len(d['class_names'])} class names"
            )
        if d["gmm_means"].shape != (comp.shape[0], len(feature_indices)):
            raise ValueError(
                "gmm means shape does not match components/features: "
                f"{d['gmm_means'].shape} vs ({comp.shape[0]}, {len(feature_indices)})"
            )
        gmm = GMMParams(
            weights=jnp.asarray(d["gmm_weights"]),
            means=jnp.asarray(d["gmm_means"]),
            covariances=jnp.asarray(d["gmm_covariances"]),
            converged=jnp.asarray(d["gmm_converged"]),
            n_iter=jnp.asarray(d["gmm_n_iter"]),
            lower_bound=jnp.asarray(d["gmm_lower_bound"]),
        )
        return cls(
            gmm=gmm,
            comp_fault_prob=jnp.asarray(comp, jnp.float32),
            class_names=tuple(str(c) for c in d["class_names"]),
            feature_indices=feature_indices,
        )


# Field order of the tuple the jitted step returns as its SECOND element —
# _pack and the export surface (serving/exported.py) must index it by name
# through this constant, never by magic position.  APPEND-ONLY: exported
# StableHLO artifacts bake a prefix of this tuple (and of
# MonitorState._fields), so loaders accept any prefix recorded in
# STEP_SCHEMA_VERSIONS and new fields must go at the end.
STEP_OUT_FIELDS = (
    "rf_inst", "rf_smooth", "residuals", "v_pred", "v_alarm", "glitch",
    "sensor_alarm", "fault", "layer_scores", "layer_c", "oob",
    "conformal_p", "aci_alpha", "aci_anomaly",
)

# (n state fields, n step-output fields) of every schema an exported
# monitor-step artifact may carry, newest first: v4 added the adaptive
# conformal level (aci_alpha state + aci_alpha/aci_anomaly outputs);
# v3 added the conformal p-value output (stateless); v2 added the
# input-range drift surface (oob_count state / oob output); v1 predates
# all three.  An old artifact keeps working — its missing fields pack as
# None / carry through frozen (serving/exported.py).
STEP_SCHEMA_VERSIONS = ((9, 14), (8, 12), (8, 11), (7, 10))


def contributing_layer_names(config) -> tuple:
    """Layers that actually contribute (non-empty key intersection with
    ``res_keys``), in config order — the column order of layer_scores /
    layer_c and the width of the per-stream layer_c state (shared by
    OnlineMonitor and the artifact-serving path)."""
    k2i = {k: i for i, k in enumerate(config.res_keys)}
    return tuple(
        lname for lname, keys in config.layer_config
        if any(k in k2i for k in keys)
    )


def check_fleet_bank(x_bank, v_bank, streams):
    """Validate + coerce ``observe_many`` fleet arguments (shared by the
    vmapped path and the artifact monitor's sequential fallback): returns
    (streams list, x_bank f32 (S,B,8), v_bank f32 (S,B)) or raises before
    ANY stream state is touched."""
    streams = list(streams)
    x_bank = np.asarray(x_bank, np.float32)
    v_bank = np.asarray(v_bank, np.float32)
    if x_bank.ndim != 3 or x_bank.shape[0] != len(streams):
        raise ValueError(
            f"x_bank must be (S={len(streams)}, B, 8), got {x_bank.shape}"
        )
    if v_bank.shape != x_bank.shape[:2]:
        raise ValueError(
            f"v_bank must be {x_bank.shape[:2]}, got {v_bank.shape}"
        )
    if len(set(streams)) != len(streams):
        raise ValueError("stream keys must be unique per observe_many call")
    return streams, x_bank, v_bank


class MonitorState(NamedTuple):
    """Carry between blocks: risk integral, EMA value, first-sample voltage.

    Between ``observe`` calls the bank holds these as HOST numpy scalars
    (dtypes fixed by the jitted step's outputs) — six scalars per stream is
    nothing to transfer, and it makes multi-stream packing pure host work."""

    c: jnp.ndarray  # () leaky integral C[t]
    rf_smooth: jnp.ndarray  # () EMA value
    v_first: jnp.ndarray  # () V(0) for the dynamic threshold
    n_seen: jnp.ndarray  # () samples consumed
    v_first_set: jnp.ndarray  # () bool — baseline captured from a FINITE sample
    glitch_run: jnp.ndarray  # () consecutive non-finite samples ending the stream
    # (L,) per-layer decomposition of the SAME integral: C_l[t] = λ·C_l[t−1]
    # + w_l·S_l[t] with identical gating, so Σ_l C_l ≡ C — live risk
    # attribution carried across blocks (04:244-264 decomposed)
    layer_c: jnp.ndarray
    # (F,) cumulative count of samples whose RAW input fell outside the
    # scaler's training range, per channel — streaming data drift (the
    # serving counterpart of cli score's normal_oob_frac warning).  The
    # model extrapolates on such rows; a steadily growing count on one
    # channel means THAT sensor (or the plant) has left the regime the
    # model was fit on.  NaN inputs are glitches, not drift (comparisons
    # with NaN are False, so they never count here).
    oob_count: jnp.ndarray
    # () the adaptive conformal level α_t (Gibbs & Candès 2021 ACI):
    # α_{t+1} = α_t + γ·(α* − err_t) with err_t = [p_t ≤ α_t], carried
    # across blocks like C(t).  Deliberately UNCLIPPED: α_t transiently
    # leaving [0,1] is what makes the budget argument work — a level
    # driven below 0 by an alarm storm stores "debt" (no p ≤ α_t < 0 can
    # alarm) that must be repaid by γα*-sized quiet steps before the next
    # alarm, which is exactly how the long-run alarm rate is pinned to α*
    # REGARDLESS of distribution shift (clipping at 0 would alarm every
    # other sample under a full shift — measured 0.5, not α*).  With γ=0
    # it stays at α* (static conformal).  α_t itself is a calibrated
    # drift gauge: α_t ≈ α* means the plant still matches the calibration
    # campaign; α_t falling means the score distribution has shifted.
    aci_alpha: jnp.ndarray


@dataclasses.dataclass
class MonitorOutput:
    rf_smooth: np.ndarray  # (B,)
    rf_inst: np.ndarray  # (B,)
    residuals: np.ndarray  # (B, 5) [res, pV, pT, pH, pO]
    v_pred: np.ndarray  # (B,) predicted stack voltage [V]
    warn: np.ndarray  # (B,) bool — RF ≥ warn threshold
    danger: np.ndarray  # (B,) bool — RF ≥ danger threshold
    v_alarm: np.ndarray  # (B,) bool — measured V ≤ V(0) − drop
    glitch: np.ndarray | None = None  # (B,) bool — sample excluded from risk
    sensor_alarm: np.ndarray | None = None  # (B,) bool — glitch run ≥ limit
    fault_probs: np.ndarray | None = None  # (B, K) — with a DiagnosisHead
    fault_pred: np.ndarray | None = None  # (B,) argmax class index
    # (B, L) per-layer risk attribution, columns in ``OnlineMonitor.
    # layer_names`` order: each column is one physics layer's weighted
    # p-norm term of the RF aggregation (04:244-259), so row sums equal
    # the raw S_tot for that sample.  Attributions are PRE-gating: the
    # first-ever sample and glitched samples contribute zero to the risk
    # integral regardless of what these columns show.  For a glitch caused
    # by a dead VOLTAGE channel (NaN v_meas, finite features) the columns
    # stay finite and show the excitation; a non-finite feature row
    # propagates NaN into every column.
    layer_scores: np.ndarray | None = None
    # (B, L) per-layer risk INTEGRAL series C_l(t) (gated like C, carried
    # across blocks): row sums reconstruct the unclipped C exactly, so
    # row/rowsum at any sample is the exact live attribution of the risk
    # level — read it at the first warn to see which layer drove the alarm
    layer_c: np.ndarray | None = None
    # (B,) bool — the raw input row left the scaler's training range on at
    # least one channel (drift; the model extrapolates on these rows).
    # Per-channel cumulative counts live in the stream state
    # (MonitorState.oob_count / stream_oob_counts).  None when packing an
    # old (pre-drift) exported artifact's outputs.
    oob: np.ndarray | None = None
    # (B,) conformal anomaly p-value of each sample's |res| against the
    # baked normal calibration scores (uq/conformal semantics: uniform on
    # exchangeable-with-normal data, collapsing toward 1/(n+1) under
    # shift — a CALIBRATED per-sample anomaly probability, where rf_inst
    # is a tuned heuristic).  NaN on glitched samples.  None without a
    # ``conformal_calib`` (or packing a pre-conformal exported artifact).
    conformal_p: np.ndarray | None = None
    # (B,) the adaptive conformal level α_t each sample was tested at
    # (MonitorState.aci_alpha docs; constant α* when γ=0) and the
    # resulting anomaly flag p_t ≤ α_t.  aci_anomaly is the BUDGETED
    # alarm — its long-run rate tracks α* even under drift (γ>0) — while
    # ``conformal_p <= alpha*`` is the static detection signal; glitched
    # samples never flag (their p is NaN) and never move α_t.
    aci_alpha: np.ndarray | None = None
    aci_anomaly: np.ndarray | None = None


def _excitation_block(r, mu, sigma, cfg: RiskConfig, w_feat, key_to_idx,
                      layer_w):
    """Per-layer weighted p-norm excitations of the standardized truncated
    residuals (04:244-259) → (s_tot (B,), layer_scores (B, L)).

    ``layer_scores`` is the attribution of the RAW S_tot across physics
    layers — which layer (voltage / gas / temp) is driving the risk.  It
    is computed BEFORE the first-sample/glitch gating so a voltage-
    channel-outage glitch (finite features) still shows its excitation;
    NaN-feature rows yield NaN columns."""
    a_trunc = jnp.maximum(
        0.0, jnp.abs((r - mu[None, :]) / sigma[None, :]) - cfg.z_safe
    )
    s_tot = jnp.zeros(r.shape[0], jnp.float32)
    layer_contribs = []
    for lname, keys in cfg.layer_config:
        idxs = [key_to_idx[k] for k in keys if k in key_to_idx]
        if not idxs:
            continue
        a_l = a_trunc[:, jnp.asarray(idxs)]
        w_l = w_feat[jnp.asarray(idxs)][None, :]
        contrib = layer_w.get(lname, 1.0) * jnp.power(
            jnp.sum(w_l * jnp.power(a_l, cfg.p_layer), axis=1),
            1.0 / cfg.p_layer,
        )
        s_tot = s_tot + contrib
        layer_contribs.append(contrib)
    layer_scores = (
        jnp.stack(layer_contribs, axis=1) if layer_contribs
        else jnp.zeros((r.shape[0], 0), jnp.float32)
    )
    return s_tot, layer_scores


def _gate_block(s_tot, v_meas, state: MonitorState):
    """Sensor-glitch + first-sample gating → (glitch, gate, gated s_tot).

    A non-finite row would poison the carried C[t]/EMA state FOREVER (the
    recurrence never forgets a NaN): such samples contribute zero risk to
    the integral and surface per-sample via ``glitch``; their own
    rf/v_pred outputs still reflect the bad input.  A dead voltage
    channel (NaN v_meas) is folded in explicitly — under a layer config
    that drops the 'res' feature it would never reach s_tot, yet it still
    silently disables v_alarm for those rows.  The first-ever sample
    contributes no risk either (C[0]=0 semantics, 04:262)."""
    glitch = ~(jnp.isfinite(s_tot) & jnp.isfinite(v_meas))
    gate = glitch | (
        (state.n_seen == 0) & (jnp.arange(s_tot.shape[0]) == 0)
    )
    return glitch, gate, jnp.where(gate, 0.0, s_tot)


def _layer_c_block(layer_scores, gate, state: MonitorState, cfg: RiskConfig):
    """Per-layer risk-integral continuation: the SAME leaky recurrence
    applied to each layer's gated term, so Σ_l C_l ≡ C at every sample —
    live attribution of the risk level, carried across blocks like C."""
    layer_gated = jnp.where(gate[:, None], 0.0, layer_scores)
    lam_vec = jnp.full(layer_gated.shape[0], cfg.lambda_decay)
    if layer_gated.shape[1]:
        return jax.vmap(
            lambda col, init: linear_recurrence_scan(lam_vec, col, init),
            in_axes=(1, 0), out_axes=1,
        )(layer_gated, state.layer_c)
    return layer_gated


def _glitch_run_block(glitch, state: MonitorState, glitch_alarm_n: int):
    """Consecutive-glitch run length: run[i] = glitch[i]·(run[i-1]+1), the
    same first-order recurrence as C[t] → same associative scan."""
    gf = glitch.astype(jnp.float32)
    glitch_series = linear_recurrence_scan(gf, gf, state.glitch_run)
    return glitch_series, glitch_series >= glitch_alarm_n


def _voltage_alarm_block(v_meas, state: MonitorState, cfg: RiskConfig):
    """Dynamic-threshold baseline + alarm → (v_first, v_first_set, v_alarm).

    The baseline is captured from the FIRST FINITE voltage sample ever
    seen (a glitched first sample must not permanently zero the alarm
    baseline — it defers capture).  NaN comparisons are False, so
    pre-baseline (non-finite) samples in the capturing block never alarm;
    the flag guards the no-baseline-yet stream entirely."""
    finite_v = jnp.isfinite(v_meas)
    has_finite = jnp.any(finite_v)
    cand = v_meas[jnp.argmax(finite_v)]
    v_first = jnp.where(
        state.v_first_set,
        state.v_first,
        jnp.where(has_finite, cand, 0.0),
    )
    v_first_set = state.v_first_set | has_finite
    v_alarm = v_first_set & (v_meas <= (v_first - cfg.voltage_drop))
    return v_first, v_first_set, v_alarm


def _drift_block(x_raw, box_lo, box_hi):
    """Input-range drift: which channels left the training box this block.
    A glitched sensor is an outage, not drift (counted by the glitch run)
    — NaN compares False on both sides already, but ±inf would satisfy
    the box comparison, so non-finite readings are excluded explicitly."""
    oob_ch = jnp.isfinite(x_raw) & (
        (x_raw < box_lo[None, :]) | (x_raw > box_hi[None, :])
    )
    return oob_ch, jnp.any(oob_ch, axis=1)


def _conformal_aci_block(res, calib, state: MonitorState, gamma: float,
                         alpha_star: float):
    """Conformal anomaly p-values + the adaptive (ACI) alarm level.

    p = (1 + #{calib ≥ |res|}) / (n+1) by ONE searchsorted against the
    sorted baked calibration vector — exact integer rank counts, ties
    conservative ('left' side matches the host backend bit for bit on the
    ranks; only the final f32 division differs from f64 in low bits).
    NaN rows (glitches) get NaN p, like fault_pred.

    The adaptive conformal level (MonitorState.aci_alpha docs) is a
    sequential scalar recurrence — err_t depends on α_t through the
    comparison, so unlike C(t) it is NOT a linear recurrence; a lax.scan
    over the block (B scalar ops) is negligible next to the forward pass.
    Glitched samples (NaN p) neither flag nor move the level."""
    s_conf = jnp.abs(res)
    ge = calib.shape[0] - jnp.searchsorted(calib, s_conf, side="left")
    p_conf = (1.0 + ge.astype(jnp.float32)) / (calib.shape[0] + 1.0)
    conformal_p = jnp.where(jnp.isfinite(s_conf), p_conf, jnp.nan)

    def aci_step(alpha_t, p_t):
        fin = jnp.isfinite(p_t)
        err = fin & (p_t <= alpha_t)
        # unclipped on purpose — see MonitorState.aci_alpha
        nxt = alpha_t + gamma * (alpha_star - err.astype(jnp.float32))
        nxt = jnp.where(fin, nxt, alpha_t)
        return nxt, (alpha_t, err)

    aci_last, (aci_alpha, aci_anomaly) = jax.lax.scan(
        aci_step, state.aci_alpha, conformal_p
    )
    return conformal_p, aci_alpha, aci_anomaly, aci_last


def _diagnosis_block(head: DiagnosisHead, r, glitch):
    """Script-03 posterior mapping (03:417-425), fully on device.

    Glitched rows have NaN features → NaN posterior; argmax of an all-NaN
    row silently returns 0, which downstream would count as a confident
    class-0 vote — mark them -1."""
    from pinnfc_tpu.diagnosis.gmm import gmm_predict_proba

    feats = r[:, jnp.asarray(head.feature_indices)]
    resp = gmm_predict_proba(head.gmm, feats)
    probs = jnp.clip(
        jnp.matmul(resp, head.comp_fault_prob, precision="highest"),
        1e-12, 1.0,
    )
    probs = probs / jnp.sum(probs, axis=1, keepdims=True)
    pred = jnp.where(glitch, -1, jnp.argmax(probs, axis=1))
    return probs, pred


def _rf_block(s_tot, state: MonitorState, cfg: RiskConfig):
    """Continue the RF recurrences over one block given carry ``state``."""
    lam = cfg.lambda_decay
    c_series = linear_recurrence_scan(
        jnp.full_like(s_tot, lam), s_tot, state.c
    )
    c_clip = jnp.clip(c_series, 0.0, cfg.c_max)
    k, c0 = cfg.k_logistic, cfg.c0_logistic
    l_0 = 1.0 / (1.0 + np.exp(-k * (0.0 - c0)))
    l_max = 1.0 / (1.0 + np.exp(-k * (cfg.c_max - c0)))
    denom = (l_max - l_0) if (l_max - l_0) != 0 else 1e-6
    rf_inst = jnp.clip(
        (1.0 / (1.0 + jnp.exp(-k * (c_clip - c0))) - l_0) / denom, 0.0, 1.0
    )
    # EMA continues from the carried value; on the very first sample ever,
    # seed with rf_inst[0] (04:277)
    alpha = cfg.alpha_smooth
    seed = jnp.where(state.n_seen == 0, rf_inst[0], state.rf_smooth)
    rf_smooth = linear_recurrence_scan(
        jnp.full_like(rf_inst, 1.0 - alpha), alpha * rf_inst, seed
    )
    # first-ever sample: rf_smooth[0] must equal rf_inst[0] exactly
    rf_smooth = jnp.where(
        (state.n_seen == 0) & (jnp.arange(rf_inst.shape[0]) == 0),
        rf_inst, rf_smooth,
    )
    return rf_inst, rf_smooth, c_series


class OnlineMonitor:
    """Streaming scorer over (B, 8) raw measurement blocks + (B,) voltage."""

    def __init__(
        self,
        params: PinnParams,
        scaler_x: AffineScaler,
        scaler_y: AffineScaler,
        mu: np.ndarray,
        sigma: np.ndarray,
        config: RiskConfig = RiskConfig(),
        diagnosis: DiagnosisHead | None = None,
        glitch_alarm_n: int = DEFAULT_GLITCH_ALARM_N,
        mesh=None,
        conformal_calib=None,
        conformal_alpha: float = 0.1,
        conformal_gamma: float = 0.0,
    ):
        if glitch_alarm_n < 1:
            raise ValueError(
                f"glitch_alarm_n must be >= 1 (a run of 0 would alarm on "
                f"every healthy sample), got {glitch_alarm_n}"
            )
        if mesh is not None and "data" not in mesh.axis_names:
            raise ValueError(
                f"monitor mesh needs a 'data' axis to shard streams over, "
                f"got axes {mesh.axis_names}"
            )
        self.params = params
        self.scaler_x = scaler_x
        self.scaler_y = scaler_y
        # width of the raw-input rows — sizes the per-channel drift counter
        self._n_features = int(np.asarray(scaler_x.scale).shape[0])
        self.mu = jnp.asarray(mu, jnp.float32)
        self.sigma = jnp.asarray(sigma, jnp.float32)
        self.config = config
        self.diagnosis = diagnosis
        # sensor-outage alarm: fire after this many CONSECUTIVE non-finite
        # samples (glitched rows contribute zero risk, so a dead sensor would
        # otherwise decay RF toward "healthy" silently)
        self.glitch_alarm_n = int(glitch_alarm_n)
        # conformal anomaly scoring: a vector of calibration scores |res|
        # computed on NORMAL rows (uq.normal_calibration_scores with the
        # 'absolute' score — the one streamable without MC sampling) bakes
        # into the jitted step as a sorted constant; every sample then gets
        # a calibrated anomaly p-value via one searchsorted (uq/conformal
        # semantics).  Stateless per sample, so block-size invariant.
        if conformal_calib is not None:
            calib = np.asarray(conformal_calib, np.float32).ravel()
            if calib.size == 0:
                raise ValueError("conformal_calib must be non-empty")
            if not np.isfinite(calib).all():
                raise ValueError(
                    "conformal_calib must be finite (uq.normal_calibration_"
                    "scores already drops non-finite rows)"
                )
            if not 0.0 < conformal_alpha < 1.0:
                raise ValueError(
                    f"conformal_alpha must be in (0, 1), got {conformal_alpha}"
                )
            self.conformal_calib = np.sort(calib)
        else:
            self.conformal_calib = None
        self.conformal_alpha = float(conformal_alpha)
        # adaptive conformal step size (MonitorState.aci_alpha docs):
        # γ=0 keeps α_t pinned at α* (static); γ>0 makes the per-stream
        # alarm level track drift so the long-run alarm rate stays at α*
        if not 0.0 <= conformal_gamma < 1.0:
            raise ValueError(
                f"conformal_gamma must be in [0, 1), got {conformal_gamma}"
            )
        if conformal_gamma > 0.0 and conformal_calib is None:
            raise ValueError(
                "conformal_gamma needs a conformal_calib vector (there is "
                "no p-value to adapt the level against)"
            )
        self.conformal_gamma = float(conformal_gamma)
        # layers that actually contribute, in config order — the column
        # order of layer_scores/layer_c and the length of the per-stream
        # layer_c state vector (shared rule: contributing_layer_names)
        self.layer_names = contributing_layer_names(config)
        # multi-stream state bank: real deployments watch several operating
        # conditions concurrently (04:145-161 evaluates 12) — each stream
        # key carries its own RF(t) recurrence state; "default" preserves
        # the single-stream API
        self._streams: dict[str, MonitorState] = {"default": self._fresh_state()}
        # host-side mirror of per-stream n_seen so serving never pays a
        # second device readback per request just for a counter
        self._n_seen: dict[str, int] = {"default": 0}
        # host-side per-stream count of samples with conformal p ≤ α — the
        # calibrated anomaly-rate counter /metrics exposes.  Updated from
        # observe's single batched readback (zero extra device traffic);
        # stays zero without a calibration vector
        self._low_p: dict[str, int] = {"default": 0}
        self._step_fn = self._build_step()
        self._step = jax.jit(self._step_fn)
        self._vstep = None  # lazily-jitted vmapped step (observe_many)
        # fleet sharding: observe_many shards the STREAM axis over this
        # mesh's 'data' axis — streams never interact, so the program is
        # collective-free and fleet throughput scales linearly with chips
        self.mesh = mesh
        self._mesh_replicated = None  # lazily mesh-replicated (params, μ, σ)

    def _fresh_state(self) -> MonitorState:
        # HOST numpy scalars, dtypes matching the jitted step's outputs: the
        # bank lives on the host so observe_many can pack S streams with one
        # np.stack instead of per-call eager device stacks (each eager op is
        # a separate relay dispatch on remote-attached TPUs), and so the
        # fresh-state and carried-state jit signatures are identical (the
        # old weak-typed jnp zeros cost one extra compile on the 2nd call)
        return MonitorState(
            c=np.float32(0.0),
            rf_smooth=np.float32(0.0),
            v_first=np.float32(0.0),
            n_seen=np.int32(0),
            v_first_set=np.bool_(False),
            glitch_run=np.float32(0.0),
            layer_c=np.zeros(len(self.layer_names), np.float32),
            oob_count=np.zeros(self._n_features, np.int32),
            aci_alpha=np.float32(self.conformal_alpha),
        )

    def _build_step(self):
        cfg = self.config
        w_feat = jnp.asarray(cfg.feature_weights, jnp.float32)
        key_to_idx = {k: i for i, k in enumerate(cfg.res_keys)}
        layer_w = dict(cfg.layer_weights)
        head = self.diagnosis
        # training-range box for the drift counter (01:271-274 MinMax fit
        # extrema), baked as jnp constants like the scalers themselves
        box_lo = jnp.asarray(np.asarray(self.scaler_x.data_min, np.float32))
        box_hi = jnp.asarray(np.asarray(self.scaler_x.data_max, np.float32))
        # sorted conformal calibration scores (or None) — see __init__
        calib = (
            jnp.asarray(self.conformal_calib)
            if self.conformal_calib is not None else None
        )

        def step(params, state: MonitorState, x_raw, v_meas, mu, sigma):
            """One block through every monitor concern — each concern is a
            module-level ``_*_block`` helper (numerics documented there),
            this closure only binds the baked constants and composes."""
            # forward + residual stack (col 12 semantics for ``res``)
            x_norm = self.scaler_x.transform(x_raw)
            u_norm, _ = mlp_forward(params["mlp"], x_norm, train=False)
            v_pred = self.scaler_y.inverse(u_norm)[:, 0]
            bundle = all_residuals(
                params, x_norm, u_norm, self.scaler_x, self.scaler_y
            )
            res = v_meas - v_pred
            r = jnp.stack(
                [res, bundle.f_v[:, 0], bundle.f_t[:, 0],
                 bundle.f_h[:, 0], bundle.f_o[:, 0]], axis=1
            )

            s_tot, layer_scores = _excitation_block(
                r, mu, sigma, cfg, w_feat, key_to_idx, layer_w
            )
            glitch, gate, s_tot = _gate_block(s_tot, v_meas, state)
            rf_inst, rf_smooth, c_series = _rf_block(s_tot, state, cfg)
            lc_series = _layer_c_block(layer_scores, gate, state, cfg)
            glitch_series, sensor_alarm = _glitch_run_block(
                glitch, state, self.glitch_alarm_n
            )
            v_first, v_first_set, v_alarm = _voltage_alarm_block(
                v_meas, state, cfg
            )
            oob_ch, oob = _drift_block(x_raw, box_lo, box_hi)

            if calib is not None:
                conformal_p, aci_alpha, aci_anomaly, aci_last = (
                    _conformal_aci_block(
                        res, calib, state,
                        self.conformal_gamma, self.conformal_alpha,
                    )
                )
            else:
                conformal_p = aci_alpha = aci_anomaly = None
                aci_last = state.aci_alpha

            new_state = MonitorState(
                c=c_series[-1],
                rf_smooth=rf_smooth[-1],
                v_first=v_first,
                n_seen=state.n_seen + s_tot.shape[0],
                v_first_set=v_first_set,
                glitch_run=glitch_series[-1],
                layer_c=lc_series[-1],
                oob_count=state.oob_count
                + jnp.sum(oob_ch, axis=0, dtype=state.oob_count.dtype),
                aci_alpha=aci_last,
            )

            fault = (
                _diagnosis_block(head, r, glitch)
                if head is not None else (None, None)
            )
            return new_state, (
                rf_inst, rf_smooth, r, v_pred, v_alarm, glitch, sensor_alarm,
                fault, layer_scores, lc_series, oob, conformal_p,
                aci_alpha, aci_anomaly,
            )

        return step

    # ---- single-stream back-compat surface -------------------------------
    @property
    def state(self) -> MonitorState:
        return self._streams["default"]

    @state.setter
    def state(self, value: MonitorState) -> None:
        self._streams["default"] = value

    @property
    def n_seen(self) -> int:
        """Total samples seen across all streams (equals the old counter
        for single-stream use)."""
        return sum(self._n_seen.values())

    @property
    def streams(self) -> tuple:
        return tuple(self._streams)

    def stream_n_seen(self, stream: str = "default") -> int:
        return self._n_seen.get(stream, 0)

    def stream_low_p(self, stream: str = "default") -> int:
        """Cumulative count of samples with conformal anomaly p ≤ α on
        this stream (0 for unknown streams or without a calibration
        vector).  Divide by ``stream_n_seen`` for the calibrated anomaly
        rate — ≤ α (≈ α) on healthy exchangeable data by the coverage
        guarantee, climbing under fault or drift."""
        return self._low_p.get(stream, 0)

    def stream_aci_alpha(self, stream: str = "default") -> float:
        """Current adaptive conformal level α_t for one stream (the
        configured α* for unknown streams — a fresh stream starts there).
        With γ>0 this is a calibrated drift gauge: α_t ≈ α* means the
        stream still matches the calibration campaign."""
        state = self._streams.get(stream)
        if state is None:
            return self.conformal_alpha
        return float(jax.device_get(state.aci_alpha))

    def stream_oob_counts(self, stream: str = "default") -> np.ndarray:
        """(F,) cumulative out-of-training-range sample count per input
        channel for one stream (host copy; fresh zeros for an unknown
        stream).  Divide by ``stream_n_seen`` for the drift fraction."""
        state = self._streams.get(stream)
        if state is None:
            return np.zeros(self._n_features, np.int64)
        return np.asarray(jax.device_get(state.oob_count)).astype(np.int64)

    def _pack(self, out_host) -> MonitorOutput:
        # by-name through STEP_OUT_FIELDS (append-only schema): an exported
        # artifact from before a field existed returns a shorter tuple and
        # that field simply packs as None
        d = dict(zip(STEP_OUT_FIELDS, out_host))
        probs, pred = d["fault"]
        rf_smooth = d["rf_smooth"]
        return MonitorOutput(
            rf_smooth=rf_smooth,
            rf_inst=d["rf_inst"],
            residuals=d["residuals"],
            v_pred=d["v_pred"],
            warn=rf_smooth >= self.config.warn_threshold,
            danger=rf_smooth >= self.config.danger_threshold,
            v_alarm=d["v_alarm"],
            glitch=d["glitch"],
            sensor_alarm=d["sensor_alarm"],
            fault_probs=probs,
            fault_pred=pred,
            layer_scores=d["layer_scores"],
            layer_c=d["layer_c"],
            oob=d.get("oob"),
            conformal_p=d.get("conformal_p"),
            aci_alpha=d.get("aci_alpha"),
            aci_anomaly=d.get("aci_anomaly"),
        )

    def _count_low_p(self, out: MonitorOutput, stream: str) -> None:
        """Advance the host-side calibrated-anomaly counter from an already
        fetched output (NaN compares False, so glitches never count).

        Tie-inclusive ``p ≤ α``: the conformal coverage duality is
        covered ⟺ p > α, so the boundary sample (p == α exactly, reachable
        whenever α·(n_calib+1) is an integer) is an uncovered anomaly."""
        if out.conformal_p is not None:
            self._low_p[stream] = self._low_p.get(stream, 0) + int(
                np.sum(np.asarray(out.conformal_p) <= self.conformal_alpha)
            )

    def observe(self, x_raw, v_measured, stream: str = "default") -> MonitorOutput:
        """Score a block of raw measurements (B, 8) + measured voltage (B,).

        ``stream`` selects an independent RF(t) state in the bank (created
        fresh on first use) — one monitor instance watches many operating
        conditions with the SAME compiled step program."""
        x_raw = jnp.asarray(np.atleast_2d(np.asarray(x_raw, np.float32)))
        v_meas = jnp.asarray(np.atleast_1d(np.asarray(v_measured, np.float32)))
        state = self._streams.get(stream)
        if state is None:
            state = self._fresh_state()
        new_state, out = self._step(
            self.params, state, x_raw, v_meas, self.mu, self.sigma
        )
        # ONE batched device→host fetch (state rides along for free): each
        # separate np.asarray costs a full relay round trip on
        # remote-attached TPUs (measured ~23 ms apiece through the axon
        # tunnel, benchmarks/serving_bench.py); the state bank is kept as
        # host numpy so the observe_many packing below is pure host work
        new_state, out_host = jax.device_get((new_state, out))
        self._streams[stream] = new_state
        self._n_seen[stream] = self._n_seen.get(stream, 0) + int(x_raw.shape[0])
        packed = self._pack(out_host)
        self._count_low_p(packed, stream)
        return packed

    def observe_many(self, x_bank, v_bank, streams) -> dict:
        """Advance MANY streams in ONE device program (vmapped step).

        Args:
          x_bank: (S, B, 8) raw measurements, one block per stream.
          v_bank: (S, B) measured voltages.
          streams: S stream keys (created fresh on first use).

        Equivalent to S ``observe`` calls (parity-tested), but the state
        bank is stacked and the jitted step vmaps over the stream axis —
        a co-located fleet polling at one cadence costs one dispatch, not
        S round trips.  Returns {stream: MonitorOutput}.

        With a ``mesh`` (constructor arg, 'data' axis), the stream axis is
        additionally SHARDED across devices: fleet scoring is
        embarrassingly parallel (streams never interact), so the compiled
        program contains zero collectives (regression-tested) and fleet
        capacity scales linearly with chips.  S is padded to a multiple of
        the axis size with fresh-state dummy streams whose results are
        never read back into the bank."""
        streams, x_bank, v_bank = check_fleet_bank(x_bank, v_bank, streams)
        if self._vstep is None:
            self._vstep = jax.jit(
                jax.vmap(self._step_fn, in_axes=(None, 0, 0, 0, None, None))
            )
        states = [
            s_ if (s_ := self._streams.get(s)) is not None else self._fresh_state()
            for s in streams
        ]
        # pack on the HOST: the bank is numpy (device_get returns any
        # user-injected device state as numpy too), so stacking costs zero
        # device dispatches — the old per-call eager jnp.stack per state
        # field was 6 extra relay round trips per poll
        bank = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs), *jax.device_get(states)
        )
        if self.mesh is not None and self.mesh.shape["data"] > 1:
            params, mu, sigma, bank, x_in, v_in = self._shard_fleet(
                bank, x_bank, v_bank
            )
        else:
            params, mu, sigma = self.params, self.mu, self.sigma
            x_in, v_in = jnp.asarray(x_bank), jnp.asarray(v_bank)
        new_bank, out = self._vstep(params, bank, x_in, v_in, mu, sigma)
        # ONE batched device→host fetch for the whole bank (same ~23 ms
        # relay-RTT-per-device_get economics as observe())
        new_bank, out_host = jax.device_get((new_bank, out))
        results = {}
        for i, s in enumerate(streams):
            # numpy slices — per-stream states stay host-resident; on the
            # sharded path any pad rows sit BEYOND index S-1 and are
            # simply never read

            self._streams[s] = jax.tree_util.tree_map(
                lambda a, i=i: a[i], new_bank
            )
            self._n_seen[s] = self._n_seen.get(s, 0) + int(x_bank.shape[1])
            results[s] = self._pack(
                jax.tree_util.tree_map(lambda a, i=i: a[i], out_host)
            )
            self._count_low_p(results[s], s)
        return results

    def _shard_fleet(self, bank, x_bank, v_bank):
        """Place one observe_many call's inputs sharded over the mesh.

        The stream axis pads up to a multiple of the mesh's 'data' size
        with FRESH-state zero-input dummy streams (device_put needs
        divisibility; the pad rows are discarded by the caller), every
        per-stream array shards over 'data', and params/μ/σ replicate
        once per monitor (cached — replication is a real transfer on
        remote-attached chips)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.mesh
        pad = (-x_bank.shape[0]) % mesh.shape["data"]
        if pad:
            x_bank = np.concatenate(
                [x_bank, np.zeros((pad,) + x_bank.shape[1:], x_bank.dtype)]
            )
            v_bank = np.concatenate(
                [v_bank, np.zeros((pad,) + v_bank.shape[1:], v_bank.dtype)]
            )
            fresh = self._fresh_state()
            bank = jax.tree_util.tree_map(
                lambda a, f: np.concatenate(
                    [a, np.broadcast_to(np.asarray(f),
                                        (pad,) + np.asarray(f).shape)]
                ),
                bank, fresh,
            )

        def shard(a):
            spec = P("data", *([None] * (np.ndim(a) - 1)))
            return jax.device_put(a, NamedSharding(mesh, spec))

        if self._mesh_replicated is None:
            from pinnfc_tpu.parallel.mesh import replicate

            self._mesh_replicated = replicate(
                mesh, (self.params, self.mu, self.sigma)
            )
        params, mu, sigma = self._mesh_replicated
        return (
            params, mu, sigma,
            jax.tree_util.tree_map(shard, bank), shard(x_bank), shard(v_bank),
        )

    def reset(self, stream: str | None = None) -> None:
        """Reset one stream's state, or (default) the whole bank."""
        if stream is None:
            self._streams = {"default": self._fresh_state()}
            self._n_seen = {"default": 0}
            self._low_p = {"default": 0}
        else:
            self._streams[stream] = self._fresh_state()
            self._n_seen[stream] = 0
            self._low_p[stream] = 0

    def save_state_bank(self, path: str) -> str:
        """Snapshot every stream's RF(t) carry state + counters (npz).

        The bank is six host scalars + the per-layer C_l and per-channel
        drift-count vectors per stream, so a snapshot is
        microseconds of pure host work — cheap enough to take after every
        request.  The write is atomic (tmp + rename, same discipline as
        `utils.checkpoint`) so a crash mid-write can never leave a torn
        bank behind.  Restoring via ``load_state_bank`` makes a restarted
        scorer continue every stream's recurrence bit-exactly — the
        serving counterpart of the trainer's mid-stage checkpointing.
        Returns the path actually written."""
        from pinnfc_tpu.utils.io import atomic_savez

        path = path if path.endswith(".npz") else path + ".npz"
        streams = sorted(self._streams)
        # device_get: users may have injected device-resident states
        states = jax.device_get([self._streams[s] for s in streams])
        payload = {
            "streams": np.asarray(streams),
            "n_seen": np.asarray(
                [self._n_seen.get(s, 0) for s in streams], np.int64
            ),
            "low_p": np.asarray(
                [self._low_p.get(s, 0) for s in streams], np.int64
            ),
        }
        for field in MonitorState._fields:
            payload[f"state_{field}"] = np.stack(
                [np.asarray(getattr(st, field)) for st in states]
            )
        atomic_savez(path, **payload)
        return path

    def load_state_bank(self, path: str) -> None:
        """Replace the whole stream bank with a ``save_state_bank`` snapshot.

        Restored scalars are cast to the fresh-state dtypes, so the jitted
        step keeps its single compile signature across a save/load cycle."""
        d = np.load(path if path.endswith(".npz") else path + ".npz")
        fresh = self._fresh_state()
        # layer_c / oob_count / aci_alpha may be absent from snapshots
        # written before those surfaces existed (or under a different
        # layer config / feature width): the RF recurrence itself restores
        # exactly; the attribution restarts from zero and re-fills with
        # the integral's own ~1/(1−λ) memory, the drift counter restarts
        # from zero, the adaptive level restarts at α*
        optional = {
            f for f in ("layer_c", "oob_count", "aci_alpha")
            if f"state_{f}" not in d
            or d[f"state_{f}"].shape[1:] != np.asarray(
                getattr(fresh, f)).shape
        }
        missing = [
            k for k in ["streams", "n_seen"]
            + [f"state_{f}" for f in MonitorState._fields
               if f not in optional]
            if k not in d
        ]
        if missing:
            raise ValueError(f"state-bank file {path!r} is missing {missing}")
        streams = [str(s) for s in d["streams"]]
        n = len(streams)
        if len(set(streams)) != n:
            raise ValueError(f"state-bank file {path!r} has duplicate streams")
        for f in MonitorState._fields:
            if f in optional:
                continue
            # full-shape check: per-stream scalars must be exactly (n,)
            # and vector fields (n, L) — including 0-d or mis-sized arrays
            # — or fail loudly at load time, not as an opaque shape error
            # inside the jitted step on the next observe
            want = (n,) + np.asarray(getattr(fresh, f)).shape
            if d[f"state_{f}"].shape != want:
                raise ValueError(
                    f"state-bank field state_{f} has shape "
                    f"{d[f'state_{f}'].shape}, want {want} for {n} streams"
                )
        if d["n_seen"].shape != (n,):
            raise ValueError(
                f"state-bank n_seen has shape {d['n_seen'].shape} for "
                f"{n} streams"
            )
        if optional:
            import sys as _sys

            print(
                f"note: state-bank {path!r} lacks {sorted(optional)} "
                "(older snapshot or different layer config); those fields "
                "restart fresh — the RF recurrence itself resumes exactly",
                file=_sys.stderr,
            )
        self._streams = {
            s: MonitorState(*(
                np.asarray(getattr(fresh, f)).copy() if f in optional
                else np.asarray(d[f"state_{f}"][i]).astype(
                    np.asarray(getattr(fresh, f)).dtype
                )[()]
                for f in MonitorState._fields
            ))
            for i, s in enumerate(streams)
        }
        self._n_seen = {s: int(d["n_seen"][i]) for i, s in enumerate(streams)}
        # the calibrated-anomaly counter is a host statistic; snapshots
        # written before it existed restart it from zero (mis-sized arrays
        # too — it gates nothing, unlike the state fields above)
        low_p = d["low_p"] if "low_p" in d and d["low_p"].shape == (n,) else None
        self._low_p = {
            s: int(low_p[i]) if low_p is not None else 0
            for i, s in enumerate(streams)
        }
        # preserve the bank invariant the single-stream API relies on
        self._streams.setdefault("default", self._fresh_state())
        self._n_seen.setdefault("default", 0)
        self._low_p.setdefault("default", 0)

    @classmethod
    def from_checkpoint(
        cls,
        path: str,
        mu,
        sigma,
        config: RiskConfig = RiskConfig(),
        diagnosis: DiagnosisHead | None = None,
        glitch_alarm_n: int = DEFAULT_GLITCH_ALARM_N,
        mesh=None,
        conformal_calib=None,
        conformal_alpha: float = 0.1,
        conformal_gamma: float = 0.0,
    ) -> "OnlineMonitor":
        """Restore params + scalers saved by utils.checkpoint.save_checkpoint."""
        from pinnfc_tpu.utils.checkpoint import load_checkpoint

        ckpt = load_checkpoint(path)
        return cls(
            ckpt["params"], ckpt["scaler_x"], ckpt["scaler_y"], mu, sigma,
            config, diagnosis, glitch_alarm_n=glitch_alarm_n, mesh=mesh,
            conformal_calib=conformal_calib, conformal_alpha=conformal_alpha,
            conformal_gamma=conformal_gamma,
        )
