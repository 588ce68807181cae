"""Self-contained model artifacts via ``jax.export`` (StableHLO).

The reference has no deployment story at all: weights are never saved
(SURVEY §5 — the only persisted artifact is ``F01_output.mat``,
01:2185-2187), so "serving" the model means re-running the Python
training script.  pinnfc_tpu already persists checkpoints; this module
goes one step further and serializes the *compiled function itself*:

* the eval-mode scorer — raw sensor rows ``(B, 8)`` → physical-unit
  voltage prediction ``(B,)`` + aleatoric log-variance ``(B,)`` — with
  the MLP weights AND both MinMax scalers baked in as constants
  (:func:`export_scorer`), or the full streaming RF(t) monitor block
  step with carried state (:func:`export_monitor_step`),
* lowered to StableHLO with a **symbolic batch dimension** (one artifact
  serves every batch size, no retracing), and
* optionally **multi-platform** (``cpu`` + ``tpu`` in one artifact), so
  the file exported on a dev box runs unchanged on a TPU server — and
  vice versa — without the Python model code, the checkpoint, or even
  this package being importable at load time (only jax).

StableHLO carries jax.export's compatibility guarantees (forward/backward
windows), which makes these artifacts the right unit for model registries
and version pinning, unlike pickled params.

``cli export-model`` wraps :func:`export_scorer`; the ``.meta.json``
provenance sidecar convention matches ``utils.checkpoint``.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.mlp import mlp_forward


def build_scorer_fn(
    params, scaler_x: AffineScaler, scaler_y: AffineScaler,
    precision: str = "highest",
) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """The deterministic scorer: raw ``(B, 8)`` sensors → physical-unit
    ``(v_pred (B,), log_var (B,))``.

    This is the eval-mode forward of 01:1403-1411 composed with the MinMax
    normalize/denormalize round trip the reference performs in numpy
    (01:271-274, 01:2163); here both scalers are affine jnp constants that
    fuse into the graph.  ``params`` is the PINN pytree (only the MLP piece
    is used — λ's affect residuals, not the voltage prediction).
    """
    mlp = params["mlp"] if isinstance(params, dict) and "mlp" in params else params

    def scorer(x_raw: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x_norm = scaler_x.transform(x_raw)
        pred_norm, log_var = mlp_forward(
            mlp, x_norm, train=False, precision=precision
        )
        v = scaler_y.inverse(pred_norm)
        return v[:, 0], log_var[:, 0]

    return scorer


def export_scorer(
    params,
    scaler_x: AffineScaler,
    scaler_y: AffineScaler,
    platforms: Sequence[str] = ("cpu", "tpu"),
    precision: str = "highest",
    n_features: int = 8,
) -> bytes:
    """Serialize the scorer to a StableHLO artifact (bytes).

    The batch dimension is symbolic — the artifact accepts any ``(B, 8)``
    float32 batch.  ``platforms`` lowers one artifact for several targets
    (jax.export cross-lowers without the hardware present).
    """
    from jax import export as jexport

    fn = jax.jit(build_scorer_fn(params, scaler_x, scaler_y, precision))
    spec = jax.ShapeDtypeStruct(
        jexport.symbolic_shape(f"b, {n_features}"), jnp.float32
    )
    exp = jexport.export(fn, platforms=list(platforms))(spec)
    return exp.serialize()


def export_monitor_step(
    monitor, platforms: Sequence[str] = ("cpu", "tpu")
) -> bytes:
    """Serialize an :class:`~pinnfc_tpu.serving.OnlineMonitor`'s block step
    (params, scalers, risk config, glitch threshold, and the optional
    diagnosis head all baked in) to a StableHLO artifact.

    Exported signature (symbolic block size ``b``)::

        (state, x_raw f32[b,8], v_meas f32[b], mu f32[5], sigma f32[5])
          -> (state, (rf, rf_smooth, residuals f32[b,5], v_pred, v_alarm,
                      glitch, sensor_alarm, (fault_probs, fault_pred),
                      layer_scores f32[b,L], layer_c f32[b,L], oob bool[b],
                      conformal_p f32[b] | None,
                      aci_alpha f32[b] | None, aci_anomaly bool[b] | None))

    ``conformal_p``/``aci_*`` are present (non-None) when the exporting
    monitor carried a conformal calibration vector — the sorted normal
    scores, the target level α* and the ACI step size γ bake into the
    step like the scalers and head do.  The CARRIED level α_t is state
    (crosses the boundary like C(t)); a fresh stream starts at whatever
    the serving shell's ``conformal_alpha`` is, so pass the sidecar's
    recorded value to start at the baked target.

    ``state`` crosses the boundary as a PLAIN TUPLE in
    ``MonitorState._fields`` order (recorded in the CLI sidecar), not as
    the NamedTuple — the artifact's pytree signature must be expressible
    with builtins so an external host can drive it with jax alone.  Feed
    each returned state into the next call: the recurrence semantics are
    exactly ``OnlineMonitor.observe``'s (same traced function), so the
    carried RF(t)/EMA/attribution state round-trips identically.

    ``mu``/``sigma`` stay runtime inputs: they are the per-operating-
    condition normal statistics (04:179-199), the one thing a deployment
    re-estimates per stream.
    """
    from jax import export as jexport

    params = monitor.params
    step_fn = monitor._step_fn
    state_cls = type(monitor._fresh_state())

    def fn(state_tuple, x_raw, v_meas, mu, sigma):
        new_state, outs = step_fn(
            params, state_cls(*state_tuple), x_raw, v_meas, mu, sigma
        )
        return tuple(new_state), outs

    fresh = monitor._fresh_state()
    state_spec = tuple(
        jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype)
        for a in fresh
    )
    import numpy as np

    n_features = int(np.asarray(monitor.scaler_x.scale).shape[0])
    n_res = int(monitor.mu.shape[0])
    x_shape = jexport.symbolic_shape(f"b, {n_features}")
    exp = jexport.export(jax.jit(fn), platforms=list(platforms))(
        state_spec,
        jax.ShapeDtypeStruct(x_shape, jnp.float32),
        jax.ShapeDtypeStruct((x_shape[0],), jnp.float32),
        jax.ShapeDtypeStruct((n_res,), jnp.float32),
        jax.ShapeDtypeStruct((n_res,), jnp.float32),
    )
    return exp.serialize()


def export_monitor_fleet_step(
    monitor, platforms: Sequence[str] = ("cpu", "tpu")
) -> bytes:
    """Serialize the monitor's VMAPPED fleet step — ``observe_many``'s
    device program — with BOTH the stream axis and the block size
    symbolic.

    Exported signature (symbolic ``s`` streams × ``b`` block)::

        (state bank tuple — each field with a leading s axis,
         x_raw f32[s,b,8], v_meas f32[s,b], mu f32[5], sigma f32[5])
          -> (state bank, outputs — every per-sample output (s,b,...))

    Rationale: a deserialized exported call cannot be re-vmapped, so a
    plain :func:`export_monitor_step` artifact advances a fleet
    sequentially — S relay round trips per poll where the checkpoint
    path pays one (serving/monitor.observe_many).  Baking the vmap INTO
    the artifact restores the one-dispatch fleet for artifact
    deployments: :func:`monitor_from_artifact` detects the extra input
    rank and routes ``observe_many`` through a single call (and single
    ``observe`` through the same program at s=1 — one compiled family
    serves both).  Mesh sharding stays checkpoint-only (an exported call
    cannot be sharded over a new mesh), so chips-scaled fleets still
    come from ``cli serve --ckpt --data-parallel``.

    Per-stream semantics are identical to S independent
    :func:`export_monitor_step` calls (streams never interact —
    parity-tested); state/recurrence contracts are as documented there.
    """
    from jax import export as jexport

    import numpy as np

    params = monitor.params
    step_fn = monitor._step_fn
    state_cls = type(monitor._fresh_state())
    vstep = jax.vmap(step_fn, in_axes=(None, 0, 0, 0, None, None))

    def fn(state_tuple, x_raw, v_meas, mu, sigma):
        new_state, outs = vstep(
            params, state_cls(*state_tuple), x_raw, v_meas, mu, sigma
        )
        return tuple(new_state), outs

    fresh = monitor._fresh_state()
    n_features = int(np.asarray(monitor.scaler_x.scale).shape[0])
    n_res = int(monitor.mu.shape[0])
    s, b = jexport.symbolic_shape("s, b")
    state_spec = tuple(
        jax.ShapeDtypeStruct((s,) + jnp.shape(a), jnp.asarray(a).dtype)
        for a in fresh
    )
    exp = jexport.export(jax.jit(fn), platforms=list(platforms))(
        state_spec,
        jax.ShapeDtypeStruct((s, b, n_features), jnp.float32),
        jax.ShapeDtypeStruct((s, b), jnp.float32),
        jax.ShapeDtypeStruct((n_res,), jnp.float32),
        jax.ShapeDtypeStruct((n_res,), jnp.float32),
    )
    return exp.serialize()


class _ArtifactDiagnosis(NamedTuple):
    """The one attribute the serving layer reads off a DiagnosisHead when
    fault outputs are present (server.py payload naming)."""

    class_names: Tuple[str, ...]


def monitor_from_artifact(
    blob: bytes,
    mu,
    sigma,
    config=None,
    glitch_alarm_n: int | None = None,
    class_names: Sequence[str] | None = None,
    conformal_alpha: float = 0.1,
):
    """Reconstruct a serving-ready monitor from an
    :func:`export_monitor_step` artifact — jax + this package's serving
    shell, but NO checkpoint and NO model/physics code: the compiled step
    IS the model.

    Returns an :class:`~pinnfc_tpu.serving.OnlineMonitor` subclass whose
    jitted step delegates to the deserialized StableHLO call; the state
    bank, HTTP server, snapshot/restore, and Prometheus surfaces are the
    inherited ones.  Accepts BOTH artifact shapes, detected from the input
    signature: a plain :func:`export_monitor_step` blob (``observe_many``
    falls back to per-stream sequential calls — an exported call cannot
    be re-vmapped) or an :func:`export_monitor_fleet_step` blob (the
    baked vmap restores the one-dispatch fleet; single ``observe`` rides
    the same program at s=1).  Mesh sharding stays checkpoint-only.

    ``config``/``glitch_alarm_n`` are DISPLAY-layer values (warn/danger
    thresholds at pack time; the artifact's baked values govern the device
    math) — pass the sidecar's recorded ``risk_config``/``glitch_alarm_n``
    to keep both layers consistent, as ``cli serve --artifact`` does.
    Whether a DiagnosisHead is baked in is detected from the artifact's
    output signature; ``class_names`` labels its classes (defaults to
    ``class_0..K-1`` when the sidecar carried none).
    """
    import numpy as np
    from jax import export as jexport

    from pinnfc_tpu.config import RiskConfig
    from pinnfc_tpu.serving.monitor import (
        DEFAULT_GLITCH_ALARM_N,
        STEP_OUT_FIELDS,
        STEP_SCHEMA_VERSIONS,
        MonitorState,
        OnlineMonitor,
        check_fleet_bank,
        contributing_layer_names,
    )

    exp = jexport.deserialize(blob)
    # reconstruct the output structure to find the state/layer/fault shapes
    # — and to verify this IS a monitor-step artifact (a scorer blob or a
    # foreign export has a different tree and must fail loudly, not with an
    # opaque unpacking TypeError).  Field tuples are append-only, so an
    # artifact exported by an OLDER framework carries a PREFIX of today's
    # fields (STEP_SCHEMA_VERSIONS) and still loads: missing outputs pack
    # as None, missing state fields carry through frozen at fresh values.
    try:
        out_struct = jax.tree_util.tree_unflatten(
            exp.out_tree, list(exp.out_avals)
        )
        state_avals, outs_avals = out_struct
        n_state, n_out = len(state_avals), len(outs_avals)
        if (n_state, n_out) not in STEP_SCHEMA_VERSIONS:
            raise TypeError
        n_layers = int(
            state_avals[MonitorState._fields.index("layer_c")].shape[-1]
        )
        probs_aval = outs_avals[STEP_OUT_FIELDS.index("fault")][0]
        # conformal_p is the v3 tail output: None when the exporting
        # monitor had no calibration vector, absent entirely pre-v3
        conf_idx = STEP_OUT_FIELDS.index("conformal_p")
        conf_aval = outs_avals[conf_idx] if n_out > conf_idx else None
        # raw-input width, for the drift counter: x_raw is the flat input
        # right after the n_state state leaves — (b, F) for a plain
        # monitor-step artifact, (s, b, F) for a fleet-step one (the rank
        # IS the detection: export_monitor_fleet_step)
        x_aval = exp.in_avals[n_state]
        if x_aval.ndim not in (2, 3):
            raise TypeError
        fleet = x_aval.ndim == 3
        n_features = int(x_aval.shape[-1])
    except (TypeError, ValueError, IndexError, AttributeError):
        raise ValueError(
            "not an `export-model --monitor-step` artifact: the output "
            "signature does not match the monitor block step (a plain "
            "scorer artifact loads with load_scorer instead)"
        ) from None
    config = RiskConfig() if config is None else config

    class ArtifactMonitor(OnlineMonitor):
        """OnlineMonitor whose device step is a deserialized artifact."""

        def __init__(self):
            # mirror the parent's attribute surface WITHOUT its
            # params/scaler machinery — the artifact baked all of that in
            self.params = None
            self.scaler_x = None
            self.scaler_y = None
            self.mu = jnp.asarray(mu, jnp.float32)
            self.sigma = jnp.asarray(sigma, jnp.float32)
            self.config = config
            self.glitch_alarm_n = int(
                DEFAULT_GLITCH_ALARM_N
                if glitch_alarm_n is None else glitch_alarm_n
            )
            if self.glitch_alarm_n < 1:
                raise ValueError(
                    f"glitch_alarm_n must be >= 1, got {self.glitch_alarm_n}"
                )
            if probs_aval is not None:
                k = int(probs_aval.shape[-1])
                names = (
                    tuple(class_names) if class_names
                    else tuple(f"class_{i}" for i in range(k))
                )
                if len(names) != k:
                    raise ValueError(
                        f"artifact bakes a {k}-class head but "
                        f"{len(names)} class names were given"
                    )
                self.diagnosis = _ArtifactDiagnosis(names)
            else:
                self.diagnosis = None
            # layer names are display labels; lengths must match the baked
            # layer_c state width (same rule as OnlineMonitor)
            self.layer_names = contributing_layer_names(config)
            if len(self.layer_names) != n_layers:
                raise ValueError(
                    f"artifact carries {n_layers} risk layers but the given "
                    f"config defines {len(self.layer_names)} — pass the "
                    "risk config recorded in the artifact's sidecar"
                )
            # the calibration vector itself is baked into the artifact;
            # the α threshold is a display/counter value like the risk
            # config — pass the sidecar's recorded conformal_alpha
            self.conformal_calib = None
            self.conformal_baked = conf_aval is not None
            if not 0.0 < conformal_alpha < 1.0:
                raise ValueError(
                    f"conformal_alpha must be in (0, 1), got {conformal_alpha}"
                )
            self.conformal_alpha = float(conformal_alpha)
            self._n_features = n_features
            self._streams = {"default": self._fresh_state()}
            self._n_seen = {"default": 0}
            self._low_p = {"default": 0}

            self.fleet_baked = fleet
            if fleet:
                # the artifact IS observe_many's vmapped program — drive
                # a single stream through it at s=1 (same compiled
                # family, symbolic on both axes) and the whole bank
                # through it directly
                def step_fn(params, state, x_raw, v_meas, mu_, sigma_):
                    st = tuple(
                        jnp.asarray(a)[None] for a in tuple(state)[:n_state]
                    )
                    new_state, outs = exp.call(
                        st, x_raw[None], v_meas[None], mu_, sigma_
                    )
                    new_state = MonitorState(
                        *(a[0] for a in new_state), *tuple(state)[n_state:]
                    )
                    outs = jax.tree_util.tree_map(lambda a: a[0], outs)
                    return new_state, outs

                def vstep_fn(params, bank, x_in, v_in, mu_, sigma_):
                    new_bank, outs = exp.call(
                        tuple(bank)[:n_state], x_in, v_in, mu_, sigma_
                    )
                    new_bank = MonitorState(
                        *new_bank, *tuple(bank)[n_state:]
                    )
                    return new_bank, outs

                # pre-jitted: the parent's observe_many only builds a
                # vmapped _vstep when it is None (an exported call cannot
                # be re-vmapped)
                self._vstep = jax.jit(vstep_fn)
            else:
                def step_fn(params, state, x_raw, v_meas, mu_, sigma_):
                    # older artifacts bake a prefix of today's state
                    # fields: feed them the prefix, carry the rest through
                    # unchanged (a pre-drift artifact keeps oob_count
                    # frozen at zero)
                    new_state, outs = exp.call(
                        tuple(state)[:n_state], x_raw, v_meas, mu_, sigma_
                    )
                    new_state = MonitorState(
                        *new_state, *tuple(state)[n_state:]
                    )
                    return new_state, outs

                self._vstep = None

            self._step_fn = step_fn
            self._step = jax.jit(step_fn)
            self.mesh = None
            self._mesh_replicated = None

        def observe_many(self, x_bank, v_bank, streams) -> dict:
            if self._vstep is not None:
                # fleet-step artifact: the parent's one-dispatch path
                # (stacked host bank → single exp.call → unstack)
                return OnlineMonitor.observe_many(
                    self, x_bank, v_bank, streams
                )
            # a plain monitor-step artifact is not vmappable — advance the
            # fleet sequentially with identical semantics (streams never
            # interact); validate EVERYTHING first so a bad bank cannot
            # leave some streams advanced (same contract as the parent)
            streams, x_bank, v_bank = check_fleet_bank(
                x_bank, v_bank, streams
            )
            return {
                s: self.observe(x_bank[i], v_bank[i], stream=s)
                for i, s in enumerate(streams)
            }

    return ArtifactMonitor()


def load_scorer(blob: bytes) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]:
    """Deserialize an :func:`export_scorer` artifact into a callable.

    Needs only jax at load time — no checkpoint, no model code.  The
    callable is jitted (jax.export's ``.call`` composes with jit) and
    accepts any batch size.
    """
    from jax import export as jexport

    exp = jexport.deserialize(blob)
    return jax.jit(exp.call)
