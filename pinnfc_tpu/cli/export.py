"""`export-model`: StableHLO artifact serialization (scorer, monitor
step, fleet step) with the provenance sidecar."""

from __future__ import annotations

import json
import os
import sys

from pinnfc_tpu.cli._common import (
    _glitch_default,
    _streaming_conformal_calib,
)


def cmd_export_model(args) -> int:
    """Serialize the checkpoint's eval-mode scorer into a self-contained
    StableHLO artifact (serving/exported.py): MLP weights and both MinMax
    scalers baked in as constants, symbolic batch dimension, lowered for
    every requested platform in one file (default cpu,tpu — jax.export
    cross-lowers without the hardware present).  The whole command runs on
    the CPU backend, so it works while the accelerator relay is
    unreachable; the artifact still targets TPU."""
    import pinnfc_tpu
    from pinnfc_tpu.serving.exported import export_scorer
    from pinnfc_tpu.utils import load_checkpoint, load_checkpoint_meta

    platforms = tuple(
        p.strip() for p in args.platforms.split(",") if p.strip()
    )
    if not platforms:
        print("--platforms must name at least one target", file=sys.stderr)
        return 2
    if getattr(args, "head", None) and not getattr(args, "monitor_step", False):
        # the plain scorer has no diagnosis output; silently dropping the
        # head would only be discovered at serve time
        print("--head requires --monitor-step (the scorer artifact has no "
              "fault-typing output)", file=sys.stderr)
        return 2
    if (getattr(args, "conformal_mat", None)
            and not getattr(args, "monitor_step", False)):
        print("--conformal-mat requires --monitor-step (the scorer artifact "
              "has no p-value output)", file=sys.stderr)
        return 2
    if (getattr(args, "conformal_gamma", None)
            and not getattr(args, "conformal_mat", None)):
        print("--conformal-gamma requires --conformal-mat (there is no "
              "p-value to adapt the level against)", file=sys.stderr)
        return 2
    if (getattr(args, "fleet_step", False)
            and not getattr(args, "monitor_step", False)):
        print("--fleet-step requires --monitor-step (the scorer artifact "
              "has no stream state to vmap over)", file=sys.stderr)
        return 2

    # pin the CPU backend for the load + trace + lowering (relay-outage
    # proof; jax.export cross-lowers the tpu target), restoring the prior
    # setting afterwards — an in-process caller (tests, orchestration) must
    # not be left flipped to CPU (same pattern as cmd_inspect)
    import jax

    unset = object()
    prev_platforms = unset
    try:
        prev_platforms = jax.config.jax_platforms
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        prev_platforms = unset  # best effort
    try:
        return _export_model_pinned(args, platforms)
    finally:
        if prev_platforms is not unset:
            jax.config.update("jax_platforms", prev_platforms)


def _export_model_pinned(args, platforms) -> int:
    import pinnfc_tpu
    from pinnfc_tpu.serving.exported import export_scorer
    from pinnfc_tpu.utils import load_checkpoint, load_checkpoint_meta

    ckpt = load_checkpoint(args.ckpt)
    if "scaler_x" not in ckpt or "scaler_y" not in ckpt:
        print(f"{args.ckpt} has no stored scalers — cannot build the "
              "raw-units scorer", file=sys.stderr)
        return 2
    if getattr(args, "monitor_step", False):
        # the full streaming RF(t) block step; μ/σ are runtime inputs in
        # the exported signature, so placeholder stats suffice here
        import numpy as np

        from pinnfc_tpu.serving import DiagnosisHead, OnlineMonitor
        from pinnfc_tpu.serving.exported import export_monitor_step
        from pinnfc_tpu.serving.monitor import MonitorState

        head = (
            DiagnosisHead.load(args.head)
            if getattr(args, "head", None) else None
        )
        glitch_n = getattr(args, "glitch_alarm_n", None)
        conformal_calib = None
        conformal_alpha = getattr(args, "conformal_alpha", None)
        conformal_alpha = 0.1 if conformal_alpha is None else conformal_alpha
        if getattr(args, "conformal_mat", None):
            # bake calibrated anomaly p-values into the artifact: the
            # sorted normal-row |res| scores become step constants like
            # the scalers (serve-time attachment is impossible — see
            # `cli serve --conformal` rejection for artifacts)
            from pinnfc_tpu.data import load_comprehensive_results

            conformal_calib = _streaming_conformal_calib(
                load_comprehensive_results(args.conformal_mat).array,
                conformal_alpha,
            )
        monitor = OnlineMonitor(
            ckpt["params"], ckpt["scaler_x"], ckpt["scaler_y"],
            mu=np.zeros(5, np.float32), sigma=np.ones(5, np.float32),
            diagnosis=head,
            glitch_alarm_n=(
                glitch_n if glitch_n is not None else _glitch_default()
            ),
            conformal_calib=conformal_calib,
            conformal_alpha=conformal_alpha,
            conformal_gamma=getattr(args, "conformal_gamma", None) or 0.0,
        )
        if getattr(args, "fleet_step", False):
            # observe_many's vmapped program, symbolic on BOTH axes —
            # artifact deployments keep the one-dispatch fleet
            from pinnfc_tpu.serving.exported import export_monitor_fleet_step

            blob = export_monitor_fleet_step(monitor, platforms=platforms)
            signature = (
                "(state bank tuple "
                + "/".join(MonitorState._fields)
                + " each leading s, f32[s,b,8] raw sensors, f32[s,b] "
                  "v_meas, f32[5] mu, f32[5] sigma) -> (state bank, outputs)"
            )
        else:
            blob = export_monitor_step(monitor, platforms=platforms)
            signature = (
                "(state tuple "
                + "/".join(MonitorState._fields)
                + ", f32[b,8] raw sensors, f32[b] v_meas, f32[5] mu, "
                  "f32[5] sigma) -> (state, outputs)"
            )
    else:
        blob = export_scorer(
            ckpt["params"], ckpt["scaler_x"], ckpt["scaler_y"],
            platforms=platforms,
        )
        signature = "f32[b,8] raw sensors -> (f32[b] v_pred, f32[b] log_var)"
    with open(args.out, "wb") as f:
        f.write(blob)
    # provenance sidecar, same convention as checkpoints (.meta.json)
    sidecar = {
        "kind": ("pinnfc_monitor_step_stablehlo"
                 if getattr(args, "monitor_step", False)
                 else "pinnfc_scorer_stablehlo"),
        "platforms": list(platforms),
        "framework_version": pinnfc_tpu.__version__,
        "signature": signature,
        "checkpoint": os.path.abspath(args.ckpt),
        "checkpoint_meta": load_checkpoint_meta(args.ckpt),
    }
    if getattr(args, "monitor_step", False):
        # record the values BAKED into the step so a deployment can tell
        # which sensor_alarm/risk behavior the artifact carries (all
        # RiskConfig fields are tuples/scalars — JSON-clean)
        import dataclasses

        sidecar["glitch_alarm_n"] = monitor.glitch_alarm_n
        sidecar["fleet_step"] = bool(getattr(args, "fleet_step", False))
        sidecar["risk_config"] = dataclasses.asdict(monitor.config)
        sidecar["diagnosis_head"] = (
            os.path.abspath(args.head) if getattr(args, "head", None)
            else None
        )
        sidecar["class_names"] = (
            list(head.class_names) if head is not None else None
        )
        if monitor.conformal_calib is not None:
            # which calibration the baked p-values carry (the α is a
            # serve-time display/counter value, recorded for adoption; γ
            # is baked into the device recurrence — recorded so a
            # deployment can tell whether α_t adapts)
            sidecar["conformal_alpha"] = monitor.conformal_alpha
            sidecar["conformal_gamma"] = monitor.conformal_gamma
            sidecar["conformal_n_calib"] = int(monitor.conformal_calib.size)
            sidecar["conformal_source"] = os.path.abspath(args.conformal_mat)
    with open(args.out + ".meta.json", "w") as f:
        json.dump(sidecar, f, indent=2)
    what = ("monitor step" if getattr(args, "monitor_step", False)
            else "scorer")
    print(f"{what} ({','.join(platforms)}; any batch size) → {args.out} "
          f"({len(blob):,} bytes)")
    return 0
