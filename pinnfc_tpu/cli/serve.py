"""Streaming surface: `monitor` (artifact replay through OnlineMonitor)
and `serve` (the HTTP endpoint)."""

from __future__ import annotations

import json
import sys

from pinnfc_tpu.cli._common import (
    _glitch_default,
    _print_ckpt_provenance,
    _streaming_conformal_calib,
)


def _monitor_fleet(monitor, results, block: int) -> int:
    """Streaming fleet replay: every (current, fault) risk condition of
    04:145-161 as a concurrent stream, one vmapped observe_many dispatch
    per lockstep block (sharded over the mesh with --data-parallel)."""
    import numpy as np

    from pinnfc_tpu.serving import fleet_replay

    table = fleet_replay(monitor, results, block=block)
    if not table:
        print("no risk conditions present in this artifact")
        return 1
    print(
        f"fleet replay: {len(table)} conditions as concurrent streams "
        f"(block {block})"
    )
    fmt = "none"
    print(f"{'fault':<14}{'I[A]':>6}{'n':>7}{'warn':>7}{'danger':>8}"
          f"{'v_alarm':>9}{'advance':>9}  driver")
    for r in table:
        driver = ""
        if r.layer_shares:
            name = max(r.layer_shares, key=r.layer_shares.get)
            driver = f"{name} {r.layer_shares[name]:.0%}"
        print(
            f"{r.fault_name:<14}{r.current_target:>6g}{r.n_samples:>7}"
            f"{fmt if r.first_warn is None else r.first_warn:>7}"
            f"{fmt if r.first_danger is None else r.first_danger:>8}"
            f"{fmt if r.first_v_alarm is None else r.first_v_alarm:>9}"
            f"{fmt if r.advance is None else r.advance:>9}  {driver}"
        )
    warned = [r for r in table if r.advance is not None]
    if warned:
        mean_adv = np.mean([r.advance for r in warned])
        print(f"mean RF lead over the voltage alarm: {mean_adv:.0f} samples "
              f"({len(warned)}/{len(table)} conditions with both alarms)")
    return 0


def cmd_monitor(args) -> int:
    """Streaming replay: feed a comprehensive_results artifact through the
    OnlineMonitor block by block, as a deployed scorer would consume live
    measurements; print the first warn/danger/voltage alarms."""
    import numpy as np

    if getattr(args, "fleet", False) and getattr(args, "conformal", False):
        # the fleet table has no p-value column — baking the calib vector
        # in would silently change nothing the user sees (same policy as
        # --fleet --whatif below); validated before any loading happens
        print("--conformal applies to a single-stream replay (the fleet "
              "table has no p-value column); drop --fleet, or stream "
              "conformal_p per sample via `cli serve --conformal`",
              file=sys.stderr)
        return 2
    conformal_gamma = getattr(args, "conformal_gamma", 0.0) or 0.0
    if conformal_gamma and not getattr(args, "conformal", False):
        print("--conformal-gamma needs --conformal (there is no p-value "
              "to adapt the level against)", file=sys.stderr)
        return 2

    from pinnfc_tpu.config import RiskConfig
    from pinnfc_tpu.data import load_comprehensive_results
    from pinnfc_tpu.data.contract import INDEX
    from pinnfc_tpu.risk import estimate_mu_sigma_normal
    from pinnfc_tpu.serving import OnlineMonitor

    results = load_comprehensive_results(args.mat)
    arr = results.array
    cfg = RiskConfig()
    mu, sigma = estimate_mu_sigma_normal(arr)
    head = None
    want_head = (getattr(args, "diagnose", False)
                 or getattr(args, "head", None)
                 or getattr(args, "save_head", None))
    if want_head:  # --head/--save-head imply diagnosis
        # classify the stream's fault type online with script 03's
        # calibrated GMM; reuse a fit handed in by run-all (its gmm stage
        # already ran on this artifact) instead of refitting
        from pinnfc_tpu.serving import DiagnosisHead

        if getattr(args, "head", None):
            head = DiagnosisHead.load(args.head)
        else:
            gmm_result = getattr(args, "gmm_result", None)
            if gmm_result is None:
                from pinnfc_tpu.diagnosis import run_gmm_pipeline

                gmm_result = run_gmm_pipeline(results)
            head = DiagnosisHead.from_gmm_result(gmm_result)
        if getattr(args, "save_head", None):
            written = head.save(args.save_head)
            print(f"diagnosis head → {written}")
    glitch_n = getattr(args, "glitch_alarm_n", None)
    mesh = None
    if getattr(args, "data_parallel", False):
        import jax

        from pinnfc_tpu.parallel import make_mesh

        if jax.device_count() > 1:
            mesh = make_mesh(jax.device_count())
            print(f"fleet sharding: streams over {jax.device_count()} devices")
    conformal_calib = None
    conformal_alpha = getattr(args, "conformal_alpha", 0.1)
    if getattr(args, "conformal", False):
        conformal_calib = _streaming_conformal_calib(arr, conformal_alpha)
    _print_ckpt_provenance(args.ckpt)
    monitor = OnlineMonitor.from_checkpoint(
        args.ckpt, mu, sigma, cfg, head,
        glitch_alarm_n=glitch_n if glitch_n is not None else _glitch_default(),
        mesh=mesh,
        conformal_calib=conformal_calib, conformal_alpha=conformal_alpha,
        conformal_gamma=conformal_gamma,
    )

    if getattr(args, "fleet", False):
        if getattr(args, "whatif", False):
            print("--whatif applies to a single-stream replay; for the "
                  "per-condition analysis over the whole fleet use "
                  "`cli whatif`", file=sys.stderr)
            return 2
        return _monitor_fleet(monitor, results, args.block)

    rows = arr
    if args.fault_label is not None:
        # replay one fault segment preceded by its lead-in normal rows
        mask = arr[:, INDEX["label"]] == args.fault_label
        lead = arr[arr[:, INDEX["label"]] == 0][-args.lead :]
        rows = np.vstack([lead, arr[mask]])

    x_raw = rows[:, 0:8]
    v_meas = rows[:, INDEX["y_true"]]
    first = {"warn": None, "danger": None, "v_alarm": None}
    diag_counts = None
    warn_shares = None  # exact attribution at the first warn (layer_c)
    # [normal, fault] × [finite-p samples, p<α samples] over the replay
    conf_counts = np.zeros((2, 2), np.int64)
    pos = 0
    while pos < len(rows):
        out = monitor.observe(
            x_raw[pos : pos + args.block], v_meas[pos : pos + args.block]
        )
        if out.conformal_p is not None:
            p_blk = np.asarray(out.conformal_p)
            is_fault = rows[pos : pos + args.block, INDEX["label"]] > 0
            for grp in (0, 1):
                sel = np.isfinite(p_blk) & (is_fault == bool(grp))
                conf_counts[grp] += (
                    int(sel.sum()),
                    # tie-inclusive, like the monitor's own counter: the
                    # duality is covered ⟺ p > α
                    int((p_blk[sel] <= monitor.conformal_alpha).sum()),
                )
        for name, flags in (
            ("warn", out.warn), ("danger", out.danger), ("v_alarm", out.v_alarm)
        ):
            if first[name] is None and flags.any():
                first[name] = pos + int(np.argmax(flags))
        if head is not None and out.warn.any():
            # accumulate the online fault-type votes while the RF warns;
            # glitched samples carry fault_pred = -1 (no valid posterior)
            # and must not vote
            valid = out.warn & (np.asarray(out.fault_pred) >= 0)
            votes = np.bincount(out.fault_pred[valid],
                                minlength=len(head.class_names))
            diag_counts = votes if diag_counts is None else diag_counts + votes
        if warn_shares is None and out.warn.any():
            # the monitor carries the per-layer risk integral C_l (exact
            # λ-decay attribution, Σ_l C_l ≡ C — same semantics as cli
            # risk's "driver" column): read the composition at first warn
            i = int(np.argmax(out.warn))
            row = np.asarray(out.layer_c)[i]
            if np.isfinite(row).all() and row.sum() > 0:
                warn_shares = row / row.sum()
        pos += args.block
    print(
        f"streamed {len(rows)} samples in blocks of {args.block}: "
        f"first warn={first['warn']}  danger={first['danger']}  "
        f"voltage alarm={first['v_alarm']}"
    )
    if first["warn"] is not None and first["v_alarm"] is not None:
        print(f"RF lead over voltage alarm: {first['v_alarm'] - first['warn']} samples")
    if warn_shares is not None:
        breakdown = "  ".join(
            f"{n} {s:.0%}" for n, s in zip(monitor.layer_names, warn_shares)
        )
        print(f"risk attribution at first warn: {breakdown}")
    if diag_counts is not None:
        name = head.class_names[int(np.argmax(diag_counts))]
        share = diag_counts.max() / max(diag_counts.sum(), 1)
        print(f"online diagnosis while warned: {name} ({share:.0%} of votes)")
    if conf_counts.sum():
        # calibrated anomaly rate: ≈α on exchangeable (normal) rows by the
        # coverage guarantee; the fault-row excess IS the detection signal
        parts = []
        for grp, tag in ((0, "normal"), (1, "fault")):
            n, low = conf_counts[grp]
            if n:
                parts.append(f"{tag} {low / n:.1%} (n={n})")
        print(
            f"conformal anomaly rate (p≤{monitor.conformal_alpha:g}): "
            + "  ".join(parts)
        )
        if conformal_gamma:
            # the adaptive level after the replay IS the drift verdict:
            # ≈α* = the stream still matches the calibration campaign
            a_t = monitor.stream_aci_alpha()
            print(f"adaptive conformal level after replay: α_t={a_t:.4f} "
                  f"(target α*={monitor.conformal_alpha:g}, γ="
                  f"{conformal_gamma:g}; α_t well below α* = the score "
                  f"distribution has shifted)")
    oob = monitor.stream_oob_counts()
    if oob.sum() > 0:
        # input-range drift: the replayed campaign left the checkpoint's
        # training box on these channels (the model extrapolated there)
        from pinnfc_tpu.data.contract import channel_names

        n = monitor.stream_n_seen()
        names = channel_names(len(oob))
        top = "  ".join(
            f"{nm} {c / n:.1%}"
            for nm, c in sorted(zip(names, oob), key=lambda t: -t[1])
            if c > 0
        )
        print(f"input-range drift (outside training box): {top}")
    if getattr(args, "whatif", False) and first["v_alarm"] is not None:
        # close the loop prescriptively right here: the minimal actuation
        # whose predicted voltage gain covers the measured shortfall below
        # the stream's own dynamic alarm line (uq/counterfactual gain
        # mode; full per-condition analysis: cli whatif)
        from pinnfc_tpu.uq import counterfactual_recovery, summarize_recovery

        v_thr = float(monitor.state.v_first) - cfg.voltage_drop
        tail = np.arange(first["v_alarm"], len(rows))
        if len(tail) > 64:
            tail = tail[np.unique(
                np.linspace(0, len(tail) - 1, 64).round().astype(int)
            )]
        rep = counterfactual_recovery(
            monitor.params, x_raw[tail].astype(np.float32), v_thr,
            monitor.scaler_x, monitor.scaler_y, v_meas=v_meas[tail],
        )
        s = summarize_recovery(rep)
        if s["dominant"] is None:
            print("suggested actuation: none (measured voltage already "
                  "recoverable at the line)")
        else:
            d_phys = float(s["mean_delta_phys"][s["dominant_index"]])
            print(
                f"suggested actuation (model-gain counterfactual over "
                f"{len(tail)} alarmed rows): {s['dominant']} {d_phys:+.3g} "
                f"→ {s['recovered_frac']:.0%} recover the alarm line"
            )
    return 0


def cmd_serve(args) -> int:
    """HTTP scoring endpoint: OnlineMonitor behind POST /observe
    (serving/server.py). Normal statistics come from the artifact, the
    model from either a checkpoint (``--ckpt``, + optional ``--head``) or
    a self-contained ``export-model --monitor-step`` StableHLO artifact
    (``--artifact`` — no model code or checkpoint needed; the baked risk
    config / glitch threshold / class names are adopted from its
    sidecar)."""
    from pinnfc_tpu.config import RiskConfig
    from pinnfc_tpu.data import load_comprehensive_results
    from pinnfc_tpu.risk import estimate_mu_sigma_normal
    from pinnfc_tpu.serving import DiagnosisHead, OnlineMonitor, serve

    artifact = getattr(args, "artifact", None)
    if bool(artifact) == bool(args.ckpt):
        print("serve needs exactly one of --ckpt or --artifact",
              file=sys.stderr)
        return 2
    if artifact and args.head:
        print("--head is baked into a --monitor-step artifact at export "
              "time; it cannot be attached at serve time", file=sys.stderr)
        return 2
    if artifact and getattr(args, "glitch_alarm_n", None) is not None:
        print("--glitch-alarm-n is baked into the artifact's device "
              "recurrence at export time (`export-model --glitch-alarm-n`); "
              "passing it at serve time would silently have no effect",
              file=sys.stderr)
        return 2
    if artifact and getattr(args, "conformal", False):
        print("--conformal calibration is baked into a --monitor-step "
              "artifact at export time (`export-model --conformal-mat`); "
              "it cannot be attached at serve time", file=sys.stderr)
        return 2
    if artifact and getattr(args, "conformal_gamma", None) is not None:
        print("--conformal-gamma is baked into the artifact's device "
              "recurrence at export time (`export-model --conformal-gamma`);"
              " passing it at serve time would silently have no effect",
              file=sys.stderr)
        return 2
    if (not artifact and getattr(args, "conformal_gamma", None)
            and not getattr(args, "conformal", False)):
        print("--conformal-gamma needs --conformal (there is no p-value "
              "to adapt the level against)", file=sys.stderr)
        return 2

    arr = load_comprehensive_results(args.mat).array
    mu, sigma = estimate_mu_sigma_normal(arr)
    glitch_n = getattr(args, "glitch_alarm_n", None)
    mesh = None
    if getattr(args, "data_parallel", False):
        import jax

        from pinnfc_tpu.parallel import make_mesh

        if artifact:
            print("--data-parallel needs the checkpoint path (an exported "
                  "call cannot be vmapped across streams)", file=sys.stderr)
            return 2
        if jax.device_count() > 1:
            mesh = make_mesh(jax.device_count())
            print(f"fleet sharding: streams over {jax.device_count()} devices")

    if artifact:
        from pinnfc_tpu.config import risk_config_from_dict
        from pinnfc_tpu.serving import monitor_from_artifact

        sidecar = None
        try:
            with open(artifact + ".meta.json") as f:
                sidecar = json.load(f)
        except (OSError, ValueError):
            print(f"note: no readable sidecar at {artifact}.meta.json — "
                  "serving with default display config", file=sys.stderr)
        cfg = RiskConfig()
        side_glitch = None
        class_names = None
        provenance = None
        side_conf_alpha = None
        if sidecar:
            if sidecar.get("kind") != "pinnfc_monitor_step_stablehlo":
                print(f"{artifact} is a {sidecar.get('kind')!r} artifact — "
                      "serve needs an `export-model --monitor-step` one",
                      file=sys.stderr)
                return 2
            if isinstance(sidecar.get("risk_config"), dict):
                cfg = risk_config_from_dict(sidecar["risk_config"])
            side_glitch = sidecar.get("glitch_alarm_n")
            class_names = sidecar.get("class_names")
            side_conf_alpha = sidecar.get("conformal_alpha")
            provenance = sidecar.get("checkpoint_meta") or None
            if provenance:
                provenance = {
                    k: provenance[k]
                    for k in ("created", "framework_version")
                    if k in provenance
                } or None
        monitor = monitor_from_artifact(
            open(artifact, "rb").read(), mu, sigma, config=cfg,
            glitch_alarm_n=(
                glitch_n if glitch_n is not None
                else side_glitch if side_glitch is not None
                else _glitch_default()
            ),
            class_names=class_names,
            conformal_alpha=(
                getattr(args, "conformal_alpha", None)
                if getattr(args, "conformal_alpha", None) is not None
                else side_conf_alpha if side_conf_alpha is not None
                else 0.1
            ),
        )
        print(f"serving from StableHLO artifact {artifact}"
              + (" (conformal p-values baked in)"
                 if getattr(monitor, "conformal_baked", False) else "")
              + (" (fleet step: /observe_many is one dispatch)"
                 if getattr(monitor, "fleet_baked", False) else ""))
    else:
        head = DiagnosisHead.load(args.head) if args.head else None
        provenance = _print_ckpt_provenance(args.ckpt)
        conformal_calib = None
        conformal_alpha = getattr(args, "conformal_alpha", None)
        conformal_alpha = 0.1 if conformal_alpha is None else conformal_alpha
        if getattr(args, "conformal", False):
            # calibrated anomaly p-values: normal-row |res| scores from
            # the SAME artifact the mu/sigma statistics come from
            conformal_calib = _streaming_conformal_calib(arr, conformal_alpha)
        monitor = OnlineMonitor.from_checkpoint(
            args.ckpt, mu, sigma, RiskConfig(), head,
            glitch_alarm_n=(
                glitch_n if glitch_n is not None else _glitch_default()
            ),
            mesh=mesh,
            conformal_calib=conformal_calib,
            conformal_alpha=conformal_alpha,
            conformal_gamma=getattr(args, "conformal_gamma", None) or 0.0,
        )
    serve(monitor, host=args.host, port=args.port,
          max_requests=args.max_requests,
          state_path=getattr(args, "state_path", None),
          provenance=provenance)
    return 0
