"""Explainability subcommands: `identify` (lambda identifiability),
`explain` (input saliency), `whatif` (counterfactual recovery),
`inspect` (checkpoint introspection)."""

from __future__ import annotations

import json
import os
import sys

from pinnfc_tpu.cli._common import _print_lambda_table


def cmd_identify(args) -> int:
    """Identifiability analysis of the 17 physics λ's (uq/identifiability):
    Gauss-Newton 95% CIs from each training stage's own residual Jacobian
    at the trained optimum, plus per-parameter sensitivity, at-bound and
    unidentifiable flags.  Formally surfaces the reference's two dead
    parameters (the λ4 name-shadowing of 01:468 and the unused oxygen λ4)
    as zero-sensitivity columns."""
    import numpy as np

    from pinnfc_tpu.data import load_comprehensive_results
    from pinnfc_tpu.data.contract import INDEX
    from pinnfc_tpu.uq import lambda_identifiability
    from pinnfc_tpu.utils import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    if "scaler_x" not in ckpt or "scaler_y" not in ckpt:
        print(f"{args.ckpt} has no stored scalers — cannot normalize the "
              "artifact rows", file=sys.stderr)
        return 2
    results = load_comprehensive_results(args.mat)
    x_raw = results.array[:, [INDEX[f"x{i}"] for i in range(8)]]
    x_norm = np.asarray(
        ckpt["scaler_x"].transform(x_raw.astype(np.float32)), np.float32
    )
    mesh = None
    if getattr(args, "data_parallel", False):
        import jax

        from pinnfc_tpu.parallel import make_mesh

        mesh = make_mesh(jax.device_count())
        print(f"residual Jacobians data-parallel over "
              f"{jax.device_count()} devices")
    report = lambda_identifiability(
        ckpt["params"], x_norm, ckpt["scaler_x"], ckpt["scaler_y"],
        mesh=mesh,
    )

    if getattr(args, "plot_dir", None):
        from pinnfc_tpu.viz import plot_identifiability

        os.makedirs(args.plot_dir, exist_ok=True)
        plot_identifiability(
            report, os.path.join(args.plot_dir, "identifiability.png")
        )
        print(f"figure → {args.plot_dir}/identifiability.png")

    if getattr(args, "json", False):
        import math

        def clean(xs):
            # strict JSON (same convention as the serving surface): an
            # unidentifiable parameter's inf stderr/CI becomes null
            return [x if math.isfinite(x) else None for x in xs]

        out = {
            g: {
                "names": list(gi.names),
                "values": gi.values.tolist(),
                "stderr": clean(gi.stderr.tolist()),
                "ci95": [clean(gi.ci_lo.tolist()), clean(gi.ci_hi.tolist())],
                "sensitivity": gi.sensitivity.tolist(),
                "identifiable": gi.identifiable.tolist(),
                "at_bound": gi.at_bound.tolist(),
                "corr": [clean(row) for row in gi.corr.tolist()],
                "n_residuals": gi.n_residuals,
                "n_dropped": gi.n_dropped,
                "dof": gi.dof,
                "sigma2": gi.sigma2,
            }
            for g, gi in report.items()
        }
        print(json.dumps(out, indent=2, ensure_ascii=False,
                         allow_nan=False))
        return 0

    print(f"identifiability over {results.array.shape[0]} artifact rows "
          "(Gauss-Newton 95% CIs at the trained optimum):")
    for g, gi in report.items():
        dropped = f", {gi.n_dropped} non-finite rows dropped" if gi.n_dropped else ""
        print(f"{g}  (N={gi.n_residuals}, σ̂²={gi.sigma2:.4g}{dropped})")
        for i, name in enumerate(gi.names):
            if not gi.identifiable[i]:
                tail = "UNIDENTIFIABLE (zero sensitivity — loss never sees it)"
            else:
                tail = (f"± {1.959964 * gi.stderr[i]:<12.4g} "
                        f"sens {gi.sensitivity[i]:.3g}")
                if gi.at_bound[i]:
                    tail += "  AT-BOUND (clamp active; CI not meaningful)"
            print(f"  {g}[{i}] = {gi.values[i]:<12.6g} {tail}")
            print(f"           {name}")
        # sloppy directions: pairs the loss only constrains JOINTLY
        k = len(gi.names)
        for i in range(k):
            for j in range(i + 1, k):
                c = gi.corr[i, j]
                if np.isfinite(c) and abs(c) > 0.95:
                    print(f"  coupled: {g}[{i}] ↔ {g}[{j}] "
                          f"(corr {c:+.3f} — only jointly identified)")
    return 0


def cmd_explain(args) -> int:
    """Input-channel saliency of the trained model (uq/saliency): per
    fault class, which of the 8 measured inputs the voltage prediction —
    and its aleatoric uncertainty — leans on.  Complements the risk
    table's physics-layer attribution (which residual fired) with the
    model-level view (which sensor moves the prediction); units are volts
    per full training-range swing of the channel, so columns compare."""
    import numpy as np

    from pinnfc_tpu.data import load_comprehensive_results
    from pinnfc_tpu.data.contract import INDEX, INPUT_CHANNELS
    from pinnfc_tpu.uq import coarse_class_saliency, input_saliency
    from pinnfc_tpu.utils import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    if "scaler_x" not in ckpt or "scaler_y" not in ckpt:
        print(f"{args.ckpt} has no stored scalers — cannot normalize the "
              "artifact rows", file=sys.stderr)
        return 2
    results = load_comprehensive_results(args.mat)
    x_raw = results.array[:, [INDEX[f"x{i}"] for i in range(8)]]
    mesh = None
    if getattr(args, "data_parallel", False):
        import jax

        from pinnfc_tpu.parallel import make_mesh

        mesh = make_mesh(jax.device_count())
        print(f"saliency data-parallel over {jax.device_count()} devices")
    report = input_saliency(
        ckpt["params"], x_raw, ckpt["scaler_x"], ckpt["scaler_y"],
        labels=results.labels, mesh=mesh,
    )
    table = coarse_class_saliency(report, "jac_range")
    sigma_table = coarse_class_saliency(report, "sigma_jac_range")

    plot_dir = getattr(args, "plot_dir", None)
    if plot_dir:
        from pinnfc_tpu.viz import plot_saliency

        os.makedirs(plot_dir, exist_ok=True)
        plot_saliency(table, INPUT_CHANNELS,
                      os.path.join(plot_dir, "saliency_voltage.png"))
        plot_saliency(sigma_table, INPUT_CHANNELS,
                      os.path.join(plot_dir, "saliency_sigma.png"),
                      unit="σ_a volts / full-range swing")
        print(f"figures → {plot_dir}/saliency_voltage.png, "
              f"{plot_dir}/saliency_sigma.png")

    if getattr(args, "json", False):
        out = {
            "unit": "V per full training-range swing",
            "channels": list(INPUT_CHANNELS),
            "n_rows": int(results.array.shape[0]),
            "classes": {
                name: {
                    "voltage": table[name].tolist(),
                    "sigma": sigma_table[name].tolist(),
                    "driver": INPUT_CHANNELS[int(np.argmax(table[name]))],
                }
                for name in table
            },
        }
        print(json.dumps(out, indent=2, ensure_ascii=False, allow_nan=False))
        return 0

    print(f"input-channel saliency over {results.array.shape[0]} artifact "
          "rows (mean |∂v̂/∂x| in volts per full training-range swing):")
    width = max(len(c) for c in INPUT_CHANNELS)
    header = "  ".join(f"{c:>{width}}" for c in INPUT_CHANNELS)
    print(f"{'class':<20} {header}  driver")
    for name, row in table.items():
        cells = "  ".join(f"{v:>{width}.3g}" for v in row)
        driver = INPUT_CHANNELS[int(np.argmax(row))]
        print(f"{name:<20} {cells}  {driver}")
    print("aleatoric-σ saliency (same units):")
    for name, row in sigma_table.items():
        cells = "  ".join(f"{v:>{width}.3g}" for v in row)
        driver = INPUT_CHANNELS[int(np.argmax(row))]
        print(f"{name:<20} {cells}  {driver}")
    return 0


def cmd_whatif(args) -> int:
    """Counterfactual recovery (uq/counterfactual): for every alarmed risk
    condition of the `cli risk` table (04:145-161, dynamic threshold
    04:389), the minimal actuation — within the training range, frozen
    channels excluded — whose model-predicted voltage GAIN covers the
    measured shortfall below the alarm line (default; --absolute-target
    targets the model's own prediction instead — see the
    uq/counterfactual module docstring for why gain is the right
    question for a residual-based detector).  The prescriptive member of
    the explainability trio: risk says WHEN and which physics layer,
    explain says which sensor the prediction leans on, whatif says WHAT
    TO TURN."""
    import numpy as np

    from pinnfc_tpu.data import load_comprehensive_results
    from pinnfc_tpu.data.contract import INPUT_CHANNELS
    from pinnfc_tpu.uq import (
        CounterfactualConfig,
        condition_recovery,
        summarize_recovery,
    )
    from pinnfc_tpu.utils import load_checkpoint

    ckpt = load_checkpoint(args.ckpt)
    if "scaler_x" not in ckpt or "scaler_y" not in ckpt:
        print(f"{args.ckpt} has no stored scalers — cannot normalize the "
              "artifact rows", file=sys.stderr)
        return 2
    results = load_comprehensive_results(args.mat)
    cfg = CounterfactualConfig(
        steps=args.steps, lr=args.lr, alpha=args.alpha, margin=args.margin
    )
    actuate = args.actuate.split(",") if args.actuate else None
    target = "absolute" if getattr(args, "absolute_target", False) else "gain"
    mesh = None
    if getattr(args, "data_parallel", False):
        import jax

        from pinnfc_tpu.parallel import make_mesh

        mesh = make_mesh(jax.device_count())
        print(f"recovery solve data-parallel over {jax.device_count()} devices")
    recs = condition_recovery(
        results, ckpt["params"], ckpt["scaler_x"], ckpt["scaler_y"],
        config=cfg, actuatable=actuate, max_rows=args.max_rows,
        target=target, mesh=mesh,
    )

    summaries = {}
    for r in recs:
        if r.report is not None:
            summaries[f"{r.current_target:.0f}A {r.fault_name}"] = (
                summarize_recovery(r.report)
            )

    def _mean_short(r):
        """Mean measured shortfall below the alarm line over solved rows."""
        if r.report is None or r.report.v_meas is None:
            return None
        return float(
            np.maximum(0.0, r.report.v_target - r.report.v_meas).mean()
        )

    if getattr(args, "json", False):
        out = {
            "unit": "delta as fraction of the channel's training range",
            "target_mode": target,
            "channels": list(INPUT_CHANNELS),
            "conditions": [
                {
                    "fault": r.fault_name,
                    "current": r.current_target,
                    "v_threshold": r.v_threshold,
                    "alarmed": r.idx_v_alarm is not None,
                    "n_rows": r.n_rows,
                    **(
                        {"mean_short_v": s}
                        if (s := _mean_short(r)) is not None
                        else {}
                    ),
                    **(
                        {
                            "recovered_frac": summaries[key]["recovered_frac"],
                            "dominant": summaries[key]["dominant"],
                            "mean_delta_range":
                                summaries[key]["mean_delta_range"].tolist(),
                        }
                        if (key := f"{r.current_target:.0f}A {r.fault_name}")
                        in summaries
                        else {}
                    ),
                }
                for r in recs
            ],
        }
        print(json.dumps(out, indent=2, ensure_ascii=False, allow_nan=False))
        return 0

    mode_note = (
        "gain target: Δv̂ must cover the measured shortfall"
        if target == "gain"
        else "absolute target: v̂ itself must clear the line"
    )
    print("counterfactual recovery per risk condition (mean signed Δ, "
          f"fraction of training range; alarmed rows only; {mode_note}):")
    print(f"{'current':>8} {'fault':>20} {'rows':>5} {'short(V)':>8} "
          f"{'recovered':>9}  knob (Δ physical)")
    for r in recs:
        key = f"{r.current_target:.0f}A {r.fault_name}"
        if r.report is None:
            print(f"{r.current_target:8.0f} {r.fault_name:>20} {0:>5} "
                  f"{'-':>8} {'-':>9}  never alarmed")
            continue
        s = summaries[key]
        short = _mean_short(r)
        short_s = f"{short:8.3f}" if short is not None else f"{'-':>8}"
        knob = s["dominant"]
        if knob is None:
            detail = "no actuation needed"
        else:
            d_phys = float(s["mean_delta_phys"][s["dominant_index"]])
            detail = f"{knob} ({d_phys:+.3g})"
        print(f"{r.current_target:8.0f} {r.fault_name:>20} {r.n_rows:>5} "
              f"{short_s} {s['recovered_frac']:>9.0%}  {detail}")

    plot_dir = getattr(args, "plot_dir", None)
    if plot_dir and summaries:
        from pinnfc_tpu.viz import plot_whatif

        os.makedirs(plot_dir, exist_ok=True)
        table = {k: v["mean_delta_range"] for k, v in summaries.items()}
        plot_whatif(table, INPUT_CHANNELS,
                    os.path.join(plot_dir, "whatif_actuation.png"))
        print(f"figures → {plot_dir}/whatif_actuation.png")
    return 0


def cmd_inspect(args) -> int:
    """Describe a checkpoint without running anything: provenance metadata
    (training config / data sizes / final metrics from the .meta.json
    sidecar), the parameter tree with shapes and counts, and the stored
    normalization ranges.  Works while the accelerator relay is
    unreachable: the raw loader does no jnp conversions, and the process
    is pinned to the CPU backend (orbax's restore initializes the default
    backend — measured +10 s on a HEALTHY axon relay, a hang on a dead
    one) — introspection needs no device."""
    import numpy as np

    from pinnfc_tpu.utils.checkpoint import _flatten, load_checkpoint_raw

    unset = object()
    prev_platforms = unset
    try:
        import jax

        prev_platforms = jax.config.jax_platforms  # usually None (unset)
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        prev_platforms = unset  # backend already initialized: best effort
    try:
        ckpt = load_checkpoint_raw(args.ckpt)
    finally:
        if prev_platforms is not unset:
            jax.config.update("jax_platforms", prev_platforms)

    meta = ckpt.get("meta")
    flat = _flatten(ckpt["params"])
    total = int(sum(a.size for a in flat.values()))

    if getattr(args, "json", False):
        # machine-readable view for tooling (same content as the text form)
        from pinnfc_tpu.models.pinn import LAMBDA_NAMES

        out = {
            "meta": meta,
            "params": {p: {"shape": list(a.shape), "dtype": str(a.dtype)}
                       for p, a in flat.items()},
            "total_parameters": total,
            "lambdas": {
                g: {"values": np.asarray(ckpt["params"][g]).ravel().tolist(),
                    "names": list(names)}
                for g, names in LAMBDA_NAMES.items()
                if g in ckpt["params"]
            },
            "scalers": {
                name: {
                    "data_min": np.asarray(s["data_min"]).ravel().tolist(),
                    "data_max": np.asarray(s["data_max"]).ravel().tolist(),
                }
                for name in ("scaler_x", "scaler_y")
                if (s := ckpt.get(name)) is not None
            },
            "step": int(np.asarray(ckpt["step"])) if "step" in ckpt else None,
        }
        print(json.dumps(out, indent=2, ensure_ascii=False))
        return 0

    if meta is not None:
        print(json.dumps({"meta": meta}, indent=2, ensure_ascii=False))
    else:
        print("meta: none (checkpoint saved without a .meta.json sidecar)")

    # _flatten is the checkpoint's own flattener, so the printed paths are
    # exactly what the npz fallback stores
    print("params:")
    for path, arr in flat.items():
        print(f"  {path:40s} {str(arr.shape):14s} {arr.dtype}")
    print(f"  total: {total:,} parameters")

    _print_lambda_table(ckpt["params"])

    for name in ("scaler_x", "scaler_y"):
        s = ckpt.get(name)
        if s is None:
            print(f"{name}: absent")
            continue
        lo = np.asarray(s["data_min"]).ravel()
        hi = np.asarray(s["data_max"]).ravel()
        rng = ", ".join(f"[{a:.4g}, {b:.4g}]" for a, b in zip(lo, hi))
        print(f"{name}: {lo.size} features, training ranges {rng}")
    if "step" in ckpt:
        print(f"step: {int(np.asarray(ckpt['step']))}")
    return 0
