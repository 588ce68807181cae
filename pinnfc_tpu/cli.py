"""Command-line interface for the whole pipeline.

The reference has no CLI beyond script 02's argparse (02:446-453); every
stage here is a subcommand over the shared ``F01_output.mat`` contract:

    python -m pinnfc_tpu.cli train    --mat-out F01_output.mat [--small]
    python -m pinnfc_tpu.cli auc      --mat F01_output.mat
    python -m pinnfc_tpu.cli gmm      --mat F01_output.mat
    python -m pinnfc_tpu.cli risk     --mat F01_output.mat
    python -m pinnfc_tpu.cli compare  --mat F01_output.mat
    python -m pinnfc_tpu.cli run-all  --out-dir /tmp/out [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Optional

from pinnfc_tpu.config import StageConfig, TrainConfig


def _small_schedule():
    """Reduced schedule for quick verification runs (same stage order)."""
    return (
        StageConfig("dnn", 300, lr=0.01),
        StageConfig("lambda_v", 150, lr=1e-3, dnn_para=False),
        StageConfig("lambda_v", 150, lr=1e-3, dnn_para=True),
        StageConfig("dnn", 300, lr=0.01),
        StageConfig("thermal", 500, lr=1.0),
        StageConfig("hydrogen", 300, lr=0.1, lr_gamma=0.9),
        StageConfig("oxygen", 300, lr=0.01, lr_gamma=0.9),
    )


def _train_config(args) -> TrainConfig:
    import dataclasses as dc

    if args.small:
        cfg = TrainConfig(schedule=_small_schedule(), mc_times=200, seed=args.seed)
    else:
        cfg = TrainConfig(seed=args.seed)
    scale = getattr(args, "steps_scale", None)
    if scale:
        cfg = dc.replace(
            cfg,
            schedule=tuple(
                dc.replace(s, n_iter=max(1, int(s.n_iter * scale)))
                for s in cfg.schedule
            ),
        )
    precision = getattr(args, "precision", None)
    if precision:
        cfg = dc.replace(cfg, model=dc.replace(cfg.model, precision=precision))
    if getattr(args, "skip_nonfinite", False):
        cfg = dc.replace(cfg, skip_nonfinite=True)
    return cfg


def _glitch_default() -> int:
    from pinnfc_tpu.serving.monitor import DEFAULT_GLITCH_ALARM_N

    return DEFAULT_GLITCH_ALARM_N


def _print_ckpt_provenance(ckpt_path: str):
    """One line saying WHICH model is about to serve (from the .meta.json
    sidecar, if the checkpoint has one) — so serving logs identify the
    artifact the same way `cli inspect` does.  Returns the compact summary
    dict (or None) so `cli serve` can expose it on GET /health."""
    from pinnfc_tpu.utils import load_checkpoint_meta

    meta = load_checkpoint_meta(ckpt_path)
    if meta is None:
        return None
    summary = {}
    for key in ("created", "framework_version"):
        if key in meta:
            summary[key] = meta[key]
    if isinstance(meta.get("config"), dict) and "seed" in meta["config"]:
        summary["seed"] = meta["config"]["seed"]
    if isinstance(meta.get("metrics"), dict) and isinstance(
        meta["metrics"].get("voltage_mae"), float
    ):
        summary["voltage_mae"] = meta["metrics"]["voltage_mae"]
    if summary:
        print("checkpoint provenance: "
              + " ".join(f"{k}={v}" for k, v in summary.items()))
    return summary or None


def _campaign_from_args(args):
    """--normal-mat/--fault-dir → CampaignConfig (None when neither given;
    ValueError when only one is)."""
    if not (getattr(args, "normal_mat", None) or getattr(args, "fault_dir", None)):
        return None
    from pinnfc_tpu.data import CampaignConfig

    if not (getattr(args, "normal_mat", None) and getattr(args, "fault_dir", None)):
        raise ValueError("real campaigns need BOTH --normal-mat and --fault-dir")
    campaign = CampaignConfig.from_dir(
        args.normal_mat, args.fault_dir, seed=args.seed
    )
    print(f"campaign: {args.normal_mat} + faults from {args.fault_dir}")
    return campaign


def cmd_train(args) -> int:
    from pinnfc_tpu.pipeline import run_training_pipeline
    from pinnfc_tpu.utils import save_checkpoint

    cfg = _train_config(args)
    n_normal = getattr(args, "n_normal", None) or (1500 if args.small else 6000)
    n_fault = getattr(args, "n_fault", None) or (200 if args.small else 800)

    if getattr(args, "ckpt_every", None) is not None and not getattr(
        args, "resume_dir", None
    ):
        # chunking without a snapshot dir pays the chunk overhead for zero
        # preemption safety — certainly not what the user meant
        print("--ckpt-every requires --resume-dir (nowhere to snapshot)",
              file=sys.stderr)
        return 2

    try:
        campaign = _campaign_from_args(args)
    except ValueError as e:
        print(e, file=sys.stderr)
        return 2

    mesh = None
    if getattr(args, "data_parallel", False):
        import jax

        from pinnfc_tpu.parallel import make_mesh

        mesh = make_mesh(jax.device_count())
        print(f"data-parallel over {jax.device_count()} devices")

    import contextlib

    if getattr(args, "profile_dir", None):
        from pinnfc_tpu.utils.observability import profile_trace

        trace_cm = profile_trace(args.profile_dir)
        print(f"capturing jax.profiler trace → {args.profile_dir}")
    else:
        trace_cm = contextlib.nullcontext()
    with trace_cm:
        res = run_training_pipeline(
            cfg,
            campaign=campaign,
            mat_path=args.mat_out,
            n_normal=n_normal,
            n_fault=n_fault,
            verbose=True,
            mesh=mesh,
            checkpoint_dir=getattr(args, "resume_dir", None),
            ckpt_every=getattr(args, "ckpt_every", None),
        )
    print(json.dumps({"metrics": res.metrics, "timings": res.timings}, indent=2))
    _print_lambda_table(res.params)
    if args.ckpt:
        import datetime

        import pinnfc_tpu
        from pinnfc_tpu.config import train_config_to_dict

        save_checkpoint(
            args.ckpt, res.params, res.dataset.scaler_x, res.dataset.scaler_y,
            meta={
                "framework_version": pinnfc_tpu.__version__,
                "created": datetime.datetime.now(
                    datetime.timezone.utc
                ).isoformat(timespec="seconds"),
                "config": train_config_to_dict(cfg),
                "n_normal": n_normal,
                "n_fault": n_fault,
                "campaign": (
                    {"normal_mat": args.normal_mat, "fault_dir": args.fault_dir}
                    if campaign is not None else None
                ),
                "metrics": res.metrics,
            },
        )
        print(f"checkpoint → {args.ckpt}")
    # reporting surfaces AFTER the checkpoint: a bad --metrics-jsonl or
    # --tensorboard-dir path must not discard an hours-long trained model
    if getattr(args, "metrics_jsonl", None):
        import numpy as np

        from pinnfc_tpu.utils import MetricsLogger

        ml = MetricsLogger()
        for i, (name, losses) in enumerate(res.log.stages):
            losses = np.asarray(losses)
            stride = max(1, losses.shape[0] // 100)  # ≤~100 points per stage
            ml.log(step=i, event="stage", stage=name,
                   n_iter=int(losses.shape[0]),
                   final_loss=float(losses[-1]),
                   loss_trace=[float(v) for v in losses[::stride]])
        ml.log(step=len(res.log.stages), event="final",
               **res.metrics, **res.timings)
        ml.to_jsonl(args.metrics_jsonl)
        print(f"metrics JSONL → {args.metrics_jsonl}")
    if getattr(args, "tensorboard_dir", None):
        _write_tensorboard(args.tensorboard_dir, res)
    if args.mat_out:
        print(f"comprehensive_results → {args.mat_out}")
    if getattr(args, "plot_dir", None):
        _emit_train_figures(res, args.plot_dir)
    return 0


def _write_tensorboard(logdir: str, res) -> None:
    """Scalar event files for the run: per-stage loss curves on a global
    step axis plus the final metric/timing tables (SURVEY §5 'optional
    TensorBoard'; zero-dependency writer, utils/tbevents.py)."""
    import numpy as np

    from pinnfc_tpu.utils import EventFileWriter

    with EventFileWriter(logdir) as w:
        step = 0
        for name, losses in res.log.stages:
            losses = np.asarray(losses)
            # full-resolution curves are cheap (~60 B/event) and TensorBoard
            # downsamples for display; keep every step
            for v in losses:
                w.add_scalar(f"loss/{name}", float(v), step=step)
                step += 1
        finals = {f"final/{k}": float(v) for k, v in res.metrics.items()}
        finals.update({f"time/{k}": float(v) for k, v in res.timings.items()})
        w.add_scalars(finals, step=max(step - 1, 0))
    print(f"tensorboard events → {logdir}")


def _emit_train_figures(res, plot_dir: str) -> None:
    """The script-01 figure set — artifact-derived, so it applies to both
    trained and scored results (PipelineResult or ScoreResult)."""
    from pinnfc_tpu.viz import (
        plot_detailed_results,
        plot_split_overview,
        plot_temp_comparison,
        plot_uncertainty,
    )

    os.makedirs(plot_dir, exist_ok=True)
    bl = res.dataset.info.boundary_lines
    plot_uncertainty(res.results, bl, os.path.join(plot_dir, "uncertainty.png"))
    plot_detailed_results(res.results, os.path.join(plot_dir, "detailed.png"), bl)
    plot_split_overview(res.results, bl, os.path.join(plot_dir, "split.png"))
    # true vs physics-model temperature, the reference main's inline
    # figure (01:2208-2228)
    plot_temp_comparison(
        res.results, os.path.join(plot_dir, "temp_comparison.png"), bl
    )
    print("figures →", plot_dir)  # emitted for trained AND scored artifacts


def cmd_score(args) -> int:
    """Score a NEW campaign with an EXISTING checkpoint — no retraining.

    The reference must re-run the full 42k-step schedule to get an artifact
    for fresh measurements (01:2143-2187); here the checkpoint's params +
    training scalers make the trained model a reusable asset: new data is
    normalized through the CHECKPOINT's scalers and goes straight to the
    MC-dropout exporter, producing a 22-column artifact that every
    downstream stage (auc/gmm/risk/compare/monitor) consumes unchanged."""
    import dataclasses as dc

    from pinnfc_tpu.pipeline import run_scoring_pipeline
    from pinnfc_tpu.utils import load_checkpoint_meta

    # "score like you trained": the checkpoint's provenance sidecar carries
    # the training config, so by default the MC export (mc_times/dropout/
    # smoothing/precision) and the seed match the run that wrote the
    # checkpoint — scoring the training campaign is then bit-exact with the
    # train-time export without re-typing any flags
    meta = load_checkpoint_meta(args.ckpt)
    if (meta is not None and "config" in meta
            and not getattr(args, "ignore_ckpt_config", False)):
        from pinnfc_tpu.config import train_config_from_dict

        cfg = train_config_from_dict(meta["config"])
        if args.small:
            cfg = dc.replace(cfg, mc_times=200)
        if args.seed is not None:
            cfg = dc.replace(cfg, seed=args.seed)
        # synthetic data sizes default to the TRAINING campaign's too, so a
        # bare `cli score` on the training data reproduces the train-time
        # artifact whatever sizes training used (explicit flags / --small
        # still override)
        if not args.small:
            if getattr(args, "n_normal", None) is None:
                args.n_normal = meta.get("n_normal")
            if getattr(args, "n_fault", None) is None:
                args.n_fault = meta.get("n_fault")
        print(f"config from checkpoint meta: mc_times={cfg.mc_times} "
              f"dropout={cfg.mc_dropout} seed={cfg.seed} "
              f"(--ignore-ckpt-config for CLI flags only)")
        # downstream helpers (_campaign_from_args) read args.seed — keep it
        # in step with the resolved config, never None
        args.seed = cfg.seed
    else:
        if args.seed is None:
            args.seed = 42
        cfg = _train_config(args)  # mc_times/dropout/smoothing/seed
    n_normal = getattr(args, "n_normal", None) or (1500 if args.small else 6000)
    n_fault = getattr(args, "n_fault", None) or (200 if args.small else 800)

    try:
        campaign = _campaign_from_args(args)
    except ValueError as e:
        print(e, file=sys.stderr)
        return 2

    mesh = None
    if getattr(args, "data_parallel", False):
        import jax

        from pinnfc_tpu.parallel import make_mesh

        mesh = make_mesh(jax.device_count())
        print(f"MC export sharded over {jax.device_count()} devices")

    res = run_scoring_pipeline(
        args.ckpt,
        cfg,
        campaign=campaign,
        mat_path=args.mat_out,
        n_normal=n_normal,
        n_fault=n_fault,
        verbose=True,
        mesh=mesh,
    )
    print(json.dumps({"metrics": res.metrics, "timings": res.timings}, indent=2))
    if args.mat_out:
        print(f"comprehensive_results → {args.mat_out}")
    if getattr(args, "plot_dir", None):
        _emit_train_figures(res, args.plot_dir)
    return 0


def cmd_synth(args) -> int:
    """Write a synthetic measurement campaign to disk in the reference's
    13-file .mat layout (data/synthetic + data.write_campaign_mats):
    Polar-1.mat normal channel variables (01:126-140) plus the 12 fault
    segment_double files (01:168-176) in the load order
    水淹/氧饥饿/膜干/氢饥饿 × 108/270/405 A (01:2097-2110).  The public
    Zenodo campaign is not redistributable, so this generates a physically
    plausible stand-in — a runnable demo of the campaign-ingestion path
    (`cli train --normal-mat/--fault-dir`) without the real data."""
    from pinnfc_tpu.data import synthesize_stack_data, write_campaign_mats

    normal, faults = synthesize_stack_data(
        n_normal=args.n_normal, n_fault=args.n_fault, seed=args.seed
    )
    cfg = write_campaign_mats(
        args.out_dir, normal, faults, ascii_names=not args.zh_names
    )
    print(f"campaign → {args.out_dir} "
          f"({os.path.basename(cfg.normal_path)} with {len(normal[0])} rows "
          f"+ {len(faults)} fault segments × {args.n_fault} rows)")
    print("train on it: python -m pinnfc_tpu.cli train "
          f"--normal-mat {cfg.normal_path} --fault-dir {args.out_dir}")
    return 0


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


def _streaming_conformal_calib(arr, alpha, announce=True):
    """Normal-row |res| calibration vector for the streaming monitor
    (uq/conformal 'absolute' score — the one computable online without MC
    sampling).  One rule for all three surfaces that bake it: cli monitor,
    cli serve, and export-model --conformal-mat."""
    from pinnfc_tpu.uq import normal_calibration_scores

    calib = normal_calibration_scores(arr, score="absolute", calib_frac=1.0)
    if announce:
        print(f"conformal calibration: {calib.size} normal scores, "
              f"α={alpha:g}")
    return calib


def cmd_conformal(args) -> int:
    """Split-conformal analysis of an exported artifact (uq/conformal):
    a distribution-free 1−α coverage guarantee for the voltage interval
    v̂ ± q̂·σ̂ calibrated on held-out normal rows, per-fault miscoverage
    (the diagnostic signal), and the normal-vs-fault detection AUC of the
    calibrated anomaly score 1−p.  The guarantee the reference's raw
    ±2σ MC-dropout bands (01:1516-1529) never had."""
    import numpy as np

    from pinnfc_tpu.data import load_comprehensive_results
    from pinnfc_tpu.uq import conformal_report

    results = load_comprehensive_results(args.mat)
    rep = conformal_report(
        results.array, alpha=args.alpha, score=args.score,
        calib_frac=args.calib_frac, seed=args.seed,
    )

    plot_dir = getattr(args, "plot_dir", None)
    if plot_dir:
        from pinnfc_tpu.viz import plot_conformal

        os.makedirs(plot_dir, exist_ok=True)
        path = os.path.join(plot_dir, "conformal_coverage.png")
        plot_conformal(rep, path)
        print(f"figure → {path}")

    if getattr(args, "json", False):
        import math

        def clean(o):
            # strict JSON (serving convention): non-finite floats become
            # null — a fault-free artifact has detection_auc = NaN, too few
            # calibration normals make q̂ = inf (json.dumps allow_nan=False
            # RAISES on those; its `default` hook never fires for floats)
            if isinstance(o, float) and not math.isfinite(o):
                return None
            if isinstance(o, dict):
                return {k: clean(v) for k, v in o.items()}
            if isinstance(o, list):
                return [clean(v) for v in o]
            return o

        print(json.dumps(clean(rep.to_dict()), indent=2, allow_nan=False))
        return 0

    kind = ("|res|/σ̂ (adaptive width)" if rep.score == "adaptive"
            else "|res| (constant width)")
    print(f"split conformal at α={rep.alpha:g}, score {kind}: "
          f"q̂={rep.q_hat:.4g} from {rep.n_calib} calibration normals"
          + (f" ({rep.n_dropped} non-finite dropped)" if rep.n_dropped else ""))
    print(f"{'class':>6} {'n':>6} {'coverage':>9} {'width[V]':>9} "
          f"{'median p':>9} {'p≤α':>7}")
    for c in rep.classes:
        tag = "normal" if c.label == 0 else f"f{c.label:02d}"
        print(f"{tag:>6} {c.n:>6} {c.coverage:>9.3f} {c.mean_width:>9.3g} "
              f"{c.median_p:>9.3f} {c.frac_low_p:>7.3f}")
    ne = rep.normal_eval
    print(f"held-out normal coverage {ne.coverage:.3f} vs guaranteed "
          f"≥ {1 - rep.alpha:g}; conformal detection AUC "
          f"{rep.detection_auc:.4f}")
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


def _print_lambda_table(params) -> None:
    """The identified physics parameters — the explainable core of the
    PINN — with their physical names (models/pinn.py LAMBDA_NAMES)."""
    import numpy as np

    from pinnfc_tpu.models.pinn import LAMBDA_INIT, LAMBDA_NAMES

    print("identified physics parameters (λ):")
    for group, names in LAMBDA_NAMES.items():
        vals = params.get(group)
        if vals is None:
            continue
        vals = np.asarray(vals).ravel()
        inits = np.asarray(LAMBDA_INIT[group]).ravel()
        for i, name in enumerate(names):
            moved = "" if np.isclose(vals[i], inits[i]) else (
                f"  (init {inits[i]:.6g})"
            )
            print(f"  {group}[{i}] = {vals[i]:<12.6g} {name}{moved}")


def cmd_auc(args) -> int:
    import dataclasses as dc

    from pinnfc_tpu.config import AucConfig
    from pinnfc_tpu.data import load_comprehensive_results
    from pinnfc_tpu.diagnosis import list_available_features, run_auc_pipeline

    if getattr(args, "list_features", False):  # 02:455-458
        print("available features:", ", ".join(list_available_features()))
        return 0

    cfg = AucConfig()
    overrides = {}
    if getattr(args, "group_spec", None):
        overrides["group_spec"] = args.group_spec
    if getattr(args, "test_size", None) is not None:
        overrides["test_size"] = args.test_size
    if getattr(args, "balanced", None) is not None:
        overrides["balanced"] = args.balanced
    if overrides:
        cfg = dc.replace(cfg, **overrides)

    results = load_comprehensive_results(args.mat)
    out = run_auc_pipeline(results, cfg)
    for g in out.groups:
        print(f"group {g.group_id} [{g.features}]  AUC={g.auc:.4f}  acc={g.accuracy:.4f}")
    print(f"unsupervised IsolationForest AUC={out.iso_auc:.4f}")

    if getattr(args, "show_coef", 0):  # 02:209-229 explainer
        import numpy as np

        from pinnfc_tpu.data.contract import INDEX
        from pinnfc_tpu.diagnosis import (
            build_label_mapper,
            explain_coefficients,
            extract_X_y,
            logreg_fit,
            parse_features,
            parse_group_spec,
        )
        from pinnfc_tpu.diagnosis.splits import stratified_split

        groups = parse_group_spec(cfg.group_spec)
        label_map, class_names = build_label_mapper(groups)
        inv = {v: k for k, v in INDEX.items()}
        for spec in cfg.feature_groups:
            feat_idx = parse_features(spec)
            x, y = extract_X_y(results.array, feat_idx, label_map)
            x_tr, _, y_tr, _ = stratified_split(
                x, y, y=y, test_size=cfg.test_size, random_state=cfg.random_state
            )
            model = logreg_fit(x_tr, y_tr, n_classes=len(class_names),
                               balanced=cfg.balanced)
            names = [inv.get(i, f"col{i}") for i in feat_idx]
            info = explain_coefficients(model, names, class_names,
                                        topn=args.show_coef)
            print(f"\nLR coefficients, features [{spec}]:")
            for cname, d in info.items():
                pos = ", ".join(f"{n}({w:+.3f})" for n, w in d["positive"])
                neg = ", ".join(f"{n}({w:+.3f})" for n, w in d["negative"])
                print(f"  {cname}: top+ {pos} | top- {neg}")

    if args.plot_dir:
        from pinnfc_tpu.viz import (
            plot_res_vs_epi,
            plot_roc_curves,
            plot_scatter_by_features,
            plot_temp_vs_voltage,
        )

        os.makedirs(args.plot_dir, exist_ok=True)
        # PLOT_FEATURES scatter first, as the reference main does (02:470-476)
        plot_scatter_by_features(
            results, cfg.plot_features, cfg.group_spec,
            os.path.join(args.plot_dir, "feature_scatter.png"),
            random_state=cfg.random_state,
        )
        plot_roc_curves(out, os.path.join(args.plot_dir, "roc.png"))
        plot_temp_vs_voltage(results, os.path.join(args.plot_dir, "temp_vs_v.png"))
        plot_res_vs_epi(results, os.path.join(args.plot_dir, "res_vs_epi.png"))
        print("figures →", args.plot_dir)
    return 0


def cmd_gmm(args) -> int:
    from pinnfc_tpu.config import GmmConfig
    from pinnfc_tpu.data import load_comprehensive_results
    from pinnfc_tpu.diagnosis import run_gmm_pipeline

    results = load_comprehensive_results(args.mat)
    mesh = None
    if getattr(args, "data_parallel", False):
        import jax

        from pinnfc_tpu.parallel import make_mesh

        mesh = make_mesh(jax.device_count())
        print(f"GMM EM data-parallel over {jax.device_count()} devices")
    cfg = GmmConfig()
    if getattr(args, "init", None):
        import dataclasses as dc

        cfg = dc.replace(cfg, init=args.init)
    out = run_gmm_pipeline(results, cfg, mesh=mesh)
    args.gmm_result = out  # run-all reuses the fit for the monitor's head
    print(f"GMM 4-class accuracy: {out.accuracy:.4f}")
    print("confusion:\n", out.confusion)
    if args.plot_dir:
        from pinnfc_tpu.viz import (
            fault_prob_filename,
            plot_confusion_matrix,
            plot_fault_probabilities,
        )

        os.makedirs(args.plot_dir, exist_ok=True)
        plot_confusion_matrix(
            out.confusion, out.class_names,
            os.path.join(args.plot_dir, "gmm_confusion.png"), title="GMM",
        )
        for k, cname in enumerate(out.class_names):
            plot_fault_probabilities(
                out, k, os.path.join(args.plot_dir, fault_prob_filename(cname))
            )
        if getattr(args, "tsne", False):  # 03:429-508
            from pinnfc_tpu.config import GmmConfig
            from pinnfc_tpu.diagnosis import parse_features
            from pinnfc_tpu.viz import plot_feature_scatter, tsne_embed

            feat_idx = parse_features(GmmConfig().features)
            x_te = results.array[out.test_full_indices][:, feat_idx]
            emb = tsne_embed(x_te, perplexity=20.0)
            plot_feature_scatter(
                emb, out.y_pred, os.path.join(args.plot_dir, "gmm_tsne.png"),
                out.class_names, title="t-SNE of test samples (predicted class)",
            )
        print("figures →", args.plot_dir)
    return 0


def cmd_risk(args) -> int:
    from pinnfc_tpu.config import RiskConfig
    from pinnfc_tpu.data import load_comprehensive_results
    from pinnfc_tpu.risk import run_risk_pipeline

    results = load_comprehensive_results(args.mat)
    # run-all synthesizes a bare Namespace per stage → default like argparse
    advances = run_risk_pipeline(results, backend=getattr(args, "backend", "jax"))
    print(f"{'current':>8} {'fault':>8} {'V alarm':>8} {'RF alarm':>9} "
          f"{'advance':>8}  driver")
    for a in advances:
        # the physics layer that contributed most to the risk level at the
        # alarm instant (exact λ-decay attribution, rf.py)
        driver = (
            f"{a.dominant_layer} {a.layer_shares[a.dominant_layer]:.0%}"
            if a.layer_shares else "-"
        )
        print(
            f"{a.current_target:8.0f} {a.fault_name:>8} "
            f"{str(a.idx_v_alarm):>8} {str(a.idx_rf_alarm):>9} "
            f"{str(a.advance):>8}  {driver}"
        )
    if args.plot_dir:
        from pinnfc_tpu.viz import plot_rf_attribution, plot_rf_condition

        cfg = RiskConfig()
        os.makedirs(args.plot_dir, exist_ok=True)
        for a in advances:
            plot_rf_condition(
                a, cfg.warn_threshold, cfg.danger_threshold,
                os.path.join(
                    args.plot_dir, f"rf_{a.current_target:.0f}A_{a.fault_name}.png"
                ),
            )
            # explainability companion: stacked per-layer C_l(t)
            plot_rf_attribution(
                a,
                os.path.join(
                    args.plot_dir,
                    f"rf_attr_{a.current_target:.0f}A_{a.fault_name}.png",
                ),
            )
        print("figures →", args.plot_dir)
    return 0


def cmd_compare(args) -> int:
    from pinnfc_tpu.data import load_comprehensive_results
    from pinnfc_tpu.diagnosis import run_compare_pipeline

    results = load_comprehensive_results(args.mat)
    methods = args.methods.split(",") if args.methods else None
    out = run_compare_pipeline(results, methods=methods)
    for m in out.methods:
        print(f"{m.name:>15}: " + "  ".join(f"{k}={v:.4f}" for k, v in m.metrics.items()))
    if args.plot_dir:
        from pinnfc_tpu.viz import plot_confusion_matrix, plot_metrics_bars

        os.makedirs(args.plot_dir, exist_ok=True)
        for m in out.methods:
            plot_confusion_matrix(
                m.confusion, out.class_names,
                os.path.join(args.plot_dir, f"confusion_{m.name}.png"), title=m.name,
            )
        plot_metrics_bars(
            out.summary_table(), os.path.join(args.plot_dir, "method_metrics.png")
        )
        print("figures →", args.plot_dir)
    return 0


def cmd_report(args) -> int:
    """Consolidated markdown run report (utils/report): every downstream
    stage's findings — AUC, GMM, RF(t) advance table with layer drivers,
    method comparison, conformal audit — plus checkpoint provenance and the
    figure gallery, in ONE report.md next to the artifact."""
    from pinnfc_tpu.data import load_comprehensive_results
    from pinnfc_tpu.utils import write_report

    results = load_comprehensive_results(args.mat)
    json_out = getattr(args, "json_out", None)
    if getattr(args, "json", False) or json_out:
        # machine-readable regression vector (same numbers the baseline
        # section diffs) — strict JSON, NaN → null
        import math

        from pinnfc_tpu.utils.report import artifact_metrics

        metrics = {k: (v if math.isfinite(v) else None)
                   for k, v in artifact_metrics(results).items()}
        doc = json.dumps(metrics, indent=2, allow_nan=False)
        if json_out:
            with open(json_out, "w") as f:
                f.write(doc + "\n")
            print(f"metrics → {json_out}")
        if getattr(args, "json", False):
            print(doc)
            return 0
    baseline_path = getattr(args, "baseline", None)
    baseline = load_comprehensive_results(baseline_path) if baseline_path else None
    out = args.out or os.path.join(
        os.path.dirname(os.path.abspath(args.mat)), "report.md"
    )
    sections = args.sections.split(",") if args.sections else None
    path = write_report(
        out,
        results,
        ckpt_path=getattr(args, "ckpt", None),
        figures_dir=getattr(args, "plot_dir", None),
        sections=sections,
        mat_path=args.mat,
        baseline=baseline,
        baseline_path=baseline_path,
    )
    print(f"report → {path}")
    return 0


def cmd_run_all(args) -> int:
    os.makedirs(args.out_dir, exist_ok=True)
    mat_path = os.path.join(args.out_dir, "F01_output.mat")

    plot_dir = os.path.join(args.out_dir, "figures")
    from_ckpt = getattr(args, "from_ckpt", None)
    if from_ckpt:
        # reuse a trained model: the score stage replaces the 42k-step
        # train stage (the reference has no such shortcut — 01:2143-2187).
        # seed=None lets the checkpoint's stored training seed win (meta
        # adoption) so run-all --from-ckpt on the training campaign
        # reproduces the train-time artifact; an explicit --seed overrides.
        ns = argparse.Namespace(
            small=args.small, seed=args.seed, mat_out=mat_path,
            ckpt=from_ckpt, plot_dir=plot_dir,
            normal_mat=getattr(args, "normal_mat", None),
            fault_dir=getattr(args, "fault_dir", None),
        )
        rc = cmd_score(ns)
    else:
        ns = argparse.Namespace(
            small=args.small, mat_out=mat_path,
            seed=args.seed if args.seed is not None else 42,
            ckpt=os.path.join(args.out_dir, "pinn_ckpt"), plot_dir=plot_dir,
            normal_mat=getattr(args, "normal_mat", None),
            fault_dir=getattr(args, "fault_dir", None),
            steps_scale=getattr(args, "steps_scale", None),
        )
        rc = cmd_train(ns)
    if rc:
        return rc
    gmm_result = None
    for fn in (cmd_auc, cmd_gmm, cmd_risk, cmd_compare):
        # tsne=True: the reference always draws the script-03 t-SNE (03:587)
        stage_ns = argparse.Namespace(mat=mat_path, plot_dir=plot_dir,
                                      methods=None, tsne=fn is cmd_gmm)
        rc = fn(stage_ns)
        if rc:
            return rc
        if fn is cmd_gmm:
            gmm_result = getattr(stage_ns, "gmm_result", None)
    # serving demo: stream fault segment 1 through the OnlineMonitor from
    # the checkpoint the train stage just wrote, reusing the gmm stage's
    # fit for the online-diagnosis head
    rc = cmd_monitor(argparse.Namespace(
        mat=mat_path, ckpt=ns.ckpt, block=256, fault_label=1, lead=200,
        diagnose=True, gmm_result=gmm_result,
        # stream the calibrated anomaly p-values too, so the serving demo
        # reports the normal-vs-fault conformal anomaly rate
        conformal=True, conformal_alpha=0.1,
    ))
    if rc:
        return rc
    # identifiability report over the artifact just produced: how well the
    # 17 physics parameters are pinned down (uq/identifiability)
    rc = cmd_identify(argparse.Namespace(ckpt=ns.ckpt, mat=mat_path,
                                         plot_dir=plot_dir))
    if rc:
        return rc
    # model-level explainability: per-class input-channel saliency table
    # + heatmaps (uq/saliency) alongside the risk table's layer attribution
    rc = cmd_explain(argparse.Namespace(ckpt=ns.ckpt, mat=mat_path,
                                        plot_dir=plot_dir))
    if rc:
        return rc
    # prescriptive explainability: per alarmed risk condition, the minimal
    # actuation that clears the alarm line (uq/counterfactual)
    rc = cmd_whatif(argparse.Namespace(
        ckpt=ns.ckpt, mat=mat_path, plot_dir=plot_dir, steps=400, lr=0.05,
        alpha=0.05, margin=0.01, actuate=None, max_rows=64,
    ))
    if rc:
        return rc
    # calibrated-uncertainty audit: split-conformal coverage of the
    # voltage interval + per-fault miscoverage diagnostic (uq/conformal)
    rc = cmd_conformal(argparse.Namespace(
        mat=mat_path, alpha=0.1, score="adaptive", calib_frac=0.5, seed=0,
        plot_dir=plot_dir,
    ))
    if rc:
        return rc
    # one-file deliverable: consolidate everything the stages just printed
    rc = cmd_report(argparse.Namespace(
        mat=mat_path, ckpt=ns.ckpt, plot_dir=plot_dir,
        out=os.path.join(args.out_dir, "report.md"), sections=None,
        json_out=os.path.join(args.out_dir, "metrics.json"),
    ))
    if rc:
        return rc
    print(f"run-all complete → {args.out_dir}")
    return 0


def cmd_ensemble(args) -> int:
    """Many-seed PINN ensemble: E members trained simultaneously via vmap
    (mesh-sharded when more than one device is visible)."""
    import jax
    import numpy as np

    from pinnfc_tpu.data import combine_and_normalize, synthesize_stack_data
    from pinnfc_tpu.parallel import (
        ensemble_predict,
        init_ensemble,
        make_mesh,
        train_dnn_ensemble,
    )

    normal, faults = synthesize_stack_data(
        n_normal=1500 if args.small else 6000,
        n_fault=200 if args.small else 800,
        seed=args.seed,
    )
    ds = combine_and_normalize(normal, faults, training_rate=1.0, seed=args.seed)

    rng = jax.random.key(args.seed + 1, impl="rbg")  # fast dropout masks
    ens = init_ensemble(jax.random.PRNGKey(args.seed), args.members)
    n_dev = jax.device_count()
    if getattr(args, "mesh_shape", None):
        # hybrid 2-D: members over 'model', batch rows over 'data'
        from pinnfc_tpu.parallel import train_dnn_ensemble_2d

        m, d = (int(v) for v in args.mesh_shape.lower().split("x"))
        mesh = make_mesh(m * d, axis_names=("model", "data"), shape=(m, d))
        print(f"2-D mesh: {args.members} members over {m} × rows over {d}")
        ens, losses = train_dnn_ensemble_2d(
            ens, ds.x_train, ds.y_train, rng, n_iter=args.steps, mesh=mesh
        )
    else:
        mesh = None
        if n_dev > 1 and args.members % n_dev == 0:
            mesh = make_mesh(n_dev)
            print(f"sharding {args.members} members over {n_dev} devices")
        ens, losses = train_dnn_ensemble(
            ens, ds.x_train, ds.y_train, rng, n_iter=args.steps, mesh=mesh
        )
    preds = np.asarray(ensemble_predict(ens, ds.x_test))  # (E, N, 1)
    y = np.asarray(ds.scaler_y.inverse(ds.y_test))[:, 0]
    scale_y = np.asarray(ds.scaler_y.scale)
    min_y = np.asarray(ds.scaler_y.min)
    preds_real = (preds[:, :, 0] - min_y) / scale_y
    mae = np.abs(preds_real - y[None, :]).mean(axis=1)
    print(f"{'member':>7} {'final loss':>12} {'test MAE [V]':>13}")
    for e in range(args.members):
        print(f"{e:7d} {float(losses[e, -1]):12.4e} {mae[e]:13.4f}")
    spread = preds_real.std(axis=0).mean()
    print(f"ensemble spread (mean member std): {spread:.4f} V")

    if getattr(args, "uq", False):
        from pinnfc_tpu.uq import ensemble_moments, mc_dropout_samples

        de = jax.device_get(ensemble_moments(ens, ds.x_test))
        member0 = jax.jit(
            lambda t: jax.tree_util.tree_map(lambda a: a[0], t)
        )(ens["mlp"])
        mc = jax.device_get(
            mc_dropout_samples(
                member0,
                ds.x_test,
                jax.random.PRNGKey(args.seed + 2),
                mc_times=args.uq_mc_times,
            )
        )
        # de-normalize stds through the exporter's affine constants
        # (pipeline/export.py:37-39, reference 01:1924-1932)
        sc = float(np.asarray(ds.scaler_y.scale).reshape(-1)[0]) + 1e-12
        print(f"\ndeep-ensemble UQ (E={args.members}) vs MC dropout "
              f"(member 0, {args.uq_mc_times} samples):")
        print(f"{'estimator':>14} {'mean ale [V]':>13} {'mean epi [V]':>13} "
              f"{'max epi [V]':>12}")
        for name, s in (("ensemble", de), ("mc-dropout", mc)):
            print(
                f"{name:>14} {np.mean(s.aleatoric_std) / sc:13.4f} "
                f"{np.mean(s.epistemic_std) / sc:13.4f} "
                f"{np.max(s.epistemic_std) / sc:12.4f}"
            )
        a, b = np.asarray(de.epistemic_std), np.asarray(mc.epistemic_std)
        if np.std(a) > 0 and np.std(b) > 0:
            corr = float(np.corrcoef(a, b)[0, 1])
            print(f"epistemic profile correlation (ensemble vs MC): {corr:.3f}")
    return 0


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


def cmd_doctor(args) -> int:
    """Deployment self-check: environment, caches, backend reachability,
    and optional checkpoint/artifact pre-flight (see utils/doctor.py).

    The reference has no equivalent — its scripts assume a healthy local
    torch install.  On a relay-attached TPU the failure modes (stalled
    handshakes, poisoned compile caches, cpu-only artifacts on a TPU
    host) deserve a bounded first-line diagnostic."""
    from pinnfc_tpu.utils.doctor import run_doctor

    checks = run_doctor(
        probe_timeout=args.probe_timeout,
        platform=args.platform,
        skip_probe=args.skip_probe,
        smoke=args.smoke,
        ckpt=args.ckpt,
        artifact=args.artifact,
    )
    if args.json:
        print(json.dumps(checks))
    else:
        for c in checks:
            print(f"[{'ok' if c['ok'] else 'FAIL':>4}] {c['name']:<18} {c['detail']}")
    return 0 if all(c["ok"] for c in checks) else 1


def cmd_bench(args) -> int:
    try:
        import bench
    except ImportError:  # bench.py lives at the repo root, next to the package
        repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        sys.path.insert(0, repo_root)
        import bench

    bench.main()
    return 0


def main(argv: Optional[list] = None) -> int:
    p = argparse.ArgumentParser(prog="pinnfc_tpu", description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="staged PINN training + MC export (stage 01)")
    t.add_argument("--mat-out", default="F01_output.mat")
    t.add_argument("--ckpt", default=None)
    t.add_argument("--small", action="store_true", help="reduced schedule/data")
    t.add_argument("--steps-scale", type=float, default=None,
                   help="multiply every stage's step count (quick experiments)")
    t.add_argument("--seed", type=int, default=42)
    t.add_argument(
        "--data-parallel", action="store_true",
        help="shard batch rows over all visible devices",
    )
    t.add_argument("--plot-dir", default=None)
    t.add_argument("--n-normal", type=int, default=None,
                   help="synthetic normal rows (default 6000; 1500 with --small)")
    t.add_argument("--n-fault", type=int, default=None,
                   help="rows per fault segment (default 800; 200 with --small)")
    t.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the pipeline")
    t.add_argument("--metrics-jsonl", default=None,
                   help="write structured run metrics: one JSONL row per "
                        "stage (final loss + subsampled loss trace) plus a "
                        "final row with the metric/timing tables")
    t.add_argument("--skip-nonfinite", action="store_true",
                   help="skip (don't apply) training steps with non-finite "
                        "loss/grads instead of letting NaN poison the run — "
                        "the reference's try/except-and-continue loops "
                        "(01:1204-1286); clean runs agree to ~1 ulp/step")
    t.add_argument("--tensorboard-dir", default=None,
                   help="write TensorBoard scalar event files (per-stage "
                        "loss curves + final metrics; no TF/torch needed)")
    t.add_argument("--precision", choices=("highest", "default"), default=None,
                   help="MXU matmul precision: 'highest' = torch-parity f32 "
                        "(the default); 'default' = bf16 throughput mode "
                        "(~2.6x steps/s, PERFORMANCE.md)")
    t.add_argument("--resume-dir", default=None,
                   help="schedule snapshot dir: a killed run restarted with "
                        "the same flags resumes and reproduces the trajectory")
    t.add_argument("--ckpt-every", type=int, default=None,
                   help="with --resume-dir: snapshot every N steps WITHIN "
                        "each stage (mid-stage preemption safety)")
    t.add_argument("--normal-mat", default=None,
                   help="real campaign: normal-operation .mat (e.g. Polar-1.mat)")
    t.add_argument("--fault-dir", default=None,
                   help="real campaign: directory with the 12 fault .mat files "
                        "(<type>_<108|270|405>A.mat, Chinese or ASCII stems)")
    t.set_defaults(fn=cmd_train)

    sc = sub.add_parser(
        "score",
        help="score a NEW campaign with an existing checkpoint — normalize "
             "through the checkpoint's scalers, MC-dropout export, no "
             "retraining (the reference must re-run the 42k-step schedule)",
    )
    sc.add_argument("--ckpt", required=True, help="checkpoint from `train --ckpt`")
    sc.add_argument("--mat-out", default="F01_scored.mat")
    sc.add_argument("--plot-dir", default=None,
                    help="emit the script-01 figure set for the scored "
                         "artifact (uncertainty/detailed/split/temp)")
    sc.add_argument("--small", action="store_true",
                    help="reduced MC sample count / synthetic data size")
    sc.add_argument("--seed", type=int, default=None,
                    help="MC key seed (default: the checkpoint's training "
                         "seed from its .meta.json sidecar, which makes "
                         "scoring the training campaign bit-exact; 42 for "
                         "pre-metadata checkpoints)")
    sc.add_argument("--ignore-ckpt-config", action="store_true",
                    help="ignore the checkpoint's stored training config "
                         "and build the MC-export settings from CLI flags "
                         "alone")
    sc.add_argument("--n-normal", type=int, default=None,
                    help="synthetic normal rows (default 6000; 1500 with --small)")
    sc.add_argument("--n-fault", type=int, default=None,
                    help="rows per fault segment (default 800; 200 with --small)")
    sc.add_argument("--normal-mat", default=None,
                    help="new campaign: normal-operation .mat")
    sc.add_argument("--fault-dir", default=None,
                    help="new campaign: directory with the 12 fault .mat files")
    sc.add_argument("--data-parallel", action="store_true",
                    help="shard the MC export's rows over all visible devices")
    sc.set_defaults(fn=cmd_score)

    sy = sub.add_parser(
        "synth",
        help="write a synthetic campaign in the reference's 13-file .mat "
             "layout — a runnable stand-in for the (non-redistributable) "
             "Zenodo measurement data",
    )
    sy.add_argument("--out-dir", required=True)
    sy.add_argument("--n-normal", type=int, default=6000,
                    help="normal-operation rows (before the loader's "
                         "50<I<800 filter)")
    sy.add_argument("--n-fault", type=int, default=800,
                    help="rows per fault segment")
    sy.add_argument("--seed", type=int, default=0)
    sy.add_argument("--zh-names", action="store_true",
                    help="use the Chinese fault-file stems the reference "
                         "ships (default: ASCII aliases)")
    sy.set_defaults(fn=cmd_synth)

    ins = sub.add_parser(
        "inspect",
        help="describe a checkpoint: provenance metadata, parameter tree, "
             "stored normalization ranges (no device work)",
    )
    ins.add_argument("--ckpt", required=True)
    ins.add_argument("--json", action="store_true",
                     help="machine-readable output (meta, param shapes, "
                          "named λ values, scaler ranges, step)")
    ins.set_defaults(fn=cmd_inspect)

    idf = sub.add_parser(
        "identify",
        help="identifiability of the 17 physics λ's: Gauss-Newton 95% CIs "
             "+ sensitivity + at-bound/unidentifiable flags at the trained "
             "optimum",
    )
    idf.add_argument("--ckpt", required=True)
    idf.add_argument("--mat", required=True,
                     help="exported F01_output.mat supplying the input rows")
    idf.add_argument("--json", action="store_true")
    idf.add_argument("--plot-dir", default=None,
                     help="save the relative-CI identifiability figure here")
    idf.add_argument("--data-parallel", action="store_true",
                     help="shard the residual Jacobian rows over all "
                          "visible devices")
    idf.set_defaults(fn=cmd_identify)

    xp = sub.add_parser(
        "explain",
        help="input-channel saliency: which measured input the voltage "
             "prediction (and its aleatoric σ) leans on, per fault class",
    )
    xp.add_argument("--ckpt", required=True)
    xp.add_argument("--mat", required=True,
                    help="exported F01_output.mat supplying rows + labels")
    xp.add_argument("--json", action="store_true")
    xp.add_argument("--plot-dir", default=None,
                    help="save the class × channel saliency heatmaps here")
    xp.add_argument("--data-parallel", action="store_true",
                    help="shard the Jacobian rows over all visible devices")
    xp.set_defaults(fn=cmd_explain)

    wi = sub.add_parser(
        "whatif",
        help="counterfactual recovery: per alarmed risk condition, the "
             "minimal in-distribution actuation whose predicted voltage "
             "gain covers the measured shortfall below the alarm line",
    )
    wi.add_argument("--ckpt", required=True)
    wi.add_argument("--mat", required=True,
                    help="exported F01_output.mat supplying rows + labels")
    wi.add_argument("--steps", type=int, default=400,
                    help="Adam iterations of the inverse solve (default 400)")
    wi.add_argument("--lr", type=float, default=0.05,
                    help="step size in normalized-input units (default 0.05)")
    wi.add_argument("--alpha", type=float, default=0.05,
                    help="minimal-actuation penalty weight (default 0.05)")
    wi.add_argument("--margin", type=float, default=0.01,
                    help="volts above the alarm line to target (default 0.01)")
    wi.add_argument("--actuate", default=None,
                    help="comma-separated channels the solver may move "
                         "(default: all but current and coolant_t_out)")
    wi.add_argument("--max-rows", type=int, default=64,
                    help="cap alarmed rows per condition, subsampled evenly")
    wi.add_argument("--absolute-target", action="store_true",
                    help="target the model's own prediction clearing the "
                         "alarm line instead of the default gain target "
                         "(Δv̂ covering the measured shortfall)")
    wi.add_argument("--json", action="store_true")
    wi.add_argument("--plot-dir", default=None,
                    help="save the condition × channel actuation heatmap here")
    wi.add_argument("--data-parallel", action="store_true",
                    help="shard the solve rows over all visible devices")
    wi.set_defaults(fn=cmd_whatif)

    cf = sub.add_parser(
        "conformal",
        help="split-conformal coverage analysis of an exported artifact: "
             "distribution-free voltage intervals calibrated on normal "
             "rows, per-fault miscoverage, calibrated anomaly p-values",
    )
    cf.add_argument("--mat", required=True)
    cf.add_argument("--alpha", type=float, default=0.1,
                    help="miscoverage level (default 0.1 → 90%% intervals)")
    cf.add_argument("--score", choices=("adaptive", "absolute"),
                    default="adaptive",
                    help="adaptive = |res|/sqrt(ale²+epi²) (width tracks "
                         "the model's σ̂); absolute = |res| (the score the "
                         "streaming monitor evaluates online)")
    cf.add_argument("--calib-frac", type=float, default=0.5,
                    help="fraction of normal rows consumed for calibration "
                         "(rest = honest held-out coverage; default 0.5)")
    cf.add_argument("--seed", type=int, default=0,
                    help="calibration/evaluation split seed (default 0)")
    cf.add_argument("--json", action="store_true")
    cf.add_argument("--plot-dir", default=None,
                    help="save the per-class coverage/p-value figure here")
    cf.set_defaults(fn=cmd_conformal)

    ex = sub.add_parser(
        "export-model",
        help="serialize the checkpoint's eval-mode scorer to a "
             "self-contained StableHLO artifact (jax.export): weights + "
             "scalers baked in, any batch size, multi-platform",
    )
    ex.add_argument("--ckpt", required=True)
    ex.add_argument("--out", required=True,
                    help="output artifact path (a .meta.json provenance "
                         "sidecar is written alongside)")
    ex.add_argument("--platforms", default="cpu,tpu",
                    help="comma-separated lowering targets (default cpu,tpu)")
    ex.add_argument("--monitor-step", action="store_true",
                    help="export the full streaming RF(t) block step "
                         "(state in/out as a plain tuple; μ/σ runtime "
                         "inputs) instead of the plain scorer")
    ex.add_argument("--fleet-step", action="store_true",
                    help="with --monitor-step: export observe_many's "
                         "VMAPPED fleet program instead (symbolic stream "
                         "axis AND block size) — artifact deployments "
                         "advance a whole fleet in one dispatch instead "
                         "of S sequential calls")
    ex.add_argument("--head", default=None,
                    help="with --monitor-step: bake this DiagnosisHead "
                         "(.npz) in for online fault typing")
    ex.add_argument("--glitch-alarm-n", type=int, default=None,
                    help="with --monitor-step: bake this consecutive-glitch "
                         "sensor-alarm threshold in (default: the monitor's)")
    ex.add_argument("--conformal-mat", default=None,
                    help="with --monitor-step: bake calibrated anomaly "
                         "p-values in, calibrated on this artifact's normal "
                         "rows (|res| scores)")
    ex.add_argument("--conformal-alpha", type=float, default=None,
                    help="α recorded in the sidecar for the low-p counter "
                         "(default 0.1)")
    ex.add_argument("--conformal-gamma", type=float, default=None,
                    help="with --conformal-mat: bake the adaptive conformal "
                         "step size γ into the step — deployed streams "
                         "carry a drift-tracked alarm level α_t whose "
                         "long-run alarm rate stays at α* (default 0: "
                         "static level)")
    ex.set_defaults(fn=cmd_export_model)

    for name, fn, extra in (
        ("auc", cmd_auc, {"auc": True}),
        ("gmm", cmd_gmm, {"tsne": True, "data_parallel": True}),
        ("risk", cmd_risk, {}),
        ("compare", cmd_compare, {"methods": True}),
    ):
        s = sub.add_parser(name, help=f"stage {name} over F01_output.mat")
        s.add_argument("--mat", default="F01_output.mat")
        s.add_argument("--plot-dir", default=None)
        if name == "risk":
            # warning times are integer threshold crossings; both backends
            # agree on the full campaign (tested), 'jax' stays the default
            # for the on-device serving/monitor parity path
            s.add_argument(
                "--backend", choices=("jax", "numpy"), default="jax",
                help="RF recurrences: 'jax' (f32 on-device scans) or "
                     "'numpy' (f64 lfilter, bit-parity with the reference)",
            )
        if extra.get("methods"):
            s.add_argument(
                "--methods", default=None,
                help="comma list: gmm,logreg,svm,kmeans,agglomerative,spectral",
            )
        if extra.get("auc"):  # script-02 argparse parity (02:446-453)
            s.add_argument("--group-spec", default=None)
            s.add_argument("--test-size", type=float, default=None)
            s.add_argument("--balanced", action="store_true", default=None)
            s.add_argument("--no-balanced", dest="balanced", action="store_false")
            s.add_argument("--show-coef", type=int, default=0,
                           help="print top-N LR coefficients per class")
            s.add_argument("--list-features", action="store_true")
        if extra.get("data_parallel"):
            s.add_argument(
                "--data-parallel", action="store_true",
                help="row-shard the GMM EM fit over all visible devices",
            )
        if extra.get("tsne"):
            s.add_argument("--tsne", action="store_true",
                           help="also write a t-SNE figure (CPU, slow)")
            s.add_argument(
                "--init", choices=("kmeans", "sklearn"), default=None,
                help="EM init: on-device k-means++ (default) or sklearn "
                     "GaussianMixture's own kmeans init (reference-exact "
                     "starting point)",
            )
        s.set_defaults(fn=fn)

    rp = sub.add_parser(
        "report",
        help="one-file markdown report: every downstream stage's findings "
             "over an artifact, plus provenance and the figure gallery",
    )
    rp.add_argument("--mat", default="F01_output.mat")
    rp.add_argument("--ckpt", default=None,
                    help="checkpoint for the provenance section")
    rp.add_argument("--plot-dir", default=None,
                    help="existing figures directory to link as the gallery")
    rp.add_argument("--out", default=None,
                    help="output path (default: report.md next to --mat)")
    rp.add_argument("--baseline", default=None,
                    help="baseline artifact (.mat) for a direction-aware "
                         "metric diff — the retrain/rescore regression check")
    rp.add_argument("--sections", default=None,
                    help="comma subset of: provenance,overview,auc,gmm,"
                         "risk,compare,conformal,identifiability,saliency,"
                         "figures")
    rp.add_argument("--json", action="store_true",
                    help="print the artifact metric vector as JSON instead "
                         "of writing markdown (CI regression tracking)")
    rp.add_argument("--json-out", default=None,
                    help="also write the metric vector to this path "
                         "(run-all drops metrics.json next to report.md)")
    rp.set_defaults(fn=cmd_report)

    r = sub.add_parser("run-all", help="full pipeline 01→02/03/04/05")
    # (--seed default None: the train stage falls back to 42; the
    # --from-ckpt score stage falls back to the checkpoint's training seed)
    r.add_argument("--out-dir", required=True)
    r.add_argument("--from-ckpt", default=None,
                   help="skip training: score the campaign with this "
                        "existing checkpoint (see `score`), then run every "
                        "downstream stage on the scored artifact")
    r.add_argument("--small", action="store_true")
    r.add_argument("--steps-scale", type=float, default=None,
                   help="multiply every stage's step count")
    r.add_argument("--seed", type=int, default=None)
    r.add_argument("--normal-mat", default=None,
                   help="real campaign: normal-operation .mat")
    r.add_argument("--fault-dir", default=None,
                   help="real campaign: directory with the 12 fault .mat files")
    r.set_defaults(fn=cmd_run_all)

    e = sub.add_parser("ensemble", help="many-seed parallel PINN ensemble")
    e.add_argument("--members", type=int, default=8)
    e.add_argument("--steps", type=int, default=2000)
    e.add_argument("--mesh-shape", default=None, metavar="MxD",
                   help="hybrid 2-D mesh, e.g. 4x2: members over M devices, "
                        "each member's batch rows over D devices")
    e.add_argument("--small", action="store_true")
    e.add_argument("--seed", type=int, default=42)
    e.add_argument("--uq", action="store_true",
                   help="deep-ensemble mixture-moment UQ on the test split, "
                        "compared against member-0 MC dropout")
    e.add_argument("--uq-mc-times", type=int, default=256,
                   help="MC-dropout samples for the --uq comparison")
    e.set_defaults(fn=cmd_ensemble)

    m = sub.add_parser("monitor", help="streaming replay through OnlineMonitor")
    m.add_argument("--mat", default="F01_output.mat")
    m.add_argument("--ckpt", required=True, help="checkpoint from `train --ckpt`")
    m.add_argument("--block", type=int, default=64, help="samples per block")
    m.add_argument("--fault-label", type=int, default=None,
                   help="replay only this fault segment (1..12) after a lead-in")
    m.add_argument("--lead", type=int, default=200,
                   help="normal lead-in rows before the fault segment")
    m.add_argument("--diagnose", action="store_true",
                   help="attach the script-03 GMM head: classify the fault "
                        "type online while the RF warns")
    m.add_argument("--head", default=None,
                   help="load a saved diagnosis head (.npz) instead of "
                        "fitting one from the artifact")
    m.add_argument("--save-head", default=None,
                   help="persist the fitted diagnosis head (.npz)")
    m.add_argument("--glitch-alarm-n", type=int, default=None,
                   help="sensor_alarm after N consecutive non-finite samples")
    m.add_argument("--fleet", action="store_true",
                   help="replay ALL 12 (current, fault) risk conditions "
                        "(04:145-161) as concurrent streams — one vmapped "
                        "observe_many dispatch per lockstep block")
    m.add_argument("--data-parallel", action="store_true",
                   help="with --fleet: shard the stream axis over all "
                        "visible devices (collective-free)")
    m.add_argument("--whatif", action="store_true",
                   help="after the replay, solve the gain-mode "
                        "counterfactual over the alarmed tail: the minimal "
                        "in-training-range actuation whose predicted "
                        "voltage gain covers the measured shortfall below "
                        "the stream's dynamic alarm line")
    m.add_argument("--conformal", action="store_true",
                   help="calibrated anomaly p-values per sample, calibrated "
                        "on the artifact's normal rows (uq/conformal |res| "
                        "score); prints the normal-vs-fault anomaly rate")
    m.add_argument("--conformal-alpha", type=float, default=0.1,
                   help="p<α counts as a calibrated anomaly (default 0.1)")
    m.add_argument("--conformal-gamma", type=float, default=0.0,
                   help="with --conformal: adaptive conformal step size γ "
                        "(Gibbs & Candès ACI) — the alarm level α_t tracks "
                        "drift so the long-run alarm rate stays at α*; the "
                        "replayed stream's final α_t is a calibrated drift "
                        "gauge (0 = static level, default)")
    m.set_defaults(fn=cmd_monitor)

    sv = sub.add_parser(
        "serve",
        help="HTTP scoring endpoint (POST /observe, /observe_many, /reset; "
             "GET /health, /metrics)",
    )
    sv.add_argument("--mat", default="F01_output.mat",
                    help="artifact for the normal-operation μ/σ statistics")
    sv.add_argument("--ckpt", default=None, help="checkpoint from `train --ckpt`")
    sv.add_argument("--artifact", default=None,
                    help="serve from an `export-model --monitor-step` "
                         "StableHLO artifact instead of a checkpoint (risk "
                         "config/glitch threshold/class names adopted from "
                         "its .meta.json sidecar)")
    sv.add_argument("--head", default=None,
                    help="saved diagnosis head (.npz) for online fault typing")
    sv.add_argument("--host", default="127.0.0.1")
    sv.add_argument("--port", type=int, default=8787)
    sv.add_argument("--max-requests", type=int, default=None,
                    help="stop after N requests (bounded demos/tests)")
    sv.add_argument("--glitch-alarm-n", type=int, default=None,
                    help="sensor_alarm after N consecutive non-finite samples")
    sv.add_argument("--state-path", default=None,
                    help="preemption-safe serving: snapshot the per-stream "
                         "RF(t) state bank here after every request and "
                         "restore it on restart (atomic npz)")
    sv.add_argument("--data-parallel", action="store_true",
                    help="shard /observe_many's stream axis over all visible "
                         "devices (fleet scoring is collective-free; capacity "
                         "scales linearly with chips)")
    sv.add_argument("--conformal", action="store_true",
                    help="with --ckpt: serve calibrated anomaly p-values, "
                         "calibrated on --mat's normal rows (/observe gains "
                         "conformal_p; /metrics a low-p counter)")
    sv.add_argument("--conformal-alpha", type=float, default=None,
                    help="p<α counts as a calibrated anomaly (default 0.1, "
                         "or the artifact sidecar's recorded value)")
    sv.add_argument("--conformal-gamma", type=float, default=None,
                    help="with --ckpt --conformal: adaptive conformal step "
                         "size γ — each stream's alarm level α_t tracks "
                         "drift (/observe gains aci_alpha/aci_anomaly; "
                         "/metrics a per-stream α_t gauge). Baked in for "
                         "artifacts (`export-model --conformal-gamma`)")
    sv.set_defaults(fn=cmd_serve)

    dr = sub.add_parser(
        "doctor",
        help="deployment self-check: env, caches, backend probe, "
             "checkpoint/artifact pre-flight (bounded; relay-outage safe)",
    )
    dr.add_argument("--platform", default=None,
                    help="pin the probed backend (e.g. 'cpu' to bypass a "
                         "stalled relay, 'axon' to demand the TPU)")
    dr.add_argument("--probe-timeout", type=float, default=600.0,
                    help="seconds before the backend probe subprocess is "
                         "declared stalled (default 600)")
    dr.add_argument("--skip-probe", action="store_true",
                    help="skip backend initialization entirely (filesystem/"
                         "env checks only — never touches the relay)")
    dr.add_argument("--smoke", action="store_true",
                    help="also run 101 toy Adam steps end-to-end in a "
                         "bounded subprocess (compile+execute+readback)")
    dr.add_argument("--ckpt", default=None,
                    help="pre-flight a checkpoint: raw CPU load + sidecar")
    dr.add_argument("--artifact", default=None,
                    help="pre-flight a StableHLO artifact: deserialize and "
                         "report its lowered platforms (no execution)")
    dr.add_argument("--json", action="store_true",
                    help="emit the check list as one JSON array")
    dr.set_defaults(fn=cmd_doctor)

    b = sub.add_parser("bench", help="headline benchmark (one JSON line)")
    b.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)

    from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
