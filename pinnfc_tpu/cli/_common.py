"""Shared CLI helpers: config builders, provenance printing, campaign
parsing, the lambda table, and the streaming conformal calibration rule
used by monitor/serve/export-model."""

from __future__ import annotations

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
