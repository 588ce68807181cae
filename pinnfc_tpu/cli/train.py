"""`train`, `score`, `synth`, `ensemble` subcommands (stage 01 surface)."""

from __future__ import annotations

import json
import os
import sys

from pinnfc_tpu.cli._common import (
    _campaign_from_args,
    _print_lambda_table,
    _train_config,
)


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
