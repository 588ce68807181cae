"""`run-all`: the whole 01->02/03/04/05 pipeline plus the serving demo,
explainability trio, conformal audit and the consolidated report."""

from __future__ import annotations

import argparse
import os

from pinnfc_tpu.cli.diagnose import (
    cmd_auc,
    cmd_compare,
    cmd_conformal,
    cmd_gmm,
    cmd_report,
    cmd_risk,
)
from pinnfc_tpu.cli.explain import cmd_explain, cmd_identify, cmd_whatif
from pinnfc_tpu.cli.serve import cmd_monitor
from pinnfc_tpu.cli.train import cmd_score, cmd_train


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
