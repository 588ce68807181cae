"""Downstream diagnosis subcommands over the exported artifact:
`auc`, `gmm`, `risk`, `compare`, `report`, `conformal` (scripts 02-05)."""

from __future__ import annotations

import json
import os


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
