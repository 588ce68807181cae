"""One-number end-to-end benchmark: the whole reference pipeline
(01 -> 02/03/04/05) phase-timed in a single process.

The reference's complete story is `01_*.py`'s __main__ (01:2055-2228:
campaign load -> 42k-step staged training -> MC export) followed by the
four downstream scripts; its training phase ALONE costs ~42,007 steps at
the measured 6.5 torch-CPU steps/s ~= 6,460 s (PERFORMANCE.md).  This
bench runs our equivalent end to end — campaign build, staged training,
MC export, voltage metrics, AUC, GMM diagnosis, RF(t) risk table,
six-method comparison, markdown report — and emits ONE headline JSON
line tracked round-over-round, plus one line per phase.

`vs_baseline` compares total wall to the reference TRAINING phase alone
(42,007 / 6.5 s — generous to the reference: its downstream scripts and
export are excluded from the denominator).

Usage: python benchmarks/run_all_bench.py [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_TRAIN_STEPS = 42_007
REF_TORCH_STEPS_PER_SEC = 6.5  # measured, PERFORMANCE.md "CPU baseline"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true",
                    help="reduced schedule/data (CPU-sim friendly)")
    args = ap.parse_args()

    from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from pinnfc_tpu.config import TrainConfig
    from pinnfc_tpu.data.combine import combine_and_normalize
    from pinnfc_tpu.data.synthetic import synthesize_stack_data

    if args.small:
        from pinnfc_tpu.cli._common import _small_schedule

        cfg = TrainConfig(schedule=_small_schedule(), mc_times=200)
        n_normal, n_fault = 1500, 200
    else:
        cfg = TrainConfig()
        n_normal, n_fault = 6000, 800

    phases = {}

    def timed(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *exc):
                if exc[0] is None:
                    phases[name] = round(time.perf_counter() - self.t0, 3)

        return _T()

    total0 = time.perf_counter()

    with timed("data_s"):
        normal, faults = synthesize_stack_data(
            n_normal=n_normal, n_fault=n_fault, seed=cfg.seed
        )
        dataset = combine_and_normalize(
            normal, faults, training_rate=cfg.training_rate, seed=cfg.seed
        )
        jax.block_until_ready((dataset.x_train, dataset.x_test))

    from pinnfc_tpu.models.pinn import init_pinn
    from pinnfc_tpu.training.stages import run_schedule

    init_key = jax.random.PRNGKey(cfg.seed)
    rng = jax.random.key(cfg.seed + 1, impl=cfg.model.rng_impl)
    train_key, mc_key = jax.random.split(rng)

    with timed("train_s"):
        params = init_pinn(init_key, cfg.model.layers)
        params, log = run_schedule(
            params, dataset.x_train, dataset.y_train,
            dataset.scaler_x, dataset.scaler_y,
            schedule=cfg.schedule, rng=train_key,
            dropout_p=cfg.model.dropout_p, precision=cfg.model.precision,
        )
        jax.block_until_ready(params)

    from pinnfc_tpu.pipeline.export import build_comprehensive_results

    with timed("export_s"):
        results = build_comprehensive_results(
            params, dataset, rng=mc_key, mc_times=cfg.mc_times,
            dropout=cfg.mc_dropout, smooth_window=cfg.smooth_window,
        )

    from pinnfc_tpu.pipeline.train_pipeline import evaluate_voltage_metrics

    with timed("metrics_s"):
        metrics = evaluate_voltage_metrics(params, dataset, results=results)

    from pinnfc_tpu.diagnosis import (
        run_auc_pipeline,
        run_compare_pipeline,
        run_gmm_pipeline,
    )
    from pinnfc_tpu.risk import run_risk_pipeline

    with timed("auc_s"):
        auc_out = run_auc_pipeline(results)
    with timed("gmm_s"):
        gmm_out = run_gmm_pipeline(results)
    with timed("risk_s"):
        risk_out = run_risk_pipeline(results)
    with timed("compare_s"):
        cmp_out = run_compare_pipeline(results)

    from pinnfc_tpu.utils import write_report

    with timed("report_s"):
        with tempfile.TemporaryDirectory() as td:
            write_report(os.path.join(td, "report.md"), results)

    total = time.perf_counter() - total0
    warned = [a for a in risk_out if a.advance is not None]
    for name, secs in phases.items():
        print(json.dumps({"phase": name, "seconds": secs}))
    print(json.dumps({
        "quality": {
            "voltage_mae": round(metrics["voltage_mae"], 5),
            "auc_group1": round(auc_out.groups[0].auc, 4),
            "gmm_accuracy": round(gmm_out.accuracy, 4),
            "risk_conditions_warned": len(warned),
            "compare_best_acc": round(
                max(m.metrics["accuracy"] for m in cmp_out.methods), 4
            ),
        }
    }))
    baseline_s = REF_TRAIN_STEPS / REF_TORCH_STEPS_PER_SEC
    print(json.dumps({
        "metric": "run_all_wall_s",
        "value": round(total, 1),
        "unit": "s",
        "backend": jax.default_backend(),
        "small": bool(args.small),
        "phases": phases,
        "vs_baseline": round(baseline_s / total, 1) if not args.small else None,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
