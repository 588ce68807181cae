"""End-to-end stage-01 pipeline: data → staged training → UQ → export.

The TPU-native equivalent of the reference's ``__main__`` (01:2055-2228):
load (or synthesize) the dataset, run the staged schedule, MC-dropout, build
``comprehensive_results``, optionally checkpoint parameters and save the
``.mat`` artifact that feeds pipeline stages 02-05.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pinnfc_tpu.config import TrainConfig
from pinnfc_tpu.data.combine import FuelCellDataset, combine_and_normalize
from pinnfc_tpu.data.contract import ComprehensiveResults, save_comprehensive_results
from pinnfc_tpu.data.synthetic import synthesize_stack_data
from pinnfc_tpu.models.mlp import mlp_forward
from pinnfc_tpu.models.pinn import PinnParams, init_pinn
from pinnfc_tpu.physics.residuals import all_residuals
from pinnfc_tpu.pipeline.export import build_comprehensive_results
from pinnfc_tpu.training.stages import TrainLog, run_schedule


@dataclasses.dataclass
class PipelineResult:
    params: PinnParams
    dataset: FuelCellDataset
    results: ComprehensiveResults
    log: TrainLog
    metrics: Dict[str, float]
    timings: Dict[str, float]


def _printed_extras(params: PinnParams, x_test, pred_norm, sx, sy):
    """Traced helper: quantities the reference's printed metric block uses
    but the export array does not carry — the FULL Euler thermal residual
    (01:1670 calls ``model.net_f_T``, not the simple model that feeds
    export column 14, 01:1953) and the target stoichiometric ratios
    (01:1810-1816).  Shared by both metric programs so they can never
    diverge."""
    from pinnfc_tpu.physics.hydrogen import hydrogen_residual
    from pinnfc_tpu.physics.oxygen import oxygen_residual
    from pinnfc_tpu.physics.thermal import thermal_residual_euler

    t = thermal_residual_euler(params["lam_t"], x_test, pred_norm, sx, sy)
    h = hydrogen_residual(params["lam_h"], x_test, sx)
    o = oxygen_residual(params["lam_o"], x_test, sx)
    return t.f[:, 0], h.target_ratio[:, 0], o.target_ratio[:, 0]


@jax.jit
def _metrics_device(params: PinnParams, x_test, y_test, sx, sy):
    """One program for the whole metric forward: eval prediction,
    de-normalization, residual bundle, PLUS the printed-block extras — a
    single full-N forward serves everything (avoids per-op remote
    dispatches)."""
    pred_norm, _ = mlp_forward(params["mlp"], x_test, train=False)
    y_real = sy.inverse(y_test)[:, 0]
    p_real = sy.inverse(pred_norm)[:, 0]
    bundle = all_residuals(params, x_test, pred_norm, sx, sy)
    return y_real, p_real, bundle, _printed_extras(params, x_test, pred_norm, sx, sy)


@jax.jit
def _printed_stats_device(params: PinnParams, x_test, sx, sy):
    """Printed-block extras alone (the results-array fast path already has
    everything else materialized)."""
    pred_norm, _ = mlp_forward(params["mlp"], x_test, train=False)
    return _printed_extras(params, x_test, pred_norm, sx, sy)


def evaluate_voltage_metrics(
    params: PinnParams,
    dataset: FuelCellDataset,
    results: Optional[ComprehensiveResults] = None,
) -> Dict[str, float]:
    """MAE / RMSE / R² / max-abs-err of the de-normalized voltage prediction
    plus physics-residual statistics (reference metric block, 01:1765-1818).

    Temperature statistics (``temp_*``) come from the FULL Euler residual
    ``net_f_T`` exactly as the reference's printed block does (01:1670 →
    smoothed at 01:1776-1782); export column 14 intentionally stays the
    simple model (01:1953) — the two deliberately differ upstream, so
    ``temp_mae_simple`` reports that column's statistic separately.

    With ``results`` (a freshly built ComprehensiveResults for the same
    params/dataset), the export-derivable columns come from the already-
    materialized array — the exporter's MC pred_mean IS the eval-mode
    prediction (01:1480) — avoiding a redundant full-N forward + residual
    device program; only the Euler/target-ratio extras run a (cached)
    device program of their own."""
    if results is not None:
        arr = results.array
        y_real, p_real = arr[:, 8], arr[:, 9]
        f_v, f_t_col, f_h, f_o = arr[:, 13], arr[:, 14], arr[:, 15], arr[:, 16]
        ratio_h, ratio_o = arr[:, 20], arr[:, 21]
        f_t_euler, target_h, target_o = (
            np.asarray(a)
            for a in _printed_stats_device(
                params, dataset.x_test, dataset.scaler_x, dataset.scaler_y
            )
        )
    else:
        y_real, p_real, bundle, extras = _metrics_device(
            params, dataset.x_test, dataset.y_test,
            dataset.scaler_x, dataset.scaler_y,
        )
        y_real = np.asarray(y_real)
        p_real = np.asarray(p_real)
        bundle = jax.tree_util.tree_map(np.asarray, bundle)
        f_v, f_t_col = bundle.f_v[:, 0], bundle.f_t[:, 0]
        f_h, f_o = bundle.f_h[:, 0], bundle.f_o[:, 0]
        ratio_h, ratio_o = bundle.ratio_h[:, 0], bundle.ratio_o[:, 0]
        f_t_euler, target_h, target_o = (np.asarray(a) for a in extras)
    err = y_real - p_real
    ss_res = float(np.sum(err**2))
    ss_tot = float(np.sum((y_real - y_real.mean()) ** 2))

    # normal-segment-only fit: the model trains on normal operation only, so
    # all-row metrics are dominated by the (desired) fault-row mismatch
    n_norm = dataset.info.normal_samples
    e_n = err[:n_norm]
    y_n = y_real[:n_norm]
    ss_tot_n = float(np.sum((y_n - y_n.mean()) ** 2))

    # smoothed EULER temperature residual (reference uses np.convolve 'same'
    # with window 100 purely for this statistic, 01:1776-1782, default
    # 01:2197; shorter-than-window series pass through unsmoothed, 01:1777)
    w = 100
    f_t_smooth = (
        np.convolve(f_t_euler, np.ones(w) / w, mode="same")
        if len(f_t_euler) >= w
        else f_t_euler
    )

    return {
        "voltage_mae": float(np.mean(np.abs(err))),
        "voltage_rmse": float(np.sqrt(np.mean(err**2))),
        "voltage_r2": 1.0 - ss_res / ss_tot if ss_tot > 0 else float("nan"),
        "voltage_max_abs_err": float(np.max(np.abs(err))),
        "voltage_mae_normal": float(np.mean(np.abs(e_n))),
        "voltage_r2_normal": (
            1.0 - float(np.sum(e_n**2)) / ss_tot_n if ss_tot_n > 0 else float("nan")
        ),
        "physics_v_mae": float(np.mean(np.abs(f_v))),
        "physics_v_rmse": float(np.sqrt(np.mean(f_v**2))),
        # printed temperature block = full Euler net_f_T (01:1670, 01:1786)
        "temp_mae": float(np.mean(np.abs(f_t_euler))),
        "temp_rmse": float(np.sqrt(np.mean(f_t_euler**2))),
        "temp_mae_smooth": float(np.mean(np.abs(f_t_smooth))),
        "temp_rmse_smooth": float(np.sqrt(np.mean(f_t_smooth**2))),
        # export-column (simple-model) statistic, kept for the artifact's sake
        "temp_mae_simple": float(np.mean(np.abs(f_t_col))),
        "hydrogen_mae": float(np.mean(np.abs(f_h))),
        "hydrogen_rmse": float(np.sqrt(np.mean(f_h**2))),
        "oxygen_mae": float(np.mean(np.abs(f_o))),
        "oxygen_rmse": float(np.sqrt(np.mean(f_o**2))),
        # excess-ratio ranges, printed by the reference (01:1810-1816)
        "ratio_h_min": float(np.min(ratio_h)),
        "ratio_h_max": float(np.max(ratio_h)),
        "ratio_h_target_min": float(np.min(target_h)),
        "ratio_h_target_max": float(np.max(target_h)),
        "ratio_o_min": float(np.min(ratio_o)),
        "ratio_o_max": float(np.max(ratio_o)),
        "ratio_o_target_min": float(np.min(target_o)),
        "ratio_o_target_max": float(np.max(target_o)),
    }


def run_training_pipeline(
    config: TrainConfig = TrainConfig(),
    dataset: Optional[FuelCellDataset] = None,
    campaign=None,
    mat_path: Optional[str] = None,
    n_normal: int = 6000,
    n_fault: int = 800,
    verbose: bool = False,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    ckpt_every: Optional[int] = None,
) -> PipelineResult:
    """Execute the full stage-01 pipeline.  Data source precedence:
    ``dataset`` (pre-built) > ``campaign`` (a ``CampaignConfig`` pointing at
    real .mat files, reference 01:2055-2135) > synthetic generator.  With
    ``mesh``, staged training runs data-parallel over the mesh's 'data'
    axis (see run_schedule).  ``checkpoint_dir``/``ckpt_every`` enable
    preemption-safe training: snapshots per stage, or per ``ckpt_every``
    steps within each stage (kill/resume reproduces the trajectory
    bit-for-bit — see run_schedule)."""
    timings: Dict[str, float] = {}

    t0 = time.perf_counter()
    if dataset is None and campaign is not None:
        from pinnfc_tpu.data.campaign import load_campaign_dataset

        dataset = load_campaign_dataset(campaign)
        if verbose:
            print(
                f"campaign: {dataset.info.normal_samples} normal rows + "
                f"{len(dataset.info.segment_labels)} fault segments "
                f"({dataset.info.fault_samples} rows)"
            )
    if dataset is None:
        normal, faults = synthesize_stack_data(
            n_normal=n_normal, n_fault=n_fault, seed=config.seed
        )
        dataset = combine_and_normalize(
            normal, faults, training_rate=config.training_rate, seed=config.seed
        )
    timings["data_s"] = time.perf_counter() - t0

    # init stays on threefry (weight init is a one-off and seed-stable across
    # impls is not required); training/MC dropout keys use the configured
    # generator — 'rbg' is much faster on TPU for mask generation.
    init_key = jax.random.PRNGKey(config.seed)
    rng = jax.random.key(config.seed + 1, impl=config.model.rng_impl)
    train_key, mc_key = jax.random.split(rng)
    params = init_pinn(init_key, config.model.layers)

    t0 = time.perf_counter()
    params, log = run_schedule(
        params,
        dataset.x_train,
        dataset.y_train,
        dataset.scaler_x,
        dataset.scaler_y,
        schedule=config.schedule,
        rng=train_key,
        dropout_p=config.model.dropout_p,
        verbose=verbose,
        mesh=mesh,
        checkpoint_dir=checkpoint_dir,
        ckpt_every=ckpt_every,
        precision=config.model.precision,
        skip_nonfinite=config.skip_nonfinite,
    )
    jax.block_until_ready(params)
    timings["train_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    results = build_comprehensive_results(
        params,
        dataset,
        rng=mc_key,
        mc_times=config.mc_times,
        dropout=config.mc_dropout,
        smooth_window=config.smooth_window,
        mesh=mesh,
    )
    timings["export_s"] = time.perf_counter() - t0

    metrics = evaluate_voltage_metrics(params, dataset, results=results)
    metrics.update({f"final_loss/{k}": v for k, v in log.final_losses().items()})

    if mat_path is not None:
        save_comprehensive_results(results, mat_path)

    return PipelineResult(
        params=params,
        dataset=dataset,
        results=results,
        log=log,
        metrics=metrics,
        timings=timings,
    )
