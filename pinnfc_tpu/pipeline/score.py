"""Offline scoring: a NEW campaign through an EXISTING checkpoint.

The reference has no equivalent — script 01 always retrains before it can
export an artifact (`/root/reference/01_train_pinn_multiphysics_model.py:2143-2187`),
so a reference user who wants the downstream diagnostics (02/03/04/05) on a
fresh measurement campaign pays the full 42k-step schedule again.  Here a
trained model is a deployable asset: ``run_scoring_pipeline`` loads a
checkpoint (params + the TRAINING campaign's MinMax scalers), normalizes the
new measurements through those frozen scalers — the same normalized space
the model was trained in, exactly what the streaming ``OnlineMonitor`` does
per block — and runs the unchanged MC-dropout exporter to produce a full
22-column ``comprehensive_results`` artifact for the new data.

Scoring the model's own training campaign with the training seed reproduces
the train-time export bit-for-bit (regression-tested), because the stored
scalers equal the fit-time scalers and the MC key derivation below mirrors
``run_training_pipeline``'s.
"""

from __future__ import annotations

import dataclasses
import time
import warnings
from typing import Dict, Optional

import jax
import numpy as np

from pinnfc_tpu.config import TrainConfig
from pinnfc_tpu.data.combine import FuelCellDataset, combine_and_normalize
from pinnfc_tpu.data.contract import ComprehensiveResults, save_comprehensive_results
from pinnfc_tpu.data.synthetic import synthesize_stack_data
from pinnfc_tpu.models.pinn import PinnParams
from pinnfc_tpu.pipeline.export import build_comprehensive_results
from pinnfc_tpu.pipeline.train_pipeline import evaluate_voltage_metrics


# Distribution-shift alarm threshold: on the model's own training campaign
# the fit-on-normal-train MinMax scalers (01:266-274) place every normal
# row inside [-1, 1] by construction, so any sizable out-of-range fraction
# on a NEW campaign means its normal operating conditions drifted from the
# ones the checkpoint was trained on.
OOB_WARN_FRACTION = 0.05


def _normal_out_of_range_fraction(dataset: FuelCellDataset) -> float:
    """Fraction of NORMAL-labelled rows with any feature outside [-1, 1]
    after normalization through the (checkpoint's) scalers.  Fault rows are
    excluded — they exceed the range even in training, by design."""
    labels = dataset.info.fault_labels(int(dataset.x_test.shape[0]))
    x_normal = np.asarray(dataset.x_test)[labels == 0]
    if x_normal.size == 0:
        return 0.0
    tol = 1e-5  # f32 round-off on the affine transform
    out = np.any((x_normal < -1.0 - tol) | (x_normal > 1.0 + tol), axis=1)
    return float(np.mean(out))


@dataclasses.dataclass
class ScoreResult:
    params: PinnParams
    dataset: FuelCellDataset
    results: ComprehensiveResults
    metrics: Dict[str, float]
    timings: Dict[str, float]


def run_scoring_pipeline(
    ckpt_path: str,
    config: Optional[TrainConfig] = None,
    dataset: Optional[FuelCellDataset] = None,
    campaign=None,
    mat_path: Optional[str] = None,
    n_normal: int = 6000,
    n_fault: int = 800,
    verbose: bool = False,
    mesh=None,
) -> ScoreResult:
    """Checkpoint + new measurements → ``comprehensive_results`` artifact.

    Data source precedence matches ``run_training_pipeline``: ``dataset``
    (pre-built — must already be in the checkpoint's normalized space) >
    ``campaign`` (real .mat files) > synthetic generator.  Campaign and
    synthetic data are normalized through the CHECKPOINT's scalers, never
    re-fit.  ``config`` supplies the MC export settings (mc_times, dropout,
    smoothing window) and the seed for the MC key — the same derivation as
    training, so scoring the training campaign with the training seed is
    bit-exact against the train-time export.  With ``mesh``, MC sampling
    shards rows over the mesh's 'data' axis (see ``build_comprehensive_results``).

    ``config=None`` adopts the checkpoint's stored training config (the
    ``.meta.json`` provenance sidecar ``cli train --ckpt`` writes), falling
    back to ``TrainConfig()`` for pre-metadata checkpoints — "score like
    you trained" without restating any settings.
    """
    from pinnfc_tpu.utils.checkpoint import load_checkpoint, load_checkpoint_meta

    if config is None:
        meta = load_checkpoint_meta(ckpt_path)
        if meta is not None and "config" in meta:
            from pinnfc_tpu.config import train_config_from_dict

            config = train_config_from_dict(meta["config"])
        else:
            config = TrainConfig()

    timings: Dict[str, float] = {}

    t0 = time.perf_counter()
    ckpt = load_checkpoint(ckpt_path)
    if "scaler_x" not in ckpt or "scaler_y" not in ckpt:
        raise ValueError(
            f"checkpoint '{ckpt_path}' carries no scalers — it was saved "
            "without them, so the normalized space the model expects is "
            "unknown; re-save with save_checkpoint(..., scaler_x, scaler_y)"
        )
    params = ckpt["params"]
    scalers = (ckpt["scaler_x"], ckpt["scaler_y"])
    timings["ckpt_s"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    if dataset is None and campaign is not None:
        from pinnfc_tpu.data.campaign import load_campaign_dataset

        dataset = load_campaign_dataset(campaign, scalers=scalers)
        if verbose:
            print(
                f"campaign: {dataset.info.normal_samples} normal rows + "
                f"{len(dataset.info.segment_labels)} fault segments "
                f"({dataset.info.fault_samples} rows), normalized through "
                "the checkpoint's scalers"
            )
    if dataset is None:
        normal, faults = synthesize_stack_data(
            n_normal=n_normal, n_fault=n_fault, seed=config.seed
        )
        dataset = combine_and_normalize(
            normal, faults, training_rate=config.training_rate,
            seed=config.seed, scalers=scalers,
        )
    timings["data_s"] = time.perf_counter() - t0

    oob = _normal_out_of_range_fraction(dataset)
    if oob > OOB_WARN_FRACTION:
        warnings.warn(
            f"{oob:.1%} of the campaign's NORMAL rows fall outside the "
            "checkpoint scalers' [-1, 1] training range — the new campaign "
            "has drifted from the conditions this model was trained on; "
            "scores may be unreliable (consider retraining)",
            stacklevel=2,
        )
    if verbose:
        print(f"drift check: {oob:.2%} of normal rows outside the "
              "checkpoint's training range")

    # same key derivation as run_training_pipeline: scoring the training
    # campaign with the training seed reproduces the train-time export
    rng = jax.random.key(config.seed + 1, impl=config.model.rng_impl)
    _, mc_key = jax.random.split(rng)

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
    metrics["normal_oob_frac"] = oob

    if mat_path is not None:
        save_comprehensive_results(results, mat_path)

    return ScoreResult(
        params=params,
        dataset=dataset,
        results=results,
        metrics=metrics,
        timings=timings,
    )
