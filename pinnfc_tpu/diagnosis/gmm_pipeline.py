"""Unsupervised 4-class GMM fault diagnosis (reference script 03).

Fit a 20-component full-covariance GMM (on-device EM) on the four physics
residuals, calibrate ``P(fault | component)`` from train labels, map test
responsibilities to class probabilities (03:360-426), report metrics and the
per-fault probability series (03:209-356).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import numpy as np

from pinnfc_tpu.config import GmmConfig
from pinnfc_tpu.data.contract import ComprehensiveResults
from pinnfc_tpu.diagnosis.features import (
    build_label_mapper,
    extract_X_y,
    parse_features,
    parse_group_spec,
)
from pinnfc_tpu.diagnosis.gmm import GMMParams, gmm_fit, gmm_predict_proba
from pinnfc_tpu.diagnosis.metrics import (
    accuracy_score,
    classification_report_dict,
    confusion_matrix,
)
from pinnfc_tpu.diagnosis.posterior import calibrate_components, posterior_probabilities
from pinnfc_tpu.diagnosis.splits import stratified_split


@dataclasses.dataclass
class GmmDiagnosisResult:
    accuracy: float
    confusion: np.ndarray
    report: Dict
    y_prob: np.ndarray  # (n_te, K)
    y_pred: np.ndarray
    y_true: np.ndarray
    test_full_indices: np.ndarray  # test rows → full-array positions (03:562-569)
    comp_fault_prob: np.ndarray
    class_names: List[str]
    model: GMMParams  # the fitted mixture (reused by serving.DiagnosisHead)
    features: str  # the feature spec the mixture was fitted on


def run_gmm_pipeline(
    results,
    config: GmmConfig = GmmConfig(),
    seed: Optional[int] = None,
    mesh=None,
) -> GmmDiagnosisResult:
    """Script-03 main (03:513-591).  With ``mesh``, the EM fit row-shards
    the training samples over the mesh's 'data' axis (padded rows at
    exactly zero weight — parallel.diagnosis.gmm_fit_dp)."""
    arr = results.array if isinstance(results, ComprehensiveResults) else np.asarray(results)
    groups = parse_group_spec(config.group_spec)
    label_map, class_names = build_label_mapper(groups)
    n_classes = len(class_names)

    feat_idx = parse_features(config.features)
    x, y, full_idx = extract_X_y(arr, feat_idx, label_map, return_indices=True)

    idx = np.arange(len(x))
    x_tr, x_te, y_tr, y_te, _, idx_te = stratified_split(
        x, y, idx, y=y, test_size=config.test_size, random_state=config.random_state
    )

    n_components = config.n_components_factor * n_classes  # 5×4 = 20 (03:548)
    key = jax.random.PRNGKey(config.random_state if seed is None else seed)
    init_resp = None
    if config.init == "sklearn":
        from pinnfc_tpu.diagnosis.gmm import sklearn_kmeans_init_resp

        init_resp = sklearn_kmeans_init_resp(
            x_tr, n_components, config.random_state if seed is None else seed
        )
    elif config.init != "kmeans":
        raise ValueError(f"GmmConfig.init must be 'kmeans' or 'sklearn', got {config.init!r}")
    if mesh is not None:
        from pinnfc_tpu.parallel.diagnosis import gmm_fit_dp

        import jax.numpy as jnp

        model = gmm_fit_dp(
            x_tr,
            key,
            n_components=n_components,
            mesh=mesh,
            max_iter=config.max_iter,
            tol=config.tol,
            reg_covar=config.reg_covar,
            init_resp=init_resp,
            dtype=jnp.dtype(config.dtype).type,
        )
    else:
        import jax.numpy as jnp

        model = gmm_fit(
            x_tr,
            key,
            n_components=n_components,
            max_iter=config.max_iter,
            tol=config.tol,
            reg_covar=config.reg_covar,
            # cast HOST-side: a f64 jnp.asarray is an eager on-device
            # convert (~10-17 s remote compile on relay TPUs, CLAUDE.md);
            # the mesh branch does the same in gmm_fit_dp
            init_resp=(None if init_resp is None
                       else np.asarray(init_resp, config.dtype)),
            dtype=jnp.dtype(config.dtype).type,
        )
    resp_tr = np.asarray(gmm_predict_proba(model, x_tr))
    comp_fault_prob = calibrate_components(resp_tr, y_tr, n_classes)
    resp_te = np.asarray(gmm_predict_proba(model, x_te))
    y_prob, y_pred = posterior_probabilities(resp_te, comp_fault_prob)

    return GmmDiagnosisResult(
        accuracy=accuracy_score(y_te, y_pred),
        confusion=confusion_matrix(y_te, y_pred, n_classes),
        report=classification_report_dict(y_te, y_pred, class_names),
        y_prob=y_prob,
        y_pred=np.asarray(y_pred),
        y_true=np.asarray(y_te),
        test_full_indices=full_idx[idx_te],
        comp_fault_prob=comp_fault_prob,
        class_names=class_names,
        model=model,
        features=config.features,
    )
