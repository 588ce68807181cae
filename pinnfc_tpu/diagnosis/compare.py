"""Six-method 4-class fault-diagnosis comparison (reference script 05).

Methods, each wrapped with the shared posterior label calibration
(pinnfc_tpu.diagnosis.posterior):

1. GMM posterior        — on-device EM (05:229-279, components = 5×4)
2. Supervised LR        — on-device L-BFGS (05:284-309)
3. Linear SVM           — on-device OvO squared-hinge (05:314-341; the
                          reference's "RBF" docstring is wrong, kernel IS
                          linear — quirk preserved)
4. KMeans posterior     — on-device Lloyd, hard calibration (05:346-393)
5. Agglomerative (Ward) — on-device by default (fixed-trip fori_loop over
                          masked (N,N) merge costs, diagnosis/ward.py —
                          merge order identical to sklearn); sklearn via
                          ``device_ward=False`` (05:398-450)
6. Spectral             — on-device by default (kNN affinity + Laplacian
                          eigh + vmapped k-means, diagnosis/spectral.py);
                          sklearn via ``device_spectral=False`` (05:455-512)

With the defaults, every one of the six methods runs on device.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pinnfc_tpu.config import CompareConfig, GmmConfig
from pinnfc_tpu.data.contract import ComprehensiveResults
from pinnfc_tpu.diagnosis.features import (
    build_label_mapper,
    extract_X_y,
    parse_features,
    parse_group_spec,
)
from pinnfc_tpu.diagnosis.gmm import gmm_fit, gmm_predict_proba
from pinnfc_tpu.diagnosis.kmeans import kmeans_fit, kmeans_predict
from pinnfc_tpu.diagnosis.logreg import logreg_fit, logreg_predict
from pinnfc_tpu.diagnosis.metrics import (
    compute_macro_metrics,
    classification_report_dict,
    confusion_matrix,
)
from pinnfc_tpu.diagnosis.posterior import (
    calibrate_components,
    hard_responsibilities,
    posterior_probabilities,
)
from pinnfc_tpu.diagnosis.splits import stratified_split
from pinnfc_tpu.diagnosis.svm import svm_fit, svm_predict


@dataclasses.dataclass
class MethodResult:
    name: str
    y_pred: np.ndarray
    metrics: Dict[str, float]
    confusion: np.ndarray
    report: Dict


@dataclasses.dataclass
class CompareResult:
    methods: List[MethodResult]
    y_true: np.ndarray
    class_names: List[str]

    def summary_table(self) -> Dict[str, Dict[str, float]]:
        return {m.name: m.metrics for m in self.methods}


def _centers_from_assignments(x, assign, n_clusters):
    """Synthetic cluster centers = per-cluster means (05:419-425)."""
    centers = np.zeros((n_clusters, x.shape[1]))
    for c in range(n_clusters):
        m = assign == c
        if m.any():
            centers[c] = x[m].mean(axis=0)
    return centers


def _nearest_center(x, centers):
    # reuse the MXU-shaped kmeans assignment (the naive (N, C, D) broadcast
    # materializes a large temp at campaign scale and lacks the d2>=0 clamp)
    import numpy as np

    from pinnfc_tpu.diagnosis.kmeans import kmeans_predict

    return np.asarray(kmeans_predict(jnp.asarray(centers, jnp.float32), x))


def run_compare_pipeline(
    results,
    config: CompareConfig = CompareConfig(),
    gmm_config: GmmConfig = GmmConfig(),
    methods: Optional[List[str]] = None,
    device_spectral: bool = True,
    device_ward: bool = True,
) -> CompareResult:
    """Script-05 main (05:614-707)."""
    arr = results.array if isinstance(results, ComprehensiveResults) else np.asarray(results)
    groups = parse_group_spec(gmm_config.group_spec)
    label_map, class_names = build_label_mapper(groups)
    k = len(class_names)

    feat_idx = parse_features(gmm_config.features)
    x, y = extract_X_y(arr, feat_idx, label_map)
    x_tr, x_te, y_tr, y_te = stratified_split(
        x, y, y=y, test_size=config.test_size, random_state=config.random_state
    )

    todo = methods or ["gmm", "logreg", "svm", "kmeans", "agglomerative", "spectral"]
    out: List[MethodResult] = []
    key = jax.random.PRNGKey(config.random_state)

    def add(name, y_pred):
        y_pred = np.asarray(y_pred)
        out.append(
            MethodResult(
                name=name,
                y_pred=y_pred,
                metrics=compute_macro_metrics(y_te, y_pred, k),
                confusion=confusion_matrix(y_te, y_pred, k),
                report=classification_report_dict(y_te, y_pred, class_names),
            )
        )

    if "gmm" in todo:
        n_comp = config.gmm_components_factor * k
        model = gmm_fit(x_tr, key, n_components=n_comp)
        resp_tr = np.asarray(gmm_predict_proba(model, x_tr))
        cal = calibrate_components(resp_tr, y_tr, k)
        _, y_pred = posterior_probabilities(
            np.asarray(gmm_predict_proba(model, x_te)), cal
        )
        add("GMM", y_pred)

    if "logreg" in todo:
        lr = logreg_fit(x_tr, y_tr, n_classes=k, balanced=True)
        add("Supervised_LR", logreg_predict(lr, x_te))

    if "svm" in todo:
        svm = svm_fit(x_tr, y_tr, n_classes=k, c_svm=config.svm_c, balanced=True)
        add("Supervised_SVM", svm_predict(svm, x_te))

    if "kmeans" in todo:
        n_clusters = config.kmeans_clusters_factor * k
        km = kmeans_fit(x_tr, key, n_clusters=n_clusters)
        cal = calibrate_components(
            hard_responsibilities(np.asarray(km.assignments), n_clusters), y_tr, k
        )
        assign_te = np.asarray(kmeans_predict(km.centers, x_te))
        _, y_pred = posterior_probabilities(
            hard_responsibilities(assign_te, n_clusters), cal
        )
        add("KMeans", y_pred)

    if "agglomerative" in todo:
        n_clusters = config.agglo_clusters_factor * k
        if device_ward:
            from pinnfc_tpu.diagnosis.ward import ward_fit

            assign_tr = np.asarray(ward_fit(x_tr, n_clusters).assignments)
        else:
            from sklearn.cluster import AgglomerativeClustering

            agg = AgglomerativeClustering(n_clusters=n_clusters, linkage="ward")
            assign_tr = agg.fit_predict(x_tr)
        centers = _centers_from_assignments(x_tr, assign_tr, n_clusters)
        cal = calibrate_components(
            hard_responsibilities(assign_tr, n_clusters), y_tr, k
        )
        _, y_pred = posterior_probabilities(
            hard_responsibilities(_nearest_center(x_te, centers), n_clusters), cal
        )
        add("Agglomerative", y_pred)

    if "spectral" in todo:
        n_clusters = config.spectral_clusters_factor * k
        if device_spectral:
            from pinnfc_tpu.diagnosis.spectral import spectral_fit

            assign_tr = np.asarray(
                spectral_fit(
                    x_tr, key, n_clusters,
                    n_neighbors=config.spectral_n_neighbors,
                ).assignments
            )
        else:
            from sklearn.cluster import SpectralClustering

            spec = SpectralClustering(
                n_clusters=n_clusters,
                affinity="nearest_neighbors",
                n_neighbors=config.spectral_n_neighbors,
                assign_labels="kmeans",
                random_state=config.random_state,
            )
            assign_tr = spec.fit_predict(x_tr)
        centers = _centers_from_assignments(x_tr, assign_tr, n_clusters)
        cal = calibrate_components(
            hard_responsibilities(assign_tr, n_clusters), y_tr, k
        )
        _, y_pred = posterior_probabilities(
            hard_responsibilities(_nearest_center(x_te, centers), n_clusters), cal
        )
        add("Spectral", y_pred)

    return CompareResult(methods=out, y_true=np.asarray(y_te), class_names=class_names)
