from pinnfc_tpu.diagnosis.features import (
    build_label_mapper,
    extract_X_y,
    list_available_features,
    normalize_feature_spec,
    parse_features,
    parse_group_spec,
)
from pinnfc_tpu.diagnosis.metrics import (
    accuracy_score,
    auc,
    classification_report_dict,
    compute_macro_metrics,
    confusion_matrix,
    precision_recall_f1,
    roc_auc_score,
    roc_curve,
)
from pinnfc_tpu.diagnosis.posterior import (
    calibrate_components,
    hard_responsibilities,
    posterior_probabilities,
)
from pinnfc_tpu.diagnosis.gmm import (
    GMMParams,
    gmm_fit,
    gmm_predict_proba,
    gmm_score_samples,
    sklearn_kmeans_init_resp,
)
from pinnfc_tpu.diagnosis.kmeans import KMeansResult, kmeans_fit, kmeans_predict
from pinnfc_tpu.diagnosis.logreg import (
    LogRegModel,
    explain_coefficients,
    logreg_fit,
    logreg_predict,
    logreg_predict_proba,
)
from pinnfc_tpu.diagnosis.isoforest import IsoForest, isoforest_fit, isoforest_score
from pinnfc_tpu.diagnosis.spectral import SpectralResult, spectral_fit
from pinnfc_tpu.diagnosis.ward import WardResult, ward_fit
from pinnfc_tpu.diagnosis.svm import SVMModel, svm_fit, svm_predict
from pinnfc_tpu.diagnosis.tsne import TsneResult, tsne_fit
from pinnfc_tpu.diagnosis.auc import AucPipelineResult, GroupAucResult, run_auc_pipeline
from pinnfc_tpu.diagnosis.gmm_pipeline import GmmDiagnosisResult, run_gmm_pipeline
from pinnfc_tpu.diagnosis.compare import CompareResult, MethodResult, run_compare_pipeline

__all__ = [
    "build_label_mapper",
    "extract_X_y",
    "list_available_features",
    "normalize_feature_spec",
    "parse_features",
    "parse_group_spec",
    "accuracy_score",
    "auc",
    "classification_report_dict",
    "compute_macro_metrics",
    "confusion_matrix",
    "precision_recall_f1",
    "roc_auc_score",
    "roc_curve",
    "calibrate_components",
    "hard_responsibilities",
    "posterior_probabilities",
    "GMMParams",
    "gmm_fit",
    "sklearn_kmeans_init_resp",
    "gmm_predict_proba",
    "gmm_score_samples",
    "KMeansResult",
    "kmeans_fit",
    "kmeans_predict",
    "LogRegModel",
    "explain_coefficients",
    "logreg_fit",
    "logreg_predict",
    "logreg_predict_proba",
    "IsoForest",
    "isoforest_fit",
    "isoforest_score",
    "SpectralResult",
    "spectral_fit",
    "WardResult",
    "ward_fit",
    "SVMModel",
    "svm_fit",
    "svm_predict",
    "TsneResult",
    "tsne_fit",
    "AucPipelineResult",
    "GroupAucResult",
    "run_auc_pipeline",
    "GmmDiagnosisResult",
    "run_gmm_pipeline",
    "CompareResult",
    "MethodResult",
    "run_compare_pipeline",
]
