from pinnfc_tpu.viz.plots import (
    plot_confusion_matrix,
    plot_detailed_results,
    plot_fault_probabilities,
    plot_feature_scatter,
    plot_metrics_bars,
    plot_res_vs_epi,
    plot_rf_condition,
    plot_roc_curves,
    plot_split_overview,
    plot_temp_vs_voltage,
    plot_uncertainty,
    tsne_embed,
)

__all__ = [
    "plot_confusion_matrix",
    "plot_detailed_results",
    "plot_fault_probabilities",
    "plot_feature_scatter",
    "plot_metrics_bars",
    "plot_res_vs_epi",
    "plot_rf_condition",
    "plot_roc_curves",
    "plot_split_overview",
    "plot_temp_vs_voltage",
    "plot_uncertainty",
    "tsne_embed",
]
