"""Figure smoke tests: every plot function writes a valid PNG."""

import os

import numpy as np
import pytest

from pinnfc_tpu.config import RiskConfig
from pinnfc_tpu.data.contract import INDEX


@pytest.fixture(scope="module")
def fake_results():
    rng = np.random.RandomState(0)
    n = 400
    arr = np.zeros((n, 22))
    arr[:, INDEX["y_true"]] = 4.0 + 0.05 * rng.randn(n)
    arr[:, INDEX["y_pred"]] = 4.0 + 0.05 * rng.randn(n)
    arr[:, INDEX["ale"]] = np.abs(rng.randn(n)) * 0.01
    arr[:, INDEX["epi"]] = np.abs(rng.randn(n)) * 0.01
    arr[:, INDEX["pV"]] = 0.05 * rng.randn(n)
    arr[:, INDEX["label"]] = np.repeat([0, 1, 2, 3], 100)
    arr[:, INDEX["x0"]] = 108.0
    return arr


def _check(path):
    assert os.path.exists(path) and os.path.getsize(path) > 1000


class TestPlots:
    def test_uncertainty(self, fake_results, tmp_path):
        from pinnfc_tpu.viz import plot_uncertainty

        path_a, path_b = plot_uncertainty(
            fake_results, [100, 200, 300, 400], str(tmp_path / "u.png")
        )
        _check(path_a)
        _check(path_b)
        assert path_a.endswith("u_aleatoric.png")
        assert path_b.endswith("u_epistemic.png")

    def test_rolling_mean_matches_pandas(self):
        import pandas as pd

        from pinnfc_tpu.viz.plots import _rolling_mean_centered

        rng = np.random.RandomState(1)
        x = rng.randn(300)
        want = pd.Series(x).rolling(50, center=True, min_periods=1).mean().values
        np.testing.assert_allclose(_rolling_mean_centered(x, 50), want)

    def test_fault_prob_figure_and_name(self, tmp_path):
        from types import SimpleNamespace

        from pinnfc_tpu.viz import fault_prob_filename, plot_fault_probabilities

        assert fault_prob_filename("水淹") == "prob_flooding.png"
        assert fault_prob_filename("氢饥饿") == "prob_hydrogen_starvation.png"
        rng = np.random.RandomState(0)
        res = SimpleNamespace(
            y_true=np.repeat([0, 1, 2, 3], 50),
            y_prob=rng.dirichlet(np.ones(4), 200),
            class_names=["水淹", "氧饥饿", "膜干", "氢饥饿"],
        )
        _check(plot_fault_probabilities(res, 0, str(tmp_path / "p.png")))

    def test_detailed(self, fake_results, tmp_path):
        from pinnfc_tpu.viz import plot_detailed_results

        _check(plot_detailed_results(fake_results, str(tmp_path / "d.png")))

    def test_split_overview(self, fake_results, tmp_path):
        from pinnfc_tpu.viz import plot_split_overview

        _check(plot_split_overview(fake_results, [100, 400], str(tmp_path / "s.png")))

    def test_confusion(self, tmp_path):
        from pinnfc_tpu.viz import plot_confusion_matrix

        cm = np.array([[40, 2, 1, 0], [3, 35, 5, 0], [0, 1, 44, 2], [1, 0, 2, 39]])
        _check(plot_confusion_matrix(cm, ["a", "b", "c", "d"], str(tmp_path / "c.png")))

    def test_metrics_bars(self, tmp_path):
        from pinnfc_tpu.viz import plot_metrics_bars

        summary = {
            "GMM": dict(accuracy=0.8, precision_macro=0.79, recall_macro=0.8, f1_macro=0.79),
            "LR": dict(accuracy=0.9, precision_macro=0.91, recall_macro=0.9, f1_macro=0.9),
        }
        _check(plot_metrics_bars(summary, str(tmp_path / "m.png")))

    def test_feature_scatter(self, tmp_path, rng):
        from pinnfc_tpu.viz import plot_feature_scatter

        x2d = rng.randn(200, 2)
        labels = rng.randint(0, 3, 200)
        _check(plot_feature_scatter(x2d, labels, str(tmp_path / "f.png"), ["a", "b", "c"]))

    def test_temp_comparison(self, fake_results, tmp_path):
        """The reference main's inline true-vs-physics temperature figure
        (01:2208-2228): col 5 vs col 19 with boundary vlines."""
        from pinnfc_tpu.viz import plot_temp_comparison

        arr = fake_results.copy()
        arr[:, INDEX["x5"]] = 60.0 + np.linspace(0, 5, len(arr))
        arr[:, 19] = 60.0 + np.linspace(0, 5, len(arr)) + 0.5
        _check(plot_temp_comparison(arr, str(tmp_path / "tc.png"), [100, 400]))

    def test_scatter_by_features_direct_and_tsne(self, fake_results, tmp_path):
        """plot_scatter_by_features (02:287-433): 2 features plot the raw
        dims; >2 features go through the t-SNE embedding first."""
        from pinnfc_tpu.viz import plot_scatter_by_features

        spec = "正常:0 | 故障:1,2,3"
        _check(plot_scatter_by_features(
            fake_results, "res,epi", spec, str(tmp_path / "s2.png")
        ))
        arr = fake_results[::4].copy()  # keep the t-SNE path quick
        arr[:, INDEX["x3"]] = np.linspace(0, 1, len(arr))
        _check(plot_scatter_by_features(
            arr, "x0,x3,x4,x5", spec, str(tmp_path / "s4.png")
        ))
        with pytest.raises(ValueError, match="at least 2"):
            plot_scatter_by_features(
                fake_results, "res", spec, str(tmp_path / "s1.png")
            )

    def test_rf_condition(self, fake_results, tmp_path):
        from pinnfc_tpu.risk import compute_rf_advance_for_condition, estimate_mu_sigma_normal
        from pinnfc_tpu.viz import plot_rf_condition

        cfg = RiskConfig()
        arr = fake_results.copy()
        arr[100:200, INDEX["res"]] = np.linspace(0, 5, 100)
        mu, sigma = estimate_mu_sigma_normal(arr)
        adv = compute_rf_advance_for_condition(arr, mu, sigma, "水淹", 108.0, cfg)
        assert adv is not None
        _check(
            plot_rf_condition(
                adv, cfg.warn_threshold, cfg.danger_threshold, str(tmp_path / "rf.png")
            )
        )

    def test_rf_attribution(self, fake_results, tmp_path):
        from pinnfc_tpu.risk import (
            compute_rf_advance_for_condition,
            estimate_mu_sigma_normal,
        )
        from pinnfc_tpu.viz import plot_rf_attribution

        cfg = RiskConfig()
        arr = fake_results.copy()
        arr[100:200, INDEX["res"]] = np.linspace(0, 5, 100)
        mu, sigma = estimate_mu_sigma_normal(arr)
        adv = compute_rf_advance_for_condition(arr, mu, sigma, "水淹", 108.0, cfg)
        assert adv is not None and adv.layer_c
        _check(plot_rf_attribution(adv, str(tmp_path / "rf_attr.png")))

    def test_tsne_embed(self, rng):
        from pinnfc_tpu.viz import tsne_embed

        x = rng.randn(60, 4)
        out = tsne_embed(x, perplexity=10)
        assert out.shape == (60, 2)
