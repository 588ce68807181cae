"""End-to-end pipeline tests: training pipeline → 22-column export →
downstream AUC / GMM / compare pipelines (the full reference flow 01→02/03/05
on synthetic data)."""

import numpy as np
import pytest

from pinnfc_tpu.config import StageConfig, TrainConfig
from pinnfc_tpu.data import load_comprehensive_results, save_comprehensive_results
from pinnfc_tpu.data.contract import INDEX
from pinnfc_tpu.diagnosis import run_auc_pipeline, run_compare_pipeline, run_gmm_pipeline
from pinnfc_tpu.pipeline import run_training_pipeline


@pytest.fixture(scope="module")
def pipeline_result():
    sched = (
        StageConfig("dnn", 400, lr=0.01),
        StageConfig("lambda_v", 60, lr=1e-3, dnn_para=False),
        StageConfig("lambda_v", 60, lr=1e-3, dnn_para=True),
        StageConfig("dnn", 400, lr=0.01),
        StageConfig("thermal", 200, lr=1.0),
        StageConfig("hydrogen", 100, lr=0.1, lr_gamma=0.9),
        StageConfig("oxygen", 100, lr=0.01, lr_gamma=0.9),
    )
    cfg = TrainConfig(schedule=sched, mc_times=60, seed=0)
    return run_training_pipeline(cfg, n_normal=600, n_fault=100)


class TestTrainingPipeline:
    def test_results_shape_and_finite(self, pipeline_result):
        arr = pipeline_result.results.array
        assert arr.shape == (600 + 12 * 100, 22)
        assert np.isfinite(arr).all()

    def test_labels_match_segments(self, pipeline_result):
        labels = pipeline_result.results.labels
        assert (labels[:600] == 0).all()
        for k in range(12):
            seg = labels[600 + k * 100 : 600 + (k + 1) * 100]
            assert (seg == k + 1).all()

    def test_residual_identity(self, pipeline_result):
        """col 12 == col 8 − col 9 exactly (01:1940)."""
        arr = pipeline_result.results.array
        np.testing.assert_allclose(
            arr[:, INDEX["res"]],
            arr[:, INDEX["y_true"]] - arr[:, INDEX["y_pred"]],
            atol=1e-9,
        )

    def test_inputs_denormalized(self, pipeline_result):
        """col 0 is the stack current in amps, not normalized units."""
        current = pipeline_result.results.col("x0")
        assert current.min() > 40 and current.max() < 800

    def test_voltage_fit_quality(self, pipeline_result):
        """The model trains on normal rows only, so fit quality is judged on
        the normal segment — all-row metrics are (deliberately) degraded by
        the fault rows the detector must flag."""
        m = pipeline_result.metrics
        assert m["voltage_r2_normal"] > 0.8
        assert m["voltage_mae_normal"] < 0.25

    def test_uncertainties_positive(self, pipeline_result):
        arr = pipeline_result.results.array
        assert (arr[:, INDEX["ale"]] > 0).all()
        assert (arr[:, INDEX["epi"]] >= 0).all()

    def test_mat_roundtrip(self, pipeline_result, tmp_path):
        path = str(tmp_path / "F01_output.mat")
        save_comprehensive_results(pipeline_result.results, path)
        loaded = load_comprehensive_results(path)
        np.testing.assert_allclose(loaded.array, pipeline_result.results.array)


class TestDownstreamPipelines:
    def test_auc_pipeline(self, pipeline_result):
        res = run_auc_pipeline(pipeline_result.results)
        assert len(res.groups) == 4
        for g in res.groups:
            assert 0.0 <= g.auc <= 1.0
        assert res.iso_auc is not None
        # residual-based features must beat chance on synthetic faults
        assert res.groups[0].auc > 0.6

    def test_gmm_pipeline(self, pipeline_result):
        res = run_gmm_pipeline(pipeline_result.results)
        assert res.y_prob.shape[1] == 4
        np.testing.assert_allclose(res.y_prob.sum(axis=1), 1.0, atol=1e-9)
        assert res.accuracy > 0.4  # 4-class, chance = 0.25
        assert res.confusion.sum() == len(res.y_true)
        # test_full_indices point at rows with mapped fault labels
        labels = pipeline_result.results.labels[res.test_full_indices]
        assert ((labels >= 1) & (labels <= 12)).all()

    def test_compare_pipeline_fast_methods(self, pipeline_result):
        res = run_compare_pipeline(
            pipeline_result.results, methods=["gmm", "logreg", "kmeans"]
        )
        names = [m.name for m in res.methods]
        assert names == ["GMM", "Supervised_LR", "KMeans"]
        for m in res.methods:
            assert 0.0 <= m.metrics["accuracy"] <= 1.0
            assert m.confusion.shape == (4, 4)
        # supervised LR should do decently on synthetic faults
        lr = res.methods[1]
        assert lr.metrics["accuracy"] > 0.5


class TestDeterminism:
    def test_same_seed_same_results(self):
        """Fixed PRNG keys → bit-identical pipeline output (SURVEY §5:
        determinism tests replace race detection for this workload)."""
        sched = (
            StageConfig("dnn", 40, lr=0.01),
            StageConfig("thermal", 40, lr=1.0),
        )
        cfg = TrainConfig(schedule=sched, mc_times=16, seed=123)
        a = run_training_pipeline(cfg, n_normal=200, n_fault=30)
        b = run_training_pipeline(cfg, n_normal=200, n_fault=30)
        np.testing.assert_array_equal(a.results.array, b.results.array)


class TestSklearnParity:
    def test_auc_pipeline_matches_sklearn_clone(self, pipeline_result):
        """The on-device LR AUC pipeline matches a sklearn clone of the
        reference (same split, StandardScaler→LogisticRegression) within
        optimizer tolerance."""
        from sklearn.linear_model import LogisticRegression
        from sklearn.model_selection import train_test_split
        from sklearn.pipeline import Pipeline
        from sklearn.preprocessing import StandardScaler

        from pinnfc_tpu.config import AucConfig
        from pinnfc_tpu.diagnosis import (
            build_label_mapper,
            extract_X_y,
            parse_features,
            parse_group_spec,
            roc_auc_score,
        )

        cfg = AucConfig()
        arr = pipeline_result.results.array
        groups = parse_group_spec(cfg.group_spec)
        label_map, _ = build_label_mapper(groups)
        feat_idx = parse_features(cfg.feature_groups[0])  # epi,res
        x, y = extract_X_y(arr, feat_idx, label_map)
        x_tr, x_te, y_tr, y_te = train_test_split(
            x, y, test_size=cfg.test_size, random_state=cfg.random_state,
            stratify=y,
        )
        sk = Pipeline(
            [("sc", StandardScaler()),
             ("lr", LogisticRegression(max_iter=1000, class_weight="balanced",
                                       random_state=cfg.random_state))]
        ).fit(x_tr, y_tr)
        sk_auc = roc_auc_score(
            (y_te != 0).astype(int), 1.0 - sk.predict_proba(x_te)[:, 0]
        )

        from pinnfc_tpu.diagnosis import run_auc_pipeline

        ours = run_auc_pipeline(pipeline_result.results, cfg).groups[0].auc
        assert ours == pytest.approx(sk_auc, abs=0.01)


class TestAllSixMethods:
    def test_compare_pipeline_all_methods(self, pipeline_result):
        """All six reference methods (05:614-707) run and produce sane
        metrics, including the CPU Ward/Spectral fallbacks."""
        res = run_compare_pipeline(pipeline_result.results)
        names = [m.name for m in res.methods]
        assert names == [
            "GMM", "Supervised_LR", "Supervised_SVM",
            "KMeans", "Agglomerative", "Spectral",
        ]
        for m in res.methods:
            assert 0.0 <= m.metrics["accuracy"] <= 1.0
            assert 0.0 <= m.metrics["f1_macro"] <= 1.0
            assert m.confusion.sum() == len(res.y_true)


class TestNoiseInjection:
    def test_pipeline_with_noise_config(self):
        """The data-level fault-injection plumbing (01:59-112 / SURVEY §5)
        works end-to-end through combine_and_normalize."""
        from pinnfc_tpu.data import combine_and_normalize, synthesize_stack_data

        normal, faults = synthesize_stack_data(n_normal=200, n_fault=30, seed=1)
        clean = combine_and_normalize(normal, faults, training_rate=1.0)
        noisy = combine_and_normalize(
            normal, faults, training_rate=1.0,
            noise_config=dict(noise_type="gaussian", noise_level=0.05,
                              noise_target="fault_only"),
        )
        assert noisy.info.noise_info is not None
        assert noisy.info.noise_info["affected_samples"] == 12 * 30
        # normal rows untouched; fault rows perturbed
        np.testing.assert_array_equal(
            np.asarray(clean.y_test[:200]), np.asarray(noisy.y_test[:200])
        )
        assert not np.allclose(
            np.asarray(clean.y_test[200:]), np.asarray(noisy.y_test[200:])
        )
