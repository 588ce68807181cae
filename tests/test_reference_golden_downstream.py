"""Golden parity against the ACTUAL reference scripts 01 (data layer),
02 (parsers/extractors) and 04 (risk function).

Extends test_reference_golden.py (script-01 model/training parity) to the
deterministic numpy layers of the pipeline: every function here is compared
to the importlib-loaded upstream implementation on identical inputs —
scripts 02/04 are pure numpy, so the comparison is exact.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REF_DIR = "/root/reference"
REF_01 = os.path.join(REF_DIR, "01_train_pinn_multiphysics_model.py")
REF_02 = os.path.join(REF_DIR, "02_fault_classification_auc.py.py")
REF_04 = os.path.join(REF_DIR, "04_risk_function_early_warning_index.py.py")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DIR), reason="reference checkout not mounted"
)


def _load(name, path):
    import matplotlib

    matplotlib.use("Agg")
    if name in sys.modules:
        return sys.modules[name]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)  # all mains are import-guarded
    return mod


@pytest.fixture(scope="module")
def ref01():
    return _load("ref01_golden_ds", REF_01)


@pytest.fixture(scope="module")
def ref02():
    return _load("ref02_golden", REF_02)


@pytest.fixture(scope="module")
def ref04():
    return _load("ref04_golden", REF_04)


@pytest.fixture(scope="module")
def fake_results():
    """22-col comprehensive_results with normal + fault structure."""
    from pinnfc_tpu.data.contract import INDEX

    rng = np.random.RandomState(5)
    n_normal, n_fault = 300, 40
    n = n_normal + 12 * n_fault
    arr = np.zeros((n, 22))
    for k in ("res", "pV", "pT", "pH", "pO"):
        arr[:, INDEX[k]] = 0.05 * rng.randn(n)
    arr[:, INDEX["epi"]] = 0.01 + 0.01 * rng.rand(n)
    arr[:, INDEX["y_true"]] = 4.0 + 0.05 * rng.randn(n)
    arr[:, INDEX["x0"]] = 108.0
    lab = np.zeros(n)
    for k in range(12):
        seg = slice(n_normal + k * n_fault, n_normal + (k + 1) * n_fault)
        lab[seg] = k + 1
        arr[seg, INDEX["res"]] += np.linspace(0.0, 2.0, n_fault)
    arr[:, INDEX["label"]] = lab
    return arr


class TestScript01DataLayer:
    def test_smooth_by_segments_golden(self, ref01):
        from pinnfc_tpu.ops.smoothing import smooth_by_segments

        rng = np.random.RandomState(0)
        v = rng.randn(300)
        for boundaries, window in (
            ([120, 200, 300], 37),
            ([300], 200),
            ([], 25),  # tolerance path: whole-array smoothing
            ([50, 280], 10),  # last boundary < n: tolerance path
        ):
            want = ref01.smooth_by_segments(v, list(boundaries), window)
            got = smooth_by_segments(v, list(boundaries), window)
            np.testing.assert_allclose(got, want, atol=1e-9)

    @pytest.mark.parametrize(
        "noise_type,noise_target",
        [("gaussian", "all"), ("uniform", "all"), ("gaussian", "random")],
    )
    def test_add_noise_golden(self, ref01, noise_type, noise_target):
        from pinnfc_tpu.data.noise import add_noise

        rng = np.random.RandomState(3)
        y = 4.0 + 0.2 * rng.randn(500, 1)
        want, want_info = ref01.add_noise_to_combined_data(
            y, noise_type=noise_type, noise_target=noise_target, seed=11
        )
        got, got_info = add_noise(
            y, noise_type=noise_type, noise_target=noise_target, seed=11
        )
        np.testing.assert_allclose(got, want, atol=1e-12)
        assert got_info["affected_samples"] == want_info["affected_samples"]

    def test_add_noise_fault_only_is_noop_without_length(self, ref01):
        """The reference leaves 'fault_only' unimplemented (mask stays empty,
        01:84-87); without ``normal_length`` ours must match that no-op."""
        from pinnfc_tpu.data.noise import add_noise

        y = np.linspace(3.0, 4.0, 100).reshape(-1, 1)
        want, _ = ref01.add_noise_to_combined_data(y, noise_target="fault_only", seed=1)
        got, _ = add_noise(y, noise_target="fault_only", seed=1)
        np.testing.assert_array_equal(got, want)
        np.testing.assert_array_equal(got, y)

    def test_combine_and_labels_golden(self, ref01):
        from pinnfc_tpu.data.combine import combine_and_normalize

        rng = np.random.RandomState(7)
        x_n = rng.uniform(0, 1, (200, 8)) * [300, 0.4, 4, 30, 30, 8, 38, 190] + [
            100, 0.1, 60, 40, 30, 62, 2, 10,
        ]
        y_n = rng.uniform(3.0, 4.5, (200, 1))
        faults = [
            (x_n[:60] * 1.1, y_n[:60] * 0.9, "水淹故障(108A)"),
            (x_n[:40] * 0.95, y_n[:40] * 0.85, "膜干故障(270A)"),
        ]
        ref_out = ref01.combine_and_normalize_datasets(
            normal_data=(x_n, y_n), fault_data_list=faults,
            training_rate=1, noise_config=None, seed=42,
        )
        x_tr_r, y_tr_r, x_te_r, y_te_r, sx_r, sy_r, info_r = ref_out

        ds = combine_and_normalize((x_n, y_n), faults, training_rate=1.0, seed=42)
        # fault rows fall outside the normal-fit [-1,1] range, where the f32
        # affine constants round at ~2e-6 absolute vs sklearn's f64
        np.testing.assert_allclose(
            np.asarray(ds.x_train), x_tr_r.numpy(), atol=5e-6
        )
        np.testing.assert_allclose(np.asarray(ds.y_train), y_tr_r.numpy(), atol=5e-6)
        np.testing.assert_allclose(np.asarray(ds.x_test), x_te_r.numpy(), atol=5e-6)
        np.testing.assert_allclose(np.asarray(ds.y_test), y_te_r.numpy(), atol=5e-6)
        np.testing.assert_allclose(np.asarray(ds.scaler_x.data_min), sx_r.data_min_, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ds.scaler_x.scale), sx_r.scale_, rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ds.scaler_y.min), sy_r.min_, rtol=1e-6)
        assert ds.info.boundary_lines == list(info_r["boundary_lines"])
        assert ds.info.normal_samples == info_r["normal_samples"]

        n = len(ds.x_test)
        want_labels = ref01.create_fault_labels(n, info_r)
        np.testing.assert_array_equal(ds.info.fault_labels(n), want_labels)


class TestScript02Parsers:
    @pytest.mark.parametrize(
        "spec",
        ["epi,res", "x0,x3,x4,x5", "res", "y_true", " epi ; res ",
         "epi res epi", "pV,pT,pH,pO", "12,epi,12"],
    )
    def test_parse_features_golden(self, ref02, spec):
        from pinnfc_tpu.diagnosis.features import parse_features

        assert list(parse_features(spec)) == list(ref02.parse_features(spec))

    def test_parse_group_spec_and_mapper_golden(self, ref02):
        from pinnfc_tpu.diagnosis.features import build_label_mapper, parse_group_spec

        spec = "正常:0 | 故障:1,2,3,4,5,6,7,8,9,10,11,12"
        groups_ref = ref02.parse_group_spec(spec)
        groups = parse_group_spec(spec)
        assert {k: list(v) for k, v in groups.items()} == {
            k: list(v) for k, v in groups_ref.items()
        }
        map_ref, names_ref = ref02.build_label_mapper(groups_ref)
        label_map, names = build_label_mapper(groups)
        assert names == names_ref
        assert dict(label_map) == dict(map_ref)

    def test_extract_X_y_golden(self, ref02, fake_results):
        from pinnfc_tpu.diagnosis.features import (
            build_label_mapper,
            extract_X_y,
            parse_features,
            parse_group_spec,
        )

        spec = "正常:0 | 故障:1,2,3,4,5,6,7,8,9,10,11,12"
        feats = parse_features("epi,res")
        label_map, _ = build_label_mapper(parse_group_spec(spec))
        x, y = extract_X_y(fake_results, feats, label_map)
        map_ref, _ = ref02.build_label_mapper(ref02.parse_group_spec(spec))
        x_ref, y_ref = ref02.extract_X_y(
            fake_results, ref02.parse_features("epi,res"), map_ref
        )
        np.testing.assert_array_equal(x, x_ref)
        np.testing.assert_array_equal(y, y_ref)


class TestScript04Risk:
    def test_mu_sigma_golden(self, ref04, fake_results):
        from pinnfc_tpu.risk import estimate_mu_sigma_normal

        mu, sigma = estimate_mu_sigma_normal(fake_results)
        mu_r, sigma_r = ref04.estimate_mu_sigma_normal(fake_results)
        np.testing.assert_allclose(mu, mu_r, atol=1e-12)
        np.testing.assert_allclose(sigma, sigma_r, atol=1e-12)

    def test_rf_time_series_golden(self, ref04, fake_results):
        from pinnfc_tpu.config import RiskConfig
        from pinnfc_tpu.data.contract import INDEX
        from pinnfc_tpu.risk import compute_rf_time_series, estimate_mu_sigma_normal

        cfg = RiskConfig()
        mu, sigma = estimate_mu_sigma_normal(fake_results)
        rf_inst_r, rf_smooth_r, extra_r = ref04.compute_rf_time_series(
            fake_results, mu, sigma
        )
        r = np.stack(
            [fake_results[:, INDEX[k]].astype(float) for k in cfg.res_keys], axis=1
        )
        # exact-f64 lfilter backend: bit-level agreement with the numpy loops
        out = compute_rf_time_series(r, mu, sigma, cfg, backend="numpy")
        np.testing.assert_allclose(out["rf_inst"], rf_inst_r, atol=1e-12)
        np.testing.assert_allclose(out["rf_smooth"], rf_smooth_r, atol=1e-12)
        np.testing.assert_allclose(out["c"], extra_r["C"], atol=1e-10)
        np.testing.assert_allclose(out["s_tot"], extra_r["S_tot"], atol=1e-12)
        # f32 associative-scan device backend: float tolerance
        out_jax = compute_rf_time_series(r, mu, sigma, cfg, backend="jax")
        np.testing.assert_allclose(out_jax["rf_smooth"], rf_smooth_r, atol=2e-5)

    def test_first_alarm_golden(self, ref04):
        from pinnfc_tpu.risk import find_first_alarm_index

        s = np.array([0.0, 0.1, 0.25, 0.31, 0.2, 0.5])
        for thr, mode in ((0.3, "above"), (0.05, "below"), (0.99, "above")):
            assert find_first_alarm_index(s, thr, mode) == ref04.find_first_alarm_index(
                s, thr, mode
            )


REF_03 = os.path.join(REF_DIR, "03_unsupervised_gmm_fault_diagnosis.py.py")
REF_05 = os.path.join(REF_DIR, "05_compare_fault_diagnosis_methods.py.py")


@pytest.fixture(scope="module")
def ref03():
    return _load("ref03_golden", REF_03)


@pytest.fixture(scope="module")
def ref05():
    # script 05 does `from F02_E09_figure9 import ...` (05:58-70) — the
    # reference's cross-script import hack; that module is script 03
    if "F02_E09_figure9" not in sys.modules:
        sys.modules["F02_E09_figure9"] = _load("ref03_golden", REF_03)
    return _load("ref05_golden", REF_05)


@pytest.fixture(scope="module")
def blobs4():
    """Well-separated 4-class data: every clustering method recovers the
    same partition, so calibrated predictions must agree exactly."""
    rs = np.random.RandomState(11)
    centers = 8.0 * np.eye(4)  # pairwise 8*sqrt(2) apart vs unit noise
    y_tr = np.repeat(np.arange(4), 60)
    y_te = np.repeat(np.arange(4), 30)
    x_tr = centers[y_tr] + rs.randn(len(y_tr), 4)
    x_te = centers[y_te] + rs.randn(len(y_te), 4)
    return x_tr.astype(np.float64), y_tr, x_te.astype(np.float64), y_te


class TestScript03GmmCalibration:
    def test_gmm_posterior_golden(self, ref03, blobs4):
        """fit_gmm_and_get_probabilities (03:360-426) vs our on-device GMM +
        calibrate_components/posterior_probabilities on identical data."""
        import jax

        from pinnfc_tpu.diagnosis import (
            calibrate_components,
            gmm_fit,
            gmm_predict_proba,
            posterior_probabilities,
        )

        x_tr, y_tr, x_te, _ = blobs4
        prob_ref, pred_ref, _, _ = ref03.fit_gmm_and_get_probabilities(
            x_tr, y_tr, x_te, n_classes=4
        )

        model = gmm_fit(x_tr, jax.random.key(0), n_components=4)
        resp_tr = np.asarray(gmm_predict_proba(model, x_tr))
        comp = calibrate_components(resp_tr, y_tr, 4)
        resp_te = np.asarray(gmm_predict_proba(model, x_te))
        prob, pred = posterior_probabilities(resp_te, comp)

        np.testing.assert_array_equal(pred, pred_ref)
        # component order differs (our kmeans++ vs sklearn's); the calibrated
        # class probabilities are order-invariant and EM converges to the
        # same mixture on separated data
        np.testing.assert_allclose(prob, prob_ref, atol=1e-3)


class TestScript05Methods:
    def test_macro_metrics_golden(self, ref05, rng):
        from pinnfc_tpu.diagnosis import compute_macro_metrics

        y_true = rng.randint(0, 4, 200)
        y_pred = np.where(rng.rand(200) < 0.3, rng.randint(0, 4, 200), y_true)
        ours = compute_macro_metrics(y_true, y_pred)
        theirs = ref05.compute_macro_metrics(y_true, y_pred)
        for k_ours, k_ref in (
            ("accuracy", "accuracy"),
            ("precision_macro", "macro_precision"),
            ("recall_macro", "macro_recall"),
            ("f1_macro", "macro_f1"),
        ):
            np.testing.assert_allclose(ours[k_ours], theirs[k_ref], atol=1e-12)

    def test_supervised_lr_golden(self, ref05, blobs4):
        from pinnfc_tpu.diagnosis import logreg_fit, logreg_predict

        x_tr, y_tr, x_te, _ = blobs4
        # the image's sklearn (1.9) removed the long-deprecated `multi_class`
        # kwarg the reference passes (05:298); multinomial IS the 1.9 default
        # for lbfgs, so a shim that drops the kwarg preserves semantics
        from sklearn.linear_model import LogisticRegression

        def _lr_shim(*args, **kw):
            kw.pop("multi_class", None)
            return LogisticRegression(*args, **kw)

        orig = ref05.LogisticRegression
        ref05.LogisticRegression = _lr_shim
        try:
            pred_ref = ref05.run_supervised_lr(x_tr, y_tr, x_te)
        finally:
            ref05.LogisticRegression = orig
        model = logreg_fit(x_tr, y_tr, n_classes=4, balanced=True)
        np.testing.assert_array_equal(
            np.asarray(logreg_predict(model, x_te)), pred_ref
        )

    def test_supervised_svm_golden(self, ref05, blobs4):
        from pinnfc_tpu.diagnosis import svm_fit, svm_predict

        x_tr, y_tr, x_te, _ = blobs4
        pred_ref = ref05.run_supervised_svm_rbf(x_tr, y_tr, x_te)
        model = svm_fit(x_tr, y_tr, n_classes=4, c_svm=0.05, balanced=True)
        np.testing.assert_array_equal(
            np.asarray(svm_predict(model, x_te)), pred_ref
        )

    def _hard_posterior_pred(self, assign_tr, y_tr, assign_te, k):
        from pinnfc_tpu.diagnosis import (
            calibrate_components,
            hard_responsibilities,
            posterior_probabilities,
        )

        comp = calibrate_components(hard_responsibilities(assign_tr, k), y_tr, k)
        _, pred = posterior_probabilities(hard_responsibilities(assign_te, k), comp)
        return pred

    def test_kmeans_posterior_golden(self, ref05, blobs4):
        import jax

        from pinnfc_tpu.diagnosis import kmeans_fit, kmeans_predict

        x_tr, y_tr, x_te, _ = blobs4
        pred_ref = ref05.fit_kmeans_posterior(x_tr, y_tr, x_te, n_classes=4)
        km = kmeans_fit(x_tr, jax.random.key(1), n_clusters=4)
        pred = self._hard_posterior_pred(
            np.asarray(km.assignments), y_tr,
            np.asarray(kmeans_predict(km.centers, x_te)), 4,
        )
        np.testing.assert_array_equal(pred, pred_ref)

    @staticmethod
    def _centers_nearest(x_tr, assign_tr, x_te, k):
        centers = np.stack([
            x_tr[assign_tr == c].mean(axis=0) if (assign_tr == c).any()
            else np.zeros(x_tr.shape[1])
            for c in range(k)
        ])
        d = ((x_te[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        return d.argmin(axis=1)

    def test_agglomerative_posterior_golden(self, ref05, blobs4):
        from pinnfc_tpu.diagnosis import ward_fit

        x_tr, y_tr, x_te, _ = blobs4
        pred_ref = ref05.fit_agglomerative_posterior(x_tr, y_tr, x_te, n_classes=4)
        assign_tr = np.asarray(ward_fit(x_tr, 4).assignments)
        assign_te = self._centers_nearest(x_tr, assign_tr, x_te, 4)
        pred = self._hard_posterior_pred(assign_tr, y_tr, assign_te, 4)
        np.testing.assert_array_equal(pred, pred_ref)

    def test_spectral_posterior_golden(self, ref05, blobs4):
        import jax

        from pinnfc_tpu.diagnosis import spectral_fit

        x_tr, y_tr, x_te, _ = blobs4
        pred_ref = ref05.fit_spectral_posterior(x_tr, y_tr, x_te, n_classes=4)
        assign_tr = np.asarray(
            spectral_fit(x_tr, jax.random.key(2), n_clusters=4).assignments
        )
        assign_te = self._centers_nearest(x_tr, assign_tr, x_te, 4)
        pred = self._hard_posterior_pred(assign_tr, y_tr, assign_te, 4)
        np.testing.assert_array_equal(pred, pred_ref)


class TestScript02AucMain:
    def test_group_auc_golden(self, ref02, fake_results):
        """Replicate script 02's main per-group computation (02:444-569:
        seed-49 stratified 0.9 split, Pipeline classifier, ROC from
        1 − P(normal)) with the REFERENCE's own pieces and compare the
        resulting AUC/accuracy against run_auc_pipeline on the same
        artifact."""
        from sklearn.linear_model import LogisticRegression
        from sklearn.metrics import accuracy_score, auc, roc_curve
        from sklearn.model_selection import train_test_split

        from pinnfc_tpu.config import AucConfig
        from pinnfc_tpu.diagnosis import run_auc_pipeline

        # the image's sklearn (1.9) removed `multi_class` (02:200); the
        # multinomial behavior is the 1.9 default for lbfgs
        def _lr_shim(*args, **kw):
            kw.pop("multi_class", None)
            return LogisticRegression(*args, **kw)

        orig = ref02.LogisticRegression
        ref02.LogisticRegression = _lr_shim
        self._orig = (ref02, orig)  # restored at the end of the test

        cfg = AucConfig()
        ours = run_auc_pipeline(fake_results, cfg)

        groups = ref02.parse_group_spec(cfg.group_spec)
        label_map, class_names = ref02.build_label_mapper(groups)
        for gid, spec in enumerate(cfg.feature_groups, start=1):
            fidx = ref02.parse_features(spec)
            x, y = ref02.extract_X_y(fake_results, fidx, label_map)
            x_tr, x_te, y_tr, y_te = train_test_split(
                x, y, test_size=cfg.test_size,
                random_state=cfg.random_state, stratify=y,
            )
            clf = ref02.build_classifier(balanced=cfg.balanced)
            clf.fit(x_tr, y_tr)
            prob = clf.predict_proba(x_te)
            acc_ref = accuracy_score(y_te, clf.predict(x_te))
            y_bin = (y_te != 0).astype(int)
            fpr, tpr, _ = roc_curve(y_bin, 1.0 - prob[:, 0], pos_label=1)
            auc_ref = auc(fpr, tpr)

            g = ours.groups[gid - 1]
            assert g.auc == pytest.approx(auc_ref, abs=5e-3)
            assert g.accuracy == pytest.approx(acc_ref, abs=0.02)
        mod, orig = self._orig
        mod.LogisticRegression = orig
