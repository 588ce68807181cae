"""Diagnosis-layer tests: metrics vs sklearn, on-device GMM/KMeans/LR/SVM,
posterior calibration vs the reference's loop formulation."""

import jax
import numpy as np
import pytest

from pinnfc_tpu.diagnosis import (
    accuracy_score,
    build_label_mapper,
    calibrate_components,
    compute_macro_metrics,
    confusion_matrix,
    extract_X_y,
    gmm_fit,
    gmm_predict_proba,
    hard_responsibilities,
    kmeans_fit,
    kmeans_predict,
    logreg_fit,
    logreg_predict_proba,
    parse_features,
    parse_group_spec,
    posterior_probabilities,
    precision_recall_f1,
    roc_auc_score,
    roc_curve,
    svm_fit,
    svm_predict,
)


@pytest.fixture(scope="module")
def blobs():
    """4 well-separated Gaussian blobs in 4-D."""
    rng = np.random.RandomState(0)
    centers = np.array(
        [[0, 0, 0, 0], [6, 0, 0, 0], [0, 6, 0, 0], [0, 0, 6, 6]], dtype=float
    )
    x = np.vstack([c + rng.randn(150, 4) for c in centers])
    y = np.repeat(np.arange(4), 150)
    perm = rng.permutation(len(y))
    return x[perm], y[perm]


class TestMetrics:
    def test_roc_auc_vs_sklearn(self, rng):
        from sklearn.metrics import roc_auc_score as sk_auc

        y = rng.randint(0, 2, 500)
        s = rng.randn(500) + y * 0.8
        assert roc_auc_score(y, s) == pytest.approx(sk_auc(y, s), abs=1e-10)

    def test_roc_curve_vs_sklearn(self, rng):
        from sklearn.metrics import roc_curve as sk_roc

        y = rng.randint(0, 2, 200)
        s = rng.rand(200)
        fpr, tpr, _ = roc_curve(y, s)
        sk_fpr, sk_tpr, _ = sk_roc(y, s, drop_intermediate=False)
        np.testing.assert_allclose(fpr, sk_fpr, atol=1e-12)
        np.testing.assert_allclose(tpr, sk_tpr, atol=1e-12)

    def test_confusion_and_prf_vs_sklearn(self, rng):
        from sklearn.metrics import confusion_matrix as sk_cm
        from sklearn.metrics import precision_recall_fscore_support

        y = rng.randint(0, 4, 300)
        p = rng.randint(0, 4, 300)
        np.testing.assert_array_equal(confusion_matrix(y, p, 4), sk_cm(y, p))
        prf = precision_recall_f1(y, p, 4, average="macro")
        sk_p, sk_r, sk_f, _ = precision_recall_fscore_support(
            y, p, average="macro", zero_division=0
        )
        assert prf["precision_macro"] == pytest.approx(sk_p, abs=1e-12)
        assert prf["recall_macro"] == pytest.approx(sk_r, abs=1e-12)
        assert prf["f1_macro"] == pytest.approx(sk_f, abs=1e-12)

    def test_macro_metrics_perfect(self):
        m = compute_macro_metrics([0, 1, 2, 3], [0, 1, 2, 3], 4)
        assert m == {
            "accuracy": 1.0,
            "precision_macro": 1.0,
            "recall_macro": 1.0,
            "f1_macro": 1.0,
        }


class TestParsers:
    def test_parse_features_mixed_separators(self):
        assert parse_features("epi,res") == [11, 12]
        assert parse_features("x0 x3;x4|x5") == [0, 3, 4, 5]
        assert parse_features("pV、pT，pH") == [13, 14, 15]

    def test_parse_features_rejects_label(self):
        with pytest.raises(ValueError):
            parse_features("label")

    def test_parse_features_warns_on_y_true(self):
        with pytest.warns(UserWarning):
            parse_features("y_true")

    def test_group_spec_roundtrip(self):
        groups = parse_group_spec("水淹:1,2,3|氧饥饿:4,5,6|膜干:7,8,9|氢饥饿:10,11,12")
        mapper, names = build_label_mapper(groups)
        assert names == ["水淹", "氧饥饿", "膜干", "氢饥饿"]
        assert mapper[5] == 1 and mapper[12] == 3

    def test_duplicate_detail_label_raises(self):
        with pytest.raises(ValueError):
            build_label_mapper({"a": [1, 2], "b": [2, 3]})

    def test_extract_filters_unmapped_and_nonfinite(self):
        arr = np.zeros((6, 22))
        arr[:, 17] = [0, 1, 2, 5, 1, 1]
        arr[:, 13] = [1.0, 2.0, 3.0, 4.0, np.nan, 6.0]
        x, y = extract_X_y(arr, [13], {1: 0, 2: 1})
        np.testing.assert_allclose(x[:, 0], [2.0, 3.0, 6.0])
        np.testing.assert_array_equal(y, [0, 1, 0])


class TestPosterior:
    def test_calibration_matches_reference_loops(self, rng):
        """Vectorized calibration == reference per-component loops (03:395-414)."""
        n, c, k = 200, 8, 4
        resp = rng.rand(n, c)
        resp /= resp.sum(axis=1, keepdims=True)
        y = rng.randint(0, k, n)

        want = np.zeros((c, k))
        for ci in range(c):
            w = resp[:, ci]
            if w.sum() <= 0:
                want[ci] = 1.0 / k
                continue
            for ki in range(k):
                want[ci, ki] = w[y == ki].sum()
            s = want[ci].sum()
            want[ci] = want[ci] / s if s > 0 else 1.0 / k

        got = calibrate_components(resp, y, k)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_empty_component_uniform_fallback(self):
        resp = np.zeros((4, 2))
        resp[:, 0] = 1.0  # component 1 never used
        cal = calibrate_components(resp, np.array([0, 0, 1, 1]), 2)
        np.testing.assert_allclose(cal[1], [0.5, 0.5])

    def test_posterior_probs_normalized(self, rng):
        resp = rng.rand(50, 6)
        resp /= resp.sum(1, keepdims=True)
        cal = rng.rand(6, 4)
        cal /= cal.sum(1, keepdims=True)
        prob, pred = posterior_probabilities(resp, cal)
        np.testing.assert_allclose(prob.sum(1), 1.0, atol=1e-9)
        assert (pred == prob.argmax(1)).all()


class TestGMM:
    def test_separable_blobs_high_accuracy(self, blobs):
        x, y = blobs
        model = gmm_fit(x, jax.random.PRNGKey(0), n_components=8)
        resp = np.asarray(gmm_predict_proba(model, x))
        cal = calibrate_components(resp, y, 4)
        _, pred = posterior_probabilities(resp, cal)
        assert accuracy_score(y, pred) > 0.97

    def test_matches_sklearn_quality(self, blobs):
        """On-device EM reaches sklearn GaussianMixture's log-likelihood
        within tolerance (not bit-identical — different init seeds)."""
        from sklearn.mixture import GaussianMixture

        x, _ = blobs
        sk = GaussianMixture(4, covariance_type="full", random_state=0).fit(x)
        sk_ll = sk.score(x)
        model = gmm_fit(x, jax.random.PRNGKey(0), n_components=4)
        assert float(model.lower_bound) > sk_ll - 0.25

    def test_responsibilities_normalized(self, blobs):
        x, _ = blobs
        model = gmm_fit(x[:100], jax.random.PRNGKey(1), n_components=5)
        resp = np.asarray(gmm_predict_proba(model, x[100:150]))
        np.testing.assert_allclose(resp.sum(1), 1.0, atol=1e-5)

    def test_early_exit_before_max_iter(self, blobs):
        """The while_loop EM stops at sklearn's convergence rule instead of
        burning all max_iter iterations (VERDICT r1 weak #4)."""
        x, _ = blobs
        model = gmm_fit(x, jax.random.PRNGKey(0), n_components=4, max_iter=100)
        assert bool(model.converged)
        assert int(model.n_iter) < 100
        # a tighter budget that cannot converge reports converged=False
        short = gmm_fit(x, jax.random.PRNGKey(0), n_components=4, max_iter=1)
        assert not bool(short.converged)
        assert int(short.n_iter) == 1


class TestSpectral:
    """On-device spectral clustering vs sklearn (05:455-512; VERDICT #9)."""

    @pytest.fixture(scope="class")
    def fake_results(self):
        """22-col comprehensive_results with distinct residual signatures
        per fault class (labels 1..12 → 4 classes)."""
        from pinnfc_tpu.data.contract import INDEX

        rng = np.random.RandomState(0)
        n_fault = 50
        n = 100 + 12 * n_fault
        arr = np.zeros((n, 22))
        for k in ("pV", "pT", "pH", "pO"):
            arr[:, INDEX[k]] = 0.05 * rng.randn(n)
        pos = 100
        for fault in range(4):
            for _ in range(3):
                seg = slice(pos, pos + n_fault)
                arr[seg, INDEX["label"]] = (pos - 100) // n_fault + 1
                arr[seg, INDEX[("pV", "pT", "pH", "pO")[fault]]] += rng.uniform(
                    0.8, 1.2, n_fault
                )
                pos += n_fault
        return arr

    def test_blobs_recovered(self, blobs):
        from pinnfc_tpu.diagnosis import spectral_fit

        x, y = blobs
        res = spectral_fit(x, jax.random.PRNGKey(0), n_clusters=4)
        assign = np.asarray(res.assignments)
        # cluster IDs are arbitrary: check purity via best per-cluster label
        purity = 0.0
        for c in range(4):
            m = assign == c
            if m.any():
                purity += np.bincount(y[m].astype(int), minlength=4).max()
        assert purity / len(y) > 0.95

    def test_agrees_with_sklearn_labels(self, blobs):
        from sklearn.cluster import SpectralClustering
        from sklearn.metrics import adjusted_rand_score

        from pinnfc_tpu.diagnosis import spectral_fit

        x, _ = blobs
        ours = np.asarray(
            spectral_fit(x, jax.random.PRNGKey(0), 4, n_neighbors=10).assignments
        )
        sk = SpectralClustering(
            n_clusters=4, affinity="nearest_neighbors", n_neighbors=10,
            assign_labels="kmeans", random_state=0,
        ).fit_predict(x)
        assert adjusted_rand_score(ours, sk) > 0.9

    def test_subspace_solver_matches_eigh(self, blobs):
        """The large-N solver (block orthogonal iteration on 2I−L) must give
        the same clustering as the exact eigh path: the converged subspace
        differs from the true bottom-k eigenvectors only by a rotation,
        which k-means is invariant to."""
        from sklearn.metrics import adjusted_rand_score

        from pinnfc_tpu.diagnosis import spectral_fit

        x, _ = blobs
        a = np.asarray(
            spectral_fit(x, jax.random.PRNGKey(0), 4, solver="eigh").assignments
        )
        b = np.asarray(
            spectral_fit(x, jax.random.PRNGKey(0), 4, solver="subspace").assignments
        )
        assert adjusted_rand_score(a, b) == 1.0
        with pytest.raises(ValueError, match="unknown solver"):
            spectral_fit(x, jax.random.PRNGKey(0), 4, solver="arnoldi")

    def test_compare_pipeline_backends_agree(self, fake_results):
        from pinnfc_tpu.diagnosis import run_compare_pipeline

        accs = {}
        for dev in (True, False):
            out = run_compare_pipeline(
                fake_results, methods=["spectral"], device_spectral=dev
            )
            accs[dev] = out.methods[0].metrics["accuracy"]
        assert accs[True] == pytest.approx(accs[False], abs=0.15)


class TestWard:
    """On-device Ward agglomerative vs sklearn (05:398-450)."""

    def test_exact_sklearn_merge_order(self, blobs):
        from sklearn.cluster import AgglomerativeClustering
        from sklearn.metrics import adjusted_rand_score

        from pinnfc_tpu.diagnosis import ward_fit

        x, _ = blobs
        for k in (4, 16):
            ours = np.asarray(ward_fit(x, k).assignments)
            sk = AgglomerativeClustering(n_clusters=k, linkage="ward").fit_predict(x)
            assert adjusted_rand_score(ours, sk) == 1.0

    def test_nn_chain_matches_global_and_sklearn(self, blobs):
        """The large-N NN-chain algorithm builds the same dendrogram as the
        global greedy search (Ward is reducible), so the k-cluster cut must
        agree with both our global path and sklearn."""
        from sklearn.cluster import AgglomerativeClustering
        from sklearn.metrics import adjusted_rand_score

        from pinnfc_tpu.diagnosis import ward_fit

        x, _ = blobs
        for k in (2, 4, 9):
            a = np.asarray(ward_fit(x, k, algorithm="global").assignments)
            b = np.asarray(ward_fit(x, k, algorithm="nn-chain").assignments)
            assert adjusted_rand_score(a, b) == 1.0
            sk = AgglomerativeClustering(n_clusters=k, linkage="ward").fit_predict(x)
            assert adjusted_rand_score(b, sk) == 1.0
        with pytest.raises(ValueError, match="unknown algorithm"):
            ward_fit(x, 4, algorithm="slink")

    def test_nn_chain_unstructured_data(self, rng):
        """No cluster structure at all — near-ties everywhere; the chain
        walk and sorted replay must still reproduce sklearn's partition."""
        from sklearn.cluster import AgglomerativeClustering
        from sklearn.metrics import adjusted_rand_score

        from pinnfc_tpu.diagnosis import ward_fit

        x = rng.randn(180, 3).astype(np.float32)
        ours = np.asarray(ward_fit(x, 6, algorithm="nn-chain").assignments)
        sk = AgglomerativeClustering(n_clusters=6, linkage="ward").fit_predict(
            x.astype(np.float64)
        )
        assert adjusted_rand_score(ours, sk) > 0.99

    def test_centers_are_cluster_means(self, blobs):
        from pinnfc_tpu.diagnosis import ward_fit

        x, _ = blobs
        res = ward_fit(x[:200], 5)
        assign = np.asarray(res.assignments)
        centers = np.asarray(res.centers)
        assert set(np.unique(assign)) == set(range(5))
        for c in range(5):
            np.testing.assert_allclose(
                centers[c], x[:200][assign == c].mean(axis=0), rtol=1e-4, atol=1e-5
            )

    def test_compare_pipeline_backends_agree(self, blobs):
        from pinnfc_tpu.data.contract import INDEX
        from pinnfc_tpu.diagnosis import run_compare_pipeline

        rng = np.random.RandomState(0)
        n_fault = 40
        n = 50 + 12 * n_fault
        arr = np.zeros((n, 22))
        for key in ("pV", "pT", "pH", "pO"):
            arr[:, INDEX[key]] = 0.05 * rng.randn(n)
        for seg in range(12):
            sl = slice(50 + seg * n_fault, 50 + (seg + 1) * n_fault)
            arr[sl, INDEX["label"]] = seg + 1
            arr[sl, INDEX[("pV", "pT", "pH", "pO")[seg // 3]]] += 1.0
        accs = {}
        for dev in (True, False):
            out = run_compare_pipeline(
                arr, methods=["agglomerative"], device_ward=dev
            )
            accs[dev] = out.methods[0].metrics["accuracy"]
        # identical merge order → identical accuracy
        assert accs[True] == pytest.approx(accs[False], abs=1e-9)


class TestIsoForest:
    """On-device isolation forest vs sklearn (02:571-611; VERDICT #5)."""

    @pytest.fixture(scope="class")
    def anomaly_data(self):
        rng = np.random.RandomState(7)
        x_fit = rng.randn(1500, 2) * [0.4, 0.6]
        # moderately overlapping anomalies so AUC is informative, not 1.0
        x_te = np.vstack(
            [rng.randn(400, 2) * [0.4, 0.6], rng.randn(200, 2) * 0.8 + [1.2, -1.0]]
        )
        y = np.r_[np.zeros(400), np.ones(200)]
        return x_fit, x_te, y

    def test_auc_matches_sklearn_within_noise(self, anomaly_data):
        from sklearn.ensemble import IsolationForest
        from sklearn.metrics import roc_auc_score

        from pinnfc_tpu.diagnosis import isoforest_fit, isoforest_score

        x_fit, x_te, y = anomaly_data
        m = isoforest_fit(x_fit, jax.random.PRNGKey(0), n_estimators=100)
        auc_dev = roc_auc_score(y, np.asarray(isoforest_score(m, x_te)))
        sk = IsolationForest(n_estimators=100, random_state=0).fit(x_fit)
        auc_sk = roc_auc_score(y, -sk.score_samples(x_te))
        assert abs(auc_dev - auc_sk) < 0.03

    def test_scores_rank_outliers_above_inliers(self, anomaly_data):
        from pinnfc_tpu.diagnosis import isoforest_fit, isoforest_score

        x_fit, _, _ = anomaly_data
        m = isoforest_fit(x_fit, jax.random.PRNGKey(1), n_estimators=50)
        s = np.asarray(
            isoforest_score(m, np.array([[0.0, 0.0], [5.0, -5.0]]))
        )
        assert s[1] > s[0]
        assert 0.0 < s[0] <= 1.0 and 0.0 < s[1] <= 1.0

    def test_auc_pipeline_backends_agree(self, tmp_path):
        """run_auc_pipeline's device / sklearn forests produce consistent
        unsupervised AUC on the same artifact."""
        import dataclasses as dc

        from pinnfc_tpu.config import AucConfig
        from pinnfc_tpu.diagnosis import run_auc_pipeline

        rng = np.random.RandomState(3)
        from pinnfc_tpu.data.contract import INDEX

        n_normal, n_fault = 400, 50
        n = n_normal + 12 * n_fault
        arr = np.zeros((n, 22))
        arr[:, INDEX["epi"]] = 0.01 + 0.002 * rng.rand(n)
        arr[:, INDEX["res"]] = 0.02 * rng.randn(n)
        lab = np.zeros(n)
        for k in range(12):
            seg = slice(n_normal + k * n_fault, n_normal + (k + 1) * n_fault)
            lab[seg] = k + 1
            arr[seg, INDEX["res"]] += np.linspace(0.1, 1.0, n_fault)
            arr[seg, INDEX["epi"]] += 0.03
        arr[:, INDEX["label"]] = lab

        outs = {}
        for backend in ("device", "sklearn"):
            cfg = dc.replace(AucConfig(), iso_backend=backend)
            outs[backend] = run_auc_pipeline(arr, cfg).iso_auc
        assert outs["device"] == pytest.approx(outs["sklearn"], abs=0.05)


class TestKMeans:
    def test_blobs_clustering(self, blobs):
        x, y = blobs
        res = kmeans_fit(x, jax.random.PRNGKey(0), n_clusters=4)
        cal = calibrate_components(
            hard_responsibilities(np.asarray(res.assignments), 4), y, 4
        )
        assign_te = np.asarray(kmeans_predict(res.centers, x))
        _, pred = posterior_probabilities(hard_responsibilities(assign_te, 4), cal)
        assert accuracy_score(y, pred) > 0.95

    def test_inertia_close_to_sklearn(self, blobs):
        from sklearn.cluster import KMeans

        x, _ = blobs
        sk = KMeans(4, n_init=10, random_state=0).fit(x)
        res = kmeans_fit(x, jax.random.PRNGKey(0), n_clusters=4)
        assert float(res.inertia) < sk.inertia_ * 1.1


class TestLogReg:
    def test_newton_matches_lbfgs(self, blobs):
        """Both solvers minimize the same strictly-convex objective, so the
        optima must coincide (Newton is the small-problem default)."""
        from pinnfc_tpu.diagnosis.logreg import logreg_fit as fit

        x, y = blobs
        m_n = fit(x, y, n_classes=4, balanced=True, solver="newton")
        m_l = fit(x, y, n_classes=4, balanced=True, solver="lbfgs")
        # the L-BFGS path's loss runs default-precision matmuls, which on
        # the TPU math unit are bf16 — ITS optimum carries ~1e-2 noise
        # there (Newton forces 'highest'); tight anchor stays on CPU
        on_tpu = jax.default_backend() == "tpu"
        rtol, atol = (2e-2, 5e-3) if on_tpu else (1e-3, 2e-4)
        np.testing.assert_allclose(
            np.asarray(m_n.coef), np.asarray(m_l.coef), rtol=rtol, atol=atol
        )
        # intercepts are identified only up to a common shift (softmax
        # invariance) — Newton pins the mean to zero, L-BFGS may drift
        b_n = np.asarray(m_n.intercept)
        b_l = np.asarray(m_l.intercept)
        np.testing.assert_allclose(
            b_n - b_n.mean(), b_l - b_l.mean(), atol=1e-2 if on_tpu else 2e-3
        )
        # quadratic convergence: an order of magnitude fewer steps
        assert int(m_n.n_iter) < 30 < int(m_l.n_iter)
        with pytest.raises(ValueError, match="unknown solver"):
            fit(x, y, n_classes=4, solver="sgd")

    def test_close_to_sklearn(self, blobs):
        from sklearn.linear_model import LogisticRegression
        from sklearn.pipeline import Pipeline
        from sklearn.preprocessing import StandardScaler

        x, y = blobs
        sk = Pipeline(
            [("sc", StandardScaler()),
             ("lr", LogisticRegression(max_iter=1000, class_weight="balanced"))]
        ).fit(x, y)
        model = logreg_fit(x, y, n_classes=4, balanced=True)
        proba = np.asarray(logreg_predict_proba(model, x))
        sk_proba = sk.predict_proba(x)
        # same decisions nearly everywhere; probabilities close
        agree = (proba.argmax(1) == sk_proba.argmax(1)).mean()
        assert agree > 0.99
        assert np.abs(proba - sk_proba).mean() < 0.02

    def test_binary_auc_parity(self, rng):
        from sklearn.linear_model import LogisticRegression
        from sklearn.pipeline import Pipeline
        from sklearn.preprocessing import StandardScaler

        x = rng.randn(400, 3)
        y = (x[:, 0] + 0.5 * rng.randn(400) > 0).astype(int)
        model = logreg_fit(x, y, n_classes=2, balanced=True)
        p = np.asarray(logreg_predict_proba(model, x))[:, 1]
        sk = Pipeline(
            [("sc", StandardScaler()),
             ("lr", LogisticRegression(max_iter=1000, class_weight="balanced"))]
        ).fit(x, y)
        sk_p = sk.predict_proba(x)[:, 1]
        assert roc_auc_score(y, p) == pytest.approx(roc_auc_score(y, sk_p), abs=5e-3)


class TestSVM:
    def test_blobs_accuracy(self, blobs):
        x, y = blobs
        model = svm_fit(x, y, n_classes=4, c_svm=0.05, balanced=True)
        pred = np.asarray(svm_predict(model, x))
        assert accuracy_score(y, pred) > 0.95

    def test_comparable_to_sklearn_svc(self, blobs):
        from sklearn.pipeline import Pipeline
        from sklearn.preprocessing import StandardScaler
        from sklearn.svm import SVC

        x, y = blobs
        sk = Pipeline(
            [("sc", StandardScaler()),
             ("svc", SVC(kernel="linear", C=0.05, class_weight="balanced"))]
        ).fit(x, y)
        sk_acc = accuracy_score(y, sk.predict(x))
        model = svm_fit(x, y, n_classes=4, c_svm=0.05, balanced=True)
        acc = accuracy_score(y, np.asarray(svm_predict(model, x)))
        assert acc > sk_acc - 0.05


class TestExplainCoefficients:
    def test_structure_and_ordering(self, blobs):
        from pinnfc_tpu.diagnosis import explain_coefficients

        x, y = blobs
        model = logreg_fit(x, y, n_classes=4, balanced=True)
        names = ["f0", "f1", "f2", "f3"]
        out = explain_coefficients(model, names, ["a", "b", "c", "d"], topn=2)
        assert set(out) == {"a", "b", "c", "d"}
        for cls, d in out.items():
            assert len(d["positive"]) == 2 and len(d["negative"]) == 2
            # positive list sorted descending, negative ascending
            assert d["positive"][0][1] >= d["positive"][1][1]
            assert d["negative"][0][1] <= d["negative"][1][1]


class TestReviewRegressions:
    def test_negative_feature_index_rejected(self):
        """-5 aliases the fault-label column and slipped past the leakage
        guard (review r3)."""
        from pinnfc_tpu.diagnosis.features import parse_features

        with pytest.raises(ValueError, match="negative feature index"):
            parse_features("-5")

    def test_report_spans_all_named_classes(self):
        """classification_report_dict must list every named class (sklearn
        semantics) even when one is absent from the split, so its macro avg
        matches compute_macro_metrics on the same k (review r3)."""
        from pinnfc_tpu.diagnosis.metrics import (
            classification_report_dict,
            compute_macro_metrics,
        )

        y_true = np.array([0, 0, 1, 1, 2])  # class 3 absent
        y_pred = np.array([0, 1, 1, 1, 2])
        names = ["a", "b", "c", "d"]
        rep = classification_report_dict(y_true, y_pred, names)
        assert "d" in rep and rep["d"]["support"] == 0
        macro = compute_macro_metrics(y_true, y_pred, 4)
        assert rep["macro avg"]["f1-score"] == pytest.approx(macro["f1_macro"])

    def test_svm_rejects_17_classes(self):
        from pinnfc_tpu.diagnosis.svm import svm_fit

        x = np.random.RandomState(0).randn(40, 3).astype(np.float32)
        y = np.arange(40) % 17
        with pytest.raises(ValueError, match="at most 16"):
            svm_fit(x, y, n_classes=17)

    def test_auc_normal_class_resolved_by_name(self):
        """A group spec listing 正常 second must still score the ROC against
        the normal column (02:546-552 fallback semantics)."""
        from pinnfc_tpu.config import AucConfig
        from pinnfc_tpu.data.contract import INDEX
        from pinnfc_tpu.diagnosis.auc import run_auc_pipeline

        rng = np.random.RandomState(0)
        n = 400
        arr = np.zeros((n, 22))
        arr[:, INDEX["res"]] = 0.02 * rng.randn(n)
        arr[n // 2 :, INDEX["res"]] += np.linspace(0.5, 2.0, n - n // 2)
        arr[:, INDEX["epi"]] = np.abs(arr[:, INDEX["res"]]) * 0.1
        arr[n // 2 :, INDEX["label"]] = 1
        cfg_normal_first = AucConfig(
            group_spec="正常:0 | 故障:1", feature_groups=("epi,res",),
            test_size=0.5,
        )
        cfg_normal_second = AucConfig(
            group_spec="故障:1 | 正常:0", feature_groups=("epi,res",),
            test_size=0.5,
        )
        auc1 = run_auc_pipeline(arr, cfg_normal_first).groups[0].auc
        auc2 = run_auc_pipeline(arr, cfg_normal_second).groups[0].auc
        assert auc1 > 0.95  # separable by construction
        assert auc2 == pytest.approx(auc1, abs=0.05)
