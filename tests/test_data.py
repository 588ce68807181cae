"""Data layer: scaling semantics, combination quirks, contract schema."""

import numpy as np
import pytest

from pinnfc_tpu.data import (
    INDEX,
    AffineScaler,
    ComprehensiveResults,
    add_noise,
    combine_and_normalize,
    load_comprehensive_results,
    save_comprehensive_results,
    synthesize_stack_data,
)


class TestAffineScaler:
    def test_matches_sklearn_minmax(self, rng):
        sklearn = pytest.importorskip("sklearn.preprocessing")
        data = rng.randn(100, 5) * np.array([1, 10, 0.1, 100, 3]) + 7
        ours = AffineScaler.fit(data)
        ref = sklearn.MinMaxScaler(feature_range=(-1, 1)).fit(data)
        np.testing.assert_allclose(np.asarray(ours.scale), ref.scale_, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(ours.min), ref.min_, rtol=1e-5)
        x = rng.randn(20, 5)
        np.testing.assert_allclose(
            np.asarray(ours.transform(x)), ref.transform(x), rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ours.inverse(ours.transform(x))), x, rtol=1e-4, atol=1e-5
        )

    def test_zero_range_guard(self):
        data = np.ones((10, 2))
        data[:, 1] = np.arange(10)
        s = AffineScaler.fit(data)
        out = np.asarray(s.transform(data))
        assert np.all(np.isfinite(out))

    def test_roundtrip_numpy(self, rng):
        s = AffineScaler.fit(rng.randn(50, 3))
        s2 = AffineScaler.from_numpy(s.to_numpy())
        np.testing.assert_allclose(np.asarray(s.scale), np.asarray(s2.scale))
        assert s2.feature_range == s.feature_range


class TestCombine:
    def test_split_semantics(self):
        normal, faults = synthesize_stack_data(n_normal=300, n_fault=50, seed=1)
        ds = combine_and_normalize(normal, faults, training_rate=1.0)
        n_total = 300 + 50 * 12
        assert ds.x_test.shape == (n_total, 8)
        # train = all normal rows (training_rate=1, ref 01:2132)
        assert ds.x_train.shape == (300, 8)
        # test includes the training rows (ref 01:288-289)
        np.testing.assert_allclose(
            np.asarray(ds.x_test[:300]), np.asarray(ds.x_train), rtol=1e-6
        )
        # normal train rows normalize into [-1, 1]; fault rows may exceed it
        assert np.asarray(ds.x_train).min() >= -1.0 - 1e-5
        assert np.asarray(ds.x_train).max() <= 1.0 + 1e-5

    def test_boundaries_and_labels(self):
        normal, faults = synthesize_stack_data(n_normal=200, n_fault=30, seed=2)
        ds = combine_and_normalize(normal, faults)
        bl = ds.info.boundary_lines
        assert bl[0] == 200 and bl[-1] == 200 + 30 * 12 and len(bl) == 13
        labels = ds.info.fault_labels(len(ds.x_test))
        assert labels[:200].max() == 0
        assert set(np.unique(labels)) == set(range(13))
        assert labels[200] == 1 and labels[-1] == 12

    def test_training_rate_partial(self):
        normal, faults = synthesize_stack_data(n_normal=200, n_fault=10, seed=3)
        ds = combine_and_normalize(normal, faults, training_rate=0.5)
        assert ds.x_train.shape[0] == 100


class TestNoise:
    def test_noise_all(self, rng):
        y = rng.randn(1000, 1)
        y2, info = add_noise(y, noise_target="all", noise_level=0.1, seed=0)
        assert info["affected_samples"] == 1000
        assert not np.allclose(y, y2)
        assert abs(np.std(y2 - y) - 0.1 * np.std(y)) < 0.02 * np.std(y)

    def test_noise_fault_only(self, rng):
        y = rng.randn(100, 1)
        y2, info = add_noise(y, noise_target="fault_only", normal_length=60, seed=0)
        np.testing.assert_array_equal(y[:60], y2[:60])
        assert info["affected_samples"] == 40


class TestContract:
    def test_schema_and_io(self, tmp_path, rng):
        arr = rng.randn(50, 22)
        res = ComprehensiveResults(arr)
        assert len(res) == 50
        np.testing.assert_array_equal(res["pV"], arr[:, 13])
        assert res.residual_matrix().shape == (50, 5)
        p = str(tmp_path / "out.mat")
        save_comprehensive_results(res, p)
        res2 = load_comprehensive_results(p)
        np.testing.assert_allclose(res2.array, arr)

    def test_save_creates_parent_dirs(self, tmp_path, rng):
        """cli train --mat-out into a nonexistent directory must not throw
        away a completed training run (failed live on a full-scale run)."""
        res = ComprehensiveResults(rng.randn(10, 22))
        p = str(tmp_path / "new" / "dirs" / "out.mat")
        save_comprehensive_results(res, p)
        assert load_comprehensive_results(p).array.shape == (10, 22)

    def test_schema_rejects_narrow(self):
        with pytest.raises(ValueError):
            ComprehensiveResults(np.zeros((10, 5)))

    def test_index_complete(self):
        assert INDEX["label"] == 17 and INDEX["ratio_O"] == 21
        assert len(INDEX) == 22


class TestSynthetic:
    def test_shapes_and_ranges(self):
        (xn, yn), faults = synthesize_stack_data(n_normal=500, n_fault=60, seed=0)
        assert xn.shape == (500, 8) and yn.shape == (500, 1)
        assert len(faults) == 12
        # currents stay inside the loader filter window (50, 800)
        assert xn[:, 0].min() > 50 and xn[:, 0].max() < 800
        # stack voltage plausible for a 5-cell stack
        assert 1.0 < yn.min() and yn.max() < 6.0
        # fault segments degrade voltage vs healthy start
        for x, y, label in faults:
            assert y[-50:].mean() < y[:50].mean() - 0.05, label


class TestMatLoaders:
    """Raw .mat ingestion with the reference's channel selection/filters
    (01:115-187), against synthetic .mat files with the campaign layout."""

    def test_normal_mat_channels_and_filter(self, tmp_path, rng):
        import scipy.io

        n = 50
        data = {
            "I": rng.uniform(0, 900, n),  # some rows outside (50, 800)
            "m_W": rng.rand(n), "T_W_in": rng.rand(n), "P_H_in": rng.rand(n),
            "P_O_in": rng.rand(n), "T_W_out": rng.rand(n),
            "m_H2": rng.rand(n), "m_O2": rng.rand(n),
            "U": rng.rand(n),
        }
        path = str(tmp_path / "Polar-1.mat")
        scipy.io.savemat(path, data)

        from pinnfc_tpu.data import load_normal_mat

        x, y = load_normal_mat(path)
        keep = (data["I"] > 50) & (data["I"] < 800)
        assert x.shape == (keep.sum(), 8)
        np.testing.assert_allclose(x[:, 0], data["I"][keep])
        np.testing.assert_allclose(x[:, 5], data["T_W_out"][keep])
        np.testing.assert_allclose(y[:, 0], data["U"][keep])

    def test_fault_mat_corr_index_and_filter(self, tmp_path, rng):
        import scipy.io

        n, width = 40, 80
        seg = rng.rand(n, width)
        seg[:5, 22] = 0.0  # zero current rows (corr_index[1] = 25-3 = 22)
        path = str(tmp_path / "fault.mat")
        scipy.io.savemat(path, {"segment_double": seg})

        from pinnfc_tpu.data import load_fault_mat
        from pinnfc_tpu.data.loaders import FAULT_CORR_INDEX, FAULT_Y_INDEX

        x, y = load_fault_mat(path)
        assert x.shape == (35, 8)
        np.testing.assert_allclose(x, seg[5:, FAULT_CORR_INDEX])
        np.testing.assert_allclose(y[:, 0], seg[5:, FAULT_Y_INDEX])
