"""Split-conformal prediction (uq/conformal.py, `cli conformal`).

Pins the exact finite-sample machinery: the k = ⌈(n+1)(1−α)⌉ order
statistic, tie-conservative p-values, the coverage ⟺ p>α duality, the
marginal coverage guarantee on exchangeable data, and the fault-row
miscoverage that makes the report a calibrated anomaly diagnostic.
"""

import json

import numpy as np
import pytest

from pinnfc_tpu.data.contract import INDEX
from pinnfc_tpu.uq import (
    artifact_scores,
    conformal_pvalues,
    conformal_quantile,
    conformal_report,
    normal_calibration_scores,
)


class TestQuantile:
    def test_exact_order_statistic(self):
        # n=9, alpha=0.1 → k = ceil(10·0.9) = 9 → the 9th smallest = max
        s = np.arange(1.0, 10.0)
        assert conformal_quantile(s, 0.1) == 9.0
        # alpha=0.5 → k = ceil(10·0.5) = 5 → 5th smallest
        assert conformal_quantile(s, 0.5) == 5.0

    def test_too_few_points_degenerates_to_inf(self):
        # n=3, alpha=0.1 → k = ceil(4·0.9) = 4 > 3
        assert conformal_quantile(np.array([1.0, 2.0, 3.0]), 0.1) == np.inf
        assert conformal_quantile(np.array([]), 0.1) == np.inf

    def test_alpha_validated(self):
        with pytest.raises(ValueError):
            conformal_quantile(np.arange(5.0), 0.0)
        with pytest.raises(ValueError):
            conformal_quantile(np.arange(5.0), 1.0)


class TestPValues:
    def test_tie_conservative_counts(self):
        calib = np.array([1.0, 2.0, 2.0, 3.0])
        # s=2.0 ties count as ≥ → #{c≥2}=3 → p = 4/5
        p = conformal_pvalues(calib, np.array([2.0, 0.5, 10.0]))
        assert p[0] == pytest.approx(4 / 5)
        assert p[1] == pytest.approx(5 / 5)  # below all → maximally typical
        assert p[2] == pytest.approx(1 / 5)  # above all → floor 1/(n+1)

    def test_nan_scores_propagate(self):
        p = conformal_pvalues(np.arange(5.0), np.array([np.nan, 1.0]))
        assert np.isnan(p[0]) and np.isfinite(p[1])

    def test_coverage_pvalue_duality(self):
        """s ≤ q̂(α) ⟺ p(s) > α — exactly, including ties and both
        integer and non-integer α(n+1). The report's frac_low_p column
        relies on this."""
        rng = np.random.RandomState(0)
        for n, alpha in [(40, 0.1), (39, 0.1), (19, 0.05), (100, 0.25),
                         (7, 0.5), (33, 0.33)]:
            calib = np.round(rng.randn(n), 1)  # rounding forces ties
            scores = np.round(rng.randn(500), 1)
            q = conformal_quantile(calib, alpha)
            p = conformal_pvalues(calib, scores)
            np.testing.assert_array_equal(scores <= q, p > alpha)

    def test_marginal_coverage_guarantee(self):
        """Exchangeable calib/eval → P(covered) ≥ 1−α (and ≤ 1−α + 1/(n+1)
        up to MC noise)."""
        rng = np.random.RandomState(1)
        alpha, n_cal, hits, total = 0.2, 99, 0, 0
        for _ in range(200):
            s = np.abs(rng.randn(n_cal + 50))
            q = conformal_quantile(s[:n_cal], alpha)
            hits += int((s[n_cal:] <= q).sum())
            total += 50
        cov = hits / total
        assert 1 - alpha - 0.02 <= cov <= 1 - alpha + 0.03


class TestArtifactScores:
    def _arr(self, n=20):
        arr = np.zeros((n, 22))
        arr[:, INDEX["res"]] = np.linspace(-1, 1, n)
        arr[:, INDEX["ale"]] = 0.1
        arr[:, INDEX["epi"]] = 0.2
        return arr

    def test_adaptive_studentizes(self):
        arr = self._arr()
        s, sigma = artifact_scores(arr, "adaptive")
        expect = np.abs(arr[:, INDEX["res"]]) / np.sqrt(0.1**2 + 0.2**2)
        np.testing.assert_allclose(s, expect)
        assert np.all(sigma > 0)

    def test_absolute_is_plain_residual(self):
        arr = self._arr()
        s, sigma = artifact_scores(arr, "absolute")
        np.testing.assert_allclose(s, np.abs(arr[:, INDEX["res"]]))
        np.testing.assert_array_equal(sigma, 1.0)

    def test_zero_sigma_floored_not_inf(self):
        arr = self._arr()
        arr[3, INDEX["ale"]] = arr[3, INDEX["epi"]] = 0.0
        s, sigma = artifact_scores(arr, "adaptive")
        assert np.all(np.isfinite(s)) and sigma[3] > 0

    def test_unknown_score_rejected(self):
        with pytest.raises(ValueError):
            artifact_scores(self._arr(), "weird")


def _fake_artifact(n_normal=400, n_fault=120, seed=0):
    rng = np.random.RandomState(seed)
    n = n_normal + n_fault
    arr = np.zeros((n, 22))
    arr[:, INDEX["ale"]] = 0.05 + 0.01 * rng.rand(n)
    arr[:, INDEX["epi"]] = 0.05 + 0.01 * rng.rand(n)
    arr[:n_normal, INDEX["res"]] = 0.07 * rng.randn(n_normal)
    arr[n_normal:, INDEX["res"]] = 1.0 + 0.2 * rng.randn(n_fault)
    arr[n_normal:, INDEX["label"]] = np.repeat([1, 2, 3], n_fault // 3)
    return arr


class TestReport:
    def test_normal_covered_faults_not(self):
        rep = conformal_report(_fake_artifact(), alpha=0.1)
        ne = rep.normal_eval
        # guarantee on the held-out half, with binomial slack at n≈200
        assert ne.coverage >= 1 - rep.alpha - 0.05
        for c in rep.classes:
            if c.label > 0:
                assert c.coverage < 0.1  # shifted by ~14σ̂ — interval misses
                assert c.median_p <= 1.5 / (rep.n_calib + 1)
        assert rep.detection_auc > 0.99
        assert np.isfinite(rep.q_hat)

    def test_frac_low_p_is_one_minus_coverage(self):
        """The duality, surfaced at report level (finite rows)."""
        rep = conformal_report(_fake_artifact(), alpha=0.1)
        for c in rep.classes:
            assert c.frac_low_p == pytest.approx(1.0 - c.coverage, abs=1e-12)

    def test_calib_rows_excluded_from_eval(self):
        arr = _fake_artifact()
        rep = conformal_report(arr, calib_frac=0.5)
        labels = arr[:, INDEX["label"]]
        assert rep.calib_mask.sum() == rep.n_calib + rep.n_dropped
        assert not rep.calib_mask[labels > 0].any()  # only normals calibrate
        ne = rep.normal_eval
        assert ne.n == int((labels == 0).sum()) - int(rep.calib_mask.sum())

    def test_glitch_rows_nan_p_and_dropped(self):
        arr = _fake_artifact()
        arr[5, INDEX["res"]] = np.nan  # normal row → may land in calib
        arr[-1, INDEX["res"]] = np.nan  # fault row → NaN p, not covered
        rep = conformal_report(arr, seed=3)
        assert np.isnan(rep.pvalues[-1]) and not rep.covered[-1]

    def test_seed_changes_split_deterministically(self):
        arr = _fake_artifact()
        r1 = conformal_report(arr, seed=0)
        r2 = conformal_report(arr, seed=0)
        r3 = conformal_report(arr, seed=1)
        np.testing.assert_array_equal(r1.calib_mask, r2.calib_mask)
        assert (r1.calib_mask != r3.calib_mask).any()

    def test_absolute_score_report(self):
        rep = conformal_report(_fake_artifact(), score="absolute")
        assert rep.score == "absolute" and np.isfinite(rep.q_hat)

    def test_validation_errors(self):
        arr = _fake_artifact()
        with pytest.raises(ValueError):
            conformal_report(arr, calib_frac=1.0)
        all_fault = arr.copy()
        all_fault[:, INDEX["label"]] = 1
        with pytest.raises(ValueError):
            conformal_report(all_fault)

    def test_normal_calibration_scores_full_frac(self):
        arr = _fake_artifact()
        s = normal_calibration_scores(arr, score="absolute", calib_frac=1.0)
        normal = arr[:, INDEX["label"]] == 0
        assert s.size == int(normal.sum())
        np.testing.assert_allclose(
            np.sort(s), np.sort(np.abs(arr[normal, INDEX["res"]]))
        )


class TestCli:
    def test_cli_conformal_json_and_plot(self, tmp_path, capsys):
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.data import save_comprehensive_results

        mat = str(tmp_path / "F01.mat")
        save_comprehensive_results(_fake_artifact(), mat)
        plot_dir = str(tmp_path / "figs")
        rc = main(["conformal", "--mat", mat, "--json",
                   "--plot-dir", plot_dir])
        out = capsys.readouterr().out
        # the figure path line precedes the JSON blob
        blob = json.loads(out[out.index("{"):])
        assert rc == 0
        assert blob["alpha"] == 0.1 and blob["detection_auc"] > 0.99
        assert (tmp_path / "figs" / "conformal_coverage.png").exists()

    def test_cli_conformal_table(self, tmp_path, capsys):
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.data import save_comprehensive_results

        mat = str(tmp_path / "F01.mat")
        save_comprehensive_results(_fake_artifact(), mat)
        rc = main(["conformal", "--mat", mat, "--score", "absolute",
                   "--alpha", "0.05"])
        out = capsys.readouterr().out
        assert rc == 0 and "held-out normal coverage" in out
        assert "detection AUC" in out
