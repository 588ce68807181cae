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

    def test_duality_holds_with_glitches_and_integer_alpha(self):
        """frac_low_p == 1 − coverage EXACTLY even with glitched rows in
        the class (both are computed over finite rows) and at an α where
        α·(n_calib+1) is an integer (tie-inclusive p ≤ α)."""
        arr = _fake_artifact()
        arr[-5:, INDEX["res"]] = np.nan  # glitch a few fault rows
        alpha = 134 / 201  # calib_frac .5 of 400 normals → n_calib+1 = 201
        rep = conformal_report(arr, alpha=alpha)
        assert rep.n_calib == 200
        for c in rep.classes:
            assert c.frac_low_p == pytest.approx(1.0 - c.coverage, abs=1e-12)

    def test_all_glitch_class_reports_nan(self):
        arr = _fake_artifact()
        lbl = arr[:, INDEX["label"]]
        arr[lbl == 3, INDEX["res"]] = np.nan
        rep = conformal_report(arr)
        c3 = next(c for c in rep.classes if c.label == 3)
        assert np.isnan(c3.coverage) and np.isnan(c3.frac_low_p)
        assert np.isnan(c3.median_p) and c3.n > 0

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

    def test_cli_conformal_json_nan_inf_become_null(self, tmp_path, capsys):
        """Strict JSON: a fault-free artifact (detection_auc = NaN) at an
        α too small for the calibration count (q̂ = inf) must emit nulls,
        not crash json.dumps(allow_nan=False)."""
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.data import save_comprehensive_results

        mat = str(tmp_path / "F01.mat")
        save_comprehensive_results(_fake_artifact(n_normal=40, n_fault=0), mat)
        rc = main(["conformal", "--mat", mat, "--json", "--alpha", "0.01"])
        out = capsys.readouterr().out
        assert rc == 0
        blob = json.loads(out[out.index("{"):])
        assert blob["detection_auc"] is None  # NaN → null
        assert blob["q_hat"] is None  # inf → null

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


# ---------------------------------------------------------------------------
# Streaming surface: OnlineMonitor(conformal_calib=...) — calibrated anomaly
# p-values in the jitted step (one searchsorted against the baked sorted
# calibration vector), the host-side low-p counter, state-bank back-compat,
# and the StableHLO export path.
# ---------------------------------------------------------------------------

import jax
import jax.numpy as jnp

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.pinn import init_pinn
from pinnfc_tpu.serving import OnlineMonitor


@pytest.fixture(scope="module")
def stream_setup():
    rs = np.random.RandomState(11)
    sx = AffineScaler.fit(rs.randn(200, 8).astype(np.float32))
    sy = AffineScaler.fit(rs.randn(200, 1).astype(np.float32))
    params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
    mu = np.zeros(5, np.float32)
    sigma = np.array([0.05, 0.05, 2.0, 0.1, 0.2], np.float32)
    calib = np.abs(rs.randn(99)).astype(np.float32)
    return params, sx, sy, mu, sigma, calib, rs


def _monitor(stream_setup, alpha=0.2, calib=True, **kw):
    params, sx, sy, mu, sigma, cal, _ = stream_setup
    return OnlineMonitor(
        params, sx, sy, mu, sigma,
        conformal_calib=cal if calib else None, conformal_alpha=alpha, **kw
    )


class TestStreamingConformal:
    def test_streaming_p_matches_host_backend(self, stream_setup):
        """The on-device searchsorted p-values equal uq.conformal_pvalues
        on the SAME f32 scores — the rank counts are integer-exact (only
        the final f32-vs-f64 division differs, below 1e-6 relative)."""
        *_, calib, rs = stream_setup
        mon = _monitor(stream_setup)
        x = rs.randn(64, 8).astype(np.float32) * 2
        v = rs.randn(64).astype(np.float32)
        out = mon.observe(x, v)
        assert out.conformal_p is not None
        s = np.abs(out.residuals[:, 0].astype(np.float64))
        want = conformal_pvalues(np.sort(calib).astype(np.float64), s)
        np.testing.assert_allclose(out.conformal_p, want, rtol=1e-6)
        # rank counts exactly: p·(n+1) − 1 = #{calib ≥ s}
        n = calib.size
        got_ge = np.round(out.conformal_p.astype(np.float64) * (n + 1) - 1)
        want_ge = np.round(want * (n + 1) - 1)
        np.testing.assert_array_equal(got_ge, want_ge)

    def test_block_size_invariance(self, stream_setup):
        """p is stateless per sample: any block split yields the identical
        series."""
        *_, rs = stream_setup
        x = rs.randn(60, 8).astype(np.float32)
        v = rs.randn(60).astype(np.float32)
        m1, m2 = _monitor(stream_setup), _monitor(stream_setup)
        one = m1.observe(x, v).conformal_p
        parts = [
            m2.observe(x[i : i + 7], v[i : i + 7]).conformal_p
            for i in range(0, 60, 7)
        ]
        np.testing.assert_array_equal(one, np.concatenate(parts))

    def test_glitch_rows_get_nan_p(self, stream_setup):
        *_, rs = stream_setup
        mon = _monitor(stream_setup)
        x = rs.randn(8, 8).astype(np.float32)
        v = rs.randn(8).astype(np.float32)
        x[3, 0] = np.nan  # feature glitch → NaN residual stack
        v[5] = np.nan  # voltage outage → NaN res
        out = mon.observe(x, v)
        assert np.isnan(out.conformal_p[3]) and np.isnan(out.conformal_p[5])
        finite = np.delete(np.arange(8), [3, 5])
        assert np.isfinite(out.conformal_p[finite]).all()

    def test_low_p_counter_reset_and_unknown_stream(self, stream_setup):
        *_, rs = stream_setup
        mon = _monitor(stream_setup, alpha=0.5)
        x = rs.randn(40, 8).astype(np.float32) * 3
        v = rs.randn(40).astype(np.float32) + 5.0  # large |res| → low p
        out = mon.observe(x, v)
        # tie-inclusive p ≤ α (duality: covered ⟺ p > α; with n_calib=99
        # the boundary p == 0.5 is exactly representable)
        want = int((np.asarray(out.conformal_p) <= 0.5).sum())
        assert mon.stream_low_p() == want and want > 0
        out2 = mon.observe(x, v)
        assert mon.stream_low_p() == want + int(
            (np.asarray(out2.conformal_p) <= 0.5).sum()
        )
        assert mon.stream_low_p("never-seen") == 0
        mon.reset()
        assert mon.stream_low_p() == 0

    def test_observe_many_parity_and_counters(self, stream_setup):
        *_, rs = stream_setup
        fleet = _monitor(stream_setup)
        solo = _monitor(stream_setup)
        xb = rs.randn(3, 10, 8).astype(np.float32)
        vb = rs.randn(3, 10).astype(np.float32)
        outs = fleet.observe_many(xb, vb, ["a", "b", "c"])
        for i, s in enumerate(["a", "b", "c"]):
            ref = solo.observe(xb[i], vb[i], stream=s)
            np.testing.assert_array_equal(outs[s].conformal_p, ref.conformal_p)
            assert fleet.stream_low_p(s) == solo.stream_low_p(s)

    def test_state_bank_roundtrip_and_backcompat(self, stream_setup, tmp_path):
        *_, rs = stream_setup
        mon = _monitor(stream_setup, alpha=0.5)
        mon.observe(rs.randn(20, 8).astype(np.float32) * 3,
                    rs.randn(20).astype(np.float32) + 4.0, stream="s1")
        path = str(tmp_path / "bank.npz")
        mon.save_state_bank(path)
        low = mon.stream_low_p("s1")
        assert low > 0
        mon2 = _monitor(stream_setup, alpha=0.5)
        mon2.load_state_bank(path)
        assert mon2.stream_low_p("s1") == low
        # a snapshot from before the counter existed loads with zeros
        d = dict(np.load(path))
        del d["low_p"]
        np.savez(str(tmp_path / "old.npz"), **d)
        mon3 = _monitor(stream_setup, alpha=0.5)
        mon3.load_state_bank(str(tmp_path / "old.npz"))
        assert mon3.stream_low_p("s1") == 0
        assert mon3.stream_n_seen("s1") == 20  # everything else restored

    def test_without_calib_everything_is_none_and_zero(self, stream_setup):
        *_, rs = stream_setup
        mon = _monitor(stream_setup, calib=False)
        out = mon.observe(rs.randn(4, 8).astype(np.float32),
                          rs.randn(4).astype(np.float32))
        assert out.conformal_p is None
        assert mon.stream_low_p() == 0

    def test_constructor_validation(self, stream_setup):
        params, sx, sy, mu, sigma, calib, _ = stream_setup
        with pytest.raises(ValueError, match="non-empty"):
            OnlineMonitor(params, sx, sy, mu, sigma,
                          conformal_calib=np.array([]))
        with pytest.raises(ValueError, match="finite"):
            OnlineMonitor(params, sx, sy, mu, sigma,
                          conformal_calib=np.array([1.0, np.nan]))
        with pytest.raises(ValueError, match="alpha"):
            OnlineMonitor(params, sx, sy, mu, sigma,
                          conformal_calib=calib, conformal_alpha=1.5)

    def test_server_payload_carries_p(self, stream_setup):
        from pinnfc_tpu.serving.server import _json_payload, _render_metrics

        *_, rs = stream_setup
        mon = _monitor(stream_setup, alpha=0.5)
        out = mon.observe(rs.randn(6, 8).astype(np.float32) * 3,
                          rs.randn(6).astype(np.float32) + 4.0)
        payload = _json_payload(out, mon, "default")
        assert len(payload["conformal_p"]) == 6
        assert payload["conformal_alpha"] == 0.5
        assert payload["stream_low_p"] == mon.stream_low_p()
        stats = {"requests": {}, "observe_seconds": 0.0, "observe_calls": 0}
        text = _render_metrics(mon, stats)
        assert 'pinnfc_stream_conformal_low_p{stream="default"} ' \
               f'{mon.stream_low_p()}' in text
        # without a calibration vector neither surface appears
        mon2 = _monitor(stream_setup, calib=False)
        out2 = mon2.observe(rs.randn(2, 8).astype(np.float32),
                            rs.randn(2).astype(np.float32))
        assert "conformal_p" not in _json_payload(out2, mon2, "default")
        assert "conformal_low_p" not in _render_metrics(mon2, stats)


def _aci_oracle(p, alpha0, alpha_star, gamma):
    """Host reference for the ACI recurrence, in the step's own f32 ops:
    α_{t+1} = α_t + γ(α* − err_t) (UNCLIPPED — the transient excursions
    outside [0,1] carry the budget debt), err_t = [finite ∧ p_t ≤ α_t],
    NaN p freezes the level."""
    a = np.float32(alpha0)
    g, s = np.float32(gamma), np.float32(alpha_star)
    alphas, errs = [], []
    for pi in np.asarray(p, np.float32):
        fin = bool(np.isfinite(pi))
        err = fin and bool(pi <= a)
        alphas.append(a)
        errs.append(err)
        if fin:
            a = np.float32(a + g * (s - np.float32(err)))
    return np.array(alphas, np.float32), np.array(errs, bool), a


class TestAdaptiveConformal:
    """Gibbs & Candès ACI in the jitted step: the per-stream alarm level
    α_t tracks drift so the long-run alarm rate stays at α*, and the
    carried level itself is a calibrated drift gauge."""

    def test_gamma_zero_pins_level(self, stream_setup):
        *_, rs = stream_setup
        mon = _monitor(stream_setup, alpha=0.2)  # default γ=0
        out = mon.observe(rs.randn(16, 8).astype(np.float32),
                          rs.randn(16).astype(np.float32))
        np.testing.assert_array_equal(out.aci_alpha, np.float32(0.2))
        finite = np.isfinite(np.asarray(out.conformal_p))
        np.testing.assert_array_equal(
            out.aci_anomaly,
            finite & (np.asarray(out.conformal_p) <= np.float32(0.2)),
        )
        assert mon.stream_aci_alpha() == np.float32(0.2)

    def test_recurrence_matches_host_oracle(self, stream_setup):
        *_, rs = stream_setup
        mon = _monitor(stream_setup, alpha=0.2, conformal_gamma=0.05)
        x = rs.randn(50, 8).astype(np.float32) * 2
        v = rs.randn(50).astype(np.float32) + 2.0
        x[7, 1] = np.nan  # a glitch mid-stream must freeze the level
        out = mon.observe(x, v)
        alphas, errs, last = _aci_oracle(out.conformal_p, 0.2, 0.2, 0.05)
        np.testing.assert_allclose(out.aci_alpha, alphas, atol=2e-7)
        # flags re-derived from the DEVICE's own levels (robust to 1-ulp
        # drift at exact-tie boundaries, impossible here by construction)
        finite = np.isfinite(np.asarray(out.conformal_p))
        np.testing.assert_array_equal(
            out.aci_anomaly,
            finite & (np.asarray(out.conformal_p) <= out.aci_alpha),
        )
        assert not out.aci_anomaly[7] and np.isfinite(out.aci_alpha[7])
        np.testing.assert_allclose(mon.stream_aci_alpha(), last, atol=2e-7)

    def test_block_split_invariance(self, stream_setup):
        """α_t is carried state like C(t): any block split replays the
        identical level series."""
        *_, rs = stream_setup
        x = rs.randn(60, 8).astype(np.float32) * 2
        v = rs.randn(60).astype(np.float32) + 1.0
        m1 = _monitor(stream_setup, alpha=0.2, conformal_gamma=0.03)
        m2 = _monitor(stream_setup, alpha=0.2, conformal_gamma=0.03)
        one = m1.observe(x, v)
        parts = [m2.observe(x[i:i + 7], v[i:i + 7]) for i in range(0, 60, 7)]
        np.testing.assert_array_equal(
            one.aci_alpha, np.concatenate([p.aci_alpha for p in parts])
        )
        np.testing.assert_array_equal(
            one.aci_anomaly, np.concatenate([p.aci_anomaly for p in parts])
        )

    def test_long_run_alarm_rate_tracks_alpha_star_under_shift(
        self, stream_setup
    ):
        """The headline ACI property: on fully shifted data (every p at the
        1/(n+1) floor) the static rule alarms on EVERY sample, while the
        adaptive level self-throttles to the α* budget."""
        *_, rs = stream_setup
        mon = _monitor(stream_setup, alpha=0.2, conformal_gamma=0.05)
        x = (rs.randn(500, 8) * 4).astype(np.float32)
        v = (rs.randn(500) + 30.0).astype(np.float32)  # huge |res|
        out = mon.observe(x, v)
        p = np.asarray(out.conformal_p)
        assert (p <= 0.2).mean() > 0.95  # static rule: alarm storm
        rate = np.asarray(out.aci_anomaly)[100:].mean()  # after burn-in
        assert abs(rate - 0.2) < 0.05
        # and the carried level IS the drift verdict: far below α*
        assert mon.stream_aci_alpha() < 0.1

    def test_constructor_validation(self, stream_setup):
        params, sx, sy, mu, sigma, calib, _ = stream_setup
        with pytest.raises(ValueError, match="conformal_gamma"):
            OnlineMonitor(params, sx, sy, mu, sigma,
                          conformal_calib=calib, conformal_gamma=1.0)
        with pytest.raises(ValueError, match="conformal_gamma"):
            OnlineMonitor(params, sx, sy, mu, sigma,
                          conformal_calib=calib, conformal_gamma=-0.1)
        with pytest.raises(ValueError, match="calib"):
            OnlineMonitor(params, sx, sy, mu, sigma, conformal_gamma=0.05)

    def test_observe_many_parity(self, stream_setup):
        *_, rs = stream_setup
        fleet = _monitor(stream_setup, alpha=0.3, conformal_gamma=0.04)
        solo = _monitor(stream_setup, alpha=0.3, conformal_gamma=0.04)
        xb = (rs.randn(3, 12, 8) * 2).astype(np.float32)
        vb = (rs.randn(3, 12) + 3.0).astype(np.float32)
        outs = fleet.observe_many(xb, vb, ["a", "b", "c"])
        for i, s in enumerate(["a", "b", "c"]):
            ref = solo.observe(xb[i], vb[i], stream=s)
            np.testing.assert_array_equal(outs[s].aci_alpha, ref.aci_alpha)
            np.testing.assert_array_equal(outs[s].aci_anomaly, ref.aci_anomaly)
            assert fleet.stream_aci_alpha(s) == solo.stream_aci_alpha(s)

    def test_state_bank_roundtrip_and_backcompat(self, stream_setup, tmp_path):
        *_, rs = stream_setup
        mon = _monitor(stream_setup, alpha=0.2, conformal_gamma=0.05)
        mon.observe((rs.randn(30, 8) * 3).astype(np.float32),
                    (rs.randn(30) + 10.0).astype(np.float32), stream="s1")
        a1 = mon.stream_aci_alpha("s1")
        assert a1 != np.float32(0.2)  # the level actually moved
        path = str(tmp_path / "bank.npz")
        mon.save_state_bank(path)
        mon2 = _monitor(stream_setup, alpha=0.2, conformal_gamma=0.05)
        mon2.load_state_bank(path)
        assert mon2.stream_aci_alpha("s1") == a1
        # a pre-ACI snapshot restores with the level reset to α*
        d = dict(np.load(path))
        del d["state_aci_alpha"]
        np.savez(str(tmp_path / "old.npz"), **d)
        mon3 = _monitor(stream_setup, alpha=0.2, conformal_gamma=0.05)
        mon3.load_state_bank(str(tmp_path / "old.npz"))
        assert mon3.stream_aci_alpha("s1") == np.float32(0.2)
        assert mon3.stream_n_seen("s1") == 30  # everything else restored

    def test_unknown_stream_reports_alpha_star(self, stream_setup):
        mon = _monitor(stream_setup, alpha=0.25, conformal_gamma=0.02)
        assert mon.stream_aci_alpha("never-seen") == 0.25

    def test_server_payload_and_metrics(self, stream_setup):
        from pinnfc_tpu.serving.server import _json_payload, _render_metrics

        *_, rs = stream_setup
        mon = _monitor(stream_setup, alpha=0.2, conformal_gamma=0.05)
        out = mon.observe((rs.randn(6, 8) * 3).astype(np.float32),
                          (rs.randn(6) + 8.0).astype(np.float32))
        payload = _json_payload(out, mon, "default")
        assert len(payload["aci_alpha"]) == 6
        assert payload["aci_anomaly"] == out.aci_anomaly.tolist()
        stats = {"requests": {}, "observe_seconds": 0.0, "observe_calls": 0}
        text = _render_metrics(mon, stats)
        assert ('pinnfc_stream_aci_alpha{stream="default"} '
                f"{mon.stream_aci_alpha():.6g}") in text
        # without a calibration vector the surface is absent entirely
        mon2 = _monitor(stream_setup, calib=False)
        out2 = mon2.observe(rs.randn(2, 8).astype(np.float32),
                            rs.randn(2).astype(np.float32))
        assert "aci_alpha" not in _json_payload(out2, mon2, "default")
        assert "pinnfc_stream_aci_alpha" not in _render_metrics(mon2, stats)

    def test_artifact_roundtrip_parity(self, stream_setup):
        """γ bakes into the exported step; the carried level crosses the
        StableHLO boundary as state and replays identically."""
        from pinnfc_tpu.serving import export_monitor_step, monitor_from_artifact

        params, sx, sy, mu, sigma, calib, rs = stream_setup
        src = _monitor(stream_setup, alpha=0.2, conformal_gamma=0.05)
        blob = export_monitor_step(src, platforms=("cpu", "tpu"))
        am = monitor_from_artifact(blob, mu, sigma, conformal_alpha=0.2)
        x = (rs.randn(40, 8) * 3).astype(np.float32)
        v = (rs.randn(40) + 10.0).astype(np.float32)
        for _ in range(2):  # two blocks: the carried α_t must round-trip
            o_art, o_src = am.observe(x, v), src.observe(x, v)
            np.testing.assert_array_equal(o_art.aci_alpha, o_src.aci_alpha)
            np.testing.assert_array_equal(o_art.aci_anomaly, o_src.aci_anomaly)
        assert am.stream_aci_alpha() == src.stream_aci_alpha()
        assert am.stream_aci_alpha() != np.float32(0.2)  # it moved


class TestExportedConformal:
    """The calibration vector bakes into StableHLO monitor-step artifacts
    (serving/exported.py v3 schema)."""

    def test_artifact_roundtrip_parity(self, stream_setup):
        from pinnfc_tpu.serving import export_monitor_step, monitor_from_artifact

        params, sx, sy, mu, sigma, calib, rs = stream_setup
        src = _monitor(stream_setup, alpha=0.3)
        blob = export_monitor_step(src, platforms=("cpu", "tpu"))
        am = monitor_from_artifact(blob, mu, sigma, conformal_alpha=0.3)
        assert am.conformal_baked and am.conformal_alpha == 0.3
        x = rs.randn(9, 8).astype(np.float32) * 2
        v = rs.randn(9).astype(np.float32)
        o_art, o_src = am.observe(x, v), src.observe(x, v)
        # rank statistics are exact across the export boundary (searchsorted
        # against identical baked constants; only the |res| input can move
        # at fusion-level rounding — assert ranks equal, not just close)
        np.testing.assert_array_equal(o_art.conformal_p, o_src.conformal_p)
        assert am.stream_low_p() == src.stream_low_p()

    def test_artifact_without_calib_stays_none(self, stream_setup):
        from pinnfc_tpu.serving import export_monitor_step, monitor_from_artifact

        params, sx, sy, mu, sigma, *_ , rs = stream_setup
        src = _monitor(stream_setup, calib=False)
        am = monitor_from_artifact(
            export_monitor_step(src, platforms=("cpu", "tpu")), mu, sigma
        )
        assert not am.conformal_baked
        out = am.observe(rs.randn(3, 8).astype(np.float32),
                         rs.randn(3).astype(np.float32))
        assert out.conformal_p is None


class TestConformalCli:
    def test_cli_monitor_conformal_summary(self, tmp_path, capsys):
        """`cli monitor --conformal`: normal rows anomaly at ≈α, the
        induced fault segment far above it."""
        import jax

        from pinnfc_tpu.cli import main
        from pinnfc_tpu.data.contract import save_comprehensive_results
        from pinnfc_tpu.models.pinn import init_pinn
        from pinnfc_tpu.utils import save_checkpoint

        rs = np.random.RandomState(3)
        sx = AffineScaler.fit(rs.randn(200, 8).astype(np.float32))
        sy = AffineScaler.fit(rs.randn(200, 1).astype(np.float32))
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, sx, sy)

        n = 300
        arr = np.zeros((n, 22))
        arr[:, 0:8] = rs.randn(n, 8)
        arr[:, INDEX["y_true"]] = rs.randn(n) * 0.1
        arr[n // 2 :, INDEX["label"]] = 2
        arr[n // 2 :, INDEX["y_true"]] -= 3.0  # collapse → large |res|
        # res column feeds the calibration scores
        arr[:, INDEX["res"]] = arr[:, INDEX["y_true"]]
        mat = str(tmp_path / "F01.mat")
        save_comprehensive_results(arr, mat)

        rc = main(["monitor", "--mat", mat, "--ckpt", ckpt,
                   "--conformal", "--conformal-alpha", "0.2", "--block", "50"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "conformal calibration:" in out
        assert "conformal anomaly rate (p≤0.2):" in out
        assert "normal" in out and "fault" in out

    def test_cli_monitor_conformal_gamma_summary(self, tmp_path, capsys):
        """`cli monitor --conformal --conformal-gamma`: the replay prints
        the adaptive level after the stream — the calibrated drift verdict."""
        import jax

        from pinnfc_tpu.cli import main
        from pinnfc_tpu.data.contract import save_comprehensive_results
        from pinnfc_tpu.models.pinn import init_pinn
        from pinnfc_tpu.utils import save_checkpoint

        rs = np.random.RandomState(4)
        sx = AffineScaler.fit(rs.randn(200, 8).astype(np.float32))
        sy = AffineScaler.fit(rs.randn(200, 1).astype(np.float32))
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, sx, sy)
        n = 200
        arr = np.zeros((n, 22))
        arr[:, 0:8] = rs.randn(n, 8)
        arr[:, INDEX["y_true"]] = rs.randn(n) * 0.1
        arr[:, INDEX["res"]] = arr[:, INDEX["y_true"]]
        mat = str(tmp_path / "F01.mat")
        save_comprehensive_results(arr, mat)
        rc = main(["monitor", "--mat", mat, "--ckpt", ckpt, "--conformal",
                   "--conformal-alpha", "0.2", "--conformal-gamma", "0.05",
                   "--block", "50"])
        out = capsys.readouterr().out
        assert rc == 0
        assert "adaptive conformal level after replay: α_t=" in out
        assert "γ=0.05" in out

    def test_cli_monitor_gamma_without_conformal_rejected(self, capsys):
        from pinnfc_tpu.cli import main

        rc = main(["monitor", "--mat", "whatever.mat", "--ckpt", "ck",
                   "--conformal-gamma", "0.05"])
        assert rc == 2
        assert "needs --conformal" in capsys.readouterr().err

    def test_cli_serve_gamma_rejections(self, capsys):
        from pinnfc_tpu.cli import main

        # with an artifact: γ is baked at export time — loud rejection
        rc = main(["serve", "--mat", "m.mat", "--artifact", "a.shlo",
                   "--conformal-gamma", "0.05"])
        assert rc == 2
        assert "baked into the artifact" in capsys.readouterr().err
        # checkpoint path: γ without --conformal has no p-value to adapt
        rc = main(["serve", "--mat", "m.mat", "--ckpt", "ck",
                   "--conformal-gamma", "0.05"])
        assert rc == 2
        assert "needs --conformal" in capsys.readouterr().err

    def test_cli_export_gamma_requires_conformal_mat(self, capsys):
        from pinnfc_tpu.cli import main

        rc = main(["export-model", "--ckpt", "ck", "--out", "o.shlo",
                   "--monitor-step", "--conformal-gamma", "0.05"])
        assert rc == 2
        assert "--conformal-mat" in capsys.readouterr().err

    def test_cli_monitor_fleet_conformal_rejected(self, tmp_path, capsys):
        """--conformal with --fleet would be a silent no-op (the fleet
        table has no p-value column) — rejected loudly, same policy as
        --fleet --whatif."""
        from pinnfc_tpu.cli import main

        rc = main(["monitor", "--mat", "whatever.mat", "--ckpt", "ck",
                   "--fleet", "--conformal"])
        assert rc == 2
        assert "single-stream" in capsys.readouterr().err
