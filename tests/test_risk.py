"""RF(t) risk-function tests against a literal numpy oracle of the reference
loops (04:201-285)."""

import numpy as np
import pytest

from pinnfc_tpu.config import RiskConfig
from pinnfc_tpu.data.contract import INDEX
from pinnfc_tpu.risk import (
    compute_rf_advance_for_condition,
    compute_rf_time_series,
    estimate_mu_sigma_normal,
    find_first_alarm_index,
    run_risk_pipeline,
)


def _numpy_rf_oracle(r, mu, sigma, cfg: RiskConfig):
    """Literal transcription of the reference algorithm (04:234-279)."""
    n, d = r.shape
    w_feat = np.asarray(cfg.feature_weights, float)
    z = (r - mu.reshape(1, -1)) / sigma.reshape(1, -1)
    a = np.abs(z)
    a_trunc = np.maximum(0.0, a - cfg.z_safe)
    key_to_idx = {k: i for i, k in enumerate(cfg.res_keys)}
    s_tot = np.zeros(n)
    layer_w = dict(cfg.layer_weights)
    for lname, keys in cfg.layer_config:
        idxs = [key_to_idx[k] for k in keys if k in key_to_idx]
        if not idxs:
            continue
        a_l = a_trunc[:, idxs]
        w_l = w_feat[idxs].reshape(1, -1)
        s_l = np.power((w_l * np.power(a_l, cfg.p_layer)).sum(axis=1), 1.0 / cfg.p_layer)
        s_tot += layer_w.get(lname, 1.0) * s_l
    c = np.zeros(n)
    for t in range(1, n):
        c[t] = cfg.lambda_decay * c[t - 1] + s_tot[t]
    c_clip = np.clip(c, 0.0, cfg.c_max)
    l0 = 1.0 / (1.0 + np.exp(-cfg.k_logistic * (0.0 - cfg.c0_logistic)))
    lm = 1.0 / (1.0 + np.exp(-cfg.k_logistic * (cfg.c_max - cfg.c0_logistic)))
    denom = (lm - l0) if (lm - l0) != 0 else 1e-6
    rf_inst = (1.0 / (1.0 + np.exp(-cfg.k_logistic * (c_clip - cfg.c0_logistic))) - l0) / denom
    rf_inst = np.clip(rf_inst, 0.0, 1.0)
    rf_smooth = np.zeros_like(rf_inst)
    rf_smooth[0] = rf_inst[0]
    for t in range(1, n):
        rf_smooth[t] = cfg.alpha_smooth * rf_inst[t] + (1 - cfg.alpha_smooth) * rf_smooth[t - 1]
    return rf_inst, rf_smooth, c, s_tot


@pytest.fixture(scope="module")
def fake_results():
    """Synthetic comprehensive_results with growing residuals in fault rows."""
    rng = np.random.RandomState(0)
    n_normal, n_fault = 600, 150
    n = n_normal + 12 * n_fault
    arr = np.zeros((n, 22))
    arr[:, INDEX["y_true"]] = 4.0 + 0.01 * rng.randn(n)
    for k in ("res", "pV", "pT", "pH", "pO"):
        arr[:, INDEX[k]] = 0.1 * rng.randn(n)
    pos = n_normal
    label = 1
    for fault in range(4):
        for cur_idx, amps in enumerate((108.0, 270.0, 405.0)):
            seg = slice(pos, pos + n_fault)
            arr[seg, INDEX["label"]] = label
            arr[seg, INDEX["x0"]] = amps
            ramp = np.linspace(0, 3.0, n_fault)
            arr[seg, INDEX["res"]] += ramp * 0.5
            arr[seg, INDEX["pV"]] += ramp * 0.4
            arr[seg, INDEX["y_true"]] = 4.0 - np.linspace(0, 0.3, n_fault)
            pos += n_fault
            label += 1
    arr[: n_normal, INDEX["x0"]] = rng.uniform(100, 400, n_normal)
    return arr


class TestRfCore:
    def test_matches_numpy_oracle(self, fake_results, rng):
        cfg = RiskConfig()
        mu, sigma = estimate_mu_sigma_normal(fake_results)
        r = np.stack(
            [fake_results[:800, INDEX[k]].astype(float) for k in cfg.res_keys], axis=1
        )
        want_inst, want_smooth, want_c, want_s = _numpy_rf_oracle(r, mu, sigma, cfg)
        rf = compute_rf_time_series(r, mu, sigma, cfg)
        np.testing.assert_allclose(np.asarray(rf["s_tot"]), want_s, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(rf["c"]), want_c, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(rf["rf_inst"]), want_inst, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(rf["rf_smooth"]), want_smooth, rtol=1e-3, atol=1e-4)

    def test_mu_sigma_ddof1_and_floor(self):
        arr = np.zeros((10, 22))
        arr[:, INDEX["label"]] = 0
        arr[:, INDEX["res"]] = np.arange(10.0)
        # pV constant → σ floored to 1e-6
        mu, sigma = estimate_mu_sigma_normal(arr)
        assert mu[0] == pytest.approx(4.5)
        assert sigma[0] == pytest.approx(np.std(np.arange(10.0), ddof=1))
        assert sigma[1] == pytest.approx(1e-6)

    def test_rf_zero_when_in_safe_band(self):
        cfg = RiskConfig()
        mu = np.zeros(5)
        sigma = np.ones(5)
        r = 0.5 * np.ones((100, 5))  # |z| = 0.5 < z_safe=2 → S=0 → RF=0
        rf = compute_rf_time_series(r, mu, sigma, cfg)
        # atol 1e-5: on-device f32 exp differs from the host f64 logistic
        # offset l_0 by ~3e-6 at C=0
        np.testing.assert_allclose(np.asarray(rf["rf_smooth"]), 0.0, atol=1e-5)


class TestAlarms:
    def test_find_first_alarm(self):
        s = np.array([0.1, 0.2, 0.35, 0.25, 0.5])
        assert find_first_alarm_index(s, 0.3, "above") == 2
        assert find_first_alarm_index(s, 0.15, "below") == 0
        assert find_first_alarm_index(s, 0.9, "above") is None
        with pytest.raises(ValueError):
            find_first_alarm_index(s, 0.3, "sideways")

    def test_condition_advance(self, fake_results):
        cfg = RiskConfig()
        mu, sigma = estimate_mu_sigma_normal(fake_results)
        adv = compute_rf_advance_for_condition(
            fake_results, mu, sigma, "水淹", 108.0, cfg
        )
        assert adv is not None
        assert adv.n_samples == 150
        assert adv.v_threshold == pytest.approx(adv.voltage[0] - 0.1)
        # voltage drops 0.3 total → crosses threshold; RF should fire first
        assert adv.idx_v_alarm is not None

    def test_layer_attribution_exact(self, fake_results):
        """layer_shares: the fixture ramps res+pV, so the voltage layer
        must dominate, and the decayed layer contributions must reconstruct
        C at the alarm instant exactly (the integral is linear in the
        layer terms)."""
        cfg = RiskConfig()
        mu, sigma = estimate_mu_sigma_normal(fake_results)
        adv = compute_rf_advance_for_condition(
            fake_results, mu, sigma, "水淹", 108.0, cfg
        )
        assert set(adv.layer_shares) == {"voltage", "gas", "temp"}
        assert sum(adv.layer_shares.values()) == pytest.approx(1.0)
        assert all(v >= 0 for v in adv.layer_shares.values())
        assert adv.dominant_layer == "voltage"
        assert adv.layer_shares["voltage"] > 0.5

        # the per-layer integral series decompose C exactly at every t
        sub = fake_results[adv.row_indices]
        r = np.stack(
            [sub[:, INDEX[k]].astype(float) for k in cfg.res_keys], axis=1
        )
        rf = compute_rf_time_series(r, mu, sigma, cfg)
        t = adv.idx_rf_alarm
        assert t is not None
        c_sum = np.sum(np.stack(list(adv.layer_c.values())), axis=0)
        np.testing.assert_allclose(
            c_sum, np.asarray(rf["c"]), rtol=1e-3, atol=1e-3
        )
        # and the reported shares are exactly the composition at the alarm
        total = sum(c[t] for c in adv.layer_c.values())
        for name, share in adv.layer_shares.items():
            assert share == pytest.approx(adv.layer_c[name][t] / total)

    def test_layer_attribution_isolates_excited_layer(self):
        """Exciting ONLY the temperature residual must attribute the alarm
        ~100% to the temp layer."""
        cfg = RiskConfig()
        n = 200
        arr = np.zeros((n, 22))
        arr[:, INDEX["y_true"]] = 4.0
        arr[:, INDEX["x0"]] = 108.0
        arr[50:, INDEX["label"]] = 1
        arr[50:, INDEX["pT"]] = np.linspace(0.0, 50.0, n - 50)
        mu, sigma = np.zeros(5), np.ones(5)
        adv = compute_rf_advance_for_condition(arr, mu, sigma, "水淹", 108.0, cfg)
        assert adv is not None and adv.layer_shares
        assert adv.dominant_layer == "temp"
        assert adv.layer_shares["temp"] == pytest.approx(1.0)
        assert adv.layer_shares["voltage"] == pytest.approx(0.0, abs=1e-6)

    def test_index_range_clipping(self, fake_results):
        cfg = RiskConfig()
        mu, sigma = estimate_mu_sigma_normal(fake_results)
        adv = compute_rf_advance_for_condition(
            fake_results, mu, sigma, "水淹", 108.0, cfg, index_range=(0, 50)
        )
        assert adv.n_samples == 50
        none_adv = compute_rf_advance_for_condition(
            fake_results, mu, sigma, "水淹", 108.0, cfg, index_range=(60, 50)
        )
        assert none_adv is None

    def test_missing_condition_returns_none(self, fake_results):
        cfg = RiskConfig()
        mu, sigma = estimate_mu_sigma_normal(fake_results)
        assert (
            compute_rf_advance_for_condition(fake_results, mu, sigma, "水淹", 999.0, cfg)
            is None
        )

    def test_full_pipeline_12_conditions(self, fake_results):
        out = run_risk_pipeline(fake_results)
        assert len(out) == 12
        for adv in out:
            assert np.isfinite(adv.rf_smooth).all()


class TestNumpyBackend:
    def test_numpy_backend_exact_vs_loop_oracle(self, fake_results, rng):
        """backend='numpy' (lfilter f64) is exact w.r.t. the reference's
        sequential loops (≤1e-12 — same arithmetic, vectorized)."""
        cfg = RiskConfig()
        mu, sigma = estimate_mu_sigma_normal(fake_results)
        r = np.stack(
            [fake_results[:700, INDEX[k]].astype(float) for k in cfg.res_keys],
            axis=1,
        )
        want_inst, want_smooth, want_c, want_s = _numpy_rf_oracle(r, mu, sigma, cfg)
        rf = compute_rf_time_series(r, mu, sigma, cfg, backend="numpy")
        np.testing.assert_allclose(rf["s_tot"], want_s, rtol=1e-12)
        np.testing.assert_allclose(rf["c"], want_c, rtol=1e-9, atol=1e-12)
        np.testing.assert_allclose(rf["rf_inst"], want_inst, rtol=1e-9, atol=1e-14)
        np.testing.assert_allclose(rf["rf_smooth"], want_smooth, rtol=1e-9, atol=1e-14)

    def test_backends_agree_on_alarm_indices(self, fake_results):
        out_jax = run_risk_pipeline(fake_results, backend="jax")
        out_np = run_risk_pipeline(fake_results, backend="numpy")
        assert len(out_jax) == len(out_np)
        for a, b in zip(out_jax, out_np):
            assert a.idx_v_alarm == b.idx_v_alarm
            assert a.idx_rf_alarm == b.idx_rf_alarm

    def test_backends_agree_full_campaign_scale(self):
        """VERDICT r3 #5: the f32 jax and f64 numpy backends must produce
        the IDENTICAL 12-condition alarm-index table (04:395-408) at the
        full campaign scale — 12 fault segments of 1050 samples (the
        reference's own (0,1050) window for condition 1) with SLOW-onset
        residual ramps and noise, so rf_smooth grazes the 0.3 warning
        threshold for many samples: the adversarial regime where an f32
        rounding flip would move an integer crossing.  Warning times are
        whole-sample quantities, so this is asserted exactly, not within
        a tolerance; 'jax' stays the CLI default because it is the path
        the on-device serving monitor replays."""
        rng = np.random.RandomState(7)
        n_normal, n_fault = 2000, 1050
        n = n_normal + 12 * n_fault
        arr = np.zeros((n, 22))
        arr[:, INDEX["y_true"]] = 4.0 + 0.01 * rng.randn(n)
        for k in ("res", "pV", "pT", "pH", "pO"):
            arr[:, INDEX[k]] = 0.1 * rng.randn(n)
        arr[:n_normal, INDEX["x0"]] = rng.uniform(100, 400, n_normal)
        pos, label = n_normal, 1
        for fault in range(4):
            for amps in (108.0, 270.0, 405.0):
                seg = slice(pos, pos + n_fault)
                arr[seg, INDEX["label"]] = label
                arr[seg, INDEX["x0"]] = amps
                # slow onset: healthy dwell then a shallow ramp that keeps
                # |z| barely past z_safe → RF(t) creeps across 0.3
                t = np.linspace(0.0, 1.0, n_fault)
                ramp = np.clip((t - 0.25) / 0.75, 0.0, 1.0)
                arr[seg, INDEX["res"]] += ramp * 0.35
                arr[seg, INDEX["pV"]] += ramp * 0.3
                arr[seg, INDEX["pT"]] += ramp * 0.25
                arr[seg, INDEX["y_true"]] = 4.0 - ramp * 0.15
                pos += n_fault
                label += 1

        out_jax = run_risk_pipeline(arr, backend="jax")
        out_np = run_risk_pipeline(arr, backend="numpy")
        assert len(out_jax) == len(out_np) == 12
        for a, b in zip(out_jax, out_np):
            assert (a.current_target, a.fault_name) == (b.current_target, b.fault_name)
            assert a.idx_v_alarm == b.idx_v_alarm
            assert a.idx_rf_alarm == b.idx_rf_alarm
            assert a.advance == b.advance
        # the scenario actually exercises alarms (not all-None trivially)
        assert sum(a.idx_rf_alarm is not None for a in out_jax) == 12


class TestBucketPadding:
    """The jitted RF path bucket-pads row counts to powers of two (round
    5): trailing zero-pad must leave rows [0, n) bit-identical for EVERY
    length, including ones straddling bucket boundaries."""

    def test_lengths_across_bucket_boundaries(self, rng):
        cfg = RiskConfig()
        base = rng.normal(0.0, 3.0, (1100, 5))
        mu = np.zeros(5)
        sigma = np.ones(5)
        # full-length series once; every prefix must reproduce it exactly
        # (causality): 511/512/513 cross the min bucket, 1024/1025 the next
        full = compute_rf_time_series(base, mu, sigma, cfg)
        for n in (1, 2, 511, 512, 513, 1024, 1025, 1100):
            part = compute_rf_time_series(base[:n], mu, sigma, cfg)
            np.testing.assert_array_equal(
                np.asarray(part["rf_smooth"]),
                np.asarray(full["rf_smooth"])[:n],
            )
            np.testing.assert_array_equal(
                np.asarray(part["s_tot"]), np.asarray(full["s_tot"])[:n]
            )
            for k, v in part["s_layers"].items():
                np.testing.assert_array_equal(
                    np.asarray(v), np.asarray(full["s_layers"][k])[:n]
                )
