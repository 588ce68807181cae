"""Counterfactual recovery (uq/counterfactual.py + cli whatif).

Beyond-reference prescriptive explainability: the reference stops at
detection (04:389 alarm) and attribution (04:244-259); this surface
inverts the trained model for the minimal in-distribution actuation that
clears the alarm.  The solve is property-tested (zero-move optimality,
frozen channels, training-range box, row independence, α-monotonicity)
rather than anchored to a closed form — the objective is nonconvex
through the MLP, but every property below IS a theorem about the
implementation.
"""

import json
import os

import jax
import numpy as np
import pytest

from pinnfc_tpu.data.contract import INDEX, INPUT_CHANNELS
from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.mlp import init_mlp, mlp_forward
from pinnfc_tpu.uq import (
    CounterfactualConfig,
    actuatable_mask,
    condition_recovery,
    counterfactual_recovery,
    summarize_recovery,
)

LO = np.array([50, 1.0, 20, 100, 100, 30, 5, 50], float)
HI = np.array([800, 3.5, 35, 160, 140, 75, 40, 400], float)


@pytest.fixture(scope="module")
def setup():
    """Tiny MLP + scalers over physically distinct channel ranges."""
    rs = np.random.RandomState(0)
    n = 32
    x_phys = (LO + (HI - LO) * rs.rand(n, 8)).astype(np.float32)
    y_phys = (300 + 60 * rs.rand(n, 1)).astype(np.float32)
    scaler_x = AffineScaler.fit(x_phys)
    scaler_y = AffineScaler.fit(y_phys)
    params = init_mlp(jax.random.PRNGKey(3), (8, 16, 1))
    return params, x_phys, scaler_x, scaler_y


def _v_model(params, x_phys, scaler_x, scaler_y):
    """Oracle: eval-mode voltage in volts for physical rows."""
    xn = scaler_x.transform(np.asarray(x_phys, np.float32))
    mean, _ = mlp_forward(params, xn, train=False, logvar=False)
    return np.asarray(scaler_y.inverse(np.asarray(mean))).reshape(-1)


class TestRecoverySolve:
    def test_rows_already_above_target_stay_exactly_put(self, setup):
        params, x_phys, sx, sy = setup
        v0 = _v_model(params, x_phys, sx, sy)
        rep = counterfactual_recovery(
            params, x_phys, v0 - 5.0, sx, sy,
            config=CounterfactualConfig(steps=50, margin=0.0),
        )
        # zero init is a stationary point when the hinge is inactive —
        # delta must be EXACTLY zero, not merely small
        np.testing.assert_array_equal(rep.delta_phys, 0.0)
        np.testing.assert_array_equal(rep.x_cf_phys, x_phys)
        assert rep.recovered.all()
        np.testing.assert_allclose(rep.v_before, v0, atol=1e-4)
        np.testing.assert_allclose(rep.v_after, rep.v_before, atol=1e-4)

    def test_hinge_never_worsens_and_some_rows_recover(self, setup):
        params, x_phys, sx, sy = setup
        v0 = _v_model(params, x_phys, sx, sy)
        target = v0 + 0.3 * float(v0.std())
        rep = counterfactual_recovery(
            params, x_phys, target, sx, sy,
            config=CounterfactualConfig(steps=400, alpha=0.01),
        )
        short_before = np.maximum(0.0, target - rep.v_before)
        short_after = np.maximum(0.0, target - rep.v_after)
        assert (short_after <= short_before + 1e-3).all()
        assert rep.recovered.mean() > 0.5
        # v_before reported by the jitted steps=0 program matches the oracle
        np.testing.assert_allclose(rep.v_before, v0, atol=1e-4)

    def test_frozen_channels_never_move(self, setup):
        params, x_phys, sx, sy = setup
        v0 = _v_model(params, x_phys, sx, sy)
        rep = counterfactual_recovery(
            params, x_phys, v0 + 20.0, sx, sy,
            config=CounterfactualConfig(steps=200),
        )
        # defaults freeze stack current (x0) and coolant_t_out (x5)
        for name in ("current", "coolant_t_out"):
            k = list(INPUT_CHANNELS).index(name)
            np.testing.assert_array_equal(rep.delta_phys[:, k], 0.0)
            np.testing.assert_array_equal(rep.x_cf_phys[:, k], x_phys[:, k])
            assert not rep.actuatable[k]

    def test_custom_actuatable_set(self, setup):
        params, x_phys, sx, sy = setup
        v0 = _v_model(params, x_phys, sx, sy)
        rep = counterfactual_recovery(
            params, x_phys, v0 + 20.0, sx, sy,
            actuatable=("air_flow",),
            config=CounterfactualConfig(steps=200),
        )
        k = list(INPUT_CHANNELS).index("air_flow")
        others = [i for i in range(8) if i != k]
        np.testing.assert_array_equal(rep.delta_phys[:, others], 0.0)
        assert np.abs(rep.delta_phys[:, k]).max() > 0

        with pytest.raises(ValueError, match="unknown channels"):
            actuatable_mask(("air_flow", "warp_core"))

    def test_box_constraint_training_range(self, setup):
        params, x_phys, sx, sy = setup
        v0 = _v_model(params, x_phys, sx, sy)
        # unreachable target forces the solver INTO the box faces
        rep = counterfactual_recovery(
            params, x_phys, v0 + 1e4, sx, sy,
            config=CounterfactualConfig(steps=300, alpha=0.0),
        )
        lo = np.asarray(sx.data_min)
        hi = np.asarray(sx.data_max)
        eps = 1e-3 * (hi - lo)
        assert (rep.x_cf_phys >= lo[None, :] - eps).all()
        assert (rep.x_cf_phys <= hi[None, :] + eps).all()

    def test_out_of_range_input_stays_put_when_recovered(self, setup):
        params, _, sx, sy = setup
        # a row outside the training box on an actuatable channel
        x = (LO + 0.5 * (HI - LO)).astype(np.float32)[None, :]
        k = list(INPUT_CHANNELS).index("air_flow")
        x[0, k] = HI[k] + 50.0
        v0 = _v_model(params, x, sx, sy)
        rep = counterfactual_recovery(
            params, x, v0 - 5.0, sx, sy,
            config=CounterfactualConfig(steps=50),
        )
        # δ = 0 must remain feasible: the widened box may not clip it back
        np.testing.assert_array_equal(rep.x_cf_phys, x)

    def test_zero_span_channel_frozen_even_if_requested(self, setup):
        params, x_phys, _, sy = setup
        x = x_phys.copy()
        k = list(INPUT_CHANNELS).index("h2_flow")
        x[:, k] = 25.0  # constant in "training"
        sx = AffineScaler.fit(x)
        v0 = _v_model(params, x, sx, sy)
        rep = counterfactual_recovery(
            params, x, v0 + 20.0, sx, sy,
            actuatable=("h2_flow", "air_flow"),
            config=CounterfactualConfig(steps=100),
        )
        np.testing.assert_array_equal(rep.delta_phys[:, k], 0.0)
        np.testing.assert_array_equal(rep.x_cf_phys[:, k], 25.0)

    def test_rows_independent_batch_equals_single(self, setup):
        params, x_phys, sx, sy = setup
        x = x_phys[:4]
        v0 = _v_model(params, x, sx, sy)
        target = v0 + 0.3 * float(v0.std())
        cfg = CounterfactualConfig(steps=120)
        full = counterfactual_recovery(params, x, target, sx, sy, config=cfg)
        for i in range(4):
            one = counterfactual_recovery(
                params, x[i : i + 1], target[i : i + 1], sx, sy, config=cfg
            )
            np.testing.assert_allclose(
                one.delta_phys[0], full.delta_phys[i], atol=2e-4
            )
            np.testing.assert_allclose(one.v_after[0], full.v_after[i], atol=2e-4)

    def test_alpha_shrinks_the_move(self, setup):
        params, x_phys, sx, sy = setup
        v0 = _v_model(params, x_phys, sx, sy)
        target = v0 + 0.3 * float(v0.std())
        small = counterfactual_recovery(
            params, x_phys, target, sx, sy,
            config=CounterfactualConfig(steps=300, alpha=1e-3),
        )
        big = counterfactual_recovery(
            params, x_phys, target, sx, sy,
            config=CounterfactualConfig(steps=300, alpha=5.0),
        )
        norm = lambda r: float(np.abs(r.delta_range).sum())
        assert norm(big) < norm(small)

    def test_gain_mode_equals_absolute_when_meas_equals_model(self, setup):
        """With v_meas ≡ v̂(x₀) the gain hinge target v̂₀ + relu(t+m−v̂₀)
        coincides with the absolute target max(t+m, inactive) — the two
        modes must produce the identical solve."""
        params, x_phys, sx, sy = setup
        v0 = _v_model(params, x_phys, sx, sy)
        target = v0 + 0.3 * float(v0.std())
        cfg = CounterfactualConfig(steps=120)
        absolute = counterfactual_recovery(
            params, x_phys, target, sx, sy, config=cfg
        )
        gain = counterfactual_recovery(
            params, x_phys, target, sx, sy, config=cfg,
            v_meas=absolute.v_before,
        )
        np.testing.assert_allclose(
            gain.delta_phys, absolute.delta_phys, atol=2e-4
        )
        assert gain.v_meas is not None and gain.v_expected is not None
        np.testing.assert_allclose(
            gain.v_expected, gain.v_meas + (gain.v_after - gain.v_before),
            atol=1e-6,
        )
        assert absolute.v_meas is None and absolute.v_expected is None

    def test_gain_mode_measured_above_line_stays_put(self, setup):
        """Rows whose MEASURED voltage already clears the line need zero
        gain — exactly zero move even when the model's own prediction
        sits far below the target."""
        params, x_phys, sx, sy = setup
        v0 = _v_model(params, x_phys, sx, sy)
        target = v0 + 100.0  # model prediction hopelessly below
        v_meas = target + 1.0  # but the measurement is fine
        rep = counterfactual_recovery(
            params, x_phys, target, sx, sy,
            config=CounterfactualConfig(steps=50), v_meas=v_meas,
        )
        np.testing.assert_array_equal(rep.delta_phys, 0.0)
        assert rep.recovered.all()

    def test_gain_mode_recovers_measured_shortfall(self, setup):
        """Measured voltage sits below the line; the solve must close the
        shortfall through the model's input sensitivity and report
        recovery in EXPECTED-MEASURED terms."""
        params, x_phys, sx, sy = setup
        v0 = _v_model(params, x_phys, sx, sy)
        target = np.full_like(v0, float(np.median(v0)))
        shortfall = 0.2 * float(v0.std())
        v_meas = target - shortfall
        rep = counterfactual_recovery(
            params, x_phys, target, sx, sy,
            config=CounterfactualConfig(steps=400, alpha=0.01),
            v_meas=v_meas,
        )
        assert np.abs(rep.delta_phys).max() > 0
        np.testing.assert_array_equal(
            rep.recovered, rep.v_expected >= rep.v_target
        )
        assert rep.recovered.mean() > 0.5
        # the gain never overshoots into worse-than-before territory
        assert ((rep.v_after - rep.v_before) >= -1e-3).all()

    def test_bad_shape_raises(self, setup):
        params, x_phys, sx, sy = setup
        with pytest.raises(ValueError, match="x_phys must be"):
            counterfactual_recovery(params, x_phys[:, :5], 300.0, sx, sy)

    def test_summarize(self, setup):
        params, x_phys, sx, sy = setup
        v0 = _v_model(params, x_phys, sx, sy)
        rep = counterfactual_recovery(
            params, x_phys, v0 + 10.0, sx, sy,
            config=CounterfactualConfig(steps=150),
        )
        s = summarize_recovery(rep)
        assert s["dominant"] in INPUT_CHANNELS
        assert 0.0 <= s["recovered_frac"] <= 1.0
        assert s["n_moved"] > 0
        assert s["mean_delta_range"].shape == (8,)


def _make_artifact(params, sx, sy, n_fault=80):
    """Artifact with one alarmed Flooding condition at 108 A (voltage
    ramps below V(0) − 0.1) and one never-alarmed Oxygen-starvation
    condition (flat voltage)."""
    rs = np.random.RandomState(1)
    rows = []
    for label, amps, drop in ((1, 108.0, 0.4), (4, 270.0, 0.0)):
        x = (LO + (HI - LO) * rs.rand(n_fault, 8)).astype(np.float64)
        x[:, 0] = amps
        seg = np.zeros((n_fault, 22))
        seg[:, :8] = x
        seg[:, INDEX["y_true"]] = 4.0 - np.linspace(0.0, drop, n_fault)
        seg[:, INDEX["label"]] = label
        rows.append(seg)
    return np.concatenate(rows, axis=0)


class TestConditionRecovery:
    def test_alarmed_vs_never_alarmed(self, setup):
        params, x_phys, sx, sy = setup
        arr = _make_artifact(params, sx, sy)
        recs = condition_recovery(
            arr, params, sx, sy,
            config=CounterfactualConfig(steps=60), max_rows=16,
        )
        by_key = {(r.current_target, r.fault_name): r for r in recs}
        flooding = by_key[(108.0, "Flooding")]
        oxygen = by_key[(270.0, "Oxygen starvation")]

        assert flooding.idx_v_alarm is not None
        assert flooding.report is not None
        assert 0 < flooding.n_rows <= 16
        # dynamic threshold = V(0) − 0.1 (04:389)
        assert flooding.v_threshold == pytest.approx(4.0 - 0.1)
        # the batched solve's slice targets THIS condition's threshold
        np.testing.assert_allclose(
            flooding.report.v_target, flooding.v_threshold, atol=1e-6
        )
        # default target mode is gain: the measured voltages ride along
        # and recovery is judged in expected-measured terms
        assert flooding.report.v_meas is not None
        np.testing.assert_allclose(
            flooding.report.v_meas,
            np.clip(flooding.report.v_meas, None, 4.0), atol=1e-6,
        )
        assert flooding.report.v_expected is not None
        np.testing.assert_array_equal(
            flooding.report.recovered,
            flooding.report.v_expected >= flooding.report.v_target,
        )
        # alarmed rows carry a real measured shortfall → the solver moves
        assert np.abs(flooding.report.delta_phys).max() > 0

        assert oxygen.idx_v_alarm is None
        assert oxygen.report is None and oxygen.n_rows == 0

        # absent conditions (405 A etc.) are skipped entirely
        assert all(r.n_rows >= 0 for r in recs)
        assert (405.0, "Flooding") not in by_key

    def test_batched_slices_match_standalone(self, setup):
        """The shared one-dispatch solve must equal solving the condition
        alone — row independence across the concatenated batch."""
        params, x_phys, sx, sy = setup
        arr = _make_artifact(params, sx, sy)
        cfg = CounterfactualConfig(steps=60)
        recs = condition_recovery(
            arr, params, sx, sy, config=cfg, max_rows=8,
        )
        flooding = next(r for r in recs if r.fault_name == "Flooding")
        alone = counterfactual_recovery(
            params, flooding.report.x_phys, flooding.report.v_target,
            sx, sy, config=cfg, v_meas=flooding.report.v_meas,
        )
        np.testing.assert_allclose(
            flooding.report.delta_phys, alone.delta_phys, atol=2e-4
        )

    def test_absolute_target_mode(self, setup):
        """target='absolute' reproduces the model-prediction-clears-the-
        line formulation (no v_meas in the report); bad mode raises."""
        params, x_phys, sx, sy = setup
        arr = _make_artifact(params, sx, sy)
        recs = condition_recovery(
            arr, params, sx, sy,
            config=CounterfactualConfig(steps=30), max_rows=8,
            target="absolute",
        )
        flooding = next(r for r in recs if r.fault_name == "Flooding")
        assert flooding.report.v_meas is None
        assert flooding.report.v_expected is None
        np.testing.assert_array_equal(
            flooding.report.recovered,
            flooding.report.v_after >= flooding.report.v_target,
        )
        with pytest.raises(ValueError, match="target must be"):
            condition_recovery(arr, params, sx, sy, target="bogus")


class TestWhatifCli:
    def test_cli_whatif(self, tmp_path, setup, capsys):
        import scipy.io

        from pinnfc_tpu.cli import main
        from pinnfc_tpu.utils import save_checkpoint

        params, x_phys, sx, sy = setup
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, {"mlp": params}, sx, sy)
        arr = _make_artifact(params, sx, sy)
        mat = str(tmp_path / "F01.mat")
        scipy.io.savemat(mat, {"comprehensive_results": arr})

        figs = str(tmp_path / "figs")
        assert main(["whatif", "--ckpt", ckpt, "--mat", mat,
                     "--steps", "60", "--max-rows", "8",
                     "--plot-dir", figs]) == 0
        out = capsys.readouterr().out
        assert "Flooding" in out and "never alarmed" in out
        assert os.path.exists(os.path.join(figs, "whatif_actuation.png"))

        assert main(["whatif", "--ckpt", ckpt, "--mat", mat,
                     "--steps", "60", "--max-rows", "8", "--json"]) == 0
        payload = json.loads(capsys.readouterr().out)
        assert payload["channels"] == list(INPUT_CHANNELS)
        assert payload["target_mode"] == "gain"
        conds = {(c["current"], c["fault"]): c for c in payload["conditions"]}
        fl = conds[(108.0, "Flooding")]
        assert fl["alarmed"] and fl["n_rows"] > 0
        assert fl["dominant"] is None or fl["dominant"] in INPUT_CHANNELS
        assert len(fl["mean_delta_range"]) == 8
        assert fl["mean_short_v"] > 0  # measured shortfall below the line
        ox = conds[(270.0, "Oxygen starvation")]
        assert not ox["alarmed"] and "dominant" not in ox

        assert main(["whatif", "--ckpt", ckpt, "--mat", mat,
                     "--steps", "30", "--max-rows", "4",
                     "--absolute-target", "--json"]) == 0
        payload = json.loads(capsys.readouterr().out)
        assert payload["target_mode"] == "absolute"
        fl = {(c["current"], c["fault"]): c
              for c in payload["conditions"]}[(108.0, "Flooding")]
        assert "mean_short_v" not in fl

    def test_cli_whatif_data_parallel(self, tmp_path, setup, capsys):
        """--data-parallel shards the solve over the mesh and reproduces
        the single-device table (row independence)."""
        import jax
        import scipy.io

        from pinnfc_tpu.cli import main
        from pinnfc_tpu.utils import save_checkpoint

        if jax.device_count() < 2:
            pytest.skip("needs the multi-device CPU simulation")
        params, x_phys, sx, sy = setup
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, {"mlp": params}, sx, sy)
        arr = _make_artifact(params, sx, sy)
        mat = str(tmp_path / "F01.mat")
        scipy.io.savemat(mat, {"comprehensive_results": arr})

        args = ["whatif", "--ckpt", ckpt, "--mat", mat,
                "--steps", "60", "--max-rows", "8", "--json"]
        assert main(args) == 0
        single = json.loads(capsys.readouterr().out)
        assert main(args + ["--data-parallel"]) == 0
        raw = capsys.readouterr().out
        dp = json.loads(raw[raw.index("{"):])  # skip the mesh banner line
        for a, b in zip(single["conditions"], dp["conditions"]):
            assert a["fault"] == b["fault"] and a["alarmed"] == b["alarmed"]
            if "mean_delta_range" in a:
                np.testing.assert_allclose(
                    b["mean_delta_range"], a["mean_delta_range"], atol=5e-4
                )
