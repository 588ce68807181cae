"""jax.export model artifacts (serving/exported.py + cli export-model).

The reference never persists its model (SURVEY §5; the scripts retrain
from scratch every run) — this surface is beyond-reference deployment
machinery, so the tests anchor against OUR in-process forward, not the
reference.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.pinn import init_pinn
from pinnfc_tpu.serving import build_scorer_fn, export_scorer, load_scorer


# artifacts the tests CALL must carry a lowering for the active backend —
# the suite runs on the CPU sim by default and on the axon TPU under
# PINNFC_TEST_TPU=1, so export both (cross-lowering needs no hardware)
PLATFORMS = ("cpu", "tpu")


@pytest.fixture(scope="module")
def scorer_setup():
    rs = np.random.RandomState(7)
    sx = AffineScaler.fit(rs.randn(200, 8).astype(np.float32))
    sy = AffineScaler.fit(rs.randn(200, 1).astype(np.float32))
    params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
    return params, sx, sy, rs


class TestScorerExport:
    def test_roundtrip_matches_inprocess_any_batch(self, scorer_setup):
        """Serialize → deserialize → call at several batch sizes (ONE
        symbolic-batch artifact, no retrace) matches the in-process scorer
        to fusion-level rounding."""
        params, sx, sy, rs = scorer_setup
        blob = export_scorer(params, sx, sy, platforms=PLATFORMS)
        scorer = load_scorer(blob)
        ref = jax.jit(build_scorer_fn(params, sx, sy))
        for b in (1, 5, 33):
            x = rs.randn(b, 8).astype(np.float32)
            v1, lv1 = scorer(x)
            v2, lv2 = ref(jnp.asarray(x))
            assert v1.shape == (b,) and lv1.shape == (b,)
            np.testing.assert_allclose(
                np.asarray(v1), np.asarray(v2), atol=1e-6, rtol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(lv1), np.asarray(lv2), atol=1e-6, rtol=1e-6
            )

    def test_multi_platform_lowering(self, scorer_setup):
        """One artifact carries BOTH cpu and tpu lowerings (jax.export
        cross-lowers without the hardware present)."""
        from jax import export as jexport

        params, sx, sy, _ = scorer_setup
        blob = export_scorer(params, sx, sy, platforms=("cpu", "tpu"))
        exp = jexport.deserialize(blob)
        assert set(exp.platforms) == {"cpu", "tpu"}

    def test_scaler_baking(self, scorer_setup):
        """The artifact consumes RAW sensor units: feeding it the already
        normalized rows must NOT match — proof the scalers are inside."""
        params, sx, sy, rs = scorer_setup
        scorer = load_scorer(export_scorer(params, sx, sy, platforms=PLATFORMS))
        x_raw = rs.randn(16, 8).astype(np.float32) * 10 + 3
        v_raw, _ = scorer(x_raw)
        v_norm_in, _ = scorer(np.asarray(sx.transform(x_raw)))
        assert not np.allclose(np.asarray(v_raw), np.asarray(v_norm_in))


class TestExportModelCli:
    def test_cli_export_and_load(self, tmp_path, scorer_setup):
        """cli export-model: checkpoint → artifact + provenance sidecar;
        the artifact reloads with only jax and matches the checkpoint's
        forward."""
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.utils import save_checkpoint

        params, sx, sy, rs = scorer_setup
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, sx, sy, meta={"seed": 7})
        out = str(tmp_path / "scorer.shlo")
        assert main(["export-model", "--ckpt", ckpt, "--out", out,
                     "--platforms", "cpu,tpu"]) == 0
        assert os.path.exists(out)

        sidecar = json.load(open(out + ".meta.json"))
        assert sidecar["kind"] == "pinnfc_scorer_stablehlo"
        assert sidecar["platforms"] == ["cpu", "tpu"]
        assert sidecar["checkpoint_meta"]["seed"] == 7

        scorer = load_scorer(open(out, "rb").read())
        x = rs.randn(9, 8).astype(np.float32)
        v, _ = scorer(x)
        ref_v, _ = build_scorer_fn(params, sx, sy)(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref_v), atol=1e-6, rtol=1e-6
        )

    def test_cli_rejects_empty_platforms(self, tmp_path, scorer_setup):
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.utils import save_checkpoint

        params, sx, sy, _ = scorer_setup
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, sx, sy)
        assert main(["export-model", "--ckpt", ckpt,
                     "--out", str(tmp_path / "o"), "--platforms", " ,"]) == 2


class TestMonitorStepExport:
    def test_exported_step_reproduces_observe(self, scorer_setup):
        """Drive the exported monitor step externally (plain-tuple state,
        jax-only) over 3 blocks: every per-sample output and the carried
        state match OnlineMonitor.observe exactly (same traced function)."""
        from jax import export as jexport

        from pinnfc_tpu.serving import OnlineMonitor, export_monitor_step

        params, sx, sy, rs = scorer_setup
        mu = np.zeros(5, np.float32)
        sigma = np.array([0.05, 0.05, 2.0, 0.1, 0.2], np.float32)
        monitor = OnlineMonitor(params, sx, sy, mu, sigma)

        blob = export_monitor_step(monitor, platforms=PLATFORMS)
        exp = jexport.deserialize(blob)

        state = tuple(monitor._fresh_state())
        blocks = [
            (rs.randn(b, 8).astype(np.float32) * 3,
             rs.randn(b).astype(np.float32))
            for b in (7, 16, 5)
        ]
        close = lambda a, b: np.testing.assert_allclose(  # noqa: E731
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )  # symbolic-batch lowering fuses differently: ulp-level only
        for x, v in blocks:
            state, outs = exp.call(state, x, v, mu, sigma)
            state = jax.device_get(state)
            (rf_inst, rf_smooth, r, v_pred, v_alarm, glitch, sensor_alarm,
             (probs, pred), layer_scores, layer_c, oob,
             conformal_p, aci_alpha, aci_anomaly) = jax.device_get(outs)
            ref = monitor.observe(x, v)
            close(rf_inst, ref.rf_inst)
            close(rf_smooth, ref.rf_smooth)
            close(r, ref.residuals)
            close(v_pred, ref.v_pred)
            np.testing.assert_array_equal(v_alarm, ref.v_alarm)
            np.testing.assert_array_equal(glitch, ref.glitch)
            np.testing.assert_array_equal(sensor_alarm, ref.sensor_alarm)
            close(layer_scores, ref.layer_scores)
            close(layer_c, ref.layer_c)
            np.testing.assert_array_equal(oob, ref.oob)
            assert probs is None and pred is None  # no head baked in
            # no calibration vector baked in → the whole conformal tail
            assert conformal_p is None
            assert aci_alpha is None and aci_anomaly is None
        # the carried state round-trips (same tolerance story)
        bank = monitor._streams["default"]
        for got, want in zip(state, tuple(bank)):
            close(got, want)

    def test_exported_step_carries_diagnosis_head(self, scorer_setup):
        """A baked DiagnosisHead ships inside the artifact: fault posterior
        and prediction come back from the external call."""
        from jax import export as jexport

        from pinnfc_tpu.diagnosis.gmm import GMMParams
        from pinnfc_tpu.serving import (
            DiagnosisHead,
            OnlineMonitor,
            export_monitor_step,
        )

        params, sx, sy, rs = scorer_setup
        mu = np.zeros(5, np.float32)
        sigma = np.ones(5, np.float32)
        k, d = 3, 2
        means = rs.randn(k, d).astype(np.float64)
        covs = np.stack([np.eye(d)] * k).astype(np.float64)
        head = DiagnosisHead(
            gmm=GMMParams(
                weights=jnp.full(k, 1.0 / k),
                means=jnp.asarray(means),
                covariances=jnp.asarray(covs),
                converged=jnp.asarray(True),
                n_iter=jnp.asarray(1),
                lower_bound=jnp.asarray(0.0),
            ),
            feature_indices=(1, 2),
            comp_fault_prob=jnp.asarray(
                rs.dirichlet(np.ones(4), size=k).astype(np.float32)
            ),
            class_names=("a", "b", "c", "d"),
        )
        monitor = OnlineMonitor(params, sx, sy, mu, sigma, diagnosis=head)
        exp = jexport.deserialize(
            export_monitor_step(monitor, platforms=PLATFORMS)
        )
        x = rs.randn(6, 8).astype(np.float32)
        v = rs.randn(6).astype(np.float32)
        state, outs = exp.call(tuple(monitor._fresh_state()), x, v, mu, sigma)
        (*_, (probs, pred), _ls, _lc, _oob, _cp, _aa, _an) = jax.device_get(outs)
        ref = monitor.observe(x, v)
        np.testing.assert_allclose(np.asarray(probs), ref.fault_probs,
                                   rtol=1e-5, atol=1e-8)
        np.testing.assert_array_equal(np.asarray(pred), ref.fault_pred)

    def test_cli_monitor_step_export(self, tmp_path, scorer_setup):
        """cli export-model --monitor-step: artifact + sidecar documenting
        the state-tuple field order; drives one block externally."""
        from jax import export as jexport

        from pinnfc_tpu.cli import main
        from pinnfc_tpu.serving import OnlineMonitor
        from pinnfc_tpu.utils import save_checkpoint

        params, sx, sy, rs = scorer_setup
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, sx, sy)
        out = str(tmp_path / "monitor.shlo")
        assert main(["export-model", "--ckpt", ckpt, "--out", out,
                     "--monitor-step", "--platforms", "cpu,tpu"]) == 0
        sidecar = json.load(open(out + ".meta.json"))
        assert sidecar["kind"] == "pinnfc_monitor_step_stablehlo"
        assert "c/rf_smooth/v_first/n_seen/v_first_set/glitch_run/layer_c" \
            in sidecar["signature"]

        exp = jexport.deserialize(open(out, "rb").read())
        mu = np.zeros(5, np.float32)
        sigma = np.ones(5, np.float32)
        monitor = OnlineMonitor(params, sx, sy, mu, sigma)
        x = rs.randn(4, 8).astype(np.float32)
        v = rs.randn(4).astype(np.float32)
        state, outs = exp.call(tuple(monitor._fresh_state()), x, v, mu, sigma)
        ref = monitor.observe(x, v)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(outs[1])), ref.rf_smooth,
            rtol=1e-5, atol=1e-6,
        )

    def test_cli_head_without_monitor_step_errors(self, tmp_path, scorer_setup):
        """--head with the plain scorer would be silently dropped — error."""
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.utils import save_checkpoint

        params, sx, sy, _ = scorer_setup
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, sx, sy)
        assert main(["export-model", "--ckpt", ckpt,
                     "--out", str(tmp_path / "o"),
                     "--head", str(tmp_path / "h.npz")]) == 2

    def test_cli_export_restores_platform_config(self, tmp_path, scorer_setup):
        """cmd_export_model must not leave the process flipped to the CPU
        backend (it pins cpu for the lowering, then restores — the same
        save/restore contract as cmd_inspect)."""
        import jax

        from pinnfc_tpu.cli import main
        from pinnfc_tpu.utils import save_checkpoint

        params, sx, sy, _ = scorer_setup
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, sx, sy)
        before = jax.config.jax_platforms
        assert main(["export-model", "--ckpt", ckpt,
                     "--out", str(tmp_path / "s.shlo"),
                     "--platforms", "cpu"]) == 0
        assert jax.config.jax_platforms == before

    def test_cli_monitor_step_sidecar_records_baked_values(
        self, tmp_path, scorer_setup
    ):
        """--monitor-step --glitch-alarm-n N: the exported artifact bakes N
        in, and the sidecar records it plus the full risk config."""
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.utils import save_checkpoint

        params, sx, sy, _ = scorer_setup
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, sx, sy)
        out = str(tmp_path / "m.shlo")
        assert main(["export-model", "--ckpt", ckpt, "--out", out,
                     "--monitor-step", "--glitch-alarm-n", "10",
                     "--platforms", "cpu"]) == 0
        sidecar = json.load(open(out + ".meta.json"))
        assert sidecar["glitch_alarm_n"] == 10
        assert sidecar["risk_config"]["lambda_decay"] == 0.9971
        assert sidecar["diagnosis_head"] is None


class TestArtifactMonitor:
    """serving.monitor_from_artifact — the full serving shell running on a
    deserialized StableHLO step (no checkpoint, no model code)."""

    def test_parity_with_checkpoint_monitor(self, scorer_setup):
        from pinnfc_tpu.serving import (
            OnlineMonitor,
            export_monitor_step,
            monitor_from_artifact,
        )

        params, sx, sy, rs = scorer_setup
        mu = np.zeros(5, np.float32)
        sigma = np.array([0.05, 0.05, 2.0, 0.1, 0.2], np.float32)
        ref = OnlineMonitor(params, sx, sy, mu, sigma)
        am = monitor_from_artifact(
            export_monitor_step(ref, platforms=PLATFORMS), mu, sigma
        )
        assert am.diagnosis is None
        assert am.layer_names == ref.layer_names
        for b in (7, 16, 5):
            x = rs.randn(b, 8).astype(np.float32)
            v = rs.randn(b).astype(np.float32)
            o1, o2 = am.observe(x, v), ref.observe(x, v)
            np.testing.assert_allclose(o1.rf_smooth, o2.rf_smooth,
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_allclose(o1.layer_c, o2.layer_c,
                                       rtol=1e-5, atol=1e-6)
            np.testing.assert_array_equal(o1.warn, o2.warn)

    def test_observe_many_sequential_fallback(self, scorer_setup):
        """Fleet calls advance each stream exactly like per-stream observe
        (an exported call cannot be vmapped — documented fallback)."""
        from pinnfc_tpu.serving import (
            OnlineMonitor,
            export_monitor_step,
            monitor_from_artifact,
        )

        params, sx, sy, rs = scorer_setup
        mu = np.zeros(5, np.float32)
        sigma = np.ones(5, np.float32)
        blob = export_monitor_step(
            OnlineMonitor(params, sx, sy, mu, sigma), platforms=PLATFORMS
        )
        am = monitor_from_artifact(blob, mu, sigma)
        single = monitor_from_artifact(blob, mu, sigma)
        bank_x = rs.randn(3, 4, 8).astype(np.float32)
        bank_v = rs.randn(3, 4).astype(np.float32)
        outs = am.observe_many(bank_x, bank_v, ["s0", "s1", "s2"])
        for i, s in enumerate(["s0", "s1", "s2"]):
            ref_out = single.observe(bank_x[i], bank_v[i], stream=s)
            np.testing.assert_array_equal(outs[s].rf_smooth,
                                          ref_out.rf_smooth)
        assert am.stream_n_seen("s1") == 4

    def test_config_layer_mismatch_rejected(self, scorer_setup):
        import dataclasses

        from pinnfc_tpu.config import RiskConfig
        from pinnfc_tpu.serving import (
            OnlineMonitor,
            export_monitor_step,
            monitor_from_artifact,
        )

        params, sx, sy, _ = scorer_setup
        mu = np.zeros(5, np.float32)
        sigma = np.ones(5, np.float32)
        blob = export_monitor_step(
            OnlineMonitor(params, sx, sy, mu, sigma), platforms=PLATFORMS
        )
        two_layer = dataclasses.replace(
            RiskConfig(),
            layer_config=(("voltage", ("res", "pV")), ("gas", ("pH", "pO"))),
        )
        with pytest.raises(ValueError, match="risk layers"):
            monitor_from_artifact(blob, mu, sigma, config=two_layer)

    def test_risk_config_dict_roundtrip(self):
        import dataclasses

        from pinnfc_tpu.config import RiskConfig, risk_config_from_dict

        cfg = RiskConfig()
        back = risk_config_from_dict(
            json.loads(json.dumps(dataclasses.asdict(cfg)))
        )
        assert back == cfg

    def test_scorer_blob_rejected_with_clear_error(self, scorer_setup):
        """monitor_from_artifact on a plain scorer artifact (wrong output
        signature) errors loudly, not with an opaque unpacking crash."""
        from pinnfc_tpu.serving import export_scorer, monitor_from_artifact

        params, sx, sy, _ = scorer_setup
        blob = export_scorer(params, sx, sy, platforms=("cpu",))
        with pytest.raises(ValueError, match="monitor-step"):
            monitor_from_artifact(blob, np.zeros(5), np.ones(5))

    def test_fleet_validation_before_state_mutation(self, scorer_setup):
        """A mis-shaped bank or duplicate stream keys must raise BEFORE any
        stream advances (same contract as OnlineMonitor.observe_many)."""
        from pinnfc_tpu.serving import (
            OnlineMonitor,
            export_monitor_step,
            monitor_from_artifact,
        )

        params, sx, sy, rs = scorer_setup
        mu = np.zeros(5, np.float32)
        sigma = np.ones(5, np.float32)
        am = monitor_from_artifact(
            export_monitor_step(
                OnlineMonitor(params, sx, sy, mu, sigma),
                platforms=PLATFORMS,
            ),
            mu, sigma,
        )
        x = rs.randn(2, 4, 8).astype(np.float32)
        v = rs.randn(2, 4).astype(np.float32)
        with pytest.raises(ValueError, match="x_bank"):
            am.observe_many(x, v, ["a", "b", "c"])  # 3 keys, 2 bank rows
        with pytest.raises(ValueError, match="unique"):
            am.observe_many(x, v, ["a", "a"])
        assert am.stream_n_seen("a") == 0  # nothing advanced


class TestFleetStepExport:
    """export_monitor_fleet_step — observe_many's vmapped program baked
    into one StableHLO blob, symbolic on BOTH the stream axis and the
    block size, so artifact deployments keep the one-dispatch fleet."""

    def _mon(self, scorer_setup, **kw):
        from pinnfc_tpu.serving import OnlineMonitor

        params, sx, sy, _ = scorer_setup
        mu = np.zeros(5, np.float32)
        sigma = np.array([0.05, 0.05, 2.0, 0.1, 0.2], np.float32)
        return OnlineMonitor(params, sx, sy, mu, sigma, **kw), mu, sigma

    def test_observe_many_parity_one_dispatch(self, scorer_setup):
        """The fleet artifact's observe_many equals the checkpoint
        monitor's, across rounds (carried bank) and at a DIFFERENT fleet
        size on the same blob (symbolic s)."""
        from pinnfc_tpu.serving import (
            export_monitor_fleet_step,
            monitor_from_artifact,
        )

        _, _, _, rs = scorer_setup
        ref, mu, sigma = self._mon(scorer_setup)
        src, _, _ = self._mon(scorer_setup)
        am = monitor_from_artifact(
            export_monitor_fleet_step(src, platforms=PLATFORMS), mu, sigma
        )
        assert am.fleet_baked and am._vstep is not None
        for s_count in (3, 5):  # same blob, two fleet sizes
            keys = [f"s{i}" for i in range(s_count)]
            xb = (rs.randn(s_count, 6, 8) * 2).astype(np.float32)
            vb = rs.randn(s_count, 6).astype(np.float32)
            outs = am.observe_many(xb, vb, keys)
            refs = ref.observe_many(xb, vb, keys)
            for k in keys:
                np.testing.assert_allclose(
                    outs[k].rf_smooth, refs[k].rf_smooth,
                    rtol=1e-5, atol=1e-6,
                )
                np.testing.assert_allclose(
                    outs[k].layer_c, refs[k].layer_c, rtol=1e-5, atol=1e-6
                )
                np.testing.assert_array_equal(outs[k].warn, refs[k].warn)
                np.testing.assert_array_equal(outs[k].oob, refs[k].oob)
        assert am.stream_n_seen("s0") == 12 and am.stream_n_seen("s4") == 6

    def test_single_observe_rides_s1(self, scorer_setup):
        """A fleet artifact serves single-stream observe through the same
        program at s=1 — parity with a plain monitor-step artifact."""
        from pinnfc_tpu.serving import (
            export_monitor_fleet_step,
            export_monitor_step,
            monitor_from_artifact,
        )

        _, _, _, rs = scorer_setup
        src, mu, sigma = self._mon(scorer_setup)
        fleet_am = monitor_from_artifact(
            export_monitor_fleet_step(src, platforms=PLATFORMS), mu, sigma
        )
        plain_am = monitor_from_artifact(
            export_monitor_step(src, platforms=PLATFORMS), mu, sigma
        )
        assert not plain_am.fleet_baked
        for b in (4, 9):
            x = rs.randn(b, 8).astype(np.float32)
            v = rs.randn(b).astype(np.float32)
            o1 = fleet_am.observe(x, v)
            o2 = plain_am.observe(x, v)
            np.testing.assert_allclose(
                o1.rf_smooth, o2.rf_smooth, rtol=1e-5, atol=1e-6
            )
            np.testing.assert_array_equal(o1.glitch, o2.glitch)

    def test_fleet_artifact_with_conformal_gamma_and_head(self, scorer_setup):
        """The full tail rides the vmap: baked head posterior, conformal
        p-values, and the per-stream ACI level all round-trip."""
        from pinnfc_tpu.diagnosis.gmm import GMMParams
        from pinnfc_tpu.serving import (
            DiagnosisHead,
            export_monitor_fleet_step,
            monitor_from_artifact,
        )

        _, _, _, rs = scorer_setup
        k, d = 3, 2
        head = DiagnosisHead(
            gmm=GMMParams(
                weights=jnp.full(k, 1.0 / k),
                means=jnp.asarray(rs.randn(k, d)),
                covariances=jnp.asarray(np.stack([np.eye(d)] * k)),
                converged=jnp.asarray(True),
                n_iter=jnp.asarray(1),
                lower_bound=jnp.asarray(0.0),
            ),
            feature_indices=(1, 2),
            comp_fault_prob=jnp.asarray(
                rs.dirichlet(np.ones(4), size=k).astype(np.float32)
            ),
            class_names=("a", "b", "c", "d"),
        )
        calib = np.abs(rs.randn(99)).astype(np.float32)
        kw = dict(diagnosis=head, conformal_calib=calib,
                  conformal_alpha=0.2, conformal_gamma=0.05)
        ref, mu, sigma = self._mon(scorer_setup, **kw)
        src, _, _ = self._mon(scorer_setup, **kw)
        am = monitor_from_artifact(
            export_monitor_fleet_step(src, platforms=PLATFORMS),
            mu, sigma, class_names=head.class_names, conformal_alpha=0.2,
        )
        assert am.conformal_baked
        keys = ["a", "b"]
        xb = (rs.randn(2, 20, 8) * 3).astype(np.float32)
        vb = (rs.randn(2, 20) + 8.0).astype(np.float32)
        for _ in range(2):  # carried α_t crosses the boundary per stream
            outs = am.observe_many(xb, vb, keys)
            refs = ref.observe_many(xb, vb, keys)
            for k_ in keys:
                np.testing.assert_array_equal(
                    outs[k_].conformal_p, refs[k_].conformal_p
                )
                np.testing.assert_array_equal(
                    outs[k_].aci_alpha, refs[k_].aci_alpha
                )
                np.testing.assert_array_equal(
                    outs[k_].fault_pred, refs[k_].fault_pred
                )
                assert am.stream_low_p(k_) == ref.stream_low_p(k_)
        assert am.stream_aci_alpha("a") == ref.stream_aci_alpha("a")

    def test_cli_fleet_step_export_and_sidecar(self, tmp_path, scorer_setup):
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.serving import monitor_from_artifact
        from pinnfc_tpu.utils import save_checkpoint

        params, sx, sy, rs = scorer_setup
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, sx, sy)
        out = str(tmp_path / "fleet.shlo")
        assert main(["export-model", "--ckpt", ckpt, "--out", out,
                     "--monitor-step", "--fleet-step",
                     "--platforms", "cpu,tpu"]) == 0
        sidecar = json.load(open(out + ".meta.json"))
        assert sidecar["fleet_step"] is True
        assert "f32[s,b,8]" in sidecar["signature"]
        am = monitor_from_artifact(
            open(out, "rb").read(), np.zeros(5, np.float32),
            np.ones(5, np.float32),
        )
        assert am.fleet_baked
        outs = am.observe_many(
            rs.randn(2, 3, 8).astype(np.float32),
            rs.randn(2, 3).astype(np.float32), ["x", "y"],
        )
        assert set(outs) == {"x", "y"}

    def test_cli_fleet_step_requires_monitor_step(self, capsys):
        from pinnfc_tpu.cli import main

        rc = main(["export-model", "--ckpt", "ck", "--out", "o.shlo",
                   "--fleet-step"])
        assert rc == 2
        assert "--monitor-step" in capsys.readouterr().err

    def test_fleet_validation_still_guards(self, scorer_setup):
        """check_fleet_bank runs before the one-dispatch call too."""
        from pinnfc_tpu.serving import (
            export_monitor_fleet_step,
            monitor_from_artifact,
        )

        _, _, _, rs = scorer_setup
        src, mu, sigma = self._mon(scorer_setup)
        am = monitor_from_artifact(
            export_monitor_fleet_step(src, platforms=PLATFORMS), mu, sigma
        )
        x = rs.randn(2, 4, 8).astype(np.float32)
        v = rs.randn(2, 4).astype(np.float32)
        with pytest.raises(ValueError, match="unique"):
            am.observe_many(x, v, ["a", "a"])
        assert am.stream_n_seen("a") == 0


class TestArtifactSchemaTolerance:
    """Append-only schema: a monitor-step artifact exported by an OLDER
    framework (7 state fields / 10 outputs — before the input-drift
    surface) must keep loading and serving; its missing fields pack as
    None and carry through frozen (serving/exported.py)."""

    @staticmethod
    def _v1_blob(monitor):
        """Build a pre-drift artifact: today's step with the state tuple
        and output tuple sliced to the v1 schema, exported exactly like
        export_monitor_step (symbolic batch dim, same platforms)."""
        from jax import export as jexport

        step_fn = monitor._step_fn
        state_cls = type(monitor._fresh_state())
        fresh = tuple(monitor._fresh_state())
        params = monitor.params

        def v1_fn(state_tuple, x_raw, v_meas, mu_, sigma_):
            full = state_cls(*state_tuple, *fresh[7:])
            new_state, outs = step_fn(
                params, full, x_raw, v_meas, mu_, sigma_
            )
            return tuple(new_state)[:7], outs[:10]

        state_spec = tuple(
            jax.ShapeDtypeStruct(jnp.shape(a), jnp.asarray(a).dtype)
            for a in fresh[:7]
        )
        x_shape = jexport.symbolic_shape("b, 8")
        exp = jexport.export(jax.jit(v1_fn), platforms=list(PLATFORMS))(
            state_spec,
            jax.ShapeDtypeStruct(x_shape, jnp.float32),
            jax.ShapeDtypeStruct((x_shape[0],), jnp.float32),
            jax.ShapeDtypeStruct((5,), jnp.float32),
            jax.ShapeDtypeStruct((5,), jnp.float32),
        )
        return exp.serialize()

    def test_pre_drift_artifact_loads_and_serves(self, scorer_setup):
        from pinnfc_tpu.serving import OnlineMonitor
        from pinnfc_tpu.serving.exported import monitor_from_artifact

        params, sx, sy, rs = scorer_setup
        mu = np.zeros(5, np.float32)
        sigma = np.ones(5, np.float32)
        ref = OnlineMonitor(params, sx, sy, mu, sigma)
        am = monitor_from_artifact(self._v1_blob(ref), mu, sigma)

        x = rs.randn(12, 8).astype(np.float32)
        v = rs.randn(12).astype(np.float32)
        got = am.observe(x, v)
        want = ref.observe(x, v)
        np.testing.assert_allclose(got.rf_smooth, want.rf_smooth,
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got.layer_c, want.layer_c,
                                   rtol=1e-5, atol=1e-6)
        # the v1 artifact has no drift surface: outputs pack as None, the
        # counter stays frozen at zero, and the RF state still advances
        assert got.oob is None and want.oob is not None
        assert am.stream_oob_counts().sum() == 0
        assert am.stream_n_seen() == 12
        # the carried prefix state matches the full monitor's
        np.testing.assert_allclose(
            float(am.state.c), float(ref.state.c), rtol=1e-5, atol=1e-6
        )
