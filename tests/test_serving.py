"""Online streaming monitor: parity with the offline RF pipeline, block-size
invariance, reset, checkpoint restore."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnfc_tpu.config import RiskConfig
from pinnfc_tpu.models.mlp import mlp_forward
from pinnfc_tpu.models.pinn import init_pinn
from pinnfc_tpu.physics.residuals import all_residuals
from pinnfc_tpu.risk import compute_rf_time_series
from pinnfc_tpu.serving import OnlineMonitor


@pytest.fixture(scope="module")
def setup(tiny_dataset):
    d = tiny_dataset
    params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
    mu = np.zeros(5)
    sigma = np.array([0.05, 0.05, 2.0, 0.1, 0.2])
    x_raw = np.asarray(d.scaler_x.inverse(d.x_test))[:400].astype(np.float32)
    v_meas = np.asarray(d.scaler_y.inverse(d.y_test))[:400, 0].astype(np.float32)
    return params, d, mu, sigma, x_raw, v_meas


def _offline_rf(params, d, mu, sigma, x_raw, v_meas, cfg):
    """Offline reference: full-sequence residuals + compute_rf_time_series."""
    import jax.numpy as jnp

    x_norm = d.scaler_x.transform(x_raw)
    u_norm, _ = mlp_forward(params["mlp"], x_norm, train=False)
    v_pred = np.asarray(d.scaler_y.inverse(u_norm))[:, 0]
    bundle = all_residuals(params, x_norm, u_norm, d.scaler_x, d.scaler_y)
    r = np.stack(
        [v_meas - v_pred, np.asarray(bundle.f_v)[:, 0],
         np.asarray(bundle.f_t)[:, 0], np.asarray(bundle.f_h)[:, 0],
         np.asarray(bundle.f_o)[:, 0]], axis=1,
    )
    return compute_rf_time_series(r, mu, sigma, cfg)


class TestMonitorCli:
    def test_cli_monitor_replays_artifact(self, setup, tmp_path, capsys):
        """`cli monitor` streams a comprehensive_results artifact through the
        OnlineMonitor from a checkpoint (the serving product surface)."""
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.data.contract import INDEX, save_comprehensive_results
        from pinnfc_tpu.utils import save_checkpoint

        params, d, mu, sigma, x_raw, v_meas = setup
        ckpt = str(tmp_path / "ckpt")
        save_checkpoint(ckpt, params, d.scaler_x, d.scaler_y)

        n = len(x_raw)
        arr = np.zeros((n, 22))
        arr[:, 0:8] = x_raw
        arr[:, INDEX["y_true"]] = v_meas
        arr[n // 2 :, INDEX["label"]] = 1  # second half 'fault'
        # induce a voltage collapse so alarms actually fire
        arr[n // 2 :, INDEX["y_true"]] -= np.linspace(0, 1.0, n - n // 2)
        mat = str(tmp_path / "F01.mat")
        save_comprehensive_results(arr, mat)

        rc = main(["monitor", "--mat", mat, "--ckpt", ckpt, "--block", "37"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "streamed" in out and f"{n} samples" in out
        # the induced voltage collapse must warn, and the risk level at the
        # first warn is attributed to physics layers (explainability
        # surface, exact λ-decay semantics — same as cli risk's driver)
        assert "risk attribution at first warn:" in out
        assert "voltage" in out and "gas" in out and "temp" in out

        rc = main([
            "monitor", "--mat", mat, "--ckpt", ckpt,
            "--fault-label", "1", "--lead", "50",
        ])
        assert rc == 0
        assert "voltage alarm=" in capsys.readouterr().out

        # an explicitly invalid --glitch-alarm-n must reach the monitor's
        # validation and error loudly, not silently fall back to the default
        with pytest.raises(ValueError, match="glitch_alarm_n"):
            main(["monitor", "--mat", mat, "--ckpt", ckpt,
                  "--glitch-alarm-n", "0"])

    def test_cli_monitor_whatif(self, setup, tmp_path, capsys):
        """--whatif: after a replay that raised the voltage alarm, the
        gain-mode counterfactual over the alarmed tail prints a suggested
        actuation (or an explicit 'none')."""
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.data.contract import INDEX, save_comprehensive_results
        from pinnfc_tpu.utils import save_checkpoint

        params, d, mu, sigma, x_raw, v_meas = setup
        ckpt = str(tmp_path / "ckpt")
        save_checkpoint(ckpt, params, d.scaler_x, d.scaler_y)
        n = len(x_raw)
        arr = np.zeros((n, 22))
        arr[:, 0:8] = x_raw
        arr[:, INDEX["y_true"]] = v_meas
        arr[n // 2 :, INDEX["y_true"]] -= np.linspace(0, 1.0, n - n // 2)
        mat = str(tmp_path / "F01.mat")
        save_comprehensive_results(arr, mat)

        rc = main(["monitor", "--mat", mat, "--ckpt", ckpt, "--whatif"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "suggested actuation" in out

        # without an alarm the flag stays silent
        arr2 = arr.copy()
        arr2[:, INDEX["y_true"]] = 3.9  # constant voltage: no alarm ever
        mat2 = str(tmp_path / "F01_flat.mat")
        save_comprehensive_results(arr2, mat2)
        rc = main(["monitor", "--mat", mat2, "--ckpt", ckpt, "--whatif"])
        assert rc == 0
        assert "suggested actuation" not in capsys.readouterr().out

        # --whatif is a single-stream analysis: combined with --fleet it
        # must be rejected loudly, not silently ignored
        assert main(["monitor", "--mat", mat, "--ckpt", ckpt,
                     "--fleet", "--whatif"]) == 2


class TestOnlineMonitor:
    def test_matches_offline_pipeline(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup
        cfg = RiskConfig()
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma, cfg)
        out = mon.observe(x_raw, v_meas)
        want = _offline_rf(params, d, mu, sigma, x_raw, v_meas, cfg)
        np.testing.assert_allclose(
            out.rf_smooth, np.asarray(want["rf_smooth"]), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            out.rf_inst, np.asarray(want["rf_inst"]), rtol=1e-4, atol=1e-5
        )

    def test_block_size_invariance(self, setup):
        """Streaming 1-by-50 must equal one 400-row block exactly (the carry
        continues the recurrences)."""
        params, d, mu, sigma, x_raw, v_meas = setup
        cfg = RiskConfig()
        mon_a = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma, cfg)
        full = mon_a.observe(x_raw, v_meas)

        mon_b = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma, cfg)
        chunks = []
        for s in range(0, 400, 50):
            chunks.append(mon_b.observe(x_raw[s : s + 50], v_meas[s : s + 50]))
        stream = np.concatenate([c.rf_smooth for c in chunks])
        np.testing.assert_allclose(stream, full.rf_smooth, rtol=1e-5, atol=1e-7)
        # the per-layer risk integral carries across blocks too
        stream_lc = np.concatenate([c.layer_c for c in chunks])
        np.testing.assert_allclose(stream_lc, full.layer_c, rtol=1e-5, atol=1e-6)

    def test_alarm_flags(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup
        cfg = RiskConfig()
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma, cfg)
        out = mon.observe(x_raw, v_meas)
        # dynamic threshold anchored on the first sample
        want_v_alarm = v_meas <= (v_meas[0] - cfg.voltage_drop)
        np.testing.assert_array_equal(out.v_alarm, want_v_alarm)
        assert out.warn.dtype == bool and out.danger.dtype == bool
        # danger implies warn
        assert (~out.danger | out.warn).all()

    def test_reset(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        a = mon.observe(x_raw[:100], v_meas[:100])
        mon.reset()
        b = mon.observe(x_raw[:100], v_meas[:100])
        np.testing.assert_array_equal(a.rf_smooth, b.rf_smooth)

    def test_layer_scores_attribute_s_tot(self, setup):
        """Per-layer risk attribution: layer_scores columns are the
        layer-weighted p-norm terms of the RF aggregation (04:244-259) —
        they match the offline pipeline's s_layers and row-sum to the raw
        S_tot that drives the integral."""
        params, d, mu, sigma, x_raw, v_meas = setup
        cfg = RiskConfig()
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma, cfg)
        out = mon.observe(x_raw, v_meas)
        want = _offline_rf(params, d, mu, sigma, x_raw, v_meas, cfg)

        assert mon.layer_names == ("voltage", "gas", "temp")
        assert out.layer_scores.shape == (len(x_raw), 3)
        assert (out.layer_scores >= 0).all()
        layer_w = dict(cfg.layer_weights)
        for j, name in enumerate(mon.layer_names):
            np.testing.assert_allclose(
                out.layer_scores[:, j],
                layer_w.get(name, 1.0) * np.asarray(want["s_layers"][name]),
                rtol=1e-5, atol=1e-6,
            )
        np.testing.assert_allclose(
            out.layer_scores.sum(axis=1), np.asarray(want["s_tot"]),
            rtol=1e-5, atol=1e-6,
        )
        # the carried per-layer integral decomposes C exactly: row sums of
        # the streamed layer_c reconstruct the offline unclipped C series
        np.testing.assert_allclose(
            out.layer_c.sum(axis=1), np.asarray(want["c"]),
            rtol=1e-4, atol=1e-4,
        )
        assert (out.layer_c >= 0).all()

    def test_from_checkpoint(self, setup, tmp_path):
        params, d, mu, sigma, x_raw, v_meas = setup
        from pinnfc_tpu.utils import save_checkpoint

        path = str(tmp_path / "mon_ckpt")
        save_checkpoint(path, params, d.scaler_x, d.scaler_y)
        mon = OnlineMonitor.from_checkpoint(path, mu, sigma)
        direct = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        a = mon.observe(x_raw[:50], v_meas[:50])
        b = direct.observe(x_raw[:50], v_meas[:50])
        np.testing.assert_allclose(a.rf_smooth, b.rf_smooth, rtol=1e-6)


class TestStreamingDiagnosis:
    """DiagnosisHead: script 03's calibrated-GMM posterior applied online."""

    @pytest.fixture(scope="class")
    def head_and_feats(self, setup):
        import jax.numpy as jnp

        from pinnfc_tpu.diagnosis import calibrate_components, gmm_fit
        from pinnfc_tpu.serving import DiagnosisHead

        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        feats = mon.observe(x_raw, v_meas).residuals[:, 1:5]  # pV,pT,pH,pO
        y = (np.arange(len(feats)) >= len(feats) // 2).astype(int)
        model = gmm_fit(jnp.asarray(feats), jax.random.key(3), n_components=4)
        from pinnfc_tpu.diagnosis import gmm_predict_proba

        comp = calibrate_components(
            np.asarray(gmm_predict_proba(model, jnp.asarray(feats))), y, 2
        )
        head = DiagnosisHead(
            gmm=model,
            comp_fault_prob=np.asarray(comp, np.float32),
            class_names=("normalish", "faultish"),
            feature_indices=(1, 2, 3, 4),
        )
        return head, feats

    def test_matches_batch_posterior(self, setup, head_and_feats):
        """Streaming probabilities == the batch script-03 posterior mapping
        on the same residual rows."""
        import jax.numpy as jnp

        from pinnfc_tpu.diagnosis import gmm_predict_proba, posterior_probabilities

        params, d, mu, sigma, x_raw, v_meas = setup
        head, feats = head_and_feats
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                            diagnosis=head)
        out = mon.observe(x_raw, v_meas)
        assert out.fault_probs.shape == (len(x_raw), 2)
        resp = np.asarray(gmm_predict_proba(head.gmm, jnp.asarray(feats)))
        want_prob, want_pred = posterior_probabilities(
            resp, np.asarray(head.comp_fault_prob)
        )
        # the in-step fused evaluation and the standalone call fuse/round
        # differently on the TPU math unit (measured max |Δ| ≈ 7e-4 there)
        on_tpu = jax.default_backend() == "tpu"
        atol = 2e-3 if on_tpu else 1e-6
        np.testing.assert_allclose(out.fault_probs, want_prob, rtol=1e-2 if on_tpu else 2e-4, atol=atol)
        # argmax must agree wherever the posterior is decisive
        decisive = np.abs(want_prob[:, 0] - want_prob[:, 1]) > 10 * atol
        np.testing.assert_array_equal(out.fault_pred[decisive], want_pred[decisive])
        # probabilities are normalized
        np.testing.assert_allclose(out.fault_probs.sum(axis=1), 1.0, rtol=1e-5)

    def test_block_size_invariance(self, setup, head_and_feats):
        """The head is stateless per sample: 1×400 == 8×50 exactly."""
        params, d, mu, sigma, x_raw, v_meas = setup
        head, _ = head_and_feats
        mon_a = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                              diagnosis=head)
        full = mon_a.observe(x_raw, v_meas)
        mon_b = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                              diagnosis=head)
        stream = np.concatenate([
            mon_b.observe(x_raw[s : s + 50], v_meas[s : s + 50]).fault_probs
            for s in range(0, 400, 50)
        ])
        np.testing.assert_array_equal(stream, full.fault_probs)

    def test_without_head_fields_are_none(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        out = mon.observe(x_raw[:10], v_meas[:10])
        assert out.fault_probs is None and out.fault_pred is None

    def test_from_gmm_result_and_feature_validation(self, setup):
        """Build the head from a real run_gmm_pipeline result (the product
        path used by `cli monitor --diagnose`)."""
        from pinnfc_tpu.data.contract import INDEX
        from pinnfc_tpu.diagnosis import run_gmm_pipeline
        from pinnfc_tpu.serving import DiagnosisHead

        params, d, mu, sigma, x_raw, v_meas = setup
        rng = np.random.RandomState(0)
        n = 400
        arr = np.zeros((n, 22))
        for i, k in enumerate(("pV", "pT", "pH", "pO")):
            arr[:, INDEX[k]] = 0.1 * rng.randn(n)
        arr[n // 2 :, INDEX["label"]] = rng.choice([1, 4], n // 2)
        arr[: n // 2, INDEX["label"]] = rng.choice([2, 5], n // 2)
        arr[n // 2 :, INDEX["pV"]] += 3.0  # separate the classes
        res = run_gmm_pipeline(arr)
        head = DiagnosisHead.from_gmm_result(res)
        assert head.feature_indices == (1, 2, 3, 4)
        assert head.class_names == tuple(res.class_names)

        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                            diagnosis=head)
        out = mon.observe(x_raw[:20], v_meas[:20])
        assert out.fault_probs.shape == (20, len(res.class_names))

        # overriding with a spec different from the fitted one is an error
        with pytest.raises(ValueError, match="do not match the spec"):
            DiagnosisHead.from_gmm_result(res, features="epi,res")
        # a mixture fitted on non-streamable channels cannot go online
        from pinnfc_tpu.config import GmmConfig

        arr2 = arr.copy()
        arr2[:, INDEX["epi"]] = 0.01 + 0.01 * rng.rand(n)
        res2 = run_gmm_pipeline(arr2, GmmConfig(features="epi,res"))
        with pytest.raises(ValueError, match="not streamable"):
            DiagnosisHead.from_gmm_result(res2)

    def test_cli_monitor_diagnose(self, setup, tmp_path, capsys):
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.data.contract import INDEX, save_comprehensive_results
        from pinnfc_tpu.utils import save_checkpoint

        params, d, mu, sigma, x_raw, v_meas = setup
        ckpt = str(tmp_path / "ckpt_diag")
        save_checkpoint(ckpt, params, d.scaler_x, d.scaler_y)
        n = len(x_raw)
        arr = np.zeros((n, 22))
        arr[:, 0:8] = x_raw
        arr[:, INDEX["y_true"]] = v_meas
        rng = np.random.RandomState(1)
        for k in ("pV", "pT", "pH", "pO"):
            arr[:, INDEX[k]] = 0.1 * rng.randn(n)
        arr[n // 2 :, INDEX["label"]] = 1
        arr[n // 2 :, INDEX["y_true"]] -= np.linspace(0, 1.0, n - n // 2)
        mat = str(tmp_path / "F01_diag.mat")
        save_comprehensive_results(arr, mat)

        rc = main(["monitor", "--mat", mat, "--ckpt", ckpt, "--block", "64",
                   "--diagnose"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "streamed" in out
        assert "online diagnosis while warned:" in out

    def test_head_save_load_roundtrip(self, setup, head_and_feats, tmp_path):
        """A restarted scorer with a loaded head produces identical output."""
        from pinnfc_tpu.serving import DiagnosisHead

        params, d, mu, sigma, x_raw, v_meas = setup
        head, _ = head_and_feats
        path = str(tmp_path / "head.npz")
        head.save(path)
        head2 = DiagnosisHead.load(path)
        assert head2.class_names == head.class_names
        assert head2.feature_indices == head.feature_indices

        a = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                          diagnosis=head).observe(x_raw[:80], v_meas[:80])
        b = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                          diagnosis=head2).observe(x_raw[:80], v_meas[:80])
        np.testing.assert_array_equal(a.fault_probs, b.fault_probs)

    def test_cli_head_save_and_load(self, setup, tmp_path, capsys):
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.data.contract import INDEX, save_comprehensive_results
        from pinnfc_tpu.utils import save_checkpoint

        params, d, mu, sigma, x_raw, v_meas = setup
        ckpt = str(tmp_path / "ckpt_h")
        save_checkpoint(ckpt, params, d.scaler_x, d.scaler_y)
        n = len(x_raw)
        arr = np.zeros((n, 22))
        arr[:, 0:8] = x_raw
        arr[:, INDEX["y_true"]] = v_meas
        rng = np.random.RandomState(3)
        for k in ("pV", "pT", "pH", "pO"):
            arr[:, INDEX[k]] = 0.1 * rng.randn(n)
        arr[n // 2 :, INDEX["label"]] = 4
        mat = str(tmp_path / "F01_h.mat")
        save_comprehensive_results(arr, mat)
        head_path = str(tmp_path / "head_cli.npz")

        rc = main(["monitor", "--mat", mat, "--ckpt", ckpt, "--diagnose",
                   "--save-head", head_path])
        assert rc == 0 and "diagnosis head" in capsys.readouterr().out
        rc = main(["monitor", "--mat", mat, "--ckpt", ckpt, "--diagnose",
                   "--head", head_path])
        assert rc == 0


class TestHttpServer:
    """HTTP scoring endpoint (serving/server.py): request/response contract,
    state carry across requests, reset, validation."""

    @pytest.fixture()
    def client(self, setup, head_and_feats):
        import threading
        from pinnfc_tpu.serving import make_server

        params, d, mu, sigma, x_raw, v_meas = setup
        head, _ = head_and_feats
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                            diagnosis=head)
        server = make_server(mon, port=0)  # auto-assign port
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        yield port, mon
        server.shutdown()
        server.server_close()

    # reuse the class-scoped head fixture from TestStreamingDiagnosis
    head_and_feats = TestStreamingDiagnosis.head_and_feats

    @staticmethod
    def _post(port, path, obj):
        import json as j
        import urllib.request

        req = urllib.request.Request(
            f"http://127.0.0.1:{port}{path}",
            data=j.dumps(obj).encode(), method="POST",
            headers={"Content-Type": "application/json"},
        )
        try:
            with urllib.request.urlopen(req) as r:
                return r.status, j.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, j.loads(e.read())

    def test_health_carries_provenance_when_given(self, setup):
        """make_server(provenance=...) surfaces the checkpoint summary on
        GET /health (and /health omits the key without one — the bare
        `client` fixture path below)."""
        import json as j
        import threading
        import urllib.request

        from pinnfc_tpu.serving import make_server

        params, d, mu, sigma, _x, _v = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        prov = {"created": "2026-01-01T00:00:00+00:00", "seed": 7}
        server = make_server(mon, port=0, provenance=prov)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health"
            ) as r:
                out = j.loads(r.read())
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics"
            ) as r:
                metrics = r.read().decode()
        finally:
            server.shutdown()
            server.server_close()
        assert out["provenance"] == prov
        # Prometheus info-metric pattern: identity as labels, value 1
        assert ('pinnfc_model_info{created="2026-01-01T00:00:00+00:00",'
                'seed="7"} 1') in metrics

    def test_observe_matches_direct_monitor(self, setup, head_and_feats, client):
        import json as j
        import urllib.request

        params, d, mu, sigma, x_raw, v_meas = setup
        head, _ = head_and_feats
        port, _mon = client

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health") as r:
            health = j.loads(r.read())
            assert health["ok"] is True
            assert "provenance" not in health  # none passed → key absent

        # two requests must continue the recurrence exactly like one direct
        # observe over the concatenation
        s1, out1 = self._post(port, "/observe",
                              {"x": x_raw[:60].tolist(), "v": v_meas[:60].tolist()})
        s2, out2 = self._post(port, "/observe",
                              {"x": x_raw[60:120].tolist(), "v": v_meas[60:120].tolist()})
        assert s1 == s2 == 200
        ref = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                            diagnosis=head).observe(x_raw[:120], v_meas[:120])
        got = np.asarray(out1["rf_smooth"] + out2["rf_smooth"])
        np.testing.assert_allclose(got, ref.rf_smooth, rtol=1e-5, atol=1e-7)
        assert out2["n_seen"] == 120
        assert len(out1["fault_probs"]) == 60
        assert out1["fault_names"][0] in ("normalish", "faultish")
        # per-layer risk attribution rides along in the payload
        assert out1["layer_names"] == ["voltage", "gas", "temp"]
        np.testing.assert_allclose(
            np.asarray(out1["layer_scores"], np.float64),
            np.asarray(ref.layer_scores[:60], np.float64),
            rtol=1e-4, atol=1e-6,
        )

        # reset restarts the series
        assert self._post(port, "/reset", {})[0] == 200
        _, out3 = self._post(port, "/observe",
                             {"x": x_raw[:60].tolist(), "v": v_meas[:60].tolist()})
        np.testing.assert_allclose(out3["rf_smooth"], out1["rf_smooth"],
                                   rtol=1e-6)

    def test_validation_errors(self, client):
        port, _ = client
        code, body = self._post(port, "/observe", {"x": [[1.0, 2.0]], "v": [3.0]})
        assert code == 400 and "x must be (B, 8)" in body["error"]
        code, body = self._post(port, "/observe",
                                {"x": [[0.0] * 8], "v": [1.0, 2.0]})
        assert code == 400 and "v must be" in body["error"]
        code, body = self._post(port, "/nope", {})
        assert code == 404
        # non-dict JSON bodies must 400 on every route, not drop the
        # connection (req.get on a str would AttributeError)
        for path in ("/observe", "/observe_many", "/reset"):
            code, body = self._post(port, path, "hello")
            assert code == 400 and "JSON object" in body["error"], path


class TestGracefulShutdown:
    def test_sigterm_drains_and_exits_zero(self, setup, tmp_path):
        """`cli serve` under SIGTERM (the orchestrator's stop signal) must
        drain gracefully: exit 0, close the listener, and leave the state
        bank snapshot behind — the default signal action would kill the
        process mid-request with no cleanup."""
        import os
        import signal
        import subprocess
        import sys
        import time

        from pinnfc_tpu.data.contract import INDEX, save_comprehensive_results
        from pinnfc_tpu.utils import save_checkpoint

        params, d, mu, sigma, x_raw, v_meas = setup
        ckpt = str(tmp_path / "ckpt")
        save_checkpoint(ckpt, params, d.scaler_x, d.scaler_y)
        arr = np.zeros((100, 22))
        arr[:, 0:8] = x_raw[:100]
        arr[:, INDEX["y_true"]] = v_meas[:100]
        mat = str(tmp_path / "F01.mat")
        save_comprehensive_results(arr, mat)
        bank = str(tmp_path / "bank.npz")

        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
        proc = subprocess.Popen(
            [sys.executable, "-m", "pinnfc_tpu.cli", "serve",
             "--mat", mat, "--ckpt", ckpt, "--port", "0",
             "--state-path", bank],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        try:
            deadline = time.time() + 120
            lines = []
            while time.time() < deadline:
                line = proc.stdout.readline()
                lines.append(line)
                if "serving OnlineMonitor" in line:
                    break
            else:
                raise AssertionError(f"server never came up: {lines}")
            proc.send_signal(signal.SIGTERM)
            out, _ = proc.communicate(timeout=60)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert proc.returncode == 0, out
        assert "draining" in out and "server closed" in out
        assert os.path.exists(bank)  # startup writability probe snapshot


class TestMultiStream:
    """Multi-stream state bank (VERDICT r3 #8): one monitor watches several
    operating conditions concurrently (04:145-161); per-stream RF(t) state,
    same compiled step; the vmapped ``observe_many`` advances all streams
    in one device program."""

    def test_streams_equal_independent_monitors(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup

        def fresh():
            return OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)

        mon = fresh()
        ref_a, ref_b = fresh(), fresh()
        xa, va = x_raw[:150], v_meas[:150]
        xb, vb = x_raw[150:300], v_meas[150:300] - 0.2  # distinct series

        # interleave blocks across streams — states must not bleed
        outs_a, outs_b, wa, wb = [], [], [], []
        for lo, hi in ((0, 50), (50, 100), (100, 150)):
            outs_a.append(mon.observe(xa[lo:hi], va[lo:hi], stream="a"))
            outs_b.append(mon.observe(xb[lo:hi], vb[lo:hi], stream="b"))
            wa.append(ref_a.observe(xa[lo:hi], va[lo:hi]))
            wb.append(ref_b.observe(xb[lo:hi], vb[lo:hi]))
        for got, want in zip(outs_a + outs_b, wa + wb):
            np.testing.assert_array_equal(got.rf_smooth, want.rf_smooth)
            np.testing.assert_array_equal(got.v_alarm, want.v_alarm)
        assert mon.stream_n_seen("a") == mon.stream_n_seen("b") == 150
        assert mon.n_seen == 300
        assert set(mon.streams) == {"default", "a", "b"}

        # per-stream reset leaves the sibling untouched
        st_b = mon._streams["b"]
        mon.reset("a")
        assert mon.stream_n_seen("a") == 0 and mon.stream_n_seen("b") == 150
        assert mon._streams["b"] is st_b

    def test_observe_many_matches_observe(self, setup, head_and_feats):
        params, d, mu, sigma, x_raw, v_meas = setup
        head, _ = head_and_feats
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                            diagnosis=head)
        ref = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                            diagnosis=head)
        streams = ["s0", "s1", "s2"]
        x_bank = np.stack([x_raw[0:40], x_raw[40:80], x_raw[80:120]])
        v_bank = np.stack([v_meas[0:40], v_meas[40:80], v_meas[80:120]])

        # two banked rounds: state must carry per stream across rounds
        for rnd in (0, 1):
            xb = x_bank + 0.01 * rnd
            res = mon.observe_many(xb, v_bank, streams)
            for i, s in enumerate(streams):
                want = ref.observe(xb[i], v_bank[i], stream=s)
                got = res[s]
                np.testing.assert_allclose(
                    got.rf_smooth, want.rf_smooth, rtol=1e-6, atol=1e-7
                )
                np.testing.assert_array_equal(got.fault_pred, want.fault_pred)
                np.testing.assert_allclose(
                    got.fault_probs, want.fault_probs, rtol=1e-5, atol=1e-7
                )
                np.testing.assert_allclose(
                    got.layer_scores, want.layer_scores, rtol=1e-5, atol=1e-7
                )
                np.testing.assert_allclose(
                    got.layer_c, want.layer_c, rtol=1e-5, atol=1e-7
                )
        assert mon.stream_n_seen("s1") == 80

    # reuse the class-scoped head fixture
    head_and_feats = TestStreamingDiagnosis.head_and_feats

    def test_observe_many_validation(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        with pytest.raises(ValueError, match="x_bank"):
            mon.observe_many(x_raw[:8], v_meas[:8], ["a"])
        with pytest.raises(ValueError, match="unique"):
            mon.observe_many(
                np.stack([x_raw[:8], x_raw[:8]]),
                np.stack([v_meas[:8], v_meas[:8]]), ["a", "a"],
            )

    def test_http_observe_many(self, setup):
        """/observe_many advances a fleet in one request; payloads match
        sequential /observe calls on a twin server."""
        import threading

        from pinnfc_tpu.serving import make_server

        params, d, mu, sigma, x_raw, v_meas = setup

        def start():
            mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
            server = make_server(mon, port=0)
            t = threading.Thread(target=server.serve_forever, daemon=True)
            t.start()
            return server, server.server_address[1], mon

        srv_a, port_a, _ = start()
        srv_b, port_b, _ = start()
        try:
            post = TestHttpServer._post
            x_bank = [x_raw[0:20].tolist(), x_raw[20:40].tolist()]
            v_bank = [v_meas[0:20].tolist(), v_meas[20:40].tolist()]
            code, many = post(port_a, "/observe_many", {
                "streams": ["s1", "s2"], "x": x_bank, "v": v_bank,
            })
            assert code == 200 and many["n_seen"] == 40
            for i, s in enumerate(("s1", "s2")):
                _, one = post(port_b, "/observe", {
                    "x": x_bank[i], "v": v_bank[i], "stream": s,
                })
                got = many["results"][s]
                np.testing.assert_allclose(
                    got["rf_smooth"], one["rf_smooth"], rtol=1e-6, atol=1e-7
                )
                assert got["stream_n_seen"] == 20

            # validation: duplicate keys, shape mismatch → 400
            code, body = post(port_a, "/observe_many", {
                "streams": ["s1", "s1"], "x": x_bank, "v": v_bank,
            })
            assert code == 400 and "unique" in body["error"]
            code, body = post(port_a, "/observe_many", {
                "streams": ["s1"], "x": x_bank, "v": v_bank,
            })
            assert code == 400 and "x must be" in body["error"]
        finally:
            for srv in (srv_a, srv_b):
                srv.shutdown()
                srv.server_close()

    def test_http_stream_routing(self, setup, head_and_feats):
        """/observe with a stream key keeps per-stack state server-side;
        /reset {"stream": ...} clears only that stream."""
        import threading

        from pinnfc_tpu.serving import make_server

        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        server = make_server(mon, port=0)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            post = TestHttpServer._post
            _, o1 = post(port, "/observe", {
                "x": x_raw[:30].tolist(), "v": v_meas[:30].tolist(),
                "stream": "stack-1",
            })
            _, o2 = post(port, "/observe", {
                "x": x_raw[:30].tolist(), "v": v_meas[:30].tolist(),
                "stream": "stack-2",
            })
            # same data on two fresh streams → identical series
            np.testing.assert_allclose(o1["rf_smooth"], o2["rf_smooth"])
            assert o1["stream"] == "stack-1" and o1["stream_n_seen"] == 30
            assert o2["n_seen"] == 60

            code, _ = post(port, "/reset", {"stream": "stack-1"})
            assert code == 200
            _, o3 = post(port, "/observe", {
                "x": x_raw[:30].tolist(), "v": v_meas[:30].tolist(),
                "stream": "stack-1",
            })
            np.testing.assert_allclose(o3["rf_smooth"], o1["rf_smooth"])
            assert o3["stream_n_seen"] == 30

            code, body = post(port, "/observe", {
                "x": x_raw[:5].tolist(), "v": v_meas[:5].tolist(),
                "stream": "",
            })
            assert code == 400 and "stream" in body["error"]

            import json as j
            import urllib.request

            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health"
            ) as r:
                health = j.loads(r.read())
            assert "stack-2" in health["streams"]

            # stream-bank cardinality cap: a NOVEL key is refused once the
            # bank is full; existing keys keep working
            import pinnfc_tpu.serving.server as srv_mod

            old_cap = srv_mod.MAX_STREAMS
            srv_mod.MAX_STREAMS = len(mon.streams)
            try:
                code, body = post(port, "/observe", {
                    "x": x_raw[:5].tolist(), "v": v_meas[:5].tolist(),
                    "stream": "stack-overflow",
                })
                assert code == 400 and "bank full" in body["error"]
                code, _ = post(port, "/observe", {
                    "x": x_raw[:5].tolist(), "v": v_meas[:5].tolist(),
                    "stream": "stack-2",
                })
                assert code == 200
            finally:
                srv_mod.MAX_STREAMS = old_cap
        finally:
            server.shutdown()
            server.server_close()


class TestSensorGlitchGuard:
    def test_nan_row_does_not_poison_state(self, setup):
        """A non-finite sensor row must not corrupt the carried RF state:
        the recurrence would otherwise propagate the NaN forever."""
        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        x_bad = x_raw[:100].copy()
        v_bad = v_meas[:100].copy()
        x_bad[40] = np.nan  # one glitched sample mid-stream
        out = mon.observe(x_bad, v_bad)
        # the stream after the glitch stays finite
        assert np.isfinite(out.rf_smooth[41:]).all()
        # and later blocks are untouched
        out2 = mon.observe(x_raw[100:200], v_meas[100:200])
        assert np.isfinite(out2.rf_smooth).all()

    def test_clean_streams_unchanged(self, setup):
        """The guard is a no-op on finite data (same series as before)."""
        params, d, mu, sigma, x_raw, v_meas = setup
        cfg = RiskConfig()
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma, cfg)
        out = mon.observe(x_raw, v_meas)
        want = _offline_rf(params, d, mu, sigma, x_raw, v_meas, cfg)
        np.testing.assert_allclose(
            out.rf_smooth, np.asarray(want["rf_smooth"]), rtol=1e-4, atol=1e-5
        )

    def test_glitch_flag_marks_discarded_samples(self, setup):
        """Every sample excluded from the risk integral is surfaced via
        MonitorOutput.glitch so operators can tell 'healthy' from
        'sensors dead' (advisor round-2 finding)."""
        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        x_bad = x_raw[:100].copy()
        x_bad[30:35] = np.nan
        out = mon.observe(x_bad, v_meas[:100])
        want = np.zeros(100, bool)
        want[30:35] = True
        np.testing.assert_array_equal(np.asarray(out.glitch), want)
        assert not np.asarray(out.sensor_alarm).any()  # run of 5 < default 25

    def test_voltage_only_outage_is_a_glitch(self, setup):
        """A dead voltage channel (NaN v_meas, finite x) silently disables
        v_alarm for those rows — it must raise glitch and count toward the
        sensor alarm just like an x-feature outage (advisor round-3)."""
        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(
            params, d.scaler_x, d.scaler_y, mu, sigma, glitch_alarm_n=5
        )
        v_bad = v_meas[:40].copy()
        v_bad[10:17] = np.nan  # run of 7 ≥ 5 → alarm from sample 14 on
        out = mon.observe(x_raw[:40], v_bad)
        glitch = np.asarray(out.glitch)
        want = np.zeros(40, bool)
        want[10:17] = True
        np.testing.assert_array_equal(glitch, want)
        alarm = np.asarray(out.sensor_alarm)
        assert alarm[14:17].all() and not alarm[:14].any() and not alarm[17:].any()

    def test_sensor_alarm_after_consecutive_glitches(self, setup):
        """A sustained all-NaN stream decays RF toward 'healthy'; the
        consecutive-glitch counter must raise sensor_alarm instead, and the
        run must carry across blocks and reset on recovery."""
        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(
            params, d.scaler_x, d.scaler_y, mu, sigma, glitch_alarm_n=10
        )
        mon.observe(x_raw[:20], v_meas[:20])  # healthy warm-up
        x_dead = np.full((6, 8), np.nan, np.float32)
        v_dead = np.full(6, np.nan, np.float32)
        out1 = mon.observe(x_dead, v_dead)  # run reaches 6
        assert not np.asarray(out1.sensor_alarm).any()
        out2 = mon.observe(x_dead, v_dead)  # run reaches 12 mid-block
        alarm = np.asarray(out2.sensor_alarm)
        assert not alarm[:3].any() and alarm[3:].all()  # fires at run == 10
        out3 = mon.observe(x_raw[20:30], v_meas[20:30])  # sensors recover
        assert not np.asarray(out3.sensor_alarm).any()
        assert not np.asarray(out3.glitch).any()

    def test_v_first_defers_to_first_finite_sample(self, setup):
        """A glitched FIRST sample must not zero the dynamic-voltage-alarm
        baseline forever (advisor round-2 medium): capture defers to the
        first finite voltage, then V ≤ V(0) − 0.1 fires normally."""
        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        v_bad = v_meas[:50].copy()
        v_bad[:3] = np.nan  # glitched start of stream
        out = mon.observe(x_raw[:50], v_bad)
        assert not np.asarray(out.v_alarm)[:3].any()
        assert float(np.asarray(mon.state.v_first)) == pytest.approx(
            float(v_meas[3]), abs=1e-6
        )
        # a later collapse below V(0) - 0.1 must still alarm
        v_drop = v_meas[50:100] - (float(v_meas[3]) - np.min(v_meas[50:100]) + 0.2)
        out2 = mon.observe(x_raw[50:100], v_drop)
        assert np.asarray(out2.v_alarm).any()

    def test_v_first_capture_defers_across_blocks(self, setup):
        """An entirely-glitched first block leaves the baseline unset; the
        next block's first finite sample becomes V(0) — block-size
        invariant with the in-block deferral above."""
        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        out = mon.observe(x_raw[:4], np.full(4, np.nan, np.float32))
        assert not np.asarray(out.v_alarm).any()
        assert not bool(np.asarray(mon.state.v_first_set))
        mon.observe(x_raw[4:8], v_meas[4:8])
        assert bool(np.asarray(mon.state.v_first_set))
        assert float(np.asarray(mon.state.v_first)) == pytest.approx(
            float(v_meas[4]), abs=1e-6
        )


class TestJsonSafety:
    """Glitched samples must never produce invalid JSON: json.dumps would
    emit the non-RFC-8259 token NaN for non-finite v_pred/rf outputs, which
    strict clients (JSON.parse, serde, encoding/json) refuse to parse."""

    def test_observe_with_nan_row_returns_strict_json(self, setup):
        import json as j
        import threading
        import urllib.request

        from pinnfc_tpu.serving import make_server

        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        server = make_server(mon, port=0)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            x = x_raw[:4].tolist()
            v = v_meas[:4].tolist()
            x[2] = [None] * 8  # JSON null → NaN on parse via np.asarray
            body = j.dumps({"x": x, "v": v}).replace("null", "NaN")
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/observe", data=body.encode(),
                method="POST", headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as r:
                raw = r.read().decode()
                assert r.status == 200
            # STRICT parse: reject NaN/Infinity constants outright
            def _no_const(name):
                raise ValueError(f"non-strict JSON constant {name}")

            payload = j.loads(raw, parse_constant=_no_const)
            assert payload["glitch"] == [False, False, True, False]
            assert payload["v_pred"][2] is None  # sanitized, not NaN
            assert all(
                v is None or np.isfinite(v) for v in payload["rf_smooth"]
            )
        finally:
            server.shutdown()
            server.server_close()

    def test_glitched_samples_do_not_vote_class_zero(self, setup):
        """An all-NaN posterior row's argmax is silently 0; glitched samples
        must carry fault_pred = -1 so they never count as confident class-0
        diagnoses (review r3)."""
        import jax

        from pinnfc_tpu.diagnosis.gmm import GMMParams
        from pinnfc_tpu.serving.monitor import DiagnosisHead

        params, d, mu, sigma, x_raw, v_meas = setup
        # tiny 2-component head over (pV, pT)
        gmm = GMMParams(
            weights=jnp.asarray([0.5, 0.5]),
            means=jnp.asarray([[0.0, 0.0], [1.0, 1.0]]),
            covariances=jnp.asarray([np.eye(2), np.eye(2)], ),
            converged=jnp.asarray(True),
            n_iter=jnp.asarray(3),
            lower_bound=jnp.asarray(-1.0),
        )
        head = DiagnosisHead(
            gmm=gmm,
            comp_fault_prob=jnp.asarray([[1.0, 0.0], [0.0, 1.0]], jnp.float32),
            class_names=("normalish", "faultish"),
            feature_indices=(1, 2),
        )
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                            diagnosis=head)
        x_bad = x_raw[:10].copy()
        x_bad[4] = np.nan
        out = mon.observe(x_bad, v_meas[:10])
        pred = np.asarray(out.fault_pred)
        assert pred[4] == -1
        assert (pred[:4] >= 0).all() and (pred[5:] >= 0).all()

    def test_glitch_alarm_n_validated(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup
        with pytest.raises(ValueError, match="glitch_alarm_n"):
            OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                          glitch_alarm_n=0)


class TestHostResidentStateBank:
    """The per-stream state bank lives on the HOST between calls (round-4
    optimization): fresh and carried states share one jit signature (no
    spurious second compile) and bank packing costs zero device dispatches."""

    def test_no_recompile_between_fresh_and_carried_state(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        mon.observe(x_raw[:8], v_meas[:8])   # fresh-state call traces once
        mon.observe(x_raw[8:16], v_meas[8:16])  # carried state: same signature
        # the old weak-typed jnp-zeros fresh state cost one extra compile on
        # the second call (weak f32 scalar vs strong carried output dtype)
        assert mon._step._cache_size() == 1

    def test_bank_stays_host_numpy(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        mon.observe(x_raw[:8], v_meas[:8], stream="a")
        xb = np.stack([x_raw[:4], x_raw[4:8]])
        vb = np.stack([v_meas[:4], v_meas[4:8]])
        mon.observe_many(xb, vb, ["a", "b"])
        for s in ("a", "b"):
            for leaf in jax.tree_util.tree_leaves(mon._streams[s]):
                assert not isinstance(leaf, jax.Array), (
                    f"stream {s!r} leaked a device array into the host bank"
                )

    def test_injected_device_state_still_accepted(self, setup):
        """Users may assign a device-resident MonitorState (e.g. restored
        from a checkpointed pytree); observe_many must still pack it."""
        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        ref = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        out_ref = ref.observe(x_raw[:8], v_meas[:8])
        # put the fresh default state on device, then advance via the fleet path
        mon.state = jax.tree_util.tree_map(jnp.asarray, mon.state)
        out = mon.observe_many(x_raw[None, :8], v_meas[None, :8], ["default"])
        np.testing.assert_allclose(
            out["default"].rf_smooth, out_ref.rf_smooth, rtol=1e-6
        )


class TestStateBankPersistence:
    """save_state_bank/load_state_bank + `cli serve --state-path`: a
    restarted scorer resumes every stream's RF(t) recurrence bit-exactly
    (the serving counterpart of the trainer's mid-stage checkpointing —
    the bank is six host scalars per stream, so per-request snapshots
    are pure host work)."""

    def test_roundtrip_bitexact_and_counters(self, setup, tmp_path):
        params, d, mu, sigma, x_raw, v_meas = setup
        ref = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        for m in (ref, mon):
            m.observe(x_raw[:64], v_meas[:64], stream="a")
            m.observe(x_raw[64:128], v_meas[64:128], stream="b")
        path = mon.save_state_bank(str(tmp_path / "bank"))
        assert path.endswith(".npz")
        # atomic write discipline: no tmp file left behind
        assert not any(p.name.endswith(".tmp.npz") for p in tmp_path.iterdir())

        mon2 = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        mon2.load_state_bank(path)
        assert set(mon2.streams) == {"default", "a", "b"}
        assert mon2.stream_n_seen("a") == 64
        assert mon2.n_seen == ref.n_seen
        out_ref = ref.observe(x_raw[128:200], v_meas[128:200], stream="a")
        out_new = mon2.observe(x_raw[128:200], v_meas[128:200], stream="a")
        np.testing.assert_array_equal(out_new.rf_smooth, out_ref.rf_smooth)
        np.testing.assert_array_equal(out_new.rf_inst, out_ref.rf_inst)
        np.testing.assert_array_equal(out_new.v_alarm, out_ref.v_alarm)
        # restored dtypes match the fresh-state jit signature exactly —
        # continuing from a snapshot must not cost a second compile
        assert mon2._step._cache_size() == 1

    def test_load_older_snapshot_without_layer_c(self, setup, tmp_path, capsys):
        """A snapshot written before the live attribution existed (no
        state_layer_c) must still restore: the RF recurrence resumes
        bit-exactly and the attribution restarts from zero."""
        params, d, mu, sigma, x_raw, v_meas = setup
        ref = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        for m in (ref, mon):
            m.observe(x_raw[:64], v_meas[:64], stream="a")
        path = mon.save_state_bank(str(tmp_path / "bank"))
        payload = dict(np.load(path))
        del payload["state_layer_c"]
        old = str(tmp_path / "old.npz")
        np.savez(old, **payload)

        mon2 = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        mon2.load_state_bank(old)
        assert "layer_c" in capsys.readouterr().err
        np.testing.assert_array_equal(
            np.asarray(mon2._streams["a"].layer_c), np.zeros(3, np.float32)
        )
        out_ref = ref.observe(x_raw[64:128], v_meas[64:128], stream="a")
        out_new = mon2.observe(x_raw[64:128], v_meas[64:128], stream="a")
        np.testing.assert_array_equal(out_new.rf_smooth, out_ref.rf_smooth)

    def test_load_validates_schema(self, setup, tmp_path):
        params, d, mu, sigma, x_raw, v_meas = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        path = mon.save_state_bank(str(tmp_path / "bank"))
        payload = dict(np.load(path))
        del payload["state_c"]
        bad = str(tmp_path / "bad.npz")
        np.savez(bad, **payload)
        with pytest.raises(ValueError, match="missing"):
            mon.load_state_bank(bad)
        payload = dict(np.load(path))
        payload["n_seen"] = payload["n_seen"][:0]
        bad2 = str(tmp_path / "bad2.npz")
        np.savez(bad2, **payload)
        with pytest.raises(ValueError, match="n_seen"):
            mon.load_state_bank(bad2)

    def test_server_snapshots_and_restarted_server_resumes(self, setup, tmp_path):
        import os
        import threading

        from pinnfc_tpu.serving import make_server

        params, d, mu, sigma, x_raw, v_meas = setup
        bank = str(tmp_path / "bank.npz")
        ref = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)

        mon1 = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        server = make_server(mon1, port=0, state_path=bank)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            code, _ = TestHttpServer._post(port, "/observe", {
                "x": x_raw[:50].tolist(), "v": v_meas[:50].tolist(),
                "stream": "s1",
            })
            assert code == 200
        finally:
            server.shutdown()
            server.server_close()
            t.join()
        assert os.path.exists(bank)

        # "restart": a fresh process's monitor restored from the snapshot
        # continues exactly where the killed server left off
        mon2 = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        mon2.load_state_bank(bank)
        ref.observe(x_raw[:50], v_meas[:50], stream="s1")
        out_ref = ref.observe(x_raw[50:100], v_meas[50:100], stream="s1")
        out_new = mon2.observe(x_raw[50:100], v_meas[50:100], stream="s1")
        np.testing.assert_array_equal(out_new.rf_smooth, out_ref.rf_smooth)
        np.testing.assert_array_equal(out_new.v_alarm, out_ref.v_alarm)

    def test_snapshot_failure_does_not_500(self, setup, tmp_path):
        """A failed snapshot write must NOT turn an applied observation into
        a 500 (retrying clients would double-feed the order-dependent RF
        series) — it is counted and exposed on /metrics instead."""
        import threading
        import urllib.request

        from pinnfc_tpu.serving import make_server

        params, d, mu, sigma, x_raw, v_meas = setup
        bank = tmp_path / "bank.npz"
        bank.mkdir()  # a directory at the target path makes os.replace fail

        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        server = make_server(mon, port=0, state_path=str(bank))
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            code, body = TestHttpServer._post(port, "/observe", {
                "x": x_raw[:10].tolist(), "v": v_meas[:10].tolist(),
            })
            assert code == 200
            assert body["n_seen"] == 10
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics"
            ) as r:
                text = r.read().decode()
            assert "pinnfc_snapshot_failures_total 1" in text
        finally:
            server.shutdown()
            server.server_close()
            t.join()

    def test_serve_probes_writability_at_startup(self, setup, tmp_path):
        """A misconfigured --state-path fails fast at startup rather than
        silently degrading persistence on every request."""
        from pinnfc_tpu.serving import serve

        params, d, mu, sigma, x_raw, v_meas = setup
        bank = tmp_path / "unwritable.npz"
        bank.mkdir()
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        with pytest.raises(OSError):
            serve(mon, port=0, max_requests=0, state_path=str(bank))


class TestMetricsEndpoint:
    """GET /metrics: Prometheus text exposition over the serving stats and
    the host-resident state bank (scrapes cost zero device dispatches)."""

    client = TestHttpServer.client
    head_and_feats = TestStreamingDiagnosis.head_and_feats
    _post = staticmethod(TestHttpServer._post)

    @staticmethod
    def _scrape(port):
        import urllib.request

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics") as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/plain")
            return r.read().decode()

    def test_metrics_counters_and_gauges(self, setup, client):
        params, d, mu, sigma, x_raw, v_meas = setup
        port, mon = client

        code, _ = self._post(port, "/observe", {
            "x": x_raw[:30].tolist(), "v": v_meas[:30].tolist(),
            "stream": "stack-1",
        })
        assert code == 200
        code, _ = self._post(port, "/observe", {"x": [[1.0]], "v": [1.0]})
        assert code == 400
        text = self._scrape(port)

        assert 'pinnfc_requests_total{path="/observe",code="200"} 1' in text
        assert 'pinnfc_requests_total{path="/observe",code="400"} 1' in text
        assert "pinnfc_observe_seconds_count 1" in text
        assert "pinnfc_samples_streamed_total 30" in text
        # per-stream gauges come from the host state bank
        assert 'pinnfc_stream_n_seen{stream="stack-1"} 30' in text
        rf_line = next(
            l for l in text.splitlines()
            if l.startswith('pinnfc_stream_rf_smooth{stream="stack-1"}')
        )
        want = float(mon._streams["stack-1"].rf_smooth)
        assert float(rf_line.rsplit(" ", 1)[1]) == pytest.approx(want, rel=1e-4)
        # live per-layer risk composition gauges (one per layer per stream)
        for j, layer in enumerate(mon.layer_names):
            lc_line = next(
                l for l in text.splitlines()
                if l.startswith(
                    f'pinnfc_stream_layer_c{{stream="stack-1",layer="{layer}"}}'
                )
            )
            want_lc = float(np.asarray(mon._streams["stack-1"].layer_c)[j])
            assert float(lc_line.rsplit(" ", 1)[1]) == pytest.approx(
                want_lc, rel=1e-4, abs=1e-9
            )

        # a second scrape counts the first one
        text2 = self._scrape(port)
        assert 'pinnfc_requests_total{path="/metrics",code="200"} 1' in text2

    def test_label_escaping(self, setup, client):
        params, d, mu, sigma, x_raw, v_meas = setup
        port, _mon = client
        code, _ = self._post(port, "/observe", {
            "x": x_raw[:2].tolist(), "v": v_meas[:2].tolist(),
            "stream": 'weird"key\\name',
        })
        assert code == 200
        text = self._scrape(port)
        assert r'stream="weird\"key\\name"' in text

    def test_unknown_paths_fold_into_one_series(self, setup, client):
        """A client probing random URLs must not mint one Prometheus series
        per unique path — unknown paths fold into a single "<other>" label
        (unbounded label cardinality is a scrape-size/memory leak)."""
        _params = setup
        port, _mon = client
        for i in range(3):
            code, _ = self._post(port, f"/no-such-route-{i}", {})
            assert code == 404
        text = self._scrape(port)
        assert 'pinnfc_requests_total{path="<other>",code="404"} 3' in text
        assert "no-such-route" not in text


class TestShardedFleet:
    """Fleet sharding: ``OnlineMonitor(mesh=...)`` shards observe_many's
    STREAM axis over the mesh's 'data' axis.  Streams never interact, so
    (a) the sharded fleet must match the single-device vmap exactly —
    including when S is not divisible by the axis size (fresh-state
    padding) — and (b) the compiled program must contain ZERO collectives
    (same guard discipline as test_parallel.TestHloCollectiveGuards: any
    collective here means a sharding annotation drifted and the fleet
    stopped scaling linearly)."""

    @staticmethod
    def _mesh():
        from pinnfc_tpu.parallel import make_mesh

        if jax.device_count() < 2:
            # PINNFC_TEST_TPU=1 runs on the single real chip — sharded
            # coverage comes from the CPU-simulation run (conftest default)
            pytest.skip("needs >1 device (CPU simulation run)")
        return make_mesh(jax.device_count())

    def test_sharded_fleet_matches_unsharded(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup
        mesh = self._mesh()
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                            mesh=mesh)
        ref = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        # S=5 on an 8-device axis -> exercises the fresh-state pad path
        streams = [f"s{i}" for i in range(5)]
        x_bank = np.stack([x_raw[40 * i: 40 * (i + 1)] for i in range(5)])
        v_bank = np.stack(
            [v_meas[40 * i: 40 * (i + 1)] - 0.05 * i for i in range(5)]
        )
        for rnd in (0, 1):  # second round: carried state must continue
            xb = x_bank + 0.01 * rnd
            got = mon.observe_many(xb, v_bank, streams)
            want = ref.observe_many(xb, v_bank, streams)
            for s in streams:
                np.testing.assert_allclose(
                    got[s].rf_smooth, want[s].rf_smooth, rtol=1e-6, atol=1e-7
                )
                np.testing.assert_allclose(
                    got[s].layer_c, want[s].layer_c, rtol=1e-5, atol=1e-7
                )
                np.testing.assert_array_equal(got[s].v_alarm, want[s].v_alarm)
                np.testing.assert_array_equal(got[s].glitch, want[s].glitch)
        # pad streams never leak into the bank; counters advance normally
        assert set(mon.streams) == {"default", *streams}
        for s in streams:
            assert mon.stream_n_seen(s) == 80
            np.testing.assert_allclose(
                np.asarray(mon._streams[s].c),
                np.asarray(ref._streams[s].c), rtol=1e-6, atol=1e-7,
            )

    def test_fleet_program_collective_free(self, setup):
        import re

        params, d, mu, sigma, x_raw, v_meas = setup
        mesh = self._mesh()
        # conformal enabled: the baked calibration searchsorted is row-local
        # and must not introduce collectives either
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                            mesh=mesh,
                            conformal_calib=np.linspace(0.01, 1.0, 40))
        n = jax.device_count()
        streams = [f"s{i}" for i in range(n)]
        x_bank = np.stack([x_raw[:16]] * n).astype(np.float32)
        v_bank = np.stack([v_meas[:16]] * n).astype(np.float32)
        mon.observe_many(x_bank, v_bank, streams)  # builds _vstep + bank
        bank = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs),
            *jax.device_get([mon._streams[s] for s in streams]),
        )
        p, mu_r, sg, bank_s, x_s, v_s = mon._shard_fleet(bank, x_bank, v_bank)
        txt = mon._vstep.lower(
            p, bank_s, x_s, v_s, mu_r, sg
        ).compile().as_text()
        counts = {
            k: len(re.findall(" " + k + r"\(", txt))
            for k in ("all-reduce", "all-gather", "all-to-all",
                      "collective-permute", "reduce-scatter")
        }
        assert all(v == 0 for v in counts.values()), counts

    def test_mesh_needs_data_axis(self, setup):
        from jax.sharding import Mesh

        params, d, mu, sigma, _x, _v = setup
        devs = np.array(jax.devices())
        with pytest.raises(ValueError, match="data"):
            OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                          mesh=Mesh(devs, ("model",)))


class TestFleetReplay:
    """Streaming fleet replay (serving/replay.py): every (current, fault)
    risk condition of 04:145-161 advances as a concurrent stream of ONE
    monitor.  The fleet path (vmapped observe_many for full blocks +
    per-stream partial tails) must reproduce, condition for condition,
    what an independent single-stream monitor sees on the same rows."""

    CONDITIONS = (
        (108.0, "水淹", None),
        (270.0, "膜干", None),
        (108.0, "膜干", (0, 40)),
    )

    @pytest.fixture(scope="class")
    def artifact(self, setup):
        from pinnfc_tpu.data.contract import INDEX

        params, d, mu, sigma, x_raw, v_meas = setup
        n = len(x_raw)
        arr = np.zeros((n, 22))
        arr[:, 0:8] = x_raw
        v = v_meas.copy()
        # three condition segments with different lengths; collapse the
        # voltage inside each so the dynamic alarm fires
        segs = [(0, 150, 1, 108.0), (150, 300, 7, 270.0), (300, 391, 8, 108.0)]
        for lo, hi, label, current in segs:
            arr[lo:hi, INDEX["label"]] = label
            arr[lo:hi, 0] = current
            v[lo:hi] = v[lo:hi] - np.linspace(0, 0.8, hi - lo)
        arr[:, INDEX["y_true"]] = v
        return arr

    def _sequential_oracle(self, setup, arr, block):
        """Per-condition replay through INDEPENDENT monitors."""
        from pinnfc_tpu.risk import condition_row_indices

        params, d, mu, sigma, _x, _v = setup
        from pinnfc_tpu.data.contract import INDEX

        out = {}
        for current, fault, index_range in self.CONDITIONS:
            mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
            idx = condition_row_indices(arr, fault, current, mon.config,
                                        index_range)
            x = arr[idx, 0:8].astype(np.float32)
            v = arr[idx, INDEX["y_true"]].astype(np.float32)
            first = {"warn": None, "danger": None, "v_alarm": None}
            pos = 0
            while pos < len(x):
                o = mon.observe(x[pos: pos + block], v[pos: pos + block])
                for name, flags in (("warn", o.warn), ("danger", o.danger),
                                    ("v_alarm", o.v_alarm)):
                    if first[name] is None and flags.any():
                        first[name] = pos + int(np.argmax(flags))
                pos += len(o.rf_smooth)
            out[f"{fault}@{current:g}A"] = (first, len(x))
        return out

    def test_fleet_matches_independent_monitors(self, setup, artifact):
        from pinnfc_tpu.serving import fleet_replay

        params, d, mu, sigma, _x, _v = setup
        block = 64
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        table = fleet_replay(mon, artifact, conditions=self.CONDITIONS,
                             block=block)
        assert [r.stream for r in table] == [
            "水淹@108A", "膜干@270A", "膜干@108A"
        ]
        want = self._sequential_oracle(setup, artifact, block)
        for r in table:
            first, n = want[r.stream]
            assert r.n_samples == n
            assert r.first_warn == first["warn"], r.stream
            assert r.first_danger == first["danger"], r.stream
            assert r.first_v_alarm == first["v_alarm"], r.stream
            if r.first_warn is not None and r.first_v_alarm is not None:
                assert r.advance == r.first_v_alarm - r.first_warn
        # the induced collapse must actually alarm somewhere, and the
        # attribution shares must be a valid composition
        assert any(r.first_v_alarm is not None for r in table)
        for r in table:
            if r.layer_shares:
                assert abs(sum(r.layer_shares.values()) - 1.0) < 1e-5
        # fleet streams live in the bank like any others
        assert set(r.stream for r in table) <= set(mon.streams)

    def test_fleet_replay_sharded(self, setup, artifact):
        """Same replay with the stream axis sharded over the mesh."""
        from pinnfc_tpu.serving import fleet_replay

        params, d, mu, sigma, _x, _v = setup
        mon = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                            mesh=TestShardedFleet._mesh())
        ref = OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma)
        got = fleet_replay(mon, artifact, conditions=self.CONDITIONS, block=64)
        want = fleet_replay(ref, artifact, conditions=self.CONDITIONS, block=64)
        for g, w in zip(got, want):
            assert g.stream == w.stream
            assert g.first_warn == w.first_warn
            assert g.first_danger == w.first_danger
            assert g.first_v_alarm == w.first_v_alarm

    def test_cli_monitor_fleet(self, setup, artifact, tmp_path, capsys):
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.data.contract import save_comprehensive_results
        from pinnfc_tpu.utils import save_checkpoint

        params, d, mu, sigma, _x, _v = setup
        ckpt = str(tmp_path / "ckpt")
        save_checkpoint(ckpt, params, d.scaler_x, d.scaler_y)
        mat = str(tmp_path / "F01.mat")
        save_comprehensive_results(artifact, mat)
        rc = main(["monitor", "--mat", mat, "--ckpt", ckpt, "--fleet",
                   "--block", "64"])
        assert rc == 0
        out = capsys.readouterr().out
        assert "fleet replay:" in out
        assert "膜干" in out and "水淹" in out


class TestInputDrift:
    """Streaming input-range drift: MonitorOutput.oob flags + the per-channel
    cumulative MonitorState.oob_count (the serving counterpart of cli score's
    normal_oob_frac warning).  The training box is the scaler's MinMax fit
    range (01:271-274); NaN inputs are glitches, never drift."""

    @staticmethod
    def _box(d):
        return (np.asarray(d.scaler_x.data_min, np.float32),
                np.asarray(d.scaler_x.data_max, np.float32))

    @staticmethod
    def _fresh(setup):
        params, d, mu, sigma, _x, _v = setup
        return OnlineMonitor(params, d.scaler_x, d.scaler_y, mu, sigma,
                             RiskConfig())

    def test_in_range_rows_never_flag(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup
        lo, hi = self._box(d)
        m = self._fresh(setup)
        out = m.observe(np.clip(x_raw[:32], lo, hi), v_meas[:32])
        assert out.oob is not None
        assert not out.oob.any()
        assert m.stream_oob_counts().sum() == 0

    def test_oob_counts_accumulate_per_channel(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup
        lo, hi = self._box(d)
        span = np.maximum(hi - lo, 1.0)
        x = np.clip(x_raw[:16], lo, hi).copy()
        x[0:5, 2] = hi[2] + 0.1 * span[2]   # above the box
        x[3:6, 6] = lo[6] - 0.1 * span[6]   # below (rows 3,4 overlap ch 2)
        m = self._fresh(setup)
        out = m.observe(x, v_meas[:16])
        want_flag = np.zeros(16, bool)
        want_flag[0:6] = True
        np.testing.assert_array_equal(out.oob, want_flag)
        counts = m.stream_oob_counts()
        assert counts[2] == 5 and counts[6] == 3
        assert counts.sum() == 8
        # a second block keeps accumulating in the stream state
        m.observe(x, v_meas[:16])
        counts = m.stream_oob_counts()
        assert counts[2] == 10 and counts[6] == 6
        # exactly-on-the-boundary values are IN range (closed box)
        x_edge = np.clip(x_raw[:4], lo, hi).copy()
        x_edge[:, 3] = hi[3]
        out = m.observe(x_edge, v_meas[:4])
        assert not out.oob.any()

    def test_nan_is_glitch_not_drift(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup
        lo, hi = self._box(d)
        x = np.clip(x_raw[:8], lo, hi).copy()
        x[2, :] = np.nan
        m = self._fresh(setup)
        out = m.observe(x, v_meas[:8])
        assert out.glitch[2] and not out.oob[2]
        assert m.stream_oob_counts().sum() == 0

    def test_inf_is_glitch_not_drift(self, setup):
        # ±inf satisfies the box comparison (unlike NaN) — a sensor stuck
        # at inf is an outage and must not inflate the drift counters
        params, d, mu, sigma, x_raw, v_meas = setup
        lo, hi = self._box(d)
        x = np.clip(x_raw[:8], lo, hi).copy()
        x[1, 4] = np.inf
        x[3, 6] = -np.inf
        m = self._fresh(setup)
        out = m.observe(x, v_meas[:8])
        assert out.glitch[1] and out.glitch[3]
        assert not out.oob[1] and not out.oob[3]
        assert m.stream_oob_counts().sum() == 0

    def test_observe_many_matches_sequential(self, setup):
        params, d, mu, sigma, x_raw, v_meas = setup
        lo, hi = self._box(d)
        span = np.maximum(hi - lo, 1.0)
        x = np.clip(x_raw[:24], lo, hi).copy()
        x[:6, 1] = hi[1] + 0.2 * span[1]
        xb = np.stack([x[:12], x[12:24]])
        vb = np.stack([v_meas[:12], v_meas[12:24]])
        fleet = self._fresh(setup)
        seq = self._fresh(setup)
        res = fleet.observe_many(xb, vb, ["a", "b"])
        for i, s in enumerate(("a", "b")):
            alone = seq.observe(xb[i], vb[i], stream=s)
            np.testing.assert_array_equal(res[s].oob, alone.oob)
            np.testing.assert_array_equal(
                fleet.stream_oob_counts(s), seq.stream_oob_counts(s)
            )

    def test_state_bank_roundtrip_and_pre_drift_snapshot(self, setup, tmp_path):
        params, d, mu, sigma, x_raw, v_meas = setup
        lo, hi = self._box(d)
        span = np.maximum(hi - lo, 1.0)
        x = np.clip(x_raw[:8], lo, hi).copy()
        x[:, 4] = hi[4] + 0.3 * span[4]
        m = self._fresh(setup)
        m.observe(x, v_meas[:8])
        path = str(tmp_path / "bank.npz")
        m.save_state_bank(path)

        m2 = self._fresh(setup)
        m2.load_state_bank(path)
        np.testing.assert_array_equal(
            m2.stream_oob_counts(), m.stream_oob_counts()
        )

        # a snapshot from before the drift counter existed restores with
        # fresh zeros + a stderr note, and the RF recurrence itself resumes
        old = {k: v for k, v in np.load(path).items()
               if k != "state_oob_count"}
        old_path = str(tmp_path / "old.npz")
        np.savez(old_path, **old)
        m3 = self._fresh(setup)
        m3.load_state_bank(old_path)
        assert m3.stream_oob_counts().sum() == 0
        assert float(m3.state.c) == float(m.state.c)

    def test_metrics_and_payload_expose_drift(self, setup):
        from pinnfc_tpu.serving.server import _json_payload, _render_metrics

        params, d, mu, sigma, x_raw, v_meas = setup
        lo, hi = self._box(d)
        span = np.maximum(hi - lo, 1.0)
        x = np.clip(x_raw[:8], lo, hi).copy()
        x[:3, 7] = hi[7] + 0.5 * span[7]
        m = self._fresh(setup)
        out = m.observe(x, v_meas[:8])
        payload = _json_payload(out, m)
        assert payload["oob"] == [True, True, True] + [False] * 5
        text = _render_metrics(
            m, {"requests": {}, "observe_seconds": 0.0, "observe_calls": 0}
        )
        assert 'pinnfc_stream_oob_count{stream="default",channel="air_flow"} 3' in text

    def test_cli_monitor_prints_drift(self, setup, tmp_path, capsys):
        """Replaying rows pushed outside the checkpoint's training box
        surfaces the drift line in cli monitor."""
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.data.contract import INDEX, save_comprehensive_results
        from pinnfc_tpu.utils import save_checkpoint

        params, d, mu, sigma, x_raw, v_meas = setup
        lo, hi = self._box(d)
        span = np.maximum(hi - lo, 1.0)
        arr = np.zeros((64, 22))
        arr[:, :8] = np.clip(x_raw[:64], lo, hi)
        arr[10:20, 5] = hi[5] + 0.2 * span[5]
        arr[:, INDEX["y_true"]] = v_meas[:64]
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, d.scaler_x, d.scaler_y)
        mat = str(tmp_path / "F01.mat")
        save_comprehensive_results(arr, mat)
        assert main(["monitor", "--mat", mat, "--ckpt", ckpt,
                     "--block", "32"]) == 0
        out = capsys.readouterr().out
        assert "input-range drift" in out
        assert "coolant_t_out" in out
