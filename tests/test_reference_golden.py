"""Golden parity against the ACTUAL reference implementation (VERDICT #3).

importlib-loads ``/root/reference/01_train_pinn_multiphysics_model.py``
(import-guarded main, 01:2055), builds a tiny ``PhysicsInformedNN`` with
weights copied into the jnp pytree, and asserts our residuals, losses,
training steps and MC semantics reproduce the reference's torch outputs to
f32 tolerance.  This replaces the hand-transcribed torch oracle
(test_torch_oracle.py) as the parity anchor — transcription errors in the
oracle itself cannot hide here.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_PATH = "/root/reference/01_train_pinn_multiphysics_model.py"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_PATH), reason="reference checkout not mounted"
)


def _is_tpu():
    import jax

    return jax.default_backend() == "tpu"


# Strict last-ulp / f64 parity anchors vs torch-CPU: meaningful only where
# the math unit matches (CPU).  TPU-tolerance coverage comes from the
# residual/λ-trajectory/statistical tests, which do run on hardware.
CPU_ONLY = pytest.mark.skipif(
    _is_tpu(), reason="CPU-only parity anchor (sub-1e-6 / f64 tolerance)"
)


@pytest.fixture(scope="module")
def ref01():
    import matplotlib

    matplotlib.use("Agg")
    spec = importlib.util.spec_from_file_location("ref01_golden", REF_PATH)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ref01_golden"] = mod
    spec.loader.exec_module(mod)  # main is import-guarded (01:2055)

    # The reference passes StepLR(verbose=False) (01:940), removed in newer
    # torch; shim the kwarg away without changing scheduler behavior.
    orig_steplr = mod.StepLR

    def _steplr(*args, **kwargs):
        kwargs.pop("verbose", None)
        return orig_steplr(*args, **kwargs)

    mod.StepLR = _steplr
    return mod


def _tiny_raw(n=48, seed=0):
    rng = np.random.RandomState(seed)
    x_raw = np.column_stack(
        [
            rng.uniform(100, 400, n),  # I [A]
            rng.uniform(0.1, 0.5, n),  # coolant flow
            rng.uniform(60, 64, n),  # T_in
            rng.uniform(40, 70, n),  # P_H2
            rng.uniform(30, 60, n),  # P_air
            rng.uniform(62, 70, n),  # T_out
            rng.uniform(2, 40, n),  # H2 flow
            rng.uniform(10, 200, n),  # air flow
        ]
    ).astype(np.float64)
    y_raw = rng.uniform(3.0, 4.5, (n, 1))
    return x_raw, y_raw


def _torch_weights_to_pytree(dnn):
    """Copy the torch DNN's Linear weights into our MLPParams layout
    (torch stores (out, in); ours is (in, out))."""
    import jax.numpy as jnp

    def lin(layer):
        return {
            "w": jnp.asarray(layer.weight.detach().numpy().T),
            "b": jnp.asarray(layer.bias.detach().numpy()),
        }

    hidden = [
        lin(getattr(dnn.layers, f"layer_{i}")) for i in range(dnn.depth - 1)
    ]
    mean = lin(dnn.predict)
    # var_layers Sequential: [Linear, Tanh, Dropout, Linear, Tanh, Linear]
    var = [lin(dnn.var_layers[0]), lin(dnn.var_layers[3]), lin(dnn.var_layers[5])]
    return {"hidden": hidden, "mean": mean, "var": var}


@pytest.fixture()
def pair(ref01):
    """(reference PINN, our params, shared data/scalers) — fresh per test;
    p=0 so both frameworks are dropout-free and fully deterministic."""
    from sklearn.preprocessing import MinMaxScaler

    import jax.numpy as jnp

    from pinnfc_tpu.data.scaling import AffineScaler
    from pinnfc_tpu.models.pinn import LAMBDA_INIT

    x_raw, y_raw = _tiny_raw()
    xs = MinMaxScaler((-1, 1)).fit(x_raw)
    ys = MinMaxScaler((-1, 1)).fit(y_raw)
    X = torch.tensor(xs.transform(x_raw), dtype=torch.float32)
    u = torch.tensor(ys.transform(y_raw), dtype=torch.float32)

    torch.manual_seed(0)
    pinn = ref01.PhysicsInformedNN(
        X, u, [8, 16, 16, 1], xs, ys, p=0.0, logvar=True
    )

    params = {"mlp": _torch_weights_to_pytree(pinn.dnn)}
    for name, val in LAMBDA_INIT.items():
        params[name] = jnp.asarray(val)

    scaler_x = AffineScaler.fit(x_raw)
    scaler_y = AffineScaler.fit(y_raw)
    x_norm = jnp.asarray(xs.transform(x_raw), jnp.float32)
    y_norm = jnp.asarray(ys.transform(y_raw), jnp.float32)
    return pinn, params, (x_norm, y_norm, scaler_x, scaler_y)


def _np(t):
    return t.detach().cpu().numpy()


class TestForwardParity:
    @CPU_ONLY
    def test_net_u_eval(self, pair):
        from pinnfc_tpu.models.mlp import mlp_forward

        pinn, params, (x, _, _, _) = pair
        pinn.dnn.eval()
        u_ref, lv_ref = pinn.net_u(pinn.x)
        u_jnp, lv_jnp = mlp_forward(params["mlp"], x, train=False)
        np.testing.assert_allclose(np.asarray(u_jnp), _np(u_ref), atol=2e-6)
        np.testing.assert_allclose(np.asarray(lv_jnp), _np(lv_ref), atol=2e-5)

    @CPU_ONLY
    def test_aleatoric_loss(self, pair):
        from pinnfc_tpu.models.mlp import aleatoric_loss, mlp_forward

        pinn, params, (x, y, _, _) = pair
        pinn.dnn.eval()
        u_ref, lv_ref = pinn.net_u(pinn.x)
        loss_ref = pinn.aleatoric_loss(pinn.u, u_ref, lv_ref).item()
        u_j, lv_j = mlp_forward(params["mlp"], x, train=False)
        loss_jnp = float(aleatoric_loss(y, u_j, lv_j))
        np.testing.assert_allclose(loss_jnp, loss_ref, rtol=1e-5)


class TestResidualParity:
    def test_net_f_V(self, pair):
        from pinnfc_tpu.models.mlp import mlp_forward
        from pinnfc_tpu.physics.voltage import voltage_residual

        pinn, params, (x, _, sx, sy) = pair
        pinn.dnn.eval()
        ref = pinn.net_f_V(pinn.X, pinn.x_scal)
        u_pred, _ = mlp_forward(params["mlp"], x, train=False)
        out = voltage_residual(params["lam_v"], x, u_pred, sx, sy)
        # (f, V_act, V_ohmic, V_conc, E_nerst, V_out_est*5, i, il, V_out*5)
        np.testing.assert_allclose(np.asarray(out.f), _np(ref[0]), atol=3e-5)
        np.testing.assert_allclose(np.asarray(out.v_act), _np(ref[1]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.v_ohmic), _np(ref[2]), atol=2e-6)
        np.testing.assert_allclose(np.asarray(out.v_conc), _np(ref[3]), atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.e_nernst), _np(ref[4]), atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(out.v_out_est_stack), _np(ref[5]), atol=1e-4
        )
        np.testing.assert_allclose(np.asarray(out.i), _np(ref[6]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(out.v_out_stack), _np(ref[8]), atol=1e-5
        )

    def test_net_f_T_simple(self, pair):
        from pinnfc_tpu.physics.thermal import thermal_residual_simple

        pinn, params, (x, _, sx, _) = pair
        pinn.dnn.eval()
        ref = pinn.net_f_T_simple(pinn.X, pinn.x_scal)
        out = thermal_residual_simple(params["lam_t"], x, sx)
        np.testing.assert_allclose(np.asarray(out.f), _np(ref[0]), atol=2e-3)
        np.testing.assert_allclose(np.asarray(out.t_pred), _np(ref[1]), atol=2e-3)

    def test_net_f_H(self, pair):
        from pinnfc_tpu.physics.hydrogen import hydrogen_residual

        pinn, params, (x, _, sx, _) = pair
        ref = pinn.net_f_H(pinn.X, pinn.x_scal)
        out = hydrogen_residual(params["lam_h"], x, sx)
        np.testing.assert_allclose(np.asarray(out.f), _np(ref[0]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(out[1]), _np(ref[1]), atol=1e-3)
        np.testing.assert_allclose(np.asarray(out[2]), _np(ref[2]), atol=1e-4)

    def test_net_f_O(self, pair):
        from pinnfc_tpu.physics.oxygen import oxygen_residual

        pinn, params, (x, _, sx, _) = pair
        ref = pinn.net_f_O(pinn.X, pinn.x_scal)
        out = oxygen_residual(params["lam_o"], x, sx)
        np.testing.assert_allclose(np.asarray(out.f), _np(ref[0]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out[1]), _np(ref[1]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out[2]), _np(ref[2]), atol=1e-4)


class TestTrainingStepParity:
    @CPU_ONLY
    def test_train_dnn_steps_f64(self, pair):
        """3 reference Adam steps (p=0 → deterministic) must reproduce our
        scan-stage weights (train_dnn, 01:929-963).  Run in f64 on both
        sides: in f32, Adam's m̂/√v̂ normalization amplifies last-ulp
        gradient differences on near-zero-gradient weights to ~1e-3, which
        would mask (or fake) semantic differences."""
        import jax

        from pinnfc_tpu.training.stages import train_dnn_stage

        pinn, params, (x, y, _, _) = pair
        pinn.dnn.double()
        pinn.x = pinn.x.detach().double().requires_grad_(True)
        pinn.u = pinn.u.double()
        pinn.train_dnn(3)
        want = _torch_weights_to_pytree(pinn.dnn)

        jax.config.update("jax_enable_x64", True)
        try:
            import jax.numpy as jnp

            to64 = lambda t: jax.tree_util.tree_map(
                lambda a: jnp.asarray(a, jnp.float64), t
            )
            got = train_dnn_stage(
                to64(params["mlp"]),
                jnp.asarray(x, jnp.float64),
                jnp.asarray(y, jnp.float64),
                jax.random.PRNGKey(0),
                n_iter=3,
                dropout_p=0.0,
            ).params
            for ours, ref in (
                (got["hidden"][0], want["hidden"][0]),
                (got["hidden"][1], want["hidden"][1]),
                (got["mean"], want["mean"]),
                (got["var"][2], want["var"][2]),
            ):
                np.testing.assert_allclose(
                    np.asarray(ours["w"]), np.asarray(ref["w"]), atol=1e-9
                )
                np.testing.assert_allclose(
                    np.asarray(ours["b"]), np.asarray(ref["b"]), atol=1e-9
                )
        finally:
            jax.config.update("jax_enable_x64", False)

    @pytest.mark.parametrize("dnn_para", [False, True])
    def test_train_lambda_steps(self, pair, dnn_para):
        """5 reference λ-steps (eval-mode DNN) vs our λ scan stage
        (train_lambda, 01:966-1058), both loss modes."""
        from pinnfc_tpu.models.mlp import mlp_forward
        from pinnfc_tpu.training.stages import train_lambda_v_stage

        pinn, params, (x, y, sx, sy) = pair
        pinn.train_lambda(5, dnn_para=dnn_para)
        lam_ref = np.array(
            [
                pinn.lambda_1.item(),
                pinn.lambda_2.item(),
                pinn.lambda_3.item(),
                pinn.lambda_4.item(),
            ]
        )
        u_pred, _ = mlp_forward(params["mlp"], x, train=False)
        got = train_lambda_v_stage(
            params["lam_v"], x, y, u_pred, sx, sy, n_iter=5, dnn_para=dnn_para
        ).params
        np.testing.assert_allclose(np.asarray(got), lam_ref, rtol=2e-4, atol=1e-8)


class TestResidualTrainerParity:
    @pytest.mark.parametrize(
        "group,method,lr",
        [("lam_t", "train_thermal", 1.0), ("lam_h", "train_hydrogen", 0.1),
         ("lam_o", "train_oxygen", 1e-2)],
    )
    def test_residual_stage_trajectories(self, pair, group, method, lr):
        """5 reference Adam steps of the thermal/hydrogen/oxygen trainers
        (01:1060-1399) vs our generic λ scan stage."""
        from pinnfc_tpu.training.stages import train_residual_stage

        pinn, params, (x, _, sx, _) = pair
        getattr(pinn, method)(5)
        names = {
            "lam_t": ["lambda_T1", "lambda_T2", "lambda_T3", "lambda_T4", "lambda_T5"],
            "lam_h": ["lambda_H1", "lambda_H2", "lambda_H3", "lambda_H4"],
            "lam_o": ["lambda_O1", "lambda_O2", "lambda_O3", "lambda_O4"],
        }[group]
        lam_ref = np.array([getattr(pinn, n).item() for n in names])
        gamma = 0.8 if group == "lam_t" else 0.9  # 01:1102, 01:1195, 01:1348
        got = train_residual_stage(
            params[group], x, sx, group, n_iter=5, lr=lr, lr_gamma=gamma
        ).params
        np.testing.assert_allclose(np.asarray(got), lam_ref, rtol=5e-4, atol=1e-6)


class TestMCSamplesParity:
    @CPU_ONLY
    def test_phase_semantics_deterministic(self, pair):
        """dropout=0 removes the stochastic part; the two-phase structure
        (pred_mean from eval phase 01:1480, aleatoric from the override
        phase 01:1483) must match exactly."""
        import jax

        from pinnfc_tpu.uq.mc_dropout import mc_dropout_samples

        pinn, params, (x, _, _, _) = pair
        ref01_mod = sys.modules["ref01_golden"]
        pm_ref, au_ref, eu_ref = ref01_mod.get_MC_samples(
            pinn, pinn.X, pinn.x_scal, mc_times=4, dropout=0.0
        )
        mc = mc_dropout_samples(
            params["mlp"], x, jax.random.PRNGKey(0), mc_times=4, dropout=0.0, chunk=2
        )
        np.testing.assert_allclose(np.asarray(mc.pred_mean), pm_ref, atol=2e-6)
        np.testing.assert_allclose(np.asarray(mc.aleatoric_std), au_ref, atol=2e-6)
        np.testing.assert_allclose(np.asarray(mc.epistemic_std), eu_ref, atol=2e-6)
        assert float(np.max(np.asarray(mc.epistemic_std))) < 1e-6

    def test_epistemic_statistics_with_dropout(self, pair):
        """dropout=0.3: different RNG streams, but the per-row epistemic std
        must agree in distribution (the MC estimator targets the same
        quantity; mc=600 bounds the estimator noise to a few %)."""
        import jax

        from pinnfc_tpu.uq.mc_dropout import mc_dropout_samples

        pinn, params, (x, _, _, _) = pair
        ref01_mod = sys.modules["ref01_golden"]
        torch.manual_seed(0)
        _, _, eu_ref = ref01_mod.get_MC_samples(
            pinn, pinn.X, pinn.x_scal, mc_times=600, dropout=0.3
        )
        mc = mc_dropout_samples(
            params["mlp"], x, jax.random.PRNGKey(7), mc_times=600, dropout=0.3,
            chunk=100,
        )
        ours = np.asarray(mc.epistemic_std)
        # mean epistemic level within 10%, per-row correlation strong
        assert np.mean(ours) == pytest.approx(np.mean(eu_ref), rel=0.10)
        corr = np.corrcoef(ours, eu_ref)[0, 1]
        assert corr > 0.9


class TestPrintedMetricBlockParity:
    """VERDICT r2 #1: the printed metric block must come from the FULL Euler
    ``net_f_T`` (01:1670, smoothed at 01:1776-1782), not the simple thermal
    model that feeds export column 14 — golden vs the reference's ACTUAL
    ``plot_model_results_detailed_split`` on shared weights/data."""

    def _build(self, ref01, n=256):
        """Shared-weight pair on n rows ≥ the smoothing window (100) so the
        np.convolve 'same' branch is actually exercised (01:1777)."""
        from sklearn.preprocessing import MinMaxScaler

        import jax.numpy as jnp

        from pinnfc_tpu.data.scaling import AffineScaler
        from pinnfc_tpu.models.pinn import LAMBDA_INIT

        x_raw, y_raw = _tiny_raw(n=n, seed=3)
        xs = MinMaxScaler((-1, 1)).fit(x_raw)
        ys = MinMaxScaler((-1, 1)).fit(y_raw)
        X = torch.tensor(xs.transform(x_raw), dtype=torch.float32)
        u = torch.tensor(ys.transform(y_raw), dtype=torch.float32)
        torch.manual_seed(0)
        pinn = ref01.PhysicsInformedNN(
            X, u, [8, 16, 16, 1], xs, ys, p=0.0, logvar=True
        )
        params = {"mlp": _torch_weights_to_pytree(pinn.dnn)}
        for name, val in LAMBDA_INIT.items():
            params[name] = jnp.asarray(val)
        return pinn, params, X, u, xs, ys, x_raw, y_raw

    def test_full_metric_dict_golden(self, ref01):
        import matplotlib.pyplot as plt

        import jax.numpy as jnp
        import numpy as np

        from pinnfc_tpu.data.combine import DataInfo, FuelCellDataset
        from pinnfc_tpu.data.scaling import AffineScaler
        from pinnfc_tpu.pipeline import evaluate_voltage_metrics

        pinn, params, X, u, xs, ys, x_raw, y_raw = self._build(ref01)
        n = len(x_raw)

        dataset_ref = (X, u, X, u, xs, ys, {})
        ref_metrics = ref01.plot_model_results_detailed_split(
            pinn, dataset_ref, data_info={}, windows=100
        )
        plt.close("all")

        ds = FuelCellDataset(
            x_train=jnp.asarray(xs.transform(x_raw), jnp.float32),
            y_train=jnp.asarray(ys.transform(y_raw), jnp.float32),
            x_test=jnp.asarray(xs.transform(x_raw), jnp.float32),
            y_test=jnp.asarray(ys.transform(y_raw), jnp.float32),
            scaler_x=AffineScaler.fit(x_raw),
            scaler_y=AffineScaler.fit(y_raw),
            info=DataInfo(
                boundary_lines=[n],
                segment_labels=[],
                normal_samples=n,
                fault_samples=0,
                train_indices=np.arange(n),
            ),
        )
        ours = evaluate_voltage_metrics(params, ds)

        # the reference function's RETURNED dict (01:1820-1828)
        for key, tol in [
            ("voltage_mae", 3e-5), ("voltage_rmse", 3e-5), ("voltage_r2", 1e-4),
            ("physics_v_mae", 1e-4), ("temp_mae_smooth", 5e-4),
            ("hydrogen_mae", 1e-4), ("oxygen_mae", 1e-4),
        ]:
            assert ours[key] == pytest.approx(
                float(ref_metrics[key]), rel=tol, abs=tol
            ), key

        # the PRINTED extras (01:1786-1816), recomputed from the actual
        # reference model methods on the same inputs
        f_T, _, _ = pinn.net_f_T(X, xs)
        f_T = f_T.detach().cpu().numpy().flatten()
        f_T_smooth = np.convolve(f_T, np.ones(100) / 100, mode="same")
        f_H = pinn.net_f_H(X, xs)[0].detach().cpu().numpy().flatten()
        f_O, a_O, t_O, *_ = pinn.net_f_O(X, xs)
        f_O = f_O.detach().cpu().numpy().flatten()
        _, a_H, t_H, *_ = pinn.net_f_H(X, xs)
        want = {
            "temp_mae": np.mean(np.abs(f_T)),
            "temp_rmse": np.sqrt(np.mean(f_T**2)),
            "temp_rmse_smooth": np.sqrt(np.mean(f_T_smooth**2)),
            "hydrogen_rmse": np.sqrt(np.mean(f_H**2)),
            "oxygen_rmse": np.sqrt(np.mean(f_O**2)),
            "ratio_h_target_min": t_H.detach().numpy().min(),
            "ratio_h_target_max": t_H.detach().numpy().max(),
            "ratio_o_target_min": t_O.detach().numpy().min(),
            "ratio_o_target_max": t_O.detach().numpy().max(),
        }
        for key, val in want.items():
            assert ours[key] == pytest.approx(float(val), rel=5e-4, abs=5e-4), key

    def test_euler_not_simple_source(self, ref01):
        """The wired-in temperature statistic must track net_f_T (Euler), and
        genuinely differ from the simple-model statistic on the same data —
        guarding against a silent re-wire back to column 14's source."""
        import numpy as np

        pinn, params, X, u, xs, ys, x_raw, y_raw = self._build(ref01, n=128)
        f_T = pinn.net_f_T(X, xs)[0].detach().numpy().flatten()
        f_T_simple = pinn.net_f_T_simple(X, xs)[0].detach().numpy().flatten()
        assert abs(np.mean(np.abs(f_T)) - np.mean(np.abs(f_T_simple))) > 1e-3


class TestFullPipelineArtifactGolden:
    """VERDICT r2 #2: whole-artifact composition parity.  Train BOTH
    frameworks through a complete miniature schedule (every stage of the
    reference main, 01:2144-2153, few steps each, p=0) on a shared tiny
    campaign, then diff the full exported 22-column comprehensive_results
    matrix (01:1877-2010 / our pipeline.export) — catching any
    composition-level drift the per-stage golden tests cannot."""

    @CPU_ONLY
    def test_22_column_matrix_golden(self, ref01):
        """Both sides run in f32 — the reference's own precision, and its
        ceiling: ``net_f_V`` hard-casts the DNN input to float32 (01:725),
        so an f64 reference run is structurally impossible (an f64 DNN
        errors out inside every λ stage).  Measured f32 floor on this
        problem: 18/22 columns ≤ 3e-6 relative; the four columns that ride
        the DNN weight trajectory (9/10/12/13) sit at 3-10% because Adam's
        m̂/√v̂ normalization amplifies last-ulp f32 gradient differences on
        near-zero-gradient weights to ±lr per step (same effect documented
        at test_train_dnn_steps_f64, which pins those steps EXACTLY in
        f64).  Tolerances: 1e-5·scale for the tight class, 0.2·scale for
        the DNN class — composition drift (wrong stage order/wiring/export
        column) is O(1·scale) and cannot hide under either."""
        import jax
        import jax.numpy as jnp

        from pinnfc_tpu.config import StageConfig
        from pinnfc_tpu.data.combine import DataInfo, FuelCellDataset
        from pinnfc_tpu.data.scaling import AffineScaler
        from pinnfc_tpu.models.pinn import LAMBDA_INIT
        from pinnfc_tpu.pipeline.export import build_comprehensive_results
        from pinnfc_tpu.training.stages import run_schedule

        # --- shared tiny campaign (normal + 2 fault segments) ---
        rng = np.random.RandomState(11)
        x_n = rng.uniform(0, 1, (160, 8)) * [300, 0.4, 4, 30, 30, 8, 38, 190] + [
            100, 0.1, 60, 40, 30, 62, 2, 10,
        ]
        y_n = rng.uniform(3.0, 4.5, (160, 1))
        faults = [
            (x_n[:50] * 1.08, y_n[:50] * 0.9, "水淹故障(108A)"),
            (x_n[:30] * 0.95, y_n[:30] * 0.85, "膜干故障(270A)"),
        ]

        # --- reference side: complete miniature schedule + exporter ---
        Dataset = ref01.combine_and_normalize_datasets(
            normal_data=(x_n, y_n), fault_data_list=faults,
            training_rate=1, noise_config=None, seed=42,
        )
        x_tr, y_tr, x_te, y_te, sx_ref, sy_ref, info_ref = Dataset
        torch.manual_seed(0)
        pinn = ref01.PhysicsInformedNN(
            x_tr, y_tr, [8, 16, 16, 1], sx_ref, sy_ref, p=0.0, logvar=True
        )
        params0 = {"mlp": _torch_weights_to_pytree(pinn.dnn)}
        for name, val in LAMBDA_INIT.items():
            params0[name] = jnp.asarray(val)

        pinn.train_dnn(3)
        pinn.train_lambda(3, dnn_para=False)
        pinn.train_lambda(3, dnn_para=True)
        pinn.train_dnn(2)
        pinn.train_thermal(3)
        pinn.train_hydrogen(3)
        pinn.train_oxygen(3)
        ref_arr = ref01.create_comprehensive_results_array_v2(
            pinn, Dataset, mc_times=4, dropout=0.0
        )

        # --- our side: identical init weights, data, schedule ---
        ds = FuelCellDataset(
            x_train=jnp.asarray(x_tr.numpy()),
            y_train=jnp.asarray(y_tr.numpy()),
            x_test=jnp.asarray(x_te.numpy()),
            y_test=jnp.asarray(y_te.numpy()),
            scaler_x=AffineScaler.fit(x_n),
            scaler_y=AffineScaler.fit(y_n),
            info=DataInfo(
                boundary_lines=list(info_ref["boundary_lines"]),
                segment_labels=["水淹故障(108A)", "膜干故障(270A)"],
                normal_samples=info_ref["normal_samples"],
                fault_samples=info_ref["fault_samples"],
                train_indices=np.arange(160),
            ),
        )
        schedule = (
            StageConfig("dnn", 3, lr=0.01, lr_gamma=0.8),
            StageConfig("lambda_v", 3, lr=1e-3, lr_gamma=0.8, dnn_para=False),
            StageConfig("lambda_v", 3, lr=1e-3, lr_gamma=0.8, dnn_para=True),
            StageConfig("dnn", 2, lr=0.01, lr_gamma=0.8),
            StageConfig("thermal", 3, lr=1.0, lr_gamma=0.8),
            StageConfig("hydrogen", 3, lr=1e-1, lr_gamma=0.9),
            StageConfig("oxygen", 3, lr=1e-2, lr_gamma=0.9),
        )
        params, _ = run_schedule(
            params0, ds.x_train, ds.y_train, ds.scaler_x, ds.scaler_y,
            schedule=schedule, rng=jax.random.PRNGKey(0), dropout_p=0.0,
        )
        results = build_comprehensive_results(
            params, ds, rng=jax.random.PRNGKey(1), mc_times=4, dropout=0.0,
            smooth_window=200,
        )
        ours = np.asarray(results.array, np.float64)

        assert ours.shape == ref_arr.shape == (240, 22)
        scale = np.maximum(np.abs(ref_arr).max(axis=0), 1e-3)
        DNN_TRAJECTORY_COLS = {9, 10, 12, 13}  # pred_mean, ale, residual, f_V
        for col in range(22):
            tol = 0.2 if col in DNN_TRAJECTORY_COLS else 1e-5
            np.testing.assert_allclose(
                ours[:, col], ref_arr[:, col], atol=tol * scale[col],
                err_msg=f"column {col} diverged",
            )
        # the DNN-trajectory columns must still AGREE as series, not merely
        # fit under a loose band (after only 5 steps the net is barely
        # trained, so f32 Adam noise caps the correlation well below 1)
        corr = np.corrcoef(ours[:, 9], ref_arr[:, 9])[0, 1]
        assert corr > 0.9
