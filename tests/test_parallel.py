"""Mesh / data-parallel / ensemble tests on the 8-device CPU simulation
(conftest forces XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnfc_tpu.models.pinn import init_pinn
from pinnfc_tpu.parallel import (
    full_train_step,
    init_dp_state,
    init_ensemble,
    make_dp_optimizers,
    make_mesh,
    mc_dropout_sharded,
    pad_to_multiple,
    replicate,
    shard_batch,
    train_dnn_ensemble,
)


@pytest.fixture(scope="module")
def mesh8():
    if jax.device_count() < 8:
        # PINNFC_TEST_TPU=1 runs on the single real chip — multi-device
        # coverage comes from the CPU-simulation run (conftest default)
        pytest.skip("needs 8 devices (CPU simulation run)")
    return make_mesh(8)


@pytest.fixture(scope="module")
def dp_data(tiny_dataset):
    d = tiny_dataset
    n = (d.x_train.shape[0] // 8) * 8
    return d.x_train[:n], d.y_train[:n], d.scaler_x, d.scaler_y


class TestMesh:
    def test_make_mesh(self, mesh8):
        assert mesh8.shape == {"data": 8}

    def test_too_many_devices_raises(self):
        with pytest.raises(ValueError):
            make_mesh(1000)

    def test_pad_to_multiple(self):
        a = np.arange(10).reshape(10, 1)
        padded, n = pad_to_multiple(a, 8)
        assert padded.shape == (16, 1) and n == 10
        assert (padded[10:] == a[-1]).all()


class TestDataParallel:
    def test_sharded_step_matches_single_device(self, mesh8, dp_data):
        """The data-parallel step must be numerically identical to the
        unsharded step (XLA psum of per-shard grads == full-batch grad)."""
        x, y, sx, sy = dp_data
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        opts = make_dp_optimizers()
        key = jax.random.PRNGKey(42)

        state0 = init_dp_state(params, opts)
        step = jax.jit(
            lambda s, x, y, k: full_train_step(s, x, y, k, sx, sy, opts)
        )
        ref_state, ref_losses = step(state0, x, y, key)

        xs = shard_batch(mesh8, x)
        ys = shard_batch(mesh8, y)
        sh_state = replicate(mesh8, state0)
        dp_state, dp_losses = step(sh_state, xs, ys, key)

        for g in ref_losses:
            np.testing.assert_allclose(
                float(ref_losses[g]), float(dp_losses[g]), rtol=1e-5
            )
        np.testing.assert_allclose(
            np.asarray(ref_state.params["lam_t"]),
            np.asarray(dp_state.params["lam_t"]),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(ref_state.params["mlp"]["mean"]["b"]),
            np.asarray(dp_state.params["mlp"]["mean"]["b"]),
            rtol=1e-4, atol=1e-7,
        )

    def test_losses_finite_and_clamped(self, mesh8, dp_data):
        x, y, sx, sy = dp_data
        from pinnfc_tpu.models.pinn import LAMBDA_BOUNDS

        params = init_pinn(jax.random.PRNGKey(1), (8, 16, 1))
        opts = make_dp_optimizers()
        state = replicate(mesh8, init_dp_state(params, opts))
        step = jax.jit(lambda s, x, y, k: full_train_step(s, x, y, k, sx, sy, opts))
        state, losses = step(
            state, shard_batch(mesh8, x), shard_batch(mesh8, y), jax.random.PRNGKey(2)
        )
        assert all(np.isfinite(float(v)) for v in losses.values())
        for g, (lo, hi) in LAMBDA_BOUNDS.items():
            lam = np.asarray(state.params[g])
            assert (lam >= lo - 1e-6).all() and (lam <= hi + 1e-6).all()


class TestEnsemble:
    def test_ensemble_trains_independently(self, mesh8, dp_data):
        x, y, *_ = dp_data
        ens = init_ensemble(jax.random.PRNGKey(0), 8, layers=(8, 16, 1))
        ens2, losses = train_dnn_ensemble(
            ens, x, y, jax.random.PRNGKey(1), n_iter=30, mesh=mesh8
        )
        assert losses.shape == (8, 30)
        # members differ (different seeds) and all improved
        assert float(np.std(np.asarray(losses[:, -1]))) > 0
        assert (np.asarray(losses[:, -1]) <= np.asarray(losses[:, 0])).all()

    def test_ensemble_2d_mesh_matches_unsharded(self, dp_data):
        """('model','data') hybrid: members over one axis, rows over the
        other — trajectory equals the unsharded ensemble to f32 noise."""
        from pinnfc_tpu.parallel import make_mesh, train_dnn_ensemble_2d

        if jax.device_count() < 8:
            pytest.skip("needs 8 devices (CPU simulation run)")
        x, y, *_ = dp_data
        mesh2d = make_mesh(8, axis_names=("model", "data"), shape=(4, 2))
        ens = init_ensemble(jax.random.PRNGKey(0), 4, layers=(8, 16, 1))
        ens_ref, losses_ref = train_dnn_ensemble(
            ens, x, y, jax.random.PRNGKey(1), n_iter=25
        )
        ens_2d, losses_2d = train_dnn_ensemble_2d(
            ens, x, y, jax.random.PRNGKey(1), n_iter=25, mesh=mesh2d
        )
        np.testing.assert_allclose(
            np.asarray(losses_2d), np.asarray(losses_ref), rtol=2e-4, atol=1e-5
        )
        for a, b in zip(
            jax.tree_util.tree_leaves(ens_2d["mlp"]),
            jax.tree_util.tree_leaves(ens_ref["mlp"]),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5
            )

    def test_ensemble_predict_shape(self, dp_data):
        x, *_ = dp_data
        from pinnfc_tpu.parallel import ensemble_predict

        ens = init_ensemble(jax.random.PRNGKey(0), 4, layers=(8, 16, 1))
        preds = ensemble_predict(ens, x[:32])
        assert preds.shape == (4, 32, 1)


class TestShardedMC:
    def test_sharded_mc_matches_unsharded(self, mesh8, dp_data):
        from pinnfc_tpu.models.mlp import init_mlp
        from pinnfc_tpu.uq import mc_dropout_samples

        x, *_ = dp_data
        params = init_mlp(jax.random.PRNGKey(0), (8, 16, 1))
        rng = jax.random.PRNGKey(5)
        a = mc_dropout_samples(params, x, rng, mc_times=32, chunk=16)
        b = mc_dropout_sharded(params, x, rng, mesh8, mc_times=32, chunk=16)
        np.testing.assert_allclose(a.pred_mean, b.pred_mean, rtol=1e-5)
        np.testing.assert_allclose(a.epistemic_std, b.epistemic_std, rtol=1e-3, atol=1e-6)


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        fn, args = ge.entry()
        out = jax.jit(fn)(*args)
        jax.block_until_ready(out)
        assert out[0].shape == (1024, 1)

    def test_dryrun_multichip(self):
        import sys
        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)


class TestDataParallelSchedule:
    def test_run_schedule_sharded_matches_unsharded(self, mesh8, dp_data):
        """The staged schedule under row sharding reproduces the single-device
        trajectory (divisible N → exact mean-loss gradients + psum)."""
        from pinnfc_tpu.config import StageConfig
        from pinnfc_tpu.training import run_schedule

        x, y, sx, sy = dp_data
        sched = (
            StageConfig("dnn", 25, lr=0.01),
            StageConfig("thermal", 25, lr=1.0),
            StageConfig("hydrogen", 25, lr=0.1, lr_gamma=0.9),
        )
        p0 = init_pinn(jax.random.PRNGKey(3), (8, 16, 1))
        key = jax.random.PRNGKey(9)
        p_ref, log_ref = run_schedule(p0, x, y, sx, sy, schedule=sched, rng=key)
        p_dp, log_dp = run_schedule(
            p0, x, y, sx, sy, schedule=sched, rng=key, mesh=mesh8
        )
        np.testing.assert_allclose(
            np.asarray(p_ref["lam_t"]), np.asarray(p_dp["lam_t"]), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(p_ref["mlp"]["mean"]["b"]),
            np.asarray(p_dp["mlp"]["mean"]["b"]),
            rtol=1e-4, atol=1e-7,
        )
        for (n1, l1), (n2, l2) in zip(log_ref.stages, log_dp.stages):
            np.testing.assert_allclose(
                np.asarray(l1), np.asarray(l2), rtol=1e-4, atol=1e-6
            )


class TestFullPinnEnsemble:
    def test_full_schedule_all_members(self, dp_data):
        """Every member runs the whole staged schedule; λ's stay within
        bounds and differ across seeds only in MLP-dependent stages."""
        from pinnfc_tpu.config import StageConfig
        from pinnfc_tpu.models.pinn import LAMBDA_BOUNDS
        from pinnfc_tpu.parallel import init_ensemble, train_pinn_ensemble

        x, y, sx, sy = dp_data
        sched = (
            StageConfig("dnn", 20, lr=0.01),
            StageConfig("lambda_v", 15, lr=1e-3, dnn_para=True),
            StageConfig("thermal", 15, lr=1.0),
            StageConfig("hydrogen", 15, lr=0.1, lr_gamma=0.9),
            StageConfig("oxygen", 15, lr=0.01, lr_gamma=0.9),
        )
        ens = init_ensemble(jax.random.PRNGKey(0), 4, layers=(8, 16, 1))
        params, losses = train_pinn_ensemble(
            ens, x, y, jax.random.PRNGKey(1), sx, sy, schedule=sched
        )
        assert set(losses) == {"0:dnn", "1:lambda_v", "2:thermal",
                               "3:hydrogen", "4:oxygen"}
        for name, l in losses.items():
            assert l.shape[0] == 4
            assert np.isfinite(np.asarray(l)).all(), name
        for g, (lo, hi) in LAMBDA_BOUNDS.items():
            lam = np.asarray(params[g])
            assert lam.shape[0] == 4
            assert (lam >= lo - 1e-6).all() and (lam <= hi + 1e-6).all()
        # thermal stage is MLP-independent → members identical; dnn losses differ
        np.testing.assert_allclose(
            np.asarray(params["lam_t"][0]), np.asarray(params["lam_t"][1])
        )
        assert float(np.std(np.asarray(losses["0:dnn"][:, -1]))) > 0


class TestShardedDiagnosis:
    """VERDICT r2 #4: mesh-sharded GMM EM + Newton logreg vs the
    single-device fits (03:360-426 / 02:195-207 semantics)."""

    @pytest.fixture(scope="class")
    def blobs(self):
        rng = np.random.RandomState(0)
        centers = np.array(
            [[0, 0, 0, 0], [4, 0, 0, 0], [0, 4, 0, 0], [0, 0, 4, 0]], float
        )
        # N = 501: deliberately NOT divisible by 8 so the zero-weight row
        # padding is on the tested path
        sizes = [126, 125, 125, 125]
        x = np.concatenate(
            [c + 0.4 * rng.randn(m, 4) for c, m in zip(centers, sizes)]
        ).astype(np.float32)
        y = np.concatenate([np.full(m, i) for i, m in enumerate(sizes)])
        return x, y.astype(np.int64)

    def test_gmm_dp_matches_single_device(self, mesh8, blobs):
        from pinnfc_tpu.diagnosis.gmm import gmm_fit, gmm_predict_proba
        from pinnfc_tpu.parallel.diagnosis import gmm_fit_dp

        x, _ = blobs
        key = jax.random.PRNGKey(3)
        single = gmm_fit(jnp.asarray(x), key, 4)
        dp = gmm_fit_dp(x, key, 4, mesh8)
        # same k-means init + same EM updates → same trajectory up to float
        # reduction order (per-device partials + psum)
        assert int(dp.n_iter) == int(single.n_iter)
        np.testing.assert_allclose(
            float(dp.lower_bound), float(single.lower_bound), rtol=1e-5
        )
        np.testing.assert_allclose(
            np.sort(np.asarray(dp.means), axis=0),
            np.sort(np.asarray(single.means), axis=0),
            atol=1e-4,
        )
        # posterior responsibilities agree on every sample
        r_single = np.asarray(gmm_predict_proba(single, jnp.asarray(x)))
        r_dp = np.asarray(gmm_predict_proba(dp, jnp.asarray(x)))
        assert (r_single.argmax(1) == r_dp.argmax(1)).mean() > 0.999

    def test_logreg_dp_matches_single_device(self, mesh8, blobs):
        from pinnfc_tpu.diagnosis.logreg import logreg_fit, logreg_predict
        from pinnfc_tpu.parallel.diagnosis import logreg_fit_dp

        x, y = blobs
        single = logreg_fit(jnp.asarray(x), jnp.asarray(y, jnp.int32), 4)
        dp = logreg_fit_dp(x, y, 4, mesh8)
        # Newton converges to the unique optimum of the identical objective
        np.testing.assert_allclose(
            np.asarray(dp.coef), np.asarray(single.coef), atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(dp.intercept), np.asarray(single.intercept), atol=5e-5
        )
        p_single = np.asarray(logreg_predict(single, jnp.asarray(x)))
        p_dp = np.asarray(logreg_predict(dp, jnp.asarray(x)))
        np.testing.assert_array_equal(p_single, p_dp)

    def test_mask_semantics_exact_single_device(self, blobs):
        """The mask IS the semantics (not an approximation): padded-masked
        fit on ONE device == unpadded fit from the same init, and a masked
        logreg == sklearn-objective fit on the unpadded rows."""
        from pinnfc_tpu.diagnosis.gmm import gmm_fit
        from pinnfc_tpu.diagnosis.kmeans import kmeans_fit
        from pinnfc_tpu.diagnosis.logreg import logreg_fit

        x, y = blobs
        key = jax.random.PRNGKey(3)
        km = kmeans_fit(jnp.asarray(x), key, 4)
        resp0 = jax.nn.one_hot(km.assignments, 4, dtype=jnp.float32)

        plain = gmm_fit(jnp.asarray(x), key, 4, init_resp=resp0)
        pad = 7
        x_pad = np.concatenate([x, np.zeros((pad, 4), np.float32)])
        resp0_pad = np.concatenate([np.asarray(resp0), np.zeros((pad, 4), np.float32)])
        mask = np.concatenate([np.ones(len(x), np.float32), np.zeros(pad, np.float32)])
        masked = gmm_fit(
            jnp.asarray(x_pad), key, 4,
            mask=jnp.asarray(mask), init_resp=jnp.asarray(resp0_pad),
        )
        np.testing.assert_allclose(
            float(masked.lower_bound), float(plain.lower_bound), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(masked.means), np.asarray(plain.means), atol=1e-5
        )

        l_plain = logreg_fit(jnp.asarray(x), jnp.asarray(y, jnp.int32), 4)
        y_pad = np.concatenate([y, np.zeros(pad, np.int64)])
        l_masked = logreg_fit(
            jnp.asarray(x_pad), jnp.asarray(y_pad, jnp.int32), 4,
            mask=jnp.asarray(mask),
        )
        np.testing.assert_allclose(
            np.asarray(l_masked.coef), np.asarray(l_plain.coef), atol=2e-5
        )

    def test_gmm_pipeline_mesh_parity(self, mesh8):
        """run_gmm_pipeline(mesh=...) reproduces the single-device pipeline
        on a realistic fake artifact (same accuracy/confusion)."""
        from pinnfc_tpu.diagnosis import run_gmm_pipeline

        rng = np.random.RandomState(5)
        n_normal, n_fault = 200, 30
        n = n_normal + 12 * n_fault
        arr = np.zeros((n, 22))
        from pinnfc_tpu.data.contract import INDEX

        for k in ("res", "pV", "pT", "pH", "pO"):
            arr[:, INDEX[k]] = 0.05 * rng.randn(n)
        lab = np.zeros(n)
        for k in range(12):
            seg = slice(n_normal + k * n_fault, n_normal + (k + 1) * n_fault)
            lab[seg] = k + 1
            arr[seg, INDEX[("pV", "pT", "pH", "pO")[k // 3]]] += np.linspace(
                0.5, 2.0, n_fault
            )
        arr[:, INDEX["label"]] = lab

        single = run_gmm_pipeline(arr)
        dp = run_gmm_pipeline(arr, mesh=mesh8)
        assert dp.accuracy == pytest.approx(single.accuracy, abs=0.02)
        assert (dp.y_pred == single.y_pred).mean() > 0.97


class TestChunkedScheduleOnMesh:
    def test_ckpt_every_composes_with_data_parallel(self, mesh8, tmp_path):
        """Mid-stage checkpointing and mesh sharding together (the
        `cli train --data-parallel --resume-dir --ckpt-every` combination):
        chunked-on-mesh == monolithic-on-mesh, and the snapshot restores."""
        from pinnfc_tpu.config import StageConfig
        from pinnfc_tpu.training.stages import run_schedule

        rng = np.random.RandomState(0)
        n = 160  # divisible by 8 → exact mesh parity
        x = jnp.asarray(rng.uniform(-1, 1, (n, 8)), jnp.float32)
        y = jnp.asarray(rng.uniform(-1, 1, (n, 1)), jnp.float32)
        from pinnfc_tpu.data.scaling import AffineScaler

        sx = AffineScaler.fit(rng.uniform(0, 1, (n, 8)))
        sy = AffineScaler.fit(rng.uniform(3, 5, (n, 1)))
        sched = (
            StageConfig("dnn", 9, lr=0.01),
            StageConfig("thermal", 7, lr=1.0),
        )
        p0 = init_pinn(jax.random.PRNGKey(1), (8, 16, 1))
        key = jax.random.PRNGKey(2)

        mono, _ = run_schedule(p0, x, y, sx, sy, schedule=sched, rng=key,
                               mesh=mesh8)
        ck = str(tmp_path / "meshck")
        chunked, _ = run_schedule(p0, x, y, sx, sy, schedule=sched, rng=key,
                                  mesh=mesh8, checkpoint_dir=ck, ckpt_every=4)
        for a, b in zip(jax.tree_util.tree_leaves(mono),
                        jax.tree_util.tree_leaves(chunked)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=1e-7)
        # the final snapshot marks the schedule complete; a rerun is a no-op
        rerun, log = run_schedule(p0, x, y, sx, sy, schedule=sched, rng=key,
                                  mesh=mesh8, checkpoint_dir=ck, ckpt_every=4)
        assert len(log.stages) == 0
        for a, b in zip(jax.tree_util.tree_leaves(chunked),
                        jax.tree_util.tree_leaves(rerun)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestShardedExport:
    def test_export_mesh_matches_single_device(self, mesh8, tiny_dataset):
        """The mesh-sharded export (rows padded to the axis multiple, MC on
        each shard, trimmed after) equals the single-device export exactly
        when dropout=0 (deterministic MC), including the padded-tail trim —
        tiny_dataset's N is not divisible by 8."""
        from pinnfc_tpu.pipeline.export import build_comprehensive_results

        import dataclasses

        d = tiny_dataset
        # force a non-divisible N so the padding/trim path is exercised
        d = dataclasses.replace(
            d, x_test=d.x_test[:-3], y_test=d.y_test[:-3]
        )
        assert d.x_test.shape[0] % 8 != 0
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        key = jax.random.PRNGKey(4)
        single = build_comprehensive_results(
            params, d, rng=key, mc_times=8, dropout=0.0
        )
        dp = build_comprehensive_results(
            params, d, rng=key, mc_times=8, dropout=0.0, mesh=mesh8
        )
        np.testing.assert_allclose(
            dp.array, single.array, rtol=1e-5, atol=1e-6
        )

    def test_explicit_pallas_with_mesh_rejected(self, mesh8, tiny_dataset):
        """sampler='pallas' is single-core; combining it with a mesh must
        error instead of silently dropping the requested sharding
        (advisor round-3)."""
        from pinnfc_tpu.pipeline.export import build_comprehensive_results

        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        with pytest.raises(ValueError, match="pallas"):
            build_comprehensive_results(
                params, tiny_dataset, mc_times=2, dropout=0.0,
                sampler="pallas", mesh=mesh8,
            )


class TestHloCollectiveGuards:
    """VERDICT r3 #6: guard the multi-chip programs against silent
    resharding.  Each jitted entry point is lowered on the 8-device mesh
    and its compiled HLO inspected: the DP property (per-device partial
    work + psum) shows up as all-reduce ops ONLY — an all-gather /
    all-to-all / collective-permute in any of these programs means a
    sharding annotation drifted and some axis is being replicated or
    reshuffled behind our back.  (This guard caught a real one: the GMM
    E-step's batched triangular_solve all-gathered the sample axis; the
    sklearn precision-Cholesky reformulation in diagnosis/gmm.py removed
    it.)"""

    @staticmethod
    def _collectives(compiled_text: str):
        import re

        return {
            k: len(re.findall(" " + k + r"\(", compiled_text))
            for k in (
                "all-reduce", "all-gather", "all-to-all",
                "collective-permute", "reduce-scatter",
            )
        }

    def _assert_psum_only(self, counts, expect_all_reduce):
        assert counts["all-gather"] == 0, counts
        assert counts["all-to-all"] == 0, counts
        assert counts["collective-permute"] == 0, counts
        assert counts["reduce-scatter"] == 0, counts
        assert counts["all-reduce"] == expect_all_reduce, counts

    def test_full_train_step_psum_only(self, mesh8, dp_data):
        """All five loss groups' grad reductions fuse into ONE tuple
        all-reduce — the combined step costs a single ICI round trip."""
        x, y, sx, sy = dp_data
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        opts = make_dp_optimizers()
        state = replicate(mesh8, init_dp_state(params, opts))
        step = jax.jit(lambda s, x, y, k: full_train_step(s, x, y, k, sx, sy, opts))
        txt = step.lower(
            state, shard_batch(mesh8, x), shard_batch(mesh8, y),
            jax.random.PRNGKey(1),
        ).compile().as_text()
        self._assert_psum_only(self._collectives(txt), expect_all_reduce=1)

    def test_gmm_fit_dp_psum_only(self, mesh8):
        """EM with rows sharded: the four sample-axis contractions (nk,
        means, covariances, mean log-likelihood) psum; nothing gathers."""
        from pinnfc_tpu.diagnosis.gmm import gmm_fit
        from pinnfc_tpu.parallel.diagnosis import _pad_rows, _shard_rows

        rng = np.random.RandomState(0)
        x = np.asarray(rng.randn(100, 4), np.float32)
        resp0 = np.zeros((100, 8), np.float32)
        resp0[np.arange(100), rng.randint(0, 8, 100)] = 1.0
        x_pad, mask = _pad_rows(x, 8)
        resp0_pad, _ = _pad_rows(resp0, 8)
        txt = gmm_fit.lower(
            _shard_rows(mesh8, x_pad, 2), jax.random.PRNGKey(0), 8,
            mask=_shard_rows(mesh8, mask, 1),
            init_resp=_shard_rows(mesh8, resp0_pad, 2),
        ).compile().as_text()
        self._assert_psum_only(self._collectives(txt), expect_all_reduce=4)

    def test_logreg_fit_dp_psum_only(self, mesh8):
        """Newton logistic regression with rows sharded: standardization
        moments, class counts, and the gradient/Hessian contractions psum;
        the (D+1)K solve stays replicated (tiny); nothing gathers."""
        from pinnfc_tpu.diagnosis.logreg import logreg_fit
        from pinnfc_tpu.parallel.diagnosis import _pad_rows, _shard_rows

        rng = np.random.RandomState(0)
        x = np.asarray(rng.randn(100, 4), np.float32)
        y = rng.randint(0, 4, 100).astype(np.int32)
        x_pad, mask = _pad_rows(x, 8)
        y_pad, _ = _pad_rows(y, 8)
        txt = logreg_fit.lower(
            _shard_rows(mesh8, x_pad, 2), _shard_rows(mesh8, y_pad, 1), 4,
            mask=_shard_rows(mesh8, mask, 1),
        ).compile().as_text()
        self._assert_psum_only(self._collectives(txt), expect_all_reduce=3)

    def test_sharded_mc_export_collective_free(self, mesh8):
        """The exporter's MC phase is row-independent — its program must
        contain NO collectives at all (each device finishes its shard and
        only the host gather moves data)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pinnfc_tpu.parallel.mesh import batch_sharding
        from pinnfc_tpu.uq.mc_dropout import _mc_dropout_jit

        rng = np.random.RandomState(0)
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        mlp = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(mesh8, P())),
            params["mlp"],
        )
        xs = jax.device_put(
            np.asarray(rng.randn(160, 8), np.float32), batch_sharding(mesh8)
        )
        txt = _mc_dropout_jit.lower(
            mlp, xs, jax.random.PRNGKey(1), mc_times=8, dropout=0.4, chunk=4
        ).compile().as_text()
        self._assert_psum_only(self._collectives(txt), expect_all_reduce=0)


class TestShardedExplainability:
    """Round-4: the explainability surfaces shard over the mesh 'data' axis
    like every other device program.  Saliency Jacobian rows and the
    counterfactual per-row Adam solves are row-independent, so the sharded
    run must reproduce the single-device result (up to the batch-mean's
    1/N_pad rescale rounding in the solver) and the compiled programs must
    stay collective-free (the primal scalar reductions are dead code once
    only the gradients are returned)."""

    @staticmethod
    def _setup(n=52):  # NOT divisible by 8 — exercises the pad/trim path
        from pinnfc_tpu.data.scaling import AffineScaler
        from pinnfc_tpu.models.mlp import init_mlp

        rs = np.random.RandomState(0)
        lo = np.array([50, 1.0, 20, 100, 100, 30, 5, 50], float)
        hi = np.array([800, 3.5, 35, 160, 140, 75, 40, 400], float)
        x_phys = (lo + (hi - lo) * rs.rand(n, 8)).astype(np.float32)
        y_phys = (300 + 60 * rs.rand(n, 1)).astype(np.float32)
        scaler_x = AffineScaler.fit(x_phys)
        scaler_y = AffineScaler.fit(y_phys)
        params = init_mlp(jax.random.PRNGKey(3), (8, 16, 1))
        return params, x_phys, y_phys, scaler_x, scaler_y

    def test_saliency_mesh_parity(self, mesh8):
        from pinnfc_tpu.uq import input_saliency

        params, x, _y, sx, sy = self._setup()
        a = input_saliency(params, x, sx, sy)
        b = input_saliency(params, x, sx, sy, mesh=mesh8)
        for f in ("jac_norm", "jac_phys", "jac_range", "sigma_jac_range"):
            np.testing.assert_allclose(
                getattr(b, f), getattr(a, f), rtol=0,
                atol=1e-6 * max(np.abs(getattr(a, f)).max(), 1.0),
                err_msg=f,
            )
        assert b.jac_norm.shape == (52, 8)

    def test_counterfactual_mesh_parity(self, mesh8):
        from pinnfc_tpu.uq import CounterfactualConfig, counterfactual_recovery

        params, x, _y, sx, sy = self._setup()
        rs = np.random.RandomState(1)
        v_thr = np.full(52, 330.0, np.float32)
        v_meas = (v_thr - 5.0 * rs.rand(52)).astype(np.float32)
        cfg = CounterfactualConfig(steps=60)
        a = counterfactual_recovery(params, x, v_thr, sx, sy,
                                    config=cfg, v_meas=v_meas)
        b = counterfactual_recovery(params, x, v_thr, sx, sy,
                                    config=cfg, v_meas=v_meas, mesh=mesh8)
        # the padded solve rescales every per-row gradient by
        # (1/N_pad)·N_pad instead of (1/N)·N — identical mathematics,
        # ~1 ulp/step of f32 rounding difference through 60 Adam steps
        np.testing.assert_allclose(b.delta_range, a.delta_range,
                                   rtol=0, atol=5e-4)
        np.testing.assert_allclose(b.v_after, a.v_after, rtol=0, atol=5e-3)
        np.testing.assert_array_equal(b.recovered.shape, (52,))

    def test_saliency_sharded_collective_free(self, mesh8):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pinnfc_tpu.parallel.mesh import batch_sharding
        from pinnfc_tpu.uq.saliency import _saliency_jit

        params, x, _y, sx, _sy = self._setup(n=64)
        mlp = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(mesh8, P())), params
        )
        xs = jax.device_put(
            np.asarray(sx.transform(x), np.float32), batch_sharding(mesh8)
        )
        txt = _saliency_jit.lower(mlp, xs).compile().as_text()
        TestHloCollectiveGuards()._assert_psum_only(
            TestHloCollectiveGuards._collectives(txt), expect_all_reduce=0
        )

    def test_counterfactual_sharded_collective_free(self, mesh8):
        from jax.sharding import NamedSharding, PartitionSpec as P

        from pinnfc_tpu.parallel.mesh import batch_sharding
        from pinnfc_tpu.uq.counterfactual import _recover_jit

        params, x, _y, sx, sy = self._setup(n=64)
        mlp = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(mesh8, P())), params
        )
        x0 = jax.device_put(
            np.asarray(sx.transform(x), np.float32), batch_sharding(mesh8)
        )
        tgt = jax.device_put(
            np.ones(64, np.float32),
            NamedSharding(mesh8, P("data")),
        )
        box = np.asarray(sx.transform(np.stack([
            np.asarray(sx.data_min, np.float32),
            np.asarray(sx.data_max, np.float32),
        ])), np.float32)
        txt = _recover_jit.lower(
            mlp, x0, tgt,
            jnp.float32(1.0), jnp.float32(0.0),
            jnp.ones(8, jnp.float32), jnp.asarray(box[0]), jnp.asarray(box[1]),
            jnp.float32(0.05), jnp.float32(0.05), jnp.float32(0.9),
            jnp.float32(0.999), jnp.float32(1e-8),
            steps=10, gain_mode=True,
        ).compile().as_text()
        TestHloCollectiveGuards()._assert_psum_only(
            TestHloCollectiveGuards._collectives(txt), expect_all_reduce=0
        )

    def test_identifiability_mesh_parity(self, mesh8):
        """The λ-identifiability Jacobians shard by row; pad rows are
        trimmed BEFORE the interval math, so the mesh report must equal
        the single-device one (same σ², dof, CIs) to f32 evaluation
        noise."""
        from pinnfc_tpu.models.pinn import init_pinn
        from pinnfc_tpu.uq import lambda_identifiability

        params, x, _y, sx, sy = self._setup()  # 52 rows — pad/trim path
        pinn = init_pinn(jax.random.PRNGKey(2), (8, 16, 1))
        xn = np.asarray(sx.transform(x), np.float32)
        a = lambda_identifiability(pinn, xn, sx, sy)
        b = lambda_identifiability(pinn, xn, sx, sy, mesh=mesh8)
        assert set(a) == set(b)
        for g in a:
            assert a[g].n_residuals == b[g].n_residuals
            assert a[g].n_dropped == b[g].n_dropped
            assert a[g].dof == b[g].dof
            np.testing.assert_allclose(b[g].sigma2, a[g].sigma2,
                                       rtol=1e-5, atol=1e-12)
            np.testing.assert_allclose(b[g].stderr, a[g].stderr,
                                       rtol=1e-4, atol=1e-12)
            np.testing.assert_array_equal(b[g].identifiable, a[g].identifiable)
