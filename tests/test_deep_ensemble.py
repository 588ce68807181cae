"""Deep-ensemble mixture-moment UQ (uq/deep_ensemble.py).

Beyond-reference estimator: the reference's only epistemic path is MC
dropout (01:1413-1491); these tests anchor the ensemble decomposition to a
literal numpy oracle and prove the sharded variant is exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnfc_tpu.models.mlp import mlp_forward
from pinnfc_tpu.parallel import init_ensemble, make_mesh
from pinnfc_tpu.uq import ensemble_moments, ensemble_moments_sharded


@pytest.fixture(scope="module")
def small_ensemble():
    ens = init_ensemble(jax.random.PRNGKey(11), 4, layers=(8, 32, 32, 1))
    x = jnp.asarray(np.random.RandomState(1).uniform(-1, 1, (37, 8)), jnp.float32)
    return ens, x


class TestEnsembleMoments:
    def test_matches_numpy_oracle(self, small_ensemble):
        """Mixture decomposition == explicit per-member loop in f64."""
        ens, x = small_ensemble
        out = ensemble_moments(ens, x)

        mus, lvs = [], []
        for e in range(4):
            mlp_e = jax.tree_util.tree_map(lambda a: a[e], ens["mlp"])
            mu, lv = mlp_forward(mlp_e, x, train=False)
            mus.append(np.asarray(mu[:, 0], np.float64))
            lvs.append(np.asarray(lv[:, 0], np.float64))
        mus, lvs = np.stack(mus), np.stack(lvs)

        np.testing.assert_allclose(out.pred_mean, mus.mean(0), rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(
            out.aleatoric_std, np.sqrt(np.exp(lvs).mean(0)), rtol=1e-5, atol=1e-7
        )
        # population variance across members, like the MC sampler (01:1486)
        np.testing.assert_allclose(
            out.epistemic_std, mus.std(0), rtol=1e-4, atol=1e-6
        )

    def test_identical_members_have_zero_epistemic(self, small_ensemble):
        ens, x = small_ensemble
        one = jax.tree_util.tree_map(lambda a: a[:1], ens["mlp"])
        clones = {"mlp": jax.tree_util.tree_map(
            lambda a: jnp.repeat(a, 4, axis=0), one
        )}
        out = ensemble_moments(clones, x)
        np.testing.assert_allclose(out.epistemic_std, 0.0, atol=1e-6)
        mu, _ = mlp_forward(
            jax.tree_util.tree_map(lambda a: a[0], ens["mlp"]), x, train=False
        )
        np.testing.assert_allclose(out.pred_mean, mu[:, 0], rtol=1e-5, atol=1e-6)

    def test_sharded_matches_unsharded_nondivisible(self, small_ensemble):
        """Row sharding over an 8-device mesh is exact pad/trim (N=37)."""
        ens, x = small_ensemble
        if jax.device_count() < 8:
            pytest.skip("needs the 8-device CPU mesh")
        mesh = make_mesh(8)
        want = jax.device_get(ensemble_moments(ens, x))
        got = ensemble_moments_sharded(ens, x, mesh)
        np.testing.assert_allclose(got.pred_mean, want.pred_mean, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            got.aleatoric_std, want.aleatoric_std, rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            got.epistemic_std, want.epistemic_std, rtol=1e-4, atol=1e-6
        )


class TestEnsembleUQCli:
    def test_cmd_ensemble_uq(self, capsys):
        from pinnfc_tpu.cli import main

        assert main([
            "ensemble", "--small", "--members", "2", "--steps", "10",
            "--uq", "--uq-mc-times", "8",
        ]) == 0
        out = capsys.readouterr().out
        assert "deep-ensemble UQ" in out
        assert "mc-dropout" in out
