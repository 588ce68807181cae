"""MC-dropout sampler tests (reference get_MC_samples, 01:1413-1491)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnfc_tpu.models.mlp import init_mlp, mlp_forward
from pinnfc_tpu.uq import mc_dropout_samples, mc_dropout_samples_loop


@pytest.fixture(scope="module")
def small_model():
    params = init_mlp(jax.random.PRNGKey(3), (8, 32, 32, 1))
    x = jnp.asarray(np.random.RandomState(0).uniform(-1, 1, (40, 8)), jnp.float32)
    return params, x


class TestMCDropout:
    def test_matches_loop_oracle_exactly(self, small_model):
        """vmapped sampler == literal loop given identical keys (SURVEY §4e)."""
        params, x = small_model
        rng = jax.random.PRNGKey(7)
        fast = mc_dropout_samples(params, x, rng, mc_times=16, dropout=0.3, chunk=16)
        slow = mc_dropout_samples_loop(params, x, rng, mc_times=16, dropout=0.3)
        # jit-vs-eager fusion differences allow ~1e-6 relative slack
        np.testing.assert_allclose(fast.pred_mean, slow.pred_mean, rtol=1e-5, atol=1e-7)
        np.testing.assert_allclose(fast.aleatoric_std, slow.aleatoric_std, rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(fast.epistemic_std, slow.epistemic_std, rtol=1e-3, atol=1e-6)

    def test_pred_mean_is_eval_pass(self, small_model):
        """Reference phase 1 runs eval mode: pred_mean must equal the
        deterministic forward (01:1441-1445, 01:1480)."""
        params, x = small_model
        out = mc_dropout_samples(params, x, jax.random.PRNGKey(0), mc_times=8, chunk=8)
        want, _ = mlp_forward(params, x, train=False)
        np.testing.assert_allclose(out.pred_mean, want[:, 0], rtol=1e-5, atol=1e-7)

    def test_epistemic_grows_with_dropout(self, small_model):
        params, x = small_model
        rng = jax.random.PRNGKey(1)
        lo = mc_dropout_samples(params, x, rng, mc_times=200, dropout=0.05, chunk=50)
        hi = mc_dropout_samples(params, x, rng, mc_times=200, dropout=0.6, chunk=50)
        assert float(jnp.mean(hi.epistemic_std)) > float(jnp.mean(lo.epistemic_std))

    def test_nondivisible_chunking(self, small_model):
        """mc_times not divisible by chunk: statistics use the padded total."""
        params, x = small_model
        rng = jax.random.PRNGKey(2)
        out = mc_dropout_samples(params, x, rng, mc_times=10, dropout=0.3, chunk=4)
        # 10 → 3 chunks of 4 = 12 effective samples; just checks sanity/shape
        assert out.epistemic_std.shape == (40,)
        assert np.isfinite(np.asarray(out.epistemic_std)).all()

    def test_statistical_convergence(self, small_model):
        """Two independent large-sample runs agree (statistical test)."""
        params, x = small_model
        a = mc_dropout_samples(params, x, jax.random.PRNGKey(10), mc_times=1500, chunk=250)
        b = mc_dropout_samples(params, x, jax.random.PRNGKey(20), mc_times=1500, chunk=250)
        # epistemic std estimates should agree within ~10% on average
        ra = np.asarray(a.epistemic_std)
        rb = np.asarray(b.epistemic_std)
        rel = np.abs(ra - rb) / (0.5 * (ra + rb) + 1e-9)
        assert float(np.mean(rel)) < 0.15
