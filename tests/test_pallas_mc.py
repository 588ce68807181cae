"""Statistical parity of the fused Pallas MC-dropout kernel vs the vmapped
sampler (different PRNG streams → distributional agreement, SURVEY §4e)."""

import jax
import numpy as np
import pytest

from pinnfc_tpu.models.mlp import init_mlp, mlp_forward
from pinnfc_tpu.ops.pallas_mc_dropout import mc_dropout_pallas
from pinnfc_tpu.uq import mc_dropout_samples

INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture(scope="module")
def setup():
    params = init_mlp(jax.random.PRNGKey(0), (8, 64, 64, 1))
    x = np.random.RandomState(1).uniform(-1, 1, (300, 8)).astype(np.float32)
    return params, x


class TestPallasMCDropout:
    def test_base_is_eval_forward(self, setup):
        """Phase-1 output must equal the deterministic eval pass exactly."""
        params, x = setup
        out = mc_dropout_pallas(
            params, x, seed=0, mc_times=4, dropout=0.3, interpret=INTERPRET
        )
        want, _ = mlp_forward(params, x, train=False)
        np.testing.assert_allclose(
            np.asarray(out.pred_mean), np.asarray(want[:, 0]), rtol=2e-5, atol=1e-6
        )

    def test_statistical_parity_with_vmap_sampler(self, setup):
        """Epistemic/aleatoric stds agree with the vmap sampler within
        sampling error at large mc_times."""
        params, x = setup
        mc = 800
        a = mc_dropout_pallas(
            params, x, seed=7, mc_times=mc, dropout=0.4, interpret=INTERPRET
        )
        b = mc_dropout_samples(
            params, x, jax.random.PRNGKey(7), mc_times=mc, dropout=0.4, chunk=100,
        )
        ea, eb = np.asarray(a.epistemic_std), np.asarray(b.epistemic_std)
        rel = np.abs(ea - eb) / (0.5 * (ea + eb) + 1e-9)
        assert float(np.mean(rel)) < 0.15, float(np.mean(rel))
        aa, ab = np.asarray(a.aleatoric_std), np.asarray(b.aleatoric_std)
        rel_a = np.abs(aa - ab) / (0.5 * (aa + ab) + 1e-9)
        assert float(np.mean(rel_a)) < 0.1, float(np.mean(rel_a))

    def test_padding_rows_do_not_leak(self, setup):
        params, x = setup
        out_full = mc_dropout_pallas(
            params, x, seed=3, mc_times=8, dropout=0.3, interpret=INTERPRET
        )
        assert out_full.pred_mean.shape == (300,)
        assert np.isfinite(np.asarray(out_full.epistemic_std)).all()

    def test_deterministic_given_seed(self, setup):
        """Counter-based RNG → bit-identical output for the same seed."""
        params, x = setup
        a = mc_dropout_pallas(params, x, seed=11, mc_times=32, dropout=0.4,
                              interpret=INTERPRET)
        b = mc_dropout_pallas(params, x, seed=11, mc_times=32, dropout=0.4,
                              interpret=INTERPRET)
        np.testing.assert_array_equal(np.asarray(a.epistemic_std),
                                      np.asarray(b.epistemic_std))
        c = mc_dropout_pallas(params, x, seed=12, mc_times=32, dropout=0.4,
                              interpret=INTERPRET)
        assert not np.array_equal(np.asarray(a.epistemic_std),
                                  np.asarray(c.epistemic_std))

    def test_single_sample_edge(self, setup):
        params, x = setup
        out = mc_dropout_pallas(
            params, x, seed=0, mc_times=1, dropout=0.2, interpret=INTERPRET
        )
        assert np.isfinite(np.asarray(out.aleatoric_std)).all()
        # single sample → epistemic variance ~0 (f32 E[x²]−E[x]² cancellation
        # leaves ≤~1e-4 residue)
        np.testing.assert_allclose(np.asarray(out.epistemic_std), 0.0, atol=3e-4)
