"""VMEM-resident training kernel vs the scan-based stage trainer.

With dropout off both paths compute the identical full-batch Adam+StepLR
trajectory (the hand-derived backward must equal jax.grad); with dropout on,
parity is statistical (different RNG streams)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnfc_tpu.models.mlp import init_mlp
from pinnfc_tpu.ops.pallas_train import train_dnn_pallas
from pinnfc_tpu.training.stages import train_dnn_stage

INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture(scope="module")
def setup():
    rng = np.random.RandomState(0)
    n = 1024
    x = jnp.asarray(rng.uniform(-1, 1, (n, 8)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (n, 1)), jnp.float32)
    params = init_mlp(jax.random.PRNGKey(0), (8, 256, 256, 256, 1))
    return params, x, y


class TestPallasTrainKernel:
    def test_no_dropout_trajectory_matches_scan_trainer(self, setup):
        """dropout_p=0 → deterministic: the kernel's hand-written backward +
        Adam + StepLR must reproduce the jax.grad/optax trajectory."""
        params, x, y = setup
        steps = 12
        ref = train_dnn_stage(
            params, x, y, jax.random.PRNGKey(1), n_iter=steps, lr=0.01,
            lr_step=5, lr_gamma=0.5, dropout_p=0.0,
        )
        got = train_dnn_pallas(
            params, x, y, seed=1, n_iter=steps, lr=0.01, lr_step=5,
            lr_gamma=0.5, dropout_p=0.0, block_n=512, interpret=INTERPRET,
        )
        # interpret mode shares XLA:CPU math with the reference scan →
        # tight; on hardware the kernel's per-block gradient accumulation
        # orders f32 sums differently from XLA's fused reduction, and Adam's
        # m̂/√v̂ amplifies that over 12 steps (observed ≲2e-3 relative)
        rtol_l, rtol_w, atol_w = (
            (5e-4, 1e-3, 1e-5) if INTERPRET else (5e-3, 5e-3, 5e-3)
        )
        np.testing.assert_allclose(
            np.asarray(got.losses), np.asarray(ref.losses), rtol=rtol_l, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.params["mean"]["b"]),
            np.asarray(ref.params["mean"]["b"]),
            rtol=rtol_w, atol=atol_w,
        )
        np.testing.assert_allclose(
            np.asarray(got.params["hidden"][0]["w"]),
            np.asarray(ref.params["hidden"][0]["w"]),
            rtol=rtol_w, atol=atol_w,
        )
        np.testing.assert_allclose(
            np.asarray(got.params["var"][2]["w"]),
            np.asarray(ref.params["var"][2]["w"]),
            rtol=rtol_w, atol=atol_w,
        )

    def test_with_dropout_converges(self, setup):
        """Stochastic path: loss decreases and stays finite."""
        params, x, y = setup
        got = train_dnn_pallas(
            params, x, y, seed=3, n_iter=60, lr=0.01, dropout_p=0.2,
            block_n=512, interpret=INTERPRET,
        )
        losses = np.asarray(got.losses)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_deterministic_given_seed(self, setup):
        params, x, y = setup
        a = train_dnn_pallas(params, x, y, seed=7, n_iter=10, dropout_p=0.3,
                             block_n=512, interpret=INTERPRET)
        b = train_dnn_pallas(params, x, y, seed=7, n_iter=10, dropout_p=0.3,
                             block_n=512, interpret=INTERPRET)
        np.testing.assert_array_equal(np.asarray(a.losses), np.asarray(b.losses))
