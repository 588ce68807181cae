"""Fused Pallas residual kernel vs the jnp reference implementation.

On CPU CI the kernel runs in interpreter mode (bit-compatible semantics);
on TPU the compiled kernel is exercised by the same parity assertions."""

import jax
import numpy as np
import pytest

from pinnfc_tpu.models.mlp import mlp_forward
from pinnfc_tpu.models.pinn import init_pinn
from pinnfc_tpu.ops.pallas_residuals import all_residuals_pallas
from pinnfc_tpu.physics import all_residuals

INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture(scope="module")
def setup(tiny_dataset):
    d = tiny_dataset
    params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
    u_norm, _ = mlp_forward(params["mlp"], d.x_test, train=False)
    return params, d, u_norm


class TestPallasResiduals:
    def test_parity_with_jnp_reference(self, setup):
        params, d, u_norm = setup
        want = all_residuals(params, d.x_test, u_norm, d.scaler_x, d.scaler_y)
        got = all_residuals_pallas(
            params, d.x_test, u_norm, d.scaler_x, d.scaler_y, interpret=INTERPRET
        )
        for name in want._fields:
            w = np.asarray(getattr(want, name))[:, 0]
            g = np.asarray(getattr(got, name))[:, 0]
            np.testing.assert_allclose(
                g, w, rtol=2e-5, atol=2e-5, err_msg=f"channel {name}"
            )

    def test_nondivisible_padding(self, setup):
        """N not a multiple of the block: padded lanes must not leak."""
        params, d, u_norm = setup
        n = 700  # not a multiple of 512
        want = all_residuals(
            params, d.x_test[:n], u_norm[:n], d.scaler_x, d.scaler_y
        )
        got = all_residuals_pallas(
            params, d.x_test[:n], u_norm[:n], d.scaler_x, d.scaler_y,
            interpret=INTERPRET,
        )
        np.testing.assert_allclose(
            np.asarray(got.f_v), np.asarray(want.f_v), rtol=2e-5, atol=2e-5
        )
        assert got.f_v.shape == (n, 1)

    def test_perturbed_lambdas(self, setup):
        """Parity holds away from the init point too."""
        params, d, u_norm = setup
        import jax.numpy as jnp

        params = dict(params)
        params["lam_v"] = params["lam_v"] * jnp.asarray([1.5, 0.7, 1.2, 1.0])
        params["lam_t"] = params["lam_t"] + jnp.asarray([0.1, 0, -3.0, 0, 5.0])
        params["lam_h"] = params["lam_h"] * 1.1
        params["lam_o"] = params["lam_o"] + jnp.asarray([0.3, 0.1, -20.0, 0.0])
        want = all_residuals(params, d.x_test, u_norm, d.scaler_x, d.scaler_y)
        got = all_residuals_pallas(
            params, d.x_test, u_norm, d.scaler_x, d.scaler_y, interpret=INTERPRET
        )
        np.testing.assert_allclose(
            np.asarray(got.f_o), np.asarray(want.f_o), rtol=2e-5, atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(got.t_phys), np.asarray(want.t_phys), rtol=2e-5, atol=2e-4
        )
