"""Cross-framework f32 parity: the jnp physics residuals against an
independent torch transcription of the same equations (net_f_V 01:724-765,
net_f_T_simple 01:869-914, net_f_H 01:621-722, net_f_O 01:535-619),
vectorized over the synthetic dataset.

This is the closest executable statement of "the physics math matches the
reference framework" without importing reference code: same formulas, same
f32 arithmetic, a different autodiff framework."""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pinnfc_tpu.models.pinn import LAMBDA_INIT
from pinnfc_tpu.physics import (
    hydrogen_residual,
    oxygen_residual,
    thermal_residual_simple,
    voltage_residual,
)

A, F, R, N = 270.0, 96485.0, 8.314, 5.0


def _torch_sat_pressure():
    tc = 55.0
    x = -2.1794 + 0.02953 * tc - 9.1837e-5 * tc**2 + 1.4454e-7 * tc**3
    return 10.0**x


def torch_net_f_v(lam, real, v_stack):
    r, i0, il = lam[0], lam[1], lam[2]
    i = real[:, 0:1] / A + 1e-5
    t_out = real[:, 5:6]
    p_h2 = real[:, 3:4] / 101.0 + 1.0
    p_air = real[:, 4:5] / 101.0 + 1.0
    tk = t_out + 273.15
    p_h2o = _torch_sat_pressure()
    pp_h2 = 0.5 * (p_h2 / torch.exp(1.653 * i / tk**1.334) - p_h2o)
    pp_o2 = p_air / torch.exp(4.192 * i / tk**1.334) - p_h2o
    b = R * tk / (2.0 * 0.5 * F)
    v_act = -b * torch.log(i / i0)
    v_ohm = -(i * r)
    v_conc = 0.5 * b * torch.log(1.0 - i / il)
    e_nernst = -(-220170.0) / (2 * F) - (R * tk) * torch.log(
        p_h2o / (pp_h2 * pp_o2**0.5)
    ) / (2 * F)
    v_est = e_nernst + v_act + v_ohm + v_conc
    return v_est - v_stack / N, v_est * N


def torch_net_f_t(lam, real):
    i_total = (real[:, 0:1] / A + 1e-6) * A
    t_pred = lam[0] * i_total + lam[2] * (real[:, 1:2] + 1e-6) + 0.5 * real[:, 2:3] + lam[4]
    return real[:, 5:6] - t_pred, t_pred


def torch_net_f_h(lam, real):
    i_total = (real[:, 0:1] / A + 1e-5) * A
    q = torch.clamp(i_total / (2 * F) * N * 22.4 * 60.0, min=1e-8)
    tgt = torch.where(
        i_total <= lam[2],
        lam[0] + lam[1] * (i_total / 100.0),
        lam[0] + lam[1] * (lam[2] / 100.0),
    )
    actual = (real[:, 6:7] + 1e-6) / q
    return actual - tgt


def torch_net_f_o(lam, real):
    i_total = (real[:, 0:1] / A + 1e-5) * A
    q = torch.clamp(i_total * N / (4 * F) * 22.4 * 60.0, min=1e-8)
    thr = torch.abs(lam[2])
    tgt = torch.where(
        i_total <= thr,
        lam[0] + lam[1] * (i_total / 100.0),
        lam[0] + lam[1] * (thr / 100.0),
    )
    tgt = torch.clamp(tgt, 1.05, 15.0)
    actual = (real[:, 7:8] + 1e-6) * 0.21 / q
    return actual - tgt + 10.0 * torch.clamp(1.0 - actual, min=0.0)


class TestTorchOracle:
    def test_all_residuals_match_torch_f32(self, tiny_dataset):
        d = tiny_dataset
        real = np.asarray(d.scaler_x.inverse(d.x_test), np.float32)
        v_stack = np.asarray(d.scaler_y.inverse(d.y_test), np.float32)
        real_t = torch.tensor(real)
        v_t = torch.tensor(v_stack)

        lam_v = torch.tensor(LAMBDA_INIT["lam_v"])
        lam_t = torch.tensor(LAMBDA_INIT["lam_t"]) + torch.tensor([0.1, 0, -2.0, 0, 3.0])
        lam_h = torch.tensor(LAMBDA_INIT["lam_h"])
        lam_o = torch.tensor(LAMBDA_INIT["lam_o"])

        want_fv, want_vphys = torch_net_f_v(lam_v, real_t, v_t)
        want_ft, want_tpred = torch_net_f_t(lam_t, real_t)
        want_fh = torch_net_f_h(lam_h, real_t)
        want_fo = torch_net_f_o(lam_o, real_t)

        import jax.numpy as jnp

        got_v = voltage_residual(
            jnp.asarray(LAMBDA_INIT["lam_v"]), d.x_test, d.y_test,
            d.scaler_x, d.scaler_y,
        )
        got_t = thermal_residual_simple(
            jnp.asarray(np.asarray(lam_t)), d.x_test, d.scaler_x
        )
        got_h = hydrogen_residual(jnp.asarray(LAMBDA_INIT["lam_h"]), d.x_test, d.scaler_x)
        got_o = oxygen_residual(jnp.asarray(LAMBDA_INIT["lam_o"]), d.x_test, d.scaler_x)

        np.testing.assert_allclose(
            np.asarray(got_v.f), want_fv.numpy(), rtol=5e-5, atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_v.v_out_est_stack), want_vphys.numpy(), rtol=5e-5, atol=2e-4
        )
        np.testing.assert_allclose(
            np.asarray(got_t.f), want_ft.numpy(), rtol=1e-4, atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(got_h.f), want_fh.numpy(), rtol=5e-5, atol=5e-5
        )
        np.testing.assert_allclose(
            np.asarray(got_o.f), want_fo.numpy(), rtol=5e-5, atol=5e-5
        )
