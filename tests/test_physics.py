"""Physics residuals: hand-computed oracles, limits, gradient-flow semantics.

Oracles below are independent plain-Python transcriptions of the reference
equations (net_f_V 01:724-765, net_f_T_simple 01:869-914, net_f_H 01:621-722,
net_f_O 01:535-619), evaluated on single rows.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnfc_tpu.data import AffineScaler
from pinnfc_tpu.models import LAMBDA_INIT, init_pinn
from pinnfc_tpu.physics import (
    all_residuals,
    hydrogen_residual,
    oxygen_residual,
    thermal_residual_euler,
    thermal_residual_simple,
    voltage_residual,
)

F = 96485.0


def make_scalers(rows):
    """Identity-ish scalers fit on a spread of realistic rows."""
    base = np.asarray(rows, np.float64)
    lo = base.min(axis=0) - 1.0
    hi = base.max(axis=0) + 1.0
    return AffineScaler.fit(np.stack([lo, hi]))


@pytest.fixture(scope="module")
def row():
    # [I, m_W, T_in, P_H2, P_air, T_out, m_H2, m_O2]
    return np.array([270.0, 0.35, 62.0, 70.0, 55.0, 68.0, 14.0, 50.0])


@pytest.fixture(scope="module")
def scalers(row):
    sx = make_scalers([row * 0.5, row * 1.5])
    sy = AffineScaler.fit(np.array([[2.0], [4.5]]))
    return sx, sy


def test_voltage_matches_hand_computation(row, scalers):
    sx, sy = scalers
    x_norm = sx.transform(row.reshape(1, -1))
    u_phys = 3.4  # stack voltage
    u_norm = sy.transform(np.array([[u_phys]]))

    lam_v = jnp.asarray(LAMBDA_INIT["lam_v"])
    out = voltage_residual(lam_v, x_norm, u_norm, sx, sy)

    # --- independent transcription (floats, float64) ---
    r, i0, il = (0.167897923477715, 2.36682075851268e-06, 2.43414469188443)
    i = 270.0 / 270.0 + 1e-5
    t_out = 68.0
    p_h2 = 70.0 / 101.0 + 1.0
    p_air = 55.0 / 101.0 + 1.0
    tk = t_out + 273.15
    tc = 55.0
    xs = -2.1794 + 0.02953 * tc - 9.1837e-5 * tc**2 + 1.4454e-7 * tc**3
    p_h2o = 10.0**xs
    pp_h2 = 0.5 * (p_h2 / math.exp(1.653 * i / tk**1.334) - p_h2o)
    pp_o2 = p_air / math.exp(4.192 * i / tk**1.334) - p_h2o
    b = 8.314 * tk / (2 * 0.5 * F)
    v_act = -b * math.log(i / i0)
    v_ohm = -i * r
    v_conc = 0.5 * b * math.log(1 - i / il)
    e_nernst = 220170.0 / (2 * F) - (8.314 * tk) * math.log(
        p_h2o / (pp_h2 * pp_o2**0.5)
    ) / (2 * F)
    v_est = e_nernst + v_act + v_ohm + v_conc
    f_expected = v_est - u_phys / 5.0

    np.testing.assert_allclose(float(out.f[0, 0]), f_expected, rtol=2e-4)
    np.testing.assert_allclose(
        float(out.v_out_est_stack[0, 0]), v_est * 5, rtol=2e-4
    )
    np.testing.assert_allclose(float(out.v_out_stack[0, 0]), u_phys, rtol=1e-4)


def test_voltage_stop_gradient_semantics(row, scalers):
    """Physics loss must not reach the DNN output (reference detach, 01:734)."""
    sx, sy = scalers
    x_norm = jnp.asarray(sx.transform(np.tile(row, (4, 1))))

    def loss(lam_v, u_norm):
        return jnp.mean(voltage_residual(lam_v, x_norm, u_norm, sx, sy).f ** 2)

    u = jnp.full((4, 1), 0.3)
    g_lam, g_u = jax.grad(loss, argnums=(0, 1))(
        jnp.asarray(LAMBDA_INIT["lam_v"]), u
    )
    assert np.abs(np.asarray(g_u)).max() == 0.0
    assert np.abs(np.asarray(g_lam[:3])).min() > 0.0  # r, i0, il all live
    assert float(g_lam[3]) == 0.0  # λ4 unused by the formula (01:468 quirk)


def test_hydrogen_hand_computation(row, scalers):
    sx, _ = scalers
    x_norm = sx.transform(row.reshape(1, -1))
    lam_h = jnp.asarray(LAMBDA_INIT["lam_h"])
    out = hydrogen_residual(lam_h, x_norm, sx)

    i_total = (270.0 / 270.0 + 1e-5) * 270.0
    q_th = i_total / (2 * F) * 5 * 22.4 * 60
    actual = (14.0 + 1e-6) / q_th
    # I_total (≈270) > λH3 saturated? λH3 init = 197.715 → saturated branch
    target = 5.0 + (-1.559) * (197.715 / 100.0)
    np.testing.assert_allclose(float(out.actual_ratio[0, 0]), actual, rtol=2e-4)
    np.testing.assert_allclose(float(out.target_ratio[0, 0]), target, rtol=2e-4)
    np.testing.assert_allclose(float(out.f[0, 0]), actual - target, rtol=3e-4)


def test_hydrogen_piecewise_branches(scalers, row):
    sx, _ = scalers
    lam_h = jnp.asarray([3.0, -0.5, 200.0, 1.0])
    lo = row.copy()
    lo[0] = 150.0  # below threshold → linear branch
    hi = row.copy()
    hi[0] = 300.0  # above → saturated
    x = sx.transform(np.stack([lo, hi]))
    out = hydrogen_residual(lam_h, x, sx)
    t_lo, t_hi = np.asarray(out.target_ratio).ravel()
    i_lo = (150.0 / 270.0 + 1e-5) * 270.0
    np.testing.assert_allclose(t_lo, 3.0 - 0.5 * i_lo / 100.0, rtol=1e-4)
    np.testing.assert_allclose(t_hi, 3.0 - 0.5 * 2.0, rtol=1e-5)


def test_oxygen_hand_computation(row, scalers):
    sx, _ = scalers
    x_norm = sx.transform(row.reshape(1, -1))
    lam_o = jnp.asarray(LAMBDA_INIT["lam_o"])
    out = oxygen_residual(lam_o, x_norm, sx)

    i_stack = (270.0 / 270.0 + 1e-5) * 270.0
    q_th = i_stack * 5 / (4 * F) * 22.4 * 60
    actual = (50.0 + 1e-6) * 0.21 / q_th
    # threshold |λO3| = 200 < 270 → saturated; clamp to [1.05, 15]
    target = np.clip(2.0 + 0.5 * 2.0, 1.05, 15.0)
    f = actual - target + 10.0 * max(0.0, 1.0 - actual)
    np.testing.assert_allclose(float(out.actual_ratio[0, 0]), actual, rtol=2e-4)
    np.testing.assert_allclose(float(out.f[0, 0]), f, rtol=3e-4)


def test_oxygen_starvation_penalty(row, scalers):
    sx, _ = scalers
    starved = row.copy()
    starved[7] = 5.0  # air flow → actual ratio < 1
    x = sx.transform(starved.reshape(1, -1))
    out = oxygen_residual(jnp.asarray(LAMBDA_INIT["lam_o"]), x, sx)
    actual = float(out.actual_ratio[0, 0])
    assert actual < 1.0
    target = float(out.target_ratio[0, 0])
    expected = actual - target + 10.0 * (1.0 - actual)
    np.testing.assert_allclose(float(out.f[0, 0]), expected, rtol=1e-4)


def test_thermal_simple_hand_computation(row, scalers):
    sx, _ = scalers
    x = sx.transform(row.reshape(1, -1))
    lam_t = jnp.asarray([0.05, 10.0, -1.0, 10.0, 40.0])
    out = thermal_residual_simple(lam_t, x, sx)
    i_total = (270.0 / 270.0 + 1e-6) * 270.0
    t_pred = 0.05 * i_total + (-1.0) * (0.35 + 1e-6) + 0.5 * 62.0 + 40.0
    np.testing.assert_allclose(float(out.t_pred[0, 0]), t_pred, rtol=2e-4)
    np.testing.assert_allclose(float(out.f[0, 0]), 68.0 - t_pred, rtol=2e-3)


def test_thermal_euler_structure(row, scalers):
    sx, sy = scalers
    rows = np.tile(row, (6, 1))
    rows[:, 5] = [68.0, 68.2, 68.4, 68.3, 68.5, 68.6]
    x = sx.transform(rows)
    u = jnp.full((6, 1), 0.2)
    lam_t = jnp.asarray(LAMBDA_INIT["lam_t"])
    out = thermal_residual_euler(lam_t, x, u, sx, sy)
    assert out.f.shape == (6, 1)
    # first prediction seeded with the first measurement (01:857)
    np.testing.assert_allclose(float(out.f[0, 0]), 0.0, atol=1e-4)

    # hand-compute prediction for t=1 from measured t=0
    i_total = (270.0 / 270.0 + 1e-5) * 270.0
    v_single = float(np.asarray(sy.inverse(np.array([[0.2]])))[0, 0]) / 5.0
    tk = 68.0 + 273.15
    v_rev = 1.229 - 0.0009 * (tk - 298.15)
    q_e = (i_total * v_rev - i_total * v_single) * 10.0
    q_c = (0.35 + 1e-6) * 4180.0 * (68.0 - 62.0) * 10.0
    q_r = 20.0 * 0.2 * (68.0 - 25.0) * 10.0
    t_next = 68.0 + 0.1 * (q_e - q_c - q_r) / 10.0
    np.testing.assert_allclose(float(out.t_pred[1, 0]), t_next, rtol=1e-3)


def test_all_residuals_bundle(tiny_dataset):
    ds = tiny_dataset
    params = init_pinn(jax.random.PRNGKey(0))
    u = jnp.zeros((ds.x_test.shape[0], 1))
    bundle = jax.jit(
        lambda p, x, u: all_residuals(p, x, u, ds.scaler_x, ds.scaler_y)
    )(params, ds.x_test, u)
    n = ds.x_test.shape[0]
    for field in bundle:
        assert field.shape[0] == n
        assert np.all(np.isfinite(np.asarray(field)))


def test_residuals_grad_only_own_lambda(tiny_dataset):
    """Each stage loss must touch only its own λ group (freeze semantics)."""
    ds = tiny_dataset
    params = init_pinn(jax.random.PRNGKey(0))
    u = jnp.zeros((ds.x_test.shape[0], 1))

    def loss_h(p):
        return jnp.mean(hydrogen_residual(p["lam_h"], ds.x_test, ds.scaler_x).f ** 2)

    g = jax.grad(lambda p: loss_h(p))(params)
    assert np.abs(np.asarray(g["lam_h"][:3])).max() > 0
    assert np.abs(np.asarray(g["lam_o"])).max() == 0
    assert np.abs(np.asarray(jax.tree_util.tree_leaves(g["mlp"])[0])).max() == 0
