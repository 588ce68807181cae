"""λ identifiability analysis (uq/identifiability.py + cli identify).

The reference identifies its physics parameters (01:966-1399) but never
quantifies HOW WELL; this surface is beyond-reference.  The math is
anchored against the closed-form linear-least-squares oracle, and the
plumbing against two quirks the analysis must detect: the reference's
λ4 name-shadowing (01:468) and the unused oxygen λ4 — both must come
back with exactly zero sensitivity.
"""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnfc_tpu.models.pinn import LAMBDA_BOUNDS, init_pinn
from pinnfc_tpu.uq import gauss_newton_ci, lambda_identifiability


class TestGaussNewtonMath:
    def test_linear_oracle(self):
        """For r = Aθ − b at the least-squares optimum the Gauss-Newton
        stderr equals the classical σ̂·sqrt(diag((AᵀA)⁻¹)) exactly."""
        rs = np.random.RandomState(0)
        n, k = 400, 3
        A = rs.randn(n, k)
        theta_true = np.array([2.0, -1.0, 0.5])
        b = A @ theta_true + 0.1 * rs.randn(n)
        theta_hat, *_ = np.linalg.lstsq(A, b, rcond=None)
        r = A @ theta_hat - b
        stderr, sens, ident, dof, sigma2, n_used, _ = gauss_newton_ci(r, A)
        assert n_used == n and dof == n - k and ident.all()
        sigma2_ref = float(np.sum(r**2) / (n - k))
        np.testing.assert_allclose(sigma2, sigma2_ref, rtol=1e-12)
        stderr_ref = np.sqrt(
            sigma2_ref * np.diag(np.linalg.inv(A.T @ A))
        )
        np.testing.assert_allclose(stderr, stderr_ref, rtol=1e-9)
        np.testing.assert_allclose(sens, np.sqrt(np.mean(A**2, axis=0)),
                                   rtol=1e-12)
        # the 95% interval covers the truth in this well-conditioned case
        assert np.all(np.abs(theta_hat - theta_true) < 4 * stderr)

    def test_zero_column_is_unidentifiable(self):
        """A parameter the residuals never see: inf stderr, flag False,
        and the OTHER parameters' intervals unchanged vs dropping it."""
        rs = np.random.RandomState(1)
        A = rs.randn(200, 3)
        A[:, 1] = 0.0
        r = rs.randn(200)
        stderr, sens, ident, dof, *_ = gauss_newton_ci(r, A)
        assert not ident[1] and np.isinf(stderr[1]) and sens[1] == 0.0
        assert ident[[0, 2]].all()
        assert dof == 200 - 2  # only identifiable params consume dof
        stderr_red, *_ = gauss_newton_ci(r, A[:, [0, 2]])
        np.testing.assert_allclose(stderr[[0, 2]], stderr_red, rtol=1e-12)

    def test_nonfinite_rows_dropped(self):
        rs = np.random.RandomState(2)
        A = rs.randn(100, 2)
        r = rs.randn(100)
        r[7] = np.nan
        A[13, 0] = np.inf
        stderr, _, _, dof, _, n_used, _ = gauss_newton_ci(r, A)
        assert n_used == 98 and dof == 96
        assert np.isfinite(stderr).all()
        stderr_ref, *_ = gauss_newton_ci(
            np.delete(r, [7, 13]), np.delete(A, [7, 13], axis=0)
        )
        np.testing.assert_allclose(stderr, stderr_ref, rtol=1e-12)

    def test_all_rows_nonfinite_raises(self):
        with pytest.raises(ValueError, match="non-finite"):
            gauss_newton_ci(np.full(5, np.nan), np.ones((5, 2)))


class TestLambdaIdentifiability:
    @pytest.fixture(scope="class")
    def setup(self, tiny_dataset):
        d = tiny_dataset
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        return params, d

    def test_dead_parameters_detected(self, setup):
        """The two reference quirks come back as zero-sensitivity columns:
        voltage λ4 (the 01:468 name-shadowing — enters no formula) and
        oxygen λ4 (reserved)."""
        params, d = setup
        rep = lambda_identifiability(
            params, d.x_train, d.scaler_x, d.scaler_y
        )
        assert not rep["lam_v"].identifiable[3]
        assert rep["lam_v"].sensitivity[3] == 0.0
        assert np.isinf(rep["lam_v"].stderr[3])
        assert "shadowing" in rep["lam_v"].names[3]
        assert not rep["lam_o"].identifiable[3]
        # the physically active parameters ARE identifiable
        assert rep["lam_v"].identifiable[:3].all()
        assert rep["lam_h"].identifiable[:3].all()

    def test_at_bound_flag(self, setup):
        """λ_v[2] (i_l) sits exactly at its lower clamp 2.0 in LAMBDA_INIT's
        neighborhood — pin it there and the flag must fire."""
        params, d = setup
        lo = np.asarray(LAMBDA_BOUNDS["lam_v"][0])
        lam_v = np.asarray(params["lam_v"]).copy()
        lam_v[2] = lo[2]
        pinned = {**params, "lam_v": jnp.asarray(lam_v)}
        rep = lambda_identifiability(
            pinned, d.x_train, d.scaler_x, d.scaler_y, groups=("lam_v",)
        )
        assert rep["lam_v"].at_bound[2]
        assert not rep["lam_v"].at_bound[0]

    def test_ci_interval_consistency(self, setup):
        """ci_lo/ci_hi are value ∓ 1.96·stderr and the report is JSON-clean
        end to end (what cli identify --json relies on)."""
        params, d = setup
        rep = lambda_identifiability(
            params, d.x_train, d.scaler_x, d.scaler_y, groups=("lam_t",)
        )
        gi = rep["lam_t"]
        m = gi.identifiable
        np.testing.assert_allclose(
            gi.ci_hi[m] - gi.values[m], 1.959964 * gi.stderr[m], rtol=1e-9
        )
        json.dumps({"v": gi.values.tolist(), "s": gi.stderr.tolist()})


class TestIdentifyCli:
    def test_cli_identify(self, tmp_path, tiny_dataset, capsys):
        import scipy.io

        from pinnfc_tpu.cli import main
        from pinnfc_tpu.utils import save_checkpoint

        d = tiny_dataset
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, d.scaler_x, d.scaler_y)

        # minimal 22-col artifact whose x columns are the RAW test rows
        n = int(d.x_test.shape[0])
        arr = np.zeros((n, 22))
        arr[:, :8] = np.asarray(d.scaler_x.inverse(d.x_test))
        mat = str(tmp_path / "F01.mat")
        scipy.io.savemat(mat, {"comprehensive_results": arr})

        import os

        figs = str(tmp_path / "figs")
        assert main(["identify", "--ckpt", ckpt, "--mat", mat,
                     "--plot-dir", figs]) == 0
        out = capsys.readouterr().out
        assert "UNIDENTIFIABLE" in out and "lam_v[3]" in out
        assert os.path.exists(os.path.join(figs, "identifiability.png"))

        assert main(["identify", "--ckpt", ckpt, "--mat", mat,
                     "--json"]) == 0
        payload = json.loads(capsys.readouterr().out)
        assert set(payload) == {"lam_v", "lam_t", "lam_h", "lam_o"}
        assert payload["lam_v"]["identifiable"][3] is False
        assert payload["lam_v"]["stderr"][3] is None  # strict JSON: inf→null


class TestCorrelation:
    def test_linear_oracle_correlation(self):
        """corr equals the classical cov/(se·se') on a correlated design."""
        rs = np.random.RandomState(3)
        n = 500
        z = rs.randn(n)
        A = np.stack([z + 0.1 * rs.randn(n), z + 0.1 * rs.randn(n),
                      rs.randn(n)], axis=1)
        r = rs.randn(n)
        *_, corr = gauss_newton_ci(r, A)
        cov_ref = (np.sum(r**2) / (n - 3)) * np.linalg.inv(A.T @ A)
        se = np.sqrt(np.diag(cov_ref))
        corr_ref = cov_ref / np.outer(se, se)
        np.testing.assert_allclose(corr, corr_ref, rtol=1e-8)
        # near-duplicate regressors are strongly ANTI-correlated estimates
        assert corr[0, 1] < -0.95
        np.testing.assert_allclose(np.diag(corr), 1.0, rtol=1e-12)

    def test_unidentifiable_rows_are_nan(self):
        rs = np.random.RandomState(4)
        A = rs.randn(100, 3)
        A[:, 2] = 0.0
        *_, corr = gauss_newton_ci(rs.randn(100), A)
        assert np.isnan(corr[2]).all() and np.isnan(corr[:, 2]).all()
        assert np.isfinite(corr[:2, :2]).all()
