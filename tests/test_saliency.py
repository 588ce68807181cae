"""Input-channel saliency (uq/saliency.py + cli explain).

Beyond-reference explainability: the reference explains downstream of the
model (feature-group AUC 02:469-611, risk-layer decomposition 04:244-259)
but never asks which measured INPUT the PINN's voltage prediction leans
on.  The Jacobian math here is anchored against central finite
differences (the independent oracle) in both the normalized and the
physical domain — the latter exercises the affine chain rule through the
MinMax scalers (01:271-274 semantics).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnfc_tpu.data.contract import INPUT_CHANNELS
from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.mlp import init_mlp, mlp_forward
from pinnfc_tpu.uq import (
    class_mean_saliency,
    coarse_class_saliency,
    input_saliency,
)


@pytest.fixture(scope="module")
def setup():
    """Tiny MLP + scalers fit on physically-scaled synthetic channels
    (distinct ranges per channel so the chain rule actually differs
    channel to channel)."""
    rs = np.random.RandomState(0)
    n = 64
    lo = np.array([50, 1.0, 20, 100, 100, 30, 5, 50], float)
    hi = np.array([800, 3.5, 35, 160, 140, 75, 40, 400], float)
    x_phys = (lo + (hi - lo) * rs.rand(n, 8)).astype(np.float32)
    y_phys = (300 + 60 * rs.rand(n, 1)).astype(np.float32)
    scaler_x = AffineScaler.fit(x_phys)
    scaler_y = AffineScaler.fit(y_phys)
    params = init_mlp(jax.random.PRNGKey(3), (8, 16, 1))
    return params, x_phys, scaler_x, scaler_y


def _is_tpu():
    return jax.default_backend() == "tpu"


# The physical-domain FD oracle divides the forward-pass noise by
# 2·eps·span; on the real chip the eval forward carries ~1e-4 absolute
# noise (measured), which swamps a 1e-3·span step on the narrow-span
# channels.  A 10× larger step keeps the oracle well-conditioned there
# while its truncation error ((2e-2 normalized)² ≈ 4e-4 relative) stays
# far inside the tolerance; the σ-head (exp of the logvar) is noisier
# still and gets a wider band on hardware (measured 5.4e-3 at this eps).
FD_EPS_FACTOR = 1e-2 if _is_tpu() else 1e-3
SIGMA_ATOL_FACTOR = 1.5e-2 if _is_tpu() else 3e-3


def _fd_jacobian(f, x: np.ndarray, eps: float) -> np.ndarray:
    """Central finite differences of a row-wise scalar map f: (N,8)→(N,)."""
    jac = np.zeros_like(x, dtype=np.float64)
    for j in range(x.shape[1]):
        xp = x.copy()
        xm = x.copy()
        xp[:, j] += eps
        xm[:, j] -= eps
        jac[:, j] = (f(xp) - f(xm)) / (2 * eps)
    return jac


class TestJacobianMath:
    def test_normalized_domain_vs_fd(self, setup):
        params, x_phys, scaler_x, scaler_y = setup
        rep = input_saliency(params, x_phys, scaler_x, scaler_y)

        def mean_norm(xn):
            m, _ = mlp_forward(params, jnp.asarray(xn, jnp.float32),
                               train=False, precision="highest")
            return np.asarray(m[:, 0], np.float64)

        x_norm = np.asarray(scaler_x.transform(x_phys), np.float32)
        fd = _fd_jacobian(mean_norm, x_norm, eps=3e-3)
        np.testing.assert_allclose(rep.jac_norm, fd, atol=2e-3)

    def test_physical_chain_rule_vs_fd(self, setup):
        """jac_phys must equal FD taken directly in PHYSICAL units —
        the exact affine chain rule, not an approximation."""
        params, x_phys, scaler_x, scaler_y = setup
        rep = input_saliency(params, x_phys, scaler_x, scaler_y)
        s_y = float(np.asarray(scaler_y.scale).ravel()[0])
        m_y = float(np.asarray(scaler_y.min).ravel()[0])

        def v_phys(xp):
            xn = scaler_x.transform(xp.astype(np.float32))
            m, _ = mlp_forward(params, jnp.asarray(xn), train=False,
                               precision="highest")
            return (np.asarray(m[:, 0], np.float64) - m_y) / s_y

        # eps per channel scaled to its range so FD stays well-conditioned
        span = np.asarray(scaler_x.data_max - scaler_x.data_min, float)
        fd = np.zeros_like(x_phys, dtype=np.float64)
        for j in range(8):
            eps = FD_EPS_FACTOR * span[j]
            xp = x_phys.astype(np.float64).copy()
            xm = xp.copy()
            xp[:, j] += eps
            xm[:, j] -= eps
            fd[:, j] = (v_phys(xp) - v_phys(xm)) / (2 * eps)
        scale = np.abs(rep.jac_phys).max()
        np.testing.assert_allclose(rep.jac_phys, fd, atol=3e-3 * scale)
        # range calibration is exactly jac_phys × training span
        np.testing.assert_allclose(
            rep.jac_range, rep.jac_phys * span[None, :], rtol=1e-5
        )

    def test_sigma_head_vs_fd(self, setup):
        params, x_phys, scaler_x, scaler_y = setup
        rep = input_saliency(params, x_phys, scaler_x, scaler_y)
        s_y = float(np.asarray(scaler_y.scale).ravel()[0])
        span = np.asarray(scaler_x.data_max - scaler_x.data_min, float)

        def sigma_phys(xp):
            xn = scaler_x.transform(xp.astype(np.float32))
            _, lv = mlp_forward(params, jnp.asarray(xn), train=False,
                                precision="highest")
            return np.exp(0.5 * np.asarray(lv[:, 0], np.float64)) / s_y

        fd = np.zeros_like(x_phys, dtype=np.float64)
        for j in range(8):
            eps = FD_EPS_FACTOR * span[j]
            xp = x_phys.astype(np.float64).copy()
            xm = xp.copy()
            xp[:, j] += eps
            xm[:, j] -= eps
            fd[:, j] = (sigma_phys(xp) - sigma_phys(xm)) / (2 * eps)
        expected = fd * span[None, :]
        scale = max(np.abs(expected).max(), 1e-12)
        np.testing.assert_allclose(rep.sigma_jac_range, expected,
                                   atol=SIGMA_ATOL_FACTOR * scale)

    def test_per_sample_rows_independent(self, setup):
        """The batch-sum gradient trick is exact only because sample n's
        output ignores every other row — changing row k must leave all
        other Jacobian rows bit-unchanged."""
        params, x_phys, scaler_x, scaler_y = setup
        rep_a = input_saliency(params, x_phys, scaler_x, scaler_y)
        x_mut = x_phys.copy()
        x_mut[5] = x_mut[5] * 1.5 + 1.0
        rep_b = input_saliency(params, x_mut, scaler_x, scaler_y)
        keep = np.arange(len(x_phys)) != 5
        np.testing.assert_array_equal(rep_a.jac_norm[keep],
                                      rep_b.jac_norm[keep])
        assert not np.allclose(rep_a.jac_norm[5], rep_b.jac_norm[5])

    def test_pinn_params_accepted(self, setup):
        """A full PinnParams dict (with the 'mlp' sub-tree) works too —
        what cli explain passes straight from the checkpoint."""
        params, x_phys, scaler_x, scaler_y = setup
        rep_mlp = input_saliency(params, x_phys, scaler_x, scaler_y)
        rep_pinn = input_saliency({"mlp": params, "lam_v": jnp.ones(4)},
                                  x_phys, scaler_x, scaler_y)
        np.testing.assert_array_equal(rep_mlp.jac_norm, rep_pinn.jac_norm)

    def test_bad_shape_raises(self, setup):
        params, x_phys, scaler_x, scaler_y = setup
        with pytest.raises(ValueError, match="must be"):
            input_saliency(params, x_phys[:, :5], scaler_x, scaler_y)


class TestAggregation:
    def test_class_mean(self, setup):
        params, x_phys, scaler_x, scaler_y = setup
        labels = np.zeros(len(x_phys), int)
        labels[20:40] = 1
        labels[40:] = 5
        rep = input_saliency(params, x_phys, scaler_x, scaler_y,
                             labels=labels)
        means = class_mean_saliency(rep)
        assert set(means) == {0, 1, 5}
        np.testing.assert_allclose(
            means[1], np.abs(rep.jac_range[20:40]).mean(axis=0), rtol=1e-6
        )

    def test_coarse_class_names(self, setup):
        """Detail labels 1-12 fold into the four FAULT_RANGE_MAP families
        (04:75-80) under their English names; absent classes are omitted."""
        params, x_phys, scaler_x, scaler_y = setup
        labels = np.zeros(len(x_phys), int)
        labels[10:20] = 2  # 水淹 / Flooding (range 1-3)
        labels[20:30] = 3
        labels[30:40] = 11  # 氢饥饿 / Hydrogen starvation (range 10-12)
        rep = input_saliency(params, x_phys, scaler_x, scaler_y,
                             labels=labels)
        table = coarse_class_saliency(rep)
        assert set(table) == {"normal", "Flooding", "Hydrogen starvation"}
        np.testing.assert_allclose(
            table["Flooding"],
            np.abs(rep.jac_range[10:30]).mean(axis=0), rtol=1e-6,
        )

    def test_no_labels_raises(self, setup):
        params, x_phys, scaler_x, scaler_y = setup
        rep = input_saliency(params, x_phys, scaler_x, scaler_y)
        with pytest.raises(ValueError, match="labels"):
            class_mean_saliency(rep)


class TestExplainCli:
    def test_cli_explain(self, tmp_path, setup, capsys):
        import scipy.io

        from pinnfc_tpu.cli import main
        from pinnfc_tpu.utils import save_checkpoint

        params, x_phys, scaler_x, scaler_y = setup
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, {"mlp": params}, scaler_x, scaler_y)

        n = len(x_phys)
        arr = np.zeros((n, 22))
        arr[:, :8] = x_phys
        arr[32:, 17] = 4  # 氧饥饿 / Oxygen starvation
        mat = str(tmp_path / "F01.mat")
        scipy.io.savemat(mat, {"comprehensive_results": arr})

        figs = str(tmp_path / "figs")
        assert main(["explain", "--ckpt", ckpt, "--mat", mat,
                     "--plot-dir", figs]) == 0
        out = capsys.readouterr().out
        assert "driver" in out and "Oxygen starvation" in out
        assert os.path.exists(os.path.join(figs, "saliency_voltage.png"))
        assert os.path.exists(os.path.join(figs, "saliency_sigma.png"))

        assert main(["explain", "--ckpt", ckpt, "--mat", mat,
                     "--json"]) == 0
        payload = json.loads(capsys.readouterr().out)
        assert payload["channels"] == list(INPUT_CHANNELS)
        assert set(payload["classes"]) == {"normal", "Oxygen starvation"}
        cls = payload["classes"]["Oxygen starvation"]
        assert cls["driver"] in INPUT_CHANNELS
        assert len(cls["voltage"]) == 8 and len(cls["sigma"]) == 8
        # strict JSON already enforced by allow_nan=False in the CLI

        if jax.device_count() >= 2:
            # --data-parallel shards the Jacobian rows and must reproduce
            # the single-device class table exactly-ish (row independence)
            assert main(["explain", "--ckpt", ckpt, "--mat", mat,
                         "--json", "--data-parallel"]) == 0
            raw = capsys.readouterr().out
            dp = json.loads(raw[raw.index("{"):])  # skip the mesh banner
            for name, cls in payload["classes"].items():
                np.testing.assert_allclose(
                    dp["classes"][name]["voltage"], cls["voltage"],
                    rtol=0, atol=1e-6,
                )
