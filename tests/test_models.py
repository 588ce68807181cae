"""Model core: architecture parity vs a torch transcription of the reference
DNN (01:389-438), dropout statistics, loss parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pinnfc_tpu.models import aleatoric_loss, init_mlp, mlp_forward, init_pinn
from pinnfc_tpu.models.pinn import LAMBDA_BOUNDS, LAMBDA_INIT, clamp_lambdas


def torch_reference_dnn(params):
    """Build the reference architecture in torch and load our params into it."""
    torch = pytest.importorskip("torch")
    import torch.nn as nn
    import torch.nn.functional as tF

    class DNN(nn.Module):
        def __init__(self, layers=(8, 256, 256, 256, 1), p=0.2):
            super().__init__()
            mods = []
            for i in range(len(layers) - 2):
                mods += [nn.Linear(layers[i], layers[i + 1]), nn.Tanh(), nn.Dropout(p)]
            self.trunk = nn.Sequential(*mods)
            self.predict = nn.Linear(layers[-2], layers[-1])
            self.var_layers = nn.Sequential(
                nn.Linear(layers[-2], layers[-2] // 2),
                nn.Tanh(),
                nn.Dropout(p),
                nn.Linear(layers[-2] // 2, layers[-2] // 4),
                nn.Tanh(),
                nn.Linear(layers[-2] // 4, layers[-1]),
            )

        def forward(self, x):
            h = self.trunk(x)
            out = self.predict(h)
            lv = torch.log(tF.softplus(self.var_layers(h)) + 1e-6)
            return out, lv

    net = DNN()
    with torch.no_grad():
        linears = [m for m in net.trunk if isinstance(m, nn.Linear)]
        for lin, p in zip(linears, params["hidden"]):
            lin.weight.copy_(torch.tensor(np.asarray(p["w"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(p["b"])))
        net.predict.weight.copy_(torch.tensor(np.asarray(params["mean"]["w"]).T))
        net.predict.bias.copy_(torch.tensor(np.asarray(params["mean"]["b"])))
        vlin = [m for m in net.var_layers if isinstance(m, nn.Linear)]
        for lin, p in zip(vlin, params["var"]):
            lin.weight.copy_(torch.tensor(np.asarray(p["w"]).T))
            lin.bias.copy_(torch.tensor(np.asarray(p["b"])))
    net.eval()
    return net


def test_forward_matches_torch_eval():
    torch = pytest.importorskip("torch")
    params = init_mlp(jax.random.PRNGKey(7))
    net = torch_reference_dnn(params)

    x = np.random.RandomState(0).randn(64, 8).astype(np.float32)
    mean_j, lv_j = mlp_forward(params, jnp.asarray(x), train=False)
    with torch.no_grad():
        mean_t, lv_t = net(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(mean_j), mean_t.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(lv_j), lv_t.numpy(), atol=2e-4)


def test_aleatoric_loss_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.RandomState(1)
    y, yp, lv = (rng.randn(100, 1).astype(np.float32) for _ in range(3))
    ours = float(aleatoric_loss(jnp.asarray(y), jnp.asarray(yp), jnp.asarray(lv)))
    ty, typ, tlv = map(torch.tensor, (y, yp, lv))
    prec = torch.exp(-tlv)
    ref = torch.mean(0.5 * prec * (ty - typ) ** 2 + 0.5 * tlv)
    ref = ref + 0.01 * torch.mean(torch.abs(tlv))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)


def test_dropout_statistics():
    """Train-mode dropout keeps expectation and zeroes ~p of activations."""
    params = init_mlp(jax.random.PRNGKey(0))
    x = jnp.ones((512, 8)) * 0.3
    outs = []
    for s in range(8):
        m, _ = mlp_forward(
            params, x, train=True, dropout_p=0.5, rng=jax.random.PRNGKey(s)
        )
        outs.append(np.asarray(m))
    m_eval, _ = mlp_forward(params, x, train=False)
    # stochastic mean over masks approximates eval output loosely
    stacked = np.stack(outs)
    assert stacked.std(axis=0).mean() > 1e-3  # masks differ per key
    # distinct keys give distinct outputs
    assert not np.allclose(outs[0], outs[1])


def test_dropout_rate_override_changes_variance():
    params = init_mlp(jax.random.PRNGKey(0))
    x = jnp.ones((256, 8)) * 0.1

    def spread(p):
        ms = [
            np.asarray(
                mlp_forward(params, x, train=True, dropout_p=p, rng=jax.random.PRNGKey(s))[0]
            )
            for s in range(16)
        ]
        return np.stack(ms).std(axis=0).mean()

    assert spread(0.4) > spread(0.05)  # MC override (01:1448-1454) semantics


def test_logvar_false_returns_zeros():
    params = init_mlp(jax.random.PRNGKey(0))
    x = jnp.ones((4, 8))
    _, lv = mlp_forward(params, x, train=False, logvar=False)
    assert np.all(np.asarray(lv) == 0.0)


def test_pinn_init_and_clamp():
    params = init_pinn(jax.random.PRNGKey(0))
    for g, init in LAMBDA_INIT.items():
        np.testing.assert_allclose(np.asarray(params[g]), init)
    # push out of bounds then clamp back
    params["lam_o"] = jnp.asarray([100.0, -100.0, 5000.0, -5.0])
    clamped = clamp_lambdas(params, groups=("lam_o",))
    lo, hi = LAMBDA_BOUNDS["lam_o"]
    assert np.all(np.asarray(clamped["lam_o"]) >= lo)
    assert np.all(np.asarray(clamped["lam_o"]) <= hi)
    np.testing.assert_allclose(
        np.asarray(clamped["lam_o"]), [8.0, -20.0, 1000.0, 0.0]
    )
