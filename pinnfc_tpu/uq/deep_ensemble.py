"""Deep-ensemble epistemic UQ (beyond-reference estimator).

The reference's only epistemic-uncertainty estimator is MC dropout
(01_train_pinn_multiphysics_model.py:1413-1491).  The many-seed ensembles
that ``parallel.ensemble`` already trains in one vmapped device program
give the standard alternative (Lakshminarayanan et al., NeurIPS 2017):
treat the E member heads as an equal-weight Gaussian mixture and decompose
its moments —

    pred_mean      = mean_e  mu_e
    aleatoric_std  = sqrt( mean_e  exp(log_var_e) )      (within-member)
    epistemic_std  = sqrt( pop-var_e  mu_e )             (between-member)

Results come back as the same :class:`~pinnfc_tpu.uq.mc_dropout.MCSamples`
bundle, so every downstream consumer (uncertainty figures, conformal
scores, serving heads) accepts either estimator unchanged.  The artifact
exporter intentionally stays on MC dropout — columns 10/11 of
``F01_output.mat`` are part of the reference contract.

One eval-mode pass per member (no sampling), so the whole estimate is a
single jitted program: E batched (N, 256) matmuls on the MXU.  Member
means use population variance to mirror the MC sampler's convention.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pinnfc_tpu.models.mlp import mlp_forward
from pinnfc_tpu.uq.mc_dropout import MCSamples


def _member_heads(ensemble_params, x: jnp.ndarray):
    """(E, N) stacked eval-mode (mean, log_var) heads."""

    def one(mlp):
        mu, log_var = mlp_forward(mlp, x, train=False)
        return mu[:, 0], log_var[:, 0]

    return jax.vmap(one)(ensemble_params["mlp"])


@jax.jit
def ensemble_moments(ensemble_params, x: jnp.ndarray) -> MCSamples:
    """Mixture-moment UQ from a stacked ensemble (normalized domain, (N,)).

    ``ensemble_params`` is the stacked pytree from ``parallel.init_ensemble``
    / ``train_dnn_ensemble`` / ``train_pinn_ensemble`` (leading member axis
    on every ``"mlp"`` leaf).
    """
    mu, log_var = _member_heads(ensemble_params, x)
    mean = jnp.mean(mu, axis=0)
    ale_var = jnp.mean(jnp.exp(log_var), axis=0)
    # centered form: E[mu^2] - mean^2 cancels catastrophically in f32 when
    # members agree (same lesson as mc_dropout's base-centred moments)
    epi_var = jnp.mean((mu - mean[None, :]) ** 2, axis=0)
    return MCSamples(
        pred_mean=mean,
        aleatoric_std=jnp.sqrt(ale_var),
        epistemic_std=jnp.sqrt(epi_var),
    )


def ensemble_moments_sharded(ensemble_params, x: jnp.ndarray, mesh) -> MCSamples:
    """``ensemble_moments`` with rows sharded over the mesh 'data' axis.

    Members replicate on every device; each device reduces the member axis
    locally for its row shard, so the program is collective-free (the same
    layout argument as ``parallel.ensemble.mc_dropout_sharded``).  Rows are
    edge-padded to the data-axis multiple and trimmed after — exact, because
    every per-row statistic is row-independent.
    """
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pinnfc_tpu.parallel.mesh import batch_sharding, pad_to_multiple

    x_pad, n0 = pad_to_multiple(np.asarray(x), mesh.shape["data"])
    x_dev = jax.device_put(jnp.asarray(x_pad, jnp.float32), batch_sharding(mesh))
    params = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), ensemble_params
    )
    mc = ensemble_moments(params, x_dev)
    host = jax.device_get(mc)
    return MCSamples(
        pred_mean=jnp.asarray(host.pred_mean[:n0]),
        aleatoric_std=jnp.asarray(host.aleatoric_std[:n0]),
        epistemic_std=jnp.asarray(host.epistemic_std[:n0]),
    )
