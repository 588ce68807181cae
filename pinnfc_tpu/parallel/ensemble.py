"""Many-seed PINN ensembles and sharded MC-dropout sweeps.

TPU-native additions (SURVEY §2.6): the reference trains one seed and loops
MC samples serially (01:1443-1464).  Here:

- ``init_ensemble`` / ``train_dnn_ensemble`` — E independent models live as
  one stacked pytree (leading ensemble axis) and train simultaneously via
  ``vmap`` over the whole stage scan; sharding the ensemble axis over the
  mesh gives embarrassingly-parallel multi-chip scaling with zero
  communication.
- ``mc_dropout_sharded`` — MC-dropout where the *data* axis is sharded over
  the mesh: each chip runs all samples for its rows; the per-row statistics
  need no cross-chip reduction at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pinnfc_tpu.models.pinn import init_pinn
from pinnfc_tpu.training.stages import train_dnn_stage
from pinnfc_tpu.uq.mc_dropout import MCSamples, mc_dropout_samples
from pinnfc_tpu.parallel.mesh import batch_sharding


def init_ensemble(key: jax.Array, n_models: int, layers=(8, 256, 256, 256, 1)):
    """Stacked PINN params with a leading ensemble axis on every leaf."""
    keys = jax.random.split(key, n_models)
    return jax.vmap(lambda k: init_pinn(k, layers))(keys)


def train_dnn_ensemble(
    ensemble_params,
    x: jnp.ndarray,
    y: jnp.ndarray,
    rng: jax.Array,
    n_iter: int,
    mesh=None,
    lr: float = 0.01,
    dropout_p: float = 0.2,
):
    """Train every ensemble member's MLP simultaneously.

    With a mesh, the ensemble axis is sharded over 'data' (one chip per
    member group) — pure SPMD, no collectives."""
    n_models = jax.tree_util.tree_leaves(ensemble_params["mlp"])[0].shape[0]
    keys = jax.random.split(rng, n_models)

    def train_one(mlp_params, key):
        res = train_dnn_stage(
            mlp_params, x, y, key, n_iter=n_iter, lr=lr, dropout_p=dropout_p
        )
        return res.params, res.losses

    if mesh is not None:
        model_sh = NamedSharding(mesh, P("data"))
        ensemble_params = {
            **ensemble_params,
            "mlp": jax.tree_util.tree_map(
                lambda a: jax.device_put(
                    a, NamedSharding(mesh, P(*(("data",) + (None,) * (a.ndim - 1))))
                ),
                ensemble_params["mlp"],
            ),
        }
        keys = jax.device_put(keys, model_sh)

    mlps, losses = jax.vmap(train_one)(ensemble_params["mlp"], keys)
    return {**ensemble_params, "mlp": mlps}, losses


def train_dnn_ensemble_2d(
    ensemble_params,
    x: jnp.ndarray,
    y: jnp.ndarray,
    rng: jax.Array,
    n_iter: int,
    mesh,
    lr: float = 0.01,
    dropout_p: float = 0.2,
):
    """Hybrid 2-D parallel ensemble training over a ('model', 'data') mesh.

    Ensemble members are sharded over the 'model' axis (zero communication
    between members) while each member's full-batch rows are sharded over
    the 'data' axis — XLA inserts the gradient all-reduce (ICI psum) along
    'data' inside every vmapped member.  This is the layout for scaling
    BOTH the seed sweep and the per-member batch past one chip: e.g. a
    4×2 mesh trains 4 member groups, each data-parallel over 2 chips.

    Numerics are identical to the unsharded ``train_dnn_ensemble`` (mean-
    loss gradients are exact under row sharding)."""
    n_models = jax.tree_util.tree_leaves(ensemble_params["mlp"])[0].shape[0]
    keys = jax.random.split(rng, n_models)

    model_first = lambda a: NamedSharding(
        mesh, P(*(("model",) + (None,) * (a.ndim - 1)))
    )
    mlp = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, model_first(a)), ensemble_params["mlp"]
    )
    keys = jax.device_put(keys, NamedSharding(mesh, P("model")))
    x = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    y = jax.device_put(y, NamedSharding(mesh, P("data", None)))

    def train_one(mlp_params, key):
        res = train_dnn_stage(
            mlp_params, x, y, key, n_iter=n_iter, lr=lr, dropout_p=dropout_p
        )
        return res.params, res.losses

    mlps, losses = jax.vmap(train_one)(mlp, keys)
    return {**ensemble_params, "mlp": mlps}, losses


def train_pinn_ensemble(
    ensemble_params,
    x: jnp.ndarray,
    y: jnp.ndarray,
    rng: jax.Array,
    scaler_x,
    scaler_y,
    schedule=None,
    dropout_p: float = 0.2,
):
    """Run the FULL staged schedule for every ensemble member simultaneously
    (the many-seed PINN sweep): each stage's jitted scan is vmapped over the
    member axis, data broadcast.  Returns (stacked params, {stage: losses
    (E, n_iter)})."""
    from pinnfc_tpu.config import default_schedule
    from pinnfc_tpu.models.mlp import mlp_forward
    from pinnfc_tpu.training.stages import (
        train_lambda_v_stage,
        train_residual_stage,
    )

    schedule = default_schedule() if schedule is None else schedule
    n_models = jax.tree_util.tree_leaves(ensemble_params["mlp"])[0].shape[0]
    params = dict(ensemble_params)
    losses = {}
    group_of = {"thermal": "lam_t", "hydrogen": "lam_h", "oxygen": "lam_o"}

    for k, stage in enumerate(schedule):
        if stage.name == "dnn":
            keys = jax.random.split(jax.random.fold_in(rng, k), n_models)

            def one_dnn(mlp, key):
                return train_dnn_stage(
                    mlp, x, y, key, n_iter=stage.n_iter, lr=stage.lr,
                    lr_step=stage.lr_step, lr_gamma=stage.lr_gamma,
                    dropout_p=dropout_p,
                )

            res = jax.vmap(one_dnn)(params["mlp"], keys)
            params["mlp"] = res.params
        elif stage.name == "lambda_v":
            def one_lam_v(mlp, lam_v):
                u_pred, _ = mlp_forward(mlp, x, train=False)
                return train_lambda_v_stage(
                    lam_v, x, y, u_pred, scaler_x, scaler_y,
                    n_iter=stage.n_iter, lr=stage.lr, lr_step=stage.lr_step,
                    lr_gamma=stage.lr_gamma, dnn_para=stage.dnn_para,
                )

            res = jax.vmap(one_lam_v)(params["mlp"], params["lam_v"])
            params["lam_v"] = res.params
        else:
            group = group_of[stage.name]

            def one_res(lam):
                return train_residual_stage(
                    lam, x, scaler_x, group, n_iter=stage.n_iter, lr=stage.lr,
                    lr_step=stage.lr_step, lr_gamma=stage.lr_gamma,
                )

            res = jax.vmap(one_res)(params[group])
            params[group] = res.params
        losses[f"{k}:{stage.name}"] = res.losses
    return params, losses


def ensemble_predict(ensemble_params, x: jnp.ndarray):
    """(E, N, 1) stacked eval-mode predictions."""
    from pinnfc_tpu.models.mlp import mlp_forward

    def one(mlp):
        return mlp_forward(mlp, x, train=False)[0]

    return jax.vmap(one)(ensemble_params["mlp"])


def mc_dropout_sharded(
    mlp_params,
    x: jnp.ndarray,
    rng: jax.Array,
    mesh,
    mc_times: int = 2000,
    dropout: float = 0.4,
    chunk: int = 100,
) -> MCSamples:
    """MC-dropout with rows sharded over the mesh 'data' axis.

    Each device computes full MC statistics for its row shard — the
    per-row outputs (mean/ale/epi) keep the same sharding, so the only
    communication is the final host gather."""
    x = jax.device_put(x, batch_sharding(mesh))
    params = jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), mlp_params
    )
    return mc_dropout_samples(
        params, x, rng, mc_times=mc_times, dropout=dropout, chunk=chunk
    )
