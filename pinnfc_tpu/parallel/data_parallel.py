"""Data-parallel PINN training over a device mesh.

TPU-native addition (the reference is single-process full-batch,
01:948-955).  The combined train step evaluates **every** loss of the staged
schedule — aleatoric DNN loss, voltage-λ residual loss, thermal / hydrogen /
oxygen residual losses — on a batch whose rows are sharded over the 'data'
mesh axis, applies per-group Adam updates and the λ box clamps.  Parameters
are replicated; XLA turns the mean-loss gradients into ICI all-reduces
(psum) automatically under ``jit`` with these shardings.

This is also the multi-chip dry-run entry point (`__graft_entry__.
dryrun_multichip`): it compiles and executes on an N-virtual-device CPU mesh.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.mlp import aleatoric_loss, mlp_forward
from pinnfc_tpu.models.pinn import LAMBDA_BOUNDS, PinnParams
from pinnfc_tpu.physics.hydrogen import hydrogen_residual
from pinnfc_tpu.physics.oxygen import oxygen_residual
from pinnfc_tpu.physics.thermal import thermal_residual_simple
from pinnfc_tpu.physics.voltage import voltage_residual

GROUPS = ("mlp", "lam_v", "lam_t", "lam_h", "lam_o")


class DPTrainState(NamedTuple):
    params: PinnParams
    opt_states: Tuple  # one optax state per group, in GROUPS order


def make_dp_optimizers(
    lr_mlp=0.01, lr_v=1e-3, lr_t=1.0, lr_h=1e-1, lr_o=1e-2
):
    return {
        "mlp": optax.adam(lr_mlp),
        "lam_v": optax.adam(lr_v),
        "lam_t": optax.adam(lr_t),
        "lam_h": optax.adam(lr_h),
        "lam_o": optax.adam(lr_o),
    }


def init_dp_state(params: PinnParams, opts) -> DPTrainState:
    return DPTrainState(
        params=params,
        opt_states=tuple(opts[g].init(params[g]) for g in GROUPS),
    )


def full_train_step(
    state: DPTrainState,
    x: jnp.ndarray,
    y: jnp.ndarray,
    key: jax.Array,
    scaler_x: AffineScaler,
    scaler_y: AffineScaler,
    opts,
    dropout_p: float = 0.2,
) -> Tuple[DPTrainState, dict]:
    """One combined step updating all five parameter groups."""
    params = state.params

    def dnn_loss(mlp):
        pred, log_var = mlp_forward(mlp, x, dropout_p=dropout_p, train=True, rng=key)
        return aleatoric_loss(y, pred, log_var)

    u_eval, _ = mlp_forward(params["mlp"], x, train=False)

    def lam_v_loss(lam):
        return jnp.mean(voltage_residual(lam, x, u_eval, scaler_x, scaler_y).f ** 2)

    def lam_t_loss(lam):
        return jnp.mean(thermal_residual_simple(lam, x, scaler_x).f ** 2)

    def lam_h_loss(lam):
        return jnp.mean(hydrogen_residual(lam, x, scaler_x).f ** 2)

    def lam_o_loss(lam):
        return jnp.mean(oxygen_residual(lam, x, scaler_x).f ** 2)

    losses = {}
    new_params = dict(params)
    new_opt_states = []
    loss_fns = {
        "mlp": dnn_loss,
        "lam_v": lam_v_loss,
        "lam_t": lam_t_loss,
        "lam_h": lam_h_loss,
        "lam_o": lam_o_loss,
    }
    for g, opt_state in zip(GROUPS, state.opt_states):
        loss, grads = jax.value_and_grad(loss_fns[g])(params[g])
        updates, opt_state = opts[g].update(grads, opt_state, params[g])
        p = optax.apply_updates(params[g], updates)
        if g in LAMBDA_BOUNDS:
            lo, hi = LAMBDA_BOUNDS[g]
            p = jnp.clip(p, jnp.asarray(lo), jnp.asarray(hi))
        new_params[g] = p
        new_opt_states.append(opt_state)
        losses[g] = loss

    return DPTrainState(new_params, tuple(new_opt_states)), losses
