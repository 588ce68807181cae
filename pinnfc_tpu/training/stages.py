"""Staged freeze/unfreeze PINN training as jitted scan loops.

The reference trains in five stages driven from ``__main__`` (01:2143-2153):

    train_dnn(4001) → train_lambda(4001, False) → train_lambda(4001, True)
    → train_dnn(8001) → train_thermal(10001) → train_hydrogen(8001)
    → train_oxygen(8001)

Each reference stage is a full-batch Python loop: forward → backward → Adam →
clamp → StepLR (01:929-1399) — 42,007 separate graph launches.  Here every
stage is ONE ``jax.lax.scan`` under ``jit``: the entire stage compiles to a
single device program, the data never leaves HBM, and the Adam/clamp/LR-decay
math fuses into the step.

Gradient-flow identities exploited (verified against the reference):

- In ``train_lambda`` the data loss MSE(u, u_pred) has zero gradient w.r.t.
  λ (the optimizer only holds λ1-4, 01:999-1001), and the DNN runs in eval
  mode with frozen weights, so ``u_pred`` is a stage constant — it is
  precomputed once instead of re-evaluated 4001 times (01:1009).  The λ
  update trajectory is numerically identical.
- ``train_thermal/hydrogen/oxygen`` losses never touch the DNN (01:1109,
  01:1357, 01:1207), so those stages optimize only their (k,) λ vector.
- The DNN stages never touch λ (01:934-937), so they optimize only the MLP
  pytree, with dropout active (``dnn.train()``, 01:946) — one fresh PRNG
  key per step.

Optimizer parity: torch ``Adam(lr, betas=(0.9,0.999), eps=1e-8)`` with
``StepLR(1000, γ)`` stepped after each update equals
``optax.adam`` + ``optax.exponential_decay(staircase=True)``.  The post-step
hard clamps (01:1040-1047 etc.) are box projections applied inside the scan.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pinnfc_tpu.config import default_schedule
from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.mlp import aleatoric_loss, mlp_forward
from pinnfc_tpu.models.pinn import LAMBDA_BOUNDS, PinnParams
from pinnfc_tpu.physics.hydrogen import hydrogen_residual
from pinnfc_tpu.physics.oxygen import oxygen_residual
from pinnfc_tpu.physics.thermal import thermal_residual_simple
from pinnfc_tpu.physics.voltage import voltage_residual


class StageResult(NamedTuple):
    params: PinnParams
    losses: jnp.ndarray  # per-step loss trace (n_iter,)


@jax.jit
def _eval_forward(mlp_params, x):
    return mlp_forward(mlp_params, x, train=False)


def _adam(lr: float, step_size: int, gamma: float) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=lr,
        transition_steps=step_size,
        decay_rate=gamma,
        staircase=True,
    )
    return optax.adam(schedule)


# ---------------------------------------------------------------------------
# DNN stage (reference train_dnn, 01:929-964)
# ---------------------------------------------------------------------------

def _keep_if_nonfinite(loss, grads, new, old):
    """Skip-and-continue for numerically blown-up steps — the TPU-native
    equivalent of the reference's try/except-and-continue training loops
    (01:1204-1286, 01:1354-1396; torch raises where JAX silently produces
    NaN, which would otherwise poison params for every remaining step).

    If the step's loss or ANY gradient leaf is non-finite, the parameter
    update AND the optimizer-state advance are both discarded (the
    reference's ``continue`` skips the optimizer step too).  ``where`` on a
    scalar predicate lowers to a select, so on an all-finite trajectory the
    guard passes the updated values through unchanged — but enabling it
    recompiles the stage and XLA may fuse differently, so trajectories agree
    only to fusion-level rounding (~1 ulp/step, measured), not bit-exactly."""
    ok = jnp.isfinite(loss)
    for g in jax.tree_util.tree_leaves(grads):
        ok &= jnp.all(jnp.isfinite(g))
    return jax.tree_util.tree_map(lambda a, b: jnp.where(ok, a, b), new, old)


def _dnn_step(opt, x, y, dropout_p, precision, skip_nonfinite=False):
    """One Adam step on the MLP — shared by the monolithic stage scan and
    the chunked (mid-stage-checkpointed) scan so both run the identical
    per-step program."""

    def loss_fn(p, key):
        pred, log_var = mlp_forward(
            p, x, dropout_p=dropout_p, train=True, rng=key, precision=precision
        )
        return aleatoric_loss(y, pred, log_var)

    def step(carry, key):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, key)
        updates, s2 = opt.update(grads, s, p)
        p2 = optax.apply_updates(p, updates)
        if skip_nonfinite:
            p2, s2 = _keep_if_nonfinite(loss, grads, (p2, s2), (p, s))
        return (p2, s2), loss

    return step


@partial(
    jax.jit,
    static_argnames=(
        "n_iter", "lr", "lr_step", "lr_gamma", "dropout_p", "precision",
        "skip_nonfinite",
    ),
)
def train_dnn_stage(
    mlp_params,
    x: jnp.ndarray,
    y: jnp.ndarray,
    rng: jax.Array,
    n_iter: int,
    lr: float = 0.01,
    lr_step: int = 1000,
    lr_gamma: float = 0.8,
    dropout_p: float = 0.2,
    precision: str = "highest",
    skip_nonfinite: bool = False,
) -> StageResult:
    """Full-batch Adam on the MLP with dropout active and λ frozen.

    ``precision``: 'highest' (6-pass f32 MXU — torch-parity numerics, the
    default) or 'default' (single-pass bf16 MXU inputs — the throughput
    mode; parameters and accumulation stay f32)."""
    opt = _adam(lr, lr_step, lr_gamma)
    step = _dnn_step(opt, x, y, dropout_p, precision, skip_nonfinite)
    keys = jax.random.split(rng, n_iter)
    (mlp_params, _), losses = jax.lax.scan(
        step, (mlp_params, opt.init(mlp_params)), keys
    )
    return StageResult(mlp_params, losses)


@partial(
    jax.jit,
    static_argnames=(
        "n_iter", "length", "lr", "lr_step", "lr_gamma", "dropout_p", "precision",
        "skip_nonfinite",
    ),
)
def train_dnn_chunk(
    mlp_params,
    opt_state,
    x: jnp.ndarray,
    y: jnp.ndarray,
    stage_key: jax.Array,
    start,
    n_iter: int,
    length: int,
    lr: float = 0.01,
    lr_step: int = 1000,
    lr_gamma: float = 0.8,
    dropout_p: float = 0.2,
    precision: str = "highest",
    skip_nonfinite: bool = False,
):
    """``length`` steps of the DNN stage starting at step ``start``, carrying
    Adam + LR-schedule state across chunks.  The dropout key sequence is the
    SAME split the monolithic stage uses (split the stage key ``n_iter``
    ways, then slice), so chunked execution walks the identical trajectory.
    ``start`` is traced (one compiled program serves every full chunk; the
    tail chunk with a different static ``length`` compiles once more)."""
    opt = _adam(lr, lr_step, lr_gamma)
    keys = jax.lax.dynamic_slice_in_dim(
        jax.random.split(stage_key, n_iter), start, length
    )
    step = _dnn_step(opt, x, y, dropout_p, precision, skip_nonfinite)
    (mlp_params, opt_state), losses = jax.lax.scan(
        step, (mlp_params, opt_state), keys
    )
    return mlp_params, opt_state, losses


# ---------------------------------------------------------------------------
# Generic λ-vector stage (voltage / thermal / hydrogen / oxygen)
# ---------------------------------------------------------------------------

def _lambda_step(opt, loss_fn, lo, hi, skip_nonfinite=False):
    """One Adam + box-clamp step on a λ vector — shared by the monolithic
    and chunked scans."""

    def step(carry, _):
        lam, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(lam)
        updates, s2 = opt.update(grads, s, lam)
        lam2 = jnp.clip(optax.apply_updates(lam, updates), lo, hi)
        if skip_nonfinite:
            lam2, s2 = _keep_if_nonfinite(loss, grads, (lam2, s2), (lam, s))
        return (lam2, s2), loss

    return step


def _fit_lambda(
    loss_fn: Callable[[jnp.ndarray], jnp.ndarray],
    lam0: jnp.ndarray,
    bounds: Tuple[jnp.ndarray, jnp.ndarray],
    n_iter: int,
    lr: float,
    lr_step: int,
    lr_gamma: float,
    skip_nonfinite: bool = False,
) -> StageResult:
    """Adam + post-step box clamp over one λ vector, as a single scan."""
    opt = _adam(lr, lr_step, lr_gamma)
    lo, hi = jnp.asarray(bounds[0]), jnp.asarray(bounds[1])
    step = _lambda_step(opt, loss_fn, lo, hi, skip_nonfinite)
    (lam, _), losses = jax.lax.scan(
        step, (lam0, opt.init(lam0)), None, length=n_iter
    )
    return StageResult(lam, losses)


def _scan_lambda_chunk(loss_fn, lam, opt_state, bounds, length, lr, lr_step,
                       lr_gamma, skip_nonfinite=False):
    opt = _adam(lr, lr_step, lr_gamma)
    lo, hi = jnp.asarray(bounds[0]), jnp.asarray(bounds[1])
    step = _lambda_step(opt, loss_fn, lo, hi, skip_nonfinite)
    (lam, opt_state), losses = jax.lax.scan(
        step, (lam, opt_state), None, length=length
    )
    return lam, opt_state, losses


def _lambda_v_loss_fn(x_norm, y_norm, u_pred_norm, scaler_x, scaler_y, dnn_para):
    """Voltage-λ stage loss (01:1025-1032), shared by both scan drivers."""
    scale_y, min_y = scaler_y.loss_affine()

    def loss_fn(lam):
        v = voltage_residual(lam, x_norm, u_pred_norm, scaler_x, scaler_y)
        if dnn_para:
            return jnp.mean(v.f**2)
        v_est_norm = v.v_out_est_stack * scale_y + min_y
        return jnp.mean((y_norm - v_est_norm) ** 2)

    return loss_fn


@partial(
    jax.jit,
    static_argnames=(
        "n_iter", "lr", "lr_step", "lr_gamma", "dnn_para", "skip_nonfinite",
    ),
)
def train_lambda_v_stage(
    lam_v: jnp.ndarray,
    x_norm: jnp.ndarray,
    y_norm: jnp.ndarray,
    u_pred_norm: jnp.ndarray,
    scaler_x: AffineScaler,
    scaler_y: AffineScaler,
    n_iter: int,
    lr: float = 1e-3,
    lr_step: int = 1000,
    lr_gamma: float = 0.8,
    dnn_para: bool = False,
    skip_nonfinite: bool = False,
) -> StageResult:
    """Voltage-λ stage (reference train_lambda, 01:966-1058).

    ``dnn_para=False`` → normalized-domain physics loss
    MSE(y_norm, V_out_est·scale_y + min_y) (01:1025-1032);
    ``dnn_para=True``  → residual loss mean(f²) (01:1029).
    ``u_pred_norm`` is the eval-mode DNN prediction, a stage constant.
    """
    loss_fn = _lambda_v_loss_fn(
        x_norm, y_norm, u_pred_norm, scaler_x, scaler_y, dnn_para
    )
    return _fit_lambda(
        loss_fn, lam_v, LAMBDA_BOUNDS["lam_v"], n_iter, lr, lr_step, lr_gamma,
        skip_nonfinite,
    )


@partial(
    jax.jit,
    static_argnames=(
        "length", "lr", "lr_step", "lr_gamma", "dnn_para", "skip_nonfinite",
    ),
)
def train_lambda_v_chunk(
    lam_v,
    opt_state,
    x_norm,
    y_norm,
    u_pred_norm,
    scaler_x: AffineScaler,
    scaler_y: AffineScaler,
    length: int,
    lr: float = 1e-3,
    lr_step: int = 1000,
    lr_gamma: float = 0.8,
    dnn_para: bool = False,
    skip_nonfinite: bool = False,
):
    """``length`` steps of the voltage-λ stage from carried Adam state (the
    LR-schedule step count lives in ``opt_state``, so StepLR decay continues
    exactly across chunk boundaries)."""
    loss_fn = _lambda_v_loss_fn(
        x_norm, y_norm, u_pred_norm, scaler_x, scaler_y, dnn_para
    )
    return _scan_lambda_chunk(
        loss_fn, lam_v, opt_state, LAMBDA_BOUNDS["lam_v"], length,
        lr, lr_step, lr_gamma, skip_nonfinite,
    )


@partial(
    jax.jit,
    static_argnames=(
        "group", "n_iter", "lr", "lr_step", "lr_gamma", "skip_nonfinite",
    ),
)
def train_residual_stage(
    lam: jnp.ndarray,
    x_norm: jnp.ndarray,
    scaler_x: AffineScaler,
    group: str,
    n_iter: int,
    lr: float,
    lr_step: int = 1000,
    lr_gamma: float = 0.8,
    skip_nonfinite: bool = False,
) -> StageResult:
    """Thermal / hydrogen / oxygen stage: loss = mean(f²) over one λ group
    (reference 01:1060-1399)."""
    residual = {
        "lam_t": thermal_residual_simple,
        "lam_h": hydrogen_residual,
        "lam_o": oxygen_residual,
    }[group]

    def loss_fn(l):
        return jnp.mean(residual(l, x_norm, scaler_x).f ** 2)

    return _fit_lambda(
        loss_fn, lam, LAMBDA_BOUNDS[group], n_iter, lr, lr_step, lr_gamma,
        skip_nonfinite,
    )


@partial(
    jax.jit,
    static_argnames=(
        "group", "length", "lr", "lr_step", "lr_gamma", "skip_nonfinite",
    ),
)
def train_residual_chunk(
    lam,
    opt_state,
    x_norm: jnp.ndarray,
    scaler_x: AffineScaler,
    group: str,
    length: int,
    lr: float,
    lr_step: int = 1000,
    lr_gamma: float = 0.8,
    skip_nonfinite: bool = False,
):
    """``length`` steps of a thermal/hydrogen/oxygen stage from carried
    Adam state (chunked mid-stage checkpointing)."""
    residual = {
        "lam_t": thermal_residual_simple,
        "lam_h": hydrogen_residual,
        "lam_o": oxygen_residual,
    }[group]

    def loss_fn(l):
        return jnp.mean(residual(l, x_norm, scaler_x).f ** 2)

    return _scan_lambda_chunk(
        loss_fn, lam, opt_state, LAMBDA_BOUNDS[group], length,
        lr, lr_step, lr_gamma, skip_nonfinite,
    )


@partial(jax.jit, static_argnames=("lr", "lr_step", "lr_gamma"))
def _opt_init(params, lr: float, lr_step: int, lr_gamma: float):
    """Fresh Adam + schedule state, under jit (an eager tree of zeros_like
    would cost one remote dispatch per leaf on relay-attached TPUs)."""
    return _adam(lr, lr_step, lr_gamma).init(params)


# ---------------------------------------------------------------------------
# Schedule driver (reference __main__ staging, 01:2143-2153)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class TrainLog:
    """Loss traces per executed stage, in order."""

    stages: list = dataclasses.field(default_factory=list)  # (name, losses)

    def add(self, name: str, losses) -> None:
        self.stages.append((name, losses))

    def final_losses(self) -> Dict[str, float]:
        out: Dict[str, float] = {}
        for name, losses in self.stages:
            out[name] = float(losses[-1])
        return out


def run_schedule(
    params: PinnParams,
    x_train: jnp.ndarray,
    y_train: jnp.ndarray,
    scaler_x: AffineScaler,
    scaler_y: AffineScaler,
    schedule=None,
    rng: Optional[jax.Array] = None,
    dropout_p: float = 0.2,
    verbose: bool = False,
    mesh=None,
    checkpoint_dir: Optional[str] = None,
    ckpt_every: Optional[int] = None,
    precision: str = "highest",
    skip_nonfinite: bool = False,
) -> Tuple[PinnParams, TrainLog]:
    """Run the staged schedule, mutating the params pytree stage by stage.

    With ``skip_nonfinite=True``, any step whose loss or gradients are
    non-finite is skipped in place (params and optimizer state untouched) —
    the TPU-native equivalent of the reference's try/except-and-continue
    training loops (01:1204-1286, 01:1354-1396).  An all-finite run takes
    the same update values through the guard's select, but the recompiled
    program may fuse differently (≈1 ulp/step — see _keep_if_nonfinite).

    With ``mesh``, the batch rows are sharded over the mesh's 'data' axis and
    parameters replicated — every stage's jitted scan then runs SPMD with XLA
    inserting the gradient all-reduce (ICI psum); numerics are identical to
    the single-device run (mean-loss gradients are exact under row sharding).
    Rows are edge-padded to a multiple of the axis size; padded rows DO
    perturb mean losses, so pass pre-divisible data for exact parity.

    With ``checkpoint_dir``, parameters are persisted after every stage and a
    restarted run resumes from the first incomplete stage (SURVEY §5:
    checkpoint-restart for long runs).  PRNG keys are derived per stage index
    so the resumed trajectory matches the uninterrupted one.

    With ``ckpt_every=m``, each stage additionally runs as chunks of ``m``
    steps with the Adam + LR-schedule state snapshotted after every chunk —
    a run killed mid-stage resumes at the last chunk boundary and reproduces
    the uninterrupted chunked trajectory bit-for-bit (the per-step program,
    dropout key sequence, and optimizer state are identical; only the scan
    is sliced).  Preemption-safe training for long schedules.
    """
    schedule = default_schedule() if schedule is None else schedule
    rng = jax.random.PRNGKey(0) if rng is None else rng
    log = TrainLog()
    if ckpt_every is not None and ckpt_every < 1:
        raise ValueError(f"ckpt_every must be >= 1, got {ckpt_every}")

    start_stage = 0
    mid_resume = None  # (step, opt pytree-of-lists, losses so far) for start_stage
    ckpt_path = None
    if checkpoint_dir is not None:
        import os

        from pinnfc_tpu.utils.checkpoint import load_params_npz, save_params_npz

        os.makedirs(checkpoint_dir, exist_ok=True)
        ckpt_path = os.path.join(checkpoint_dir, "schedule_ckpt.npz")
        if os.path.exists(ckpt_path):
            payload = load_params_npz(ckpt_path)
            params = payload["params"]
            k0 = int(jnp.asarray(payload["stage"]))
            if k0 >= len(schedule):
                raise ValueError(
                    f"checkpoint at {ckpt_path} was written at stage {k0} but "
                    f"the current schedule has only {len(schedule)} stages — "
                    "the checkpoint does not match this schedule"
                )
            step_done = (
                int(jnp.asarray(payload["step"])) if "step" in payload else None
            )
            if step_done is None or step_done >= schedule[k0].n_iter:
                start_stage = k0 + 1
            else:
                start_stage = k0
                mid_resume = (step_done, payload["opt"], payload["losses"])
            if verbose:
                where = (
                    f"stage {start_stage}"
                    if mid_resume is None
                    else f"stage {k0} step {step_done}"
                )
                print(f"resuming schedule at {where}")

    if mesh is not None:
        import numpy as np

        from pinnfc_tpu.parallel.mesh import (
            batch_sharding,
            pad_to_multiple,
            replicate,
        )

        n_dev = int(np.prod(list(mesh.shape.values())))
        x_np, n0 = pad_to_multiple(np.asarray(x_train), n_dev)
        y_np, _ = pad_to_multiple(np.asarray(y_train), n_dev)
        if x_np.shape[0] != n0 and verbose:
            print(f"padded {n0} → {x_np.shape[0]} rows for {n_dev}-way sharding")
        sh = batch_sharding(mesh)
        x_train = jax.device_put(jnp.asarray(x_np, jnp.float32), sh)
        y_train = jax.device_put(jnp.asarray(y_np, jnp.float32), sh)
        params = replicate(mesh, params)

    group_of = {"thermal": "lam_t", "hydrogen": "lam_h", "oxygen": "lam_o"}

    def _run_stage_chunked(k, stage, params, resume):
        """Execute one stage as ckpt_every-step chunks, snapshotting
        (params, stage, step, opt state, loss trace) after each chunk."""
        import numpy as np

        name = stage.name
        piece_key = (
            "mlp" if name == "dnn"
            else "lam_v" if name == "lambda_v"
            else group_of[name]
        )
        piece = params[piece_key]
        if name == "lambda_v":
            u_pred, _ = _eval_forward(params["mlp"], x_train)
        template = _opt_init(piece, stage.lr, stage.lr_step, stage.lr_gamma)
        opt_state = template
        start, losses_acc = 0, []
        if resume is not None:
            start, opt_nested, losses_prev = resume
            opt_state = jax.tree_util.tree_unflatten(
                jax.tree_util.tree_structure(template),
                jax.tree_util.tree_leaves(opt_nested),
            )
            losses_acc.append(np.asarray(losses_prev))
        key = jax.random.fold_in(rng, k)
        # a mid-stage snapshot must resume correctly even when the caller
        # did not re-pass ckpt_every: finish the stage as one chunk
        every = ckpt_every if ckpt_every is not None else stage.n_iter - start
        s = start
        while s < stage.n_iter:
            m = min(every, stage.n_iter - s)
            if name == "dnn":
                piece, opt_state, losses = train_dnn_chunk(
                    piece, opt_state, x_train, y_train, key, jnp.asarray(s),
                    n_iter=stage.n_iter, length=m, lr=stage.lr,
                    lr_step=stage.lr_step, lr_gamma=stage.lr_gamma,
                    dropout_p=dropout_p, precision=precision,
                    skip_nonfinite=skip_nonfinite,
                )
            elif name == "lambda_v":
                piece, opt_state, losses = train_lambda_v_chunk(
                    piece, opt_state, x_train, y_train, u_pred,
                    scaler_x, scaler_y, length=m, lr=stage.lr,
                    lr_step=stage.lr_step, lr_gamma=stage.lr_gamma,
                    dnn_para=stage.dnn_para, skip_nonfinite=skip_nonfinite,
                )
            else:
                piece, opt_state, losses = train_residual_chunk(
                    piece, opt_state, x_train, scaler_x, piece_key,
                    length=m, lr=stage.lr, lr_step=stage.lr_step,
                    lr_gamma=stage.lr_gamma, skip_nonfinite=skip_nonfinite,
                )
            s += m
            losses_acc.append(np.asarray(losses))
            params = {**params, piece_key: piece}
            if ckpt_path is not None:
                save_params_npz(
                    {
                        "params": params,
                        "stage": jnp.asarray(k),
                        "step": jnp.asarray(s),
                        "opt": opt_state,
                        "losses": np.concatenate(losses_acc),
                    },
                    ckpt_path,
                )
        return params, np.concatenate(losses_acc)

    for k, stage in enumerate(schedule):
        if k < start_stage:
            continue
        resume = mid_resume if k == start_stage else None
        # chunked execution when requested — and ALWAYS for a stage resumed
        # from a mid-stage snapshot, even if this run omitted ckpt_every:
        # the monolithic path would silently retrain the stage from its
        # half-trained params with a fresh optimizer (neither trajectory)
        if ckpt_every is not None or resume is not None:
            params, losses = _run_stage_chunked(k, stage, params, resume)
            log.add(f"{k}:{stage.name}", losses)
            if verbose:
                print(
                    f"stage {k} [{stage.name:9s}] {stage.n_iter:6d} steps  "
                    f"loss {float(losses[0]):.3e} → {float(losses[-1]):.3e}"
                )
            continue
        if stage.name == "dnn":
            # per-stage key derived from the stage index so a resumed run
            # reproduces the uninterrupted trajectory
            key = jax.random.fold_in(rng, k)
            res = train_dnn_stage(
                params["mlp"], x_train, y_train, key,
                n_iter=stage.n_iter, lr=stage.lr, lr_step=stage.lr_step,
                lr_gamma=stage.lr_gamma, dropout_p=dropout_p,
                precision=precision, skip_nonfinite=skip_nonfinite,
            )
            params = {**params, "mlp": res.params}
        elif stage.name == "lambda_v":
            # eval-mode prediction is constant through this stage (01:967);
            # jitted: one program instead of an eager op chain (expensive
            # through a remote-dispatch relay)
            u_pred, _ = _eval_forward(params["mlp"], x_train)
            res = train_lambda_v_stage(
                params["lam_v"], x_train, y_train, u_pred, scaler_x, scaler_y,
                n_iter=stage.n_iter, lr=stage.lr, lr_step=stage.lr_step,
                lr_gamma=stage.lr_gamma, dnn_para=stage.dnn_para,
                skip_nonfinite=skip_nonfinite,
            )
            params = {**params, "lam_v": res.params}
        elif stage.name in group_of:
            group = group_of[stage.name]
            res = train_residual_stage(
                params[group], x_train, scaler_x, group,
                n_iter=stage.n_iter, lr=stage.lr, lr_step=stage.lr_step,
                lr_gamma=stage.lr_gamma, skip_nonfinite=skip_nonfinite,
            )
            params = {**params, group: res.params}
        else:
            raise ValueError(f"unknown stage '{stage.name}'")
        log.add(f"{k}:{stage.name}", res.losses)
        if ckpt_path is not None:
            save_params_npz({"params": params, "stage": jnp.asarray(k)}, ckpt_path)
        if verbose:
            print(
                f"stage {k} [{stage.name:9s}] {stage.n_iter:6d} steps  "
                f"loss {float(res.losses[0]):.3e} → {float(res.losses[-1]):.3e}"
            )
    return params, log
