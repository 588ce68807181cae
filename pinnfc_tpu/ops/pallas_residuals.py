"""Fused 4-residual physics kernel (Pallas TPU).

One kernel evaluates all four physics residual models — voltage (01:724-765),
thermal-simple (01:869-914), hydrogen (01:621-722), oxygen (01:535-619) —
plus the four physics-output channels of the 22-column exporter, in a single
pass over the data: the de-normalized inputs are computed once in VMEM and
reused by all four models, where the reference de-normalizes (through CPU
numpy!) four separate times (01:726, 01:879, 01:629, 01:542).

Layout: data is processed transposed, ``(8, N)``, so the sample axis lies on
TPU lanes (128-wide) and the 8 feature channels sit on sublanes — one f32
(8, 128) tile per 128 samples.  Outputs are the 8 exporter channels in the
same layout.  Everything is VPU element-wise work; scalar parameters
(17 λ's + scaler-Y constants) ride in SMEM.

The jnp reference implementation (`pinnfc_tpu.physics.all_residuals`) is the
parity oracle; `tests/test_pallas.py` asserts agreement.

STATUS — retired demonstrator (closed in round 2, PERFORMANCE.md):
- at HBM scale XLA's fused elementwise loops win (1.04 vs 0.71 G rows/s;
  the kernel pays one extra HBM pass for the (8, N) lane transpose);
- the other candidate payoff — fusing the residual into a VMEM-resident
  λ-stage trainer (the `ops.pallas_train` pattern) — is moot by
  measurement: the XLA λ-stage scans already run at 35-46k steps/s on a
  v5e (benchmarks/lambda_bench.py), so ALL 26,003 λ-steps of the reference
  schedule cost ~0.66 s next to ~8 s of DNN stages.  The production paths
  stay jnp (`physics.all_residuals`, `training.stages`); this kernel
  remains a verified layout/parity study.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.physics import constants as C
from pinnfc_tpu.physics.residuals import ResidualBundle

# output channel order
_OUT_CHANNELS = ("f_v", "f_t", "f_h", "f_o", "v_phys_stack", "t_phys", "ratio_h", "ratio_o")
_BLOCK_N = 8192


def _residual_kernel(scal_ref, xt_ref, ut_ref, sx_ref, out_ref):
    """scal_ref: SMEM (19,) = [lam_v(4), lam_t(5), lam_h(4), lam_o(4),
    scale_y, min_y]; xt_ref: VMEM (8, BN) normalized inputs (transposed);
    ut_ref: VMEM (1, BN) normalized DNN prediction; sx_ref: VMEM (8, 2)
    [scale_x | min_x]; out_ref: VMEM (8, BN)."""
    x = xt_ref[:]  # (8, BN)
    scale_x = sx_ref[:, 0:1]  # (8, 1)
    min_x = sx_ref[:, 1:2]
    real = (x - min_x) / scale_x  # de-normalize once, reused by all models

    i_raw = real[0:1, :]
    m_cool = real[1:2, :]
    t_in = real[2:3, :]
    p_h2_k = real[3:4, :]
    p_air_k = real[4:5, :]
    t_out = real[5:6, :]
    h2_flow = real[6:7, :]
    air_flow = real[7:8, :]

    lam_v0, lam_v1, lam_v2 = scal_ref[0], scal_ref[1], scal_ref[2]
    lt0, lt2, lt4 = scal_ref[4], scal_ref[6], scal_ref[8]
    lh0, lh1, lh2 = scal_ref[9], scal_ref[10], scal_ref[11]
    lo0, lo1, lo2 = scal_ref[13], scal_ref[14], scal_ref[15]
    scale_y, min_y = scal_ref[17], scal_ref[18]

    # ---- voltage (net_f_V) ----
    i = i_raw / C.A_CELL + 1e-5
    u = ut_ref[:]  # (1, BN)
    v_out = ((u - min_y) / scale_y) / C.N_CELLS
    p_h2 = p_h2_k / 101.0 + 1.0
    p_air = p_air_k / 101.0 + 1.0
    tk = t_out + C.KELVIN
    p_h2o = C.saturation_pressure()
    tk_pow = jnp.power(tk, 1.334)
    pp_h2 = 0.5 * (p_h2 / jnp.exp(1.653 * i / tk_pow) - p_h2o)
    pp_o2 = p_air / jnp.exp(4.192 * i / tk_pow) - p_h2o
    b = C.R_GAS * tk / (2.0 * C.ALPHA * C.F_CONST)
    v_act = -b * jnp.log(i / lam_v1)
    v_ohmic = -(i * lam_v0)
    v_conc = C.ALPHA * b * jnp.log(1.0 - (i / lam_v2))
    e_nernst = -C.GF_LIQ / (2.0 * C.F_CONST) - (
        (C.R_GAS * tk) * jnp.log(p_h2o / (pp_h2 * jnp.sqrt(pp_o2)))
    ) / (2.0 * C.F_CONST)
    v_est = e_nernst + v_act + v_ohmic + v_conc
    f_v = v_est - v_out

    # ---- thermal simple (net_f_T_simple) ----
    i_t_total = (i_raw / C.A_CELL + 1e-6) * C.A_CELL
    t_pred = lt0 * i_t_total + lt2 * (m_cool + 1e-6) + 0.5 * t_in + lt4
    f_t = t_out - t_pred

    # ---- hydrogen (net_f_H) ----
    i_total = i * C.A_CELL
    q_theo_h = jnp.maximum(
        i_total / (2.0 * C.F_CONST) * C.N_CELLS * C.V_MOLAR_STP * 60.0, 1e-8
    )
    tgt_h = jnp.where(
        i_total <= lh2,
        lh0 + lh1 * (i_total / C.I_NORM_BASE),
        lh0 + lh1 * (lh2 / C.I_NORM_BASE),
    )
    ratio_h = (h2_flow + 1e-6) / q_theo_h
    f_h = ratio_h - tgt_h

    # ---- oxygen (net_f_O) ----
    q_theo_o = jnp.maximum(
        (i_total * C.N_CELLS) / (4.0 * C.F_CONST) * C.V_MOLAR_STP * 60.0, 1e-8
    )
    thr_o = jnp.abs(lo2)
    tgt_o = jnp.where(
        i_total <= thr_o,
        lo0 + lo1 * (i_total / C.I_NORM_BASE),
        lo0 + lo1 * (thr_o / C.I_NORM_BASE),
    )
    tgt_o = jnp.clip(tgt_o, 1.05, 15.0)
    ratio_o = (air_flow + 1e-6) * C.O2_FRACTION / q_theo_o
    f_o = ratio_o - tgt_o + 10.0 * jnp.maximum(1.0 - ratio_o, 0.0)

    out_ref[:] = jnp.concatenate(
        [f_v, f_t, f_h, f_o, v_est * C.N_CELLS, t_pred, ratio_h, ratio_o], axis=0
    )


@functools.partial(jax.jit, static_argnames=("block_n", "interpret"))
def fused_residuals_pallas(
    lam_v: jnp.ndarray,
    lam_t: jnp.ndarray,
    lam_h: jnp.ndarray,
    lam_o: jnp.ndarray,
    x_norm: jnp.ndarray,
    u_norm: jnp.ndarray,
    scaler_x: AffineScaler,
    scaler_y: AffineScaler,
    block_n: int = _BLOCK_N,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Run the fused kernel.  Returns the 8 exporter channels, each (N,).

    Note: like the exporter path (01:1947), the DNN output is already a
    constant here — no stop_gradient subtleties; this kernel is forward-only.
    """
    n = x_norm.shape[0]
    n_pad = -(-n // block_n) * block_n

    xt = jnp.pad(x_norm.T.astype(jnp.float32), ((0, 0), (0, n_pad - n)), mode="edge")
    ut = jnp.pad(u_norm.reshape(1, -1).astype(jnp.float32), ((0, 0), (0, n_pad - n)), mode="edge")

    scal = jnp.concatenate(
        [
            lam_v.astype(jnp.float32).ravel(),
            lam_t.astype(jnp.float32).ravel(),
            lam_h.astype(jnp.float32).ravel(),
            lam_o.astype(jnp.float32).ravel(),
            scaler_y.scale.astype(jnp.float32).ravel(),  # exact inverse() consts
            scaler_y.min.astype(jnp.float32).ravel(),
        ]
    )  # (19,)
    sx = jnp.stack(
        [scaler_x.scale.astype(jnp.float32), scaler_x.min.astype(jnp.float32)], axis=1
    )  # (8, 2) [scale | min] of the *forward* transform; inverse uses them

    grid = (n_pad // block_n,)
    out = pl.pallas_call(
        _residual_kernel,
        out_shape=jax.ShapeDtypeStruct((8, n_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # scal (19,)
            pl.BlockSpec((8, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (8, block_n), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(scal, xt, ut, sx)
    return tuple(out[k, :n] for k in range(8))


def all_residuals_pallas(
    params, x_norm, u_norm, scaler_x, scaler_y, interpret: bool = False
) -> ResidualBundle:
    """Drop-in replacement for ``pinnfc_tpu.physics.all_residuals`` backed by
    the fused kernel (columns reshaped to the (N, 1) bundle contract)."""
    outs = fused_residuals_pallas(
        params["lam_v"], params["lam_t"], params["lam_h"], params["lam_o"],
        x_norm, u_norm, scaler_x, scaler_y, interpret=interpret,
    )
    cols = [o.reshape(-1, 1) for o in outs]
    return ResidualBundle(*cols)
