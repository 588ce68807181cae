"""λ-stage throughput bench (VERDICT r1 #4): how fast do the four physics
λ-stages run as XLA scans on the real chip?

The reference spends 26,003 of its 42,007 steps in λ-stages (01:2145-2153).
This measures per-stage steps/s at campaign scale (N=15,600) so the
"fuse the residual into a VMEM-resident λ-trainer" question can be settled
with numbers: the kernel only pays if these stages are a material fraction
of schedule wall time.

Run on TPU: ``python benchmarks/lambda_bench.py``
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 15_600
N_ITER = 2001


def main():
    import jax
    import jax.numpy as jnp

    from pinnfc_tpu.data.scaling import AffineScaler
    from pinnfc_tpu.models.mlp import init_mlp, mlp_forward
    from pinnfc_tpu.models.pinn import LAMBDA_INIT
    from pinnfc_tpu.training.stages import (
        train_dnn_stage,
        train_lambda_v_stage,
        train_residual_stage,
    )
    from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    rng = np.random.RandomState(0)
    n = N_ROWS
    x_raw = np.column_stack(
        [
            rng.uniform(100, 400, n),
            rng.uniform(0.1, 0.5, n),
            rng.uniform(60, 64, n),
            rng.uniform(40, 70, n),
            rng.uniform(30, 60, n),
            rng.uniform(62, 70, n),
            rng.uniform(2, 40, n),
            rng.uniform(10, 200, n),
        ]
    )
    y_raw = rng.uniform(3.0, 4.5, (n, 1))
    sx = AffineScaler.fit(x_raw)
    sy = AffineScaler.fit(y_raw)
    x = jnp.asarray(sx.transform(x_raw), jnp.float32)
    y = jnp.asarray(sy.transform(y_raw), jnp.float32)

    mlp = init_mlp(jax.random.PRNGKey(0), (8, 256, 256, 256, 1))
    u_pred, _ = mlp_forward(mlp, x, train=False)
    u_pred = jax.block_until_ready(u_pred)

    def timed(label, fn, perturb):
        # warmup/compile
        out = fn(0)
        jax.block_until_ready(out.params)
        times = []
        for i in range(1, 4):  # fresh perturbation per repeat (relay memoizes)
            t0 = time.perf_counter()
            out = fn(i * perturb)
            _ = float(np.asarray(out.losses)[-1])
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        sps = N_ITER / dt
        print(json.dumps({"stage": label, "steps_per_sec": round(sps, 1),
                          "stage_wall_s": round(dt, 4)}))
        return sps

    lam_v = jnp.asarray(LAMBDA_INIT["lam_v"])
    timed(
        "lambda_v(dnn_para=False)",
        lambda d: train_lambda_v_stage(
            lam_v + d, x, y, u_pred, sx, sy, n_iter=N_ITER, dnn_para=False
        ),
        1e-6,
    )
    timed(
        "lambda_v(dnn_para=True)",
        lambda d: train_lambda_v_stage(
            lam_v + d, x, y, u_pred, sx, sy, n_iter=N_ITER, dnn_para=True
        ),
        1e-6,
    )
    for group, lr in (("lam_t", 1.0), ("lam_h", 0.1), ("lam_o", 0.01)):
        lam = jnp.asarray(LAMBDA_INIT[group])
        timed(
            group,
            lambda d, lam=lam, group=group, lr=lr: train_residual_stage(
                lam + d, x, sx, group, n_iter=N_ITER, lr=lr
            ),
            1e-5,
        )

    # the DNN stage at the same N for context
    timed(
        "dnn(stage1)",
        lambda i: train_dnn_stage(
            mlp, x, y, jax.random.key(i + 1, impl="rbg"), n_iter=N_ITER
        ),
        1,
    )


if __name__ == "__main__":
    main()
