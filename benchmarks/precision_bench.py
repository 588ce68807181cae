"""Low-precision INFERENCE study for the serving/export path
(VERDICT r4 item 5).

The training path is pinned to f32 'highest' matmuls for torch parity
(01:2143 numerics), but inference has no such constraint: the conformal
calibration recalibrates on whatever score distribution the deployed
scorer produces, absorbing a numerics shift by construction.  This bench
measures four eval-scorer variants on the same trained model and full
campaign:

  f32_highest   — the parity configuration (baseline)
  f32_default   — f32 params, MXU bf16-input passes ('default' precision)
  bf16_params   — weights AND activations cast to bf16 (half the bytes)
  int8_weights  — per-column symmetric int8 weight quantization with
                  dynamic per-tensor int8 activations (v5e: 394 int8
                  TOPS vs 197 bf16 TFLOPs), f32 rescale after each dot

and reports, per variant: throughput (rows/s over the 15,600-row
campaign, relay-memoization defeated by input jitter per repeat),
accuracy deltas vs f32_highest (voltage-prediction MAE/max in volts),
and the split-conformal story: held-out normal coverage when q̂ was
calibrated on the f32 scorer (the deployment-mismatch case) vs q̂
recalibrated on the variant's own scores (the supported path).

The streaming monitor step itself is NOT a precision target: its per
block compute is microseconds against a measured 25-38 ms relay RTT
(PERFORMANCE.md serving tables) — documented retirement, same policy as
lambda_bench/mfu_bench.

Usage: python benchmarks/precision_bench.py [--small] [--reps 20]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def quantize_int8(params):
    """Per-output-column symmetric int8 weights + f32 scales."""
    import jax.numpy as jnp

    def q(w):
        s = jnp.max(jnp.abs(w), axis=0) / 127.0 + 1e-12
        return (jnp.round(w / s)).astype(jnp.int8), s.astype(jnp.float32)

    def q_layer(layer):
        wq, s = q(layer["w"])
        return {"wq": wq, "s": s, "b": layer["b"]}

    return {
        "hidden": [q_layer(l) for l in params["hidden"]],
        "mean": q_layer(params["mean"]),
        "var": [q_layer(l) for l in params["var"]],
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pinnfc_tpu.config import TrainConfig
    from pinnfc_tpu.data.combine import combine_and_normalize
    from pinnfc_tpu.data.synthetic import synthesize_stack_data
    from pinnfc_tpu.models.mlp import mlp_forward
    from pinnfc_tpu.models.pinn import init_pinn
    from pinnfc_tpu.training.stages import run_schedule

    if args.small:
        from pinnfc_tpu.cli._common import _small_schedule

        cfg = TrainConfig(schedule=_small_schedule(), mc_times=200)
        n_normal, n_fault = 1500, 200
    else:
        cfg = TrainConfig()
        n_normal, n_fault = 6000, 800

    normal, faults = synthesize_stack_data(
        n_normal=n_normal, n_fault=n_fault, seed=cfg.seed
    )
    ds = combine_and_normalize(
        normal, faults, training_rate=cfg.training_rate, seed=cfg.seed
    )
    params = init_pinn(jax.random.PRNGKey(cfg.seed), cfg.model.layers)
    rng = jax.random.key(cfg.seed + 1, impl=cfg.model.rng_impl)
    train_key, _ = jax.random.split(rng)
    t0 = time.perf_counter()
    params, _ = run_schedule(
        params, ds.x_train, ds.y_train, ds.scaler_x, ds.scaler_y,
        schedule=cfg.schedule, rng=train_key,
        dropout_p=cfg.model.dropout_p, precision=cfg.model.precision,
    )
    jax.block_until_ready(params)
    print(json.dumps({"phase": "train_s",
                      "seconds": round(time.perf_counter() - t0, 1)}))

    mlp = params["mlp"]
    x_test = ds.x_test
    n = int(x_test.shape[0])

    # ---- the four scorer programs (all jitted, logvar included) --------
    @jax.jit
    def scorer_highest(x):
        return mlp_forward(mlp, x, train=False, precision="highest")

    @jax.jit
    def scorer_default(x):
        return mlp_forward(mlp, x, train=False, precision="default")

    mlp_bf16 = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), mlp
    )

    @jax.jit
    def scorer_bf16(x):
        m, lv = mlp_forward(
            mlp_bf16, x.astype(jnp.bfloat16), train=False,
            precision="default",
        )
        return m.astype(jnp.float32), lv.astype(jnp.float32)

    q = quantize_int8(mlp)

    @jax.jit
    def scorer_int8(x):
        def dot_i8(h, layer):
            s_h = jnp.max(jnp.abs(h)) / 127.0 + 1e-12
            hq = jnp.round(h / s_h).astype(jnp.int8)
            acc = jax.lax.dot_general(
                hq, layer["wq"], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )
            return acc.astype(jnp.float32) * (s_h * layer["s"]) + layer["b"]

        h = x
        for layer in q["hidden"]:
            h = jnp.tanh(dot_i8(h, layer))
        mean = dot_i8(h, q["mean"])
        v = jnp.tanh(dot_i8(h, q["var"][0]))
        v = jnp.tanh(dot_i8(v, q["var"][1]))
        v = dot_i8(v, q["var"][2])
        # same logvar head postprocessing as mlp_forward — without it the
        # second output is not comparable to the other variants
        return mean, jnp.log(jax.nn.softplus(v) + 1e-6)

    variants = {
        "f32_highest": scorer_highest,
        "f32_default": scorer_default,
        "bf16_params": scorer_bf16,
        "int8_weights": scorer_int8,
    }

    # ---- accuracy + conformal story ------------------------------------
    sy = ds.scaler_y
    scale_y = float(np.asarray(sy.scale).reshape(-1)[0]) + 1e-12
    labels = ds.info.fault_labels(n)
    y_true_norm = np.asarray(ds.y_test)[:, 0]

    preds = {}
    for name, fn in variants.items():
        try:
            m, _ = fn(x_test)
            preds[name] = np.asarray(m, np.float64)[:, 0]
        except Exception as e:  # e.g. int8 dot unsupported on a backend
            print(json.dumps({"variant": name,
                              "unsupported": f"{type(e).__name__}: {e}"[:200]}))
    base = preds["f32_highest"]

    rng_np = np.random.RandomState(0)
    normal_idx = np.where(labels == 0)[0]
    calib_idx = rng_np.permutation(normal_idx)
    half = len(calib_idx) // 2
    cal, ho = calib_idx[:half], calib_idx[half:]
    alpha = 0.1

    def qhat(scores_cal):
        k = int(np.ceil((len(scores_cal) + 1) * (1 - alpha)))
        return float(np.sort(scores_cal)[min(k, len(scores_cal)) - 1])

    scores = {nm: np.abs(y_true_norm - p) for nm, p in preds.items()}
    q_f32 = qhat(scores["f32_highest"][cal])

    for name, p in preds.items():
        delta_v = np.abs(p - base) / scale_y
        cov_f32q = float(np.mean(scores[name][ho] <= q_f32))
        q_own = qhat(scores[name][cal])
        cov_own = float(np.mean(scores[name][ho] <= q_own))
        print(json.dumps({
            "variant": name,
            "pred_mae_vs_f32_V": round(float(delta_v.mean()), 6),
            "pred_max_vs_f32_V": round(float(delta_v.max()), 6),
            "coverage_f32_qhat": round(cov_f32q, 4),
            "coverage_recalibrated": round(cov_own, 4),
            "target_coverage": 1 - alpha,
        }))

    # ---- throughput (vary inputs per rep: the relay memoizes identical
    #      executions; forcing a readback syncs each pass) ---------------
    jitter = [
        jnp.asarray(
            np.asarray(x_test)
            + rng_np.uniform(-1e-4, 1e-4, x_test.shape).astype(np.float32)
        )
        for _ in range(args.reps)
    ]
    results = {}
    for name, fn in variants.items():
        if name not in preds:
            continue
        fn(jitter[0])[0].block_until_ready()  # compile
        t0 = time.perf_counter()
        for xb in jitter:
            fn(xb)[0].block_until_ready()
        dt = time.perf_counter() - t0
        results[name] = n * args.reps / dt
        print(json.dumps({
            "variant": name,
            "rows_per_sec": round(results[name], 0),
            "speedup_vs_f32_highest": round(
                results[name] / results["f32_highest"], 2
            ),
        }))
    print(json.dumps({
        "metric": "scorer_rows_per_sec_best",
        "value": round(max(results.values()), 0),
        "unit": "rows/s",
        "backend": jax.default_backend(),
        "best_variant": max(results, key=results.get),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
