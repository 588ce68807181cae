"""Micro-benchmarks: fused Pallas residual kernel vs XLA-fused jnp, and the
vmapped MC-dropout sampler.  Prints one JSON line per benchmark.

Run on TPU:  python benchmarks/kernel_bench.py
Run on CPU:  JAX_PLATFORMS=cpu python benchmarks/kernel_bench.py  (interpret
mode for the Pallas kernel — correctness only, not speed)
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

N = 100_000
REPEAT = 20


def _timeit(fn, *args):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPEAT):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPEAT


def main():
    import jax
    import jax.numpy as jnp

    from pinnfc_tpu.data.scaling import AffineScaler
    from pinnfc_tpu.models.mlp import init_mlp
    from pinnfc_tpu.models.pinn import init_pinn
    from pinnfc_tpu.ops.pallas_residuals import all_residuals_pallas
    from pinnfc_tpu.physics.residuals import all_residuals
    from pinnfc_tpu.uq.mc_dropout import mc_dropout_samples

    on_tpu = jax.default_backend() == "tpu"
    interpret = not on_tpu

    rng = np.random.RandomState(0)
    x_raw = rng.uniform([50, 0.1, 55, 30, 25, 55, 1, 5], [700, 0.6, 70, 90, 80, 75, 60, 400], (N, 8))
    y_raw = rng.uniform(2.5, 4.6, (N, 1))
    sx, sy = AffineScaler.fit(x_raw), AffineScaler.fit(y_raw)
    x = jnp.asarray(sx.transform(x_raw), jnp.float32)
    u = jnp.asarray(sy.transform(y_raw), jnp.float32)
    params = init_pinn(jax.random.PRNGKey(0))

    jnp_fn = jax.jit(lambda p, x, u: all_residuals(p, x, u, sx, sy))
    t_jnp = _timeit(jnp_fn, params, x, u)
    print(json.dumps({
        "metric": "residuals_jnp_rows_per_sec", "value": round(N / t_jnp),
        "unit": "rows/s", "n": N,
    }))

    pl_fn = lambda p, x, u: all_residuals_pallas(p, x, u, sx, sy, interpret=interpret)
    if on_tpu:
        t_pl = _timeit(pl_fn, params, x, u)
        print(json.dumps({
            "metric": "residuals_pallas_rows_per_sec", "value": round(N / t_pl),
            "unit": "rows/s", "n": N, "speedup_vs_jnp": round(t_jnp / t_pl, 3),
        }))
    else:
        out = pl_fn(params, x, u)  # interpret-mode correctness only
        jax.block_until_ready(out.f_v)
        print(json.dumps({"metric": "residuals_pallas_rows_per_sec",
                          "value": None, "unit": "rows/s",
                          "note": "interpret mode (no TPU) — timing skipped"}))

    mlp = init_mlp(jax.random.PRNGKey(0))
    mc_fn = lambda: mc_dropout_samples(mlp, x[:16384], jax.random.PRNGKey(1),
                                       mc_times=500, dropout=0.4, chunk=50)
    t_mc = _timeit(lambda _: mc_fn(), None)
    print(json.dumps({
        "metric": "mc_dropout_vmap_samples_per_sec",
        "value": round(500 * 16384 / t_mc),
        "unit": "row-samples/s", "mc_times": 500, "rows": 16384,
    }))

    if on_tpu:
        from pinnfc_tpu.ops.pallas_mc_dropout import mc_dropout_pallas

        mcp_fn = lambda: mc_dropout_pallas(mlp, x[:16384], 1, mc_times=500,
                                           dropout=0.4)
        t_mcp = _timeit(lambda _: mcp_fn(), None)
        # roofline: the kernel is MXU-bound; FLOPs per row-sample for the
        # [8,256,256,256,1] trunk + [256→128→64→1] variance head
        macs = 8 * 256 + 256 * 256 * 2 + 256 + 256 * 128 + 128 * 64 + 64
        flops = 2 * macs * 500 * 16384 / t_mcp
        print(json.dumps({
            "metric": "mc_dropout_pallas_samples_per_sec",
            "value": round(500 * 16384 / t_mcp),
            "unit": "row-samples/s", "mc_times": 500, "rows": 16384,
            "speedup_vs_vmap": round(t_mc / t_mcp, 3),
            "achieved_tflops": round(flops / 1e12, 2),
            "roofline_note": "v5e bf16 peak ~197 TFLOP/s; f32-highest ~1/8",
        }))

        # residual kernels at HBM-bound scale (4M rows; small-N timings are
        # dominated by tunnel dispatch overhead): 36 B in + 32 B out per row;
        # v5e HBM ~819 GB/s
        n_big = 4_000_000
        xb = jnp.tile(x, (n_big // N + 1, 1))[:n_big]
        ub = jnp.tile(u, (n_big // N + 1, 1))[:n_big]
        from pinnfc_tpu.ops.pallas_residuals import fused_residuals_pallas

        jnp_big = jax.jit(lambda p, x, u: all_residuals(p, x, u, sx, sy))
        t_jnp_big = _timeit(jnp_big, params, xb, ub)
        print(json.dumps({
            "metric": "residuals_jnp_big_rows_per_sec",
            "value": round(n_big / t_jnp_big), "unit": "rows/s", "rows": n_big,
            "hbm_gbps": round((36 + 32) * n_big / t_jnp_big / 1e9, 1),
        }))

        big_fn = lambda: fused_residuals_pallas(
            params["lam_v"], params["lam_t"], params["lam_h"], params["lam_o"],
            xb, ub, sx, sy,
        )
        t_big = _timeit(lambda _: big_fn(), None)
        gbps = (36 + 32) * n_big / t_big / 1e9
        print(json.dumps({
            "metric": "residuals_pallas_hbm_gbps",
            "value": round(gbps, 1), "unit": "GB/s", "rows": n_big,
            "rows_per_sec": round(n_big / t_big),
            "speedup_vs_jnp_big": round(t_jnp_big / t_big, 3),
            "roofline_note": "v5e HBM ~819 GB/s; kernel is bandwidth-bound",
        }))


if __name__ == "__main__":
    main()
