"""Counterfactual-recovery solve latency (uq/counterfactual, `cli whatif`).

All alarmed rows of all 12 risk conditions (`04:145-161`) batch into ONE
jitted Adam-under-``lax.scan`` inverse solve; this bench measures that
program warm on the active device — the number PERFORMANCE.md's
"Counterfactual recovery solve" section records.  The model is the
full-scale 8→256³→1 MLP of the reference schedule (01:2126), freshly
initialized: solve cost depends on shapes and step count, not on how
trained the weights are.

Run on TPU: ``python benchmarks/whatif_bench.py``
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 768  # 12 conditions x the cli's default --max-rows 64
STEPS = 400  # cli default
N_REPEAT = 5


def main():
    import jax
    import numpy as np

    from pinnfc_tpu.data.scaling import AffineScaler
    from pinnfc_tpu.models.mlp import init_mlp
    from pinnfc_tpu.uq import CounterfactualConfig, counterfactual_recovery
    from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    rs = np.random.RandomState(0)
    x_train = (rs.rand(4000, 8).astype(np.float32)
               * np.array([750, 2.5, 15, 60, 40, 45, 35, 350], np.float32)
               + np.array([50, 1.0, 20, 100, 100, 30, 5, 50], np.float32))
    scaler_x = AffineScaler.fit(x_train)
    scaler_y = AffineScaler.fit(
        (300 + 60 * rs.rand(4000, 1)).astype(np.float32)
    )
    params = init_mlp(jax.random.PRNGKey(0), (8, 256, 256, 256, 1))

    x = x_train[:N_ROWS]
    v_thr = np.full(N_ROWS, 3.6, np.float32)
    v_meas = v_thr - rs.rand(N_ROWS).astype(np.float32)  # below the line
    cfg = CounterfactualConfig(steps=STEPS)

    t0 = time.perf_counter()
    counterfactual_recovery(params, x, v_thr, scaler_x, scaler_y,
                            config=cfg, v_meas=v_meas)
    cold_s = time.perf_counter() - t0
    print(f"[whatif_bench] cold (incl. compile): {cold_s:.1f}s",
          file=sys.stderr)

    times = []
    for i in range(N_REPEAT):
        # vary the measured shortfall each repeat so the relay can never
        # memoize an execution (the jitted program itself is unchanged)
        v_i = v_thr - rs.rand(N_ROWS).astype(np.float32)
        t0 = time.perf_counter()
        rep = counterfactual_recovery(params, x, v_thr, scaler_x, scaler_y,
                                      config=cfg, v_meas=v_i)
        times.append(time.perf_counter() - t0)
        print(f"[whatif_bench] warm #{i}: {times[-1] * 1e3:.1f} ms "
              f"(recovered {rep.recovered.mean():.0%})", file=sys.stderr)
    warm_s = sorted(times)[len(times) // 2]

    print(json.dumps({
        "metric": "whatif_solve_warm_ms",
        "value": round(warm_s * 1e3, 1),
        "unit": "ms",
        "rows": N_ROWS,
        "adam_steps": STEPS,
        "cold_s": round(cold_s, 1),
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    main()
