"""Stage-1 MFU study: co-scheduled ensemble members in one scan (VERDICT r2 #8).

The DNN stage's matmuls are small — (6000, 8→256→256→256) at f32 — and the
measured ~25 TFLOP/s (~13% of v5e bf16 peak) is latency/bandwidth-bound,
not FLOP-bound (see PERFORMANCE.md, pallas_train study).  This bench asks
the one remaining question: does co-scheduling E INDEPENDENT ensemble
members through the same scan step (vmap over the member axis → batched
(E, N, D)×(E, D, D') matmuls) raise arithmetic intensity enough to buy
throughput, i.e. is member-steps/s at E=8 meaningfully above E=1?

Uses the existing `parallel.ensemble.train_dnn_ensemble` machinery
(single-device vmap path).  Prints one JSON line per E with
member_steps_per_sec and the implied effective TFLOP/s.

Run on the TPU: ``python benchmarks/mfu_bench.py``
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TRAIN = 6000
LAYERS = (8, 256, 256, 256, 1)
STEPS = 301
MEMBERS = (1, 2, 4, 8)


def flops_per_member_step() -> float:
    """Matmul FLOPs of one member's forward+backward (the 3× rule: backward
    costs ~2× forward for dense layers; Adam/elementwise excluded)."""
    dims = [
        (8, 256), (256, 256), (256, 256),  # trunk
        (256, 1),  # mean head
        (256, 128), (128, 64), (64, 1),  # var head
    ]
    fwd = sum(2 * N_TRAIN * a * b for a, b in dims)
    return 3.0 * fwd


def main():
    import jax

    from pinnfc_tpu.parallel.ensemble import init_ensemble, train_dnn_ensemble
    from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.uniform(-1, 1, (N_TRAIN, 8)), jnp.float32)
    y = jnp.asarray(rng.uniform(-1, 1, (N_TRAIN, 1)), jnp.float32)

    def key(i):
        return jax.random.key(i, impl="rbg")

    base = None
    for e in MEMBERS:
        ens = init_ensemble(jax.random.PRNGKey(0), e, layers=LAYERS)
        # compile/warm at the exact (E, steps) shape
        out, losses = train_dnn_ensemble(ens, x, y, key(0), n_iter=STEPS)
        assert np.all(np.isfinite(np.asarray(losses[:, -1])))
        times = []
        for i in range(1, 4):  # fresh key per rep + forced readback
            t0 = time.perf_counter()
            out, losses = train_dnn_ensemble(ens, x, y, key(i), n_iter=STEPS)
            _ = float(np.asarray(losses[:, -1]).sum())
            times.append(time.perf_counter() - t0)
        dt = sorted(times)[len(times) // 2]
        msps = STEPS * e / dt
        tflops = msps * flops_per_member_step() / 1e12
        if base is None:
            base = msps
        print(
            json.dumps(
                {
                    "metric": "coscheduled_member_steps_per_sec",
                    "members": e,
                    "value": round(msps, 2),
                    "unit": "member-steps/s",
                    "tflops_effective": round(tflops, 2),
                    "speedup_vs_1_member": round(msps / base, 2),
                }
            )
        )
        sys.stdout.flush()


if __name__ == "__main__":
    main()
