"""Deployment-artifact overhead: StableHLO (jax.export) vs in-process.

Answers the question a deployment cares about: does serving from a
serialized artifact (``cli export-model`` / ``cli serve --artifact``)
cost anything over the in-process checkpoint path?  Measures on the
current backend (run on the TPU for the real answer):

1. the eval-mode scorer — exported ``exp.call`` vs the in-process jitted
   forward, same batch;
2. the streaming monitor block step — ``monitor_from_artifact.observe``
   vs ``OnlineMonitor.observe`` (both pay one device round trip per
   block through the relay);
3. the fleet: a ``--fleet-step`` artifact advancing S streams in ONE
   dispatch vs a plain monitor-step artifact's documented sequential
   fallback (S relay round trips) vs the checkpoint monitor's vmapped
   path;
4. artifact sizes.

Prints one JSON line.  Methodology per CLAUDE.md: jit everything, vary
the input between timed repeats (the relay memoizes identical
executions), force readbacks inside the timed region.
"""

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.pinn import init_pinn
from pinnfc_tpu.serving import (
    OnlineMonitor,
    build_scorer_fn,
    export_monitor_fleet_step,
    export_monitor_step,
    export_scorer,
    load_scorer,
    monitor_from_artifact,
)
from pinnfc_tpu.utils import enable_compilation_cache


def _time_calls(fn, inputs, warmup=2):
    for x in inputs[:warmup]:
        fn(x)
    t0 = time.perf_counter()
    for x in inputs[warmup:]:
        fn(x)
    return (time.perf_counter() - t0) / (len(inputs) - warmup)


def main():
    enable_compilation_cache()
    rs = np.random.RandomState(0)
    sx = AffineScaler.fit(rs.randn(512, 8).astype(np.float32))
    sy = AffineScaler.fit(rs.randn(512, 1).astype(np.float32))
    params = init_pinn(jax.random.PRNGKey(0), (8, 64, 64, 1))
    platform = jax.default_backend()
    B, reps = 1024, 12
    batches = [rs.randn(B, 8).astype(np.float32) for _ in range(reps)]

    # --- scorer -----------------------------------------------------------
    blob_s = export_scorer(params, sx, sy, platforms=("cpu", "tpu"))
    exported = load_scorer(blob_s)
    inproc = jax.jit(build_scorer_fn(params, sx, sy))

    def run_exported(x):
        v, lv = exported(x)
        return float(jnp.sum(v))  # force readback

    def run_inproc(x):
        v, lv = inproc(jnp.asarray(x))
        return float(jnp.sum(v))

    t_exp = _time_calls(run_exported, batches)
    t_in = _time_calls(run_inproc, batches)

    # --- monitor block step -----------------------------------------------
    mu = np.zeros(5, np.float32)
    sigma = np.ones(5, np.float32)
    ckpt_mon = OnlineMonitor(params, sx, sy, mu, sigma)
    blob_m = export_monitor_step(ckpt_mon, platforms=("cpu", "tpu"))
    art_mon = monitor_from_artifact(blob_m, mu, sigma)
    blocks = [
        (rs.randn(256, 8).astype(np.float32), rs.randn(256).astype(np.float32))
        for _ in range(reps)
    ]
    t_mon_ckpt = _time_calls(lambda b: ckpt_mon.observe(*b), blocks)
    t_mon_art = _time_calls(lambda b: art_mon.observe(*b), blocks)

    # --- fleet: one-dispatch artifact vs sequential artifact vs ckpt -------
    S, Bf = 16, 64
    keys = [f"s{i}" for i in range(S)]
    blob_f = export_monitor_fleet_step(ckpt_mon, platforms=("cpu", "tpu"))
    fleet_art = monitor_from_artifact(blob_f, mu, sigma)
    seq_art = monitor_from_artifact(blob_m, mu, sigma)
    fleet_ckpt = OnlineMonitor(params, sx, sy, mu, sigma)
    banks = [
        (rs.randn(S, Bf, 8).astype(np.float32),
         rs.randn(S, Bf).astype(np.float32))
        for _ in range(reps)
    ]
    t_fleet_art = _time_calls(
        lambda b: fleet_art.observe_many(b[0], b[1], keys), banks
    )
    t_fleet_seq = _time_calls(
        lambda b: seq_art.observe_many(b[0], b[1], keys), banks
    )
    t_fleet_ckpt = _time_calls(
        lambda b: fleet_ckpt.observe_many(b[0], b[1], keys), banks
    )

    out = {
        "metric": "export_artifact_overhead",
        "platform": platform,
        "batch": B,
        "scorer_exported_ms": round(1e3 * t_exp, 3),
        "scorer_inprocess_ms": round(1e3 * t_in, 3),
        "scorer_overhead_pct": round(100 * (t_exp / t_in - 1), 1),
        "monitor_block": 256,
        "monitor_artifact_ms": round(1e3 * t_mon_art, 3),
        "monitor_checkpoint_ms": round(1e3 * t_mon_ckpt, 3),
        "monitor_overhead_pct": round(100 * (t_mon_art / t_mon_ckpt - 1), 1),
        "fleet_streams": S,
        "fleet_block": Bf,
        "fleet_artifact_ms": round(1e3 * t_fleet_art, 3),
        "fleet_sequential_artifact_ms": round(1e3 * t_fleet_seq, 3),
        "fleet_checkpoint_ms": round(1e3 * t_fleet_ckpt, 3),
        "fleet_speedup_vs_sequential": round(t_fleet_seq / t_fleet_art, 1),
        "scorer_bytes": len(blob_s),
        "monitor_bytes": len(blob_m),
        "fleet_bytes": len(blob_f),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
