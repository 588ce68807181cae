"""Streaming-monitor serving latency/throughput on the real chip.

Measures ``OnlineMonitor.observe`` end-to-end (host → device → host, the
deployed scorer's request path): DNN forward + four physics residuals +
RF(t) recurrence continuation + (optionally) the online GMM fault-type
posterior, per block size.  The per-block latency through the axon tunnel
is an upper bound — a production v5e with a local host removes the relay
round trip.

Run on TPU: ``python benchmarks/serving_bench.py``
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCKS = (1, 64, 256, 1024)
N_REPEAT = 20
LAYERS = (8, 256, 256, 256, 1)


def build_monitor(with_head: bool, with_conformal: bool = False):
    import jax
    import jax.numpy as jnp

    from pinnfc_tpu.data.scaling import AffineScaler
    from pinnfc_tpu.models.pinn import init_pinn
    from pinnfc_tpu.serving import DiagnosisHead, OnlineMonitor

    params = init_pinn(jax.random.PRNGKey(0), LAYERS)
    rs0 = np.random.RandomState(2)
    sx = AffineScaler.fit(rs0.uniform(-1, 1, (100, 8)))
    sy = AffineScaler.fit(rs0.uniform(3, 4, (100, 1)))
    mu = np.zeros(5)
    sigma = np.full(5, 0.1)
    head = None
    if with_head:
        from pinnfc_tpu.diagnosis import calibrate_components, gmm_fit, gmm_predict_proba

        rs = np.random.RandomState(0)
        feats = rs.randn(2000, 4).astype(np.float32)
        y = rs.randint(0, 4, 2000)
        model = gmm_fit(jnp.asarray(feats), jax.random.key(0), n_components=20)
        comp = calibrate_components(
            np.asarray(gmm_predict_proba(model, jnp.asarray(feats))), y, 4
        )
        head = DiagnosisHead(
            gmm=model, comp_fault_prob=jnp.asarray(comp, jnp.float32),
            class_names=("a", "b", "c", "d"), feature_indices=(1, 2, 3, 4),
        )
    conformal = (
        np.abs(np.random.RandomState(5).randn(14000)).astype(np.float32)
        if with_conformal else None
    )  # campaign-scale calibration vector (≈ the normal-row count)
    return OnlineMonitor(params, sx, sy, mu, sigma, diagnosis=head,
                         conformal_calib=conformal)


def _median(ts) -> float:
    return sorted(ts)[len(ts) // 2]


def bench(monitor, block: int) -> float:
    rs = np.random.RandomState(1)
    x = rs.uniform(-1, 1, (block, 8)).astype(np.float32)
    v = rs.uniform(3, 4, block).astype(np.float32)
    monitor.observe(x, v)  # compile
    times = []
    for i in range(N_REPEAT):
        # vary the data each call (defeats relay memoization); observe()
        # already reads results back to numpy
        x2 = x + 1e-3 * i
        t0 = time.perf_counter()
        monitor.observe(x2, v)
        times.append(time.perf_counter() - t0)
    return _median(times)


FLEET_SIZES = (4, 16, 64)
FLEET_BLOCK = 64


def bench_fleet(monitor, n_streams: int) -> tuple[float, float]:
    """Median latency of (a) one observe_many over n_streams and (b) the
    same fleet advanced by n_streams sequential observe calls."""
    rs = np.random.RandomState(3)
    xb = rs.uniform(-1, 1, (n_streams, FLEET_BLOCK, 8)).astype(np.float32)
    vb = rs.uniform(3, 4, (n_streams, FLEET_BLOCK)).astype(np.float32)
    streams = [f"s{i}" for i in range(n_streams)]
    monitor.observe_many(xb, vb, streams)  # compile
    many_t, seq_t = [], []
    for i in range(N_REPEAT // 2):
        x2 = xb + 1e-3 * i
        t0 = time.perf_counter()
        monitor.observe_many(x2, vb, streams)
        many_t.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        for j, s in enumerate(streams):
            monitor.observe(x2[j], vb[j], stream=s)
        seq_t.append(time.perf_counter() - t0)
    return _median(many_t), _median(seq_t)


def bench_snapshot(monitor, n_streams: int, tmpdir: str) -> float:
    """Median cost of one state-bank snapshot (``save_state_bank``) with
    n_streams live streams — the per-request overhead of
    ``cli serve --state-path`` (pure host work on the numpy bank)."""
    rs = np.random.RandomState(4)
    xb = rs.uniform(-1, 1, (n_streams, 4, 8)).astype(np.float32)
    vb = rs.uniform(3, 4, (n_streams, 4)).astype(np.float32)
    # include the built-in "default" stream so the bank holds exactly
    # n_streams entries (otherwise S=1 would time a 2-stream save)
    streams = ["default"] + [f"s{i}" for i in range(n_streams - 1)]
    monitor.observe_many(xb, vb, streams)
    assert len(monitor.streams) == n_streams
    path = os.path.join(tmpdir, "bank.npz")
    times = []
    for _ in range(N_REPEAT):
        t0 = time.perf_counter()
        monitor.save_state_bank(path)
        times.append(time.perf_counter() - t0)
    return _median(times)


def main():
    import tempfile

    from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    out = {"metric": "serving_observe_latency_ms"}
    for with_head, with_conformal in ((False, False), (True, False),
                                      (True, True)):
        mon = build_monitor(with_head, with_conformal)
        key = ("with_diagnosis_conformal" if with_conformal
               else "with_diagnosis" if with_head else "rf_only")
        out[key] = {}
        for b in BLOCKS:
            dt = bench(mon, b)
            out[key][str(b)] = round(dt * 1e3, 2)
            print(f"  {key} block={b}: {dt*1e3:.2f} ms "
                  f"({b/dt:.0f} samples/s)", flush=True)
    # fleet polling: S streams in one vmapped dispatch vs S observe calls
    mon = build_monitor(True)
    out["fleet_observe_many_ms"] = {}
    for s in FLEET_SIZES:
        many, seq = bench_fleet(mon, s)
        out["fleet_observe_many_ms"][str(s)] = {
            "observe_many": round(many * 1e3, 2),
            "sequential": round(seq * 1e3, 2),
            "speedup": round(seq / many, 2),
        }
        print(f"  fleet S={s} (block {FLEET_BLOCK}): observe_many "
              f"{many*1e3:.1f} ms vs {s}x observe {seq*1e3:.1f} ms "
              f"({seq/many:.1f}x)", flush=True)
    # --state-path persistence overhead (host-only; no device dispatch)
    out["state_snapshot_ms"] = {}
    with tempfile.TemporaryDirectory() as td:
        for s in (1, 64):
            mon = build_monitor(False)
            dt = bench_snapshot(mon, s, td)
            out["state_snapshot_ms"][str(s)] = round(dt * 1e3, 3)
            print(f"  state-bank snapshot S={s}: {dt*1e3:.3f} ms", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
