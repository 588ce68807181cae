"""Retrain-free scoring vs full retrain, at the reference's scale.

The reference must re-run the whole 42k-step schedule before it can export
an artifact for a fresh measurement campaign
(`/root/reference/01_train_pinn_multiphysics_model.py:2143-2187`).  Our
``run_scoring_pipeline`` instead loads a checkpoint (params + the training
campaign's scalers) and goes straight to the MC-dropout exporter — this
bench measures how much of script-01's cost that skips, on the same device:

  retrain path = train_s + export_s of one full ``run_training_pipeline``
  score path   = ckpt_s + data_s + export_s of ``run_scoring_pipeline``
                 over a NEW campaign (warm: median of repeats, different
                 seeds so the relay can never memoize an execution)

Run on TPU: ``python benchmarks/score_bench.py``
"""

from __future__ import annotations

import dataclasses as dc
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_NORMAL, N_FAULT = 6000, 800  # reference scale (01:180-276)
N_REPEAT = 3


def main():
    from pinnfc_tpu.config import TrainConfig
    from pinnfc_tpu.pipeline import run_scoring_pipeline, run_training_pipeline
    from pinnfc_tpu.utils import save_checkpoint
    from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = TrainConfig()  # the full 42k-step schedule + 2000-sample MC export

    t0 = time.perf_counter()
    res = run_training_pipeline(cfg, n_normal=N_NORMAL, n_fault=N_FAULT)
    wall_train = time.perf_counter() - t0
    retrain_s = res.timings["train_s"] + res.timings["export_s"]
    print(f"[score_bench] full pipeline: train {res.timings['train_s']:.1f}s "
          f"+ export {res.timings['export_s']:.1f}s "
          f"(wall {wall_train:.1f}s incl. compile/data)", file=sys.stderr)

    with tempfile.TemporaryDirectory() as td:
        ckpt = os.path.join(td, "ckpt")
        save_checkpoint(ckpt, res.params,
                        res.dataset.scaler_x, res.dataset.scaler_y)

        # warmup scores a campaign of the SAME shape (compiles the export
        # once); timed repeats then vary the seed → new campaign data AND a
        # new MC key each time, so no relay-side execution memoization
        run_scoring_pipeline(ckpt, dc.replace(cfg, seed=99),
                             n_normal=N_NORMAL, n_fault=N_FAULT)
        totals = []
        for i in range(N_REPEAT):
            scored = run_scoring_pipeline(
                ckpt, dc.replace(cfg, seed=100 + i),
                n_normal=N_NORMAL, n_fault=N_FAULT,
            )
            totals.append((sum(scored.timings.values()), scored.timings))
        totals.sort(key=lambda t: t[0])
        score_s, t = totals[len(totals) // 2]
        print(f"[score_bench] score (warm): ckpt {t['ckpt_s']:.2f}s + data "
              f"{t['data_s']:.2f}s + export {t['export_s']:.2f}s "
              f"= {score_s:.2f}s", file=sys.stderr)

    print(json.dumps({
        "metric": "score_vs_retrain_speedup",
        "value": round(retrain_s / score_s, 1),
        "unit": "x",
        "retrain_s": round(retrain_s, 2),
        "score_s": round(score_s, 3),
        "score_ckpt_s": round(t["ckpt_s"], 3),
        "score_data_s": round(t["data_s"], 3),
        "score_export_s": round(t["export_s"], 3),
        "rows": N_NORMAL + 12 * N_FAULT,
        "mc_times": cfg.mc_times,
    }))


if __name__ == "__main__":
    main()
