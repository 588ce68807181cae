"""HBM footprint of the production program set at campaign scale.

Prints one JSON line per program with XLA's post-buffer-assignment
statistics (utils/memory.py), plus a summary line with the largest
resident set vs the 16 GB v5e budget.  Run on the TPU for the numbers
PERFORMANCE.md records; the CPU sim gives the same buffer shapes with
host layouts (same order of magnitude — the guard test uses it).

Usage:  python benchmarks/memory_bench.py [--small] [--fleet S]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--fleet", type=int, default=64,
                    help="fleet-step stream count (0 disables)")
    ap.add_argument("--block", type=int, default=64)
    args = ap.parse_args()

    from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from pinnfc_tpu.config import TrainConfig
    from pinnfc_tpu.utils.memory import V5E_HBM_BYTES, production_memory_report

    if args.small:
        from pinnfc_tpu.cli._common import _small_schedule

        cfg = TrainConfig(schedule=_small_schedule(), mc_times=200)
        n_normal, n_fault = 1500, 200
    else:
        cfg = TrainConfig()
        n_normal, n_fault = 6000, 800

    reports = production_memory_report(
        cfg, n_normal=n_normal, n_fault=n_fault,
        fleet_streams=args.fleet or None, block=args.block,
    )
    worst = 0
    for rep in reports:
        print(json.dumps(rep))
        worst = max(worst, rep.get("resident_bytes", 0))
    print(json.dumps({
        "metric": "peak_program_resident_mib",
        "value": round(worst / 2**20, 1),
        "unit": "MiB",
        "backend": jax.default_backend(),
        "budget_frac_v5e": round(worst / V5E_HBM_BYTES, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
