"""Deployment self-check (``cli doctor``).

The reference has no operational story at all — its scripts assume a
healthy local CUDA/CPU torch install and fail with raw tracebacks
otherwise.  On this framework's target (a TPU pod reached through a
remote-compile relay) the failure modes are very different and were all
observed live during development:

* the relay handshake can stall backend initialization for minutes —
  or, during an outage, **indefinitely** (observed >11 h) — so any
  health check that calls ``jax.devices()`` in-process can hang the
  caller;
* the persistent compilation cache is the difference between a 2 s and
  a 6 min stage launch, but a partially-written entry (killed process)
  can abort the next reader;
* checkpoints/artifacts move between CPU dev boxes and TPU servers, so
  "can this host actually load what it is about to serve?" is a real
  pre-flight question.

``run_doctor`` encodes those lessons as bounded, composable checks.
Every check returns ``{"name", "ok", "detail", ...}``; nothing here ever
initializes a JAX backend in the calling process (probes and smoke runs
happen in **bounded subprocesses**, the same strategy as
``__graft_entry__.dryrun_multichip``'s platform probe).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from typing import Dict, List, Optional

_MARKER = "PINNFC_DOCTOR_JSON "

# Environment variables that change how/where this framework executes.
_ENV_OF_INTEREST = (
    "JAX_PLATFORMS",
    "PALLAS_AXON_POOL_IPS",
    "XLA_FLAGS",
    "PINNFC_COMPILATION_CACHE_DIR",
    "PINNFC_TEST_TPU",
    "PINNFC_DRYRUN_PROBE_TIMEOUT",
)


def check_versions() -> Dict:
    """Interpreter + library versions (informational; always ok)."""
    import importlib.metadata as md

    import pinnfc_tpu

    vers = {"python": sys.version.split()[0], "pinnfc_tpu": pinnfc_tpu.__version__}
    for pkg in ("jax", "jaxlib", "numpy", "optax", "orbax-checkpoint"):
        try:
            vers[pkg] = md.version(pkg)
        except Exception:
            vers[pkg] = None
    detail = "  ".join(f"{k} {v}" for k, v in vers.items() if v is not None)
    return {"name": "versions", "ok": True, "detail": detail, "versions": vers}


def check_environment() -> Dict:
    """The env vars that select backend/cache behavior (informational)."""
    env = {}
    for key in _ENV_OF_INTEREST:
        val = os.environ.get(key)
        if key == "PALLAS_AXON_POOL_IPS" and val:
            val = "<set>"  # presence is what matters; the IPs are noise
        env[key] = val
    detail = "  ".join(f"{k}={v}" for k, v in env.items() if v is not None)
    return {
        "name": "environment",
        "ok": True,
        "detail": detail or "(no backend/cache overrides set)",
        "env": env,
    }


def check_compilation_cache() -> Dict:
    """Is the persistent compile cache enabled, writable, and how big?

    Mirrors ``utils.compilation_cache.enable_compilation_cache``'s
    resolution: ``PINNFC_COMPILATION_CACHE_DIR`` overrides the default,
    the empty string disables.  A read-only cache dir silently costs
    minutes per TPU compile — that is exactly what this check catches.
    """
    override = os.environ.get("PINNFC_COMPILATION_CACHE_DIR")
    if override == "":
        return {
            "name": "compilation_cache",
            "ok": True,
            "detail": "disabled (PINNFC_COMPILATION_CACHE_DIR='') — every "
            "process recompiles; expected under the CPU test sim only",
            "enabled": False,
        }
    cache_dir = os.path.expanduser(override or "~/.cache/pinnfc_jax")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        probe = os.path.join(cache_dir, f".doctor_probe_{os.getpid()}")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
    except OSError as e:
        return {
            "name": "compilation_cache",
            "ok": False,
            "detail": f"{cache_dir} not writable ({e}) — every TPU compile "
            "will pay the full remote-compile cost (minutes per program)",
            "enabled": True,
            "dir": cache_dir,
        }
    n_entries, n_bytes = 0, 0
    for root, _dirs, files in os.walk(cache_dir):
        for fn in files:
            n_entries += 1
            try:
                n_bytes += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return {
        "name": "compilation_cache",
        "ok": True,
        "detail": f"{cache_dir} writable, {n_entries} entries, "
        f"{n_bytes / 2**20:.1f} MiB",
        "enabled": True,
        "dir": cache_dir,
        "entries": n_entries,
        "bytes": n_bytes,
    }


def check_warmup_coverage() -> Dict:
    """Which warmed production programs are (still) persistent-cache hits
    (utils/warmup.py manifest) — pure filesystem check, no backend init.
    `ok` is False only when previously-warmed programs were evicted or
    the cache was cleared; an absent manifest is informational (run
    `cli warmup` once on a fresh box)."""
    from pinnfc_tpu.utils.warmup import warmup_coverage

    res = warmup_coverage()
    res["name"] = "warmup_coverage"
    return res


def _bounded_python(code: str, timeout: float, env: Optional[dict] = None) -> Dict:
    """Run ``code`` in a fresh interpreter with the repo importable; parse
    the last ``_MARKER`` line as JSON.  Timeouts/failures come back as
    ``{"ok": False, ...}`` instead of raising — a relay outage must
    produce a readable diagnosis, not a hung or crashed doctor."""
    import pinnfc_tpu

    run_env = dict(os.environ if env is None else env)
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(pinnfc_tpu.__file__)))
    run_env["PYTHONPATH"] = os.pathsep.join(
        p for p in (pkg_parent, run_env.get("PYTHONPATH")) if p
    )
    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            env=run_env,
            capture_output=True,
            text=True,
            timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {
            "ok": False,
            "error": f"timed out after {timeout:.0f}s — on the axon relay "
            "this usually means the handshake is stalled (outages of "
            "minutes to hours observed); retry later or pin --platform cpu",
            "elapsed_s": round(time.perf_counter() - t0, 1),
        }
    if proc.returncode != 0:
        tail = (proc.stdout + proc.stderr)[-2000:]
        return {"ok": False, "error": f"rc={proc.returncode}: {tail}"}
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith(_MARKER):
            out = json.loads(line[len(_MARKER):])
            out.setdefault("ok", True)
            return out
    return {"ok": False, "error": f"no doctor marker in output: {proc.stdout[-500:]}"}


_PROBE_CODE = f"""
import json, time
# Persistent-cache the probe op: without this every doctor run pays a
# full remote compile on the relay (observed >2 min cold) even when the
# cache would make it seconds.  t0 starts BEFORE the cache module import
# (which itself imports jax), so init_s keeps its historical
# import-inclusive meaning: `import jax` wall time + device handshake.
t0 = time.time()
from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
import jax
devs = jax.devices()
init_s = time.time() - t0
import jax.numpy as jnp
t1 = time.time()
r = jax.jit(lambda a: (a @ a).sum())(jnp.ones((256, 256), jnp.float32))
float(r)
first_op_s = time.time() - t1
print({_MARKER!r} + json.dumps({{
    "platform": jax.default_backend(),
    "devices": [str(d) for d in devs],
    "init_s": round(init_s, 1),
    "first_op_s": round(first_op_s, 1),
}}))
"""


def probe_backend(timeout: float = 600.0, platform: Optional[str] = None) -> Dict:
    """Initialize the JAX backend in a BOUNDED subprocess and time (a) the
    device handshake and (b) one tiny jitted op.  ``platform`` overrides
    ``JAX_PLATFORMS`` (``'cpu'`` also removes the sitecustomize axon
    trigger, matching ``__graft_entry__.cpu_sim_env``)."""
    env = dict(os.environ)
    if platform:
        env["JAX_PLATFORMS"] = platform
        if platform == "cpu":
            env.pop("PALLAS_AXON_POOL_IPS", None)
    res = _bounded_python(_PROBE_CODE, timeout, env)
    res["name"] = "backend_probe"
    if res["ok"]:
        res["detail"] = (
            f"{res['platform']}: {len(res['devices'])}x {res['devices'][0]}, "
            f"init {res['init_s']}s, first op {res['first_op_s']}s"
        )
    else:
        res["detail"] = res.get("error", "probe failed")
    return res


_SMOKE_CODE = f"""
import json, time
import numpy as np
from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
from pinnfc_tpu.models.mlp import init_mlp
from pinnfc_tpu.training.stages import train_dnn_stage
rng = np.random.RandomState(0)
x = jnp.asarray(rng.uniform(-1, 1, (256, 8)), jnp.float32)
y = jnp.asarray(rng.uniform(-1, 1, (256, 1)), jnp.float32)
params = init_mlp(jax.random.PRNGKey(0), (8, 32, 32, 32, 1))
t0 = time.time()
res = train_dnn_stage(params, x, y, jax.random.key(0, impl="rbg"), n_iter=101)
loss = float(res.losses[-1])
first_call_s = time.time() - t0
t1 = time.time()
res = train_dnn_stage(params, x, y, jax.random.key(1, impl="rbg"), n_iter=101)
float(res.losses[-1])
steady_s = time.time() - t1
print({_MARKER!r} + json.dumps({{
    "ok": bool(np.isfinite(loss)),
    "platform": jax.default_backend(),
    "steps_per_sec": round(101 / steady_s, 1),
    "first_call_s": round(first_call_s, 1),
    "final_loss": loss,
}}))
"""


def smoke_train(timeout: float = 900.0, platform: Optional[str] = None) -> Dict:
    """End-to-end smoke: 101 Adam steps of the stage-1 trainer at toy scale
    in a bounded subprocess.  Proves compile + execute + readback work on
    the resolved backend and reports steps/s (NOT the headline bench —
    toy shapes; use ``bench.py`` for numbers that mean something)."""
    env = dict(os.environ)
    if platform:
        env["JAX_PLATFORMS"] = platform
        if platform == "cpu":
            env.pop("PALLAS_AXON_POOL_IPS", None)
    res = _bounded_python(_SMOKE_CODE, timeout, env)
    res["name"] = "smoke_train"
    if res["ok"]:
        res["detail"] = (
            f"{res['platform']}: 101 toy Adam steps, "
            f"{res['steps_per_sec']} steps/s steady "
            f"(first call {res['first_call_s']}s incl. compile/cache-load)"
        )
    else:
        res["detail"] = res.get("error", "smoke run failed")
    return res


def check_checkpoint(path: str) -> Dict:
    """Can this host load the checkpoint it is about to serve?  Raw load
    (no jnp conversion, process pinned to CPU — same rationale as
    ``cli inspect``) + the provenance sidecar."""
    from pinnfc_tpu.utils import load_checkpoint_meta
    from pinnfc_tpu.utils.checkpoint import _flatten, load_checkpoint_raw

    try:
        import jax

        prev = jax.config.jax_platforms
        jax.config.update("jax_platforms", "cpu")
        try:
            ckpt = load_checkpoint_raw(path)
        finally:
            jax.config.update("jax_platforms", prev)
        flat = _flatten(ckpt["params"])
        total = int(sum(a.size for a in flat.values()))
        scalers = [k for k in ("scaler_x", "scaler_y") if ckpt.get(k) is not None]
    except Exception as e:
        return {"name": "checkpoint", "ok": False, "detail": f"{path}: {e}"}
    meta = load_checkpoint_meta(path)
    prov = ""
    if isinstance(meta, dict):
        bits = [str(meta.get("created", ""))]
        cfg = meta.get("config")
        if isinstance(cfg, dict) and "seed" in cfg:
            bits.append(f"seed {cfg['seed']}")
        prov = ", " + ", ".join(b for b in bits if b)
    return {
        "name": "checkpoint",
        "ok": True,
        "detail": f"{path}: {total:,} params, scalers {'+'.join(scalers) or 'absent'}"
        f"{prov}",
        "total_parameters": total,
        "meta": meta,
    }


def check_artifact(path: str) -> Dict:
    """Deserialize a StableHLO artifact (no execution) and report which
    platforms it was lowered for — the pre-flight that catches
    'cpu-only artifact deployed to the TPU server' before the first
    request does."""
    try:
        from jax import export as jexport

        with open(path, "rb") as f:
            blob = f.read()
        exp = jexport.deserialize(blob)
        platforms = list(exp.platforms)
        in_shapes = [str(a) for a in exp.in_avals]
    except Exception as e:
        return {"name": "artifact", "ok": False, "detail": f"{path}: {e}"}
    sidecar = None
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        try:
            with open(meta_path) as f:
                sidecar = json.load(f)
        except (OSError, ValueError):
            sidecar = None
    return {
        "name": "artifact",
        "ok": True,
        "detail": f"{path}: platforms {','.join(platforms)}, "
        f"{len(blob) / 2**20:.2f} MiB, inputs {in_shapes[:3]}"
        + ("…" if len(in_shapes) > 3 else "")
        + (", sidecar ok" if sidecar else ""),
        "platforms": platforms,
        "sidecar": sidecar,
    }


def run_doctor(
    probe_timeout: float = 600.0,
    platform: Optional[str] = None,
    skip_probe: bool = False,
    smoke: bool = False,
    ckpt: Optional[str] = None,
    artifact: Optional[str] = None,
) -> List[Dict]:
    """Run all requested checks in dependency-light → heavy order."""
    checks = [
        check_versions(),
        check_environment(),
        check_compilation_cache(),
        check_warmup_coverage(),
    ]
    if ckpt:
        checks.append(check_checkpoint(ckpt))
    if artifact:
        checks.append(check_artifact(artifact))
    if not skip_probe:
        checks.append(probe_backend(probe_timeout, platform))
    if smoke:
        checks.append(smoke_train(max(probe_timeout, 900.0), platform))
    return checks
