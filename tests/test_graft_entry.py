"""Driver-contract tests for __graft_entry__.

The round-1 driver run failed (`MULTICHIP_r01.json`): the image's
sitecustomize initializes a 1-chip backend at interpreter startup, so
XLA_FLAGS set inside ``dryrun_multichip`` never materialized the virtual
devices.  These tests reproduce exactly those conditions in a subprocess
and assert the subprocess-re-exec path recovers.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_entry_compiles():
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    import jax

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_dryrun_inprocess_fast_path():
    """With 8 simulated devices already live (conftest), the dry run must
    execute in-process — full step + mini schedule + sharded MC."""
    import jax

    if jax.device_count() < 8:
        pytest.skip("needs the 8-device CPU simulation")
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_survives_preinitialized_1device_backend():
    """Regression for MULTICHIP_r01: a parent process whose JAX backend is
    already initialized with ONE device (the driver's situation — the
    sitecustomize axon init) must still pass dryrun_multichip(8) via the
    subprocess re-exec."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    # 1-device CPU backend, no force-host-platform flag: mirrors the
    # driver's "backend initialized before dryrun, too few devices" state.
    env = g.cpu_sim_env(1)
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env.pop("_PINNFC_DRYRUN_CHILD", None)
    code = (
        "import jax\n"
        "assert jax.device_count() == 1, jax.device_count()\n"
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "print('DRYRUN_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "DRYRUN_OK" in proc.stdout


def test_live_device_count_peek_does_not_initialize_backend():
    """The parent-side device check must NEVER trigger backend
    initialization (the axon relay handshake can hang a first device
    query for >20 min): in a fresh interpreter it reports None and leaves
    no backend behind."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    env = g.cpu_sim_env(8)
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import __graft_entry__ as g\n"
        "assert g._live_device_count() is None\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, 'peek initialized a backend!'\n"
        "import jax\n"
        "assert jax.device_count() == 8\n"
        "assert g._live_device_count() == 8\n"
        "print('PEEK_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PEEK_OK" in proc.stdout


def test_dryrun_probe_path_with_uninitialized_adequate_platform():
    """A parent that has NOT initialized jax, in an env whose default
    platform already supplies enough devices (the driver's usual CPU-sim
    launch), must pass via the bounded probe + inherited-env re-exec —
    without the parent ever initializing a backend itself."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    env = g.cpu_sim_env(8)
    env.pop("_PINNFC_DRYRUN_CHILD", None)
    code = (
        f"import sys; sys.path.insert(0, {REPO!r})\n"
        "import __graft_entry__ as g\n"
        "g.dryrun_multichip(8)\n"
        "from jax._src import xla_bridge\n"
        "assert not xla_bridge._backends, 'parent initialized a backend!'\n"
        "print('DRYRUN_OK')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd=REPO,
        capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "DRYRUN_OK" in proc.stdout


def test_dryrun_probe_timeout_falls_back_to_cpu_sim(monkeypatch):
    """A probe that cannot finish within the bound must fall back to the
    CPU-simulation re-exec, not hang the dry run."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    calls = {}

    def fake_probe(timeout):
        calls["timeout"] = timeout
        return None  # what a timed-out/hung platform probe returns

    monkeypatch.setattr(g, "_probe_device_count", fake_probe)
    monkeypatch.setattr(g, "_live_device_count", lambda: None)
    monkeypatch.setenv("PINNFC_DRYRUN_PROBE_TIMEOUT", "7")

    seen = {}
    real_run = subprocess.run

    def fake_run(cmd, env=None, **kw):
        seen["env"] = env

        class P:
            returncode = 0
            stdout = ""
            stderr = ""

        return P()

    monkeypatch.setattr(g.subprocess, "run", fake_run)
    g.dryrun_multichip(8)
    monkeypatch.setattr(g.subprocess, "run", real_run)
    assert calls["timeout"] == 7.0
    # fell back to the clean CPU-sim env, axon trigger removed
    assert seen["env"]["JAX_PLATFORMS"] == "cpu"
    assert "PALLAS_AXON_POOL_IPS" not in seen["env"]
    assert "--xla_force_host_platform_device_count=8" in seen["env"]["XLA_FLAGS"]


def test_dryrun_impl_raises_on_insufficient_devices():
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    with pytest.raises(RuntimeError, match="cannot materialize"):
        g._dryrun_impl(100000)


def test_dryrun_propagates_child_failure(monkeypatch):
    """A failing child must surface as a RuntimeError, not a silent pass."""
    sys.path.insert(0, REPO)
    import __graft_entry__ as g

    # An unknown XLA flag makes the child's backend init abort fatally;
    # n=16 > the 8 simulated devices skips the in-process fast path.
    monkeypatch.setenv("XLA_FLAGS", "--this_flag_does_not_exist=1")
    with pytest.raises(RuntimeError, match="subprocess failed"):
        g.dryrun_multichip(16)
