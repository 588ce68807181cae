"""Checkpoint round-trip and observability tests."""

import jax
import numpy as np
import pytest

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.pinn import init_pinn
from pinnfc_tpu.utils import (
    MetricsLogger,
    StepTimer,
    load_checkpoint,
    load_checkpoint_meta,
    load_params_npz,
    save_checkpoint,
    save_params_npz,
)


class TestCheckpoint:
    def test_saved_arrays_are_host_numpy(self, tmp_path):
        """save_checkpoint must materialize device arrays to host numpy
        before writing: orbax otherwise records the saving platform's
        sharding and a TPU-written checkpoint cannot be restored in a CPU
        process (found driving a TPU-trained checkpoint from the CLI)."""
        from pinnfc_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

        params = init_pinn(jax.random.PRNGKey(2), (8, 16, 1))
        params = jax.device_put(params)  # arrays live on a device
        path = str(tmp_path / "xplat_ckpt")
        save_checkpoint(path, params)
        ck = load_checkpoint(path)
        leaves = jax.tree_util.tree_leaves(ck["params"])
        assert all(isinstance(l, np.ndarray) for l in leaves)
        np.testing.assert_allclose(
            np.asarray(leaves[0]),
            np.asarray(jax.tree_util.tree_leaves(params)[0]),
        )

    def test_npz_roundtrip(self, tmp_path):
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 16, 1))
        path = str(tmp_path / "params.npz")
        save_params_npz(params, path)
        loaded = load_params_npz(path)
        for g in ("lam_v", "lam_t", "lam_h", "lam_o"):
            np.testing.assert_allclose(np.asarray(loaded[g]), np.asarray(params[g]))
        np.testing.assert_allclose(
            np.asarray(loaded["mlp"]["hidden"][0]["w"]),
            np.asarray(params["mlp"]["hidden"][0]["w"]),
        )
        assert isinstance(loaded["mlp"]["hidden"], list)

    def test_full_checkpoint_roundtrip(self, tmp_path):
        params = init_pinn(jax.random.PRNGKey(1), (8, 8, 1))
        sx = AffineScaler.fit(np.random.RandomState(0).rand(20, 8))
        sy = AffineScaler.fit(np.random.RandomState(0).rand(20, 1))
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, params, sx, sy, step=7)
        loaded = load_checkpoint(path)
        np.testing.assert_allclose(
            np.asarray(loaded["params"]["lam_h"]), np.asarray(params["lam_h"])
        )
        np.testing.assert_allclose(
            np.asarray(loaded["scaler_x"].scale), np.asarray(sx.scale)
        )
        assert int(np.asarray(loaded["step"])) == 7
        # saved without meta: no sidecar, no 'meta' key
        assert "meta" not in loaded
        assert load_checkpoint_meta(path) is None

    def test_meta_sidecar_roundtrip(self, tmp_path):
        """Provenance metadata rides a .meta.json sidecar: readable without
        deserializing arrays (load_checkpoint_meta) and attached to the
        full load; numpy scalars AND arrays in metrics are JSON-coerced."""
        params = init_pinn(jax.random.PRNGKey(1), (8, 8, 1))
        path = str(tmp_path / "ckpt")
        meta = {
            "framework_version": "0.1.0",
            "n_normal": 6000,
            "metrics": {"v_mae": np.float32(0.0064),   # numpy scalar ok
                        "per_fault": np.array([0.9, 0.8])},  # array ok
        }
        save_checkpoint(path, params, meta=meta)
        peeked = load_checkpoint_meta(path)
        assert peeked["n_normal"] == 6000
        assert abs(peeked["metrics"]["v_mae"] - 0.0064) < 1e-6
        assert peeked["metrics"]["per_fault"] == [0.9, 0.8]
        assert load_checkpoint(path)["meta"] == peeked

    def test_meta_sidecar_hygiene(self, tmp_path):
        """(a) Re-saving the same path WITHOUT meta removes the stale
        sidecar — provenance must never describe a different model.
        (b) A corrupt sidecar degrades to meta=None with a warning instead
        of blocking the intact arrays."""
        from pinnfc_tpu.utils.checkpoint import _meta_path

        params = init_pinn(jax.random.PRNGKey(1), (8, 8, 1))
        path = str(tmp_path / "ckpt")
        save_checkpoint(path, params, meta={"n_normal": 1})
        assert load_checkpoint_meta(path) == {"n_normal": 1}

        save_checkpoint(path, params)  # no meta → sidecar gone
        assert load_checkpoint_meta(path) is None
        assert "meta" not in load_checkpoint(path)

        save_checkpoint(path, params, meta={"n_normal": 2})
        with open(_meta_path(path), "w") as f:
            f.write('{"n_normal": 2')  # truncated mid-write by a copy tool
        with pytest.warns(UserWarning, match="unreadable checkpoint metadata"):
            loaded = load_checkpoint(path)
        assert "meta" not in loaded
        assert "params" in loaded  # arrays still load

    def test_train_config_dict_roundtrip(self):
        """train_config_to_dict survives JSON (tuples→lists) and rebuilds
        an EQUAL TrainConfig — the contract `cli score`'s 'score like you
        trained' default rests on."""
        import json

        from pinnfc_tpu.config import (
            StageConfig,
            TrainConfig,
            train_config_from_dict,
            train_config_to_dict,
        )

        cfg = TrainConfig(
            schedule=(StageConfig("dnn", 5, lr=0.01),
                      StageConfig("thermal", 3, lr=1.0, lr_gamma=0.9)),
            mc_times=17, seed=3,
        )
        rebuilt = train_config_from_dict(
            json.loads(json.dumps(train_config_to_dict(cfg)))
        )
        assert rebuilt == cfg


class TestObservability:
    def test_metrics_logger(self, tmp_path):
        log = MetricsLogger()
        log.log(0, loss=1.0)
        log.log(1, loss=0.5, lr=0.01)
        assert log.latest()["loss"] == 0.5
        p = tmp_path / "m.jsonl"
        log.to_jsonl(str(p))
        assert len(p.read_text().strip().splitlines()) == 2

    def test_step_timer(self):
        t = StepTimer()
        for _ in range(3):
            with t:
                pass
        assert t.steps_per_sec(10) > 0


class TestProfileTrace:
    def test_trace_capture(self, tmp_path):
        import jax
        import jax.numpy as jnp

        from pinnfc_tpu.utils import profile_trace

        out_dir = str(tmp_path / "trace")
        with profile_trace(out_dir):
            x = jnp.ones((64, 64))
            jax.block_until_ready(jax.jit(lambda a: a @ a)(x))
        import os

        found = []
        for root, _, files in os.walk(out_dir):
            found += files
        assert found, "profiler produced no trace files"

    def test_disabled_is_noop(self):
        from pinnfc_tpu.utils import profile_trace

        with profile_trace(enabled=False):
            pass


class TestTensorboardEvents:
    """utils/tbevents.py — dependency-free TensorBoard scalar event files
    (SURVEY §5 'optional TensorBoard')."""

    def test_crc32c_known_vectors(self):
        # RFC 3720 §B.4 test vectors
        from pinnfc_tpu.utils.tbevents import crc32c

        assert crc32c(b"\x00" * 32) == 0x8A9136AA
        assert crc32c(b"\xff" * 32) == 0x62A8AB43
        assert crc32c(bytes(range(32))) == 0x46DD794E
        assert crc32c(b"123456789") == 0xE3069283

    def test_roundtrip_with_own_reader(self, tmp_path):
        from pinnfc_tpu.utils import EventFileWriter, read_events

        with EventFileWriter(str(tmp_path)) as w:
            w.add_scalar("loss/dnn", 1.5, step=0, wall_time=123.25)
            w.add_scalar("loss/dnn", 0.75, step=1)
            w.add_scalars({"final/mae": 0.01, "time/train_s": 2.0}, step=7)
            path = w.path
        ev = read_events(path)
        assert [(e.tag, e.step, e.value) for e in ev] == [
            ("loss/dnn", 0, 1.5),
            ("loss/dnn", 1, 0.75),
            ("final/mae", 7, np.float32(0.01)),
            ("time/train_s", 7, 2.0),
        ]
        assert ev[0].wall_time == 123.25

    def test_corruption_is_detected(self, tmp_path):
        from pinnfc_tpu.utils import EventFileWriter, read_events

        with EventFileWriter(str(tmp_path)) as w:
            w.add_scalar("a", 1.0, step=0)
            path = w.path
        blob = bytearray(open(path, "rb").read())
        blob[-6] ^= 0xFF  # flip a payload byte of the last record
        open(path, "wb").write(bytes(blob))
        with pytest.raises(ValueError, match="CRC"):
            read_events(path)

    def test_tensorboard_itself_reads_our_file(self, tmp_path):
        """The authoritative cross-check: TensorBoard's own EventAccumulator
        parses a file produced by the hand-rolled writer."""
        acc_mod = pytest.importorskip(
            "tensorboard.backend.event_processing.event_accumulator"
        )
        from pinnfc_tpu.utils import EventFileWriter

        with EventFileWriter(str(tmp_path)) as w:
            for i, v in enumerate([3.0, 2.0, 1.25]):
                w.add_scalar("loss/stage", v, step=i)
            w.add_scalars({"final/mae": 0.5, "final/rmse": 0.9}, step=2)
        acc = acc_mod.EventAccumulator(str(tmp_path))
        acc.Reload()
        assert set(acc.Tags()["scalars"]) == {
            "loss/stage", "final/mae", "final/rmse"}
        got = [(e.step, e.value) for e in acc.Scalars("loss/stage")]
        assert got == [(0, 3.0), (1, 2.0), (2, 1.25)]
        assert acc.Scalars("final/mae")[0].value == 0.5

    def test_same_second_writers_never_collide(self, tmp_path):
        """Two writers on one logdir in the same second get distinct files
        (pid + per-process uid in the name; 'xb' would error on collision)."""
        from pinnfc_tpu.utils import EventFileWriter, read_events

        with EventFileWriter(str(tmp_path)) as a, \
                EventFileWriter(str(tmp_path)) as b:
            a.add_scalar("x", 1.0, step=0)
            b.add_scalar("x", 2.0, step=0)
            assert a.path != b.path
        assert read_events(a.path)[0].value == 1.0
        assert read_events(b.path)[0].value == 2.0

    def test_malformed_nested_length_raises(self, tmp_path):
        """A record whose CRC is valid but whose nested protobuf declares a
        length past the buffer raises a clear error (not silent truncation)."""
        import struct

        from pinnfc_tpu.utils.tbevents import (
            _pb_bytes,
            _pb_double,
            _tfrecord,
            read_events,
        )

        # Event{wall_time, summary=field5 declaring 100 bytes but empty}
        bad = _pb_double(1, 0.0) + bytes([0x2A, 100])  # field 5, wt 2, len 100
        path = str(tmp_path / "evil")
        with open(path, "wb") as f:
            f.write(_tfrecord(bad))
        with pytest.raises(ValueError, match="declares"):
            read_events(path)
