"""Build the 22-column ``comprehensive_results`` matrix.

Mirrors reference ``create_comprehensive_results_array_v2`` (01:1877-2010):
MC-dropout statistics, de-normalization through the scaler affine constants
(with the reference's ``+1e-12`` guards, 01:1924-1932), all four physics
residuals, segment-aware smoothing of the uncertainty channels, and fault
labels — assembled into one (N, 22) array saved as ``F01_output.mat``.

Everything up to the final numpy assembly runs on-device in one jitted pass.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from pinnfc_tpu.data.combine import FuelCellDataset
from pinnfc_tpu.data.contract import ComprehensiveResults
from pinnfc_tpu.models.pinn import PinnParams
from pinnfc_tpu.ops.smoothing import smooth_by_segments
from pinnfc_tpu.physics.residuals import all_residuals
from pinnfc_tpu.uq.mc_dropout import mc_dropout_samples


@jax.jit
def _device_columns(params: PinnParams, x_test, y_test, sx, sy, mc):
    """On-device portion: de-normalization + residual bundle."""
    x_real = sx.inverse(x_test)
    y_real = sy.inverse(y_test)[:, 0]

    # Reference de-normalizes through re-derived affine constants with
    # +1e-12 guards (01:1920-1932) rather than scaler.inverse_transform.
    scale_y, min_y = sy.loss_affine()
    pred_real = (mc.pred_mean - min_y) / (scale_y + 1e-12)
    ale_real = mc.aleatoric_std / (scale_y + 1e-12)
    epi_real = mc.epistemic_std / (scale_y + 1e-12)

    u_norm = mc.pred_mean[:, None]
    bundle = all_residuals(params, x_test, u_norm, sx, sy)
    return x_real, y_real, pred_real, ale_real, epi_real, bundle


def build_comprehensive_results(
    params: PinnParams,
    dataset: FuelCellDataset,
    rng: Optional[jax.Array] = None,
    mc_times: int = 2000,
    dropout: float = 0.4,
    smooth_window: int = 200,
    sampler: str = "auto",
    mesh=None,
) -> ComprehensiveResults:
    """Full exporter (reference 01:1877-2010 + main call 01:2156-2158).

    ``sampler``: 'auto' (default — the fused Pallas kernel on TPU, the
    vmapped sampler elsewhere), 'vmap' (jax.random streams), or 'pallas'
    (VMEM-resident kernel, counter-based RNG — statistically equivalent
    per-sample stream, 6× faster on TPU; see ops.pallas_mc_dropout and
    PERFORMANCE.md).  Only the flagship (8,256,256,256,1) topology has a
    kernel; 'auto' falls back to vmap for other shapes.

    With ``mesh``, the MC sampling — the exporter's dominant cost — runs
    with rows sharded over the mesh's 'data' axis (each device computes
    full MC statistics for its row shard, zero collectives; rows are
    edge-padded to the axis multiple and trimmed after, which is exact
    because the per-row statistics are row-independent).  The mesh path
    uses the vmapped sampler (the Pallas kernel is a single-core program).

    Note: the reference evaluates ``net_f_V`` on the *eval-mode DNN
    prediction* (01:1947 uses self.dnn after eval), which equals the MC
    pred_mean — the same value is used here.
    """
    rng = jax.random.PRNGKey(1) if rng is None else rng
    if sampler == "pallas" and mesh is not None:
        raise ValueError(
            "sampler='pallas' is a single-core kernel and cannot honor a mesh; "
            "use sampler='auto'/'vmap' with mesh, or drop the mesh"
        )
    if sampler == "auto":
        flagship = [w["w"].shape for w in params["mlp"]["hidden"]] == [
            (8, 256), (256, 256), (256, 256)
        ]
        sampler = (
            "pallas"
            if flagship and jax.default_backend() == "tpu" and mesh is None
            else "vmap"
        )
    if mesh is not None and sampler != "pallas":
        from pinnfc_tpu.parallel.ensemble import mc_dropout_sharded
        from pinnfc_tpu.parallel.mesh import pad_to_multiple
        from pinnfc_tpu.uq.mc_dropout import MCSamples

        # rows shard only over the 'data' axis (model axes replicate), so
        # padding to the data-axis size suffices — not the device product
        x_pad, n0 = pad_to_multiple(np.asarray(dataset.x_test), mesh.shape["data"])
        mc_pad = mc_dropout_sharded(
            params["mlp"], jnp.asarray(x_pad, jnp.float32), rng, mesh,
            mc_times=mc_times, dropout=dropout,
        )
        mc = MCSamples(
            pred_mean=jnp.asarray(np.asarray(mc_pad.pred_mean)[:n0]),
            aleatoric_std=jnp.asarray(np.asarray(mc_pad.aleatoric_std)[:n0]),
            epistemic_std=jnp.asarray(np.asarray(mc_pad.epistemic_std)[:n0]),
        )
    elif sampler == "pallas":
        from pinnfc_tpu.ops.pallas_mc_dropout import mc_dropout_pallas

        seed = int(jax.random.randint(rng, (), 0, 2**31 - 1))
        mc = mc_dropout_pallas(
            params["mlp"], dataset.x_test, seed, mc_times=mc_times,
            dropout=dropout, interpret=jax.default_backend() != "tpu",
        )
    else:
        mc = mc_dropout_samples(
            params["mlp"], dataset.x_test, rng, mc_times=mc_times, dropout=dropout
        )
    x_real, y_real, pred_real, ale_real, epi_real, bundle = _device_columns(
        params, dataset.x_test, dataset.y_test, dataset.scaler_x, dataset.scaler_y, mc
    )

    n = int(dataset.x_test.shape[0])
    boundaries = list(dataset.info.boundary_lines)
    if boundaries and boundaries[-1] != n:
        boundaries = boundaries + [n]

    ale_smooth = smooth_by_segments(np.asarray(ale_real), boundaries, smooth_window)
    epi_smooth = smooth_by_segments(np.asarray(epi_real), boundaries, smooth_window)
    labels = dataset.info.fault_labels(n)

    out = np.zeros((n, 22), dtype=np.float64)
    out[:, 0:8] = np.asarray(x_real)
    out[:, 8] = np.asarray(y_real)
    out[:, 9] = np.asarray(pred_real)
    out[:, 10] = ale_smooth
    out[:, 11] = epi_smooth
    out[:, 12] = out[:, 8] - out[:, 9]
    out[:, 13] = np.asarray(bundle.f_v[:, 0])
    out[:, 14] = np.asarray(bundle.f_t[:, 0])
    out[:, 15] = np.asarray(bundle.f_h[:, 0])
    out[:, 16] = np.asarray(bundle.f_o[:, 0])
    out[:, 17] = labels
    out[:, 18] = np.asarray(bundle.v_phys_stack[:, 0])
    out[:, 19] = np.asarray(bundle.t_phys[:, 0])
    out[:, 20] = np.asarray(bundle.ratio_h[:, 0])
    out[:, 21] = np.asarray(bundle.ratio_o[:, 0])
    return ComprehensiveResults(out)
