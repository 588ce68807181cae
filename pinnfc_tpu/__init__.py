"""pinnfc_tpu — TPU-native physics-informed fault diagnosis for PEM fuel cells.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the reference
PyTorch/scikit-learn pipeline (``/root/reference``), rebuilt TPU-first:

- ``data``      — .mat ingestion, MinMax affine scaling (fit-on-normal-train
                  semantics of reference 01:266-289), dataset combination,
                  fault labelling, the 22-column ``comprehensive_results``
                  contract, and a synthetic PEM-stack data generator.
- ``models``    — dropout-MLP voltage network with heteroscedastic variance
                  head (reference 01:389-438) and the PINN parameter pytree
                  holding the 17 learnable physics parameters (01:441-533).
- ``physics``   — the four multi-physics residual models (voltage 01:724-765,
                  thermal 01:767-914, hydrogen 01:621-722, oxygen 01:535-619)
                  as pure jnp functions that stay on-device (the reference
                  round-trips through CPU numpy every step, 01:726-727).
- ``ops``       — Pallas TPU kernels (fused 4-residual evaluation) and
                  scan-based recurrences (leaky integrator / EMA).
- ``training``  — the staged freeze/unfreeze schedule (01:2143-2153) as
                  masked-optimizer jit+scan loops.
- ``uq``        — vmapped MC-dropout aleatoric/epistemic sampling
                  (reference 01:1413-1491, serial loop → single device pass).
- ``diagnosis`` — supervised AUC (script 02), GMM-EM posterior-mapping
                  diagnosis (script 03), six-method comparison (script 05).
- ``risk``      — RF(t) risk function / early-warning index (script 04).
- ``parallel``  — mesh/data-parallel training, many-seed ensembles, sharded
                  MC sweeps (new; the reference has no distributed support).
- ``utils``     — PRNG, checkpointing, metrics logging, profiling.
- ``viz``       — save-to-file matplotlib figures mirroring the reference.
"""

__version__ = "0.1.0"

from pinnfc_tpu import config  # noqa: F401
