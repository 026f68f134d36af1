"""neo360_tpu — a TPU-native (JAX / XLA / Pallas / pjit) framework for
generalizable NeRF on unbounded outdoor scenes, with the capabilities of the
NeO-360 reference (ICCV 2023).

Model families (reference parity, see SURVEY.md §2.3):
  - vanilla NeRF          (models/vanilla.py)
  - MipNeRF-360           (models/mipnerf360.py)
  - PixelNeRF             (models/pixelnerf.py)
  - NeO-360 tri-planar    (models/neo360.py)

Design principles (TPU-first, not a port):
  - All compute-path code is pure-functional JAX under a single jit per step.
  - Fixed shapes everywhere; full-image rendering tiles rays with lax.map.
  - Encoders run once per scene batch, never per ray chunk.
  - Multi-device scaling via jax.sharding.Mesh + NamedSharding (see parallel/).
  - Hot ops (bilinear sampling, distortion loss) have Pallas TPU kernels with
    plain-XLA fallbacks used as correctness oracles (see ops/).
"""

__version__ = "0.1.0"
