"""lcvo_tpu — a TPU-native, locally-consistent monocular visual-odometry framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``VisionProject2023/locally-consistent-Visual-Odometry-pipeline`` (the "BestVision"
course project): Markovian VO state machine (reference ``src/vo_pipeline.py:20-38``),
two-view bootstrap, KLT tracking, PnP localization, candidate triangulation — plus the
capabilities the reference lists as future work (sliding-window bundle adjustment,
multi-host scaling).

Design stance (NOT a port): fixed-capacity masked track tables so the whole per-frame
step compiles once under ``jax.jit``; batched/vectorized geometric solvers that map onto
the MXU; Pallas kernels for the patch-stencil hot loops; ``jax.sharding`` meshes +
collectives for multi-chip scale-out.
"""

__version__ = "0.1.0"

from lcvo_tpu.config import VOConfig, load_config  # noqa: F401
