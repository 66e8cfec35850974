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

import os as _os

import jax as _jax

# TPU numerics: XLA's DEFAULT matmul precision truncates f32 matmul INPUTS to
# bf16 on TPU. For neural nets that's the right trade; for geometric vision it
# silently corrupts subpixel interpolation, descriptor distances, and 3D
# reprojection (measured: KLT bootstrap survival 511 vs 685 tracks over 6 hops,
# PnP inlier ratio 60% vs 93%, and full-sequence tracking collapse at KITTI
# scale — round-3 replay). Full-f32 multiplies are the framework default; the
# few big bandwidth-bound matmuls that tolerate bf16 opt out explicitly at the
# call site, and the KLT iteration loop's bf16 option (klt.iter_dtype) makes
# the storage trade deliberate rather than implicit.
#
# NOTE this mutates PROCESS-GLOBAL JAX config as an import side effect: a host
# program that merely imports lcvo_tpu changes the default numerics (and on-TPU
# matmul throughput) of its own unrelated JAX code. That scope is deliberate —
# any JAX code feeding or consuming this framework's geometry inherits safe
# numerics — but embedders who want XLA's default back can opt out with
# ``LCVO_NO_MATMUL_PRECISION_OVERRIDE=1`` (set before import) and pin precision
# per-op in their own code. The VO pipeline itself is NOT validated under the
# opt-out (see BASELINE.md round 3 for the failure it reintroduces).
if not _os.environ.get("LCVO_NO_MATMUL_PRECISION_OVERRIDE"):
    _jax.config.update("jax_default_matmul_precision", "float32")

from lcvo_tpu.config import VOConfig, load_config  # noqa: F401
