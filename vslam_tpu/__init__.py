"""vslam_tpu — a TPU-native stereo visual SLAM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
yunjinli/visual-slam (ORB-SLAM-style stereo SLAM on EuRoC): ORB-style
feature frontend, brute-force Hamming matching on the MXU, batched
RANSAC PnP tracking, Levenberg-Marquardt bundle adjustment with an
explicit Schur complement, bag-of-visual-words place recognition,
loop closure with essential-graph pose optimization, relocalization,
and EuRoC evaluation (ATE via SE3 Umeyama alignment).

The design is TPU-first: fixed-capacity functional state (padded dense
arrays + masks) so per-frame work jits into a handful of XLA programs,
Pallas kernels for the hot image ops, vmapped minimal solvers for
RANSAC, and jax.sharding meshes for multi-sequence / large-map scaling.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# Geometry (pose solves, SVD, normal equations) needs true f32 matmuls.
# The platform default lowers f32 matmuls to bf16 passes (~4e-3 relative
# error), which corrupts pose math; the hot kernels (Hamming matching) are
# int8 and unaffected by this setting.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the pipeline is a handful of fixed-shape XLA
# programs recompiled identically every process; cache them across runs.
# TPU/accelerator backends only — reloading cached CPU executables on this
# host segfaults inside XLA's AOT loader (cpu_aot_loader machine-feature
# mismatch, e.g. "+prefer-no-scatter"), so forced-CPU runs (the test
# suite's 8-device host mesh) always compile fresh.
_cache_dir = _os.environ.get(
    "VSLAM_JAX_CACHE", _os.path.expanduser("~/.cache/vslam_tpu_jax"))
if _cache_dir and _os.environ.get("JAX_PLATFORMS", "") != "cpu":
    _jax.config.update("jax_compilation_cache_dir", _cache_dir)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
