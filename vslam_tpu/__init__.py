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
