"""Fused feature extraction: detection + orientation + description.

One jitted program per image size replaces the reference's
``detectKeypointsAndDescriptors``
(/root/reference/include/visnav/keypoints.h:223-229). Output shapes are
fixed (num_features slots + validity mask) so downstream matching and
RANSAC stay fixed-shape.

Multi-scale: the reference's BoW path redetects on an 8-level OpenCV-ORB
pyramid (scaleFactor 1.2, /root/reference/include/visnav/keypoints.h:249)
while its matching path is single-scale. Here one frontend serves both, and
``num_octaves > 1`` turns on a power-of-two image pyramid (2x2 mean-pool
downsampling — static shapes per level, so the whole pyramid still jits
into one XLA program). Per-level feature budgets follow ORB's geometric
split (proportional to 1/scale), corners are reported in level-0 pixel
coordinates, and descriptors are computed at the detection scale so
approach/retreat revisits still match.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..ops import describe as describe_ops
from ..ops import detect as detect_ops


class Features(NamedTuple):
    corners: jnp.ndarray  # [N, 2] float32 (x, y); (-1,-1) where invalid
    angles: jnp.ndarray   # [N] float32
    bits: jnp.ndarray     # [N, 256] uint8 descriptor bits
    valid: jnp.ndarray    # [N] bool
    octave: Optional[jnp.ndarray] = None  # [N] int32 pyramid level (0 = full
    #                                        resolution); None on legacy paths


def _downsample2(img_f):
    """2x2 mean-pool halving (the pyramid step). img [H, W] f32.

    Rounded to integers so every pyramid level keeps the uint8 source's
    integer-pixel invariant — the TPU descriptor-sampling contraction
    (ops/describe.py) is bit-exact against the gather path only for
    integer intensities (<= 255 is exact in bf16's 8 significant bits).
    """
    h2, w2 = img_f.shape[0] // 2, img_f.shape[1] // 2
    return jnp.round(
        img_f[: h2 * 2, : w2 * 2].reshape(h2, 2, w2, 2).mean(axis=(1, 3)))


def _level_budgets(num_features: int, num_octaves: int):
    """Split the feature budget geometrically across levels (ORB semantics:
    n_l proportional to 1/scale, keypoints.h:249's scaleFactor pattern)."""
    raw = [2.0 ** (-o) for o in range(num_octaves)]
    total = sum(raw)
    n = [max(int(num_features * r / total), 8) for r in raw]
    n[0] += num_features - sum(n)  # exact total, remainder to level 0
    return n


def _extract_level(img_f, n_feats, rotate_features, quality_level,
                   min_distance):
    corners, resp, valid = detect_ops.detect_corners(
        img_f, num_features=n_feats, quality_level=quality_level,
        min_distance=min_distance)
    patches = describe_ops.gather_patches(img_f, corners)
    angles = describe_ops.compute_angles(patches, rotate_features)
    bits = describe_ops.compute_descriptors(patches, angles)
    bits = jnp.where(valid[:, None], bits, 0)
    return corners, angles, bits, valid


@functools.partial(
    jax.jit,
    static_argnames=("num_features", "rotate_features", "min_distance",
                     "num_octaves"),
)
def extract_features(
    img,
    num_features: int = 1500,
    rotate_features: bool = True,
    quality_level: float = 0.01,
    min_distance: int = 8,
    num_octaves: int = 1,
) -> Features:
    """img [H, W] uint8/float -> Features with N = num_features slots."""
    img_f = img.astype(jnp.float32)
    if num_octaves <= 1:
        corners, angles, bits, valid = _extract_level(
            img_f, num_features, rotate_features, quality_level, min_distance)
        return Features(corners=corners, angles=angles, bits=bits,
                        valid=valid,
                        octave=jnp.zeros(num_features, jnp.int32))

    budgets = _level_budgets(num_features, num_octaves)
    parts = []
    level_img = img_f
    for o in range(num_octaves):
        if o > 0:
            level_img = _downsample2(level_img)
        c, a, b, v = _extract_level(level_img, budgets[o], rotate_features,
                                    quality_level, min_distance)
        # map level-o pixel centers back to level-0 coordinates:
        # a level-o pixel covers a 2^o block, center (x + 0.5)*2^o - 0.5
        s = float(2 ** o)
        c0 = jnp.where(v[:, None], (c + 0.5) * s - 0.5, -1.0)
        parts.append((c0, a, b, v,
                      jnp.full(budgets[o], o, jnp.int32)))
    corners = jnp.concatenate([p[0] for p in parts])
    angles = jnp.concatenate([p[1] for p in parts])
    bits = jnp.concatenate([p[2] for p in parts])
    valid = jnp.concatenate([p[3] for p in parts])
    octave = jnp.concatenate([p[4] for p in parts])
    return Features(corners=corners, angles=angles, bits=bits, valid=valid,
                    octave=octave)


extract_features_batch = jax.vmap(
    extract_features, in_axes=(0,), out_axes=Features(0, 0, 0, 0, 0)
)
