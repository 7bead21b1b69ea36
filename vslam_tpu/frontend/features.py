"""Fused feature extraction: detection + orientation + description.

One jitted program per image size replaces the reference's
``detectKeypointsAndDescriptors``
(/root/reference/include/visnav/keypoints.h:223-229). Output shapes are
fixed (num_features slots + validity mask) so downstream matching and
RANSAC stay fixed-shape.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import describe as describe_ops
from ..ops import detect as detect_ops


class Features(NamedTuple):
    corners: jnp.ndarray  # [N, 2] float32 (x, y); (-1,-1) where invalid
    angles: jnp.ndarray   # [N] float32
    bits: jnp.ndarray     # [N, 256] uint8 descriptor bits
    valid: jnp.ndarray    # [N] bool


@functools.partial(
    jax.jit,
    static_argnames=("num_features", "rotate_features", "min_distance"),
)
def extract_features(
    img,
    num_features: int = 1500,
    rotate_features: bool = True,
    quality_level: float = 0.01,
    min_distance: int = 8,
) -> Features:
    """img [H, W] uint8/float -> Features with N = num_features slots."""
    corners, _resp, valid = detect_ops.detect_corners(
        img,
        num_features=num_features,
        quality_level=quality_level,
        min_distance=min_distance,
    )
    img_f = img.astype(jnp.float32)
    patches = describe_ops.gather_patches(img_f, corners)
    angles = describe_ops.compute_angles(patches, rotate_features)
    bits = describe_ops.compute_descriptors(patches, angles)
    bits = jnp.where(valid[:, None], bits, 0)
    return Features(corners=corners, angles=angles, bits=bits, valid=valid)


extract_features_batch = jax.vmap(
    extract_features, in_axes=(0,), out_axes=Features(0, 0, 0, 0)
)
