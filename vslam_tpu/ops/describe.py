"""Orientation (intensity centroid) + rotated-BRIEF descriptors.

TPU-native equivalent of the reference's ``computeAngles`` /
``computeDescriptors`` (/root/reference/include/visnav/keypoints.h:152-221):

- angle = atan2(m01, m10) with moments over the radius-15 disc of a 31x31
  patch (keypoints.h:171-184);
- 256 binary tests; each test rotates its two pattern taps by the corner
  angle, rounds to integer offsets, and sets the bit when I(a') < I(b')
  (keypoints.h:205-217).

Instead of per-corner scalar loops we gather one (2*R+1)^2 patch per corner
(R=19 covers every rotated tap since max |pattern| = 13 and 13*sqrt(2) < 19,
and corners are guaranteed >= 19 px from the border), compute the moment
sums as masked reductions, and evaluate all 256 tests as one batched gather.
Everything vmaps over the corner axis and jits into a single XLA program.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .pattern import HALF_PATCH_SIZE, PATTERN_A, PATTERN_B

PATCH_RADIUS = 19
_PATCH_W = 2 * PATCH_RADIUS + 1  # 39

# disc mask and coordinate grids for the orientation moments ([-15, 15]^2)
_oy, _ox = np.mgrid[-HALF_PATCH_SIZE : HALF_PATCH_SIZE + 1,
                    -HALF_PATCH_SIZE : HALF_PATCH_SIZE + 1]
_DISC = (_ox * _ox + _oy * _oy) <= HALF_PATCH_SIZE * HALF_PATCH_SIZE
DISC_MASK = jnp.asarray(_DISC, dtype=jnp.float32)
DISC_X = jnp.asarray(_ox, dtype=jnp.float32)
DISC_Y = jnp.asarray(_oy, dtype=jnp.float32)

PAT_A = jnp.asarray(PATTERN_A, dtype=jnp.float32)  # [256, 2] (x, y)
PAT_B = jnp.asarray(PATTERN_B, dtype=jnp.float32)


def gather_patches(img, corners, radius: int = PATCH_RADIUS,
                   use_mxu: bool = None):
    """Gather square patches around integer corner locations.

    img [H, W] (any dtype), corners [K, 2] float (x, y) -> [K, 2r+1, 2r+1]
    float32. Out-of-range corners (e.g. the (-1,-1) invalid fill) are clamped;
    callers must rely on the validity mask.

    On TPU the vmapped dynamic_slice lowers to a row-by-row gather that
    dominates the whole frontend (~2.2 ms device for 1500x39x39 at 752x480);
    the same selection as two one-hot bf16 contractions rides the MXU
    (~0.3 ms) and is bit-exact for integer-valued images (products are
    0 or the pixel value — integers <= 255 are exact in bf16's 8
    significant bits; accumulation is f32 and each output sums exactly one
    nonzero product). Every image in the pipeline is integer-valued: uint8
    sources and the rounded pyramid levels (frontend/features._downsample2).
    """
    h, w = img.shape
    k = 2 * radius + 1
    cx = jnp.clip(corners[:, 0].astype(jnp.int32), radius, w - radius - 1)
    cy = jnp.clip(corners[:, 1].astype(jnp.int32), radius, h - radius - 1)
    if use_mxu is None:
        use_mxu = jax.default_backend() == "tpu"
    if use_mxu:
        n = corners.shape[0]
        off = jnp.arange(-radius, radius + 1, dtype=jnp.int32)
        # rows[n, k, w]: one [n*k, h] @ [h, w] matmul selects the k rows
        ih = jnp.arange(h, dtype=jnp.int32)
        oh_r = ((cy[:, None] + off[None, :])[:, :, None]
                == ih).astype(jnp.bfloat16)                 # [n, k, h]
        rows = jax.lax.dot_general(
            oh_r.reshape(n * k, h), img.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(n, k, w)
        # patches[n, k, k]: batched [k, w] @ [w, k] column select
        iw = jnp.arange(w, dtype=jnp.int32)
        oh_c = ((cx[:, None] + off[None, :])[:, :, None]
                == iw).astype(jnp.bfloat16)                 # [n, k, w]
        return jax.lax.dot_general(
            rows.astype(jnp.bfloat16), oh_c,
            (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # [n, k, k]

    def one(cx_i, cy_i):
        return lax.dynamic_slice(img, (cy_i - radius, cx_i - radius), (k, k))

    return jax.vmap(one)(cx, cy).astype(jnp.float32)


def compute_angles(patches, rotate_features: bool = True):
    """Intensity-centroid orientation per patch. patches [K, 39, 39] f32."""
    if not rotate_features:
        return jnp.zeros(patches.shape[0], dtype=jnp.float32)
    c = PATCH_RADIUS
    sub = patches[
        :, c - HALF_PATCH_SIZE : c + HALF_PATCH_SIZE + 1,
        c - HALF_PATCH_SIZE : c + HALF_PATCH_SIZE + 1
    ]
    m01 = jnp.sum(sub * (DISC_MASK * DISC_Y), axis=(1, 2))
    m10 = jnp.sum(sub * (DISC_MASK * DISC_X), axis=(1, 2))
    return jnp.arctan2(m01, m10)


def compute_descriptors(patches, angles, use_mxu: bool = None):
    """Rotated BRIEF bits. patches [K, 39, 39], angles [K] -> bits [K, 256] uint8."""
    ca = jnp.cos(angles)[:, None]  # [K, 1]
    sa = jnp.sin(angles)[:, None]

    def rotated_idx(pat):
        # pat [256, 2] -> flattened patch indices [K, 256]
        px, py = pat[:, 0][None, :], pat[:, 1][None, :]
        rx = jnp.round(ca * px - sa * py).astype(jnp.int32) + PATCH_RADIUS
        ry = jnp.round(sa * px + ca * py).astype(jnp.int32) + PATCH_RADIUS
        rx = jnp.clip(rx, 0, _PATCH_W - 1)
        ry = jnp.clip(ry, 0, _PATCH_W - 1)
        return ry * _PATCH_W + rx

    flat = patches.reshape(patches.shape[0], -1)  # [K, 39*39]
    ia = rotated_idx(PAT_A)
    ib = rotated_idx(PAT_B)
    if use_mxu is None:
        use_mxu = jax.default_backend() == "tpu"
    if use_mxu:
        # per-row gathers lower poorly on TPU (~10 ms for 1500x256), and a
        # one-hot over the flattened 39*39 axis materializes [K, 256, 1521]
        # (~1.3 ms elementwise-bound). Separable two-level sampling cuts the
        # one-hot axes to 39 each: a column one-hot contracts the patch to
        # the tap's row vector (a real batched MXU matmul, [39,39]@[39,256]
        # per corner) and a row one-hot picks the element. Bit-exact for
        # integer patches (products are 0 or the pixel value, <= 255 exact
        # in bf16; each sum has exactly one nonzero term; accumulation f32).
        def sample(idx):
            r, c = idx // _PATCH_W, idx % _PATCH_W   # [K, 256]
            steps = jnp.arange(_PATCH_W, dtype=jnp.int32)
            oh_c = (c[..., None] == steps).astype(jnp.bfloat16)  # [K,256,39]
            t = jax.lax.dot_general(                  # [K, 39(row), 256]
                patches.astype(jnp.bfloat16), oh_c,
                (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            oh_r = (r[..., None] == steps).astype(jnp.float32)
            return jnp.einsum("nrp,npr->np", t, oh_r)
        return (sample(ia) < sample(ib)).astype(jnp.uint8)
    va = jnp.take_along_axis(flat, ia, axis=1)
    vb = jnp.take_along_axis(flat, ib, axis=1)
    return (va < vb).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("rotate_features",))
def describe(img, corners, rotate_features: bool = True):
    """Full orientation+descriptor pass.

    img [H, W], corners [K, 2] -> (angles [K] f32, bits [K, 256] uint8).
    """
    patches = gather_patches(img, corners)
    angles = compute_angles(patches, rotate_features)
    bits = compute_descriptors(patches, angles)
    return angles, bits


def pack_bits(bits):
    """[..., 256] {0,1} -> [..., 32] uint8, LSB-first within each byte."""
    b = bits.reshape(bits.shape[:-1] + (32, 8)).astype(jnp.uint8)
    weights = jnp.asarray([1, 2, 4, 8, 16, 32, 64, 128], dtype=jnp.uint8)
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)


def unpack_bits(packed):
    """[..., 32] uint8 -> [..., 256] {0,1} uint8."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (packed[..., None] >> shifts) & 1
    return bits.reshape(packed.shape[:-1] + (256,)).astype(jnp.uint8)
