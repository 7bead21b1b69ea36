"""Learned feature frontend bridged into the Hamming matching pipeline.

BASELINE.json configs[4] stretch: "learned SuperPoint-style descriptors
swapped into the matcher". The SuperPointTPU detector head provides corner
locations (per-cell argmax over the 65-way softmax); the descriptor head's
D-dim unit vectors are sign-binarized into the same 256-bit format the
Hamming matcher (and its Pallas kernels) consume, so the learned frontend
is a drop-in replacement for the rBRIEF path — same Features contract.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..frontend.features import Features
from .superpoint import CELL, SuperPointTPU


@functools.partial(jax.jit, static_argnames=("model", "num_features"))
def extract_features_learned(
    model: SuperPointTPU,
    params,
    img,
    num_features: int = 512,
    score_threshold: float = 0.015,
) -> Features:
    """img [H, W] uint8 -> Features (corners, angles=0, 256-bit desc, valid).

    H and W must be multiples of 8 (the detector cell size).
    """
    h, w = img.shape
    x = img.astype(jnp.float32)[None, :, :, None] / 255.0
    logits, desc = model.apply(params, x)
    hc, wc = logits.shape[1:3]

    prob = jax.nn.softmax(logits[0], axis=-1)[:, :, : CELL * CELL]
    cell_score = jnp.max(prob, axis=-1)            # [Hc, Wc]
    cell_arg = jnp.argmax(prob, axis=-1)           # offset within cell

    flat_score = cell_score.reshape(-1)
    vals, idx = jax.lax.top_k(flat_score, num_features)
    cy, cx = idx // wc, idx % wc
    off = cell_arg.reshape(-1)[idx]
    ys = (cy * CELL + off // CELL).astype(jnp.float32)
    xs = (cx * CELL + off % CELL).astype(jnp.float32)
    valid = vals > score_threshold

    d = desc[0].reshape(hc * wc, -1)[idx]          # [K, D] unit vectors
    bits = (d > 0).astype(jnp.uint8)               # sign binarization
    dim = bits.shape[-1]
    if dim < 256:
        reps = -(-256 // dim)
        bits = jnp.tile(bits, (1, reps))[:, :256]
    else:
        bits = bits[:, :256]

    corners = jnp.stack([xs, ys], axis=-1)
    corners = jnp.where(valid[:, None], corners, -1.0)
    return Features(corners=corners,
                    angles=jnp.zeros(num_features, jnp.float32),
                    bits=jnp.where(valid[:, None], bits, 0),
                    valid=valid,
                    octave=jnp.zeros(num_features, jnp.int32))


def make_feature_fn(model: SuperPointTPU, params, num_features: int = 512,
                    score_threshold: float = 0.015):
    """A (img [H,W] uint8) -> Features callable for the drivers'
    ``feature_fn`` hook (pipeline/streaming.py, pipeline/slam.py): the
    learned frontend traced INTO the fused tracking step, params baked in
    as compile-time constants (weights are fixed at inference). This is
    the driver path that runs VO end-to-end on learned descriptors
    (BASELINE configs[4] "swapped into the matcher")."""

    def feature_fn(img):
        return extract_features_learned(
            model, params, img, num_features=num_features,
            score_threshold=score_threshold)

    return feature_fn
