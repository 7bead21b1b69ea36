"""Device-side matching helpers for loop closure / relocalization.

Matches the current frame's descriptors against a stored keyframe's
(candidate keypoints first, mirroring the reference's argument order in
sim3.h:252-253 and tracking.h:283-285 so the (candidate_feat, current_feat)
pair direction is identical). The keyframe slot is a traced index, so one
compiled program serves every candidate.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.state import KeyframeState
from ..ops import describe as describe_ops
from ..ops import hamming


@functools.partial(jax.jit, static_argnames=("threshold",))
def match_vs_keyframe(cur_bits, cur_valid, kf: KeyframeState, slot, cam,
                      threshold: int = 70, ratio: float = 1.2):
    """Returns match_cur [N_kf] int32: current-feature index per candidate
    keyframe feature (-1 unmatched)."""
    kf_bits = describe_ops.unpack_bits(kf.desc[slot, cam])
    kf_valid = kf.kp_valid[slot, cam]
    mj, acc = hamming.match_descriptors(
        kf_bits, cur_bits, kf_valid, cur_valid,
        threshold=threshold, ratio=ratio)
    return jnp.where(acc, mj, -1)


@functools.partial(jax.jit, static_argnames=("threshold",))
def match_vs_keyframes(cur_bits, cur_valid, kf: KeyframeState, slots, cam,
                       threshold: int = 70, ratio: float = 1.2):
    """Batched ``match_vs_keyframe`` over a [S] vector of keyframe slots.

    Returns [S, N_kf] int32. One device program for the whole source set:
    the loop-closure/relocalization harvest matches the current frame
    against a candidate AND all its covisible neighbors, and through a
    tunneled device each separate dispatch+fetch costs a completion-polling
    quantum (~27.5 ms) — batching makes the harvest one dispatch + one
    fetch instead of S. ``lax.map`` (not vmap) so the fused Pallas matcher
    inside needs no batching rule.
    """

    def one(slot):
        kf_bits = describe_ops.unpack_bits(kf.desc[slot, cam])
        kf_valid = kf.kp_valid[slot, cam]
        mj, acc = hamming.match_descriptors(
            kf_bits, cur_bits, kf_valid, cur_valid,
            threshold=threshold, ratio=ratio)
        return jnp.where(acc, mj, -1)

    from jax import lax

    return lax.map(one, slots)
