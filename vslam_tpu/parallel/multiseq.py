"""Batched multi-sequence SLAM: data parallelism over sequences.

BASELINE.json configs[3]: "all 8 EuRoC sequences mapped in parallel on one
chip" (and across a mesh). The per-frame tracking step is already one
fixed-shape jitted program; here it is vmapped over a sequence axis and
jitted with the sequence axis sharded over the mesh's 'data' axis, so each
device tracks its own sequences and XLA keeps everything local (no
cross-device traffic in the steady state).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core.state import LandmarkState
from ..pipeline import tracking


def batched_track_frame(mesh: Mesh, cam_name: str, **static_kwargs):
    """Build a pjit-ed multi-sequence tracking step.

    Returns fn(keys [S,2], imgs [S,H,W], lm (batched LandmarkState),
    predicted [S,7], gate [S,7], vel [S,7], intr0 [S,8]) -> TrackResult
    batched over S, with S sharded over the 'data' mesh axis.
    """
    step = functools.partial(tracking.track_frame, cam_name=cam_name,
                             **static_kwargs)
    vstep = jax.vmap(step)

    shard = NamedSharding(mesh, P("data"))

    @functools.partial(jax.jit, out_shardings=None)
    def run(keys, imgs, lm: LandmarkState, predicted, gate, vel, intr0):
        imgs = jax.lax.with_sharding_constraint(imgs, shard)
        lm = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, shard), lm)
        return vstep(keys, imgs, lm, predicted, gate, vel, intr0)

    return run
