"""Fixed-size compaction of valid entries (scatter-based, O(n)).

Selecting "up to K valid slots" out of a padded array is everywhere in the
pipeline (in-view landmarks, active window landmarks, observation tables).
lax.top_k over validity priorities costs O(n log n)-ish and dominated
device time at L=65536; a cumsum + scatter does it exactly in O(n).
"""

from __future__ import annotations

import jax.numpy as jnp


def compact_indices(valid, k: int, newest_first: bool = False):
    """Indices of the first (or last) K valid entries.

    valid [N] bool -> (idx [K] int32 in [0, N) for selected, N for empty
    slots; gather with jnp.clip + mask, or scatter with mode='drop'),
    plus the selection-validity mask [K].

    newest_first=True returns the LAST valid entries (highest indices
    first position-stable), used for the in-view landmark cap where newer
    landmarks win (tracking.py).
    """
    n = valid.shape[0]
    v = valid[::-1] if newest_first else valid
    pos = jnp.cumsum(v.astype(jnp.int32)) - 1        # rank among valid
    src = jnp.arange(n, dtype=jnp.int32)
    if newest_first:
        src = n - 1 - src
    tgt = jnp.where(v & (pos < k), pos, k)           # k -> dropped
    idx = jnp.full((k,), n, jnp.int32).at[tgt].set(src, mode="drop")
    return idx, idx < n
