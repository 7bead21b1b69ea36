"""Device mesh helpers for multi-chip scaling.

The reference is a single-process C++ program with two background threads
(SURVEY.md section 2 "parallelism"); the TPU-native scaling axes are
(a) data parallelism over sequences (one SLAM instance per device,
BASELINE.json configs[3]) and (b) sharding large global-BA problems over
the observation/landmark axes. Both ride jax.sharding Meshes with XLA
collectives — no hand-written communication.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axes=("data",)) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if len(axes) == 1:
        shape = (n,)
    elif len(axes) == 2:
        # favor a wide data axis; model axis gets the largest divisor <= 2
        model = 2 if n % 2 == 0 and n >= 4 else 1
        shape = (n // model, model)
    else:
        raise ValueError(f"unsupported axes {axes}")
    arr = np.asarray(devs).reshape(shape)
    return Mesh(arr, axes)


def data_sharding(mesh: Mesh, ndim: int, axis: str = "data"):
    """Shard leading dim over ``axis``, replicate the rest."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated(mesh: Mesh):
    return NamedSharding(mesh, P())
