"""Sharded global bundle adjustment over a device mesh.

For the 4K-keyframe stretch config (BASELINE.json configs[4]): the
matrix-free LM-CG solver (solvers/ba_cg.py) is pure map/reduce over the
observation axis, so sharding the observation arrays over the mesh's
'data' axis makes every J v / J^T u product data-parallel; XLA/GSPMD
inserts the psum for the CG dot products and the all-gathers for the
point/pose gathers automatically. Poses and points stay replicated (they
are tiny next to observations).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..solvers import ba_cg
from ..solvers.ba import BAProblem


def shard_problem(prob: BAProblem, mesh: Mesh) -> BAProblem:
    """Place observation arrays sharded over 'data', the rest replicated."""
    obs = NamedSharding(mesh, P("data"))
    rep = NamedSharding(mesh, P())

    def put(x, s):
        return jax.device_put(x, s)

    return BAProblem(
        poses=put(prob.poses, rep),
        pose_fixed=put(prob.pose_fixed, rep),
        intr=put(prob.intr, rep),
        points=put(prob.points, rep),
        point_valid=put(prob.point_valid, rep),
        obs_cam=put(prob.obs_cam, obs),
        obs_point=put(prob.obs_point, obs),
        obs_uv=put(prob.obs_uv, NamedSharding(mesh, P("data", None))),
        obs_valid=put(prob.obs_valid, obs),
    )


def solve_sharded(prob: BAProblem, mesh: Mesh, cam_name: str = "ds",
                  **kwargs):
    """Shard + solve. Observation count must divide the data axis size."""
    sharded = shard_problem(prob, mesh)
    return ba_cg.solve_ba_cg(sharded, cam_name=cam_name, **kwargs)
