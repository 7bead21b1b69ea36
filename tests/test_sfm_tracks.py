import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.geometry import cameras, lie
from vslam_tpu.pipeline import sfm
from vslam_tpu.solvers import relative_pose as rp
from vslam_tpu.utils.tracks import UnionFind, build_tracks, tracks_in_images

INTR = jnp.asarray([300.0, 300.0, 320.0, 240.0, 0, 0, 0, 0])


def test_union_find():
    uf = UnionFind(6)
    uf.union(0, 1)
    uf.union(1, 2)
    uf.union(4, 5)
    assert uf.find(0) == uf.find(2)
    assert uf.find(3) == 3
    assert uf.find(4) == uf.find(5) != uf.find(0)


def test_build_tracks_and_consistency():
    matches = {
        (0, 1): [(0, 10), (1, 11)],
        (1, 2): [(10, 20), (11, 21)],
        # inconsistent: feature 5 of image 0 matches two features of image 1
        (0, 2): [(0, 20)],  # consistent closure of track A
    }
    tracks = build_tracks(matches)
    assert len(tracks) == 2
    lengths = sorted(len(t) for t in tracks.values())
    assert lengths == [3, 3]
    in_all = tracks_in_images(tracks, [0, 1, 2])
    assert len(in_all) == 2


def test_build_tracks_drops_inconsistent():
    matches = {
        (0, 1): [(0, 10)],
        (0, 2): [(1, 20)],
        (1, 2): [(10, 20)],  # merges tracks -> image 0 has features 0 AND 1
    }
    tracks = build_tracks(matches)
    assert len(tracks) == 0


def make_two_view(key, n=120, outliers=20):
    k1, k2 = jax.random.split(key)
    pts = jax.random.uniform(k1, (n, 3), minval=-3, maxval=3) + jnp.array(
        [0.0, 0.0, 7.0])
    T_1_2 = lie.se3_exp(jnp.asarray([0.4, 0.05, 0.1, 0.02, 0.12, 0.01]))
    p1 = pts
    p2 = lie.se3_apply(lie.se3_inv(T_1_2), pts)
    f1 = p1 / jnp.linalg.norm(p1, axis=-1, keepdims=True)
    f2 = p2 / jnp.linalg.norm(p2, axis=-1, keepdims=True)
    if outliers:
        bad = jax.random.normal(k2, (outliers, 3))
        bad = bad / jnp.linalg.norm(bad, axis=-1, keepdims=True)
        f2 = f2.at[:outliers].set(bad)
    return f1, f2, T_1_2, outliers


def test_ransac_relative_pose():
    f1, f2, T_gt, n_out = make_two_view(jax.random.PRNGKey(0))
    T, inl, num, ok = rp.ransac_relative_pose(
        jax.random.PRNGKey(1), f1, f2, jnp.ones(f1.shape[0], bool),
        threshold=1e-4)
    assert bool(ok)
    # rotation error
    dq = lie.se3_log(lie.se3_mul(lie.se3_inv(T), T_gt))[3:]
    assert float(jnp.linalg.norm(dq)) < 0.02
    # translation direction error (scale-free)
    t_est = lie.se3_t(T)
    t_gt = lie.se3_t(T_gt)
    t_gt = t_gt / jnp.linalg.norm(t_gt)
    cos = jnp.abs(jnp.dot(t_est, t_gt))
    assert float(cos) > 0.99
    assert int(jnp.sum(inl[:n_out])) <= 2


def test_sfm_init_and_localize():
    rng = np.random.RandomState(0)
    n = 80
    pts_w = rng.uniform(-2, 2, (n, 3)) + np.array([0, 0, 6.0])
    T_0_1 = lie.se3_exp(jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.05, 0.0]))
    T_w_2 = lie.se3_exp(jnp.asarray([0.5, 0.1, 0.4, 0.02, 0.08, 0.01]))

    def project_into(T_w_c):
        pc = lie.se3_apply(lie.se3_inv(T_w_c), jnp.asarray(pts_w, jnp.float32))
        return np.asarray(cameras.project("pinhole", INTR, pc))

    corners = {0: project_into(lie.identity_pose()),
               1: project_into(T_0_1),
               2: project_into(T_w_2)}
    # tracks: identity correspondence
    matches = {(0, 1): [(i, i) for i in range(n)],
               (1, 2): [(i, i) for i in range(n)]}
    tracks = build_tracks(matches)
    assert len(tracks) == n

    lms, T_w_0, T_w_1 = sfm.initialize_scene_from_stereo_pair(
        tracks, 0, 1, corners[0], corners[1], T_0_1, INTR, "pinhole")
    assert len(lms) > n * 0.9
    errs = [np.linalg.norm(lms[t] - pts_w[tracks[t][0]]) for t in lms]
    assert np.median(errs) < 0.05

    T_est, inl_tids = sfm.localize_camera_tracks(
        jax.random.PRNGKey(3), 2, tracks, corners[2], lms, INTR, "pinhole",
        threshold=1.8e-5)
    assert T_est is not None and len(inl_tids) > n * 0.8
    err = lie.se3_log(lie.se3_mul(lie.se3_inv(T_w_2), T_est))
    assert float(jnp.abs(err).max()) < 0.02
