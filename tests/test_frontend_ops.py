import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.ops import describe, detect, hamming
from vslam_tpu.ops.pattern import PATTERN_A, PATTERN_B


def synthetic_corner_image(h=120, w=160, seed=0):
    """Checkerboard-ish image with strong corners at known locations."""
    rng = np.random.RandomState(seed)
    img = rng.uniform(90, 110, (h, w)).astype(np.float32)
    pts = [(40, 50), (80, 100), (60, 30), (30, 120), (90, 60)]
    for (y, x) in pts:
        img[y:y + 12, x:x + 12] += 120.0  # bright square -> 4 corners each
    return jnp.asarray(np.clip(img, 0, 255)), pts


def test_detect_finds_square_corners():
    img, pts = synthetic_corner_image()
    corners, resp, valid = detect.detect_corners(img, num_features=100,
                                                 min_distance=4, edge=10)
    got = np.asarray(corners[valid])
    # every square has corners; check at least one detection within 3 px of
    # each square's top-left region
    for (y, x) in pts:
        d = np.min(np.abs(got[:, 0] - x) + np.abs(got[:, 1] - y))
        assert d <= 4.0, f"square at {(x, y)} missed (nearest {d})"


def test_detect_edge_threshold():
    img, _ = synthetic_corner_image()
    corners, _, valid = detect.detect_corners(img, num_features=100, edge=19)
    got = np.asarray(corners[valid])
    assert np.all(got[:, 0] >= 19) and np.all(got[:, 0] < 160 - 19)
    assert np.all(got[:, 1] >= 19) and np.all(got[:, 1] < 120 - 19)


def test_detect_min_distance():
    # NMS suppresses at half the requested radius (OpenCV's greedy
    # suppression keeps ~3-4x more corners than strict local maxima; see
    # detect.detect_corners)
    img, _ = synthetic_corner_image()
    corners, _, valid = detect.detect_corners(img, num_features=200,
                                              min_distance=8, edge=10)
    got = np.asarray(corners[valid])
    d = np.linalg.norm(got[:, None] - got[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() > 4.0


def _ref_angle(img, cx, cy):
    """Reference semantics of computeAngles (keypoints.h:164-184)."""
    m01 = m10 = 0.0
    for x in range(-15, 16):
        for y in range(-15, 16):
            if x * x + y * y <= 225:
                v = float(img[cy + y, cx + x])
                m01 += y * v
                m10 += x * v
    return np.arctan2(m01, m10)


def _ref_descriptor(img, cx, cy, angle):
    """Reference semantics of computeDescriptors (keypoints.h:205-217)."""
    ca, sa = np.cos(angle), np.sin(angle)
    bits = np.zeros(256, dtype=np.uint8)
    for i in range(256):
        xa, ya = PATTERN_A[i]
        xb, yb = PATTERN_B[i]
        xap = int(np.round(ca * xa - sa * ya))
        yap = int(np.round(sa * xa + ca * ya))
        xbp = int(np.round(ca * xb - sa * yb))
        ybp = int(np.round(sa * xb + ca * yb))
        bits[i] = int(img[cy + yap, cx + xap] < img[cy + ybp, cx + xbp])
    return bits


def test_describe_matches_reference_semantics():
    rng = np.random.RandomState(3)
    img = rng.uniform(0, 255, (96, 128)).astype(np.float32)
    corners = jnp.asarray([[40.0, 50.0], [64.0, 30.0], [100.0, 70.0]])
    angles, bits = describe.describe(jnp.asarray(img), corners)
    for k, (cx, cy) in enumerate([(40, 50), (64, 30), (100, 70)]):
        a_ref = _ref_angle(img, cx, cy)
        np.testing.assert_allclose(float(angles[k]), a_ref, atol=1e-3)
        b_ref = _ref_descriptor(img, cx, cy, float(angles[k]))
        mismatch = int(np.sum(np.asarray(bits[k]) != b_ref))
        # np.round half-even vs C round half-away can flip taps that land
        # exactly on .5 — allow a couple of bits of slack
        assert mismatch <= 3, f"corner {k}: {mismatch} bits differ"


def test_pack_unpack_roundtrip():
    rng = np.random.RandomState(0)
    bits = jnp.asarray(rng.randint(0, 2, (7, 256)), dtype=jnp.uint8)
    packed = describe.pack_bits(bits)
    assert packed.shape == (7, 32)
    np.testing.assert_array_equal(describe.unpack_bits(packed), bits)


def test_distance_matrix_vs_numpy():
    rng = np.random.RandomState(1)
    a = rng.randint(0, 2, (33, 256)).astype(np.uint8)
    b = rng.randint(0, 2, (47, 256)).astype(np.uint8)
    d = hamming.distance_matrix(jnp.asarray(a), jnp.asarray(b))
    ref = (a[:, None, :] != b[None, :, :]).sum(-1)
    np.testing.assert_array_equal(np.asarray(d), ref)


def _ref_match(da, db, threshold=70, ratio=1.2):
    """Direct port of the reference matchDescriptors semantics for testing."""
    def best2(dist_row):
        order = np.argsort(dist_row, kind="stable")
        return dist_row[order[0]], order[0], (
            dist_row[order[1]] if len(order) > 1 else 256
        )

    dist = (da[:, None, :] != db[None, :, :]).sum(-1)
    matches = []
    for i in range(da.shape[0]):
        d1, j, d2 = best2(dist[i])
        if d1 >= threshold or d2 < d1 * ratio:
            continue
        # cross check on column j
        c1, i2, c2 = best2(dist[:, j])
        if c1 >= threshold or c2 < c1 * ratio:
            continue
        if i2 == i:
            matches.append((i, j))
    return matches


def test_match_descriptors_vs_reference():
    rng = np.random.RandomState(2)
    # construct descriptors with planted matches + noise
    base = rng.randint(0, 2, (40, 256)).astype(np.uint8)
    a = base.copy()
    b = base.copy()
    flips = rng.rand(40, 256) < 0.05  # ~13 bit noise -> good matches
    b = np.where(flips, 1 - b, b)
    # add distractors
    a = np.vstack([a, rng.randint(0, 2, (20, 256)).astype(np.uint8)])
    b = np.vstack([b, rng.randint(0, 2, (25, 256)).astype(np.uint8)])

    ref = set(_ref_match(a, b))
    mj, acc = hamming.match_descriptors(
        jnp.asarray(a), jnp.asarray(b),
        jnp.ones(a.shape[0], bool), jnp.ones(b.shape[0], bool))
    got = {(i, int(mj[i])) for i in range(a.shape[0]) if bool(acc[i])}
    assert got == ref
    # sanity: most planted matches found
    assert len(got & {(i, i) for i in range(40)}) >= 35


def test_match_landmarks_gate_and_ratio():
    rng = np.random.RandomState(4)
    kp_bits = jnp.asarray(rng.randint(0, 2, (6, 256)), dtype=jnp.uint8)
    # landmark 0 bank contains kp 0's descriptor; landmark 1 contains kp 1's
    bank = rng.randint(0, 2, (3, 2, 256)).astype(np.uint8)
    bank[0, 0] = np.asarray(kp_bits[0])
    bank[1, 1] = np.asarray(kp_bits[1])
    bank_valid = np.ones((3, 2), bool)
    kp_xy = jnp.asarray([[10.0, 10], [50, 50], [90, 90], [10, 50], [50, 10], [70, 70]])
    proj = jnp.asarray([[12.0, 11], [52, 49], [200, 200]])  # lm2 out of gate reach
    mj, acc, had = hamming.match_landmarks(
        kp_bits, jnp.ones(6, bool), jnp.asarray(bank), jnp.asarray(bank_valid),
        kp_xy, proj, jnp.ones(3, bool), max_dist_2d=20.0)
    assert int(mj[0]) == 0 and bool(acc[0])
    assert int(mj[1]) == 1 and bool(acc[1])
    # kp2 has no landmark within 20 px
    assert not bool(acc[2]) and not bool(had[2])
    assert bool(had[0]) and bool(had[1])


def test_mxu_paths_match_gather_paths():
    """The TPU contraction paths (one-hot patch gather, separable
    descriptor sampling, moment matmul) are bit-identical to the plain
    gather/take paths for integer-valued images — the suite runs on CPU,
    so the MXU code is exercised here explicitly via use_mxu=True."""
    rng = np.random.RandomState(7)
    img = jnp.asarray(rng.randint(0, 256, (120, 160)).astype(np.float32))
    corners = jnp.stack(
        [jnp.asarray(rng.uniform(0, 160, 64).astype(np.float32)),
         jnp.asarray(rng.uniform(0, 120, 64).astype(np.float32))], axis=-1)
    p_mxu = describe.gather_patches(img, corners, use_mxu=True)
    p_ref = describe.gather_patches(img, corners, use_mxu=False)
    np.testing.assert_array_equal(np.asarray(p_mxu), np.asarray(p_ref))

    angles = describe.compute_angles(p_ref)
    b_mxu = describe.compute_descriptors(p_ref, angles, use_mxu=True)
    b_ref = describe.compute_descriptors(p_ref, angles, use_mxu=False)
    np.testing.assert_array_equal(np.asarray(b_mxu), np.asarray(b_ref))
