"""Scale invariance via the image pyramid (config num_octaves > 1).

The reference gets scale robustness only on its BoW path, from an 8-level
OpenCV-ORB pyramid redetect (/root/reference/include/visnav/keypoints.h:249);
its matching frontend is single-scale. Our single frontend serves both, so
the pyramid must carry scale invariance for matching AND recognition.

The scenario: a camera views a textured plane from distance z and again
from 2z (one full octave of apparent scale change — an approach/retreat
revisit). Single-scale rBRIEF descriptors sample a fixed 31 px footprint,
so the revisit view's texture is half-size and matching collapses; with
the pyramid, the near view's level-1 descriptors see the same footprint as
the far view's level-0 ones.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu import synthetic
from vslam_tpu.frontend.features import extract_features
from vslam_tpu.ops import hamming

W, H = 640, 480
INTR = np.array([380.0, 380.0, W / 2, H / 2, 0, 0, 0, 0])


@pytest.fixture(scope="module")
def plane_views():
    tex = synthetic.multiscale_texture(2048, seed=3)
    near = synthetic.render_plane_view(tex, INTR, z=1.0, width=W, height=H,
                                       meters_per_texel=0.002)
    far = synthetic.render_plane_view(tex, INTR, z=2.0, width=W, height=H,
                                      meters_per_texel=0.002)
    return near, far


def _extract(img, octaves):
    return extract_features(jnp.asarray(img), num_features=1000,
                            num_octaves=octaves)


def _count_good_matches(fa, fb):
    """Mutual ratio-tested matches that are also geometrically consistent.

    For a fronto-parallel plane and pure z-translation from z to 2z the
    mapping is an exact similarity about the principal point:
    (u_far - cx) = 0.5 * (u_near - cx). Count matches within 3 px of it.
    """
    j, acc = hamming.match_descriptors(fa.bits, fb.bits, fa.valid, fb.valid)
    j = np.asarray(j)
    acc = np.asarray(acc)
    ca = np.asarray(fa.corners)
    cb = np.asarray(fb.corners)
    c = np.array([INTR[2], INTR[3]])
    idx = np.nonzero(acc)[0]
    if len(idx) == 0:
        return 0
    pred = 0.5 * (ca[idx] - c) + c
    err = np.linalg.norm(pred - cb[j[idx]], axis=-1)
    return int(np.sum(err < 3.0))


def test_single_scale_fails_one_octave_revisit(plane_views):
    near, far = plane_views
    n = _count_good_matches(_extract(near, 1), _extract(far, 1))
    # single-scale rBRIEF across a 2x scale change: matching collapses
    assert n < 30, f"expected single-scale matching to fail, got {n}"


def test_pyramid_recovers_one_octave_revisit(plane_views):
    near, far = plane_views
    n_ss = _count_good_matches(_extract(near, 1), _extract(far, 1))
    n_pyr = _count_good_matches(_extract(near, 3), _extract(far, 3))
    assert n_pyr >= 60, f"pyramid matching too weak: {n_pyr}"
    assert n_pyr > 3 * max(n_ss, 1), (n_pyr, n_ss)


def test_pyramid_bow_recall(plane_views):
    """BoW similarity across the octave revisit: pyramid descriptors make
    the revisit the database's best match; single-scale ones do not
    reliably (the recognition analogue of keypoints.h:249's ORB pyramid)."""
    from vslam_tpu.loop import vocabulary as vocab_mod

    near, far = plane_views
    rng = np.random.RandomState(0)
    # distractor views: same texture statistics, different content
    distractors = [
        synthetic.render_plane_view(
            synthetic.multiscale_texture(2048, seed=10 + i), INTR, z=1.0,
            width=W, height=H, meters_per_texel=0.002)
        for i in range(3)
    ]

    def recall_rank(octaves):
        feats = {}
        for name, img in [("near", near), ("far", far)] + [
                (f"d{i}", d) for i, d in enumerate(distractors)]:
            feats[name] = _extract(img, octaves)
        pool = np.concatenate([
            np.asarray(f.bits)[np.asarray(f.valid)] for f in feats.values()])
        sub = pool[rng.choice(len(pool), min(4000, len(pool)), replace=False)]
        voc = vocab_mod.train(sub, k=10, depth=3, seed=0)
        dv = vocab_mod.DeviceVocabulary(voc)

        def bow(f):
            words = np.asarray(dv.words(f.bits, f.valid))
            return vocab_mod.bow_from_words(voc, words)

        q = bow(feats["far"])
        scores = {n: vocab_mod.l1_score(q, bow(f))
                  for n, f in feats.items() if n != "far"}
        ranked = sorted(scores, key=scores.get, reverse=True)
        return ranked.index("near"), scores

    rank_pyr, scores_pyr = recall_rank(3)
    assert rank_pyr == 0, f"pyramid BoW failed to rank the revisit first: " \
                          f"{scores_pyr}"


def test_pyramid_shapes_and_octave_field():
    img = synthetic.multiscale_texture(256, seed=1)
    f = extract_features(jnp.asarray(img), num_features=300, num_octaves=3)
    assert f.corners.shape == (300, 2)
    assert f.bits.shape == (300, 256)
    oct_np = np.asarray(f.octave)
    valid = np.asarray(f.valid)
    assert set(np.unique(oct_np[valid])) <= {0, 1, 2}
    # at least two levels actually fire on a multi-scale texture
    assert len(set(np.unique(oct_np[valid]))) >= 2
    # level-0 corners stay inside the image; coarser-level corners map back
    c = np.asarray(f.corners)[valid]
    assert (c[:, 0] >= -0.5).all() and (c[:, 0] <= 255.5).all()
    assert (c[:, 1] >= -0.5).all() and (c[:, 1] <= 255.5).all()


def test_single_scale_path_unchanged():
    """num_octaves=1 must behave exactly like the pre-pyramid frontend."""
    img = synthetic.multiscale_texture(256, seed=2)
    f1 = extract_features(jnp.asarray(img), num_features=200)
    f2 = extract_features(jnp.asarray(img), num_features=200, num_octaves=1)
    assert np.array_equal(np.asarray(f1.corners), np.asarray(f2.corners))
    assert np.array_equal(np.asarray(f1.bits), np.asarray(f2.bits))
    assert np.asarray(f1.octave).sum() == 0
