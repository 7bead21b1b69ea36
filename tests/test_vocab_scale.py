"""ORBvoc-scale vocabulary validation (structure, I/O, descent, recall).

The reference loads a k=10, L=6 (~1M leaf) DBoW2 vocabulary
(/root/reference/src/slam.cpp:370-380; text parser
thirdparty/DBoW2_ORBSLAM/DBoW2/TemplatedVocabulary.h:1338-1419). CI
validates the same machinery at 1e5 words (k=10, L=5 — one level short of
ORBvoc, same structure); tools/bench_vocab.py measures the full 1e6 scale.
"""

import os

import numpy as np
import pytest

from vslam_tpu.loop import vocabulary as vocab_mod

K, DEPTH = 10, 5  # 100,000 words


@pytest.fixture(scope="module")
def big_voc():
    return vocab_mod.synthetic_vocab(k=K, depth=DEPTH, seed=7)


def test_synthetic_vocab_structure(big_voc):
    v = big_voc
    assert v.num_words == K ** DEPTH
    n_nodes = (K ** (DEPTH + 1) - 1) // (K - 1)
    assert len(v.parent) == n_nodes
    # every leaf's ancestor chain reaches the root in exactly DEPTH hops
    leaf = v.node_of_word[[0, 12345, v.num_words - 1]]
    for nid in leaf:
        hops = 0
        while v.parent[nid] >= 0:
            nid = v.parent[nid]
            hops += 1
        assert hops == DEPTH


def test_descent_recall_under_noise(big_voc):
    """Descriptors near a leaf must descend back to that leaf.

    synthetic_vocab flips ~12 bits per level; query noise well below the
    sibling separation must keep recall high (the greedy per-level argmin
    is DBoW2's own descent rule)."""
    v = big_voc
    rng = np.random.RandomState(1)
    n = 1500
    word_gt = rng.randint(0, v.num_words, n)
    descs = v.node_desc[v.node_of_word[word_gt]].copy()
    flip = rng.rand(n, 256) < (3 / 256.0)  # ~3 noisy bits
    descs ^= flip.astype(np.uint8)
    words, _ = vocab_mod.transform_np(v, descs)
    recall = float(np.mean(words == word_gt))
    assert recall > 0.9, f"descent recall {recall:.3f} at {v.num_words} words"


def test_device_descent_matches_numpy(big_voc):
    import jax.numpy as jnp

    v = big_voc
    rng = np.random.RandomState(2)
    descs = v.node_desc[v.node_of_word[
        rng.randint(0, v.num_words, 512)]].copy()
    descs ^= (rng.rand(512, 256) < 0.01).astype(np.uint8)
    ref, _ = vocab_mod.transform_np(v, descs)
    dv = vocab_mod.DeviceVocabulary(v)
    dev = np.asarray(dv.words(jnp.asarray(descs),
                              jnp.ones(512, bool)))
    assert np.array_equal(ref, dev)


def test_text_roundtrip_at_scale(tmp_path, big_voc):
    """save -> numpy parse -> identical tree + identical descents."""
    v = big_voc
    path = str(tmp_path / "voc.txt")
    # give it nonuniform weights to exercise the weight column
    rng = np.random.RandomState(3)
    v.weights = rng.uniform(0.1, 2.0, v.num_words).astype(np.float32)
    vocab_mod.save_dbow2_text(v, path)

    v2 = vocab_mod.load_dbow2_text(path)
    assert v2.k == v.k and v2.depth == v.depth
    assert v2.num_words == v.num_words
    assert np.array_equal(v2.parent, v.parent)
    assert np.array_equal(v2.is_leaf, v.is_leaf)
    assert np.array_equal(v2.node_desc, v.node_desc)
    assert np.allclose(v2.weights, v.weights, atol=1e-5)

    descs = v.node_desc[v.node_of_word[
        np.random.RandomState(4).randint(0, v.num_words, 256)]]
    w1, _ = vocab_mod.transform_np(v, descs)
    w2, _ = vocab_mod.transform_np(v2, descs)
    assert np.array_equal(w1, w2)


def test_native_parser_matches_numpy(tmp_path, big_voc):
    from vslam_tpu.io import native

    if not native.available():
        pytest.skip("native library not built")
    v = big_voc
    path = str(tmp_path / "voc_native.txt")
    vocab_mod.save_dbow2_text(v, path)
    out = native.parse_vocab_text(path)
    assert out is not None
    k, depth, parents, is_leaf, descs, weights = out
    assert (k, depth) == (v.k, v.depth)
    assert np.array_equal(parents, v.parent[1:])
    assert np.array_equal(is_leaf, v.is_leaf[1:])
    shifts = np.arange(8, dtype=np.uint8)
    bits = ((descs[:, :, None] >> shifts) & 1).reshape(len(parents), 256)
    assert np.array_equal(bits, v.node_desc[1:])


def test_levelsup_ancestors(big_voc):
    """node_at_level_up(4) — the transform(levelsup=4) grouping the loop
    detector keys its direct index on (keypoints.h:253)."""
    v = big_voc
    anc = v.node_at_level_up(4)
    assert anc.shape == (v.num_words,)
    # all ancestors live exactly at level DEPTH-4
    assert np.all(v.level[anc] == DEPTH - 4)
    # words under the same level-(DEPTH-4) subtree share the ancestor
    w0 = 0
    nid = v.node_of_word[w0]
    for _ in range(4):
        nid = v.parent[nid]
    assert anc[w0] == nid
