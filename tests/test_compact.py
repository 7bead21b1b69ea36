import jax.numpy as jnp
import numpy as np

from vslam_tpu.ops.compact import compact_indices


def test_compact_oldest_first():
    valid = jnp.asarray([0, 1, 1, 0, 1, 0, 1, 1], bool)
    idx, ok = compact_indices(valid, 4)
    np.testing.assert_array_equal(np.asarray(idx), [1, 2, 4, 6])
    assert bool(ok.all())


def test_compact_newest_first():
    valid = jnp.asarray([0, 1, 1, 0, 1, 0, 1, 1], bool)
    idx, ok = compact_indices(valid, 3, newest_first=True)
    np.testing.assert_array_equal(np.asarray(idx), [7, 6, 4])


def test_compact_underfull_and_empty():
    valid = jnp.asarray([0, 0, 1, 0], bool)
    idx, ok = compact_indices(valid, 3)
    assert int(idx[0]) == 2 and bool(ok[0])
    assert not bool(ok[1]) and int(idx[1]) == 4  # sentinel N
    idx, ok = compact_indices(jnp.zeros(5, bool), 3)
    assert not bool(ok.any())


def test_compact_overflow_drops_tail():
    valid = jnp.ones(10, bool)
    idx, ok = compact_indices(valid, 4)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 3])
    idx, ok = compact_indices(valid, 4, newest_first=True)
    np.testing.assert_array_equal(np.asarray(idx), [9, 8, 7, 6])
