import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.ops import hamming
from vslam_tpu.ops.pallas_hamming import hamming_top2


@pytest.mark.parametrize("n,m", [(100, 300), (128, 512), (130, 600)])
def test_hamming_top2_matches_reference(n, m):
    rng = np.random.RandomState(n + m)
    a = jnp.asarray(rng.randint(0, 2, (n, 256)), jnp.uint8)
    b = jnp.asarray(rng.randint(0, 2, (m, 256)), jnp.uint8)
    va = jnp.asarray(rng.rand(n) > 0.1)
    vb = jnp.asarray(rng.rand(m) > 0.1)

    best, second, arg = hamming_top2(a, b, va, vb, interpret=True)

    d = np.asarray(hamming.distance_matrix(a, b, va, vb))
    # reference semantics: invalid entries = 256
    ref_sorted = np.sort(d, axis=1)
    ref_best = np.minimum(ref_sorted[:, 0], 256)
    ref_second = np.minimum(ref_sorted[:, 1], 256)
    ref_arg = np.argmin(d, axis=1)

    np.testing.assert_array_equal(np.asarray(best), ref_best)
    np.testing.assert_array_equal(np.asarray(second), ref_second)
    # argmin must agree wherever a strict best exists and the row is valid
    strict = (ref_best < ref_second) & np.asarray(va) & (ref_best < 256)
    np.testing.assert_array_equal(np.asarray(arg)[strict], ref_arg[strict])


def test_landmark_top2_matches_reference():
    from vslam_tpu.ops.pallas_hamming import landmark_top2

    rng = np.random.RandomState(7)
    n, p, bank = 100, 300, 4
    a = jnp.asarray(rng.randint(0, 2, (n, 256)), jnp.uint8)
    bank_bits = jnp.asarray(rng.randint(0, 2, (p, bank, 256)), jnp.uint8)
    bv = jnp.asarray(rng.rand(p, bank) > 0.2)
    lv = jnp.asarray(rng.rand(p) > 0.1)
    va = jnp.asarray(rng.rand(n) > 0.1)
    kxy = jnp.asarray(rng.rand(n, 2) * 300, jnp.float32)
    lxy = jnp.asarray(rng.rand(p, 2) * 300, jnp.float32)
    r = 40.0

    b1, b2, arg, any_c = landmark_top2(a, va, kxy, bank_bits, bv, lxy, lv, r,
                                       interpret=True)

    flat = bank_bits.reshape(-1, 256)
    fv = (bv & lv[:, None]).reshape(-1)
    d = np.asarray(hamming.distance_matrix(a, flat, va, fv)).astype(np.int64)
    d[d == hamming.PAD_DIST] = 1 << 20
    d = d.reshape(n, p, bank).min(-1)
    diff = np.asarray(kxy)[:, None, :] - np.asarray(lxy)[None, :, :]
    gate = (diff ** 2).sum(-1) < r * r
    d = np.where(gate, d, 1 << 20)
    srt = np.sort(d, axis=1)
    ref_b1 = np.minimum(srt[:, 0], 256)
    ref_b2 = np.minimum(srt[:, 1], 256)
    ref_b1 = np.where(np.asarray(va), ref_b1, 256)
    ref_b2 = np.where(np.asarray(va), ref_b2, 256)

    np.testing.assert_array_equal(np.asarray(b1), ref_b1)
    np.testing.assert_array_equal(np.asarray(b2), ref_b2)
    ref_any = (d.min(1) < (1 << 20)) & np.asarray(va)
    np.testing.assert_array_equal(np.asarray(any_c), ref_any)


def test_hamming_top2_all_invalid_columns():
    a = jnp.asarray(np.random.RandomState(0).randint(0, 2, (32, 256)),
                    jnp.uint8)
    b = jnp.asarray(np.random.RandomState(1).randint(0, 2, (64, 256)),
                    jnp.uint8)
    best, second, arg = hamming_top2(
        a, b, jnp.ones(32, bool), jnp.zeros(64, bool), interpret=True)
    assert int(jnp.min(best)) == 256  # nothing valid -> reference init value
