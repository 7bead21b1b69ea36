import jax
import jax.numpy as jnp
import numpy as np
import optax

from vslam_tpu.models import superpoint as sp


def test_superpoint_forward_shapes():
    model = sp.SuperPointTPU(dim=64, width=16)
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 64, 64, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    logits, desc = model.apply(params, x)
    assert logits.shape == (2, 8, 8, 65)
    assert desc.shape == (2, 8, 8, 64)
    norms = jnp.linalg.norm(desc, axis=-1)
    np.testing.assert_allclose(np.asarray(norms), 1.0, atol=1e-3)


def test_superpoint_training_reduces_loss():
    model = sp.SuperPointTPU(dim=32, width=8)
    batch = sp.synthetic_batch(jax.random.PRNGKey(1), batch=2, h=32, w=32,
                               m=8)
    params = model.init(jax.random.PRNGKey(2), batch["img_a"])
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)
    step = jax.jit(sp.make_train_step(model, tx))

    losses = []
    for _ in range(25):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]


def test_heatmap_to_cells():
    heat = jnp.zeros((1, 16, 16))
    heat = heat.at[0, 3, 5].set(1.0)   # cell (0, 0), offset 3*8+5=29
    heat = heat.at[0, 9, 12].set(1.0)  # cell (1, 1), offset 1*8+4=12
    labels = sp.heatmap_to_cells(heat)
    assert labels.shape == (1, 2, 2)
    assert int(labels[0, 0, 0]) == 29
    assert int(labels[0, 1, 1]) == 12
    assert int(labels[0, 0, 1]) == 64  # dustbin
