"""SuperPoint-style learned feature frontend (flax).

The stretch configuration from BASELINE.json configs[4]: "learned
SuperPoint-style descriptors swapped into the matcher". A compact
VGG-style encoder with a detector head (65-way cell softmax over 8x8
pixel cells, incl. dustbin) and a descriptor head (D-dim, L2-normalized),
trained on the synthetic generator's exact corner/correspondence ground
truth. Descriptors can be binarized (sign -> bits) to drop into the
Hamming matching path, or matched densely with cosine similarity.

The training step is written to shard: batch over the 'data' mesh axis,
wide conv channels over 'model' (annotated via NamedSharding on params),
so dryrun_multichip can jit it over an N-device mesh with XLA inserting
the collectives.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import optax

CELL = 8


class ConvBlock(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), padding="SAME")(x)
        return nn.relu(x)


class SuperPointTPU(nn.Module):
    """Encoder + detector/descriptor heads. Input [B, H, W, 1] in [0, 1]."""

    dim: int = 256
    width: int = 64

    @nn.compact
    def __call__(self, x):
        w = self.width
        x = ConvBlock(w)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(w)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(2 * w)(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        feat = ConvBlock(2 * w)(x)       # [B, H/8, W/8, 2w]

        det = nn.Conv(4 * w, (3, 3), padding="SAME")(feat)
        det = nn.relu(det)
        logits = nn.Conv(CELL * CELL + 1, (1, 1))(det)  # 65-way per cell

        desc = nn.Conv(4 * w, (3, 3), padding="SAME")(feat)
        desc = nn.relu(desc)
        desc = nn.Conv(self.dim, (1, 1))(desc)          # [B, H/8, W/8, D]
        desc = desc / (jnp.linalg.norm(desc, axis=-1, keepdims=True) + 1e-8)
        return logits, desc


def heatmap_to_cells(heat):
    """[B, H, W] {0,1} corner map -> 65-way cell labels [B, H/8, W/8]."""
    b, h, w = heat.shape
    cells = heat.reshape(b, h // CELL, CELL, w // CELL, CELL)
    cells = cells.transpose(0, 1, 3, 2, 4).reshape(
        b, h // CELL, w // CELL, CELL * CELL)
    has_pt = cells.max(-1) > 0
    label = jnp.where(has_pt, cells.argmax(-1), CELL * CELL)  # dustbin=64
    return label


def detector_loss(logits, heat):
    label = heatmap_to_cells(heat)
    return optax.softmax_cross_entropy_with_integer_labels(
        logits, label).mean()


def descriptor_loss(desc_a, desc_b, uv_a, uv_b, valid, margin_pos=1.0,
                    margin_neg=0.2, lam=1.0):
    """Hinge contrastive loss on cell descriptors at known correspondences.

    desc_* [B, Hc, Wc, D]; uv_* [B, M, 2] pixel coords of the same 3D points
    in both views; valid [B, M].

    The negative term is normalized over the VALID pair count and weighted
    at parity with the positive term: the r5 learned-VO drive exposed that
    the old 0.05-weight full-matrix mean diluted the repulsion to nothing
    — descriptors collapsed to one dominant direction and their sign
    binarization produced near-identical 256-bit strings (Hamming min
    distance 0 across unrelated points, no ratio-test discrimination).
    """
    def gather(desc, uv):
        cx = (uv[..., 0] // CELL).astype(jnp.int32)
        cy = (uv[..., 1] // CELL).astype(jnp.int32)
        cx = jnp.clip(cx, 0, desc.shape[2] - 1)
        cy = jnp.clip(cy, 0, desc.shape[1] - 1)
        return jax.vmap(lambda d, y, x: d[y, x])(desc, cy, cx)  # [B, M, D]

    da = gather(desc_a, uv_a)
    db = gather(desc_b, uv_b)
    sim = jnp.einsum("bmd,bnd->bmn", da, db)  # [B, M, M]
    pos = jnp.einsum("bmd,bmd->bm", da, db)
    vmask = valid[:, :, None] & valid[:, None, :]
    eye = jnp.eye(sim.shape[1], dtype=bool)[None]
    negmask = vmask & ~eye
    neg = jnp.where(negmask, sim, -1.0)
    pos_l = jnp.maximum(0.0, margin_pos - pos) * valid
    neg_l = jnp.maximum(0.0, neg - margin_neg) * negmask
    return (pos_l.sum() / jnp.maximum(valid.sum(), 1)
            + lam * neg_l.sum() / jnp.maximum(negmask.sum(), 1))


def make_train_step(model: SuperPointTPU, tx):
    """Returns train_step(params, opt_state, batch) -> (params, opt, loss)."""

    def loss_fn(params, batch):
        la, da = model.apply(params, batch["img_a"])
        lb, db = model.apply(params, batch["img_b"])
        l_det = detector_loss(la, batch["heat_a"]) + detector_loss(
            lb, batch["heat_b"])
        l_desc = descriptor_loss(da, db, batch["uv_a"], batch["uv_b"],
                                 batch["valid"])
        return l_det + l_desc

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def synthetic_batch(key, batch: int = 2, h: int = 64, w: int = 64,
                    m: int = 16):
    """Tiny self-contained training batch (two views + correspondences)."""
    k1, k2, k3 = jax.random.split(key, 3)
    img_a = jax.random.uniform(k1, (batch, h, w, 1))
    img_b = jax.random.uniform(k2, (batch, h, w, 1))
    uv = jax.random.uniform(k3, (batch, m, 2), minval=4, maxval=min(h, w) - 4)
    heat_a = jnp.zeros((batch, h, w))
    heat_b = jnp.zeros((batch, h, w))
    iy = uv[..., 1].astype(jnp.int32)
    ix = uv[..., 0].astype(jnp.int32)
    bidx = jnp.arange(batch)[:, None] * jnp.ones((1, m), jnp.int32)
    heat_a = heat_a.at[bidx, iy, ix].set(1.0)
    heat_b = heat_b.at[bidx, iy, ix].set(1.0)
    return {
        "img_a": img_a, "img_b": img_b,
        "heat_a": heat_a, "heat_b": heat_b,
        "uv_a": uv, "uv_b": uv, "valid": jnp.ones((batch, m), bool),
    }
