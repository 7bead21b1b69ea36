"""Fused Hamming distance + top-2 Pallas kernel.

The matcher needs, per query descriptor, the best and second-best Hamming
distances (threshold + ratio test) plus the argmin — not the full distance
matrix. The XLA path materializes an [N, M] int32 matrix in HBM
(~50 MB/frame at N=1500, M=8192) purely to reduce it again; this kernel
tiles the +/-1 int8 matmul on the MXU and keeps the running (best, second,
argmin) per row in VMEM scratch across column tiles, so HBM only sees the
descriptors and an [N, 4] result.

Grid: (row_tiles, col_tiles), column-minor; scratch persists across the
column sweep (TPU grid steps execute sequentially on a core).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 128   # query rows per tile
BM = 512   # candidate columns per tile
BIG = 1 << 20  # python int: jnp scalars would be captured consts in pallas


def _top2_kernel(sa_ref, sb_ref, bias_ref, out_ref, state):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        state[:, 0] = jnp.full((BN,), float(BIG), jnp.float32)  # best
        state[:, 1] = jnp.full((BN,), float(BIG), jnp.float32)  # second
        state[:, 2] = jnp.zeros((BN,), jnp.float32)             # argbest

    # distances for this tile: d = (256 - sa . sb) / 2  (+ invalid bias)
    dot = jax.lax.dot_general(
        sa_ref[:], sb_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                    # [BN, BM]
    # +/-1 bf16 inputs: dot in [-256, 256] is f32-exact
    d = (256.0 - dot) * 0.5 + bias_ref[:]

    t_best = jnp.min(d, axis=1)
    t_arg_local = jnp.argmin(d, axis=1).astype(jnp.int32)
    t_arg = (t_arg_local + j * BM).astype(jnp.float32)
    masked = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (BN, BM), 1)
        == t_arg_local[:, None], float(BIG), d)
    t_second = jnp.min(masked, axis=1)

    best = state[:, 0]
    second = state[:, 1]
    arg = state[:, 2]
    new_best = jnp.minimum(best, t_best)
    new_second = jnp.minimum(jnp.minimum(second, t_second),
                             jnp.maximum(best, t_best))
    new_arg = jnp.where(t_best < best, t_arg, arg)
    state[:, 0] = new_best
    state[:, 1] = new_second
    state[:, 2] = new_arg

    @pl.when(j == nj - 1)
    def _():
        out_ref[:, 0] = new_best.astype(jnp.int32)
        out_ref[:, 1] = new_second.astype(jnp.int32)
        out_ref[:, 2] = new_arg.astype(jnp.int32)
        out_ref[:, 3] = jnp.zeros((BN,), jnp.int32)


def _lm_top2_kernel(sa_ref, kp_xy_ref, sb_ref, bias_ref, lm_xy_ref, r2_ref,
                    out_ref, state, bankmin):
    """Grid (rows, lm_tiles, bank); bank innermost.

    bankmin accumulates the min distance over each landmark's descriptor
    bank (the bank axis rides the grid — mosaic can't reshape lanes);
    the top-2 merge runs once per landmark tile at the last bank step.
    """
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    k = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when((j == 0) & (k == 0))
    def _():
        state[:, 0] = jnp.full((BN,), float(BIG), jnp.float32)
        state[:, 1] = jnp.full((BN,), float(BIG), jnp.float32)
        state[:, 2] = jnp.zeros((BN,), jnp.float32)

    @pl.when(k == 0)
    def _():
        bankmin[:, :] = jnp.full((BN, BM), float(BIG), jnp.float32)

    dot = jax.lax.dot_general(
        sa_ref[:], sb_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                   # [BN, BM]
    # +/-1 f32 inputs: dot in [-256, 256] is exact
    d = (256.0 - dot) * 0.5 + bias_ref[0]
    bankmin[:, :] = jnp.minimum(bankmin[:, :], d)

    @pl.when(k == nk - 1)
    def _():
        d = bankmin[:, :]
        # 2D gate: keypoint to projected-landmark pixel distance
        dx = kp_xy_ref[:, 0:1] - lm_xy_ref[0:1, :]      # [BN, BM]
        dy = kp_xy_ref[:, 1:2] - lm_xy_ref[1:2, :]
        outside = (dx * dx + dy * dy) >= r2_ref[0, 0]
        d = jnp.where(outside, float(BIG), d)

        t_best = jnp.min(d, axis=1)
        t_arg_local = jnp.argmin(d, axis=1).astype(jnp.int32)
        t_arg = (t_arg_local + j * BM).astype(jnp.float32)
        masked = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (BN, BM), 1)
            == t_arg_local[:, None], float(BIG), d)
        t_second = jnp.min(masked, axis=1)

        best = state[:, 0]
        second = state[:, 1]
        arg = state[:, 2]
        new_best = jnp.minimum(best, t_best)
        new_second = jnp.minimum(jnp.minimum(second, t_second),
                                 jnp.maximum(best, t_best))
        new_arg = jnp.where(t_best < best, t_arg, arg)
        state[:, 0] = new_best
        state[:, 1] = new_second
        state[:, 2] = new_arg

        @pl.when(j == nj - 1)
        def _():
            out_ref[:, 0] = new_best.astype(jnp.int32)
            out_ref[:, 1] = new_second.astype(jnp.int32)
            out_ref[:, 2] = new_arg.astype(jnp.int32)
            out_ref[:, 3] = jnp.zeros((BN,), jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def landmark_top2(kp_bits, kp_valid, kp_xy, bank_bits, bank_valid,
                  lm_proj_xy, lm_valid, max_dist_2d,
                  interpret: bool = False):
    """Fused guided landmark matching stats.

    kp_bits [N, 256], kp_xy [N, 2]; bank_bits [P, B, 256] with validity
    [P, B]; lm_proj_xy [P, 2], lm_valid [P]. Per keypoint: best/second
    Hamming distance over landmarks (min over each bank, gated to the 2D
    radius) + argmin landmark. PAD semantics: 256 where nothing qualifies.
    """
    n = kp_bits.shape[0]
    p, bank, _ = bank_bits.shape
    n_pad = -(-n // BN) * BN
    p_pad = -(-p // BM) * BM

    sa = _pad_to((kp_bits.astype(jnp.float32) * 2 - 1), n_pad, 0)
    kxy = _pad_to(kp_xy.astype(jnp.float32), n_pad, 0, value=-1e6)

    flat_valid = bank_valid & lm_valid[:, None]
    flat_bits = _pad_to(bank_bits, p_pad, 0)
    flat_valid = _pad_to(flat_valid, p_pad, 0, value=False)
    # bank-major layout: sb3 [bank, 256, P_pad], one bank slice per grid step
    sb3 = jnp.transpose(
        flat_bits.astype(jnp.float32) * 2 - 1, (1, 2, 0))   # [B, 256, P]
    bias3 = jnp.where(jnp.transpose(flat_valid, (1, 0))[:, None, :],
                      0.0, float(BIG)).astype(jnp.float32)  # [B, 1, P]
    lxy = _pad_to(lm_proj_xy.astype(jnp.float32), p_pad, 0, value=1e6).T
    r2 = jnp.asarray([[max_dist_2d * max_dist_2d]], jnp.float32)

    out = pl.pallas_call(
        _lm_top2_kernel,
        grid=(n_pad // BN, p_pad // BM, bank),
        in_specs=[
            pl.BlockSpec((BN, 256), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BN, 2), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 256, BM), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, BM), lambda i, j, k: (k, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, BM), lambda i, j, k: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((BN, 4), lambda i, j, k: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.int32),
        scratch_shapes=[pltpu.VMEM((BN, 4), jnp.float32),
                        pltpu.VMEM((BN, BM), jnp.float32)],
        interpret=interpret,
    )(sa, kxy, sb3, bias3, lxy, r2)

    best = jnp.minimum(out[:n, 0], 256)
    second = jnp.minimum(out[:n, 1], 256)
    arg = jnp.clip(out[:n, 2], 0, p - 1)
    any_cand = out[:n, 0] < BIG
    best = jnp.where(kp_valid, best, 256)
    second = jnp.where(kp_valid, second, 256)
    any_cand = any_cand & kp_valid
    return best, second, arg, any_cand


def _pad_to(x, n, axis, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("interpret",))
def hamming_top2(bits_a, bits_b, valid_a, valid_b, interpret: bool = False):
    """Per-row (best, second, argmin) Hamming stats of A against B.

    bits_* [N/M, 256] {0,1}; invalid B columns get +BIG bias (never best);
    invalid A rows return BIG distances. Returns (best [N], second [N],
    arg [N] int32), with distances clamped to 256 where no valid candidate
    exists (reference init semantics, keypoints.h:334-336).
    """
    n, m = bits_a.shape[0], bits_b.shape[0]
    n_pad = -(-n // BN) * BN
    m_pad = -(-m // BM) * BM

    sa = _pad_to((bits_a.astype(jnp.float32) * 2 - 1), n_pad, 0)
    sb = _pad_to((bits_b.astype(jnp.float32) * 2 - 1), m_pad, 0)
    bias = jnp.where(valid_b, 0.0, float(BIG)).astype(jnp.float32)
    bias = _pad_to(bias, m_pad, 0, value=BIG)[None, :]

    out = pl.pallas_call(
        _top2_kernel,
        grid=(n_pad // BN, m_pad // BM),
        in_specs=[
            pl.BlockSpec((BN, 256), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((256, BM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BM), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BN, 4), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.int32),
        scratch_shapes=[pltpu.VMEM((BN, 4), jnp.float32)],
        interpret=interpret,
    )(sa, sb.T, bias)

    best = out[:n, 0]
    second = out[:n, 1]
    arg = out[:n, 2]
    # clamp missing candidates to the reference's 256 init
    best = jnp.minimum(best, 256)
    second = jnp.minimum(second, 256)
    best = jnp.where(valid_a, best, 256)
    second = jnp.where(valid_a, second, 256)
    return best, second, jnp.clip(arg, 0, m - 1)
