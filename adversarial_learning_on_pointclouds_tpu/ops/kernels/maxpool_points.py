"""Standalone symmetric max-pool Pallas kernel with custom VJP.

Replaces ``torch.max(x, dim=2)`` (SURVEY.md §2.9
``kernels/maxpool_points.py``). Forward reduces over the point axis tile
by tile (sequential-grid max accumulation); backward scatters the
cotangent to the argmax points (first-occurrence tie-break, matching
``jnp.max``'s gradient convention of splitting ties — we instead pick the
first maximal point per channel, which matches torch's ``max``/scatter
convention; ties are measure-zero for real data and the parity tests pin
both paths on distinct values).

Inside the encoder the pool is fused into the trunk megakernel
(``encoder_fused``); this standalone version serves ad-hoc model code and
the training path when Pallas is enabled end-to-end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adversarial_learning_on_pointclouds_tpu.ops.kernels.shared_mlp import (
    _interpret, _tile_n,
)


def _fwd_kernel(x_ref, o_ref):
    # o_ref block is (1, 1, C): Mosaic requires the last-two block dims to
    # divide (8, 128) or equal the array dims, so pooled outputs carry a
    # singleton middle axis (squeezed by the caller).
    tile_max = jnp.max(x_ref[0], axis=0, keepdims=True)

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = tile_max.astype(o_ref.dtype)[None]

    @pl.when(pl.program_id(1) != 0)
    def _():
        o_ref[...] = jnp.maximum(o_ref[...],
                                 tile_max.astype(o_ref.dtype)[None])


def _bwd_kernel(x_ref, y_ref, g_ref, o_ref, seen_ref):
    """Route g to the first point equal to the pooled max per channel.

    ``seen_ref`` (VMEM scratch, [1, C]) counts, across N-tiles of one
    batch row, whether the max has already been hit — ensuring exactly
    one point receives the gradient even when duplicates exist.
    """
    @pl.when(pl.program_id(1) == 0)
    def _():
        seen_ref[...] = jnp.zeros_like(seen_ref)

    x = x_ref[0]                                     # [TILE_N, C]
    tn = x.shape[0]
    is_max = x == y_ref[0]                           # [TILE_N, C] bool
    # First maximal row per channel (Mosaic has no cumsum lowering, so
    # express "first occurrence" as a min over row indices instead):
    # winner row = min{r : is_max[r]}; a channel whose max already
    # appeared in an earlier tile (seen > 0) takes nothing here.
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, x.shape[1]), 0)
    first_row = jnp.min(jnp.where(is_max, row_ids, tn), axis=0,
                        keepdims=True)               # [1, C]
    fresh = seen_ref[...] == 0.0                     # [1, C]
    take = is_max & (row_ids == first_row) & fresh
    o_ref[...] = (take.astype(g_ref.dtype) * g_ref[0])[None]
    seen_ref[...] = seen_ref[...] + jnp.max(
        is_max.astype(jnp.float32), axis=0, keepdims=True)


def _fwd_call(x: jnp.ndarray) -> jnp.ndarray:
    bsz, n, c = x.shape
    tn = _tile_n(n, cap=512)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(bsz, n // tn),
        in_specs=[pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, c), x.dtype),
        interpret=_interpret(),
    )(x).reshape(bsz, c)


@jax.custom_vjp
def maxpool_points(x: jnp.ndarray) -> jnp.ndarray:
    """``[B, N, C] -> [B, C]`` max over the point axis."""
    return _fwd_call(x)


def _mp_fwd(x):
    y = _fwd_call(x)
    return y, (x, y)


def _mp_bwd(res, g):
    x, y = res
    bsz, n, c = x.shape
    tn = _tile_n(n, cap=512)
    dx = pl.pallas_call(
        _bwd_kernel,
        grid=(bsz, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32)],
        interpret=_interpret(),
    )(x, y.reshape(bsz, 1, c), g.reshape(bsz, 1, c))
    return (dx,)


maxpool_points.defvjp(_mp_fwd, _mp_bwd)
