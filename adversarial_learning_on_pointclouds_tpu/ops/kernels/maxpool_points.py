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
    tile_max = jnp.max(x_ref[0], axis=0, keepdims=True)

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = tile_max.astype(o_ref.dtype)

    @pl.when(pl.program_id(1) != 0)
    def _():
        o_ref[...] = jnp.maximum(o_ref[...], tile_max.astype(o_ref.dtype))


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
    is_max = (x == y_ref[...]).astype(jnp.float32)   # [TILE_N, C]
    # Cumulative count of maximal entries within the tile, offset by the
    # count from earlier tiles; the gradient goes where the running count
    # equals 1 (i.e. the first maximal point).
    cum = jnp.cumsum(is_max, axis=0) + seen_ref[...]
    take = (is_max > 0) & (cum == 1.0)
    o_ref[...] = (take.astype(g_ref.dtype) * g_ref[...])[None]
    seen_ref[...] = seen_ref[...] + jnp.sum(is_max, axis=0, keepdims=True)


def _fwd_call(x: jnp.ndarray) -> jnp.ndarray:
    bsz, n, c = x.shape
    tn = _tile_n(n, cap=512)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(bsz, n // tn),
        in_specs=[pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, c), x.dtype),
        interpret=_interpret(),
    )(x)


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
            pl.BlockSpec((1, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, c), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c), x.dtype),
        scratch_shapes=[pltpu.VMEM((1, c), jnp.float32)],
        interpret=_interpret(),
    )(x, y, g)
    return (dx,)


maxpool_points.defvjp(_mp_fwd, _mp_bwd)
