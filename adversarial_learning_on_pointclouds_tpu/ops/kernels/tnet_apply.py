"""Batched T-Net transform apply: ``y[b] = x[b] @ T[b]`` as a Pallas kernel.

Replaces the reference's ``torch.bmm(points, trans)`` (SURVEY.md §2.9
``kernels/tnet_apply.py``). The per-batch ``k x k`` matrix (k = 3 or 64)
rides along the grid's batch dimension and stays in VMEM while tiles of N
stream through. Custom VJP: ``dx = g @ T^T`` (same kernel, transposed
operand) and ``dT = sum_n x^T g`` (grid-accumulated per batch row).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adversarial_learning_on_pointclouds_tpu.ops.kernels.shared_mlp import (
    _interpret, _tile_n,
)


def _apply_kernel(x_ref, t_ref, o_ref):
    o_ref[...] = jnp.dot(x_ref[0], t_ref[0],
                         precision=jax.lax.Precision.HIGHEST,
                         preferred_element_type=jnp.float32
                         ).astype(o_ref.dtype)[None]


def _apply_call(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    bsz, n, k = x.shape
    tn = _tile_n(n, cap=512)
    return pl.pallas_call(
        _apply_kernel,
        grid=(bsz, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k, k), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, k), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, k), x.dtype),
        interpret=_interpret(),
    )(x, t)


def _dt_kernel(x_ref, g_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = jnp.zeros_like(o_ref)

    o_ref[...] += jax.lax.dot_general(
        x_ref[0], g_ref[0], (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).astype(o_ref.dtype)[None]


@jax.custom_vjp
def tnet_apply(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """``x [B, N, k] @ t [B, k, k] -> [B, N, k]``."""
    return _apply_call(x, t)


def _ta_fwd(x, t):
    return _apply_call(x, t), (x, t)


def _ta_bwd(res, g):
    x, t = res
    dx = _apply_call(g, jnp.swapaxes(t, -1, -2))
    bsz, n, k = x.shape
    tn = _tile_n(n, cap=512)
    dt = pl.pallas_call(
        _dt_kernel,
        grid=(bsz, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, k), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, k), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, k, k), x.dtype),
        interpret=_interpret(),
    )(x, g)
    return dx, dt


tnet_apply.defvjp(_ta_fwd, _ta_bwd)
