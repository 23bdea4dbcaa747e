"""Encoder megakernels: trunk+max-pool fusion and the streaming seg head.

Two memory-bound spots in the reference forward (SURVEY.md §3.2):

1. ``torch.max(bn3(conv3(x)), dim=2)`` materializes ``[B, 1024, N]`` just
   to reduce it. ``fused_stack_maxpool`` runs the pointwise stack tile-by
   -tile over N and folds the symmetric max into the last layer's
   epilogue — the ``[B, N, 1024]`` tensor never exists in HBM
   (SURVEY.md §2.9 ``kernels/maxpool_points.py`` fusion note).
2. ``cat([point_feat, global.repeat(N)], 1)`` materializes ``[B, 1088, N]``.
   ``seg_head_fused`` splits the first seg-head weight into its 64-d
   (per-point) and 1024-d (global) halves and streams the global half in
   as a per-batch rank-1 update — the concat tensor never exists either.
   The whole head, including the final per-point ``log_softmax``, is one
   kernel.

Both are inference-path kernels (training needs the intermediates for
backward anyway); parity-tested against the jnp path in
``tests/test_kernels.py``.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adversarial_learning_on_pointclouds_tpu.ops.kernels.shared_mlp import (
    _apply_act, _interpret, _mxu_dot, _tile_n,
)


def _pad_n_to_tile(n: int, cap: int = 256) -> int:
    """Extra rows needed when the point axis has NO power-of-two tile.

    ``_tile_n`` falls back to a full-width ``(1, N, C)`` block for such
    ``N`` (the reference lineage's seg default N=2500 is the live case:
    2500 has no multiple-of-8 divisor <= 256). At large N that regime
    blows the 16 MB scoped-VMEM limit — the N=2500 seg head needs
    ~22 MB for its [N, 512] intermediates (measured OOM on v5e,
    TPUCHECK_r04). Padding N up to the next ``cap`` multiple restores
    the designed pipelined tiling for ANY N; callers must make the pad
    rows semantically inert (slice them off / replicate a real row)."""
    if _tile_n(n, cap=cap) == n and n > cap:
        return -(-n // cap) * cap - n
    return 0


# ---------------------------------------------------------------------------
# fused_stack_maxpool: pointwise MLP stack with max-pool epilogue
# ---------------------------------------------------------------------------

def _stack_maxpool_kernel(acts, n_layers, x_ref, *refs):
    w_refs = refs[:n_layers]
    s_refs = refs[n_layers:2 * n_layers]
    c_refs = refs[2 * n_layers:3 * n_layers]
    o_ref = refs[3 * n_layers]
    h = x_ref[0]
    for li in range(n_layers):
        z = _mxu_dot(h, w_refs[li][...])
        z = z * c_refs[li][...] + s_refs[li][...]
        h = _apply_act(z, acts[li])
    tile_max = jnp.max(h, axis=0, keepdims=True)  # [1, c_out]
    # o_ref block is (1, 1, c_out) — see maxpool_points on why pooled
    # outputs carry a singleton middle axis.

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[...] = tile_max.astype(o_ref.dtype)[None]

    @pl.when(pl.program_id(1) != 0)
    def _():
        o_ref[...] = jnp.maximum(o_ref[...],
                                 tile_max.astype(o_ref.dtype)[None])


def fused_stack_maxpool(x: jnp.ndarray,
                        weights: Sequence[jnp.ndarray],
                        shifts: Sequence[jnp.ndarray],
                        scales: Sequence[jnp.ndarray],
                        acts: Sequence[Optional[str]]) -> jnp.ndarray:
    """``[B, N, c0] -> max over N of the chained stack -> [B, c_out]``."""
    bsz, n, _ = x.shape
    pad = _pad_n_to_tile(n)
    if pad:
        # Replicated real rows are max-invariant: identical points run
        # the same pointwise stack, so the pooled max is EXACT (zero
        # rows would not be — their post-BN activations could win).
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="edge")
        n += pad
    n_layers = len(weights)
    c_out = weights[-1].shape[1]
    tn = _tile_n(n, cap=256)
    kernel = functools.partial(_stack_maxpool_kernel, tuple(acts), n_layers)
    in_specs = [pl.BlockSpec((1, tn, x.shape[-1]), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
    for group in (shifts, scales):
        for s in group:
            in_specs.append(pl.BlockSpec((1, s.shape[-1]),
                                         lambda i, j: (0, 0),
                                         memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(bsz, n // tn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, c_out), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, 1, c_out), x.dtype),
        interpret=_interpret(),
    )(x, *weights, *[s.reshape(1, -1) for s in shifts],
      *[s.reshape(1, -1) for s in scales]).reshape(bsz, c_out)


# ---------------------------------------------------------------------------
# seg_head_fused: 1088-d concat head without the concat
# ---------------------------------------------------------------------------

def _seg_head_kernel(x_ref, g_ref, w1a_ref, w1b_ref, s1_ref, c1_ref,
                     w2_ref, s2_ref, c2_ref, w3_ref, s3_ref, c3_ref,
                     w4_ref, b4_ref, o_ref):
    pf = x_ref[0]                               # [TILE_N, 64]
    # Global-feature contribution: per-batch rank-1 row added to every
    # point's first-layer preactivation — replaces the [N, 1088] concat.
    g_row = _mxu_dot(g_ref[0], w1b_ref[...])    # [1, 512]
    z1 = _mxu_dot(pf, w1a_ref[...])
    h = jnp.maximum((z1 + g_row) * c1_ref[...] + s1_ref[...], 0)
    z2 = _mxu_dot(h, w2_ref[...])
    h = jnp.maximum(z2 * c2_ref[...] + s2_ref[...], 0)
    z3 = _mxu_dot(h, w3_ref[...])
    h = jnp.maximum(z3 * c3_ref[...] + s3_ref[...], 0)
    z4 = _mxu_dot(h, w4_ref[...])
    z4 = z4 + b4_ref[...]
    # Per-point log_softmax epilogue over the part classes.
    m = jnp.max(z4, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(z4 - m), axis=-1, keepdims=True)) + m
    o_ref[...] = (z4 - lse).astype(o_ref.dtype)[None]


def seg_head_fused(point_feat: jnp.ndarray, global_feat: jnp.ndarray,
                   w1: jnp.ndarray, shift1, scale1,
                   w2, shift2, scale2, w3, shift3, scale3,
                   w4, b4) -> jnp.ndarray:
    """Per-point seg head on the implicit ``[point_feat | global]`` concat.

    ``point_feat [B, N, 64]``, ``global_feat [B, 1024]``; ``w1`` is the
    full ``[1088, 512]`` first-layer weight (split internally). Returns
    per-point log-probabilities ``[B, N, num_parts]``.
    """
    bsz, n, c_pf = point_feat.shape
    n_orig, pad = n, _pad_n_to_tile(n)
    if pad:
        # The head is per-point (the log_softmax epilogue included), so
        # zero pad rows are inert — sliced off below.
        point_feat = jnp.pad(point_feat, ((0, 0), (0, pad), (0, 0)))
        n += pad
    num_parts = w4.shape[1]
    w1a, w1b = w1[:c_pf], w1[c_pf:]
    tn = _tile_n(n, cap=256)
    specs = [
        pl.BlockSpec((1, tn, c_pf), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, global_feat.shape[-1]), lambda i, j: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [point_feat,
                global_feat.reshape(bsz, 1, global_feat.shape[-1])]
    for arr, full in ((w1a, True), (w1b, True), (shift1, False),
                      (scale1, False), (w2, True), (shift2, False),
                      (scale2, False), (w3, True), (shift3, False),
                      (scale3, False), (w4, True), (b4, False)):
        a = arr if full else arr.reshape(1, -1)
        specs.append(pl.BlockSpec(a.shape, lambda i, j, nd=a.ndim: (0,) * nd,
                                  memory_space=pltpu.VMEM))
        operands.append(a)
    out = pl.pallas_call(
        _seg_head_kernel,
        grid=(bsz, n // tn),
        in_specs=specs,
        out_specs=pl.BlockSpec((1, tn, num_parts), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, num_parts),
                                       point_feat.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=16 * 1024 * 1024),
        interpret=_interpret(),
    )(*operands)
    return out[:, :n_orig] if pad else out
