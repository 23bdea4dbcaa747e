"""Fused TRAINING trunk: conv2+BN2+ReLU -> conv3+BN3 -> max-pool.

The training-mode encoder trunk is the step's HBM hot spot: XLA
materializes ``z3 [B, N, 1024]`` (268 MB at batch 32x2048) for BN
statistics, normalization, the pool, and again in backward. This kernel
family never materializes z3 at all:

* **F1**: ``z2 = x @ w2 + b2`` (kept — only 33 MB) + channel sum/sumsq
  for BN2's batch statistics, one pass.
* **F2**: per tile recomputes ``h2 = relu(bn2(z2))`` in-register,
  computes ``z3`` tile-wise, accumulates BN3 sum/sumsq AND per-cloud
  channel max/min + their indices. Because BN3 is a per-channel affine,
  ``max_n bn3(z3) = s3>=0 ? s3*max_n z3 + t3 : s3*min_n z3 + t3`` — so
  the pooled output and its winner index come from the z3 extrema alone.
* **B1** (backward): the pooled gradient makes ``dy3`` one-hot over
  points, so the standard BN backward
  ``dz3 = s3*(dy - mean(dy) - zhat*mean(dy*zhat))`` has *channel-scalar*
  reduction terms computable on the host side of the kernel
  (``mean(dy*zhat)`` needs zhat only at the winners, recoverable from
  the pooled output). B1 recomputes h2/z3 per tile, forms dz3
  in-register (sparse winner term + dense zhat term), and emits
  ``dyhat2 [B,N,128]``, ``dw3/db3`` and BN2's two reduction scalars.
  The remaining BN2 backward is elementwise on 33 MB tensors — XLA.

Custom VJP wires F1/F2/B1 together; the batch statistics are returned as
auxiliary (stop-gradient) outputs for the running-stat EMA update.
Parity: ``tests/test_kernels.py::test_trunk_train_*`` vs. the jnp
composition.

``groups > 1`` (round 4, the trunk twin of the grouped-BN paired heads):
the batch is ``groups`` stacked same-size streams and every BN statistic
is computed PER contiguous row-block — ``core.batch_norm_grouped``
semantics, i.e. exactly the statistics of ``groups`` sequential calls.
In-kernel this only changes the stat accumulators: they become
``[groups, C]`` outputs whose block index is ``i // (B//groups)``, a
monotone revisit pattern over the batch-major grid; the per-cloud matmul
tiling — and therefore every per-cloud value — is BIT-IDENTICAL to the
sequential calls (weight gradients differ at fp-reassociation level
only: one 2m-row reduction vs a sum of two m-row reductions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adversarial_learning_on_pointclouds_tpu.models.core import BN_EPS
from adversarial_learning_on_pointclouds_tpu.ops.kernels.shared_mlp import (
    _interpret, _mxu_dot, _mxu_dot_t, _tile_n,
)

_NEG = -3.0e38  # min-init for running max (fp32 finite)
_POS = 3.0e38


# ---------------------------------------------------------------------------
# F1: z2 + BN2 statistics
# ---------------------------------------------------------------------------

def _acc(ref, val_2d):
    """Accumulate a ``[1, C]`` row into a stat ref that is ``[1, C]``
    (groups=1, the original layout) or ``[1, 1, C]`` (grouped: Mosaic's
    block rule forbids ``(1, C)`` blocks over ``(G, C)`` arrays, so the
    grouped stats carry a singleton middle axis — CLAUDE.md block
    rule)."""
    ref[...] += val_2d if ref.ndim == 2 else val_2d[None]


def _make_f1_kernel(bpg):
    def _f1_kernel(x_ref, w_ref, b_ref, z_ref, sum_ref, ssq_ref):
        # Zero the stat block on its FIRST visit (batch-major grid ->
        # each group's rows are contiguous; bpg == bsz makes this the
        # plain single-group init).
        @pl.when((pl.program_id(0) % bpg == 0) & (pl.program_id(1) == 0))
        def _():
            sum_ref[...] = jnp.zeros_like(sum_ref)
            ssq_ref[...] = jnp.zeros_like(ssq_ref)

        z = _mxu_dot(x_ref[0], w_ref[...]) + b_ref[...]
        z_ref[...] = z.astype(z_ref.dtype)[None]
        _acc(sum_ref, jnp.sum(z, axis=0, keepdims=True))
        _acc(ssq_ref, jnp.sum(z * z, axis=0, keepdims=True))
    return _f1_kernel


def _stash_dtype():
    """z2 stash dtype: bf16 under the mixed-precision scope (halves the
    stash traffic; F2/B1 both read the same stash, so forward/backward
    recompute stays self-consistent), f32 otherwise."""
    from adversarial_learning_on_pointclouds_tpu.models import core as _core

    return jnp.bfloat16 if _core.compute_dtype() is not None else jnp.float32


def _stat_spec(groups, bpg, c):
    """Out/in spec + array shape for a per-group ``[*, C]`` stat.

    groups=1 keeps the original ``(1, C)`` layout (bit-stable lowering
    for the validated default path); groups>1 uses ``(G, 1, C)`` arrays
    with ``(1, 1, C)`` blocks indexed by ``i // bpg`` — Mosaic's block
    rule forbids partial blocks over the sublane axis of a 2D array."""
    if groups == 1:
        return (pl.BlockSpec((1, c), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
                (1, c))
    return (pl.BlockSpec((1, 1, c), lambda i, j: (i // bpg, 0, 0),
                         memory_space=pltpu.VMEM),
            (groups, 1, c))


def _f1_call(x, w2, b2, groups=1):
    bsz, n, c_in = x.shape
    c2 = w2.shape[1]
    tn = _tile_n(n, cap=512)
    bpg = bsz // groups
    st2, sh2 = _stat_spec(groups, bpg, c2)
    z2, s, ss = pl.pallas_call(
        _make_f1_kernel(bpg),
        grid=(bsz, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, c_in), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w2.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c2), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tn, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            st2, st2,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n, c2), _stash_dtype()),
            jax.ShapeDtypeStruct(sh2, jnp.float32),
            jax.ShapeDtypeStruct(sh2, jnp.float32),
        ),
        interpret=_interpret(),
    )(x, w2, b2.reshape(1, c2))
    if groups == 1:
        return z2, s.reshape(c2), ss.reshape(c2)
    return z2, s.reshape(groups, c2), ss.reshape(groups, c2)


# ---------------------------------------------------------------------------
# F2: h2 (in-register) -> z3 stats + per-cloud extrema and winner indices
# ---------------------------------------------------------------------------

def _row_of(ref):
    """Read a per-group ``[1, C]`` row out of a ref that is ``[1, C]``
    (groups=1 layout) or ``[1, 1, C]`` (grouped layout)."""
    return ref[...] if ref.ndim == 2 else ref[0]


def _make_f2_kernel(bpg):
    def _f2_kernel(z2_ref, sc_ref, sh_ref, w_ref, b_ref,
                   sum_ref, ssq_ref, mx_ref, mn_ref, imax_ref, imin_ref):
        j = pl.program_id(1)

        @pl.when((pl.program_id(0) % bpg == 0) & (j == 0))
        def _():
            sum_ref[...] = jnp.zeros_like(sum_ref)
            ssq_ref[...] = jnp.zeros_like(ssq_ref)

        @pl.when(j == 0)
        def _():
            mx_ref[...] = jnp.full_like(mx_ref, _NEG)
            mn_ref[...] = jnp.full_like(mn_ref, _POS)
            imax_ref[...] = jnp.zeros_like(imax_ref)
            imin_ref[...] = jnp.zeros_like(imin_ref)

        h2 = jnp.maximum(z2_ref[0].astype(jnp.float32) * _row_of(sc_ref)
                         + _row_of(sh_ref), 0.0)
        z3 = _mxu_dot(h2, w_ref[...]) + b_ref[...]       # [TILE_N, 1024]
        _acc(sum_ref, jnp.sum(z3, axis=0, keepdims=True))
        _acc(ssq_ref, jnp.sum(z3 * z3, axis=0, keepdims=True))

        tn, c3 = z3.shape
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, c3), 0)
        tile_max = jnp.max(z3, axis=0, keepdims=True)
        tile_min = jnp.min(z3, axis=0, keepdims=True)
        # First row attaining the extremum (torch/jnp argmax convention).
        amax = jnp.min(jnp.where(z3 == tile_max, row_ids, tn), axis=0,
                       keepdims=True) + j * tn
        amin = jnp.min(jnp.where(z3 == tile_min, row_ids, tn), axis=0,
                       keepdims=True) + j * tn

        better_max = tile_max > mx_ref[0]
        imax_ref[...] = jnp.where(better_max, amax, imax_ref[0])[None]
        mx_ref[...] = jnp.where(better_max, tile_max, mx_ref[0])[None]
        better_min = tile_min < mn_ref[0]
        imin_ref[...] = jnp.where(better_min, amin, imin_ref[0])[None]
        mn_ref[...] = jnp.where(better_min, tile_min, mn_ref[0])[None]
    return _f2_kernel


def _f2_call(z2, scale2, shift2, w3, b3, groups=1):
    bsz, n, c2 = z2.shape
    c3 = w3.shape[1]
    tn = _tile_n(n, cap=512)
    bpg = bsz // groups
    st2, sh2shape = _stat_spec(groups, bpg, c2)
    st3, sh3shape = _stat_spec(groups, bpg, c3)
    # Per-group BN2 fold scalars ride the group index; groups=1 keeps the
    # original (1, c2) broadcast row.
    sc2 = scale2.reshape(sh2shape)
    sh2 = shift2.reshape(sh2shape)
    outs = pl.pallas_call(
        _make_f2_kernel(bpg),
        grid=(bsz, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            st2, st2,
            pl.BlockSpec(w3.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c3), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            st3, st3,
            pl.BlockSpec((1, 1, c3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct(sh3shape, jnp.float32),
            jax.ShapeDtypeStruct(sh3shape, jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c3), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c3), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c3), jnp.int32),
            jax.ShapeDtypeStruct((bsz, 1, c3), jnp.int32),
        ),
        interpret=_interpret(),
    )(z2, sc2, sh2, w3, b3.reshape(1, c3))
    s3, ss3, mx, mn, imax, imin = outs
    if groups == 1:
        s3, ss3 = s3.reshape(c3), ss3.reshape(c3)
    else:
        s3, ss3 = s3.reshape(groups, c3), ss3.reshape(groups, c3)
    return (s3, ss3, mx.reshape(bsz, c3),
            mn.reshape(bsz, c3), imax.reshape(bsz, c3),
            imin.reshape(bsz, c3))


# ---------------------------------------------------------------------------
# B1: backward through conv3+BN3+pool, emitting dyhat2 + dw3/db3 + BN2 sums
# ---------------------------------------------------------------------------

def _make_b1_kernel(bpg):
    def _b1_kernel(z2_ref, sc_ref, sh_ref, w_ref, b_ref, mu3_ref, inv3_ref,
                   coef1_ref, coef2_ref, s3dg_ref, idx_ref, mu2_ref,
                   inv2_ref, dy2_ref, dw3_ref, db3_ref, t1_ref, t2_ref):
        j = pl.program_id(1)

        @pl.when((pl.program_id(0) == 0) & (j == 0))
        def _():
            dw3_ref[...] = jnp.zeros_like(dw3_ref)   # global (shared w)
            db3_ref[...] = jnp.zeros_like(db3_ref)

        @pl.when((pl.program_id(0) % bpg == 0) & (j == 0))
        def _():
            t1_ref[...] = jnp.zeros_like(t1_ref)     # per-group BN2 sums
            t2_ref[...] = jnp.zeros_like(t2_ref)

        z2 = z2_ref[0].astype(jnp.float32)
        h2 = jnp.maximum(z2 * _row_of(sc_ref) + _row_of(sh_ref), 0.0)
        z3 = _mxu_dot(h2, w_ref[...]) + b_ref[...]
        zhat3 = (z3 - _row_of(mu3_ref)) * _row_of(inv3_ref)

        tn, c3 = z3.shape
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (tn, c3), 0)
        local_win = idx_ref[0] - j * tn                   # [1, c3]
        sparse = jnp.where(row_ids == local_win, s3dg_ref[0], 0.0)
        dz3 = sparse - coef1_ref[0] - zhat3 * coef2_ref[0]

        dw3_ref[...] += _mxu_dot_t(h2, dz3).astype(dw3_ref.dtype)
        db3_ref[...] += jnp.sum(dz3, axis=0, keepdims=True)

        dh2 = _mxu_dot(dz3, w_ref[...].T)                 # [TILE_N, c2]
        dy2 = dh2 * (h2 > 0).astype(dh2.dtype)            # relu' from h2
        dy2_ref[...] = dy2.astype(dy2_ref.dtype)[None]
        zhat2 = (z2 - _row_of(mu2_ref)) * _row_of(inv2_ref)
        _acc(t1_ref, jnp.sum(dy2, axis=0, keepdims=True))
        _acc(t2_ref, jnp.sum(dy2 * zhat2, axis=0, keepdims=True))
    return _b1_kernel


def _b1_call(z2, scale2, shift2, w3, b3, mu3, inv3, coef1, coef2, s3dg,
             idx, mu2, inv2, groups=1):
    bsz, n, c2 = z2.shape
    c3 = w3.shape[1]
    tn = _tile_n(n, cap=512)
    bpg = bsz // groups
    st2, sh2shape = _stat_spec(groups, bpg, c2)
    st3, sh3shape = _stat_spec(groups, bpg, c3)
    gr2 = lambda a: a.reshape(sh2shape)  # noqa: E731  per-group rows
    gr3 = lambda a: a.reshape(sh3shape)  # noqa: E731
    row = lambda a: a.reshape(1, -1)  # noqa: E731
    outs = pl.pallas_call(
        _make_b1_kernel(bpg),
        grid=(bsz, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            st2, st2,
            pl.BlockSpec(w3.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c3), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            st3, st3,
            pl.BlockSpec((1, 1, c3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c3), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            st2, st2,
        ],
        out_specs=(
            pl.BlockSpec((1, tn, c2), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(w3.shape, lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c3), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            st2, st2,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n, c2), jnp.float32),
            jax.ShapeDtypeStruct(w3.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, c3), jnp.float32),
            jax.ShapeDtypeStruct(sh2shape, jnp.float32),
            jax.ShapeDtypeStruct(sh2shape, jnp.float32),
        ),
        interpret=_interpret(),
    )(z2, gr2(scale2), gr2(shift2), w3, row(b3), gr3(mu3), gr3(inv3),
      coef1.reshape(bsz, 1, c3), coef2.reshape(bsz, 1, c3),
      s3dg.reshape(bsz, 1, c3), idx.reshape(bsz, 1, c3),
      gr2(mu2), gr2(inv2))
    dy2, dw3, db3, t1, t2 = outs
    if groups == 1:
        t1, t2 = t1.reshape(c2), t2.reshape(c2)
    else:
        t1, t2 = t1.reshape(groups, c2), t2.reshape(groups, c2)
    return dy2, dw3, db3.reshape(c3), t1, t2


# ---------------------------------------------------------------------------
# Custom-VJP wrapper
# ---------------------------------------------------------------------------

def _grows(a, bpg):
    """Expand per-group rows ``[G, C]`` to per-cloud rows ``[G*bpg, C]``
    (for groups=1 this is the old ``[1, C]`` broadcast, value-identical)."""
    return jnp.repeat(a, bpg, axis=0)


def _primal(groups, x, w2, b2, g2, be2, w3, b3, g3, be3):
    bsz, n, _ = x.shape
    bpg = bsz // groups
    m = bpg * n                                       # per-group count
    c2, c3 = w2.shape[1], w3.shape[1]
    z2, s2, ss2 = _f1_call(x, w2, b2, groups)
    s2, ss2 = s2.reshape(groups, c2), ss2.reshape(groups, c2)
    mu2 = s2 / m                                      # [G, c2]
    var2 = jnp.maximum(ss2 / m - mu2 * mu2, 0.0)
    inv2 = jax.lax.rsqrt(var2 + BN_EPS)
    sc2 = g2[None] * inv2
    sh2 = be2[None] - mu2 * sc2

    s3, ss3, mx, mn, imax, imin = _f2_call(z2, sc2, sh2, w3, b3, groups)
    s3, ss3 = s3.reshape(groups, c3), ss3.reshape(groups, c3)
    mu3 = s3 / m                                      # [G, c3]
    var3 = jnp.maximum(ss3 / m - mu3 * mu3, 0.0)
    inv3 = jax.lax.rsqrt(var3 + BN_EPS)
    s3c = g3[None] * inv3
    t3 = be3[None] - mu3 * s3c

    s3c_r = _grows(s3c, bpg)                          # [B, c3]
    pos = s3c_r >= 0
    g = jnp.where(pos, mx, mn) * s3c_r + _grows(t3, bpg)
    idx = jnp.where(pos, imax, imin)
    if groups == 1:                                   # back-compat shapes
        mu2_o, var2_o = mu2.reshape(c2), var2.reshape(c2)
        mu3_o, var3_o = mu3.reshape(c3), var3.reshape(c3)
    else:
        mu2_o, var2_o, mu3_o, var3_o = mu2, var2, mu3, var3
    res = (x, z2, mu2, inv2, sc2, sh2, w2, w3, b3, mu3, inv3, g3, be3,
           g, idx)
    return (g, mu2_o, var2_o, mu3_o, var3_o), res


def trunk2_train(x, w2, b2, g2, be2, w3, b3, g3, be3, groups=1):
    """Fused training trunk. Returns ``(pooled [B,c3], mu2, var2_biased,
    mu3, var3_biased)`` — batch stats are auxiliary (no gradient).

    ``groups > 1``: ``x`` is ``groups`` stacked same-size streams; every
    BN statistic is per row-block (``core.batch_norm_grouped``
    semantics — the statistics of ``groups`` sequential calls; pooled
    outputs bit-identical to them) and the returned stats have shape
    ``[groups, C]`` for a chained EMA update."""
    assert x.shape[0] % groups == 0, (x.shape, groups)
    return _trunk2(groups, x, w2, b2, g2, be2, w3, b3, g3, be3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _trunk2(groups, x, w2, b2, g2, be2, w3, b3, g3, be3):
    out, _ = _primal(groups, x, w2, b2, g2, be2, w3, b3, g3, be3)
    return out


def _trunk2_fwd(groups, x, w2, b2, g2, be2, w3, b3, g3, be3):
    return _primal(groups, x, w2, b2, g2, be2, w3, b3, g3, be3)


def _trunk2_bwd(groups, res, cts):
    (x, z2, mu2, inv2, sc2, sh2, w2, w3, b3, mu3, inv3, g3, be3,
     g, idx) = res                                    # stats [G, C]
    dg = cts[0]                                       # [B, c3]
    bsz, n, _ = x.shape
    bpg = bsz // groups
    m = bpg * n
    c2, c3 = w2.shape[1], w3.shape[1]
    s3c = g3[None] * inv3                             # [G, c3]

    # BN3 backward channel scalars PER GROUP (winner zhat comes from the
    # pooled output: zhat_win = (g - be3) / g3 — measure-zero caveat
    # g3 == 0).
    safe_g3 = jnp.where(g3 == 0, 1.0, g3)
    zhat_win = (g - be3) / safe_g3                    # [B, c3]
    dgg = dg.reshape(groups, bpg, c3)
    s1 = jnp.sum(dgg, axis=1)                         # [G, c3] = sum dy
    s2 = jnp.sum(dgg * zhat_win.reshape(groups, bpg, c3),
                 axis=1)                              # [G, c3]
    coef1 = _grows(s3c * s1 / m, bpg)                 # [B, c3]
    coef2 = _grows(s3c * s2 / m, bpg)
    s3dg = _grows(s3c, bpg) * dg                      # [B, c3]

    dy2, dw3, db3, t1, t2 = _b1_call(
        z2, sc2, sh2, w3, b3, mu3, inv3, coef1, coef2, s3dg, idx,
        mu2, inv2, groups)
    t1 = t1.reshape(groups, c2)
    t2 = t2.reshape(groups, c2)

    # BN2 backward (elementwise on [B,N,128] + two matmuls — XLA),
    # group stats broadcast over each row block.
    exp = lambda a: a[:, None, None]  # noqa: E731  [G,c2] -> [G,1,1,c2]
    zhat2 = ((z2.astype(jnp.float32).reshape(groups, bpg, n, c2)
              - exp(mu2)) * exp(inv2))
    dz2 = exp(sc2) * (dy2.reshape(groups, bpg, n, c2) - exp(t1) / m
                      - zhat2 * (exp(t2) / m))
    dz2 = dz2.reshape(bsz * n, c2)
    dx = _mxu_dot(dz2, w2.T).reshape(x.shape)
    dw2 = _mxu_dot_t(x.reshape(bsz * n, -1), dz2)
    db2 = jnp.sum(dz2, axis=0)
    dg2 = jnp.sum(t2, axis=0)
    dbe2 = jnp.sum(t1, axis=0)
    dg3 = jnp.sum(s2, axis=0)
    dbe3 = jnp.sum(s1, axis=0)
    return (dx.astype(x.dtype), dw2.astype(w2.dtype), db2, dg2, dbe2,
            dw3.astype(w3.dtype), db3, dg3, dbe3)


_trunk2.defvjp(_trunk2_fwd, _trunk2_bwd)


# ---------------------------------------------------------------------------
# trunk3: conv1+BN1+ReLU folded in front (the full T-Net conv stack)
# ---------------------------------------------------------------------------

def _primal3(x, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, g3, be3):
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        seg_head_train as _sh,
    )

    bsz, n, _ = x.shape
    m = bsz * n
    z1, s1, ss1 = _f1_call(x, w1, b1)
    mu1 = s1 / m
    var1 = jnp.maximum(ss1 / m - mu1 * mu1, 0.0)
    inv1 = jax.lax.rsqrt(var1 + BN_EPS)
    sc1, sh1 = g1 * inv1, be1 - mu1 * g1 * inv1
    z2, s2, ss2 = _sh._pmid_call(z1, sc1, sh1, w2, b2)
    mu2 = s2 / m
    var2 = jnp.maximum(ss2 / m - mu2 * mu2, 0.0)
    inv2 = jax.lax.rsqrt(var2 + BN_EPS)
    sc2, sh2 = g2 * inv2, be2 - mu2 * g2 * inv2
    s3, ss3, mx, mn, imax, imin = _f2_call(z2, sc2, sh2, w3, b3)
    mu3 = s3 / m
    var3 = jnp.maximum(ss3 / m - mu3 * mu3, 0.0)
    inv3 = jax.lax.rsqrt(var3 + BN_EPS)
    s3c = g3 * inv3
    t3 = be3 - mu3 * s3c
    pos = s3c >= 0
    g = jnp.where(pos, mx, mn) * s3c + t3
    idx = jnp.where(pos, imax, imin)
    out = (g, mu1, var1, mu2, var2, mu3, var3)
    res = (x, z1, z2, w1, w2, w3, b3, mu1, inv1, sc1, sh1, mu2, inv2,
           sc2, sh2, mu3, inv3, g3, be3, g, idx)
    return out, res


def trunk3_train(x, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, g3, be3):
    """Fused training T-Net conv stack: conv1+BN1+ReLU -> conv2+BN2+ReLU
    -> conv3+BN3 -> max-pool, all statistics in-kernel. Returns
    ``(pooled, mu1, var1_biased, mu2, var2_biased, mu3, var3_biased)``.
    The caller applies the reference's post-pool ReLU via
    ``max(relu(y)) == relu(max(y))``."""
    return _trunk3(x, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, g3, be3)


@jax.custom_vjp
def _trunk3(*args):
    out, _ = _primal3(*args)
    return out


def _trunk3_fwd(*args):
    return _primal3(*args)


def _trunk3_bwd(res, cts):
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        seg_head_train as _sh,
    )

    (x, z1, z2, w1, w2, w3, b3, mu1, inv1, sc1, sh1, mu2, inv2,
     sc2, sh2, mu3, inv3, g3, be3, g, idx) = res
    dg = cts[0]
    bsz, n, _ = x.shape
    m = bsz * n
    s3c = g3 * inv3

    safe_g3 = jnp.where(g3 == 0, 1.0, g3)
    zhat_win = (g - be3) / safe_g3
    s1_ = jnp.sum(dg, axis=0)
    s2_ = jnp.sum(dg * zhat_win, axis=0)
    coef1 = jnp.broadcast_to((s3c * s1_ / m)[None], dg.shape)
    coef2 = jnp.broadcast_to((s3c * s2_ / m)[None], dg.shape)
    s3dg = s3c[None, :] * dg

    dy2, dw3, db3, t1_2, t2_2 = _b1_call(
        z2, sc2, sh2, w3, b3, mu3, inv3, coef1, coef2, s3dg, idx,
        mu2, inv2)
    dy1, dw2, db2, t1_1, t2_1 = _sh._bmid_call(
        z2, dy2, sc2, mu2, inv2, sc2 * t1_2 / m, sc2 * t2_2 / m,
        z1, sc1, sh1, w2, mu1, inv1)
    dx, dw1, db1, _ = _sh._b1_call(
        z1, dy1, sc1, mu1, inv1, sc1 * t1_1 / m, sc1 * t2_1 / m, x, w1)
    return (dx.astype(x.dtype), dw1.astype(w1.dtype), db1, t2_1, t1_1,
            dw2.astype(w2.dtype), db2, t2_2, t1_2,
            dw3.astype(w3.dtype), db3, s2_, s1_)


_trunk3.defvjp(_trunk3_fwd, _trunk3_bwd)
