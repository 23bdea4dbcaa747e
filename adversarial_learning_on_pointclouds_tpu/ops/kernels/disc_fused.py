"""Fully-fused, differentiable discriminator kernel.

The point-wise FCN discriminator (k->64->128->256->512->1, LeakyReLU;
SURVEY.md §2.4) is bandwidth-bound under XLA: five narrow matmuls each
round-trip a ``[B*N, C]`` activation through HBM (measured 2.8 ms fwd for
46 GFLOP on v5e — ~5x the bandwidth floor). This kernel runs the whole
stack per N-tile with every weight resident in VMEM (~0.8 MB total):

* forward: one read of the probability map, one write of the logits;
* backward (custom VJP): per tile, the hidden activations are
  *recomputed in-register* from the saved input (flash-attention style),
  then the chain of ``dz_i = dh_i * leaky'`` / ``dW_i += h_{i-1}^T dz_i``
  / ``dh_{i-1} = dz_i @ W_i^T`` runs in VMEM, accumulating the weight
  grads across the sequential grid and writing only ``dprobs``.

LeakyReLU's derivative is recoverable from its output sign
(``leaky`` preserves sign), so no pre-activations are stored anywhere.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adversarial_learning_on_pointclouds_tpu.ops.kernels.shared_mlp import (
    _interpret, _mxu_dot, _mxu_dot_t, _tile_n,
)

_SLOPE = 0.2
_N_LAYERS = 5


def _leaky(z):
    return jnp.where(z >= 0, z, _SLOPE * z)


def _dleaky_from_h(h):
    # sign(h) == sign(z) for leaky relu with positive slope.
    return jnp.where(h >= 0, 1.0, _SLOPE)


def _fwd_kernel(x_ref, *refs):
    w = [refs[i] for i in range(_N_LAYERS)]
    b = [refs[_N_LAYERS + i] for i in range(_N_LAYERS)]
    o_ref = refs[2 * _N_LAYERS]
    h = x_ref[0]
    for i in range(_N_LAYERS):
        z = _mxu_dot(h, w[i][...]) + b[i][...]
        h = _leaky(z) if i < _N_LAYERS - 1 else z
    o_ref[...] = h.astype(o_ref.dtype)[None]


def _bwd_kernel(x_ref, g_ref, *refs):
    # Ref layout after (x, g): inputs [w*5, b*5], outputs [dx, dw*5, db*5].
    w = [refs[i] for i in range(_N_LAYERS)]
    b = [refs[_N_LAYERS + i] for i in range(_N_LAYERS)]
    dx_ref = refs[2 * _N_LAYERS]
    dw_refs = [refs[2 * _N_LAYERS + 1 + i] for i in range(_N_LAYERS)]
    db_refs = [refs[3 * _N_LAYERS + 1 + i] for i in range(_N_LAYERS)]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        for r in dw_refs + db_refs:
            r[...] = jnp.zeros_like(r)

    # Recompute the forward chain in-register (activations h0..h4).
    hs = [x_ref[0]]
    for i in range(_N_LAYERS - 1):
        z = _mxu_dot(hs[-1], w[i][...]) + b[i][...]
        hs.append(_leaky(z))
    # Backward chain.
    dh = g_ref[0].astype(jnp.float32)  # [TILE_N, 1] — last layer linear
    for i in reversed(range(_N_LAYERS)):
        dz = dh if i == _N_LAYERS - 1 else dh * _dleaky_from_h(hs[i + 1])
        dw_refs[i][...] += _mxu_dot_t(hs[i], dz).astype(dw_refs[i].dtype)
        db_refs[i][...] += jnp.sum(dz, axis=0, keepdims=True
                                   ).astype(db_refs[i].dtype)
        dh = _mxu_dot(dz, w[i][...].T)
    dx_ref[...] = dh.astype(dx_ref.dtype)[None]


def _fwd_call(x, weights, biases):
    bsz, n, _ = x.shape
    tn = _tile_n(n, cap=512)
    in_specs = [pl.BlockSpec((1, tn, x.shape[-1]), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)]
    operands = [x]
    for wgt in weights:
        in_specs.append(pl.BlockSpec(wgt.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(wgt)
    for bia in biases:
        bb = bia.reshape(1, -1)
        in_specs.append(pl.BlockSpec(bb.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bb)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(bsz, n // tn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tn, 1), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, 1), x.dtype),
        interpret=_interpret(),
    )(*operands)


def _bwd_call(x, g, weights, biases):
    bsz, n, c_in = x.shape
    tn = _tile_n(n, cap=512)
    in_specs = [
        pl.BlockSpec((1, tn, c_in), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tn, 1), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, g]
    for wgt in weights:
        in_specs.append(pl.BlockSpec(wgt.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(wgt)
    bias_specs, bias_ops = [], []
    for bia in biases:
        bb = bia.reshape(1, -1)
        bias_specs.append(pl.BlockSpec(bb.shape, lambda i, j: (0, 0),
                                       memory_space=pltpu.VMEM))
        bias_ops.append(bb)
    out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype)]
    out_specs = [pl.BlockSpec((1, tn, c_in), lambda i, j: (i, j, 0),
                              memory_space=pltpu.VMEM)]
    for wgt in weights:
        out_shape.append(jax.ShapeDtypeStruct(wgt.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(wgt.shape, lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM))
    for bia in biases:
        out_shape.append(jax.ShapeDtypeStruct((1, bia.shape[-1]),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec((1, bia.shape[-1]),
                                      lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        _bwd_kernel,
        grid=(bsz, n // tn),
        in_specs=in_specs + bias_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands, *bias_ops)
    dx = outs[0]
    dws = list(outs[1:1 + _N_LAYERS])
    dbs = [o.reshape(-1) for o in outs[1 + _N_LAYERS:]]
    return dx, dws, dbs


@jax.custom_vjp
def disc_forward(x: jnp.ndarray, weights: Tuple[jnp.ndarray, ...],
                 biases: Tuple[jnp.ndarray, ...]) -> jnp.ndarray:
    """``probs [B,N,k] -> logits [B,N,1]`` through the fused stack."""
    return _fwd_call(x, weights, biases)


def _df_fwd(x, weights, biases):
    return _fwd_call(x, weights, biases), (x, weights, biases)


def _df_bwd(res, g):
    x, weights, biases = res
    dx, dws, dbs = _bwd_call(x, g, weights, biases)
    return dx, tuple(dws), tuple(dbs)


disc_forward.defvjp(_df_fwd, _df_bwd)


def apply(params, prob_map: jnp.ndarray) -> jnp.ndarray:
    """Discriminator params dict -> fused differentiable forward."""
    names = [f"conv{i}" for i in range(1, 6)]
    weights = tuple(params[n]["w"] for n in names)
    biases = tuple(params[n]["b"] for n in names)
    return disc_forward(prob_map, weights, biases)


# ---------------------------------------------------------------------------
# Frozen-D variant: backward w.r.t. the INPUT only (G-step usage).
# ---------------------------------------------------------------------------

def _bwd_dx_kernel(x_ref, g_ref, *refs):
    """Like ``_bwd_kernel`` but only the dh chain — no dW/db accumulation.
    Used when D is frozen (the generator step differentiates through D's
    input only)."""
    w = [refs[i] for i in range(_N_LAYERS)]
    b = [refs[_N_LAYERS + i] for i in range(_N_LAYERS)]
    dx_ref = refs[2 * _N_LAYERS]

    hs = [x_ref[0]]
    for i in range(_N_LAYERS - 1):
        z = _mxu_dot(hs[-1], w[i][...]) + b[i][...]
        hs.append(_leaky(z))
    dh = g_ref[0].astype(jnp.float32)
    for i in reversed(range(_N_LAYERS)):
        dz = dh if i == _N_LAYERS - 1 else dh * _dleaky_from_h(hs[i + 1])
        dh = _mxu_dot(dz, w[i][...].T)
    dx_ref[...] = dh.astype(dx_ref.dtype)[None]


def _bwd_dx_call(x, g, weights, biases):
    bsz, n, c_in = x.shape
    tn = _tile_n(n, cap=512)
    in_specs = [
        pl.BlockSpec((1, tn, c_in), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tn, 1), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, g]
    for wgt in weights:
        in_specs.append(pl.BlockSpec(wgt.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(wgt)
    for bia in biases:
        bb = bia.reshape(1, -1)
        in_specs.append(pl.BlockSpec(bb.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bb)
    return pl.pallas_call(
        _bwd_dx_kernel,
        grid=(bsz, n // tn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tn, c_in), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=_interpret(),
    )(*operands)


@jax.custom_vjp
def disc_forward_frozen(x: jnp.ndarray, weights, biases) -> jnp.ndarray:
    """Fused D forward whose backward flows ONLY into the input.

    For the generator step, where D's parameters are frozen: the weight/
    bias cotangents are returned as zeros (asserted unused by the
    caller). Never use where D's own gradients are needed.
    """
    return _fwd_call(x, weights, biases)


def _dff_fwd(x, weights, biases):
    return _fwd_call(x, weights, biases), (x, weights, biases)


def _dff_bwd(res, g):
    x, weights, biases = res
    dx = _bwd_dx_call(x, g, weights, biases)
    zeros_w = tuple(jnp.zeros_like(w) for w in weights)
    zeros_b = tuple(jnp.zeros_like(b) for b in biases)
    return dx, zeros_w, zeros_b


disc_forward_frozen.defvjp(_dff_fwd, _dff_bwd)


def apply_frozen(params, prob_map: jnp.ndarray) -> jnp.ndarray:
    names = [f"conv{i}" for i in range(1, 6)]
    return disc_forward_frozen(prob_map,
                               tuple(params[n]["w"] for n in names),
                               tuple(params[n]["b"] for n in names))


# ---------------------------------------------------------------------------
# Detached-input (dW-only) backward: the D step's inputs carry no gradient
# (fake maps are stop_gradient'ed, real maps are one-hot data), so the dx
# chain — one third of the backward FLOPs plus a [B,N,k] HBM write — is
# pure waste there. XLA cannot DCE it out of an opaque custom call, so
# these kernels simply never compute it (profiled 1.47 + 0.74 ms/step of
# wasted dx at bench shapes before this existed).
# ---------------------------------------------------------------------------

def _bwd_dw_kernel(x_ref, g_ref, *refs):
    """Like ``_bwd_kernel`` but dW/db only — no dx write, and the i=0
    ``dz @ W^T`` hop is skipped entirely."""
    w = [refs[i] for i in range(_N_LAYERS)]
    b = [refs[_N_LAYERS + i] for i in range(_N_LAYERS)]
    dw_refs = [refs[2 * _N_LAYERS + i] for i in range(_N_LAYERS)]
    db_refs = [refs[3 * _N_LAYERS + i] for i in range(_N_LAYERS)]

    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        for r in dw_refs + db_refs:
            r[...] = jnp.zeros_like(r)

    hs = [x_ref[0]]
    for i in range(_N_LAYERS - 1):
        z = _mxu_dot(hs[-1], w[i][...]) + b[i][...]
        hs.append(_leaky(z))
    dh = g_ref[0].astype(jnp.float32)
    for i in reversed(range(_N_LAYERS)):
        dz = dh if i == _N_LAYERS - 1 else dh * _dleaky_from_h(hs[i + 1])
        dw_refs[i][...] += _mxu_dot_t(hs[i], dz).astype(dw_refs[i].dtype)
        db_refs[i][...] += jnp.sum(dz, axis=0, keepdims=True
                                   ).astype(db_refs[i].dtype)
        if i > 0:  # no dx: the chain stops after the first hidden layer
            dh = _mxu_dot(dz, w[i][...].T)


def _bwd_dw_call(x, g, weights, biases):
    bsz, n, c_in = x.shape
    tn = _tile_n(n, cap=512)
    in_specs = [
        pl.BlockSpec((1, tn, c_in), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, tn, 1), lambda i, j: (i, j, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, g]
    for wgt in weights:
        in_specs.append(pl.BlockSpec(wgt.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(wgt)
    for bia in biases:
        bb = bia.reshape(1, -1)
        in_specs.append(pl.BlockSpec(bb.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bb)
    out_shape, out_specs = [], []
    for wgt in weights:
        out_shape.append(jax.ShapeDtypeStruct(wgt.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(wgt.shape, lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM))
    for bia in biases:
        out_shape.append(jax.ShapeDtypeStruct((1, bia.shape[-1]),
                                              jnp.float32))
        out_specs.append(pl.BlockSpec((1, bia.shape[-1]),
                                      lambda i, j: (0, 0),
                                      memory_space=pltpu.VMEM))
    outs = pl.pallas_call(
        _bwd_dw_kernel,
        grid=(bsz, n // tn),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        interpret=_interpret(),
    )(*operands)
    dws = list(outs[:_N_LAYERS])
    dbs = [o.reshape(-1) for o in outs[_N_LAYERS:]]
    return dws, dbs


@jax.custom_vjp
def disc_forward_detached(x, weights, biases):
    """Fused D forward for a DETACHED input: the backward computes dW/db
    only and returns a zero input-cotangent. Callers must guarantee the
    input carries no gradient (one-hot ground truth, stop_gradient'ed
    predictions) — the D-step usage."""
    return _fwd_call(x, weights, biases)


def _dfd_fwd(x, weights, biases):
    return _fwd_call(x, weights, biases), (x, weights, biases)


def _dfd_bwd(res, g):
    x, weights, biases = res
    dws, dbs = _bwd_dw_call(x, g, weights, biases)
    return jnp.zeros_like(x), tuple(dws), tuple(dbs)


disc_forward_detached.defvjp(_dfd_fwd, _dfd_bwd)


def apply_detached(params, prob_map: jnp.ndarray) -> jnp.ndarray:
    names = [f"conv{i}" for i in range(1, 6)]
    return disc_forward_detached(prob_map,
                                 tuple(params[n]["w"] for n in names),
                                 tuple(params[n]["b"] for n in names))


# ---------------------------------------------------------------------------
# Known-logits variant: skip the redundant fake-forward in the D step.
# ---------------------------------------------------------------------------

@jax.custom_vjp
def disc_with_known_logits(x, logits, weights, biases):
    """Returns ``logits`` (already computed by the G step on the SAME
    inputs and the SAME pre-update D parameters) while installing the
    fused dW/db backward from ``x``. The D step thereby skips the
    redundant fake forward; its backward recomputes activations from
    ``x``. The input must be DETACHED (the D-step contract): its
    cotangent is returned as zeros, and the dx chain is never computed
    (see the dW-only kernel above)."""
    del x, weights, biases
    return logits


def _dkl_fwd(x, logits, weights, biases):
    return logits, (x, weights, biases)


def _dkl_bwd(res, g):
    x, weights, biases = res
    dws, dbs = _bwd_dw_call(x, g, weights, biases)
    return jnp.zeros_like(x), jnp.zeros_like(g), tuple(dws), tuple(dbs)


disc_with_known_logits.defvjp(_dkl_fwd, _dkl_bwd)


def apply_with_known_logits(params, prob_map, logits):
    names = [f"conv{i}" for i in range(1, 6)]
    return disc_with_known_logits(
        prob_map, logits,
        tuple(params[n]["w"] for n in names),
        tuple(params[n]["b"] for n in names))
