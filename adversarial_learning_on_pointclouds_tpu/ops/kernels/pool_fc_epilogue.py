"""Pool-epilogue + fc1 fusion (VERDICT round-2 next #2a).

The fused training trunks (``trunk_train.py``) exit with the pooled
pre-affine extrema ``mx/mn [B, 1024]``; XLA then computes the pooled
feature ``g = where(s3c>=0, mx, mn) * s3c + t3``, the post-pool ReLU, and
the T-Net head's first matmul ``z1 = relu(g) @ w1 + b1`` plus BN1's
batch-axis statistics as ~6 small ops. This kernel runs that whole
epilogue as ONE ``grid=()`` pallas_call (everything fits VMEM: w1 is
2 MB, the activations 128 KB) with a hand-derived VJP, so the trunk exit
chains straight into the head with no XLA scheduling gaps.

Status: built for the measurement the round-2 verdict asked for. The
isolated timing on v5e (see BASELINE.md round-3 rows) decides whether it
wires into ``tnet._fc_head_apply``; its sibling full-head kernel
(``fc_head_train.py``) measured SLOWER than XLA's layerwise chain, so
this narrower fusion is measured before adoption, same discipline.

BN moments are centered about the running mean ``rm1`` exactly like
``fc_head_train._bn_fwd`` / ``core.batch_norm``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adversarial_learning_on_pointclouds_tpu.models.core import BN_EPS
from adversarial_learning_on_pointclouds_tpu.ops.kernels.shared_mlp import (
    _interpret, _mxu_dot, _mxu_dot_t,
)


def _row(a):
    return a.reshape(1, -1)


def _fwd_kernel(mx_ref, mn_ref, s3c_ref, t3_ref, w1_ref, b1_ref, rm1_ref,
                z1_ref, h_ref, mu_ref, var_ref, inv_ref):
    s3c = s3c_ref[...]
    sel = jnp.where(s3c >= 0.0, mx_ref[...], mn_ref[...])
    g = sel * s3c + t3_ref[...]
    h = jnp.maximum(g, 0.0)                        # post-pool ReLU
    z1 = _mxu_dot(h, w1_ref[...]) + b1_ref[...]
    b = z1.shape[0]
    zc = z1 - rm1_ref[...]
    mu_c = jnp.sum(zc, axis=0, keepdims=True) / b
    m2 = jnp.sum(zc * zc, axis=0, keepdims=True) / b
    var = jnp.maximum(m2 - mu_c * mu_c, 0.0)
    z1_ref[...] = z1
    h_ref[...] = h
    mu_ref[...] = mu_c + rm1_ref[...]
    var_ref[...] = var
    inv_ref[...] = jax.lax.rsqrt(var + BN_EPS)


def _fwd_call(mx, mn, s3c, t3, w1, b1, rm1):
    bsz, c3 = mx.shape
    c1 = w1.shape[1]
    full = lambda shape: pl.BlockSpec(shape, lambda: (0, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fwd_kernel,
        grid=(),
        in_specs=[full(mx.shape), full(mn.shape), full((1, c3)),
                  full((1, c3)), full(w1.shape), full((1, c1)),
                  full((1, c1))],
        out_specs=tuple(full(s) for s in (
            (bsz, c1), (bsz, c3), (1, c1), (1, c1), (1, c1))),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, c1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, c3), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
        ),
        interpret=_interpret(),
    )(mx, mn, _row(s3c), _row(t3), w1, _row(b1), _row(rm1))


def pool_fc_epilogue(mx, mn, s3c, t3, w1, b1, rm1=None):
    """``(mx, mn) [B,c3]`` trunk extrema + BN3 fold scalars -> pooled
    feature -> ReLU -> ``z1 = h @ w1 + b1`` with BN1 batch stats.

    Returns ``(z1 [B,c1], h [B,c3], mu1, var1_biased, inv1)``; ``h`` is
    the post-pool ReLU feature (callers reuse it instead of recomputing),
    the statistics are stop-gradient auxiliaries.
    """
    if rm1 is None:
        rm1 = jnp.zeros((w1.shape[1],), jnp.float32)
    return _epilogue(mx, mn, s3c, t3, w1, b1,
                     jax.lax.stop_gradient(rm1))


def _primal(mx, mn, s3c, t3, w1, b1, rm1):
    z1, h, mu, var, inv = _fwd_call(mx, mn, s3c, t3, w1, b1, rm1)
    res = (mx, mn, s3c, h, w1)
    return (z1, h, mu.reshape(-1), var.reshape(-1), inv.reshape(-1)), res


@jax.custom_vjp
def _epilogue(mx, mn, s3c, t3, w1, b1, rm1):
    out, _ = _primal(mx, mn, s3c, t3, w1, b1, rm1)
    return out


def _epilogue_fwd(*args):
    return _primal(*args)


def _epilogue_bwd(res, cts):
    (mx, mn, s3c, h, w1) = res
    # Only z1's and h's cotangents are consumed; the stats are
    # stop-gradient auxiliaries (same contract as fc_head_train).
    dz1 = cts[0].astype(jnp.float32)
    dh_extra = cts[1].astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    dw1 = _mxu_dot_t(h, dz1)
    db1 = jnp.sum(dz1, axis=0)
    dh = jax.lax.dot_general(dz1, w1, (((1,), (1,)), ((), ())),
                             precision=hi) + dh_extra
    dg = dh * (h > 0.0).astype(jnp.float32)
    pos = s3c >= 0.0
    sel = jnp.where(pos, mx, mn)
    dsel = dg * s3c
    dmx = jnp.where(pos, dsel, 0.0)
    dmn = jnp.where(pos, 0.0, dsel)
    ds3c = jnp.sum(dg * sel, axis=0)
    dt3 = jnp.sum(dg, axis=0)
    return (dmx, dmn, ds3c, dt3, dw1.astype(w1.dtype), db1,
            jnp.zeros((w1.shape[1],), jnp.float32))


_epilogue.defvjp(_epilogue_fwd, _epilogue_bwd)
