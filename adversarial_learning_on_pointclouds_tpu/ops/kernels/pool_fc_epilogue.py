"""Pool-epilogue + fc1 + BN1 + ReLU fusion (VERDICT round-2 next #2a).

The fused training trunks (``trunk_train.py``) exit with the pooled
pre-affine extrema ``mx/mn [B, 1024]``; XLA then computes the pooled
feature ``g = where(s3c>=0, mx, mn) * s3c + t3``, the post-pool ReLU,
the T-Net head's first layer ``z1 = relu(g) @ w1 + b1``, its batch-axis
BN statistics, the normalize, and the next ReLU as ~10 small ops. This
kernel runs that whole region as ONE ``grid=()`` pallas_call
(everything fits VMEM: w1 is 2 MB, activations 128 KB).

The custom VJP is the standard batch-BN backward (ReLU' -> the
``dy - t1/B - zhat*t2/B`` stat terms -> matmul backward -> pool-affine
backward), computed in XLA — those are [B, 512]-sized elementwise ops
plus two MXU-friendly matmuls, exactly what XLA schedules well (same
split as ``fc_head_train``'s layer-3 backward). Gradients DO flow
through the batch statistics (unlike the returned ``mu/var`` EMA
auxiliaries, which are stop-gradient as everywhere else).

BN moments are centered about the running mean ``rm1`` exactly like
``fc_head_train._bn_fwd`` / ``core.batch_norm``. Isolated fwd+bwd at
B=32, 1024->512 on v5e: see BASELINE.md round-3 rows.
"""

from __future__ import annotations

import functools

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


def _make_fwd_kernel(groups):
    def _fwd_kernel(mx_ref, mn_ref, s3c_ref, t3_ref, w1_ref, b1_ref,
                    g1_ref, be1_ref, rm1_ref,
                    h1_ref, h_ref, z1_ref, mu_ref, var_ref, inv_ref):
        s3c = s3c_ref[...]
        sel = jnp.where(s3c >= 0.0, mx_ref[...], mn_ref[...])
        g = sel * s3c + t3_ref[...]
        h = jnp.maximum(g, 0.0)                        # post-pool ReLU
        z1 = _mxu_dot(h, w1_ref[...]) + b1_ref[...]
        rm1 = rm1_ref[...]
        zc = z1 - rm1
        b = z1.shape[0] // groups
        # Per-group batch statistics (static row-block slices; groups=1
        # is bitwise the single-stream kernel). See batch_norm_grouped.
        h1s, mus, vars_, invs = [], [], [], []
        for i in range(groups):
            zci = zc[i * b:(i + 1) * b]
            mu_c = jnp.sum(zci, axis=0, keepdims=True) / b
            m2 = jnp.sum(zci * zci, axis=0, keepdims=True) / b
            var = jnp.maximum(m2 - mu_c * mu_c, 0.0)
            inv = jax.lax.rsqrt(var + BN_EPS)
            mu = mu_c + rm1
            zhat = (z1[i * b:(i + 1) * b] - mu) * inv
            h1s.append(jnp.maximum(zhat * g1_ref[...] + be1_ref[...], 0.0))
            mus.append(mu)
            vars_.append(var)
            invs.append(inv)
        cat = lambda xs: xs[0] if groups == 1 else jnp.concatenate(  # noqa: E731
            xs, axis=0)
        h1_ref[...] = cat(h1s)
        h_ref[...] = h
        z1_ref[...] = z1
        mu_ref[...] = cat(mus)
        var_ref[...] = cat(vars_)
        inv_ref[...] = cat(invs)
    return _fwd_kernel


def _fwd_call(mx, mn, s3c, t3, w1, b1, g1, be1, rm1, groups):
    bsz, c3 = mx.shape
    c1 = w1.shape[1]
    full = lambda shape: pl.BlockSpec(shape, lambda: (0, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _make_fwd_kernel(groups),
        grid=(),
        in_specs=[full(mx.shape), full(mn.shape), full((1, c3)),
                  full((1, c3)), full(w1.shape), full((1, c1)),
                  full((1, c1)), full((1, c1)), full((1, c1))],
        out_specs=tuple(full(s) for s in (
            (bsz, c1), (bsz, c3), (bsz, c1), (groups, c1), (groups, c1),
            (groups, c1))),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, c1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, c3), jnp.float32),
            jax.ShapeDtypeStruct((bsz, c1), jnp.float32),
            jax.ShapeDtypeStruct((groups, c1), jnp.float32),
            jax.ShapeDtypeStruct((groups, c1), jnp.float32),
            jax.ShapeDtypeStruct((groups, c1), jnp.float32),
        ),
        interpret=_interpret(),
    )(mx, mn, _row(s3c), _row(t3), w1, _row(b1), _row(g1), _row(be1),
      _row(rm1))


def pool_fc_epilogue(mx, mn, s3c, t3, w1, b1, g1, be1, rm1=None,
                     groups=1):
    """``(mx, mn) [B,c3]`` trunk extrema + BN3 fold scalars -> pooled
    feature -> ReLU -> fc1 -> batch-BN (scale ``g1``, shift ``be1``) ->
    ReLU, fused.

    Returns ``(h1 [B,c1], h [B,c3], mu1, var1_biased)``: ``h1`` the
    post-BN ReLU feature (fully differentiable, batch-stat terms
    included), ``h`` the post-pool ReLU feature for reuse, and the batch
    statistics as STOP-GRADIENT auxiliaries for the running-stat EMA.

    ``groups>1`` computes the BN statistics per contiguous row-block of
    ``B//groups`` rows (``core.batch_norm_grouped`` semantics — the
    ``--paired_heads`` cross-stream batch with per-stream statistics);
    ``mu1``/``var1`` then have shape ``[groups, c1]``.
    """
    if rm1 is None:
        rm1 = jnp.zeros((w1.shape[1],), jnp.float32)
    h1, h, mu, var = _epilogue(groups, mx, mn, s3c, t3, w1, b1, g1, be1,
                               jax.lax.stop_gradient(rm1))
    if groups == 1:
        mu, var = mu.reshape(-1), var.reshape(-1)
    return h1, h, mu, var


def relu_fc_bn_relu(g, w1, b1, g1, be1, rm1=None, groups=1):
    """``relu(bn(relu(g) @ w1 + b1))`` via the same fused kernel: feed
    ``g`` as both extrema with an identity fold (``s3c=1, t3=0`` makes
    the in-kernel pool affine select ``mx`` verbatim), so the trunk's
    existing pooled output composes with the epilogue kernel without
    changing ``trunk_train``'s VJP boundary. The pooled input is already
    non-negative, so the in-kernel ReLU is a no-op (relu∘relu == relu;
    gradient routing identical). Returns ``(h1, mu1, var1_biased)``."""
    c3 = g.shape[-1]
    ones = jnp.ones((c3,), jnp.float32)
    zeros = jnp.zeros((c3,), jnp.float32)
    h1, _, mu, var = pool_fc_epilogue(g, g, ones, zeros, w1, b1, g1, be1,
                                      rm1, groups=groups)
    return h1, mu, var


def _primal(groups, mx, mn, s3c, t3, w1, b1, g1, be1, rm1):
    h1, h, z1, mu, var, inv = _fwd_call(mx, mn, s3c, t3, w1, b1, g1, be1,
                                        rm1, groups)
    res = (mx, mn, s3c, h, z1, w1, g1, be1, mu, inv)
    return (h1, h, mu, var), res


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _epilogue(groups, mx, mn, s3c, t3, w1, b1, g1, be1, rm1):
    out, _ = _primal(groups, mx, mn, s3c, t3, w1, b1, g1, be1, rm1)
    return out


def _epilogue_fwd(groups, *args):
    return _primal(groups, *args)


def _epilogue_bwd(groups, res, cts):
    (mx, mn, s3c, h, z1, w1, g1, be1, mu, inv) = res
    # h1's and h's cotangents are consumed; the mu/var EMA auxiliaries
    # are stop-gradient (their cotangents are symbolically zero at every
    # sanctioned call site — _ema_stats stop-gradients them).
    dh1 = cts[0].astype(jnp.float32)
    dh_extra = cts[1].astype(jnp.float32)
    gb, c1 = z1.shape
    b = gb // groups
    hi = jax.lax.Precision.HIGHEST

    # Batch-BN backward (gradients THROUGH the batch statistics), per
    # group — [G, b, c1] reshapes; groups=1 is the plain batch backward.
    z1g = z1.reshape(groups, b, c1)
    mug = mu.reshape(groups, 1, c1)
    invg = inv.reshape(groups, 1, c1)
    zhat = (z1g - mug) * invg
    g1r = g1.reshape(1, 1, c1)
    h1 = jnp.maximum(zhat * g1r + be1.reshape(1, 1, c1), 0.0)
    dy = dh1.reshape(groups, b, c1) * (h1 > 0.0).astype(jnp.float32)
    t1 = jnp.sum(dy, axis=1, keepdims=True)
    t2 = jnp.sum(dy * zhat, axis=1, keepdims=True)
    dg1 = jnp.sum(t2, axis=(0, 1))
    dbe1 = jnp.sum(t1, axis=(0, 1))
    dz1 = ((g1r * invg) * (dy - t1 / b - zhat * (t2 / b))).reshape(gb, c1)

    dw1 = _mxu_dot_t(h, dz1)
    db1 = jnp.sum(dz1, axis=0)
    dh = jax.lax.dot_general(dz1, w1, (((1,), (1,)), ((), ())),
                             precision=hi) + dh_extra

    # Pool-affine backward.
    dg = dh * (h > 0.0).astype(jnp.float32)
    pos = s3c >= 0.0
    sel = jnp.where(pos, mx, mn)
    dsel = dg * s3c
    dmx = jnp.where(pos, dsel, 0.0)
    dmn = jnp.where(pos, 0.0, dsel)
    ds3c = jnp.sum(dg * sel, axis=0)
    dt3 = jnp.sum(dg, axis=0)
    return (dmx, dmn, ds3c, dt3, dw1.astype(w1.dtype), db1, dg1, dbe1,
            jnp.zeros((w1.shape[1],), jnp.float32))


_epilogue.defvjp(_epilogue_fwd, _epilogue_bwd)
