"""Fused TRAINING T-Net fc head: fc1+BN1+ReLU -> fc2+BN2+ReLU -> fc3.

The T-Net heads (``upstream:pointnet/model.py::STN3d/STNkd`` fc 1024->512
->256->k*k, SURVEY.md §2.3) run on ``[B, 1024]`` pooled features — at the
reference batch 32 they are MXU-underutilized and latency-bound: XLA
schedules ~15 tiny ops (3 matmuls + 2 batch-axis BN stat reductions +
normalize/ReLU chains) per head, and the adversarial G step runs FOUR
fc-head fwd+bwd chains per update (STN3d + STNkd, labeled + unlabeled
streams). Everything — all three weight matrices, the [B, C] activations,
and both batch-BN statistics — fits in VMEM at once, so this kernel family
runs each chain as ONE forward and ONE backward ``pallas_call`` with
``grid=(1,)``:

* **F**: z1 = h@w1+b1; BN1 batch stats over the batch axis in-register;
  h1 = relu(bn1(z1)); same for layer 2; out = h2@w3+b3. Stashes z1/z2
  (tiny: [B,512]+[B,256]) for backward.
* **B**: layer 3 (a plain affine) backprops in XLA — its dw3/dh2 matmuls
  are standard MXU shapes, and keeping w3+dw3 (4 MB each at k=64) out of
  the kernel fits the scoped 16 MB VMEM budget; the Pallas kernel then
  does both BN layers' backward (ReLU', batch-axis stat reductions, dw_i,
  dh_i) in one pass from the z stashes.

BN math matches ``core.batch_norm`` exactly: one-pass moments taken
about the RUNNING mean (``rm1``/``rm2``; var(x) = E[(x-c)^2] - E[x-c]^2
for any constant c) so the shifted-activation cancellation guard applies
to this path too — z1 = h@w1+b1 over max-pooled ReLU features has a
decidedly nonzero mean, so the raw E[x^2]-E[x]^2 form would lose
precision as activation means drift; with rm=0 (init) the centered form
is bitwise the raw form. Biased variance normalizes, eps=1e-5. The
caller applies the torch running-stat EMA from the returned
(mu, var_biased) pairs and adds the flattened-identity bias of fc3
outside. The stat outputs are NON-DIFFERENTIABLE auxiliaries: the
custom-VJP backward consumes only the primary output's cotangent and
drops the stats' (they feed the stop-gradient EMA — ``_ema_stats``
stop-gradients them at the only call site; any future consumer that
wants gradients through batch statistics must NOT use this kernel).
Parity: ``tests/test_kernels.py::test_fc_head_train_*`` vs. the
layerwise jnp composition.
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


def _mxu_dot_nt(a, b):
    """``a @ b.T`` as a dot_general contracting the LAST axis of both
    operands — the MXU's native "nt" gemm. Writing ``a @ b.T`` instead
    makes Mosaic materialize the transposed copy on the kernel's VMEM
    stack (w3 [256, 4096] -> +4 MB, which overflowed the 16 MB scoped
    limit for the k=64 backward)."""
    dn = (((1,), (1,)), ((), ()))
    return jax.lax.dot_general(a, b, dn,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _bn_fwd(z, c):
    """One-pass batch-axis moments about the constant ``c`` (the running
    mean, [1, C]) + normalizer — matches ``core.batch_norm``'s centered
    form exactly; bitwise the raw E[x^2]-E[x]^2 form when ``c == 0``."""
    b = z.shape[0]
    zc = z - c
    mu_c = jnp.sum(zc, axis=0, keepdims=True) / b
    m2 = jnp.sum(zc * zc, axis=0, keepdims=True) / b
    var = jnp.maximum(m2 - mu_c * mu_c, 0.0)
    inv = jax.lax.rsqrt(var + BN_EPS)
    return mu_c + c, var, inv


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------

def _fwd_kernel(h_ref, w1_ref, b1_ref, g1_ref, be1_ref,
                w2_ref, b2_ref, g2_ref, be2_ref, w3_ref, b3_ref,
                rm1_ref, rm2_ref,
                out_ref, z1_ref, z2_ref,
                mu1_ref, var1_ref, inv1_ref, mu2_ref, var2_ref, inv2_ref):
    h = h_ref[...].astype(jnp.float32)
    z1 = _mxu_dot(h, w1_ref[...]) + b1_ref[...]
    mu1, var1, inv1 = _bn_fwd(z1, rm1_ref[...])
    h1 = jnp.maximum((z1 - mu1) * (inv1 * g1_ref[...]) + be1_ref[...], 0.0)
    z2 = _mxu_dot(h1, w2_ref[...]) + b2_ref[...]
    mu2, var2, inv2 = _bn_fwd(z2, rm2_ref[...])
    h2 = jnp.maximum((z2 - mu2) * (inv2 * g2_ref[...]) + be2_ref[...], 0.0)
    out = _mxu_dot(h2, w3_ref[...]) + b3_ref[...]
    out_ref[...] = out.astype(out_ref.dtype)
    z1_ref[...] = z1.astype(z1_ref.dtype)
    z2_ref[...] = z2.astype(z2_ref.dtype)
    mu1_ref[...], var1_ref[...], inv1_ref[...] = mu1, var1, inv1
    mu2_ref[...], var2_ref[...], inv2_ref[...] = mu2, var2, inv2


def _fwd_call(h, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, rm1, rm2):
    bsz = h.shape[0]
    c1, c2, c3 = w1.shape[1], w2.shape[1], w3.shape[1]
    full = lambda shape: pl.BlockSpec(shape, lambda: (0, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        _fwd_kernel,
        grid=(),
        in_specs=[full(h.shape), full(w1.shape), full((1, c1)),
                  full((1, c1)), full((1, c1)), full(w2.shape),
                  full((1, c2)), full((1, c2)), full((1, c2)),
                  full(w3.shape), full((1, c3)),
                  full((1, c1)), full((1, c2))],
        out_specs=tuple(full(s) for s in (
            (bsz, c3), (bsz, c1), (bsz, c2),
            (1, c1), (1, c1), (1, c1), (1, c2), (1, c2), (1, c2))),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, c3), jnp.float32),
            jax.ShapeDtypeStruct((bsz, c1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, c2), jnp.float32),
        ),
        interpret=_interpret(),
    )(h, w1, _row(b1), _row(g1), _row(be1), w2, _row(b2), _row(g2),
      _row(be2), w3, _row(b3), _row(rm1), _row(rm2))
    return outs


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------

def _bwd_kernel(dh2_ref, h_ref, z1_ref, z2_ref,
                w1_ref, w2_ref, g1_ref, be1_ref, g2_ref, be2_ref,
                mu1_ref, inv1_ref, mu2_ref, inv2_ref,
                dh_ref, dw1_ref, db1_ref, dg1_ref, dbe1_ref,
                dw2_ref, db2_ref, dg2_ref, dbe2_ref):
    """BN-layer backward (layers 2 then 1), given ``dh2`` = the cotangent
    into h2. Layer 3's backward (a plain affine: dw3/db3/dh2) runs in XLA
    outside — keeping ``w3``/``dw3`` (k=64: 4 MB each) out of this kernel
    is what fits it in the 16 MB scoped-VMEM budget, and those two big
    MXU-friendly matmuls are exactly what XLA schedules well anyway."""
    dh2 = dh2_ref[...].astype(jnp.float32)
    h = h_ref[...].astype(jnp.float32)
    z1 = z1_ref[...].astype(jnp.float32)
    z2 = z2_ref[...].astype(jnp.float32)
    b = h.shape[0]

    zhat2 = (z2 - mu2_ref[...]) * inv2_ref[...]
    h2 = jnp.maximum(zhat2 * g2_ref[...] + be2_ref[...], 0.0)
    zhat1 = (z1 - mu1_ref[...]) * inv1_ref[...]
    h1 = jnp.maximum(zhat1 * g1_ref[...] + be1_ref[...], 0.0)

    # Layer 2: ReLU' then BN backward over the batch axis.
    dy2 = dh2 * (h2 > 0).astype(jnp.float32)
    t1 = jnp.sum(dy2, axis=0, keepdims=True)
    t2 = jnp.sum(dy2 * zhat2, axis=0, keepdims=True)
    dg2_ref[...], dbe2_ref[...] = t2, t1
    dz2 = (g2_ref[...] * inv2_ref[...]) * (dy2 - t1 / b - zhat2 * (t2 / b))
    dw2_ref[...] = _mxu_dot_t(h1, dz2).astype(dw2_ref.dtype)
    db2_ref[...] = jnp.sum(dz2, axis=0, keepdims=True)
    dh1 = _mxu_dot_nt(dz2, w2_ref[...])

    # Layer 1.
    dy1 = dh1 * (h1 > 0).astype(jnp.float32)
    t1 = jnp.sum(dy1, axis=0, keepdims=True)
    t2 = jnp.sum(dy1 * zhat1, axis=0, keepdims=True)
    dg1_ref[...], dbe1_ref[...] = t2, t1
    dz1 = (g1_ref[...] * inv1_ref[...]) * (dy1 - t1 / b - zhat1 * (t2 / b))
    dw1_ref[...] = _mxu_dot_t(h, dz1).astype(dw1_ref.dtype)
    db1_ref[...] = jnp.sum(dz1, axis=0, keepdims=True)
    dh_ref[...] = _mxu_dot_nt(dz1, w1_ref[...]).astype(dh_ref.dtype)


def _bwd_call(dh2, h, z1, z2, w1, w2, g1, be1, g2, be2,
              mu1, inv1, mu2, inv2):
    bsz, c0 = h.shape
    c1, c2 = w1.shape[1], w2.shape[1]
    full = lambda shape: pl.BlockSpec(shape, lambda: (0, 0),  # noqa: E731
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _bwd_kernel,
        grid=(),
        in_specs=[full(dh2.shape), full(h.shape), full(z1.shape),
                  full(z2.shape), full(w1.shape), full(w2.shape),
                  full((1, c1)), full((1, c1)),
                  full((1, c2)), full((1, c2)), full((1, c1)),
                  full((1, c1)), full((1, c2)), full((1, c2))],
        out_specs=tuple(full(s) for s in (
            (bsz, c0), w1.shape, (1, c1), (1, c1), (1, c1),
            w2.shape, (1, c2), (1, c2), (1, c2))),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, c0), jnp.float32),
            jax.ShapeDtypeStruct(w1.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
            jax.ShapeDtypeStruct(w2.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, c2), jnp.float32),
            jax.ShapeDtypeStruct((1, c2), jnp.float32),
        ),
        interpret=_interpret(),
    )(dh2, h, z1, z2, w1, w2, _row(g1), _row(be1), _row(g2),
      _row(be2), mu1, inv1, mu2, inv2)


# ---------------------------------------------------------------------------
# Custom-VJP wrapper
# ---------------------------------------------------------------------------

def fc_head_train(h, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3,
                  rm1=None, rm2=None):
    """Fused fc1+BN1+ReLU -> fc2+BN2+ReLU -> fc3 on ``h: [B, C]``.

    ``rm1``/``rm2`` are the BN running means ([c1]/[c2]; default zeros):
    constants the one-pass batch moments are centered about — the same
    cancellation guard as ``core.batch_norm`` (identical results in real
    arithmetic for any value; well-conditioned when they track the
    activation means). Returns ``(out [B, c3], mu1, var1_biased, mu2,
    var2_biased)``; the batch statistics are auxiliary STOP-GRADIENT
    outputs for the running-stat EMA — the backward drops their
    cotangents (see module docstring). The caller adds fc3's identity
    bias.
    """
    if rm1 is None:
        rm1 = jnp.zeros((w1.shape[1],), jnp.float32)
    if rm2 is None:
        rm2 = jnp.zeros((w2.shape[1],), jnp.float32)
    return _fc_head(h, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3,
                    jax.lax.stop_gradient(rm1), jax.lax.stop_gradient(rm2))


def _primal(h, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, rm1, rm2):
    (out, z1, z2, mu1, var1, inv1, mu2, var2, inv2) = _fwd_call(
        h, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, rm1, rm2)
    res = (h, z1, z2, w1, w2, w3, g1, be1, g2, be2, mu1, inv1, mu2, inv2)
    return (out, mu1.reshape(-1), var1.reshape(-1),
            mu2.reshape(-1), var2.reshape(-1)), res


@jax.custom_vjp
def _fc_head(h, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, rm1, rm2):
    out, _ = _primal(h, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, rm1, rm2)
    return out


def _fc_head_fwd(*args):
    return _primal(*args)


def _fc_head_bwd(res, cts):
    (h, z1, z2, w1, w2, w3, g1, be1, g2, be2, mu1, inv1, mu2, inv2) = res
    # Only the primary output's cotangent is consumed; the four batch-stat
    # outputs are stop-gradient auxiliaries (their cotangents are
    # symbolically zero at every sanctioned call site — _ema_stats
    # stop-gradients them — and are intentionally dropped here).
    dout = cts[0].astype(jnp.float32)
    # Layer 3 backward in XLA (recompute tiny h2 from the z2 stash): the
    # dw3/dh2 matmuls are standard MXU shapes, and keeping w3/dw3 out of
    # the Pallas kernel fits it in scoped VMEM at k=64 (see _bwd_kernel).
    hi = jax.lax.Precision.HIGHEST
    zhat2 = (z2 - mu2) * inv2
    h2 = jnp.maximum(zhat2 * _row(g2) + _row(be2), 0.0)
    dw3 = jax.lax.dot_general(h2, dout, (((0,), (0,)), ((), ())),
                              precision=hi)
    db3 = jnp.sum(dout, axis=0)
    dh2 = jax.lax.dot_general(dout, w3, (((1,), (1,)), ((), ())),
                              precision=hi)
    (dh, dw1, db1, dg1, dbe1, dw2, db2, dg2, dbe2) = _bwd_call(
        dh2, h, z1, z2, w1, w2, g1, be1, g2, be2, mu1, inv1, mu2, inv2)
    flat = lambda a: a.reshape(-1)  # noqa: E731
    return (dh.astype(h.dtype), dw1.astype(w1.dtype), flat(db1), flat(dg1),
            flat(dbe1), dw2.astype(w2.dtype), flat(db2), flat(dg2),
            flat(dbe2), dw3.astype(w3.dtype), db3,
            jnp.zeros((w1.shape[1],), jnp.float32),
            jnp.zeros((w2.shape[1],), jnp.float32))


_fc_head.defvjp(_fc_head_fwd, _fc_head_bwd)
