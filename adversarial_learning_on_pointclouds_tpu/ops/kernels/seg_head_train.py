"""Fused TRAINING segmentation head: 1088-split -> 512 -> 256 -> 128 -> 50.

Completes the no-big-tensors story for the training step
(``trunk_train.py`` covers the encoder trunk): the head's BN+ReLU chain
under XLA costs ~4 HBM passes per layer over ``[B,N,C]`` activations.
Here each forward pass stashes only the pre-BN ``z_i`` (bf16 under mixed
precision) while fusing the BN affine + ReLU of the previous layer into
the matmul read, and accumulating the next layer's BN statistics in the
same pass:

* **P1**: ``z1 = pf @ W1[:64] + (g @ W1[64:]) + b1`` (the 1088-d concat
  never exists) + BN1 stats.
* **P2/P3** (generic): ``z_{i+1} = relu(bn_i(z_i)) @ W + b`` + stats.
* **P4**: recompute ``h3``, ``z4 = h3 @ W4 + b4``, fused per-point
  ``log_softmax`` -> logp.

Backward mirrors it layer-by-layer: each pass recomputes the activations
it needs from the stashes, applies the BN backward (whose two reduction
terms were accumulated by the *previous* backward pass), accumulates
``dW/db`` across the sequential grid, and stashes ``dy_{i-1}``. The BN
reduction scalars for each layer are therefore one pass "behind" —
exactly the two-phase structure BN demands, with no extra passes.

Custom VJP over ``(pf, g, params...)``; batch stats returned as
auxiliary outputs for the running-stat EMA. Parity:
``tests/test_kernels.py::test_seg_head_train_*``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adversarial_learning_on_pointclouds_tpu.models.core import BN_EPS
from adversarial_learning_on_pointclouds_tpu.ops.kernels.shared_mlp import (
    _interpret, _mxu_dot, _mxu_dot_t, _tile_n,
)
from adversarial_learning_on_pointclouds_tpu.ops.kernels.trunk_train import (
    _stash_dtype,
)

_ROW = lambda a: a.reshape(1, -1)  # noqa: E731


def _vspec(shape, imap):
    return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)


def _const2(a):  # (1, C) operand broadcast to every grid step
    return _vspec(a.shape, lambda i, j: (0, 0))


# ---------------------------------------------------------------------------
# Forward passes
# ---------------------------------------------------------------------------

def _p1_kernel(pf_ref, grow_ref, w1a_ref, b1_ref, z_ref, sum_ref, ssq_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        ssq_ref[...] = jnp.zeros_like(ssq_ref)

    z = _mxu_dot(pf_ref[0], w1a_ref[...]) + grow_ref[0] + b1_ref[...]
    z_ref[...] = z.astype(z_ref.dtype)[None]
    sum_ref[...] += jnp.sum(z, axis=0, keepdims=True)
    ssq_ref[...] += jnp.sum(z * z, axis=0, keepdims=True)


def _p1_call(pf, g_row, w1a, b1):
    bsz, n, c_pf = pf.shape
    c1 = w1a.shape[1]
    tn = _tile_n(n, cap=512)
    z1, s, ss = pl.pallas_call(
        _p1_kernel,
        grid=(bsz, n // tn),
        in_specs=[
            _vspec((1, tn, c_pf), lambda i, j: (i, j, 0)),
            _vspec((1, 1, c1), lambda i, j: (i, 0, 0)),
            _vspec(w1a.shape, lambda i, j: (0, 0)),
            _const2(_ROW(b1)),
        ],
        out_specs=(
            _vspec((1, tn, c1), lambda i, j: (i, j, 0)),
            _vspec((1, c1), lambda i, j: (0, 0)),
            _vspec((1, c1), lambda i, j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n, c1), _stash_dtype()),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
        ),
        interpret=_interpret(),
    )(pf, g_row.reshape(bsz, 1, c1), w1a, _ROW(b1))
    return z1, s.reshape(c1), ss.reshape(c1)


def _pmid_kernel(z_ref, sc_ref, sh_ref, w_ref, b_ref,
                 zo_ref, sum_ref, ssq_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        sum_ref[...] = jnp.zeros_like(sum_ref)
        ssq_ref[...] = jnp.zeros_like(ssq_ref)

    h = jnp.maximum(z_ref[0].astype(jnp.float32) * sc_ref[...]
                    + sh_ref[...], 0.0)
    z = _mxu_dot(h, w_ref[...]) + b_ref[...]
    zo_ref[...] = z.astype(zo_ref.dtype)[None]
    sum_ref[...] += jnp.sum(z, axis=0, keepdims=True)
    ssq_ref[...] += jnp.sum(z * z, axis=0, keepdims=True)


def _pmid_call(z_prev, sc, sh, w, b):
    bsz, n, c_in = z_prev.shape
    c_out = w.shape[1]
    tn = _tile_n(n, cap=512)
    z, s, ss = pl.pallas_call(
        _pmid_kernel,
        grid=(bsz, n // tn),
        in_specs=[
            _vspec((1, tn, c_in), lambda i, j: (i, j, 0)),
            _const2(_ROW(sc)), _const2(_ROW(sh)),
            _vspec(w.shape, lambda i, j: (0, 0)),
            _const2(_ROW(b)),
        ],
        out_specs=(
            _vspec((1, tn, c_out), lambda i, j: (i, j, 0)),
            _vspec((1, c_out), lambda i, j: (0, 0)),
            _vspec((1, c_out), lambda i, j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n, c_out), _stash_dtype()),
            jax.ShapeDtypeStruct((1, c_out), jnp.float32),
            jax.ShapeDtypeStruct((1, c_out), jnp.float32),
        ),
        interpret=_interpret(),
    )(z_prev, _ROW(sc), _ROW(sh), w, _ROW(b))
    return z, s.reshape(c_out), ss.reshape(c_out)


def _p4_kernel(z_ref, sc_ref, sh_ref, w_ref, b_ref, o_ref):
    h = jnp.maximum(z_ref[0].astype(jnp.float32) * sc_ref[...]
                    + sh_ref[...], 0.0)
    z4 = _mxu_dot(h, w_ref[...]) + b_ref[...]
    m = jnp.max(z4, axis=-1, keepdims=True)
    lse = jnp.log(jnp.sum(jnp.exp(z4 - m), axis=-1, keepdims=True)) + m
    o_ref[...] = (z4 - lse).astype(o_ref.dtype)[None]


def _p4_call(z3, sc3, sh3, w4, b4):
    bsz, n, c_in = z3.shape
    k = w4.shape[1]
    tn = _tile_n(n, cap=512)
    return pl.pallas_call(
        _p4_kernel,
        grid=(bsz, n // tn),
        in_specs=[
            _vspec((1, tn, c_in), lambda i, j: (i, j, 0)),
            _const2(_ROW(sc3)), _const2(_ROW(sh3)),
            _vspec(w4.shape, lambda i, j: (0, 0)),
            _const2(_ROW(b4)),
        ],
        out_specs=_vspec((1, tn, k), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, n, k), jnp.float32),
        interpret=_interpret(),
    )(z3, _ROW(sc3), _ROW(sh3), w4, _ROW(b4))


# ---------------------------------------------------------------------------
# Backward passes
# ---------------------------------------------------------------------------

def _b4_kernel(z_ref, sc_ref, sh_ref, w_ref, b_ref, mu_ref, inv_ref,
               dlp_ref, dy_ref, dw_ref, db_ref, t1_ref, t2_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        t1_ref[...] = jnp.zeros_like(t1_ref)
        t2_ref[...] = jnp.zeros_like(t2_ref)

    z3 = z_ref[0].astype(jnp.float32)
    h3 = jnp.maximum(z3 * sc_ref[...] + sh_ref[...], 0.0)
    z4 = _mxu_dot(h3, w_ref[...]) + b_ref[...]
    m = jnp.max(z4, axis=-1, keepdims=True)
    e = jnp.exp(z4 - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    dlp = dlp_ref[0]
    dz4 = dlp - p * jnp.sum(dlp, axis=-1, keepdims=True)

    dw_ref[...] += _mxu_dot_t(h3, dz4).astype(dw_ref.dtype)
    db_ref[...] += jnp.sum(dz4, axis=0, keepdims=True)
    dh3 = _mxu_dot(dz4, w_ref[...].T)
    dy3 = dh3 * (h3 > 0).astype(dh3.dtype)
    dy_ref[...] = dy3.astype(dy_ref.dtype)[None]
    zhat = (z3 - mu_ref[...]) * inv_ref[...]
    t1_ref[...] += jnp.sum(dy3, axis=0, keepdims=True)
    t2_ref[...] += jnp.sum(dy3 * zhat, axis=0, keepdims=True)


def _b4_call(z3, sc3, sh3, w4, b4, mu3, inv3, dlogp):
    bsz, n, c3 = z3.shape
    k = w4.shape[1]
    tn = _tile_n(n, cap=512)
    dy3, dw4, db4, t1, t2 = pl.pallas_call(
        _b4_kernel,
        grid=(bsz, n // tn),
        in_specs=[
            _vspec((1, tn, c3), lambda i, j: (i, j, 0)),
            _const2(_ROW(sc3)), _const2(_ROW(sh3)),
            _vspec(w4.shape, lambda i, j: (0, 0)),
            _const2(_ROW(b4)), _const2(_ROW(mu3)), _const2(_ROW(inv3)),
            _vspec((1, tn, k), lambda i, j: (i, j, 0)),
        ],
        out_specs=(
            _vspec((1, tn, c3), lambda i, j: (i, j, 0)),
            _vspec(w4.shape, lambda i, j: (0, 0)),
            _vspec((1, k), lambda i, j: (0, 0)),
            _vspec((1, c3), lambda i, j: (0, 0)),
            _vspec((1, c3), lambda i, j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n, c3), _stash_dtype()),
            jax.ShapeDtypeStruct(w4.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, k), jnp.float32),
            jax.ShapeDtypeStruct((1, c3), jnp.float32),
            jax.ShapeDtypeStruct((1, c3), jnp.float32),
        ),
        interpret=_interpret(),
    )(z3, _ROW(sc3), _ROW(sh3), w4, _ROW(b4), _ROW(mu3), _ROW(inv3),
      dlogp)
    return dy3, dw4, db4.reshape(k), t1.reshape(c3), t2.reshape(c3)


def _bmid_kernel(zc_ref, dy_ref, sc_ref, mu_ref, inv_ref, c1_ref, c2_ref,
                 zp_ref, scp_ref, shp_ref, w_ref, mup_ref, invp_ref,
                 dyp_ref, dw_ref, db_ref, t1_ref, t2_ref):
    """BN backward at the current layer + matmul backward to the previous.

    ``zc`` current stash (for zhat), ``dy`` current post-relu cotangent,
    ``c1/c2`` = sc*T1/m, sc*T2/m (channel rows); ``zp`` previous stash
    (h recompute), ``w`` the current layer's weight. Emits previous
    layer's ``dy``, this layer's ``dw/db``, previous BN reduction sums.
    """
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)
        t1_ref[...] = jnp.zeros_like(t1_ref)
        t2_ref[...] = jnp.zeros_like(t2_ref)

    zc = zc_ref[0].astype(jnp.float32)
    zhat = (zc - mu_ref[...]) * inv_ref[...]
    dz = (dy_ref[0].astype(jnp.float32) * sc_ref[...]
          - c1_ref[...] - zhat * c2_ref[...])

    hp = jnp.maximum(zp_ref[0].astype(jnp.float32) * scp_ref[...]
                     + shp_ref[...], 0.0)
    dw_ref[...] += _mxu_dot_t(hp, dz).astype(dw_ref.dtype)
    db_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    dhp = _mxu_dot(dz, w_ref[...].T)
    dyp = dhp * (hp > 0).astype(dhp.dtype)
    dyp_ref[...] = dyp.astype(dyp_ref.dtype)[None]
    zhatp = (zp_ref[0].astype(jnp.float32) - mup_ref[...]) * invp_ref[...]
    t1_ref[...] += jnp.sum(dyp, axis=0, keepdims=True)
    t2_ref[...] += jnp.sum(dyp * zhatp, axis=0, keepdims=True)


def _bmid_call(zc, dy, sc, mu, inv, coef1, coef2,
               zp, scp, shp, w, mup, invp):
    bsz, n, c_cur = zc.shape
    c_prev = zp.shape[-1]
    tn = _tile_n(n, cap=512)
    dyp, dw, db, t1, t2 = pl.pallas_call(
        _bmid_kernel,
        grid=(bsz, n // tn),
        in_specs=[
            _vspec((1, tn, c_cur), lambda i, j: (i, j, 0)),
            _vspec((1, tn, c_cur), lambda i, j: (i, j, 0)),
            _const2(_ROW(sc)), _const2(_ROW(mu)), _const2(_ROW(inv)),
            _const2(_ROW(coef1)), _const2(_ROW(coef2)),
            _vspec((1, tn, c_prev), lambda i, j: (i, j, 0)),
            _const2(_ROW(scp)), _const2(_ROW(shp)),
            _vspec(w.shape, lambda i, j: (0, 0)),
            _const2(_ROW(mup)), _const2(_ROW(invp)),
        ],
        out_specs=(
            _vspec((1, tn, c_prev), lambda i, j: (i, j, 0)),
            _vspec(w.shape, lambda i, j: (0, 0)),
            _vspec((1, c_cur), lambda i, j: (0, 0)),
            _vspec((1, c_prev), lambda i, j: (0, 0)),
            _vspec((1, c_prev), lambda i, j: (0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n, c_prev), _stash_dtype()),
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, c_cur), jnp.float32),
            jax.ShapeDtypeStruct((1, c_prev), jnp.float32),
            jax.ShapeDtypeStruct((1, c_prev), jnp.float32),
        ),
        interpret=_interpret(),
    )(zc, dy, _ROW(sc), _ROW(mu), _ROW(inv), _ROW(coef1), _ROW(coef2),
      zp, _ROW(scp), _ROW(shp), w, _ROW(mup), _ROW(invp))
    return dyp, dw, db.reshape(c_cur), t1.reshape(c_prev), t2.reshape(c_prev)


def _b1_kernel(z1_ref, dy_ref, sc_ref, mu_ref, inv_ref, c1_ref, c2_ref,
               pf_ref, w1a_ref, dpf_ref, dw_ref, db_ref, r_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    @pl.when(pl.program_id(1) == 0)
    def _():
        r_ref[...] = jnp.zeros_like(r_ref)

    z1 = z1_ref[0].astype(jnp.float32)
    zhat = (z1 - mu_ref[...]) * inv_ref[...]
    dz = (dy_ref[0].astype(jnp.float32) * sc_ref[...]
          - c1_ref[...] - zhat * c2_ref[...])
    pf = pf_ref[0]
    dw_ref[...] += _mxu_dot_t(pf, dz).astype(dw_ref.dtype)
    db_ref[...] += jnp.sum(dz, axis=0, keepdims=True)
    # Per-cloud row sum of dz1: the cotangent of the streamed global row.
    r_ref[...] += jnp.sum(dz, axis=0, keepdims=True)[None]
    dpf_ref[...] = _mxu_dot(dz, w1a_ref[...].T).astype(dpf_ref.dtype)[None]


def _b1_call(z1, dy1, sc1, mu1, inv1, coef1, coef2, pf, w1a):
    bsz, n, c1 = z1.shape
    c_pf = pf.shape[-1]
    tn = _tile_n(n, cap=512)
    dpf, dw1a, db1, r = pl.pallas_call(
        _b1_kernel,
        grid=(bsz, n // tn),
        in_specs=[
            _vspec((1, tn, c1), lambda i, j: (i, j, 0)),
            _vspec((1, tn, c1), lambda i, j: (i, j, 0)),
            _const2(_ROW(sc1)), _const2(_ROW(mu1)), _const2(_ROW(inv1)),
            _const2(_ROW(coef1)), _const2(_ROW(coef2)),
            _vspec((1, tn, c_pf), lambda i, j: (i, j, 0)),
            _vspec(w1a.shape, lambda i, j: (0, 0)),
        ],
        out_specs=(
            _vspec((1, tn, c_pf), lambda i, j: (i, j, 0)),
            _vspec(w1a.shape, lambda i, j: (0, 0)),
            _vspec((1, c1), lambda i, j: (0, 0)),
            _vspec((1, 1, c1), lambda i, j: (i, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((bsz, n, c_pf), jnp.float32),
            jax.ShapeDtypeStruct(w1a.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, c1), jnp.float32),
            jax.ShapeDtypeStruct((bsz, 1, c1), jnp.float32),
        ),
        interpret=_interpret(),
    )(z1, dy1, _ROW(sc1), _ROW(mu1), _ROW(inv1), _ROW(coef1),
      _ROW(coef2), pf, w1a)
    return dpf, dw1a, db1.reshape(c1), r.reshape(bsz, c1)


# ---------------------------------------------------------------------------
# Custom-VJP wrapper
# ---------------------------------------------------------------------------

def _stats(s, ss, m):
    mu = s / m
    var = jnp.maximum(ss / m - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + BN_EPS)
    return mu, var, inv


def _primal(pf, g, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, g3, be3,
            w4, b4):
    bsz, n, c_pf = pf.shape
    m = bsz * n
    w1a, w1b = w1[:c_pf], w1[c_pf:]
    g_row = jnp.matmul(g, w1b, precision=jax.lax.Precision.HIGHEST,
                       preferred_element_type=jnp.float32)
    z1, s1, ss1 = _p1_call(pf, g_row, w1a, b1)
    mu1, var1, inv1 = _stats(s1, ss1, m)
    sc1, sh1 = g1 * inv1, be1 - mu1 * g1 * inv1
    z2, s2, ss2 = _pmid_call(z1, sc1, sh1, w2, b2)
    mu2, var2, inv2 = _stats(s2, ss2, m)
    sc2, sh2 = g2 * inv2, be2 - mu2 * g2 * inv2
    z3, s3, ss3 = _pmid_call(z2, sc2, sh2, w3, b3)
    mu3, var3, inv3 = _stats(s3, ss3, m)
    sc3, sh3 = g3 * inv3, be3 - mu3 * g3 * inv3
    logp = _p4_call(z3, sc3, sh3, w4, b4)
    out = (logp, mu1, var1, mu2, var2, mu3, var3)
    res = (pf, g, z1, z2, z3, w1, w2, w3, w4, b4,
           (mu1, inv1, sc1, sh1, g1), (mu2, inv2, sc2, sh2, g2),
           (mu3, inv3, sc3, sh3, g3))
    return out, res


def seg_head_train(pf, g, w1, b1, g1, be1, w2, b2, g2, be2,
                   w3, b3, g3, be3, w4, b4):
    """Fused training head. Returns ``(logp [B,N,k], mu1, var1_biased,
    mu2, var2_biased, mu3, var3_biased)``."""
    return _head(pf, g, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, g3,
                 be3, w4, b4)


@jax.custom_vjp
def _head(*args):
    out, _ = _primal(*args)
    return out


def _head_fwd(*args):
    return _primal(*args)


def _head_bwd(res, cts):
    (pf, g, z1, z2, z3, w1, w2, w3, w4, b4,
     bn1, bn2, bn3) = res
    mu1, inv1, sc1, sh1, gam1 = bn1
    mu2, inv2, sc2, sh2, gam2 = bn2
    mu3, inv3, sc3, sh3, gam3 = bn3
    dlogp = cts[0]
    bsz, n, c_pf = pf.shape
    m = bsz * n

    dy3, dw4, db4, t1_3, t2_3 = _b4_call(z3, sc3, sh3, w4, b4, mu3, inv3,
                                         dlogp)
    dy2, dw3, db3, t1_2, t2_2 = _bmid_call(
        z3, dy3, sc3, mu3, inv3, sc3 * t1_3 / m, sc3 * t2_3 / m,
        z2, sc2, sh2, w3, mu2, inv2)
    dy1, dw2, db2, t1_1, t2_1 = _bmid_call(
        z2, dy2, sc2, mu2, inv2, sc2 * t1_2 / m, sc2 * t2_2 / m,
        z1, sc1, sh1, w2, mu1, inv1)
    w1a, w1b = w1[:c_pf], w1[c_pf:]
    dpf, dw1a, db1, r = _b1_call(
        z1, dy1, sc1, mu1, inv1, sc1 * t1_1 / m, sc1 * t2_1 / m, pf, w1a)
    # Streamed-global cotangents: z1 row contribution was g @ w1b.
    dg = jnp.matmul(r, w1b.T, precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    dw1b = jnp.matmul(g.T, r, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    dw1 = jnp.concatenate([dw1a, dw1b], axis=0)
    dgam1, dbe1 = t2_1, t1_1
    dgam2, dbe2 = t2_2, t1_2
    dgam3, dbe3 = t2_3, t1_3
    return (dpf.astype(pf.dtype), dg.astype(g.dtype), dw1.astype(w1.dtype),
            db1, dgam1, dbe1, dw2.astype(w2.dtype), db2, dgam2, dbe2,
            dw3.astype(w3.dtype), db3, dgam3, dbe3,
            dw4.astype(w4.dtype), db4)


_head.defvjp(_head_fwd, _head_bwd)
