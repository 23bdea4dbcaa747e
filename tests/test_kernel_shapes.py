"""Shape-regime sweep for the fused training trunk (CPU interpreter).

The single-shape parity test (test_kernels.py::test_trunk_train_kernel_parity)
pins the math; this sweep guards the TILING regimes the kernel's grid
logic actually branches on (`shared_mlp._tile_n`):

* N divisible by the 512 cap (multi-tile fast path),
* N=2500 — the reference lineage's seg default, where `_tile_n` falls
  back to ONE full-width tile (no divisor <= cap divides 2500; compiled
  coverage of this regime lives in the -m tpu suite),
* grouped batch statistics (``groups=2``, the --paired_trunks layout)
  across both regimes.

Channels are kept small so interpreter mode stays fast; values+stats are
compared per shape, gradients once per regime class.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adversarial_learning_on_pointclouds_tpu.models.core import BN_EPS
from adversarial_learning_on_pointclouds_tpu.ops.kernels import trunk_train


def _args(bsz, n, c_in=8, c2=16, c3=32, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((bsz, n, c_in)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((c_in, c2)).astype(np.float32) * .2)
    b2 = jnp.asarray(rng.standard_normal(c2).astype(np.float32) * .1)
    g2 = jnp.asarray(rng.uniform(0.5, 1.5, c2).astype(np.float32))
    be2 = jnp.asarray(rng.standard_normal(c2).astype(np.float32) * .1)
    w3 = jnp.asarray(rng.standard_normal((c2, c3)).astype(np.float32) * .2)
    b3 = jnp.asarray(rng.standard_normal(c3).astype(np.float32) * .1)
    # Negative gammas force the min-side of the min/max pooling trick.
    g3 = jnp.asarray((rng.uniform(0.5, 1.5, c3) *
                      np.where(rng.random(c3) < 0.3, -1, 1))
                     .astype(np.float32))
    be3 = jnp.asarray(rng.standard_normal(c3).astype(np.float32) * .1)
    return (x, w2, b2, g2, be2, w3, b3, g3, be3)


def _ref_grouped(x, w2, b2, g2, be2, w3, b3, g3, be3, groups=1):
    """jnp reference with per-row-block (grouped) BN statistics."""
    bsz = x.shape[0]
    bpg = bsz // groups

    def one(xg):
        z2 = xg @ w2 + b2
        mu2 = z2.mean(axis=(0, 1)); var2 = z2.var(axis=(0, 1))
        h2 = jnp.maximum(
            (z2 - mu2) * jax.lax.rsqrt(var2 + BN_EPS) * g2 + be2, 0)
        z3 = h2 @ w3 + b3
        mu3 = z3.mean(axis=(0, 1)); var3 = z3.var(axis=(0, 1))
        y3 = (z3 - mu3) * jax.lax.rsqrt(var3 + BN_EPS) * g3 + be3
        return jnp.max(y3, axis=1)

    return jnp.concatenate([one(x[i * bpg:(i + 1) * bpg])
                            for i in range(groups)])


def _close(a, b, rtol):
    # 1 + |b|max scale (repo convention): BN-absorbed bias leaves have
    # mathematically-zero grads that are pure fp noise — a relative
    # bound against their own magnitude is meaningless.
    a, b = np.asarray(a), np.asarray(b)
    scale = 1.0 + float(np.max(np.abs(b)))
    assert float(np.max(np.abs(a - b))) <= rtol * scale, (
        float(np.max(np.abs(a - b))), scale)


@pytest.mark.parametrize("bsz,n,groups", [
    (2, 1024, 1),    # multi-tile (two 512 tiles)
    (4, 1024, 2),    # multi-tile, grouped stats
    (2, 2500, 1),    # full-width fallback tile (reference seg default N)
    (4, 2500, 2),    # full-width tile + grouped stats
    (2, 320, 1),     # odd multiple: tile 64, 5 tiles
])
def test_trunk2_shapes_forward(bsz, n, groups):
    args = _args(bsz, n)
    g = trunk_train.trunk2_train(*args, groups=groups)[0]
    r = _ref_grouped(*args, groups=groups)
    _close(g, r, rtol=1e-4)


# ---------------------------------------------------------------------------
# seg_head_train across the same tiling regimes
# ---------------------------------------------------------------------------

def _head_args(bsz, n, seed=0, cpf=16, c1=32, c2=24, c3=16, k=10, cg=96):
    rng = np.random.default_rng(seed)
    A = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s).astype(np.float32) * 0.2)
    G = lambda c: jnp.asarray(  # noqa: E731
        rng.uniform(0.5, 1.5, c).astype(np.float32))
    return (A(bsz, n, cpf), A(bsz, cg),
            A(cpf + cg, c1), A(c1), G(c1), A(c1),
            A(c1, c2), A(c2), G(c2), A(c2),
            A(c2, c3), A(c3), G(c3), A(c3),
            A(c3, k), A(k))


def _head_ref(pf, g, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, g3, be3,
              w4, b4):
    bsz, n, _ = pf.shape
    concat = jnp.concatenate(
        [pf, jnp.broadcast_to(g[:, None, :], (bsz, n, g.shape[-1]))], -1)

    def bnl(z, ga, be):
        mu = z.mean(axis=(0, 1)); var = z.var(axis=(0, 1))
        return (z - mu) * jax.lax.rsqrt(var + BN_EPS) * ga + be

    h = jnp.maximum(bnl(concat @ w1 + b1, g1, be1), 0)
    h = jnp.maximum(bnl(h @ w2 + b2, g2, be2), 0)
    h = jnp.maximum(bnl(h @ w3 + b3, g3, be3), 0)
    return jax.nn.log_softmax(h @ w4 + b4, -1)


@pytest.mark.parametrize("bsz,n", [(2, 1024), (2, 2500), (2, 320)])
def test_seg_head_shapes_forward(bsz, n):
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        seg_head_train as sht,
    )

    args = _head_args(bsz, n)
    _close(sht.seg_head_train(*args)[0], _head_ref(*args), rtol=1e-4)


def test_seg_head_fullwidth_tile_grads():
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        seg_head_train as sht,
    )

    args = _head_args(2, 2500, seed=4)
    gf = jax.grad(lambda *a: jnp.sum(jnp.sin(sht.seg_head_train(*a)[0])),
                  argnums=tuple(range(16)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(_head_ref(*a))),
                  argnums=tuple(range(16)))(*args)
    # b1/b2/b3 sit directly in front of a BatchNorm, so their true
    # gradients are mathematically ZERO (the mean subtraction cancels a
    # bias shift exactly) — both sides are pure 5000-element cancellation
    # noise, which scales with the reduction size (measured ~3e-4 here,
    # and identically at the multi-tile N=2048, so it is not a tiling
    # artifact). Bound them absolutely; everything else stays tight.
    zero_leaves = {3, 7, 11}  # argnums of b1, b2, b3
    for i, (a, b) in enumerate(zip(gf, gr)):
        if i in zero_leaves:
            assert float(jnp.max(jnp.abs(a))) < 1e-3, (i, a)
            assert float(jnp.max(jnp.abs(b))) < 1e-3, (i, b)
        else:
            _close(a, b, rtol=2e-4)


@pytest.mark.parametrize("n,groups", [(2500, 1), (2500, 2)])
def test_trunk2_fullwidth_tile_grads(n, groups):
    """Gradient parity in the full-width-tile regime (the winner-index
    bookkeeping `+ j*tn` collapses to j=0 here — a distinct code path
    from the multi-tile tests)."""
    bsz = 2 * groups
    args = _args(bsz, n, seed=3)

    def f_fused(*a):
        return jnp.sum(jnp.sin(
            trunk_train.trunk2_train(*a, groups=groups)[0]))

    def f_ref(*a):
        return jnp.sum(jnp.sin(_ref_grouped(*a, groups=groups)))

    gf = jax.grad(f_fused, argnums=tuple(range(9)))(*args)
    gr = jax.grad(f_ref, argnums=tuple(range(9)))(*args)
    for a, b in zip(gf, gr):
        _close(a, b, rtol=2e-4)
