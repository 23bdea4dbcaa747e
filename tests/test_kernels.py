"""Pallas kernel parity vs. jnp reference paths (SURVEY.md §4).

On CPU the kernels run in interpreter mode (exact same logic, no Mosaic);
the same tests compile for real when run on TPU. Tolerances are fp32
matmul reduction-order level.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adversarial_learning_on_pointclouds_tpu.models import (
    apply_classifier, apply_discriminator, apply_discriminator_fused,
    apply_segmenter, init_classifier, init_discriminator, init_segmenter,
)
from adversarial_learning_on_pointclouds_tpu.ops import use_pallas
from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
    encoder_fused, shared_mlp,
)

B, N = 2, 128
RTOL = 2e-5


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


def _close(a, b, rtol=RTOL):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.abs(b).max(), 1.0)
    np.testing.assert_allclose(a, b, atol=rtol * scale, rtol=0)


def test_pointwise_matmul_forward():
    x, w, b = _rand(0, (B, N, 64)), _rand(1, (64, 128)), _rand(2, (128,))
    _close(shared_mlp.pointwise_matmul(x, w, b), x @ w + b)


def test_pointwise_matmul_odd_channels():
    # Cin=3 / Cout=50 exercise Mosaic's sublane/lane padding.
    x, w, b = _rand(0, (B, N, 3)), _rand(1, (3, 50)), _rand(2, (50,))
    _close(shared_mlp.pointwise_matmul(x, w, b), x @ w + b)


def test_pointwise_matmul_vjp():
    x, w, b = _rand(0, (B, N, 16)), _rand(1, (16, 32)), _rand(2, (32,))

    def f(x, w, b):
        return jnp.sum(jnp.sin(shared_mlp.pointwise_matmul(x, w, b)))

    def f_ref(x, w, b):
        return jnp.sum(jnp.sin(x @ w + b))

    g = jax.grad(f, argnums=(0, 1, 2))(x, w, b)
    gr = jax.grad(f_ref, argnums=(0, 1, 2))(x, w, b)
    for a, r in zip(g, gr):
        _close(a, r)


def test_fused_linear_affine_act():
    x, w = _rand(0, (B, N, 64)), _rand(1, (64, 128))
    scale = jax.random.uniform(jax.random.PRNGKey(2), (128,), minval=0.5,
                               maxval=1.5)
    shift = _rand(3, (128,))
    for act, ref_act in (("relu", lambda z: jnp.maximum(z, 0)),
                         ("leaky_relu",
                          lambda z: jnp.where(z >= 0, z, 0.2 * z)),
                         (None, lambda z: z)):
        y = shared_mlp.fused_linear_affine_act(x, w, shift, scale, act)
        _close(y, ref_act((x @ w) * scale + shift))


def test_fused_mlp_stack_matches_layerwise():
    x = _rand(0, (B, N, 50))
    ws = [_rand(1, (50, 64)), _rand(2, (64, 128)), _rand(3, (128, 1))]
    shifts = [_rand(4, (64,)), _rand(5, (128,)), _rand(6, (1,))]
    scales = [jnp.ones(64), jnp.ones(128), jnp.ones(1)]
    acts = ["leaky_relu", "leaky_relu", None]
    y = shared_mlp.fused_mlp_stack(x, ws, shifts, scales, acts)
    h = x
    for w, s, a in zip(ws, shifts, acts):
        h = h @ w + s
        if a:
            h = jnp.where(h >= 0, h, 0.2 * h)
    _close(y, h)


def test_fused_stack_maxpool():
    x = _rand(0, (B, N, 64))
    ws = [_rand(1, (64, 128)), _rand(2, (128, 256))]
    shifts = [_rand(3, (128,)), _rand(4, (256,))]
    scales = [jax.random.uniform(jax.random.PRNGKey(5), (128,)) + 0.5,
              jax.random.uniform(jax.random.PRNGKey(6), (256,)) + 0.5]
    y = encoder_fused.fused_stack_maxpool(x, ws, shifts, scales,
                                          ("relu", None))
    h = jnp.maximum((x @ ws[0]) * scales[0] + shifts[0], 0)
    h = (h @ ws[1]) * scales[1] + shifts[1]
    _close(y, jnp.max(h, axis=1))


def test_seg_head_fused():
    pf, g = _rand(0, (B, N, 64)), _rand(1, (B, 1024))
    w1 = _rand(2, (1088, 512)) * 0.05
    w2, w3, w4 = (_rand(3, (512, 256)) * 0.05, _rand(4, (256, 128)) * 0.05,
                  _rand(5, (128, 50)) * 0.05)
    s1, s2, s3 = _rand(6, (512,)), _rand(7, (256,)), _rand(8, (128,))
    c1 = jax.random.uniform(jax.random.PRNGKey(9), (512,)) + 0.5
    c2 = jax.random.uniform(jax.random.PRNGKey(10), (256,)) + 0.5
    c3 = jax.random.uniform(jax.random.PRNGKey(11), (128,)) + 0.5
    b4 = _rand(12, (50,))
    y = encoder_fused.seg_head_fused(pf, g, w1, s1, c1, w2, s2, c2,
                                     w3, s3, c3, w4, b4)
    concat = jnp.concatenate(
        [pf, jnp.broadcast_to(g[:, None, :], (B, N, 1024))], -1)
    h = jnp.maximum((concat @ w1) * c1 + s1, 0)
    h = jnp.maximum((h @ w2) * c2 + s2, 0)
    h = jnp.maximum((h @ w3) * c3 + s3, 0)
    ref = jax.nn.log_softmax(h @ w4 + b4, axis=-1)
    _close(y, ref)


# ---------------------------------------------------------------------------
# Full-model parity: Pallas path vs jnp path
# ---------------------------------------------------------------------------

def test_classifier_eval_pallas_parity(rng_key):
    params, state = init_classifier(rng_key, 40, feature_transform=True)
    x = _rand(1, (B, N, 3))
    ref, _, _, _ = apply_classifier(params, state, x, train=False)
    with use_pallas():
        y, _, _, _ = apply_classifier(params, state, x, train=False)
    _close(y, ref, rtol=1e-4)  # log-prob scale


def test_segmenter_eval_pallas_parity(rng_key):
    params, state = init_segmenter(rng_key, 50, feature_transform=True)
    x = _rand(1, (B, N, 3))
    ref, _, _, _ = apply_segmenter(params, state, x, train=False)
    with use_pallas():
        y, _, _, _ = apply_segmenter(params, state, x, train=False)
    _close(y, ref, rtol=1e-4)


def test_discriminator_fused_parity(rng_key):
    params = init_discriminator(rng_key, 50)
    probs = jax.nn.softmax(_rand(1, (B, N, 50)), -1)
    ref = apply_discriminator(params, probs)
    _close(apply_discriminator_fused(params, probs), ref)


def test_train_step_with_pallas_matmuls(rng_key):
    """Training forward+backward through the custom-VJP Pallas matmuls
    (+ the fused training trunk). Batch 8 and loose-ish tolerance for the
    same small-batch BN amplification documented on
    test_train_forward_with_fused_trunk_matches_layerwise."""
    from adversarial_learning_on_pointclouds_tpu import losses

    params, state = init_segmenter(rng_key, 50, feature_transform=False)
    x = _rand(1, (8, N, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (8, N), 0, 50)

    def loss(p, use):
        def inner():
            logp, _, _, _ = apply_segmenter(p, state, x, train=True)
            return losses.nll_loss(logp, labels)
        if use:
            with use_pallas(training=True):
                return inner()
        return inner()

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_pal = jax.grad(lambda p: loss(p, True))(params)
    scale = max(float(jnp.max(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g_ref))
    for a, r in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_ref)):
        assert float(jnp.max(jnp.abs(a - r))) <= 1e-2 * (1 + scale)


def test_augment_fused_structural():
    """CPU/interpreter: shapes, determinism, finiteness. (The TPU
    interpreter stubs the on-core PRNG to zeros, so distributional
    checks — rotation norm preservation, jitter bounds — run on real TPU
    via scripts/tpu_kernel_check.py.)"""
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        augment_fused as af,
    )
    x = _rand(1, (4, 64, 3))
    y = af.augment_fused(jnp.int32(7), x, rotate=True, jitter=True,
                         dropout=True)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))
    y2 = af.augment_fused(jnp.int32(7), x, rotate=True, jitter=True,
                          dropout=True)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y2))


def test_maxpool_points_kernel():
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        maxpool_points as mp,
    )
    x = _rand(0, (B, 256, 64))
    _close(mp.maxpool_points(x), jnp.max(x, axis=1))
    # vjp parity (distinct values, so argmax gradient is unambiguous)
    g1 = jax.grad(lambda x: jnp.sum(jnp.sin(mp.maxpool_points(x))))(x)
    g2 = jax.grad(lambda x: jnp.sum(jnp.sin(jnp.max(x, axis=1))))(x)
    _close(g1, g2)


def test_maxpool_points_duplicate_max_routes_once():
    """With duplicated maxima, exactly one point gets the gradient."""
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        maxpool_points as mp,
    )
    x = jnp.zeros((1, 16, 8))  # all equal -> every point is the max
    g = jax.grad(lambda x: jnp.sum(mp.maxpool_points(x)))(x)
    np.testing.assert_allclose(np.asarray(g).sum(axis=1), np.ones((1, 8)))
    assert np.asarray(g).max() == 1.0  # one winner, not split


def test_tnet_apply_kernel():
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        tnet_apply as ta,
    )
    for k in (3, 64):
        x = _rand(0, (B, 128, k))
        t = _rand(1, (B, k, k)) * 0.1 + jnp.eye(k)
        _close(ta.tnet_apply(x, t), jnp.einsum("bnk,bkj->bnj", x, t))
        gx1, gt1 = jax.grad(
            lambda x, t: jnp.sum(jnp.sin(ta.tnet_apply(x, t))),
            argnums=(0, 1))(x, t)
        gx2, gt2 = jax.grad(
            lambda x, t: jnp.sum(jnp.sin(jnp.einsum("bnk,bkj->bnj", x, t))),
            argnums=(0, 1))(x, t)
        _close(gx1, gx2)
        _close(gt1, gt2)


def test_mixed_precision_scope():
    """bf16 scope: results deviate from fp32 at ~bf16 epsilon, not more."""
    from adversarial_learning_on_pointclouds_tpu.models import core

    x = _rand(0, (B, 64, 3))
    params, state = init_classifier(jax.random.PRNGKey(0), 10)
    ref, _, _, _ = apply_classifier(params, state, x, train=False)
    with core.mixed_precision():
        mp, _, _, _ = apply_classifier(params, state, x, train=False)
    err = float(jnp.max(jnp.abs(mp - ref)))
    assert 0 < err < 0.5, err  # differs (bf16 really used) but sane
    # Scope restores cleanly.
    again, _, _, _ = apply_classifier(params, state, x, train=False)
    np.testing.assert_array_equal(np.asarray(again), np.asarray(ref))


def test_disc_fused_custom_vjp_parity(rng_key):
    """Fused discriminator fwd + recompute backward vs layerwise path."""
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import disc_fused

    params = init_discriminator(rng_key, 50)
    probs = jax.nn.softmax(_rand(1, (B, N, 50)), -1)
    _close(disc_fused.apply(params, probs),
           apply_discriminator(params, probs))

    def loss(p, x, fused):
        out = (disc_fused.apply(p, x) if fused
               else apply_discriminator(p, x))
        return jnp.sum(jnp.tanh(out))

    gp1, gx1 = jax.grad(lambda p, x: loss(p, x, True),
                        argnums=(0, 1))(params, probs)
    gp2, gx2 = jax.grad(lambda p, x: loss(p, x, False),
                        argnums=(0, 1))(params, probs)
    for a, b in zip(jax.tree_util.tree_leaves(gp1),
                    jax.tree_util.tree_leaves(gp2)):
        _close(a, b, rtol=1e-4)
    _close(gx1, gx2, rtol=1e-4)


def test_trunk_train_kernel_parity():
    """Fused training trunk vs jnp composition: values, stats, all grads."""
    from adversarial_learning_on_pointclouds_tpu.models.core import BN_EPS
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import trunk_train

    rng = np.random.default_rng(0)
    Bx, Nx, C2, C3 = 2, 128, 32, 64
    x = jnp.asarray(rng.standard_normal((Bx, Nx, 16)).astype(np.float32))
    w2 = jnp.asarray(rng.standard_normal((16, C2)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.standard_normal(C2).astype(np.float32) * 0.1)
    g2 = jnp.asarray(rng.uniform(0.5, 1.5, C2).astype(np.float32))
    be2 = jnp.asarray(rng.standard_normal(C2).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rng.standard_normal((C2, C3)).astype(np.float32) * 0.2)
    b3 = jnp.asarray(rng.standard_normal(C3).astype(np.float32) * 0.1)
    # Include negative gammas: the pool must switch to the channel MIN.
    g3 = jnp.asarray((rng.uniform(0.5, 1.5, C3) *
                      np.where(rng.random(C3) < 0.3, -1, 1)).astype(np.float32))
    be3 = jnp.asarray(rng.standard_normal(C3).astype(np.float32) * 0.1)
    args = (x, w2, b2, g2, be2, w3, b3, g3, be3)

    def ref(x, w2, b2, g2, be2, w3, b3, g3, be3):
        z2 = x @ w2 + b2
        mu2 = z2.mean(axis=(0, 1)); var2 = z2.var(axis=(0, 1))
        h2 = jnp.maximum(
            (z2 - mu2) * jax.lax.rsqrt(var2 + BN_EPS) * g2 + be2, 0)
        z3 = h2 @ w3 + b3
        mu3 = z3.mean(axis=(0, 1)); var3 = z3.var(axis=(0, 1))
        y3 = (z3 - mu3) * jax.lax.rsqrt(var3 + BN_EPS) * g3 + be3
        return jnp.max(y3, axis=1), mu2, var2, mu3, var3

    out = trunk_train.trunk2_train(*args)
    r = ref(*args)
    for a, b in zip(out, r):
        _close(a, b, rtol=1e-4)

    gf = jax.grad(lambda *a: jnp.sum(jnp.sin(
        trunk_train.trunk2_train(*a)[0])), argnums=tuple(range(9)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a)[0])),
                  argnums=tuple(range(9)))(*args)
    for a, b in zip(gf, gr):
        _close(a, b, rtol=1e-4)


def test_train_forward_with_fused_trunk_matches_layerwise(rng_key):
    """Model-level: encoder/tnet train path under use_pallas() == jnp path
    (forward values, BN running-stat updates, and parameter grads).

    Tolerances are loose-ish by necessity: both paths are correct fp32
    programs that differ by matmul reassociation, and the T-Net fc heads
    put BatchNorm over the BATCH axis — at small batch the 1/std factor
    amplifies tiny input differences substantially (measured 5e-2 at
    batch 2, 3e-3 at batch 8). The exact-kernel parity is pinned by
    test_trunk_train_kernel_parity; this test guards the model wiring
    (stat updates, ReLU-after-pool identity, state routing)."""
    from adversarial_learning_on_pointclouds_tpu import losses

    params, state = init_segmenter(rng_key, 50, feature_transform=True)
    x = _rand(1, (8, N, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (8, N), 0, 50)

    def run(use):
        def inner():
            logp, _, tf, ns = apply_segmenter(params, state, x, train=True)
            return logp, ns
        if use:
            with use_pallas():
                return inner()
        return inner()

    logp_ref, ns_ref = run(False)
    logp_pal, ns_pal = run(True)
    _close(logp_pal, logp_ref, rtol=5e-3)
    for a, b in zip(jax.tree_util.tree_leaves(ns_pal),
                    jax.tree_util.tree_leaves(ns_ref)):
        _close(a, b, rtol=5e-3)

    def loss(p, use):
        def inner():
            logp, _, _, _ = apply_segmenter(p, state, x, train=True)
            return losses.nll_loss(logp, labels)
        if use:
            with use_pallas():
                return inner()
        return inner()

    g_ref = jax.grad(lambda p: loss(p, False))(params)
    g_pal = jax.grad(lambda p: loss(p, True))(params)
    scale = max(float(jnp.max(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g_ref))
    for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                    jax.tree_util.tree_leaves(g_ref)):
        assert float(jnp.max(jnp.abs(a - b))) <= 2e-2 * (1 + scale)


def test_disc_frozen_dx_matches_full_bwd(rng_key):
    """dx from the frozen variant == dx from the full backward; and the
    G-step freeze contract holds (weight cotangents never consumed)."""
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import disc_fused

    params = init_discriminator(rng_key, 50)
    probs = jax.nn.softmax(_rand(1, (B, N, 50)), -1)
    gx_full = jax.grad(lambda x: jnp.sum(jnp.tanh(
        disc_fused.apply(params, x))))(probs)
    gx_frozen = jax.grad(lambda x: jnp.sum(jnp.tanh(
        disc_fused.apply_frozen(params, x))))(probs)
    _close(gx_frozen, gx_full, rtol=1e-5)


def test_d_step_known_logits_grads_match(rng_key):
    """D-step gradient with the known-logits fast path == recompute path."""
    from adversarial_learning_on_pointclouds_tpu.train import adversarial

    params = init_discriminator(rng_key, 50)
    probs_l = jax.nn.softmax(_rand(1, (B, N, 50)), -1)
    probs_u = jax.nn.softmax(_rand(2, (B, N, 50)), -1)
    y = jax.random.randint(jax.random.PRNGKey(3), (B, N), 0, 50)

    g_ref = jax.grad(lambda p: adversarial._d_loss_fn(
        p, probs_l, probs_u, y, 50)[0])(params)
    with use_pallas():
        fake_logits = jnp.concatenate(
            [apply_discriminator(params, probs_l),
             apply_discriminator(params, probs_u)], axis=0)
        g_fast = jax.grad(lambda p: adversarial._d_loss_fn(
            p, probs_l, probs_u, y, 50, fake_logits)[0])(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_fast),
                    jax.tree_util.tree_leaves(g_ref)):
        _close(a, b, rtol=1e-4)


def test_seg_head_train_kernel_parity():
    """Fused training head vs jnp composition: logp, stats, all 16 grads."""
    from adversarial_learning_on_pointclouds_tpu.models.core import BN_EPS
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        seg_head_train as sht,
    )

    rng = np.random.default_rng(0)
    Bx, Nx, CPF, C1, C2, C3, K = 2, 128, 16, 64, 48, 32, 10
    A = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s).astype(np.float32) * 0.2)
    pf, g = A(Bx, Nx, CPF), A(Bx, 96)
    args = (pf, g, A(CPF + 96, C1), A(C1),
            jnp.asarray(rng.uniform(0.5, 1.5, C1).astype(np.float32)), A(C1),
            A(C1, C2), A(C2),
            jnp.asarray(rng.uniform(0.5, 1.5, C2).astype(np.float32)), A(C2),
            A(C2, C3), A(C3),
            jnp.asarray(rng.uniform(0.5, 1.5, C3).astype(np.float32)), A(C3),
            A(C3, K), A(K))

    def ref(pf, g, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, g3, be3,
            w4, b4):
        concat = jnp.concatenate(
            [pf, jnp.broadcast_to(g[:, None, :],
                                  (Bx, Nx, g.shape[-1]))], -1)

        def bnl(z, ga, be):
            mu = z.mean(axis=(0, 1))
            var = z.var(axis=(0, 1))
            return ((z - mu) * jax.lax.rsqrt(var + BN_EPS) * ga + be,
                    mu, var)

        h, mu1, v1 = bnl(concat @ w1 + b1, g1, be1)
        h = jnp.maximum(h, 0)
        h2, mu2, v2 = bnl(h @ w2 + b2, g2, be2)
        h2 = jnp.maximum(h2, 0)
        h3, mu3, v3 = bnl(h2 @ w3 + b3, g3, be3)
        h3 = jnp.maximum(h3, 0)
        return (jax.nn.log_softmax(h3 @ w4 + b4, -1),
                mu1, v1, mu2, v2, mu3, v3)

    out = sht.seg_head_train(*args)
    r = ref(*args)
    for a, b in zip(out, r):
        _close(a, b, rtol=1e-4)
    idxs = tuple(range(16))
    gf = jax.grad(lambda *a: jnp.sum(jnp.sin(sht.seg_head_train(*a)[0])),
                  argnums=idxs)(*args)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a)[0])),
                  argnums=idxs)(*args)
    for a, b in zip(gf, gr):
        scale = float(jnp.max(jnp.abs(b)))
        assert float(jnp.max(jnp.abs(a - b))) <= 1e-4 * (1 + scale)


def test_trunk3_kernel_parity():
    """trunk3 (conv1 folded in front) vs jnp composition incl. grads."""
    from adversarial_learning_on_pointclouds_tpu.models.core import BN_EPS
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import trunk_train

    rng = np.random.default_rng(1)
    Bx, Nx, K0, C1, C2, C3 = 2, 128, 3, 24, 48, 64
    A = lambda *s: jnp.asarray(  # noqa: E731
        rng.standard_normal(s).astype(np.float32) * 0.2)
    args = (A(Bx, Nx, K0), A(K0, C1), A(C1),
            jnp.asarray(rng.uniform(0.5, 1.5, C1).astype(np.float32)), A(C1),
            A(C1, C2), A(C2),
            jnp.asarray(rng.uniform(0.5, 1.5, C2).astype(np.float32)), A(C2),
            A(C2, C3), A(C3),
            jnp.asarray((rng.uniform(0.5, 1.5, C3) *
                         np.where(rng.random(C3) < 0.3, -1, 1)
                         ).astype(np.float32)), A(C3))

    def ref(x, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3, g3, be3):
        def bnl(z, ga, be):
            mu = z.mean(axis=(0, 1))
            var = z.var(axis=(0, 1))
            return ((z - mu) * jax.lax.rsqrt(var + BN_EPS) * ga + be,
                    mu, var)
        h1, mu1, v1 = bnl(x @ w1 + b1, g1, be1)
        h1 = jnp.maximum(h1, 0)
        h2, mu2, v2 = bnl(h1 @ w2 + b2, g2, be2)
        h2 = jnp.maximum(h2, 0)
        y3, mu3, v3 = bnl(h2 @ w3 + b3, g3, be3)
        return jnp.max(y3, axis=1), mu1, v1, mu2, v2, mu3, v3

    out = trunk_train.trunk3_train(*args)
    r = ref(*args)
    for a, b in zip(out, r):
        _close(a, b, rtol=1e-4)
    idxs = tuple(range(13))
    gf = jax.grad(lambda *a: jnp.sum(jnp.sin(
        trunk_train.trunk3_train(*a)[0])), argnums=idxs)(*args)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a)[0])),
                  argnums=idxs)(*args)
    for a, b in zip(gf, gr):
        scale = float(jnp.max(jnp.abs(b)))
        assert float(jnp.max(jnp.abs(a - b))) <= 1e-4 * (1 + scale)


def test_fused_training_kernels_odd_point_count(rng_key):
    """Point counts that aren't tile-sized still work (tile falls back to
    smaller divisors; 200 -> tn=8)."""
    from adversarial_learning_on_pointclouds_tpu import losses

    params, state = init_segmenter(rng_key, 50, feature_transform=True)
    x = _rand(1, (4, 200, 3))
    labels = jax.random.randint(jax.random.PRNGKey(2), (4, 200), 0, 50)

    with use_pallas():
        logp, _, _, ns = apply_segmenter(params, state, x, train=True)
        assert logp.shape == (4, 200, 50)
        g = jax.grad(lambda p: losses.nll_loss(
            apply_segmenter(p, state, x, train=True)[0], labels))(params)
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree_util.tree_leaves(g))


def test_disc_detached_dw_matches_full_bwd(rng_key):
    """dW/db from the detached (dW-only) variant == the full backward's;
    the input cotangent is zero by contract (the D step's inputs are
    one-hot data / stop_gradient'ed predictions)."""
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import disc_fused

    params = init_discriminator(rng_key, 50)
    probs = jax.nn.softmax(_rand(4, (B, N, 50)), -1)

    gp_full = jax.grad(lambda p: jnp.sum(jnp.tanh(
        disc_fused.apply(p, probs))))(params)
    gp_dw = jax.grad(lambda p: jnp.sum(jnp.tanh(
        disc_fused.apply_detached(p, probs))))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gp_dw),
                    jax.tree_util.tree_leaves(gp_full)):
        _close(a, b, rtol=1e-5)
    gx = jax.grad(lambda x: jnp.sum(jnp.tanh(
        disc_fused.apply_detached(params, x))))(probs)
    np.testing.assert_array_equal(np.asarray(gx), 0.0)


def test_fc_head_train_kernel_parity():
    """Fused T-Net fc head vs layerwise jnp composition: output, both
    BN batch statistics, and every gradient (incl. dh into the trunk)."""
    from adversarial_learning_on_pointclouds_tpu.models.core import BN_EPS
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        fc_head_train,
    )

    rng = np.random.default_rng(1)
    Bx, C0, C1, C2, C3 = 8, 64, 32, 16, 9
    h = jnp.asarray(rng.standard_normal((Bx, C0)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((C0, C1)).astype(np.float32) * 0.2)
    b1 = jnp.asarray(rng.standard_normal(C1).astype(np.float32) * 0.1)
    g1 = jnp.asarray(rng.uniform(0.5, 1.5, C1).astype(np.float32))
    be1 = jnp.asarray(rng.standard_normal(C1).astype(np.float32) * 0.1)
    w2 = jnp.asarray(rng.standard_normal((C1, C2)).astype(np.float32) * 0.2)
    b2 = jnp.asarray(rng.standard_normal(C2).astype(np.float32) * 0.1)
    g2 = jnp.asarray(rng.uniform(0.5, 1.5, C2).astype(np.float32))
    be2 = jnp.asarray(rng.standard_normal(C2).astype(np.float32) * 0.1)
    w3 = jnp.asarray(rng.standard_normal((C2, C3)).astype(np.float32) * 0.2)
    b3 = jnp.asarray(rng.standard_normal(C3).astype(np.float32) * 0.1)
    args = (h, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3)

    def ref(h, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3):
        z1 = h @ w1 + b1
        mu1 = z1.mean(axis=0); var1 = z1.var(axis=0)
        h1 = jnp.maximum(
            (z1 - mu1) * jax.lax.rsqrt(var1 + BN_EPS) * g1 + be1, 0)
        z2 = h1 @ w2 + b2
        mu2 = z2.mean(axis=0); var2 = z2.var(axis=0)
        h2 = jnp.maximum(
            (z2 - mu2) * jax.lax.rsqrt(var2 + BN_EPS) * g2 + be2, 0)
        return h2 @ w3 + b3, mu1, var1, mu2, var2

    out = fc_head_train.fc_head_train(*args)
    r = ref(*args)
    for a, b in zip(out, r):
        _close(a, b, rtol=1e-4)

    gf = jax.grad(lambda *a: jnp.sum(jnp.sin(
        fc_head_train.fc_head_train(*a)[0])),
        argnums=tuple(range(11)))(*args)
    gr = jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a)[0])),
                  argnums=tuple(range(11)))(*args)
    for a, b in zip(gf, gr):
        _close(a, b, rtol=1e-4)


# ---------------------------------------------------------------------------
# Untileable point axis: the padded-tile regime (TPUCHECK_r04 regression)
# ---------------------------------------------------------------------------

def test_pad_n_to_tile_boundaries():
    # 2500 (reference seg default) has no multiple-of-8 divisor <= 256:
    # padded up to 2560 so the designed 256-wide pipeline runs instead
    # of one full-width block (which needs ~22 MB scoped VMEM in the
    # seg head at 50 parts — measured OOM vs the 16 MB limit on v5e).
    assert encoder_fused._pad_n_to_tile(2500) == 60
    # Tileable N: no pad.
    assert encoder_fused._pad_n_to_tile(2048) == 0
    # Untileable but SMALL full-width blocks stay legal and cheap.
    assert encoder_fused._pad_n_to_tile(100) == 0


def test_eval_kernels_untileable_n_parity():
    """N=2500 through both eval megakernels == the jnp reference.

    Pins the pad semantics: zero rows sliced off (per-point seg head),
    edge-replicated rows (max-invariant) for the pooled trunk."""
    n = 2500
    pf, g = _rand(0, (B, n, 64)), _rand(1, (B, 1024))
    w1 = _rand(2, (1088, 512)) * 0.05
    w2, w3, w4 = (_rand(3, (512, 256)) * 0.05, _rand(4, (256, 128)) * 0.05,
                  _rand(5, (128, 50)) * 0.05)
    s1, s2, s3 = _rand(6, (512,)), _rand(7, (256,)), _rand(8, (128,))
    c1 = jax.random.uniform(jax.random.PRNGKey(9), (512,)) + 0.5
    c2 = jax.random.uniform(jax.random.PRNGKey(10), (256,)) + 0.5
    c3 = jax.random.uniform(jax.random.PRNGKey(11), (128,)) + 0.5
    b4 = _rand(12, (50,))
    y = encoder_fused.seg_head_fused(pf, g, w1, s1, c1, w2, s2, c2,
                                     w3, s3, c3, w4, b4)
    assert y.shape == (B, n, 50)
    concat = jnp.concatenate(
        [pf, jnp.broadcast_to(g[:, None, :], (B, n, 1024))], -1)
    h = jnp.maximum((concat @ w1) * c1 + s1, 0)
    h = jnp.maximum((h @ w2) * c2 + s2, 0)
    h = jnp.maximum((h @ w3) * c3 + s3, 0)
    _close(y, jax.nn.log_softmax(h @ w4 + b4, axis=-1), rtol=1e-4)

    x = _rand(13, (B, n, 64))
    ws = [_rand(14, (64, 128)), _rand(15, (128, 256))]
    shifts = [_rand(16, (128,)), _rand(17, (256,))]
    scales = [jax.random.uniform(jax.random.PRNGKey(18), (128,)) + 0.5,
              jax.random.uniform(jax.random.PRNGKey(19), (256,)) + 0.5]
    p = encoder_fused.fused_stack_maxpool(x, ws, shifts, scales,
                                          ("relu", None))
    hh = jnp.maximum((x @ ws[0]) * scales[0] + shifts[0], 0)
    hh = (hh @ ws[1]) * scales[1] + shifts[1]
    _close(p, jnp.max(hh, axis=1), rtol=1e-4)
