"""On-TPU validation of compiled Pallas kernels (run manually / by verify).

The CPU test suite covers the kernels in interpreter mode; this script
compiles them for real on the TPU and checks (a) numerical parity with
the XLA path, (b) the augment kernel's distributional properties that the
interpreter can't exercise (its PRNG is stubbed), and (c) a quick
speed-of-light sanity timing.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from adversarial_learning_on_pointclouds_tpu.models import (
    apply_classifier, apply_discriminator, apply_discriminator_fused,
    apply_segmenter, init_classifier, init_discriminator, init_segmenter,
)
from adversarial_learning_on_pointclouds_tpu.ops import use_pallas
from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
    augment_fused, shared_mlp,
)


def check(name, a, b, rtol=1e-4):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.abs(b).max(), 1.0)
    err = np.abs(a - b).max() / scale
    status = "OK " if err <= rtol else "FAIL"
    print(f"[{status}] {name}: rel_err={err:.2e}")
    return err <= rtol


def main():
    print("devices:", jax.devices())
    ok = True
    B, N = 8, 1024
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, N, 3))

    # 1. pointwise matmul fwd + vjp. NB the jnp reference must itself be
    # fp32-pinned — the TPU's default matmul precision is bf16, which
    # would make the *reference* the wrong side (measured 4.8e-3).
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 64)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1
    hi = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    ok &= check("pointwise_matmul", shared_mlp.pointwise_matmul(x, w, b),
                hi(x, w) + b)
    g1 = jax.grad(lambda w: jnp.sum(
        jnp.sin(shared_mlp.pointwise_matmul(x, w, b))))(w)
    g2 = jax.grad(lambda w: jnp.sum(jnp.sin(hi(x, w) + b)))(w)
    ok &= check("pointwise_matmul dW", g1, g2)

    # 2. full-model eval parity, compiled
    params, state = init_classifier(jax.random.PRNGKey(3), 40,
                                    feature_transform=True)
    ref, _, _, _ = jax.jit(
        lambda p, s, x: apply_classifier(p, s, x, train=False))(params, state, x)
    with use_pallas():
        pal, _, _, _ = jax.jit(
            lambda p, s, x: apply_classifier(p, s, x, train=False))(
                params, state, x)
    ok &= check("classifier eval (fused kernels)", pal, ref)

    sp, ss = init_segmenter(jax.random.PRNGKey(4), 50, feature_transform=True)
    ref, _, _, _ = jax.jit(
        lambda p, s, x: apply_segmenter(p, s, x, train=False))(sp, ss, x)
    with use_pallas():
        pal, _, _, _ = jax.jit(
            lambda p, s, x: apply_segmenter(p, s, x, train=False))(sp, ss, x)
    ok &= check("segmenter eval (fused trunk + streamed head)", pal, ref)

    dp = init_discriminator(jax.random.PRNGKey(5), 50)
    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(6),
                                             (B, N, 50)), -1)
    ok &= check("discriminator fused stack",
                apply_discriminator_fused(dp, probs),
                apply_discriminator(dp, probs))

    # 3. augment kernel distribution checks (real PRNG only on TPU)
    y = augment_fused.augment_fused(jnp.int32(7), x, rotate=True,
                                    jitter=False, dropout=False)
    ok &= check("augment rotate preserves norms",
                jnp.linalg.norm(y, axis=-1), jnp.linalg.norm(x, axis=-1),
                rtol=1e-4)
    ok &= check("augment rotate preserves Y", y[..., 1], x[..., 1], rtol=1e-5)
    deltas = [float(jnp.max(jnp.abs(y[i] - x[i]))) for i in range(4)]
    distinct = len({round(d, 4) for d in deltas}) > 1
    print(f"[{'OK ' if distinct else 'FAIL'}] per-cloud angles distinct: "
          f"{deltas[:4]}")
    ok &= distinct

    yj = augment_fused.augment_fused(jnp.int32(7), x, rotate=False,
                                     jitter=True, dropout=False,
                                     sigma=0.5, clip=0.05)
    d = np.abs(np.asarray(yj - x))
    bounded = d.max() <= 0.05 * 1.001 and d.max() > 0.0
    print(f"[{'OK ' if bounded else 'FAIL'}] jitter clipped: max={d.max():.4f}")
    ok &= bounded
    sigma_small = augment_fused.augment_fused(
        jnp.int32(7), x, rotate=False, jitter=True, dropout=False,
        sigma=0.01, clip=0.05)
    noise = np.asarray(sigma_small - x).ravel()
    print(f"   jitter std={noise.std():.4f} (expect ~0.01), "
          f"mean={noise.mean():.5f}")
    ok &= 0.005 < noise.std() < 0.02

    yd = augment_fused.augment_fused(jnp.int32(3), x, rotate=False,
                                     jitter=False, dropout=True)
    changed = ~np.all(np.isclose(np.asarray(yd), np.asarray(x)), axis=-1)
    frac = changed.mean()
    print(f"[{'OK ' if 0 < frac < 0.9 else 'FAIL'}] dropout frac={frac:.3f}")
    ok &= 0 < frac < 0.9
    # replaced points equal the first point of their cloud
    xn, ydn = np.asarray(x), np.asarray(yd)
    for bi in range(B):
        idx = np.nonzero(changed[bi])[0]
        if len(idx):
            assert np.allclose(ydn[bi, idx], xn[bi, 0], atol=1e-6)
    print("[OK ] dropout replaces with first point")

    # 3b. fused TRAINING kernels, compiled: grads vs jnp path (batch 8+
    # to keep small-batch BN amplification bounded; see tests).
    from adversarial_learning_on_pointclouds_tpu import losses as _losses

    labels = jax.random.randint(jax.random.PRNGKey(9), (B, N), 0, 50)

    def train_loss(p, use):
        def inner():
            logp, _, tf, _ = apply_segmenter(p, ss, x, train=True)
            return (_losses.nll_loss(logp, labels)
                    + 0.001 * _losses.orthogonality_reg(tf))
        if use:
            with use_pallas():
                return inner()
        return inner()

    g_ref = jax.jit(jax.grad(lambda p: train_loss(p, False)))(sp)
    g_pal = jax.jit(jax.grad(lambda p: train_loss(p, True)))(sp)
    scale = max(float(jnp.max(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g_ref))
    worst = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                                jax.tree_util.tree_leaves(g_ref)))
    ok_train = worst <= 2e-2 * (1 + scale)
    print(f"[{'OK ' if ok_train else 'FAIL'}] fused TRAINING kernels grads: "
          f"worst={worst:.2e} (scale {scale:.2e})")
    ok &= ok_train

    # 4. timing sanity: fused eval vs XLA eval
    f_ref = jax.jit(lambda p, s, x: apply_segmenter(p, s, x, train=False)[0])
    with use_pallas():
        f_pal = jax.jit(
            lambda p, s, x: apply_segmenter(p, s, x, train=False)[0])
    for name, f in (("xla", f_ref), ("pallas", f_pal)):
        r = f(sp, ss, x)
        float(jnp.sum(r))
        t0 = time.perf_counter()
        for _ in range(20):
            r = f(sp, ss, x)
        float(jnp.sum(r))
        dt = (time.perf_counter() - t0) / 20
        print(f"   seg eval [{name}]: {dt * 1e3:.2f} ms "
              f"({B * N / dt / 1e6:.1f} M pts/s)")

    print("ALL OK" if ok else "FAILURES PRESENT")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
