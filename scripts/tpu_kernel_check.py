"""On-TPU validation of compiled Pallas kernels.

The CPU test suite covers the kernels in interpreter mode; these checks
compile them for real on the TPU and verify (a) numerical parity with
the XLA path, (b) the augment kernel's distributional properties that the
interpreter can't exercise (its PRNG is stubbed), and (c) a quick
speed-of-light sanity timing.

Two entry points:
* ``python scripts/tpu_kernel_check.py`` — standalone script (prints a
  report, exits non-zero on failure).
* ``pytest tests -m tpu`` — the same checks as a pytest marker suite
  (``tests/test_tpu_kernels.py`` imports the ``check_*`` functions), so
  the on-chip parity run is one command and lands in round artifacts
  (SURVEY.md §4 kernel-parity bullet; VERDICT round 1, next-round #9).

Each ``check_*`` function raises ``AssertionError`` on failure.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _assert_close(name, a, b, rtol=1e-4):
    a, b = np.asarray(a), np.asarray(b)
    scale = max(np.abs(b).max(), 1.0)
    err = np.abs(a - b).max() / scale
    print(f"[{'OK ' if err <= rtol else 'FAIL'}] {name}: rel_err={err:.2e}")
    assert err <= rtol, (name, err, rtol)


def _inputs(B=8, N=1024):
    return jax.random.normal(jax.random.PRNGKey(0), (B, N, 3))


def check_pointwise_matmul():
    """Custom-VJP Pallas matmul: fwd + dW vs fp32-pinned jnp.

    NB the jnp reference must itself be fp32-pinned — the TPU's default
    matmul precision is bf16, which would make the *reference* the wrong
    side (measured 4.8e-3)."""
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import shared_mlp
    x = _inputs()
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 64)) * 0.1
    b = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1
    hi = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    _assert_close("pointwise_matmul", shared_mlp.pointwise_matmul(x, w, b),
                  hi(x, w) + b)
    g1 = jax.grad(lambda w: jnp.sum(
        jnp.sin(shared_mlp.pointwise_matmul(x, w, b))))(w)
    g2 = jax.grad(lambda w: jnp.sum(jnp.sin(hi(x, w) + b)))(w)
    _assert_close("pointwise_matmul dW", g1, g2)


def check_eval_parity():
    """Full-model eval parity, compiled: fused kernels vs XLA path."""
    from adversarial_learning_on_pointclouds_tpu.models import (
        apply_classifier, apply_discriminator, apply_discriminator_fused,
        apply_segmenter, init_classifier, init_discriminator,
        init_segmenter,
    )
    from adversarial_learning_on_pointclouds_tpu.ops import use_pallas
    B, N = 8, 1024
    x = _inputs(B, N)
    params, state = init_classifier(jax.random.PRNGKey(3), 40,
                                    feature_transform=True)
    ref, _, _, _ = jax.jit(
        lambda p, s, x: apply_classifier(p, s, x, train=False))(
            params, state, x)
    with use_pallas():
        pal, _, _, _ = jax.jit(
            lambda p, s, x: apply_classifier(p, s, x, train=False))(
                params, state, x)
    _assert_close("classifier eval (fused kernels)", pal, ref)

    sp, ss = init_segmenter(jax.random.PRNGKey(4), 50,
                            feature_transform=True)
    ref, _, _, _ = jax.jit(
        lambda p, s, x: apply_segmenter(p, s, x, train=False))(sp, ss, x)
    with use_pallas():
        pal, _, _, _ = jax.jit(
            lambda p, s, x: apply_segmenter(p, s, x, train=False))(sp, ss, x)
    _assert_close("segmenter eval (fused trunk + streamed head)", pal, ref)

    dp = init_discriminator(jax.random.PRNGKey(5), 50)
    probs = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(6),
                                             (B, N, 50)), -1)
    _assert_close("discriminator fused stack",
                  apply_discriminator_fused(dp, probs),
                  apply_discriminator(dp, probs))


def check_augment_distributions():
    """Augment kernel distribution checks (real on-core PRNG, TPU only)."""
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        augment_fused,
    )
    B = 8
    x = _inputs(B)
    y = augment_fused.augment_fused(jnp.int32(7), x, rotate=True,
                                    jitter=False, dropout=False)
    _assert_close("augment rotate preserves norms",
                  jnp.linalg.norm(y, axis=-1), jnp.linalg.norm(x, axis=-1),
                  rtol=1e-4)
    _assert_close("augment rotate preserves Y", y[..., 1], x[..., 1],
                  rtol=1e-5)
    deltas = [float(jnp.max(jnp.abs(y[i] - x[i]))) for i in range(4)]
    distinct = len({round(d, 4) for d in deltas}) > 1
    print(f"[{'OK ' if distinct else 'FAIL'}] per-cloud angles distinct: "
          f"{deltas[:4]}")
    assert distinct, deltas

    yj = augment_fused.augment_fused(jnp.int32(7), x, rotate=False,
                                     jitter=True, dropout=False,
                                     sigma=0.5, clip=0.05)
    d = np.abs(np.asarray(yj - x))
    print(f"[{'OK ' if 0 < d.max() <= 0.0505 else 'FAIL'}] jitter clipped: "
          f"max={d.max():.4f}")
    assert 0.0 < d.max() <= 0.05 * 1.001
    sigma_small = augment_fused.augment_fused(
        jnp.int32(7), x, rotate=False, jitter=True, dropout=False,
        sigma=0.01, clip=0.05)
    noise = np.asarray(sigma_small - x).ravel()
    print(f"   jitter std={noise.std():.4f} (expect ~0.01), "
          f"mean={noise.mean():.5f}")
    assert 0.005 < noise.std() < 0.02, noise.std()

    yd = augment_fused.augment_fused(jnp.int32(3), x, rotate=False,
                                     jitter=False, dropout=True)
    changed = ~np.all(np.isclose(np.asarray(yd), np.asarray(x)), axis=-1)
    frac = changed.mean()
    print(f"[{'OK ' if 0 < frac < 0.9 else 'FAIL'}] dropout frac={frac:.3f}")
    assert 0 < frac < 0.9, frac
    xn, ydn = np.asarray(x), np.asarray(yd)
    for bi in range(B):
        idx = np.nonzero(changed[bi])[0]
        if len(idx):
            assert np.allclose(ydn[bi, idx], xn[bi, 0], atol=1e-6)
    print("[OK ] dropout replaces with first point")


def check_training_grads():
    """Fused TRAINING kernels, compiled: grads vs the jnp path (batch 8+
    keeps small-batch BN amplification bounded; see tests)."""
    from adversarial_learning_on_pointclouds_tpu import losses as _losses
    from adversarial_learning_on_pointclouds_tpu.models import (
        apply_segmenter, init_segmenter,
    )
    from adversarial_learning_on_pointclouds_tpu.ops import use_pallas
    B, N = 8, 1024
    x = _inputs(B, N)
    sp, ss = init_segmenter(jax.random.PRNGKey(4), 50,
                            feature_transform=True)
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
    print(f"[{'OK ' if worst <= 2e-2 * (1 + scale) else 'FAIL'}] fused "
          f"TRAINING kernels grads: worst={worst:.2e} (scale {scale:.2e})")
    assert worst <= 2e-2 * (1 + scale), (worst, scale)


def check_trunk_grouped():
    """Compiled groups=2 fused trunk (``--paired_trunks``) vs two
    sequential compiled calls: pooled outputs and per-group statistics
    must match exactly (same per-cloud tiling — the grouped kernel only
    re-routes the stat accumulators), gradients at the fp-reassociation
    floor (the weight reduction order differs: one 2m-row matmul vs a
    sum of two m-row matmuls)."""
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        trunk_train,
    )
    B, N, C = 8, 1024, 64
    k = jax.random.split(jax.random.PRNGKey(7), 10)
    xa = jax.random.normal(k[0], (B, N, C), jnp.float32)
    xb = jax.random.normal(k[1], (B, N, C), jnp.float32)
    args = (jax.random.normal(k[2], (C, 128)) / 8,
            0.1 * jax.random.normal(k[3], (128,)),
            1 + 0.1 * jax.random.normal(k[4], (128,)),
            0.1 * jax.random.normal(k[5], (128,)),
            jax.random.normal(k[6], (128, 1024)) / 11,
            0.1 * jax.random.normal(k[7], (1024,)),
            1 + 0.1 * jax.random.normal(k[8], (1024,)),
            0.1 * jax.random.normal(k[9], (1024,)))

    seq = jax.jit(lambda x, *a: trunk_train.trunk2_train(x, *a))
    grp = jax.jit(lambda x, *a: trunk_train.trunk2_train(x, *a, groups=2))
    ga, mu2a, _, _, _ = seq(xa, *args)
    gb, mu2b, _, _, _ = seq(xb, *args)
    gg, mu2g, _, _, _ = grp(jnp.concatenate([xa, xb]), *args)
    d_pool = float(jnp.max(jnp.abs(gg - jnp.concatenate([ga, gb]))))
    d_mu = float(jnp.max(jnp.abs(mu2g - jnp.stack([mu2a, mu2b]))))

    gs = jax.jit(jax.grad(lambda a: jnp.sum(seq(xa, *a)[0] ** 2)
                          + jnp.sum(seq(xb, *a)[0] ** 2)))(args)
    gp = jax.jit(jax.grad(lambda a: jnp.sum(
        grp(jnp.concatenate([xa, xb]), *a)[0] ** 2)))(args)
    scale = max(float(jnp.max(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(gs))
    worst = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree_util.tree_leaves(gp),
                                jax.tree_util.tree_leaves(gs)))
    ok = d_pool == 0.0 and d_mu == 0.0 and worst <= 1e-4 * (1 + scale)
    print(f"[{'OK ' if ok else 'FAIL'}] grouped trunk compiled: "
          f"pool delta={d_pool:.1e} mu delta={d_mu:.1e} "
          f"grad worst={worst:.2e} (scale {scale:.2e})")
    assert ok, (d_pool, d_mu, worst, scale)


def check_timing():
    """Timing sanity: fused eval vs XLA eval (informational, no assert
    beyond 'pallas not catastrophically slower')."""
    from adversarial_learning_on_pointclouds_tpu.models import (
        apply_segmenter, init_segmenter,
    )
    from adversarial_learning_on_pointclouds_tpu.ops import use_pallas
    B, N = 8, 1024
    x = _inputs(B, N)
    sp, ss = init_segmenter(jax.random.PRNGKey(4), 50,
                            feature_transform=True)
    f_ref = jax.jit(lambda p, s, x: apply_segmenter(p, s, x, train=False)[0])
    with use_pallas():
        f_pal = jax.jit(
            lambda p, s, x: apply_segmenter(p, s, x, train=False)[0])
    times = {}
    for name, f in (("xla", f_ref), ("pallas", f_pal)):
        r = f(sp, ss, x)
        float(jnp.sum(r))
        t0 = time.perf_counter()
        for _ in range(20):
            r = f(sp, ss, x)
        float(jnp.sum(r))
        dt = (time.perf_counter() - t0) / 20
        times[name] = dt
        print(f"   seg eval [{name}]: {dt * 1e3:.2f} ms "
              f"({B * N / dt / 1e6:.1f} M pts/s)")
    assert times["pallas"] < 3 * times["xla"], times


def check_fc_head_train():
    """Fused T-Net fc-head TRAINING kernel, compiled at real shapes
    (B=32, 1024->512->256->k*k for k=3 and 64): output, batch stats, and
    every gradient vs the fp32-pinned layerwise jnp chain."""
    from adversarial_learning_on_pointclouds_tpu.models.core import BN_EPS
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        fc_head_train,
    )
    hi = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)

    def ref(h, w1, b1, g1, be1, w2, b2, g2, be2, w3, b3):
        z1 = hi(h, w1) + b1
        h1 = jnp.maximum((z1 - z1.mean(0)) * jax.lax.rsqrt(
            z1.var(0) + BN_EPS) * g1 + be1, 0)
        z2 = hi(h1, w2) + b2
        h2 = jnp.maximum((z2 - z2.mean(0)) * jax.lax.rsqrt(
            z2.var(0) + BN_EPS) * g2 + be2, 0)
        return hi(h2, w3) + b3

    for k in (3, 64):
        rng = np.random.default_rng(k)
        dims = (1024, 512, 256, k * k)
        h = jnp.asarray(rng.standard_normal((32, dims[0]), np.float32))
        args = [h]
        for cin, cout in zip(dims[:-1], dims[1:]):
            args += [jnp.asarray(rng.standard_normal(
                         (cin, cout), np.float32) * (1.0 / np.sqrt(cin))),
                     jnp.asarray(rng.standard_normal(cout, np.float32) * .1)]
            if cout != dims[-1]:
                args += [jnp.asarray(rng.uniform(.5, 1.5, cout)
                                     .astype(np.float32)),
                         jnp.asarray(rng.standard_normal(cout, np.float32)
                                     * .1)]
        out = jax.jit(lambda *a: fc_head_train.fc_head_train(*a)[0])(*args)
        _assert_close(f"fc_head_train k={k} fwd", out, ref(*args))
        gp = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(
            fc_head_train.fc_head_train(*a)[0])),
            argnums=tuple(range(11))))(*args)
        gr = jax.jit(jax.grad(lambda *a: jnp.sum(jnp.sin(ref(*a))),
                              argnums=tuple(range(11))))(*args)
        worst = max(float(jnp.max(jnp.abs(a - b))) /
                    max(float(jnp.max(jnp.abs(b))), 1.0)
                    for a, b in zip(gp, gr))
        print(f"[{'OK ' if worst <= 1e-3 else 'FAIL'}] fc_head_train k={k} "
              f"grads: worst rel={worst:.2e}")
        assert worst <= 1e-3, worst


def check_pool_fc_epilogue():
    """Trunk-exit epilogue kernel (fc1 + batch-BN1 + ReLUs), compiled at
    real head shapes (B=32 per stream, 1024->512): groups=1 (the default
    fc-head path) and groups=2 (the --paired_heads per-stream grouped-BN
    variant) vs the fp32-pinned jnp chain — values and gradients."""
    from adversarial_learning_on_pointclouds_tpu.models.core import BN_EPS
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        pool_fc_epilogue,
    )
    hi = functools.partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    rng = np.random.default_rng(21)
    B, C0, C1 = 32, 1024, 512
    w1 = jnp.asarray((rng.standard_normal((C0, C1)) / np.sqrt(C0))
                     .astype(np.float32))
    b1 = jnp.asarray(0.1 * rng.standard_normal(C1).astype(np.float32))
    g1 = jnp.asarray(rng.uniform(0.5, 1.5, C1).astype(np.float32))
    be1 = jnp.asarray(0.1 * rng.standard_normal(C1).astype(np.float32))
    rm1 = jnp.asarray(0.05 * rng.standard_normal(C1).astype(np.float32))

    def ref(g, w1, g1, be1, groups):
        h = jnp.maximum(g, 0.0)
        z1 = hi(h, w1) + b1
        zg = z1.reshape(groups, z1.shape[0] // groups, C1)
        mu = zg.mean(1, keepdims=True)
        var = zg.var(1, keepdims=True)
        h1 = jnp.maximum((zg - mu) * jax.lax.rsqrt(var + BN_EPS)
                         * g1 + be1, 0.0)
        return h1.reshape(z1.shape[0], C1)

    for groups in (1, 2):
        g = jnp.asarray(rng.standard_normal(
            (groups * B, C0)).astype(np.float32))
        out = jax.jit(lambda g, w1, g1, be1: pool_fc_epilogue.relu_fc_bn_relu(
            g, w1, b1, g1, be1, rm1=rm1, groups=groups)[0])(g, w1, g1, be1)
        _assert_close(f"pool_fc_epilogue groups={groups} fwd", out,
                      ref(g, w1, g1, be1, groups))
        gp = jax.jit(jax.grad(
            lambda g, w1, g1, be1: jnp.sum(jnp.sin(
                pool_fc_epilogue.relu_fc_bn_relu(
                    g, w1, b1, g1, be1, rm1=rm1, groups=groups)[0])),
            argnums=(0, 1, 2, 3)))(g, w1, g1, be1)
        gr = jax.jit(jax.grad(
            lambda g, w1, g1, be1: jnp.sum(jnp.sin(
                ref(g, w1, g1, be1, groups))),
            argnums=(0, 1, 2, 3)))(g, w1, g1, be1)
        worst = max(float(jnp.max(jnp.abs(a - b))) /
                    max(float(jnp.max(jnp.abs(b))), 1.0)
                    for a, b in zip(gp, gr))
        print(f"[{'OK ' if worst <= 1e-3 else 'FAIL'}] pool_fc_epilogue "
              f"groups={groups} grads: worst rel={worst:.2e}")
        assert worst <= 1e-3, worst


def check_ref_npoints(ns=(2500,)):
    """Compiled kernels at the reference lineage's seg default N=2500 —
    a NON-power-of-two point count where ``_tile_n`` falls back to one
    full-width N tile (2500 % 8 != 0, so every cap divisor fails; the
    eval megakernels pad N up to the tile cap — ``_pad_n_to_tile``).
    The CPU suite runs this in interpreter mode only; Mosaic tile
    legality and VMEM fit exist only compiled.

    ``ns`` widens the sweep to other reference-plausible point counts
    (VERDICT r4 next #2): 1000/3000 tile normally (both have
    multiple-of-8 divisors), 1500 exercises the pad path at a second
    size (1500 = 4x375, no multiple-of-8 divisor)."""
    from adversarial_learning_on_pointclouds_tpu import losses as _losses
    from adversarial_learning_on_pointclouds_tpu.models import (
        apply_segmenter, init_segmenter,
    )
    from adversarial_learning_on_pointclouds_tpu.ops import use_pallas
    sp, ss = init_segmenter(jax.random.PRNGKey(4), 50,
                            feature_transform=True)
    for N in ns:
        B = 4
        x = _inputs(B, N)
        labels = jax.random.randint(jax.random.PRNGKey(9), (B, N), 0, 50)

        def loss(p, use, train):
            def inner():
                logp, _, tf, _ = apply_segmenter(p, ss, x, train=train)
                out = _losses.nll_loss(logp, labels)
                return out + (0.001 * _losses.orthogonality_reg(tf)
                              if train else 0.0)
            if use:
                with use_pallas():
                    return inner()
            return inner()

        for train in (False, True):
            ref = float(jax.jit(lambda p: loss(p, False, train))(sp))
            pal = float(jax.jit(lambda p: loss(p, True, train))(sp))
            rel = abs(pal - ref) / max(abs(ref), 1e-8)
            print(f"[{'OK ' if rel <= 1e-3 else 'FAIL'}] N={N} compiled "
                  f"{'train' if train else 'eval'} loss: rel={rel:.2e}",
                  flush=True)
            assert rel <= 1e-3, (N, train, pal, ref)
        g = jax.jit(jax.grad(lambda p: loss(p, True, True)))(sp)
        assert all(bool(jnp.all(jnp.isfinite(l)))
                   for l in jax.tree_util.tree_leaves(g))
        print(f"[OK ] N={N} compiled train grads finite", flush=True)


def check_ref_npoints_sweep():
    """The wider N sweep (separate entry so the default chip suite stays
    ~8 min; run via ``--only npoints_sweep`` or the round-5 chip agenda)."""
    check_ref_npoints(ns=(1000, 1500, 3000))


def check_disc_geometry_width():
    """Compiled fused-discriminator kernels at the --d_geometry input
    width (k+3 = 53 channels — a lane count no other path uses; the CPU
    suite covers it in interpreter mode only)."""
    from adversarial_learning_on_pointclouds_tpu.models.discriminator import (
        apply_discriminator, init_discriminator,
    )
    from adversarial_learning_on_pointclouds_tpu.ops import use_pallas
    B, N, C = 8, 512, 53
    dp = init_discriminator(jax.random.PRNGKey(0), C)
    x = jax.nn.softmax(jax.random.normal(jax.random.PRNGKey(1), (B, N, C)))

    def loss(p, use):
        def inner():
            return jnp.sum(jnp.tanh(apply_discriminator(p, x)))
        if use:
            with use_pallas():
                return inner()
        return inner()

    ref = float(jax.jit(lambda p: loss(p, False))(dp))
    pal = float(jax.jit(lambda p: loss(p, True))(dp))
    rel = abs(pal - ref) / max(abs(ref), 1e-8)
    g_ref = jax.jit(jax.grad(lambda p: loss(p, False)))(dp)
    g_pal = jax.jit(jax.grad(lambda p: loss(p, True)))(dp)
    scale = max(float(jnp.max(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(g_ref))
    worst = max(float(jnp.max(jnp.abs(a - b)))
                for a, b in zip(jax.tree_util.tree_leaves(g_pal),
                                jax.tree_util.tree_leaves(g_ref)))
    ok = rel <= 1e-4 and worst <= 1e-3 * (1 + scale)
    print(f"[{'OK ' if ok else 'FAIL'}] disc kernels at C=53 "
          f"(--d_geometry): loss rel={rel:.2e} grad worst={worst:.2e}")
    assert ok, (rel, worst, scale)


ALL_CHECKS = (check_pointwise_matmul, check_eval_parity,
              check_augment_distributions, check_training_grads,
              check_fc_head_train, check_pool_fc_epilogue,
              check_trunk_grouped, check_ref_npoints,
              check_disc_geometry_width, check_timing)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", type=str, default=None,
                    help="run a single check by (suffix of its) name, "
                         "e.g. --only npoints_sweep")
    a = ap.parse_args()
    checks = ALL_CHECKS
    if a.only:
        pool = ALL_CHECKS + (check_ref_npoints_sweep,)
        checks = tuple(f for f in pool if f.__name__.endswith(a.only))
        if not checks:
            sys.exit(f"no check matches --only {a.only}")
    print("devices:", jax.devices())
    failures = []
    for fn in checks:
        try:
            fn()
        except AssertionError as e:
            failures.append((fn.__name__, e))
    print("ALL OK" if not failures else f"FAILURES: {failures}")
    sys.exit(0 if not failures else 1)


if __name__ == "__main__":
    main()
