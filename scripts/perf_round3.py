"""Round-3 perf experiments (VERDICT r2 next #2): measured on-chip.

1. ``epilogue``: the pool-affine + ReLU + fc1 + BN1-stats region at real
   T-Net head shapes (B=32, 1024->512), XLA chain vs the fused Pallas
   kernel (``pool_fc_epilogue``) — fwd and fwd+bwd.
2. ``stash``: the fused training trunk with fp32 vs bf16 z2 stash — the
   stash-traffic share of trunk time. fp8/int8 stashes could at best
   halve the bf16 stash traffic again, so the fp32->bf16 delta UPPER
   BOUNDS any further stash-dtype win; this is the written measurement
   the verdict asked for on idea #2b.
3. ``heads``: sequential vs cross-stream-batched T-Net fc head chains at
   [B,1024] vs [2B,1024] (the --paired_heads core claim, isolated).

Each prints ms timings; bench.py --paired_heads gives the end-to-end
number.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, f, *args, steps=50):
    r = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))  # readback barrier
    t0 = time.perf_counter()
    for _ in range(steps):
        r = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:<52s} {dt * 1e3:8.3f} ms")
    return dt


def exp_epilogue():
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        pool_fc_epilogue,
    )

    B, C3, C1 = 32, 1024, 512
    rng = np.random.default_rng(0)
    mx = jax.device_put(rng.standard_normal((B, C3)).astype(np.float32) + 1)
    mn = jax.device_put(np.asarray(mx) - 1.0)
    s3c = jax.device_put(rng.standard_normal(C3).astype(np.float32))
    t3 = jax.device_put(0.1 * rng.standard_normal(C3).astype(np.float32))
    w1 = jax.device_put(0.05 * rng.standard_normal(
        (C3, C1)).astype(np.float32))
    b1 = jax.device_put(0.1 * rng.standard_normal(C1).astype(np.float32))
    g1 = jax.device_put(np.ones(C1, np.float32))
    be1 = jax.device_put(np.zeros(C1, np.float32))
    args = (mx, mn, s3c, t3, w1, b1, g1, be1)

    def xla(mx, mn, s3c, t3, w1, b1, g1, be1):
        from adversarial_learning_on_pointclouds_tpu.models.core import BN_EPS
        g = jnp.where(s3c >= 0, mx, mn) * s3c + t3
        h = jnp.maximum(g, 0.0)
        z1 = jnp.matmul(h, w1, preferred_element_type=jnp.float32) + b1
        mu, var = z1.mean(0), z1.var(0)
        h1 = jnp.maximum(
            (z1 - mu) * jax.lax.rsqrt(var + BN_EPS) * g1 + be1, 0.0)
        return h1, h, mu, var

    def pal(*a):
        h1, h, mu, var = pool_fc_epilogue.pool_fc_epilogue(*a)
        return h1, h, mu, var

    timeit("epilogue fwd [xla]", jax.jit(xla), *args)
    timeit("epilogue fwd [pallas]", jax.jit(pal), *args)

    def loss(fn):
        def f(*a):
            z1, h, _, _ = fn(*a)
            return jnp.sum(z1 * z1) + jnp.sum(h)
        return jax.jit(jax.grad(f, argnums=tuple(range(6))))

    timeit("epilogue fwd+bwd [xla]", loss(xla), *args)
    timeit("epilogue fwd+bwd [pallas]", loss(pal), *args)


def exp_stash():
    from adversarial_learning_on_pointclouds_tpu.models import core
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        trunk_train,
    )

    B, N = 32, 2048
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((B, N, 64)).astype(np.float32))
    p = {}
    for name, (ci, co) in (("w2", (64, 128)), ("w3", (128, 1024))):
        p[name] = jax.device_put(
            (rng.standard_normal((ci, co)) / np.sqrt(ci)).astype(np.float32))
    b2 = jax.device_put(np.zeros(128, np.float32))
    b3 = jax.device_put(np.zeros(1024, np.float32))
    ones = lambda c: jax.device_put(np.ones(c, np.float32))  # noqa: E731
    zeros = lambda c: jax.device_put(np.zeros(c, np.float32))  # noqa: E731

    def run(x):
        g, *_ = trunk_train.trunk2_train(
            x, p["w2"], b2, ones(128), zeros(128),
            p["w3"], b3, ones(1024), zeros(1024))
        return g

    f_g = jax.jit(jax.grad(lambda x: jnp.sum(run(x) ** 2)))
    # fp32 stash (no mixed-precision scope)
    timeit("trunk2 fwd+bwd, fp32 z2 stash", f_g, x)
    with core.mixed_precision():
        f_g16 = jax.jit(jax.grad(lambda x: jnp.sum(run(x) ** 2)))
        timeit("trunk2 fwd+bwd, bf16 z2 stash (mixed precision)", f_g16, x)


def exp_heads():
    from adversarial_learning_on_pointclouds_tpu.models import tnet

    rng = np.random.default_rng(0)
    params, state = tnet.init_tnet(jax.random.PRNGKey(0), k=64)
    h1 = jax.device_put(rng.standard_normal((32, 1024)).astype(np.float32))
    h2 = jax.device_put(rng.standard_normal((32, 1024)).astype(np.float32))
    hb = jnp.concatenate([h1, h2], axis=0)

    def seq(p, a, b):
        # State chained a -> b like the real sequential path.
        o1, st1 = tnet._fc_head_apply(p, state, a, True)
        o2, _ = tnet._fc_head_apply(p, {**state, **st1}, b, True)
        return jnp.sum(o1 ** 2) + jnp.sum(o2 ** 2)

    def paired(p, ab):
        # streams=2: the SHIPPED --paired_heads path — batched matmuls
        # with PER-STREAM grouped-BN statistics (this measurement went
        # stale when paired heads switched from combined-2B BN to
        # grouped BN in 8d2d50b; streams=2 restores like-for-like).
        o, _ = tnet._fc_head_apply(p, state, ab, True, streams=2)
        return jnp.sum(o ** 2)

    timeit("2x fc head fwd+bwd sequential [B=32]",
           jax.jit(jax.grad(seq)), params, h1, h2)
    timeit("1x fc head fwd+bwd batched grouped-BN [2B=64]",
           jax.jit(jax.grad(paired)), params, hb)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", type=str, default="all",
                   choices=("all", "epilogue", "stash", "heads"))
    a = p.parse_args()
    from adversarial_learning_on_pointclouds_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    print(f"devices: {jax.devices()}")
    if a.exp in ("all", "epilogue"):
        exp_epilogue()
    if a.exp in ("all", "stash"):
        exp_stash()
    if a.exp in ("all", "heads"):
        exp_heads()


if __name__ == "__main__":
    main()
