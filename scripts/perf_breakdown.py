"""Component-level timing breakdown of the adversarial train step on TPU.

Times jitted fwd+bwd of each model component at bench shapes (batch 32,
2048 points, bf16 mixed precision, Pallas on) to locate the remaining
step-time share (ROADMAP round-2 item: T-Net cost attack). Each component
is timed as loss-like scalar -> grad, matching its role in the real step.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, f, *args, steps=30):
    r = f(*args)
    jax.tree_util.tree_map(lambda x: x, r)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))  # barrier via readback
    t0 = time.perf_counter()
    for _ in range(steps):
        r = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:<42s} {dt * 1e3:8.3f} ms")
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--points", type=int, default=2048)
    p.add_argument("--fp32", action="store_true")
    args = p.parse_args()

    from adversarial_learning_on_pointclouds_tpu.models import tnet
    from adversarial_learning_on_pointclouds_tpu.models.encoder import (
        apply_encoder_parts, init_encoder,
    )
    from adversarial_learning_on_pointclouds_tpu.models import (
        apply_segmenter, init_segmenter,
    )
    from adversarial_learning_on_pointclouds_tpu.ops import (
        mixed_precision, use_pallas,
    )

    B, N = args.batch, args.points
    x = jax.device_put(np.random.default_rng(0).standard_normal(
        (B, N, 3)).astype(np.float32))
    x64 = jax.device_put(np.random.default_rng(1).standard_normal(
        (B, N, 64)).astype(np.float32))

    with use_pallas(), mixed_precision(enabled=not args.fp32):
        tp3, ts3 = tnet.init_tnet(jax.random.PRNGKey(0), k=3)
        tp64, ts64 = tnet.init_tnet(jax.random.PRNGKey(1), k=64)
        ep, es = init_encoder(jax.random.PRNGKey(2), feature_transform=True)
        sp, ss = init_segmenter(jax.random.PRNGKey(3), 50,
                                feature_transform=True)

        def g(fn):
            return jax.jit(jax.grad(fn))

        stn3_fb = g(lambda p: jnp.sum(
            tnet.apply_tnet(p, ts3, x, train=True)[0] ** 2))
        stn64_fb = g(lambda p: jnp.sum(
            tnet.apply_tnet(p, ts64, x64, train=True)[0] ** 2))
        enc_fb = g(lambda p: jnp.sum(
            apply_encoder_parts(p, es, x, train=True)[1] ** 2))
        seg_fb = g(lambda p: jnp.sum(
            apply_segmenter(p, ss, x, train=True)[0] ** 2))

        t3 = timeit("STN3d fwd+bwd", stn3_fb, tp3)
        t64 = timeit("STNkd(64) fwd+bwd", stn64_fb, tp64)
        te = timeit("encoder (incl. both T-nets) fwd+bwd", enc_fb, ep)
        ts_ = timeit("full segmenter G fwd+bwd", seg_fb, sp)
        print(f"\nT-net share of encoder: {(t3 + t64) / te:.1%}; "
              f"encoder share of G: {te / ts_:.1%}; "
              f"T-net share of G: {(t3 + t64) / ts_:.1%}")


if __name__ == "__main__":
    main()
