"""Round-4 perf experiments: bound the grouped-BN TRUNK-batching upside
before building it (ROADMAP round-4 candidate; the family history — five
failed attacks on the T-Net serial chain, one +2.6% win — says measure
first).

1. ``trunks``: two sequential ``trunk2_train`` fwd+bwd at the real shape
   ``[32, 2048, 64]`` vs ONE call on the stacked ``[64, 2048, 64]``
   batch. The stacked call computes MIXED batch statistics (wrong
   numerics), but its cost is perf-representative of a groups=2 kernel:
   grouping only splits the tiny stat reductions by row block, the
   matmul/stash traffic is identical. If this probe shows no win, the
   grouped kernel is not worth building — that is the receipt.
2. ``conv1``: same probe for the per-stream conv1+BN+ReLU layers
   (``linear_bn_act`` at ``[B, N, 3->64]`` and ``[B, N, 64->64]``).

Both run in the bench's default bf16 mixed-precision mode and fp32.
``bench.py`` gives the end-to-end number if a candidate survives.
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
    print(f"{name:<58s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def _trunk_args(rng):
    p = {}
    for name, (ci, co) in (("w2", (64, 128)), ("w3", (128, 1024))):
        p[name] = jax.device_put(
            (rng.standard_normal((ci, co)) / np.sqrt(ci)).astype(np.float32))
    consts = dict(
        b2=jax.device_put(np.zeros(128, np.float32)),
        b3=jax.device_put(np.zeros(1024, np.float32)),
        g2=jax.device_put(np.ones(128, np.float32)),
        t2=jax.device_put(np.zeros(128, np.float32)),
        g3=jax.device_put(np.ones(1024, np.float32)),
        t3=jax.device_put(np.zeros(1024, np.float32)),
    )
    return p, consts


def exp_trunks(mixed: bool):
    from adversarial_learning_on_pointclouds_tpu.models import core
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        trunk_train,
    )

    B, N = 32, 2048
    rng = np.random.default_rng(0)
    xa = jax.device_put(rng.standard_normal((B, N, 64)).astype(np.float32))
    xb = jax.device_put(rng.standard_normal((B, N, 64)).astype(np.float32))
    xab = jnp.concatenate([xa, xb], axis=0)
    p, c = _trunk_args(rng)

    def run(x):
        g, *_ = trunk_train.trunk2_train(
            x, p["w2"], c["b2"], c["g2"], c["t2"],
            p["w3"], c["b3"], c["g3"], c["t3"])
        return g

    def seq(a, b):
        return jnp.sum(run(a) ** 2) + jnp.sum(run(b) ** 2)

    def stacked(ab):
        return jnp.sum(run(ab) ** 2)

    tag = "bf16" if mixed else "fp32"
    scope = core.mixed_precision() if mixed else _null()
    with scope:
        f_seq = jax.jit(jax.grad(seq, argnums=(0, 1)))
        f_stk = jax.jit(jax.grad(stacked))
        t2 = timeit(f"2x trunk2 fwd+bwd sequential [B=32] ({tag})",
                    f_seq, xa, xb)
        t1 = timeit(f"1x trunk2 fwd+bwd stacked [2B=64] ({tag})",
                    f_stk, xab)
    print(f"  -> stacked/sequential = {t1 / t2:.3f} "
          f"(per-pair delta {1e3 * (t2 - t1):+.3f} ms; x3 pairs/G-step)",
          flush=True)


def exp_conv1(mixed: bool):
    from adversarial_learning_on_pointclouds_tpu.models import core
    from adversarial_learning_on_pointclouds_tpu.ops import dispatch as ops

    B, N = 32, 2048
    rng = np.random.default_rng(1)
    for cin in (3, 64):
        xa = jax.device_put(
            rng.standard_normal((B, N, cin)).astype(np.float32))
        xb = jax.device_put(
            rng.standard_normal((B, N, cin)).astype(np.float32))
        xab = jnp.concatenate([xa, xb], axis=0)
        lin = core.torch_linear_init(jax.random.PRNGKey(0), cin, 64)
        bn_p, bn_s = core.bn_init(64)
        lin = jax.device_put(lin)
        bn_p, bn_s = jax.device_put(bn_p), jax.device_put(bn_s)

        def fwd(x):
            h, _ = ops.linear_bn_act(lin, bn_p, bn_s, x, True, "relu")
            return jnp.sum(h ** 2)

        def seq(a, b):
            return fwd(a) + fwd(b)

        tag = "bf16" if mixed else "fp32"
        scope = core.mixed_precision() if mixed else _null()
        with scope:
            t2 = timeit(f"2x conv1[{cin}->64]+BN+ReLU sequential ({tag})",
                        jax.jit(jax.grad(seq, argnums=(0, 1))), xa, xb)
            t1 = timeit(f"1x conv1[{cin}->64]+BN+ReLU stacked 2B ({tag})",
                        jax.jit(jax.grad(fwd)), xab)
        print(f"  -> stacked/sequential = {t1 / t2:.3f} "
              f"(per-pair delta {1e3 * (t2 - t1):+.3f} ms)", flush=True)


class _null:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--exp", type=str, default="all",
                   choices=("all", "trunks", "conv1"))
    a = p.parse_args()
    from adversarial_learning_on_pointclouds_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    print(f"devices: {jax.devices()}")
    for mixed in (True, False):
        if a.exp in ("all", "trunks"):
            exp_trunks(mixed)
        if a.exp in ("all", "conv1"):
            exp_conv1(mixed)


if __name__ == "__main__":
    main()
