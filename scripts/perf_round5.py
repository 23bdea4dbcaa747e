"""Round-5 perf: turn the T-Net fc-head floor into a NUMBER.

VERDICT r4 next #4: six attacks on the fc-head latency floor are
documented with receipts, but the claimed residual ("serial tiny-op
chain on one TensorCore") was never modeled — "resisted six attacks" is
not distinguishable from "stopped looking" without a derived ceiling.

Three measurements, one derivation:

1. ``chains`` — per-op ISSUE latency on the real chip, fit as the slope
   of K-dependent-op chains inside one jitted program (launch overhead
   cancels; the dependency chain forbids overlap, which is exactly the
   fc-head regime):
     - tiny matmul  [64,1024] @ [1024,1024] (MXU, head-row shapes)
     - elementwise  [64,1024] fma
     - batch-reduce + broadcast ([64,1024] -> [1024] -> [64,1024]),
       the BN-statistics shape
2. ``heads`` — the MARGINAL in-program cost of one full paired fc-head
   fwd+bwd (the real ``_fc_head_apply`` path: grouped epilogue kernel +
   XLA fc2/BN2/fc3), as the slope between R and 2R independent heads in
   one program. Slope, not absolute: the bench step amortizes launches,
   so only the in-program marginal cost is attributable to the head.
3. ``opcount`` — primitive ops on the head's fwd+bwd jaxpr, split
   matmul / reduce / elementwise.

Derivation printed at the end: latency bound = sum(class_count x
class_latency); measured marginal head cost vs that bound says whether
the head sits at its issue-latency floor; substituting the bound into
the measured step time gives the achievable step ceiling in pts/s/chip
(DESIGN.md perf-model section records the verdict).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B2 = 64          # paired rows: 2 streams x reference batch 32
STEP_MS = 12.76  # bench default ms/step-equivalent (BENCH r4/r5, scan-8)


def timeit(name, f, *args, steps=30):
    r = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))  # readback barrier
    t0 = time.perf_counter()
    for _ in range(steps):
        r = f(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
    dt = (time.perf_counter() - t0) / steps
    print(f"{name:<58s} {dt * 1e3:8.3f} ms", flush=True)
    return dt


def _chain(body, h0, k):
    def f(h):
        for _ in range(k):
            h = body(h)
        return jnp.sum(h)
    return jax.jit(f), h0


def exp_chains():
    """Per-op issue latency from dependent-chain slopes."""
    rng = np.random.default_rng(0)
    h0 = jax.device_put(
        rng.standard_normal((B2, 1024)).astype(np.float32))
    w = jax.device_put(
        (rng.standard_normal((1024, 1024)) / 32).astype(np.float32))
    c = jax.device_put(rng.standard_normal(1024).astype(np.float32))
    out = {}
    from adversarial_learning_on_pointclouds_tpu.models import core
    with core.mixed_precision():
        for name, body in (
            ("matmul[64,1024]@[1024,1024]",
             lambda h: core.matmul(h, w) * (1.0 / 1024.0)),
            ("fma[64,1024]",
             lambda h: h * 1.0001 + 0.1),
            ("bn-reduce[64,1024]",
             lambda h: h - jnp.mean(h, axis=0, keepdims=True) * 0.001),
        ):
            # K spread must put the chain-time delta well above the
            # tunnel's per-launch jitter: the first run of this script
            # used K=32/96 and got a NEGATIVE bn-reduce slope (-6.7 us,
            # noise-dominated at a ~0.4 ms delta). 32 -> 512 puts the
            # matmul delta at ~4 ms and the cheapest op's at ~1 ms.
            k1, k2 = 32, 512
            f1, _ = _chain(body, h0, k1)
            f2, _ = _chain(body, h0, k2)
            t1 = timeit(f"chain {name} K={k1}", f1, h0, steps=60)
            t2 = timeit(f"chain {name} K={k2}", f2, h0, steps=60)
            per = (t2 - t1) / (k2 - k1)
            out[name] = per
            flag = "  [NOISE-BOUND: non-positive slope]" if per <= 0 else ""
            print(f"  -> per-op issue latency = {per * 1e6:8.2f} us{flag}",
                  flush=True)
    return out


def _head_fixture(k):
    from adversarial_learning_on_pointclouds_tpu.models import tnet
    params, state = tnet.init_tnet(jax.random.PRNGKey(0), k)
    head_p = {n: params[n] for n in
              ("fc1", "fc2", "fc3", "bn_fc1", "bn_fc2")}
    head_s = {n: state[n] for n in ("bn_fc1", "bn_fc2")}
    return jax.device_put(head_p), jax.device_put(head_s)


def exp_heads(reps=(2, 10)):
    """Marginal in-program cost of one paired fc-head fwd+bwd."""
    from adversarial_learning_on_pointclouds_tpu.models import core, tnet
    from adversarial_learning_on_pointclouds_tpu.ops import use_pallas

    rng = np.random.default_rng(1)
    out = {}
    for k in (3, 64):
        p, s = _head_fixture(k)
        hs = jax.device_put(np.maximum(
            rng.standard_normal((max(reps), B2, 1024)), 0)
            .astype(np.float32))

        def loss(p, r):
            tot = 0.0
            for i in range(r):
                o, _ = tnet._fc_head_apply(p, s, hs[i], train=True,
                                           streams=2)
                tot = tot + jnp.sum(o ** 2) * 1e-3
            return tot

        with core.mixed_precision(), use_pallas():
            f1 = jax.jit(jax.grad(lambda p: loss(p, reps[0])))
            f2 = jax.jit(jax.grad(lambda p: loss(p, reps[1])))
            t1 = timeit(f"paired fc-head(k={k}) fwd+bwd x{reps[0]}",
                        f1, p, steps=60)
            t2 = timeit(f"paired fc-head(k={k}) fwd+bwd x{reps[1]}",
                        f2, p, steps=60)
        per = (t2 - t1) / (reps[1] - reps[0])
        out[k] = per
        flag = "  [NOISE-BOUND: non-positive slope]" if per <= 0 else ""
        print(f"  -> marginal per-head fwd+bwd = {per * 1e3:8.3f} ms{flag}",
              flush=True)
    return out


def exp_headchain(ks=(8, 32)):
    """Serial critical-path latency of one paired fc-head fwd+bwd.

    ``exp_heads`` measures the MARGINAL cost of independent heads — a
    throughput number the chip can hide by overlapping heads. In the
    real step the T-Net head output GATES all downstream compute (the
    transform multiplies the points), so what the step actually pays is
    the head's serial latency. Chain heads dependently (each head's
    output perturbs the next head's input) and fit the slope.
    """
    from adversarial_learning_on_pointclouds_tpu.models import core, tnet
    from adversarial_learning_on_pointclouds_tpu.ops import use_pallas

    rng = np.random.default_rng(2)
    out = {}
    for k in (3, 64):
        p, s = _head_fixture(k)
        h0 = jax.device_put(np.maximum(
            rng.standard_normal((B2, 1024)), 0).astype(np.float32))

        def loss(p, r):
            h = h0
            tot = 0.0
            for _ in range(r):
                o, _ = tnet._fc_head_apply(p, s, h, train=True, streams=2)
                g = jnp.sum(o ** 2) * 1e-6
                tot = tot + g
                h = h * (1.0 + g)          # strict serial dependency
            return tot

        with core.mixed_precision(), use_pallas():
            f1 = jax.jit(jax.grad(lambda p: loss(p, ks[0])))
            f2 = jax.jit(jax.grad(lambda p: loss(p, ks[1])))
            t1 = timeit(f"serial fc-head(k={k}) fwd+bwd chain x{ks[0]}",
                        f1, p, steps=60)
            t2 = timeit(f"serial fc-head(k={k}) fwd+bwd chain x{ks[1]}",
                        f2, p, steps=60)
        per = (t2 - t1) / (ks[1] - ks[0])
        out[k] = per
        flag = "  [NOISE-BOUND: non-positive slope]" if per <= 0 else ""
        print(f"  -> serial per-head fwd+bwd latency = {per * 1e3:8.3f} "
              f"ms{flag}", flush=True)
    return out


def exp_opcount():
    """Primitive-op census of one paired head fwd+bwd (trace only)."""
    from adversarial_learning_on_pointclouds_tpu.models import core, tnet
    from adversarial_learning_on_pointclouds_tpu.ops import use_pallas
    counts = {}
    for k in (3, 64):
        p, s = _head_fixture(k)
        h = jnp.zeros((B2, 1024))

        def loss(p):
            o, _ = tnet._fc_head_apply(p, s, h, train=True, streams=2)
            return jnp.sum(o ** 2)

        with core.mixed_precision(), use_pallas():
            jaxpr = jax.make_jaxpr(jax.grad(loss))(p)
        mm = red = ew = 0
        for eqn in jaxpr.jaxpr.eqns:
            n = eqn.primitive.name
            if n in ("dot_general", "pallas_call", "custom_vjp_call",
                     "custom_vjp_call_jaxpr"):
                mm += 1
            elif n in ("reduce_sum", "reduce_max", "reduce_mean",
                       "argmax", "reduce_min"):
                red += 1
            else:
                ew += 1
        counts[k] = (mm, red, ew)
        print(f"head(k={k}) fwd+bwd jaxpr: {mm} matmul/kernel, "
              f"{red} reduce, {ew} elementwise "
              f"(total {mm + red + ew})", flush=True)
    return counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--exp", default="all",
                    choices=("all", "chains", "heads", "headchain",
                             "opcount"))
    a = ap.parse_args()
    from adversarial_learning_on_pointclouds_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()
    print(f"devices: {jax.devices()}", flush=True)
    lat = heads = counts = serial = None
    if a.exp in ("all", "chains"):
        lat = exp_chains()
    if a.exp in ("all", "opcount"):
        counts = exp_opcount()
    if a.exp in ("all", "heads"):
        heads = exp_heads()
    if a.exp in ("all", "headchain"):
        serial = exp_headchain()
    if lat and heads and counts:
        # Non-positive slopes are below the tunnel's measurement floor:
        # treat them as 0 in the bound (an under-estimate of the bound,
        # i.e. an over-estimate of the exploitable gap — conservative
        # in the direction that would keep us attacking).
        l_mm = max(lat["matmul[64,1024]@[1024,1024]"], 0.0)
        l_ew = max(lat["fma[64,1024]"], 0.0)
        l_rd = max(lat["bn-reduce[64,1024]"], 0.0)
        print("\n=== derived fc-head latency model ===")
        total_bound = 0.0
        total_meas = 0.0
        for k in (3, 64):
            mm, rd, ew = counts[k]
            # The jaxpr census over-counts the critical path (XLA fuses
            # elementwise chains into neighbors); count fused groups at
            # ~1 issue per 3 elementwise eqns, reduces at the BN-reduce
            # latency, matmuls/kernels at the matmul latency.
            bound = mm * l_mm + rd * l_rd + (ew / 3.0) * l_ew
            meas = heads[k]
            total_bound += bound
            total_meas += meas
            print(f"head(k={k}): bound {bound * 1e3:6.3f} ms vs measured "
                  f"marginal {meas * 1e3:6.3f} ms "
                  f"(ratio {meas / max(bound, 1e-12):.2f})", flush=True)
        step_meas = STEP_MS / 1e3
        step_bound = step_meas - total_meas + total_bound
        pts = 2 * 32 * 2048
        print(f"step: measured {STEP_MS:.2f} ms -> heads at issue-latency "
              f"floor would give {step_bound * 1e3:.2f} ms "
              f"= {pts / step_bound / 1e6:.2f}M pts/s/chip "
              f"(measured {pts / step_meas / 1e6:.2f}M)", flush=True)
    if serial:
        # The step pays each T-Net head's SERIAL latency twice per G
        # forward arm (STN3d then fSTN, strictly ordered); the scan-8
        # step runs the paired G fwd+bwd once. Removing the heads
        # ENTIRELY (latency -> 0) bounds every possible head attack.
        tot = sum(serial.values())
        step_meas = STEP_MS / 1e3
        pts = 2 * 32 * 2048
        best = step_meas - tot
        print("\n=== serial-latency ceiling ===")
        print(f"serial fc-head latency per step: k=3 "
              f"{serial[3] * 1e3:.3f} + k=64 {serial[64] * 1e3:.3f} "
              f"= {tot * 1e3:.3f} ms of {STEP_MS:.2f} ms "
              f"({tot / step_meas * 100:.1f}%)", flush=True)
        print(f"heads-free ceiling (every head attack bounded by this): "
              f"{best * 1e3:.2f} ms = {pts / best / 1e6:.2f}M pts/s/chip "
              f"(measured {pts / step_meas / 1e6:.2f}M)", flush=True)


if __name__ == "__main__":
    main()
