"""Benchmark: adversarial (G+D) train-step throughput in points/sec/chip.

Headline metric per ``BASELINE.json:2``: points/sec/chip on the combined
generator+discriminator adversarial training step (config 4 shapes: batch
32, 2048 points, 50 parts, feature transform on, on-device augmentation
fused into the step). Baseline target: 1M points/sec/chip
(``BASELINE.json:5``); ``vs_baseline`` is measured/1e6.

Prints ONE JSON line. Runs on whatever accelerator is visible (the driver
runs it on real TPU); pass ``--steps``/``--batch``/``--points`` to vary.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

_PROBE = ("import jax, jax.numpy as jnp; jax.devices(); "
          "assert float(jnp.sum(jnp.ones((8, 8)))) == 64.0")

_T0 = time.monotonic()


def _phase(msg: str) -> None:
    """Progress heartbeat on stderr (stdout stays pure: ONE JSON line).

    An externally-killed run (driver timeout — BENCH_r04 rc=124) must
    leave a tail that says which phase it died in."""
    print(f"# [t+{time.monotonic() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def _wait_for_backend(budget_s: float, verbose: bool) -> None:
    """Block until the accelerator backend answers a trivial program.

    The tunneled TPU backend can wedge for minutes-to-hours and recover
    on its own lease expiry (observed rounds 2-4); a bench invoked in
    that window used to die instantly on backend init (BENCH_r03). Probe
    in a SUBPROCESS with a hard timeout — a wedged backend HANGS the
    client rather than erroring, so an in-process attempt could never be
    retried — and retry within ``budget_s`` before giving up."""
    deadline = time.monotonic() + budget_s
    attempt = 0
    last_err = "probe timed out (wedge-style hang)"
    _phase(f"probing backend (budget {budget_s:.0f}s)")
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", _PROBE],
                               timeout=120, capture_output=True)
            if r.returncode == 0:
                _phase(f"backend healthy (probe {attempt})")
                return
            # Fast non-zero exit = a real error (broken env/plugin), not
            # a wedge — surface it instead of silently burning retries.
            last_err = (r.stderr or b"").decode(errors="replace")[-2000:]
            print(f"# backend probe {attempt} errored (rc={r.returncode}):"
                  f"\n{last_err}", file=sys.stderr, flush=True)
        except subprocess.TimeoutExpired:
            last_err = "probe timed out (wedge-style hang)"
        if time.monotonic() >= deadline:
            print(f"bench.py: accelerator backend unavailable after "
                  f"{attempt} probes over {budget_s:.0f}s — giving up. "
                  f"Last probe: {last_err}", file=sys.stderr, flush=True)
            sys.exit(1)
        # Heartbeat EVERY probe (not just --verbose): a run killed by an
        # external clock must leave a diagnosable tail (BENCH_r04 was
        # rc=124 with an empty tail — undiagnosable).
        _phase(f"probe {attempt} failed ({last_err.splitlines()[-1][:80]}); "
               f"{deadline - time.monotonic():.0f}s left, retrying in 60s")
        time.sleep(min(60.0, max(1.0, deadline - time.monotonic())))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--points", type=int, default=2048)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--warmup", type=int, default=5)
    p.add_argument("--no_pallas", action="store_true")
    p.add_argument("--pallas_train", action="store_true",
                   help="route TRAINING matmuls/pools through the "
                        "custom-VJP Pallas kernels (slower than XLA "
                        "on v5e; for comparison)")
    p.add_argument("--fp32", action="store_true",
                   help="strict fp32 (HIGHEST) numerics — the torch-parity "
                        "mode; default is standard TPU bf16 mixed precision")
    p.add_argument("--remat", action="store_true")
    p.add_argument("--fused_forward", action="store_true",
                   help="one combined G fwd / D pass over [labeled; "
                        "unlabeled] (BN stats over the combined 2B batch)")
    p.add_argument("--paired_heads", dest="paired_heads",
                   action="store_true", default=True,
                   help="batch the T-Net fc head matmuls across the two "
                        "streams with per-stream grouped-BN statistics "
                        "(exact sequential semantics). DEFAULT ON")
    p.add_argument("--no_paired_heads", dest="paired_heads",
                   action="store_false",
                   help="disable the paired heads (sequential per-stream "
                        "fc heads, the pre-round-3 default)")
    p.add_argument("--paired_trunks", action="store_true",
                   help="also batch the fused conv-trunk kernels across "
                        "the two streams (grouped per-stream BN stats; "
                        "round-4 candidate, measured −34%% — see "
                        "BASELINE.md)")
    p.add_argument("--paired_conv1", action="store_true",
                   help="batch the per-point conv1 layers across the two "
                        "streams (grouped per-stream BN1 stats — exact "
                        "sequential semantics; round-5 candidate)")
    p.add_argument("--pallas_augment", action="store_true",
                   help="fused Pallas augmentation pass inside the step "
                        "(on-core PRNG) instead of the jnp chain")
    p.add_argument("--scan", type=int, default=8,
                   help="fuse K steps per program launch via lax.scan "
                        "(amortizes dispatch; the runner's --scan mode; "
                        "0 = one step per launch)")
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--backend_wait_s", type=float, default=900.0,
                   help="how long to wait for a wedged accelerator "
                        "backend to recover before failing (0 = no wait); "
                        "default 15 min — long enough to ride out probe "
                        "blips, short enough that a driver-budget run "
                        "(BENCH_r04: rc=124 under the old 1 h default) "
                        "reaches the measurement phase with clock to "
                        "spare when the backend is healthy")
    args = p.parse_args()

    if args.paired_trunks and (not args.paired_heads or args.fused_forward):
        p.error("--paired_trunks requires the paired-heads path "
                "(drop --no_paired_heads / --fused_forward)")
    if args.paired_conv1 and (not args.paired_heads or args.fused_forward):
        p.error("--paired_conv1 requires the paired-heads path "
                "(drop --no_paired_heads / --fused_forward)")

    if args.backend_wait_s > 0:
        _wait_for_backend(args.backend_wait_s, args.verbose)

    _phase("importing jax + framework")
    import jax

    # Persistent compilation cache: the bf16 step graph can take minutes
    # to compile on this platform; cache it so repeat bench runs (e.g.
    # the driver's) start in seconds.
    from adversarial_learning_on_pointclouds_tpu.utils.compile_cache import (
        enable_persistent_cache,
    )

    enable_persistent_cache()

    import numpy as np

    from adversarial_learning_on_pointclouds_tpu.configs import AdversarialConfig
    from adversarial_learning_on_pointclouds_tpu.ops import (
        mixed_precision, use_pallas,
    )
    from adversarial_learning_on_pointclouds_tpu.train import adversarial

    n_chips = len(jax.devices())
    cfg = AdversarialConfig(batch_size=args.batch, num_points=args.points,
                            feature_transform=True, augment=True,
                            use_pallas=not args.no_pallas, bf16=not args.fp32,
                            remat=args.remat, fused_forward=args.fused_forward,
                            paired_heads=args.paired_heads,
                            paired_trunks=args.paired_trunks,
                            paired_conv1=args.paired_conv1,
                            pallas_augment=args.pallas_augment)
    g_tx, d_tx = adversarial.make_txs(cfg, steps_per_epoch=100)

    rng = np.random.default_rng(0)
    x_l = jax.device_put(
        rng.standard_normal((args.batch, args.points, 3)).astype(np.float32))
    y_l = jax.device_put(
        rng.integers(0, 50, (args.batch, args.points)).astype(np.int32))
    x_u = jax.device_put(
        rng.standard_normal((args.batch, args.points, 3)).astype(np.float32))

    on_tpu = jax.devices()[0].platform != "cpu"
    with use_pallas(cfg.use_pallas and on_tpu,
                    training=args.pallas_train), \
            mixed_precision(enabled=cfg.bf16):
        state = adversarial.create_state(cfg, 100)
        if args.scan > 0:
            # K DISTINCT batches per launch, exactly like the runner's
            # --scan mode with K-batch stacked transfers.
            k = args.scan
            xlk = jax.device_put(rng.standard_normal(
                (k, args.batch, args.points, 3)).astype(np.float32))
            ylk = jax.device_put(rng.integers(
                0, 50, (k, args.batch, args.points)).astype(np.int32))
            xuk = jax.device_put(rng.standard_normal(
                (k, args.batch, args.points, 3)).astype(np.float32))

            def step(s):  # K fused steps per launch
                s, ms = adversarial.train_steps_scan(
                    s, xlk, ylk, xuk, cfg=cfg, g_tx=g_tx, d_tx=d_tx)
                return s, {kk: v[-1] for kk, v in ms.items()}
        else:
            step = lambda s: adversarial.train_step(  # noqa: E731
                s, x_l, y_l, x_u, cfg=cfg, g_tx=g_tx, d_tx=d_tx)

        _phase("compiling + warmup (seconds if the persistent cache is "
               "warm, minutes cold)")
        t0 = time.perf_counter()
        metrics = None
        for _ in range(args.warmup):
            state, metrics = step(state)
        # Host readback: through the axon tunnel, block_until_ready is not
        # a reliable execution barrier — fetching a value is.
        if metrics is not None:
            float(metrics["loss_g"])
        compile_s = time.perf_counter() - t0

        # Points processed per launch: labeled + unlabeled clouds, x K
        # when scanning multiple steps per program.
        points_per_step = 2 * args.batch * args.points * max(args.scan, 1)

        # Provisional measurement FIRST (a few launches), emitted as a
        # parseable JSON line on STDERR: a run killed by an external
        # clock mid-measurement (BENCH_r04 rc=124) still leaves a number
        # in the captured tail. stdout keeps the ONE-JSON-line contract;
        # the "provisional_steps" key marks it as the short estimate.
        prov_steps = min(5, args.steps)
        t0 = time.perf_counter()
        for _ in range(prov_steps):
            state, metrics = step(state)
        float(metrics["loss_g"])
        dt_prov = (time.perf_counter() - t0) / prov_steps
        print(json.dumps({
            "metric": "adversarial_train_points_per_sec_per_chip",
            "value": round(points_per_step / dt_prov / n_chips, 1),
            "unit": "points/sec/chip",
            "vs_baseline": round(points_per_step / dt_prov / n_chips / 1e6,
                                 3),
            "provisional_steps": prov_steps,
        }), file=sys.stderr, flush=True)

        _phase(f"provisional {dt_prov * 1e3:.2f} ms/step over {prov_steps} "
               f"launches; measuring {args.steps} steps")
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, metrics = step(state)
        float(metrics["loss_g"])
        dt = (time.perf_counter() - t0) / args.steps
        _phase(f"measured {dt * 1e3:.2f} ms/step")
    pps_per_chip = points_per_step / dt / n_chips

    if args.verbose:
        print(f"# warmup+compile {compile_s:.1f}s, {dt * 1e3:.2f} ms/step, "
              f"{n_chips} chip(s), losses "
              + " ".join(f"{k}={float(v):.3f}" for k, v in metrics.items()),
              file=sys.stderr)
    print(json.dumps({
        "metric": "adversarial_train_points_per_sec_per_chip",
        "value": round(pps_per_chip, 1),
        "unit": "points/sec/chip",
        "vs_baseline": round(pps_per_chip / 1e6, 3),
    }), flush=True)


if __name__ == "__main__":
    main()
