"""Fused on-device augmentation chain as a single Pallas kernel.

The reference runs normalize/rotate/jitter/dropout per sample in numpy on
CPU workers (``upstream:provider.py``; SURVEY.md §2.2). The jnp chain in
``data/augment.py`` already runs fused on device inside the train step;
this kernel goes one step further and does the whole chain in ONE pass
over the cloud using the on-core PRNG (``pltpu.prng_*``), with the
rotation matrix built in-register — one HBM read + one write per point
(SURVEY.md §2.9 ``kernels/augment.py``).

Semantics match the jnp chain *distributionally* (uniform angle, clipped
Gaussian jitter, U(0, max_ratio) dropout with first-point replacement) but
not bit-for-bit — the RNG streams differ (threefry vs. on-core PRNG), as
documented in the parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from adversarial_learning_on_pointclouds_tpu.ops.kernels.shared_mlp import (
    _interpret,
)


def _interpret_mode():
    # The plain interpreter has no lowering for pltpu.prng_*; the TPU
    # interpreter accepts them but stubs random bits to zeros — fine for
    # structural/compile coverage on CPU (distribution tests are TPU-only).
    return pltpu.InterpretParams() if _interpret() else False

_TWO_PI = 6.283185307179586


def _uniform_from_bits(bits):
    """Random bits -> f32 uniform in [0, 1) (mantissa-fill trick).

    ``prng_random_bits`` yields int32 on some backends; an arithmetic
    ``>> 9`` would sign-extend into the exponent and produce NaNs, so the
    bits are bitcast to uint32 first (measured on TPU).
    """
    bits = pltpu.bitcast(bits, jnp.uint32)
    f = pltpu.bitcast((bits >> 9) | jnp.uint32(0x3F800000), jnp.float32)
    return f - 1.0


def _normal_from_bits(b1, b2):
    """Box-Muller from two uniform draws."""
    u1 = jnp.maximum(_uniform_from_bits(b1), 1e-7)
    u2 = _uniform_from_bits(b2)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    return r * jnp.cos(_TWO_PI * u2)


def _augment_kernel(sigma, clip, max_ratio, do_rotate, do_jitter,
                    do_dropout, seed_ref, x_ref, o_ref):
    b = pl.program_id(0)
    pltpu.prng_seed(seed_ref[0] + b)
    pts = x_ref[0]                       # [N, 3]
    n = pts.shape[0]

    if do_rotate:
        # One angle per cloud from the per-cloud PRNG stream.
        angle_bits = pltpu.prng_random_bits((1, 1))
        angle = _uniform_from_bits(angle_bits)[0, 0] * _TWO_PI
        c, s = jnp.cos(angle), jnp.sin(angle)
        x0, x1, x2 = pts[:, 0], pts[:, 1], pts[:, 2]
        # Y-axis rotation, row convention of provider.py ([[c,0,s],[0,1,0],
        # [-s,0,c]] applied as points @ R).
        pts = jnp.stack([c * x0 - s * x2, x1, s * x0 + c * x2], axis=-1)

    if do_jitter:
        b1 = pltpu.prng_random_bits((n, 3))
        b2 = pltpu.prng_random_bits((n, 3))
        noise = sigma * _normal_from_bits(b1, b2)
        pts = pts + jnp.clip(noise, -clip, clip)

    if do_dropout:
        ratio_bits = pltpu.prng_random_bits((1, 1))
        ratio = _uniform_from_bits(ratio_bits)[0, 0] * max_ratio
        u = _uniform_from_bits(pltpu.prng_random_bits((n, 1)))
        drop = u <= ratio                # [N, 1]
        first = pts[0:1, :]
        pts = jnp.where(drop, first, pts)

    o_ref[...] = pts[None]


def augment_fused(seed: jnp.ndarray, points: jnp.ndarray,
                  rotate: bool = True, jitter: bool = True,
                  dropout: bool = False, sigma: float = 0.01,
                  clip: float = 0.05, max_dropout_ratio: float = 0.875,
                  ) -> jnp.ndarray:
    """One-pass fused augmentation. ``seed`` int32 scalar; ``points``
    ``[B, N, 3]``. Each cloud uses an independent PRNG stream."""
    bsz, n, _ = points.shape
    kernel = functools.partial(_augment_kernel, sigma, clip,
                               max_dropout_ratio, rotate, jitter, dropout)
    return pl.pallas_call(
        kernel,
        grid=(bsz,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, 3), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, n, 3), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, 3), points.dtype),
        interpret=_interpret_mode(),
    )(seed.reshape(1).astype(jnp.int32), points)
