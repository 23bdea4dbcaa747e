"""Point-wise FCN discriminator for adversarial segmentation.

Reference: ``upstream:model/discriminator.py`` — Hung et al. 2018
``FCDiscriminator`` adapted to point clouds (SURVEY.md §2.4): input is a
per-point class-probability map (``softmax(G(x))`` or one-hot ground
truth, ``[B, N, num_parts]``); a pointwise conv stack
k->64->128->256->512->1 with LeakyReLU(0.2) between layers, **no
BatchNorm** (GAN discriminator convention), outputs per-point real/fake
*logits* ``[B, N, 1]`` (loss uses BCE-with-logits).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from adversarial_learning_on_pointclouds_tpu.models import core
from adversarial_learning_on_pointclouds_tpu.ops import dispatch as ops

_WIDTHS = (64, 128, 256, 512)


def init_discriminator(key: jax.Array, num_parts: int = 50, ndf: int = 64,
                       dtype=jnp.float32) -> core.Params:
    del ndf  # widths fixed to the reference's 64-doubling stack
    keys = jax.random.split(key, 5)
    params = {}
    c_in = num_parts
    for i, c_out in enumerate(_WIDTHS, start=1):
        params[f"conv{i}"] = core.torch_linear_init(keys[i - 1], c_in, c_out, dtype)
        c_in = c_out
    params["conv5"] = core.torch_linear_init(keys[4], c_in, 1, dtype)
    return params


def apply_discriminator(params: core.Params, prob_map: jnp.ndarray,
                        ) -> jnp.ndarray:
    """``prob_map: [B, N, k]`` -> per-point real/fake logits ``[B, N, 1]``.

    Differentiable path (used inside the G and D train steps). Under
    ``use_pallas`` the whole stack runs as ONE fused kernel with a
    recompute-in-register custom VJP (``ops/kernels/disc_fused.py``) —
    the narrow five-layer stack is bandwidth-bound under XLA (measured
    2.8 ms vs ~0.6 ms bandwidth floor on v5e at batch 32x2048).
    """
    if (ops.pallas_enabled() and prob_map.ndim == 3
            and ops.train_tiling_ok(prob_map.shape[1])):
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
            disc_fused,
        )
        return disc_fused.apply(params, prob_map)
    h = prob_map
    for i in range(1, 5):
        h = ops.linear_act(params[f"conv{i}"], h, act="leaky_relu")
    return ops.linear_act(params["conv5"], h, act=None)


def apply_discriminator_fused(params: core.Params, prob_map: jnp.ndarray,
                              ) -> jnp.ndarray:
    """Inference-only: the whole 5-layer stack as ONE Pallas kernel
    (weights resident in VMEM across layers; SURVEY.md §2.9
    ``kernels/disc_head.py``). Not differentiable — eval scripts only."""
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import shared_mlp

    ws = [params[f"conv{i}"]["w"] for i in range(1, 6)]
    shifts = [params[f"conv{i}"]["b"] for i in range(1, 6)]
    scales = [jnp.ones((w.shape[1],), prob_map.dtype) for w in ws]
    acts = ["leaky_relu"] * 4 + [None]
    return shared_mlp.fused_mlp_stack(prob_map, ws, shifts, scales, acts)
