"""PointNet dense (part-segmentation) head — the adversarial *generator*.

Reference: ``upstream:pointnet/model.py::PointNetDenseCls`` (SURVEY.md
§2.3, call stack §3.2): encoder with ``global_feat=False`` produces the
``[B, N, 1088]`` concat feature; pointwise shared MLP
1088->512->256->128 (BN+ReLU) then 128->k, ``log_softmax`` over the part
classes per point (``BASELINE.json:9`` "per-point logits").
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from adversarial_learning_on_pointclouds_tpu.models import core
from adversarial_learning_on_pointclouds_tpu.models.encoder import (
    apply_encoder, init_encoder,
)
from adversarial_learning_on_pointclouds_tpu.ops import dispatch as ops


def init_segmenter(key: jax.Array, num_parts: int = 50,
                   feature_transform: bool = True, dtype=jnp.float32,
                   ) -> Tuple[core.Params, core.BnState]:
    keys = jax.random.split(key, 5)
    params, state = {}, {}
    params["feat"], state["feat"] = init_encoder(
        keys[0], feature_transform, dtype)
    widths = [(1088, 512), (512, 256), (256, 128)]
    for i, (c_in, c_out) in enumerate(widths, start=1):
        params[f"conv{i}"] = core.torch_linear_init(keys[i], c_in, c_out, dtype)
        params[f"bn{i}"], state[f"bn{i}"] = core.bn_init(c_out, dtype)
    params["conv4"] = core.torch_linear_init(keys[4], 128, num_parts, dtype)
    return params, state


def apply_segmenter(params: core.Params, state: core.BnState, x: jnp.ndarray,
                    train: bool,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray,
                               Optional[jnp.ndarray], core.BnState]:
    """``x: [B, N, 3]`` -> ``(log_probs [B, N, k], trans, trans_feat, state)``."""
    new_state = {}
    if not train and ops.pallas_enabled():
        # Inference: stream the global feature into the head's first-layer
        # epilogue — the [B, N, 1088] concat never exists (SURVEY.md §3.2).
        from adversarial_learning_on_pointclouds_tpu.models.encoder import (
            apply_encoder_parts,
        )
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
            encoder_fused,
        )
        pf, g, trans, trans_feat, new_state["feat"] = apply_encoder_parts(
            params["feat"], state["feat"], x, train)
        folded = [ops.folded_affine(params[f"conv{i}"], params[f"bn{i}"],
                                    state[f"bn{i}"]) for i in (1, 2, 3)]
        logp = encoder_fused.seg_head_fused(
            pf, g,
            folded[0][0], folded[0][1], folded[0][2],
            folded[1][0], folded[1][1], folded[1][2],
            folded[2][0], folded[2][1], folded[2][2],
            params["conv4"]["w"], params["conv4"]["b"].reshape(1, -1))
        for i in (1, 2, 3):
            new_state[f"bn{i}"] = state[f"bn{i}"]
        return logp, trans, trans_feat, new_state
    # Training path. The reference concatenates [point_feat | tiled
    # global] into [B, N, 1088] (upstream:pointnet/model.py, SURVEY.md
    # §3.2 "memory hot spot"); here the first head layer is computed as
    # pf @ W1[:64] + (g @ W1[64:])[:, None, :] — algebraically identical,
    # but the 1088-wide concat never exists in forward OR backward.
    from adversarial_learning_on_pointclouds_tpu.models.encoder import (
        _ema_stats, apply_encoder_parts,
    )
    pf, g, trans, trans_feat, new_state["feat"] = apply_encoder_parts(
        params["feat"], state["feat"], x, train)
    if (train and ops.pallas_enabled()
            and ops.train_tiling_ok(pf.shape[1])):
        # Fully-fused training head (BN stats in-kernel, stash-only
        # activations, fused log_softmax; ops/kernels/seg_head_train.py).
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
            seg_head_train,
        )
        logp, mu1, v1, mu2, v2, mu3, v3 = seg_head_train.seg_head_train(
            pf, g,
            params["conv1"]["w"], params["conv1"]["b"],
            params["bn1"]["scale"], params["bn1"]["bias"],
            params["conv2"]["w"], params["conv2"]["b"],
            params["bn2"]["scale"], params["bn2"]["bias"],
            params["conv3"]["w"], params["conv3"]["b"],
            params["bn3"]["scale"], params["bn3"]["bias"],
            params["conv4"]["w"], params["conv4"]["b"])
        new_state["bn1"] = _ema_stats(state["bn1"], mu1, v1, pf)
        new_state["bn2"] = _ema_stats(state["bn2"], mu2, v2, pf)
        new_state["bn3"] = _ema_stats(state["bn3"], mu3, v3, pf)
        return logp, trans, trans_feat, new_state
    c_pf = pf.shape[-1]
    w1 = params["conv1"]["w"]
    z = (core.matmul(pf, w1[:c_pf]) +
         core.matmul(g, w1[c_pf:])[:, None, :] + params["conv1"]["b"])
    h, new_state["bn1"] = core.batch_norm(
        params["bn1"], state["bn1"], z, train)
    h = jnp.maximum(h, 0)
    for i in range(2, 4):
        h, new_state[f"bn{i}"] = ops.linear_bn_act(
            params[f"conv{i}"], params[f"bn{i}"], state[f"bn{i}"], h,
            train, "relu")
    h = ops.linear_act(params["conv4"], h, act=None)
    return jax.nn.log_softmax(h, axis=-1), trans, trans_feat, new_state


def apply_segmenter_pair(params: core.Params, state: core.BnState,
                         x_a: jnp.ndarray, x_b: jnp.ndarray,
                         paired_trunks: bool = False,
                         paired_conv1: bool = False,
                         ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                    Optional[jnp.ndarray],
                                    Optional[jnp.ndarray], core.BnState]:
    """TRAIN-mode two-stream segmenter with cross-stream-batched T-Net fc
    heads (``--paired_heads``; see ``encoder.apply_encoder_parts_pair``).
    The head BNs keep PER-STREAM batch statistics (grouped BN — exact
    sequential semantics) and the seg head runs per-stream (state chained
    a -> b) — its stashes are the big [B, N, C] tensors that sank
    ``--fused_forward``. Returns
    ``(logp_a, logp_b, trans_feat_a, trans_feat_b, new_state)``."""
    from adversarial_learning_on_pointclouds_tpu.models.encoder import (
        _ema_stats, apply_encoder_parts_pair,
    )

    new_state = {}
    pf_a, g_a, pf_b, g_b, tf_a, tf_b, new_state["feat"] = \
        apply_encoder_parts_pair(params["feat"], state["feat"], x_a, x_b,
                                 True, paired_trunks, paired_conv1)

    def head(pf, g, bn_states):
        if ops.pallas_enabled() and ops.train_tiling_ok(pf.shape[1]):
            from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
                seg_head_train,
            )
            logp, mu1, v1, mu2, v2, mu3, v3 = seg_head_train.seg_head_train(
                pf, g,
                params["conv1"]["w"], params["conv1"]["b"],
                params["bn1"]["scale"], params["bn1"]["bias"],
                params["conv2"]["w"], params["conv2"]["b"],
                params["bn2"]["scale"], params["bn2"]["bias"],
                params["conv3"]["w"], params["conv3"]["b"],
                params["bn3"]["scale"], params["bn3"]["bias"],
                params["conv4"]["w"], params["conv4"]["b"])
            stats = ((mu1, v1), (mu2, v2), (mu3, v3))
            return logp, [_ema_stats(s, mu, v, pf)
                          for s, (mu, v) in zip(bn_states, stats)]
        c_pf = pf.shape[-1]
        w1 = params["conv1"]["w"]
        z = (core.matmul(pf, w1[:c_pf]) +
             core.matmul(g, w1[c_pf:])[:, None, :] + params["conv1"]["b"])
        h, bn1 = core.batch_norm(params["bn1"], bn_states[0], z, True)
        h = jnp.maximum(h, 0)
        h, bn2 = ops.linear_bn_act(params["conv2"], params["bn2"],
                                   bn_states[1], h, True, "relu")
        h, bn3 = ops.linear_bn_act(params["conv3"], params["bn3"],
                                   bn_states[2], h, True, "relu")
        h = ops.linear_act(params["conv4"], h, act=None)
        return jax.nn.log_softmax(h, axis=-1), [bn1, bn2, bn3]

    logp_a, bns_a = head(pf_a, g_a, [state["bn1"], state["bn2"],
                                     state["bn3"]])
    logp_b, bns_b = head(pf_b, g_b, bns_a)
    new_state["bn1"], new_state["bn2"], new_state["bn3"] = bns_b
    return logp_a, logp_b, tf_a, tf_b, new_state
