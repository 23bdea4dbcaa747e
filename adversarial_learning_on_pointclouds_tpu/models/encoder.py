"""PointNet encoder trunk (``PointNetfeat`` in the reference).

Reference: ``upstream:pointnet/model.py::PointNetfeat`` (SURVEY.md §2.3,
call stack §3.2). Pipeline on ``x: [B, N, 3]``:

1. STN3d predicts ``T in R^{3x3}``; apply ``x <- x @ T``.
2. Shared MLP 3->64 (BN+ReLU).
3. Optionally STNkd predicts ``T64``; apply to the 64-d features.
4. Shared MLP 64->128 (BN+ReLU), 128->1024 (BN, **no ReLU** — the
   reference applies ``bn3(conv3(x))`` and pools directly).
5. Symmetric max-pool over the point axis -> 1024-d global feature.

``global_feat=False`` (segmentation) concatenates the 64-d per-point
feature with the tiled global feature -> ``[B, N, 1088]``. On the Pallas
path the inference forward runs as one fused megakernel that streams tiles
of N and never materializes ``[B, N, 1024]`` in HBM
(``ops/kernels/encoder_fused.py``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from adversarial_learning_on_pointclouds_tpu.models import core
from adversarial_learning_on_pointclouds_tpu.models.tnet import apply_tnet, init_tnet
from adversarial_learning_on_pointclouds_tpu.ops import dispatch as ops


def init_encoder(key: jax.Array, feature_transform: bool = False,
                 dtype=jnp.float32) -> Tuple[core.Params, core.BnState]:
    keys = jax.random.split(key, 5)
    params, state = {}, {}
    params["stn"], state["stn"] = init_tnet(keys[0], k=3, dtype=dtype)
    widths = [(3, 64), (64, 128), (128, 1024)]
    for i, (c_in, c_out) in enumerate(widths, start=1):
        params[f"conv{i}"] = core.torch_linear_init(keys[i], c_in, c_out, dtype)
        params[f"bn{i}"], state[f"bn{i}"] = core.bn_init(c_out, dtype)
    if feature_transform:
        params["fstn"], state["fstn"] = init_tnet(keys[4], k=64, dtype=dtype)
    return params, state


def apply_encoder_parts(params: core.Params, state: core.BnState,
                        x: jnp.ndarray, train: bool,
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                                   Optional[jnp.ndarray], core.BnState]:
    """Returns ``(point_feat [B,N,64], global [B,1024], trans, trans_feat,
    new_state)`` — the raw pieces, letting callers (the fused seg head)
    avoid materializing the 1088-d concat."""
    new_state = {}
    trans, new_state["stn"] = apply_tnet(params["stn"], state["stn"], x, train)
    x = ops.batched_transform(x, trans)
    x, new_state["bn1"] = ops.linear_bn_act(
        params["conv1"], params["bn1"], state["bn1"], x, train, "relu")

    trans_feat = None
    if "fstn" in params:  # feature_transform was enabled at init
        trans_feat, new_state["fstn"] = apply_tnet(
            params["fstn"], state["fstn"], x, train)
        x = ops.batched_transform(x, trans_feat)

    point_feat = x  # [B, N, 64]
    if (train and ops.pallas_enabled()
            and ops.train_tiling_ok(point_feat.shape[1])):
        # Fused TRAINING trunk: conv2+BN2+ReLU -> conv3+BN3 -> max-pool
        # with in-kernel batch statistics; z3 [B,N,1024] never exists in
        # forward or backward (ops/kernels/trunk_train.py).
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
            trunk_train,
        )
        g, mu2, v2, mu3, v3 = trunk_train.trunk2_train(
            point_feat,
            params["conv2"]["w"], params["conv2"]["b"],
            params["bn2"]["scale"], params["bn2"]["bias"],
            params["conv3"]["w"], params["conv3"]["b"],
            params["bn3"]["scale"], params["bn3"]["bias"])
        global_feature = g
        new_state["bn2"] = _ema_stats(state["bn2"], mu2, v2, point_feat)
        new_state["bn3"] = _ema_stats(state["bn3"], mu3, v3, point_feat)
    elif not train and ops.pallas_enabled():
        # Inference: conv2 -> conv3 -> max-pool as one Pallas megakernel;
        # the [B, N, 1024] pre-pool tensor never reaches HBM.
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
            encoder_fused,
        )
        w2, s2, c2 = ops.folded_affine(params["conv2"], params["bn2"],
                                       state["bn2"])
        w3, s3, c3 = ops.folded_affine(params["conv3"], params["bn3"],
                                       state["bn3"])
        global_feature = encoder_fused.fused_stack_maxpool(
            point_feat, (w2, w3), (s2, s3), (c2, c3), ("relu", None))
        new_state["bn2"], new_state["bn3"] = state["bn2"], state["bn3"]
    else:
        x, new_state["bn2"] = ops.linear_bn_act(
            params["conv2"], params["bn2"], state["bn2"], x, train, "relu")
        x, new_state["bn3"] = ops.linear_bn_act(
            params["conv3"], params["bn3"], state["bn3"], x, train, act=None)
        global_feature = ops.max_points(x)  # [B, 1024]
    return point_feat, global_feature, trans, trans_feat, new_state


def apply_encoder_parts_pair(params: core.Params, state: core.BnState,
                             x_a: jnp.ndarray, x_b: jnp.ndarray,
                             train: bool, paired_trunks: bool = False,
                             paired_conv1: bool = False):
    """Two-stream encoder with the T-Net fc heads batched across streams
    (``tnet.apply_tnet_pair``; adversarial ``--paired_heads``). The conv
    layers and fused trunks stay per-stream — BN batch statistics and
    stash sizes are identical to two sequential calls, state chained
    a -> b. ``paired_trunks`` (round 4) batches the fused trunk kernels
    across the streams too (``trunk2_train(groups=2)``, per-stream
    in-kernel statistics — pooled values bit-identical to sequential).
    Returns ``(pf_a, g_a, pf_b, g_b, trans_feat_a, trans_feat_b,
    new_state)``."""
    from adversarial_learning_on_pointclouds_tpu.models.tnet import (
        apply_tnet_pair,
    )
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        trunk_train,
    )

    new_state = {}
    t_a, t_b, new_state["stn"] = apply_tnet_pair(
        params["stn"], state["stn"], x_a, x_b, train, paired_trunks,
        paired_conv1)
    x_a = ops.batched_transform(x_a, t_a)
    x_b = ops.batched_transform(x_b, t_b)
    if paired_conv1 and train:
        x_a, x_b, new_state["bn1"] = ops.linear_bn_act_pair(
            params["conv1"], params["bn1"], state["bn1"], x_a, x_b, "relu")
    else:
        x_a, bn1_a = ops.linear_bn_act(
            params["conv1"], params["bn1"], state["bn1"], x_a, train,
            "relu")
        x_b, new_state["bn1"] = ops.linear_bn_act(
            params["conv1"], params["bn1"], bn1_a, x_b, train, "relu")

    tf_a = tf_b = None
    if "fstn" in params:
        tf_a, tf_b, new_state["fstn"] = apply_tnet_pair(
            params["fstn"], state["fstn"], x_a, x_b, train, paired_trunks,
            paired_conv1)
        x_a = ops.batched_transform(x_a, tf_a)
        x_b = ops.batched_transform(x_b, tf_b)

    trunk_args = (
        params["conv2"]["w"], params["conv2"]["b"],
        params["bn2"]["scale"], params["bn2"]["bias"],
        params["conv3"]["w"], params["conv3"]["b"],
        params["bn3"]["scale"], params["bn3"]["bias"])

    if (paired_trunks and train and ops.pallas_enabled()
            and ops.train_tiling_ok(x_a.shape[1])):
        b = x_a.shape[0]
        g, mu2, v2, mu3, v3 = trunk_train.trunk2_train(
            jnp.concatenate([x_a, x_b], axis=0), *trunk_args, groups=2)
        g_a, g_b = g[:b], g[b:]
        bn2 = _ema_stats(state["bn2"], mu2[0], v2[0], x_a)
        new_state["bn2"] = _ema_stats(bn2, mu2[1], v2[1], x_b)
        bn3 = _ema_stats(state["bn3"], mu3[0], v3[0], x_a)
        new_state["bn3"] = _ema_stats(bn3, mu3[1], v3[1], x_b)
        return x_a, g_a, x_b, g_b, tf_a, tf_b, new_state

    def trunk(pf, s_bn2, s_bn3):
        if (train and ops.pallas_enabled()
                and ops.train_tiling_ok(pf.shape[1])):
            g, mu2, v2, mu3, v3 = trunk_train.trunk2_train(
                pf, *trunk_args)
            return (g, _ema_stats(s_bn2, mu2, v2, pf),
                    _ema_stats(s_bn3, mu3, v3, pf))
        h, bn2 = ops.linear_bn_act(params["conv2"], params["bn2"], s_bn2,
                                   pf, train, "relu")
        h, bn3 = ops.linear_bn_act(params["conv3"], params["bn3"], s_bn3,
                                   h, train, act=None)
        return ops.max_points(h), bn2, bn3

    g_a, bn2_a, bn3_a = trunk(x_a, state["bn2"], state["bn3"])
    g_b, new_state["bn2"], new_state["bn3"] = trunk(x_b, bn2_a, bn3_a)
    return x_a, g_a, x_b, g_b, tf_a, tf_b, new_state


def apply_encoder(params: core.Params, state: core.BnState, x: jnp.ndarray,
                  train: bool, global_feat: bool = True,
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray],
                             core.BnState]:
    """Reference-shaped API: ``(feature, trans, trans_feat, new_state)``.

    ``feature`` is ``[B, 1024]`` when ``global_feat`` else the
    ``[B, N, 1088]`` per-point concat (``upstream:pointnet/model.py::
    PointNetfeat``). The segmenter's Pallas path uses
    ``apply_encoder_parts`` directly to skip the concat.
    """
    point_feat, g, trans, trans_feat, new_state = apply_encoder_parts(
        params, state, x, train)
    if global_feat:
        return g, trans, trans_feat, new_state
    b, n = point_feat.shape[0], point_feat.shape[1]
    tiled = jnp.broadcast_to(g[:, None, :], (b, n, g.shape[-1]))
    feat = jnp.concatenate([point_feat, tiled], axis=-1)  # [B, N, 1088]
    return feat, trans, trans_feat, new_state


def _ema_stats(s, batch_mean, batch_var_biased, x=None, m=None):
    """torch-style running-stat update from kernel batch statistics.

    ``m`` is the reduction count behind the biased variance (``B*N`` for
    per-point BNs — pass the activation ``x`` and it is derived — or
    ``B`` for the batch-axis fc-head BNs)."""
    if m is None:
        m = x.shape[0] * x.shape[1]
    unbiased = batch_var_biased * (m / max(m - 1, 1))
    mom = core.BN_MOMENTUM
    return {
        "mean": (1.0 - mom) * s["mean"]
                + mom * jax.lax.stop_gradient(batch_mean),
        "var": (1.0 - mom) * s["var"]
               + mom * jax.lax.stop_gradient(unbiased),
    }
