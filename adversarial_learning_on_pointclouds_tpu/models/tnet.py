"""T-Net spatial/feature transformers (STN3d / STNkd).

Predicts a ``k x k`` alignment matrix from a point cloud / feature map.
Architecture (reference ``upstream:pointnet/model.py::STN3d``/``STNkd``,
SURVEY.md §2.3): conv1d k->64->128->1024 (BN+ReLU each), symmetric max-pool
over points, fc 1024->512->256 (BN+ReLU), fc 256->k*k with the flattened
identity matrix added — so the transform is exactly identity at init up to
the final layer's (small, torch-default) random output.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from adversarial_learning_on_pointclouds_tpu.models import core
from adversarial_learning_on_pointclouds_tpu.ops import dispatch as ops

_WIDTHS = (64, 128, 1024)
_FC = (512, 256)


def init_tnet(key: jax.Array, k: int, dtype=jnp.float32
              ) -> Tuple[core.Params, core.BnState]:
    keys = jax.random.split(key, 6)
    params, state = {}, {}
    c_in = k
    for i, c_out in enumerate(_WIDTHS, start=1):
        params[f"conv{i}"] = core.torch_linear_init(keys[i - 1], c_in, c_out, dtype)
        params[f"bn{i}"], state[f"bn{i}"] = core.bn_init(c_out, dtype)
        c_in = c_out
    for i, c_out in enumerate(_FC, start=1):
        params[f"fc{i}"] = core.torch_linear_init(keys[2 + i], c_in, c_out, dtype)
        params[f"bn_fc{i}"], state[f"bn_fc{i}"] = core.bn_init(c_out, dtype)
        c_in = c_out
    params["fc3"] = core.torch_linear_init(keys[5], c_in, k * k, dtype)
    return params, state


def apply_tnet(params: core.Params, state: core.BnState, x: jnp.ndarray,
               train: bool) -> Tuple[jnp.ndarray, core.BnState]:
    """``x: [B, N, k]`` -> transform ``[B, k, k]`` (+ updated BN state)."""
    k = x.shape[-1]  # fc3 emits k*k; k == input channel count
    h, conv_state = _pooled_trunk(params, state, x, train)
    out, fc_state = _fc_head_apply(params, state, h, train)
    iden = jnp.eye(k, dtype=out.dtype).reshape(-1)
    return (out + iden).reshape(-1, k, k), {**conv_state, **fc_state}


def apply_tnet_pair(params: core.Params, state: core.BnState,
                    x_a: jnp.ndarray, x_b: jnp.ndarray, train: bool,
                    paired_trunks: bool = False,
                    paired_conv1: bool = False,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, core.BnState]:
    """Two same-shape streams with the fc head matmuls BATCHED across
    them — per-stream BN statistics (reference semantics preserved).

    The conv trunks (and their BN batch statistics) stay per-stream with
    the EMA state chained a -> b — identical numerics to two sequential
    ``apply_tnet`` calls. The [B, 1024]-row fc head runs its matmuls
    once on the stacked ``[2B, 1024]`` pool: at the reference batch 32
    those three matmuls are MXU-underutilized (M=32) and latency-bound,
    so halving the op count is nearly free throughput (`--paired_heads`
    perf note in BASELINE.md). The head's batch-axis BNs compute
    statistics PER STREAM over the row blocks with the running-stat EMA
    chained a -> b (``core.batch_norm_grouped`` / the grouped epilogue
    kernel) — the exact statistics of two sequential calls, so unlike
    ``--fused_forward`` there is no training-semantics departure, and
    unlike it the [B, N, C] trunk stashes are not doubled (which is what
    made that mode lose).

    ``paired_trunks`` (round 4) additionally batches the conv TRUNK
    across the streams — one ``trunk2_train(groups=2)`` call on the
    stacked ``[2B, N, 64]`` batch with PER-STREAM in-kernel statistics
    (bit-identical pooled outputs to two sequential calls; see
    ``trunk_train``). conv1 and its per-point BN stay per-stream."""
    if (paired_trunks and train and ops.pallas_enabled()
            and ops.train_tiling_ok(x_a.shape[1])):
        h, conv_state = _pooled_trunk_grouped(params, state, x_a, x_b)
        mid = dict(state)
        mid.update(conv_state)
        st_ab = conv_state
    elif paired_conv1 and train:
        h_a, h_b, st_ab = _pooled_trunk_pair_conv1(params, state, x_a, x_b)
        mid = dict(state)
        mid.update(st_ab)
        h = jnp.concatenate([h_a, h_b], axis=0)
    else:
        h_a, st_a = _pooled_trunk(params, state, x_a, train)
        mid = dict(state)
        mid.update(st_a)
        h_b, st_b = _pooled_trunk(params, mid, x_b, train)
        h = jnp.concatenate([h_a, h_b], axis=0)
        st_ab = {**st_a, **st_b}
    out, fc_state = _fc_head_apply(params, mid, h, train, streams=2)
    k = x_a.shape[-1]
    iden = jnp.eye(k, dtype=out.dtype).reshape(-1)
    trans = (out + iden).reshape(-1, k, k)
    b = x_a.shape[0]
    return trans[:b], trans[b:], {**st_ab, **fc_state}


def _pooled_trunk(params: core.Params, state: core.BnState, x: jnp.ndarray,
                  train: bool) -> Tuple[jnp.ndarray, core.BnState]:
    """conv1..conv3 (+BNs) + symmetric max-pool -> ``[B, 1024]``."""
    new_state = {}
    if (train and ops.pallas_enabled()
            and ops.train_tiling_ok(x.shape[1])):
        # conv1 layerwise (tiny K — XLA already optimal; the trunk3
        # variant folding it into the kernel chain measured slightly
        # SLOWER, 7.23M vs 7.51M pts/s, from the extra z1 stash round
        # trip — kept available in trunk_train.trunk3_train), then the
        # fused training trunk for conv2+conv3+pool. The reference
        # applies ReLU before the pool; ReLU is monotone, so
        # max(relu(y)) == relu(max(y)) — apply it to the pooled vector
        # (gradient routing identical: all-negative channels pool to 0
        # with zero grad either way).
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
            trunk_train,
        )
        from adversarial_learning_on_pointclouds_tpu.models.encoder import (
            _ema_stats,
        )
        h1, new_state["bn1"] = ops.linear_bn_act(
            params["conv1"], params["bn1"], state["bn1"], x,
            train=True, act="relu")
        g, mu2, v2, mu3, v3 = trunk_train.trunk2_train(
            h1,
            params["conv2"]["w"], params["conv2"]["b"],
            params["bn2"]["scale"], params["bn2"]["bias"],
            params["conv3"]["w"], params["conv3"]["b"],
            params["bn3"]["scale"], params["bn3"]["bias"])
        h = jnp.maximum(g, 0)
        new_state["bn2"] = _ema_stats(state["bn2"], mu2, v2, h1)
        new_state["bn3"] = _ema_stats(state["bn3"], mu3, v3, h1)
    elif not train and ops.pallas_enabled():
        # Inference: whole conv trunk + symmetric max-pool as ONE Pallas
        # kernel — [B, N, 1024] never hits HBM (encoder_fused megakernel).
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
            encoder_fused,
        )
        ws, shs, scs = zip(*(
            ops.folded_affine(params[f"conv{i}"], params[f"bn{i}"],
                              state[f"bn{i}"]) for i in (1, 2, 3)))
        h = encoder_fused.fused_stack_maxpool(
            x, ws, shs, scs, ("relu", "relu", "relu"))
        for i in (1, 2, 3):
            new_state[f"bn{i}"] = state[f"bn{i}"]
    else:
        h = x
        for i in range(1, 4):
            h, new_state[f"bn{i}"] = ops.linear_bn_act(
                params[f"conv{i}"], params[f"bn{i}"], state[f"bn{i}"], h,
                train=train, act="relu")
        h = ops.max_points(h)  # [B, 1024] symmetric pool
    return h, new_state


def _pooled_trunk_pair_conv1(params: core.Params, state: core.BnState,
                             x_a: jnp.ndarray, x_b: jnp.ndarray,
                             ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                        core.BnState]:
    """Train-mode two-stream trunk with ONLY conv1 batched across the
    streams (``--paired_conv1``): one ``[2B, N, C]`` conv1 matmul with
    per-stream grouped BN1 statistics (EMA chained a -> b — the exact
    statistics of two sequential calls), then the per-stream fused
    trunk. Unlike ``--paired_trunks`` this leaves the trunk2 kernel's
    per-B VMEM tiling untouched (its 2B grouping measured −34% E2E,
    BASELINE.md round-4) and batches only the layer the isolated probe
    showed winning stacked (conv1 0.62-0.90x, perf_round4.log)."""
    from adversarial_learning_on_pointclouds_tpu.models.encoder import (
        _ema_stats,
    )

    new_state = {}
    h1_a, h1_b, new_state["bn1"] = ops.linear_bn_act_pair(
        params["conv1"], params["bn1"], state["bn1"], x_a, x_b, "relu")
    if ops.pallas_enabled() and ops.train_tiling_ok(x_a.shape[1]):
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
            trunk_train,
        )

        def trunk(h1, s_bn2, s_bn3):
            g, mu2, v2, mu3, v3 = trunk_train.trunk2_train(
                h1,
                params["conv2"]["w"], params["conv2"]["b"],
                params["bn2"]["scale"], params["bn2"]["bias"],
                params["conv3"]["w"], params["conv3"]["b"],
                params["bn3"]["scale"], params["bn3"]["bias"])
            return (jnp.maximum(g, 0), _ema_stats(s_bn2, mu2, v2, h1),
                    _ema_stats(s_bn3, mu3, v3, h1))

        h_a, bn2_a, bn3_a = trunk(h1_a, state["bn2"], state["bn3"])
        h_b, new_state["bn2"], new_state["bn3"] = trunk(h1_b, bn2_a, bn3_a)
        return h_a, h_b, new_state

    def trunk_xla(h, s_bn2, s_bn3):
        h, bn2 = ops.linear_bn_act(params["conv2"], params["bn2"], s_bn2,
                                   h, True, "relu")
        h, bn3 = ops.linear_bn_act(params["conv3"], params["bn3"], s_bn3,
                                   h, True, "relu")
        return ops.max_points(h), bn2, bn3

    h_a, bn2_a, bn3_a = trunk_xla(h1_a, state["bn2"], state["bn3"])
    h_b, new_state["bn2"], new_state["bn3"] = trunk_xla(h1_b, bn2_a, bn3_a)
    return h_a, h_b, new_state


def _pooled_trunk_grouped(params: core.Params, state: core.BnState,
                          x_a: jnp.ndarray, x_b: jnp.ndarray,
                          ) -> Tuple[jnp.ndarray, core.BnState]:
    """Train-mode ``_pooled_trunk`` for TWO streams with the fused trunk
    batched across them (``trunk2_train(groups=2)``): one kernel chain
    on the stacked ``[2B, N, 64]`` batch, per-stream in-kernel BN
    statistics (bit-identical pooled values to two sequential calls),
    EMA chained a -> b. conv1 + its per-point BN stay per-stream (the
    reference's BN1 statistics are per-stream, and the conv1 matmul is
    bandwidth-bound — nothing to batch away). Returns the stacked
    pooled features ``[2B, 1024]``."""
    from adversarial_learning_on_pointclouds_tpu.models.encoder import (
        _ema_stats,
    )
    from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
        trunk_train,
    )

    new_state = {}
    h1_a, bn1_a = ops.linear_bn_act(
        params["conv1"], params["bn1"], state["bn1"], x_a,
        train=True, act="relu")
    h1_b, new_state["bn1"] = ops.linear_bn_act(
        params["conv1"], params["bn1"], bn1_a, x_b,
        train=True, act="relu")
    h1 = jnp.concatenate([h1_a, h1_b], axis=0)
    g, mu2, v2, mu3, v3 = trunk_train.trunk2_train(
        h1,
        params["conv2"]["w"], params["conv2"]["b"],
        params["bn2"]["scale"], params["bn2"]["bias"],
        params["conv3"]["w"], params["conv3"]["b"],
        params["bn3"]["scale"], params["bn3"]["bias"], groups=2)
    h = jnp.maximum(g, 0)
    bn2 = _ema_stats(state["bn2"], mu2[0], v2[0], h1_a)
    new_state["bn2"] = _ema_stats(bn2, mu2[1], v2[1], h1_b)
    bn3 = _ema_stats(state["bn3"], mu3[0], v3[0], h1_a)
    new_state["bn3"] = _ema_stats(bn3, mu3[1], v3[1], h1_b)
    return h, new_state


def _fc_head_apply(params: core.Params, state: core.BnState,
                   h: jnp.ndarray, train: bool, streams: int = 1,
                   ) -> Tuple[jnp.ndarray, core.BnState]:
    """fc1+BN+ReLU -> fc2+BN+ReLU -> fc3 on pooled ``[B, 1024]`` rows
    (identity bias added by the caller).

    ``streams>1`` (the ``--paired_heads`` path): ``h`` is ``streams``
    stacked per-stream pools ``[S*B, 1024]``; the matmuls run batched
    but every batch-axis BN computes PER-STREAM statistics with the EMA
    chained stream 0 -> S-1 — exactly the statistics of sequential
    per-stream calls (``core.batch_norm_grouped``)."""
    new_state = {}
    if train and streams > 1:
        from adversarial_learning_on_pointclouds_tpu.models.encoder import (
            _ema_stats,
        )
        b = h.shape[0] // streams
        # The grouped kernel slices z1 at static row offsets i*b; Mosaic
        # sublane alignment wants those at multiples of 8, so odd
        # per-stream batch sizes take the XLA grouped path instead
        # (paired_heads is the DEFAULT — it must not break --batchSize
        # values the sequential path accepted).
        if (ops.pallas_enabled() and not ops.pallas_train_enabled()
                and b % 8 == 0):
            # Grouped variant of the trunk-exit epilogue kernel: batched
            # fc1 matmul, per-stream BN1 stats in-kernel.
            from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
                pool_fc_epilogue,
            )
            h1, mu1, var1 = pool_fc_epilogue.relu_fc_bn_relu(
                h, params["fc1"]["w"], params["fc1"]["b"],
                params["bn_fc1"]["scale"], params["bn_fc1"]["bias"],
                rm1=state["bn_fc1"]["mean"], groups=streams)
            st1 = state["bn_fc1"]
            for i in range(streams):
                st1 = _ema_stats(st1, mu1[i], var1[i], m=b)
            new_state["bn_fc1"] = st1
        else:
            # XLA fallback (also covers the opt-in pallas_train mode —
            # the full-head kernel has no grouped-BN variant and is
            # measured slower anyway).
            z1 = core.dense(params["fc1"], h)
            h1, new_state["bn_fc1"] = core.batch_norm_grouped(
                params["bn_fc1"], state["bn_fc1"], z1, True, streams)
            h1 = jnp.maximum(h1, 0)
        z2 = core.dense(params["fc2"], h1)
        h2, new_state["bn_fc2"] = core.batch_norm_grouped(
            params["bn_fc2"], state["bn_fc2"], z2, True, streams)
        h = core.dense(params["fc3"], jnp.maximum(h2, 0))
    elif train and ops.pallas_train_enabled():
        # The whole fc head — fc1+BN+ReLU -> fc2+BN+ReLU -> fc3 on
        # [B, 1024] — as ONE fused forward kernel + a fused BN-layers
        # backward kernel (fc3's affine backward stays in XLA, which also
        # keeps w3/dw3 out of scoped VMEM at k=64). Measured SLOWER than
        # the XLA layerwise chain on v5e (STNkd head 1.65 vs 1.18 ms
        # isolated fwd+bwd), so like the per-layer training matmuls it is
        # opt-in via use_pallas(training=True); parity is pinned by
        # test_fc_head_train_kernel_parity and compiled on chip by
        # test_fc_head_train_compiled.
        from adversarial_learning_on_pointclouds_tpu.models.encoder import (
            _ema_stats,
        )
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
            fc_head_train,
        )
        h, mu1, v1, mu2, v2 = fc_head_train.fc_head_train(
            h,
            params["fc1"]["w"], params["fc1"]["b"],
            params["bn_fc1"]["scale"], params["bn_fc1"]["bias"],
            params["fc2"]["w"], params["fc2"]["b"],
            params["bn_fc2"]["scale"], params["bn_fc2"]["bias"],
            params["fc3"]["w"], params["fc3"]["b"],
            # Running means center the kernel's one-pass moments (same
            # cancellation guard as core.batch_norm; z1/z2 have nonzero
            # means — h is max-pooled ReLU features).
            rm1=state["bn_fc1"]["mean"], rm2=state["bn_fc2"]["mean"])
        new_state["bn_fc1"] = _ema_stats(state["bn_fc1"], mu1, v1,
                                         m=h.shape[0])
        new_state["bn_fc2"] = _ema_stats(state["bn_fc2"], mu2, v2,
                                         m=h.shape[0])
    elif train and ops.pallas_enabled():
        # fc1 + batch-BN1 + both ReLUs as the fused trunk-exit epilogue
        # kernel (pool_fc_epilogue.relu_fc_bn_relu) with the full
        # batch-stat backward in its custom VJP — the one fc-head fusion
        # that beats XLA on v5e (isolated 0.79 vs 1.21 ms fwd+bwd,
        # BASELINE.md round-3), unlike the full-head kernel above. The
        # rest of the head (fc2+BN2+ReLU, fc3) stays in XLA.
        from adversarial_learning_on_pointclouds_tpu.models.encoder import (
            _ema_stats,
        )
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
            pool_fc_epilogue,
        )
        h1, mu1, var1 = pool_fc_epilogue.relu_fc_bn_relu(
            h, params["fc1"]["w"], params["fc1"]["b"],
            params["bn_fc1"]["scale"], params["bn_fc1"]["bias"],
            rm1=state["bn_fc1"]["mean"])
        new_state["bn_fc1"] = _ema_stats(state["bn_fc1"], mu1, var1,
                                         m=h.shape[0])
        h, new_state["bn_fc2"] = ops.linear_bn_act(
            params["fc2"], params["bn_fc2"], state["bn_fc2"], h1,
            train=True, act="relu")
        h = core.dense(params["fc3"], h)
    else:
        for i in range(1, 3):
            h, new_state[f"bn_fc{i}"] = ops.linear_bn_act(
                params[f"fc{i}"], params[f"bn_fc{i}"], state[f"bn_fc{i}"], h,
                train=train, act="relu")
        h = core.dense(params["fc3"], h)
    return h, new_state
