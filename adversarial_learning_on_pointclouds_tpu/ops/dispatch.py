"""Path selection between jnp/XLA reference ops and fused Pallas kernels.

The model layer only ever calls the functions here; whether the work runs
as XLA-fused HLO or as hand-written Pallas kernels is decided by the
``use_pallas`` context. This is the TPU-native analogue of the reference's
reliance on cuDNN conv1d + cuBLAS (SURVEY.md §2.9): the "native surface"
of this framework is the Pallas kernel set in ``ops/kernels``.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from adversarial_learning_on_pointclouds_tpu.models import core

_state = threading.local()


def pallas_enabled() -> bool:
    """Eval-path fusions (folded-BN kernels, trunk+maxpool megakernel,
    streamed seg head, fused discriminator stack)."""
    return getattr(_state, "use_pallas", False)


def pallas_train_enabled() -> bool:
    """Training-path custom-VJP kernels (pointwise matmul, maxpool,
    tnet-apply). OFF by default even under ``use_pallas``: measured on
    v5e, XLA's fused matmul+BN+ReLU fwd/bwd beats the per-layer Pallas
    kernels for training (1.8M vs 1.2M pts/s/chip fp32), while the
    inference fusions beat XLA (3.7 vs 2.9M pts/s eval). The kernels stay
    available (``use_pallas(training=True)``) and parity-tested."""
    return getattr(_state, "use_pallas_train", False)


def train_tiling_ok(n: int, cap: int = 512) -> bool:
    """True when the fused TRAINING kernel families (``trunk_train``,
    ``seg_head_train``) have a legal pipelined N-tile at this point
    count.

    Untileable ``n`` (no multiple-of-8 divisor <= ``cap`` — the reference
    lineage's seg default N=2500 is the live case) forces a full-width
    ``(1, N, C)`` block whose working set blows Mosaic's 16 MB
    scoped-VMEM limit (measured: the seg head needs 20.75 MB at N=2500,
    TPUCHECK_r04/r05). The eval megakernels fix this by padding N up to
    the tile cap (``encoder_fused._pad_n_to_tile``) — sound there because
    their BN statistics are FOLDED constants. The training kernels
    compute batch statistics IN-KERNEL, so pad rows would enter the
    moments; instead the model dispatch falls back to the XLA training
    path — correct at any N and still well above the throughput target
    (BASELINE.md round-1: XLA-only bf16 trains at 3.35M pts/s/chip vs
    the 1M target)."""
    from adversarial_learning_on_pointclouds_tpu.ops.kernels.shared_mlp import (
        _tile_n,
    )
    return n <= cap or _tile_n(n, cap=cap) != n


def current_paths() -> tuple:
    """The trace-time path flags as a hashable tuple — (pallas,
    pallas_train, mixed-precision dtype name or None).

    The flags live in thread-locals read at TRACE time, so they are
    invisible to ``jax.jit``'s cache key on their own: toggling a context
    between calls of the same jitted step would silently reuse the
    previously traced path. Every jitted step therefore captures
    ``current_paths()`` at call time and threads it through as a static
    argument, re-establishing it during tracing via ``path_context``
    (ADVICE round 1, ops/dispatch.py finding).
    """
    cd = core.compute_dtype()
    return (pallas_enabled(), pallas_train_enabled(),
            None if cd is None else jnp.dtype(cd).name)


@contextlib.contextmanager
def path_context(paths: tuple):
    """Re-establish a ``current_paths()`` capture (used inside jitted
    functions so the traced path matches the static cache key exactly)."""
    pallas, pallas_train, mp_name = paths
    prev = (pallas_enabled(), pallas_train_enabled())
    _state.use_pallas, _state.use_pallas_train = pallas, pallas_train
    try:
        with core.mixed_precision(dtype=mp_name or jnp.bfloat16,
                                  enabled=mp_name is not None):
            yield
    finally:
        _state.use_pallas, _state.use_pallas_train = prev


@contextlib.contextmanager
def use_pallas(enabled: bool = True, training: bool = False):
    """Enable the Pallas kernel paths within the context.

    ``enabled`` switches the inference fusions; ``training`` additionally
    routes training-mode matmuls/pools through the custom-VJP kernels.
    Flags are read at *trace* time, so the context must wrap the
    ``jax.jit`` tracing of the step (re-jit to switch paths).
    """
    prev = (pallas_enabled(), pallas_train_enabled())
    _state.use_pallas = enabled
    _state.use_pallas_train = enabled and training
    try:
        yield
    finally:
        _state.use_pallas, _state.use_pallas_train = prev


def _act(x: jnp.ndarray, act: Optional[str]) -> jnp.ndarray:
    if act is None:
        return x
    if act == "relu":
        return jnp.maximum(x, 0)
    if act == "leaky_relu":
        return core.leaky_relu(x, 0.2)
    raise ValueError(f"unknown activation {act!r}")


# ---------------------------------------------------------------------------
# Fused shared-MLP block: y = act(bn(x @ w + b))
# ---------------------------------------------------------------------------

def linear_bn_act(dense_p, bn_p, bn_s, x: jnp.ndarray, train: bool,
                  act: Optional[str] = "relu",
                  ) -> Tuple[jnp.ndarray, dict]:
    """One shared-MLP block: pointwise matmul + BatchNorm + activation.

    Replaces the reference's ``relu(bn(conv1d(x)))`` pattern
    (``upstream:pointnet/model.py``, SURVEY.md §2.3). ``x`` is ``[B, N, C]``
    or ``[B, C]``; the matmul contracts the trailing channel axis on the
    MXU.

    Training: the matmul runs on the selected path; BN statistics are a
    global reduction over (batch, points) and normalization + activation
    are elementwise — XLA fuses those into the matmul's epilogue.

    Eval: running stats are known constants, so BN folds into a per-channel
    scale/shift; on the Pallas path the whole block is one fused kernel.
    """
    if train:
        z = _matmul(x, dense_p["w"], dense_p["b"])
        z, new_s = core.batch_norm(bn_p, bn_s, z, train=True)
        return _act(z, act), new_s
    # Eval: fold BN into the matmul epilogue.
    inv = jax.lax.rsqrt(bn_s["var"] + core.BN_EPS)
    scale = bn_p["scale"] * inv
    shift = bn_p["bias"] - bn_s["mean"] * scale
    if pallas_enabled() and x.ndim == 3:
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import shared_mlp
        y = shared_mlp.fused_linear_affine_act(
            x, dense_p["w"], dense_p["b"] * scale + shift, scale, act)
        return y, bn_s
    z = _matmul(x, dense_p["w"] * scale, dense_p["b"] * scale + shift)
    return _act(z, act), bn_s


def linear_bn_act_pair(dense_p, bn_p, bn_s, x_a: jnp.ndarray,
                       x_b: jnp.ndarray, act: Optional[str] = "relu",
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, dict]:
    """TRAIN-mode ``linear_bn_act`` on TWO same-shape streams with ONE
    batched ``[2B, N, C]`` matmul and PER-STREAM BN statistics
    (``core.batch_norm_grouped``, EMA chained a -> b — the exact
    statistics of two sequential calls).

    The ``--paired_conv1`` throughput knob: at the reference batch 32
    the per-point conv1 layers are launch/shape-bound, and the isolated
    2B-stacked fwd+bwd measured 0.62-0.90x of two sequential calls
    (``chiplogs_r04/perf_round4.log``) — this is the exact-semantics
    version of that stacking (the probe used mixed 2B statistics)."""
    z = _matmul(jnp.concatenate([x_a, x_b], axis=0),
                dense_p["w"], dense_p["b"])
    z, new_s = core.batch_norm_grouped(bn_p, bn_s, z, True, groups=2)
    h = _act(z, act)
    b = x_a.shape[0]
    return h[:b], h[b:], new_s


def folded_affine(dense_p, bn_p, bn_s):
    """Fold BN running stats into (w, shift, scale) for eval-path fusion:
    ``act((x @ w) * scale + shift)`` == ``act(bn(x @ w + b))``."""
    inv = jax.lax.rsqrt(bn_s["var"] + core.BN_EPS)
    scale = bn_p["scale"] * inv
    shift = bn_p["bias"] - bn_s["mean"] * scale
    return dense_p["w"], dense_p["b"] * scale + shift, scale


def linear_act(dense_p, x: jnp.ndarray, act: Optional[str] = None,
               ) -> jnp.ndarray:
    """Pointwise matmul + optional activation (no BN) — discriminator blocks.

    Differentiable on both paths (the Pallas matmul carries a custom VJP;
    the activation fuses into its epilogue under XLA). The fully-fused
    non-differentiable stack kernel is exposed separately as
    ``apply_discriminator_fused`` for pure inference.
    """
    return _act(_matmul(x, dense_p["w"], dense_p["b"]), act)


def _matmul(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    if pallas_train_enabled() and x.ndim == 3:
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import shared_mlp
        return shared_mlp.pointwise_matmul(x, w, b)
    return core.matmul(x, w) + b


# ---------------------------------------------------------------------------
# Symmetric max-pool over the point axis
# ---------------------------------------------------------------------------

def max_points(x: jnp.ndarray) -> jnp.ndarray:
    """``max`` over the point axis: ``[B, N, C] -> [B, C]``.

    The reference's ``torch.max(x, 2)`` symmetric function
    (``upstream:pointnet/model.py::PointNetfeat``). On the Pallas path the
    standalone custom-VJP kernel is used; in eval forwards it is instead
    fused with the preceding MLP layers inside the encoder megakernel
    (``ops/kernels/encoder_fused.py``).
    """
    if pallas_train_enabled() and x.ndim == 3:
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
            maxpool_points,
        )
        return maxpool_points.maxpool_points(x)
    return jnp.max(x, axis=1)


def batched_transform(x: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Apply a per-cloud ``k x k`` transform: the reference's
    ``torch.bmm(points, trans)`` (T-Net apply)."""
    if pallas_train_enabled() and x.ndim == 3:
        from adversarial_learning_on_pointclouds_tpu.ops.kernels import (
            tnet_apply,
        )
        return tnet_apply.tnet_apply(x, t)
    return core.matmul(x, t)
