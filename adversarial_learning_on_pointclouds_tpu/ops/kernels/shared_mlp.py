"""Fused pointwise shared-MLP Pallas kernels.

A ``Conv1d(c_in, c_out, kernel_size=1)`` over ``[B, C, N]`` is a matmul
over the channel axis; in channel-last layout the per-batch tile
``[TILE_N, c_in] @ [c_in, c_out]`` lands directly on the MXU
(SURVEY.md §2.9 ``kernels/shared_mlp.py``). Three entry points:

* ``pointwise_matmul``        — training path, custom-VJP (backward is
  two more Pallas matmuls: ``dx = g @ w^T`` and a grid-accumulated
  ``dw = sum x^T g`` / ``db = sum g``).
* ``fused_linear_affine_act`` — inference path with the folded-BN
  per-channel scale/shift and the activation fused into the matmul
  epilogue (the cuDNN conv+BN+ReLU chain as ONE kernel).
* ``fused_mlp_stack``         — several pointwise layers chained inside
  one kernel invocation (weights stay resident in VMEM across layers;
  used by the discriminator head, SURVEY.md §2.9 ``kernels/disc_head.py``).

All kernels run in interpreter mode on CPU (parity tests) and compiled on
TPU. N is tiled to a divisor of the point count; channel dims are left to
Mosaic's internal padding (3, 50, 64 … are all legal).
"""

from __future__ import annotations

import contextlib
import functools
import threading
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_force = threading.local()


@contextlib.contextmanager
def force_compiled(enabled: bool = True):
    """Force REAL Mosaic lowering regardless of the local backend.

    ``_interpret()`` keys off ``jax.default_backend()`` so the CPU test
    suite runs every kernel in interpreter mode — but that heuristic is
    wrong for CROSS-LOWERING: a CPU host exporting a serving artifact
    for ``platforms=('tpu',)`` (utils/serving.py ``use_pallas_kernels``)
    must emit the actual ``tpu_custom_call``s, not the interpreted
    emulation graph. Trace-time flag: wrap the export/lowering call."""
    prev = getattr(_force, "on", False)
    _force.on = enabled
    try:
        yield
    finally:
        _force.on = prev


def _interpret() -> bool:
    if getattr(_force, "on", False):
        return False
    return jax.default_backend() == "cpu"


def _tile_n(n: int, cap: int = 512) -> int:
    for t in (cap, 256, 128, 64, 32, 16, 8):
        if t <= cap and n % t == 0:
            return t
    return n



def _mxu_dot(a, b):
    """MXU dot with fp32 accumulation; honors the mixed-precision scope
    (trace-time constant) by casting operands to bf16. Outside the scope
    the precision is pinned HIGHEST — the TPU's default bf16 multiply
    costs ~1.5e-4 relative error vs. the fp32 XLA path (measured)."""
    from adversarial_learning_on_pointclouds_tpu.models import core as _core

    cd = _core.compute_dtype()
    if cd is not None and a.dtype == jnp.float32:
        return jnp.dot(a.astype(cd), b.astype(cd),
                       preferred_element_type=jnp.float32)
    return jnp.dot(a, b, precision=jax.lax.Precision.HIGHEST,
                   preferred_element_type=jnp.float32)


def _mxu_dot_t(a, b):
    """Contraction over axis 0 of both operands (``a^T @ b``), honoring
    the mixed-precision scope like ``_mxu_dot``."""
    from adversarial_learning_on_pointclouds_tpu.models import core as _core

    cd = _core.compute_dtype()
    dn = (((0,), (0,)), ((), ()))
    if cd is not None and a.dtype == jnp.float32:
        return jax.lax.dot_general(a.astype(cd), b.astype(cd), dn,
                                   preferred_element_type=jnp.float32)
    return jax.lax.dot_general(a, b, dn,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)


def _apply_act(z: jnp.ndarray, act: Optional[str]) -> jnp.ndarray:
    if act is None:
        return z
    if act == "relu":
        return jnp.maximum(z, 0)
    if act == "leaky_relu":
        return jnp.where(z >= 0, z, 0.2 * z)
    raise ValueError(act)


# ---------------------------------------------------------------------------
# pointwise_matmul: y = x @ w + b, custom VJP
# ---------------------------------------------------------------------------

def _mm_kernel(x_ref, w_ref, b_ref, o_ref):
    z = _mxu_dot(x_ref[0], w_ref[...])
    o_ref[...] = (z + b_ref[...]).astype(o_ref.dtype)[None]


def _mm_call(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    bsz, n, c_in = x.shape
    c_out = w.shape[1]
    tn = _tile_n(n)
    return pl.pallas_call(
        _mm_kernel,
        grid=(bsz, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, c_in), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, c_out), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c_out), x.dtype),
        interpret=_interpret(),
    )(x, w, b.reshape(1, c_out))


def _dwdb_kernel(x_ref, g_ref, dw_ref, db_ref):
    @pl.when((pl.program_id(0) == 0) & (pl.program_id(1) == 0))
    def _():
        dw_ref[...] = jnp.zeros_like(dw_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    dw_ref[...] += jax.lax.dot_general(
        x_ref[0], g_ref[0], (((0,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32).astype(dw_ref.dtype)
    db_ref[...] += jnp.sum(g_ref[0], axis=0, keepdims=True
                           ).astype(db_ref.dtype)


def _dwdb_call(x: jnp.ndarray, g: jnp.ndarray
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    bsz, n, c_in = x.shape
    c_out = g.shape[-1]
    tn = _tile_n(n)
    dw, db = pl.pallas_call(
        _dwdb_kernel,
        grid=(bsz, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, c_in), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn, c_out), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((c_in, c_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c_in, c_out), x.dtype),
            jax.ShapeDtypeStruct((1, c_out), x.dtype),
        ),
        interpret=_interpret(),
    )(x, g)
    return dw, db.reshape(c_out)


@jax.custom_vjp
def pointwise_matmul(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray
                     ) -> jnp.ndarray:
    """``[B, N, Cin] @ [Cin, Cout] + [Cout]`` on the MXU, tiled over N."""
    return _mm_call(x, w, b)


def _pm_fwd(x, w, b):
    return _mm_call(x, w, b), (x, w)


def _pm_bwd(res, g):
    x, w = res
    zeros = jnp.zeros((w.shape[0],), g.dtype)
    dx = _mm_call(g, w.T, zeros)
    dw, db = _dwdb_call(x, g)
    return dx, dw, db


pointwise_matmul.defvjp(_pm_fwd, _pm_bwd)


# ---------------------------------------------------------------------------
# fused_linear_affine_act: y = act((x @ w) * scale + shift)  (inference)
# ---------------------------------------------------------------------------

def _fused_kernel(act, x_ref, w_ref, sh_ref, sc_ref, o_ref):
    z = _mxu_dot(x_ref[0], w_ref[...])
    z = z * sc_ref[...] + sh_ref[...]
    o_ref[...] = _apply_act(z, act).astype(o_ref.dtype)[None]


def fused_linear_affine_act(x: jnp.ndarray, w: jnp.ndarray,
                            shift: jnp.ndarray, scale: jnp.ndarray,
                            act: Optional[str]) -> jnp.ndarray:
    """One fused kernel for conv1d + folded-BN + activation (eval path).

    ``shift`` must already include the conv bias folded through the BN
    scale (``ops/dispatch.py`` computes ``b*scale + (beta - mean*scale)``).
    """
    bsz, n, c_in = x.shape
    c_out = w.shape[1]
    tn = _tile_n(n)
    return pl.pallas_call(
        functools.partial(_fused_kernel, act),
        grid=(bsz, n // tn),
        in_specs=[
            pl.BlockSpec((1, tn, c_in), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_in, c_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tn, c_out), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c_out), x.dtype),
        interpret=_interpret(),
    )(x, w, shift.reshape(1, c_out), scale.reshape(1, c_out))


# ---------------------------------------------------------------------------
# fused_mlp_stack: several pointwise layers in one kernel (weights stay
# resident in VMEM across layers) — discriminator head / eval stacks.
# ---------------------------------------------------------------------------

def _stack_kernel(acts, n_layers, x_ref, *refs):
    w_refs = refs[:n_layers]
    s_refs = refs[n_layers:2 * n_layers]   # shifts
    c_refs = refs[2 * n_layers:3 * n_layers]  # scales
    o_ref = refs[3 * n_layers]
    h = x_ref[0]
    for li in range(n_layers):
        z = _mxu_dot(h, w_refs[li][...])
        z = z * c_refs[li][...] + s_refs[li][...]
        h = _apply_act(z, acts[li])
    o_ref[...] = h.astype(o_ref.dtype)[None]


def fused_mlp_stack(x: jnp.ndarray,
                    weights: Sequence[jnp.ndarray],
                    shifts: Sequence[jnp.ndarray],
                    scales: Sequence[jnp.ndarray],
                    acts: Sequence[Optional[str]]) -> jnp.ndarray:
    """Chain ``act_i((h @ w_i) * scale_i + shift_i)`` in one kernel.

    The whole weight set must fit VMEM alongside one N-tile of
    activations — true for every stack in this model zoo (the largest,
    the discriminator, is ~0.7 MB of weights).
    """
    bsz, n, _ = x.shape
    n_layers = len(weights)
    c_out = weights[-1].shape[1]
    widths = [w.shape for w in weights]
    # VMEM budget: weights + one tile of the widest activation.
    weight_bytes = sum(a * b for a, b in widths) * 4
    widest = max(max(a, b) for a, b in widths)
    tn = _tile_n(n, cap=256 if widest >= 512 else 512)
    kernel = functools.partial(_stack_kernel, tuple(acts), n_layers)
    in_specs = [pl.BlockSpec((1, tn, x.shape[-1]), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM)]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
    for s in shifts:
        in_specs.append(pl.BlockSpec((1, s.shape[-1]), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
    for s in scales:
        in_specs.append(pl.BlockSpec((1, s.shape[-1]), lambda i, j: (0, 0),
                                     memory_space=pltpu.VMEM))
    return pl.pallas_call(
        kernel,
        grid=(bsz, n // tn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tn, c_out), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n, c_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(weight_bytes + 8 * 1024 * 1024)),
        interpret=_interpret(),
    )(x, *weights, *[s.reshape(1, -1) for s in shifts],
      *[s.reshape(1, -1) for s in scales])
