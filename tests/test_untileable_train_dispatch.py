"""Untileable-N TRAINING dispatch (VERDICT r4 / ADVICE r4 low #3).

The reference lineage's seg default N=2500 has no multiple-of-8 divisor
<= the 512 tile cap, so the fused training kernels would fall back to a
full-width tile that blows Mosaic's 16 MB scoped-VMEM limit (measured on
chip: 20.75 MB for the seg head — TPUCHECK_r04/r05). The eval
megakernels pad N up to the cap (folded stats — pad rows are inert);
the TRAINING kernels compute batch statistics in-kernel, so padding is
unsound there and the model dispatch must instead fall back to the XLA
training path. These tests pin that routing; the compiled VMEM behavior
itself is pinned by ``tests -m tpu`` (test_ref_npoints_compiled).
"""

import jax
import jax.numpy as jnp
import pytest

from adversarial_learning_on_pointclouds_tpu.models import (
    apply_segmenter, init_segmenter,
)
from adversarial_learning_on_pointclouds_tpu.ops import use_pallas
from adversarial_learning_on_pointclouds_tpu.ops.dispatch import (
    train_tiling_ok,
)


@pytest.mark.parametrize("n,ok", [
    (2048, True),    # bench/E2E default: 512-wide tiles
    (1024, True),
    (512, True),     # == cap: single full-width tile, fits
    (320, True),     # < cap: full-width tile, fits
    (1000, True),    # reference-plausible, tiles at 200
    (3000, True),    # reference-plausible, 8 | 3000
    (2500, False),   # reference seg default: no tile, VMEM OOM compiled
    (1500, False),   # second untileable size (1500 = 4 x 375)
])
def test_train_tiling_ok_values(n, ok):
    assert train_tiling_ok(n) is ok


def _pallas_calls_with_dim(jaxpr, dim):
    """Recursively count pallas_call eqns whose in/out avals carry
    ``dim`` — i.e. kernels tiled over the point axis."""
    hits = 0
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            shapes = [tuple(getattr(v, "aval", None) and v.aval.shape or ())
                      for v in list(eqn.invars) + list(eqn.outvars)]
            if any(dim in s for s in shapes):
                hits += 1
        for val in eqn.params.values():
            closed = getattr(val, "jaxpr", None)
            if closed is not None and hasattr(val, "eqns"):
                hits += _pallas_calls_with_dim(val, dim)
            elif closed is not None and hasattr(closed, "eqns"):
                hits += _pallas_calls_with_dim(closed, dim)
            elif isinstance(val, (list, tuple)):
                for item in val:
                    c = getattr(item, "jaxpr", None)
                    if c is not None and hasattr(c, "eqns"):
                        hits += _pallas_calls_with_dim(c, dim)
    return hits


def _train_loss_point_kernels(n):
    params, state = init_segmenter(jax.random.PRNGKey(0), 50,
                                   feature_transform=True)
    x = jnp.zeros((2, n, 3))

    def loss(p):
        with use_pallas():
            logp, _, _, _ = apply_segmenter(p, state, x, train=True)
        return jnp.sum(logp)

    jaxpr = jax.make_jaxpr(jax.grad(loss))(params)
    return _pallas_calls_with_dim(jaxpr.jaxpr, n)


def test_untileable_n_routes_train_to_xla():
    """At N=2500 the N-axis training kernels must be absent from the
    trace (XLA fallback); the B-axis epilogue kernel may remain. At a
    tileable N the fused kernels must be present (the gate must not
    over-fire and silently de-optimize the hot path)."""
    assert _train_loss_point_kernels(512) > 0
    assert _train_loss_point_kernels(2500) == 0


def test_untileable_n_adversarial_step_routes_to_xla():
    """The full G+D train step at N=2500 must trace with NO pallas
    kernel carrying the point axis (disc_fused included — its
    known-logits D-step path only exists under the fused family)."""
    from adversarial_learning_on_pointclouds_tpu.configs import (
        AdversarialConfig,
    )
    from adversarial_learning_on_pointclouds_tpu.train import adversarial

    n = 2500
    cfg = AdversarialConfig(batch_size=2, num_points=n, num_parts=10,
                            feature_transform=True, augment=False)
    g_tx, d_tx = adversarial.make_txs(cfg, steps_per_epoch=10)
    state = adversarial.create_state(cfg, 10)
    x_l = jnp.zeros((2, n, 3))
    y_l = jnp.zeros((2, n), jnp.int32)
    x_u = jnp.zeros((2, n, 3))

    def step(s):
        with use_pallas():
            return adversarial._train_step_impl(
                s, x_l, y_l, x_u, cfg, g_tx, d_tx)

    jaxpr = jax.make_jaxpr(step)(state)
    assert _pallas_calls_with_dim(jaxpr.jaxpr, n) == 0


def test_untileable_n_train_parity_executes():
    """Executed (not just traced) parity at a smaller untileable N: the
    pallas-context train loss must route to XLA and agree with the plain
    path; grads finite."""
    params, state = init_segmenter(jax.random.PRNGKey(1), 10,
                                   feature_transform=False)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 1500, 3))

    def loss(p, use):
        def inner():
            logp, _, _, _ = apply_segmenter(p, state, x, train=True)
            return jnp.mean(logp ** 2)
        if use:
            with use_pallas():
                return inner()
        return inner()

    ref = float(jax.jit(lambda p: loss(p, False))(params))
    pal = float(jax.jit(lambda p: loss(p, True))(params))
    # Same XLA math for every N-axis op; only the B-axis fc-head epilogue
    # kernel differs (fp-reassociation level).
    assert abs(pal - ref) <= 1e-4 * (1 + abs(ref)), (pal, ref)
    g = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    assert all(bool(jnp.all(jnp.isfinite(l)))
               for l in jax.tree_util.tree_leaves(g))
