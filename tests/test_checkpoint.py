"""Checkpoint/resume round-trip tests (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np

from adversarial_learning_on_pointclouds_tpu.configs import (
    AdversarialConfig, ClassifyConfig,
)
from adversarial_learning_on_pointclouds_tpu.train import adversarial, classify
from adversarial_learning_on_pointclouds_tpu.utils import checkpoint

B, N = 4, 64


def _tree_equal(a, b):
    return all(np.array_equal(np.asarray(x), np.asarray(y))
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_full_state_roundtrip(tmp_path):
    cfg = ClassifyConfig(num_classes=4, batch_size=B, num_points=N)
    tx = classify.make_tx(cfg, 1)
    state = classify.create_state(cfg, 1)
    pts = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((B, N, 3)).astype(np.float32))
    labels = jnp.asarray((np.arange(B) % 4).astype(np.int32))
    state, _ = classify.train_step(state, pts, labels, cfg=cfg, tx=tx)

    checkpoint.save(str(tmp_path), 0, state)
    fresh = classify.create_state(cfg, 1)
    restored = checkpoint.restore(str(tmp_path), fresh)
    assert _tree_equal(restored.params, state.params)
    assert _tree_equal(restored.opt_state, state.opt_state)
    assert int(restored.step) == int(state.step)

    # Training continues identically from the restored state.
    s1, m1 = classify.train_step(state, pts, labels, cfg=cfg, tx=tx)
    s2, m2 = classify.train_step(restored, pts, labels, cfg=cfg, tx=tx)
    assert float(m1["loss"]) == float(m2["loss"])
    assert _tree_equal(s1.params, s2.params)


def test_latest_step_selection(tmp_path):
    cfg = ClassifyConfig(num_classes=4, batch_size=B, num_points=N)
    state = classify.create_state(cfg, 1)
    checkpoint.save(str(tmp_path), 0, state)
    checkpoint.save(str(tmp_path), 7, state)
    checkpoint.save(str(tmp_path), 3, state)
    assert checkpoint.latest_step(str(tmp_path)) == 7
    assert checkpoint.latest_step(str(tmp_path / "missing")) is None


def test_params_only_resume_mirrors_reference(tmp_path):
    """--compat_resume semantics: params+BN restored, optimizer fresh."""
    cfg = ClassifyConfig(num_classes=4, batch_size=B, num_points=N)
    tx = classify.make_tx(cfg, 1)
    state = classify.create_state(cfg, 1)
    pts = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((B, N, 3)).astype(np.float32))
    labels = jnp.asarray((np.arange(B) % 4).astype(np.int32))
    for _ in range(3):
        state, _ = classify.train_step(state, pts, labels, cfg=cfg, tx=tx)
    checkpoint.save(str(tmp_path), 3, state)

    fresh = classify.create_state(cfg, 1)
    warm = checkpoint.load_params_only(str(tmp_path), fresh)
    assert _tree_equal(warm.params, state.params)
    assert _tree_equal(warm.bn_state, state.bn_state)
    # Optimizer/step must be the FRESH ones (reference restarts them).
    assert int(warm.step) == 0
    assert _tree_equal(warm.opt_state, fresh.opt_state)


def test_gan_state_roundtrip(tmp_path):
    cfg = AdversarialConfig(num_parts=4, batch_size=B, num_points=N,
                            feature_transform=False)
    state = adversarial.create_state(cfg, 1)
    checkpoint.save(str(tmp_path), 0, state)
    restored = checkpoint.restore(str(tmp_path),
                                  adversarial.create_state(cfg, 1))
    assert _tree_equal(restored.g_params, state.g_params)
    assert _tree_equal(restored.d_params, state.d_params)


def test_async_saver_roundtrip_and_error_propagation(tmp_path):
    """AsyncSaver: (a) checkpoints written off-thread are durable and
    restorable after close(); (b) a writer-thread failure surfaces on
    close() instead of being swallowed."""
    cfg = ClassifyConfig(num_classes=4, batch_size=B, num_points=N)
    state = classify.create_state(cfg, 1)
    out = str(tmp_path / "async_ok")
    with checkpoint.AsyncSaver() as saver:
        saver.save(out, 0, state)
        saver.save(out, 1, state)
    assert checkpoint.latest_step(out) == 1
    restored = checkpoint.restore(out, classify.create_state(cfg, 1))
    assert _tree_equal(restored.params, state.params)

    saver = checkpoint.AsyncSaver()
    saver.save(str(tmp_path / "f\x00bad"), 0, state)  # invalid path
    with np.testing.assert_raises(Exception):
        saver.close()
