"""Round-2 feature tests: reference-faithful live data path (fresh fixed-N
resample, normalize, reachable point dropout), stream cycling, K-stacked
scan batches, per-stream adversarial weights, workers wiring, and the
Pallas/bf16 jit-cache-key fix (ADVICE round 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adversarial_learning_on_pointclouds_tpu.configs import (
    AdversarialConfig, ClassifyConfig, SegmentConfig,
)
from adversarial_learning_on_pointclouds_tpu.data import augment, loader
from adversarial_learning_on_pointclouds_tpu.ops import dispatch
from adversarial_learning_on_pointclouds_tpu.train import (
    adversarial, classify,
)

B, N = 8, 64


def _pts(n_src=N, b=B, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, n_src, 3)).astype(np.float32))


# ---------------------------------------------------------------------------
# Live data-path fidelity (VERDICT round 1, items 1-4)
# ---------------------------------------------------------------------------

def test_chain_resamples_fresh_per_key():
    """The on-device chain draws a FRESH fixed-N subsample per call
    (reference: np.random.choice per __getitem__) — different rng keys
    select different points."""
    cfg = ClassifyConfig(num_points=32, augment=False, normalize=False)
    x = _pts(n_src=64)
    a = augment.chain_from_cfg(jax.random.PRNGKey(1), cfg, x)
    b = augment.chain_from_cfg(jax.random.PRNGKey(2), cfg, x)
    assert a.shape == (B, 32, 3) and b.shape == (B, 32, 3)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_chain_normalizes_by_default():
    """cfg.normalize defaults True: every cloud leaves the chain centered
    and inside the unit sphere (reference __getitem__ semantics)."""
    cfg = ClassifyConfig(num_points=N, augment=False)
    assert cfg.normalize and cfg.resample
    x = 5.0 * _pts() + 3.0
    y = np.asarray(augment.chain_from_cfg(jax.random.PRNGKey(0), cfg, x))
    centroids = y.mean(axis=1)
    radii = np.linalg.norm(y, axis=-1).max(axis=1)
    assert np.abs(centroids).max() < 1e-5
    assert np.all(radii < 1.0 + 1e-5)


def test_chain_point_dropout_reachable():
    """--point_dropout is wired: the flag changes the output (dropped
    points collapse onto point 0)."""
    base = ClassifyConfig(num_points=N, augment=False, normalize=False,
                          seed=3)
    on = ClassifyConfig(num_points=N, augment=False, normalize=False,
                        point_dropout=True, seed=3)
    x = _pts()
    k = jax.random.PRNGKey(7)
    y_off = np.asarray(augment.chain_from_cfg(k, base, x))
    y_on = np.asarray(augment.chain_from_cfg(k, on, x))
    assert np.allclose(y_off, np.asarray(x))
    assert not np.allclose(y_on, y_off)
    # dropped points equal the first point of their cloud
    diff = ~np.all(y_on == y_off, axis=-1)  # [B, N] changed mask
    changed = np.argwhere(diff)
    assert len(changed) > 0
    for bi, ni in changed[:50]:
        assert np.allclose(y_on[bi, ni], y_on[bi, 0])


def test_segment_labels_ride_resample_gather():
    """Per-point labels stay aligned with their points through the
    resample (labels are a function of x-coordinate sign here)."""
    cfg = SegmentConfig(num_parts=2, num_points=32, augment=False,
                        normalize=False, feature_transform=False)
    x = _pts(n_src=64)
    lab = (np.asarray(x)[:, :, 0] > 0).astype(np.int32)
    y, ylab = augment.chain_from_cfg(jax.random.PRNGKey(5), cfg, x,
                                     jnp.asarray(lab))
    y, ylab = np.asarray(y), np.asarray(ylab)
    assert y.shape == (B, 32, 3) and ylab.shape == (B, 32)
    assert np.array_equal((y[:, :, 0] > 0).astype(np.int32), ylab)


def test_runner_trains_on_full_resolution_with_device_resample(tmp_path):
    """End-to-end: runner feeds full-resolution (non-subsampled) clouds
    and the step resamples to cfg.num_points on device."""
    from adversarial_learning_on_pointclouds_tpu.data.modelnet40 import (
        make_synthetic_modelnet_h5,
    )
    from adversarial_learning_on_pointclouds_tpu.train import runner
    root = make_synthetic_modelnet_h5(str(tmp_path / "mn"), num_train=16,
                                      num_test=8, num_points=96)
    cfg = ClassifyConfig(dataset=root, num_points=48, batch_size=8,
                         epochs=1, out_dir=str(tmp_path / "out"), quiet=True)
    x_tr, y_tr, x_te, y_te = runner._modelnet_arrays(cfg)
    assert x_tr.shape[1] == 96      # full source resolution kept
    assert x_te.shape[1] == 48      # test prepared at num_points
    out = runner.run_classification(cfg, epochs=1)
    assert 0.0 <= out["best_accuracy"] <= 1.0


# ---------------------------------------------------------------------------
# Stream cycling + K-stacking (VERDICT weak 3, next-round 4)
# ---------------------------------------------------------------------------

def test_cycling_host_batches_reshuffles_and_persists():
    arrays = (np.arange(12, dtype=np.float32).reshape(12, 1),)
    it = loader.cycling_host_batches(arrays, batch_size=4, seed=0)
    first_pass = [next(it)[0] for _ in range(3)]
    second_pass = [next(it)[0] for _ in range(3)]
    a = np.sort(np.concatenate(first_pass).ravel())
    b = np.sort(np.concatenate(second_pass).ravel())
    assert np.array_equal(a, np.arange(12))   # full coverage each pass
    assert np.array_equal(b, np.arange(12))
    assert not np.array_equal(np.concatenate(first_pass),
                              np.concatenate(second_pass))  # reshuffled


def test_device_batches_k_stack_groups_and_tail():
    arrays = (np.arange(28, dtype=np.float32).reshape(7, 4),
              np.arange(7, dtype=np.int32))
    host = loader.host_batch_iterator(arrays, batch_size=1, shuffle=False)
    out = list(loader.device_batches(host, k_stack=3, prefetch=0))
    # 7 batches -> two stacks of 3 + one single tail batch
    stacked = [b for b, s in out if s]
    single = [b for b, s in out if not s]
    assert len(stacked) == 2 and len(single) == 1
    assert stacked[0][0].shape == (3, 1, 4)
    assert stacked[0][1].shape == (3, 1)
    assert single[0][0].shape == (1, 4)
    # order preserved: concatenation reproduces the source
    flat = np.concatenate([np.asarray(b[1]).reshape(-1)
                           for b, _ in out])
    assert np.array_equal(flat, np.arange(7))


def test_adversarial_scan_matches_single_steps():
    """K fused scan steps == K single steps (same batches, same order)."""
    cfg = AdversarialConfig(num_parts=4, batch_size=4, num_points=N,
                            feature_transform=False, augment=False,
                            normalize=False)
    g_tx, d_tx = adversarial.make_txs(cfg, steps_per_epoch=4)
    rng = np.random.default_rng(0)
    K = 3
    xl = jnp.asarray(rng.standard_normal((K, 4, N, 3)).astype(np.float32))
    yl = jnp.asarray(rng.integers(0, 4, (K, 4, N)).astype(np.int32))
    xu = jnp.asarray(rng.standard_normal((K, 4, N, 3)).astype(np.float32))

    s_scan = adversarial.create_state(cfg, 4)
    s_scan, ms = adversarial.train_steps_scan(s_scan, xl, yl, xu, cfg=cfg,
                                              g_tx=g_tx, d_tx=d_tx)
    s_seq = adversarial.create_state(cfg, 4)
    seq_losses = []
    for i in range(K):
        s_seq, m = adversarial.train_step(s_seq, xl[i], yl[i], xu[i],
                                          cfg=cfg, g_tx=g_tx, d_tx=d_tx)
        seq_losses.append(float(m["loss_g"]))
    assert int(s_scan.step) == int(s_seq.step) == K
    # Losses only, per CLAUDE.md: the scan body and the unrolled step are
    # separately compiled fp paths, and Adam turns near-zero-grad
    # reassociation noise into ±lr param deltas — post-update params are
    # not a stable equivalence signal. The per-step loss trajectory (all
    # K steps, each computed from the previous step's updated params)
    # transitively pins the updates at working precision.
    np.testing.assert_allclose(np.asarray(ms["loss_g"]), seq_losses,
                               rtol=1e-5)
    np.testing.assert_allclose(float(ms["loss_d"][-1]),
                               float(m["loss_d"]), rtol=1e-5)


def test_run_adversarial_with_scan(tmp_path):
    """--scan K works through the full runner on real (synthetic) data."""
    from adversarial_learning_on_pointclouds_tpu.data.shapenet_part import (
        make_synthetic_shapenet,
    )
    from adversarial_learning_on_pointclouds_tpu.train import runner
    root = make_synthetic_shapenet(str(tmp_path / "sn"), num_shapes=64,
                                   num_points=N)
    cfg = AdversarialConfig(dataset=root, num_points=N, batch_size=8,
                            epochs=1, scan=2, labeled_ratio=0.5,
                            feature_transform=False,
                            out_dir=str(tmp_path / "out"), quiet=True)
    out = runner.run_adversarial(cfg, epochs=1)
    assert 0.0 <= out["best_miou"] <= 1.0
    # 48 train shapes: 24 labeled -> 3 steps (one stack of 2 + tail of 1)
    assert int(out["state"].step) == 3


# ---------------------------------------------------------------------------
# Per-stream adversarial weight (VERDICT next-round 8)
# ---------------------------------------------------------------------------

def test_lambda_adv_unl_loss_composition():
    """Pin the G-loss composition: default = l_ce + lambda_adv * mean(a_l,
    a_u); per-stream = l_ce + lambda_adv * a_l + lambda_adv_unl * a_u."""
    kw = dict(num_parts=4, batch_size=4, num_points=N,
              feature_transform=False, augment=False, normalize=False,
              lambda_semi=0.0)
    cfg0 = AdversarialConfig(**kw)
    cfg_lab_only = AdversarialConfig(lambda_adv_unl=0.0, **kw)
    cfg_split = AdversarialConfig(lambda_adv_unl=0.003, **kw)
    rng = np.random.default_rng(1)
    xl = jnp.asarray(rng.standard_normal((4, N, 3)).astype(np.float32))
    yl = jnp.asarray(rng.integers(0, 4, (4, N)).astype(np.int32))
    xu = jnp.asarray(rng.standard_normal((4, N, 3)).astype(np.float32))

    state = adversarial.create_state(cfg0, 4)
    semi_on = jnp.float32(0.0)

    def g_loss(cfg):
        t, aux = adversarial._g_loss_fn(state.g_params, state.d_params,
                                        state.g_bn_state, xl, yl, xu,
                                        cfg, semi_on)
        return float(t), {k: float(v) for k, v in aux.items()
                          if k.startswith("l_")}

    t0, aux0 = g_loss(cfg0)
    t_lab, _ = g_loss(cfg_lab_only)
    t_split, _ = g_loss(cfg_split)
    l_ce, l_adv_mean = aux0["l_ce"], aux0["l_adv"]

    # default composition
    assert abs(t0 - (l_ce + cfg0.lambda_adv * l_adv_mean)) < 1e-5
    # recover the per-stream terms and pin both variants
    a_l = (t_lab - l_ce) / cfg0.lambda_adv
    a_u = 2 * l_adv_mean - a_l
    assert abs(t_split - (l_ce + cfg0.lambda_adv * a_l + 0.003 * a_u)) < 1e-5
    assert abs(a_l - a_u) > 1e-8  # the two streams are really distinct


# ---------------------------------------------------------------------------
# --workers wiring (VERDICT next-round 7)
# ---------------------------------------------------------------------------

def test_workers_controls_prefetch_depth(monkeypatch):
    """--workers N has an observable effect: it sets the loader's prefetch
    depth, and the runner's batch iteration consumes it."""
    from adversarial_learning_on_pointclouds_tpu.train import runner
    assert runner._prefetch_depth(ClassifyConfig(workers=0)) == 2
    assert runner._prefetch_depth(ClassifyConfig(workers=7)) == 7

    seen = []
    orig = loader.device_batches

    def spy(host, sharding=None, k_stack=0, prefetch=2):
        seen.append(prefetch)
        return orig(host, sharding, k_stack, prefetch)

    monkeypatch.setattr(loader, "device_batches", spy)
    arrays = (np.zeros((8, 4, 3), np.float32), np.zeros(8, np.int32))
    list(loader.batch_iterator(arrays, 4, prefetch=5))
    assert seen == [5]

    # CLI flag reaches the config
    from adversarial_learning_on_pointclouds_tpu.configs import (
        classify_config_from_args,
    )
    cfg = classify_config_from_args(["--workers", "6"])
    assert cfg.workers == 6 and runner._prefetch_depth(cfg) == 6


# ---------------------------------------------------------------------------
# Path flags in the jit cache key (ADVICE round 1, dispatch.py)
# ---------------------------------------------------------------------------

def test_path_flags_keyed_into_jit_cache():
    """Toggling mixed_precision between calls of the SAME jitted step
    re-traces (different static paths) instead of silently reusing the
    previous path — bf16 and fp32 results must differ."""
    from adversarial_learning_on_pointclouds_tpu.ops import mixed_precision
    cfg = ClassifyConfig(num_classes=4, batch_size=B, num_points=N,
                         augment=False, normalize=False)
    tx = classify.make_tx(cfg, steps_per_epoch=1)
    state = classify.create_state(cfg, steps_per_epoch=1)
    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.standard_normal((B, N, 3)).astype(np.float32))
    labels = jnp.asarray((np.arange(B) % 4).astype(np.int32))

    _, m_fp32 = classify.train_step(state, pts, labels, cfg=cfg, tx=tx)
    with mixed_precision():
        assert dispatch.current_paths()[2] == "bfloat16"
        _, m_bf16 = classify.train_step(state, pts, labels, cfg=cfg, tx=tx)
    _, m_fp32_again = classify.train_step(state, pts, labels, cfg=cfg, tx=tx)

    assert float(m_fp32["loss"]) == float(m_fp32_again["loss"])
    assert float(m_fp32["loss"]) != float(m_bf16["loss"])


def test_hung_optimizer_schedule_options():
    """--optimizer sgd / --lr_schedule poly (Hung et al. originals) build
    and step; poly decays toward zero over total_steps."""
    import optax

    from adversarial_learning_on_pointclouds_tpu.train import state as st
    tx = st.make_optimizer(2.5e-4, 0.9, 0.999, 20, 0.5, 10,
                           optimizer="sgd", lr_schedule="poly",
                           total_steps=100, poly_power=0.9)
    params = {"w": jnp.ones((3,))}
    opt = tx.init(params)
    g = {"w": jnp.ones((3,))}
    u1, opt = tx.update(g, opt, params)
    first = float(jnp.abs(u1["w"][0]))
    for _ in range(98):
        u, opt = tx.update(g, opt, params)
    u_last, _ = tx.update(g, opt, params)
    # With constant lr the momentum trace would push |update| to ~10x the
    # first step; poly decay must drag it BELOW the first step instead.
    assert float(jnp.abs(u_last["w"][0])) < first * 0.5
    with pytest.raises(ValueError):
        st.make_optimizer(1e-3, 0.9, 0.999, 20, 0.5, 10,
                          optimizer="adagrad")
    # the full trainer builds with the Hung combination
    cfg = AdversarialConfig(num_parts=4, batch_size=4, num_points=N,
                            optimizer="sgd", lr_schedule="poly",
                            feature_transform=False, epochs=2)
    g_tx, d_tx = adversarial.make_txs(cfg, steps_per_epoch=3)
    s = adversarial.create_state(cfg, 3)
    assert s is not None and g_tx is not None and d_tx is not None


def test_constant_arity_eval_batches():
    """drop_last=False appends the validity mask to EVERY batch (ADVICE:
    constant tuple arity)."""
    arrays = (np.zeros((10, 4, 3), np.float32), np.zeros(10, np.int32))
    batches = list(loader.batch_iterator(arrays, 4, shuffle=False,
                                         drop_last=False, prefetch=0))
    assert all(len(b) == 3 for b in batches)
    masks = [np.asarray(b[2]) for b in batches]
    assert masks[0].all() and masks[1].all()
    assert masks[2].sum() == 2  # 10 = 4 + 4 + 2 padded
