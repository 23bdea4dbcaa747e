"""Compiled-kernel parity suite for the real TPU chip: ``pytest tests -m
tpu`` (one command; VERDICT round 1, next-round #9).

Wraps the ``check_*`` functions of ``scripts/tpu_kernel_check.py`` — the
CPU suite covers the same kernels in interpreter mode, but the compiled
Mosaic lowering and the on-core PRNG (stubbed on CPU) only exist on
hardware. Auto-skipped when the backend is CPU (the default test run)."""

import pytest

pytestmark = pytest.mark.tpu


@pytest.fixture(scope="module", autouse=True)
def _require_tpu():
    import jax
    if jax.devices()[0].platform == "cpu":
        pytest.skip("compiled-kernel parity needs the real TPU chip")


def test_pointwise_matmul_compiled():
    from scripts.tpu_kernel_check import check_pointwise_matmul
    check_pointwise_matmul()


def test_eval_parity_compiled():
    from scripts.tpu_kernel_check import check_eval_parity
    check_eval_parity()


def test_augment_kernel_distributions():
    from scripts.tpu_kernel_check import check_augment_distributions
    check_augment_distributions()


def test_training_kernel_grads_compiled():
    from scripts.tpu_kernel_check import check_training_grads
    check_training_grads()


def test_fc_head_train_compiled():
    from scripts.tpu_kernel_check import check_fc_head_train
    check_fc_head_train()


def test_pool_fc_epilogue_compiled():
    from scripts.tpu_kernel_check import check_pool_fc_epilogue
    check_pool_fc_epilogue()


def test_trunk_grouped_compiled():
    """groups=2 fused trunk (--paired_trunks): the per-group stat
    accumulators use i//bpg block index maps — a revisit pattern only
    hardware Mosaic validates (interpreter mode accepts more than the
    compiler does)."""
    from scripts.tpu_kernel_check import check_trunk_grouped
    check_trunk_grouped()


def test_fused_eval_timing_sane():
    from scripts.tpu_kernel_check import check_timing
    check_timing()


def test_serving_artifact_executes_on_tpu():
    """The multi-platform serving artifact (utils/serving.py, lowered for
    cpu+tpu from ANY host) must deserialize and execute on the real chip
    with live-model parity — the deploy-side half of the export story."""
    import numpy as np

    from adversarial_learning_on_pointclouds_tpu.configs import (
        ClassifyConfig,
    )
    from adversarial_learning_on_pointclouds_tpu.models import classifier
    from adversarial_learning_on_pointclouds_tpu.ops import use_pallas
    from adversarial_learning_on_pointclouds_tpu.train import classify
    from adversarial_learning_on_pointclouds_tpu.utils import serving

    n = 64
    cfg = ClassifyConfig(num_points=n, num_classes=7,
                         feature_transform=True)
    st = classify.create_state(cfg, 1)
    art = serving.export_classifier(st.params, st.bn_state, n)  # cpu+tpu
    import jax.export as jexport
    loaded = jexport.deserialize(bytearray(art.serialize()))
    x = np.random.default_rng(0).standard_normal((4, n, 3)).astype(
        np.float32)
    got = np.asarray(loaded.call(x))  # executes on the TPU backend
    with use_pallas(False):
        want = np.asarray(classifier.apply_classifier(
            st.params, st.bn_state, x, train=False)[0])
    np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)


def test_ref_npoints_compiled():
    from scripts.tpu_kernel_check import check_ref_npoints
    check_ref_npoints()


def test_disc_geometry_width_compiled():
    from scripts.tpu_kernel_check import check_disc_geometry_width
    check_disc_geometry_width()


def test_pallas_serving_artifact_executes_on_tpu():
    """The TPU-pinned Pallas serving artifact (use_pallas_kernels=True):
    the Mosaic custom calls inside a deserialized jax.export artifact
    must execute on the chip and match the live XLA path — the opt-in
    fast-serving half of the export story (export_serving.py --pallas).
    Symbolic batch: ONE artifact must serve two batch sizes."""
    import numpy as np

    from adversarial_learning_on_pointclouds_tpu.configs import (
        SegmentConfig,
    )
    from adversarial_learning_on_pointclouds_tpu.models import segmenter
    from adversarial_learning_on_pointclouds_tpu.ops import use_pallas
    from adversarial_learning_on_pointclouds_tpu.train import segment
    from adversarial_learning_on_pointclouds_tpu.utils import serving

    n = 64
    cfg = SegmentConfig(num_points=n, num_parts=11, feature_transform=True)
    st = segment.create_state(cfg, 1)
    art = serving.export_segmenter(st.params, st.bn_state, n,
                                   platforms=("tpu",),
                                   use_pallas_kernels=True)
    assert art.mlir_module().count("tpu_custom_call") > 0
    import jax.export as jexport
    loaded = jexport.deserialize(bytearray(art.serialize()))
    rng = np.random.default_rng(0)
    for b in (4, 8):
        x = rng.standard_normal((b, n, 3)).astype(np.float32)
        got = np.asarray(loaded.call(x))
        with use_pallas(False):
            want = np.asarray(segmenter.apply_segmenter(
                st.params, st.bn_state, x, train=False)[0])
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-5)
