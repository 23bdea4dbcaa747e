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


def test_fused_eval_timing_sane():
    from scripts.tpu_kernel_check import check_timing
    check_timing()
