"""Compute ops: jnp reference implementations + fused Pallas TPU kernels.

Every op has a pure-jnp implementation (the CPU-runnable fallback required
by config 1, ``BASELINE.json:7``) and, where it is on the hot path, a fused
Pallas kernel (``BASELINE.json:5`` "compile to fused Pallas kernels").
``dispatch.use_pallas(...)`` selects the path; parity tests in
``tests/test_kernels.py`` pin the two to ≤1e-5.
"""

from adversarial_learning_on_pointclouds_tpu.ops.dispatch import (  # noqa: F401
    linear_bn_act,
    linear_act,
    max_points,
    pallas_enabled,
    use_pallas,
)
from adversarial_learning_on_pointclouds_tpu.models.core import (  # noqa: F401
    mixed_precision,
)
