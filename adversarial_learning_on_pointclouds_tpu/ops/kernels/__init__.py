"""Pallas/Mosaic TPU kernels — the framework's native compute surface.

The reference's native surface is cuDNN conv1d + cuBLAS matmul reached
through ``torch.nn`` (SURVEY.md §2.9, "the reference contains zero
first-party native code"). The TPU-native equivalents here are:

* ``shared_mlp``   — pointwise-MLP matmul (+ fused BN/affine + activation
  epilogue) with a custom-VJP Pallas backward; replaces every
  ``conv1d(k, k', 1)`` in the model zoo.
* ``encoder_fused`` — inference megakernel: the full encoder trunk with
  the symmetric max-pool fused into the last layer's epilogue, never
  materializing ``[B, N, 1024]`` in HBM.
* ``augment_fused`` — the normalize/rotate/jitter/dropout chain as one
  kernel using the on-core PRNG.

Every kernel has a jnp reference implementation (its ``*_reference``
sibling or the XLA path in ``ops/dispatch.py``) and interpreter-mode
parity tests in ``tests/test_kernels.py``.
"""
