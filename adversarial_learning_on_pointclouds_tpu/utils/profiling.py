"""Profiling hooks (SURVEY.md §5 "Tracing / profiling").

``maybe_trace`` wraps a training run with ``jax.profiler`` when
``--profile_dir`` is set — producing an XProf/TensorBoard trace of the
jitted steps. ``debug_nans`` flips JAX's NaN checker for debug runs
(SURVEY.md §5 "Race detection / sanitizers": JAX's functional purity
removes data races by construction; the NaN checker and Pallas
interpreter mode are the remaining sanitizers).
"""

from __future__ import annotations

import contextlib
from typing import Optional

import jax


@contextlib.contextmanager
def maybe_trace(profile_dir: Optional[str]):
    if not profile_dir:
        yield
        return
    jax.profiler.start_trace(profile_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enabled: bool = True):
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enabled)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
