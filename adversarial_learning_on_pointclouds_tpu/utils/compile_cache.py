"""Persistent XLA compilation cache setup.

The bf16 adversarial step graph takes minutes to compile on the target
platform, so every measurement entrypoint (bench.py, the perf/e2e
scripts) enables JAX's persistent compilation cache before first device
use.  The cache directory must survive a host reboot — the driver's
bench run may land on a freshly booted machine, and a cold cache there
costs it 150-350 s of compile inside its own clock budget (the
BENCH_r04 rc=124 failure mode).  /tmp is a tmpfs on this host and was
wiped by reboots twice during round 5, so the default lives under
~/.cache; override with POINTTPU_CACHE_DIR.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pointtpu_jax_cache")
# The pre-round-5-session-4 location; read-migrated so an existing warm
# entry is not abandoned when the default moves.
LEGACY_DIR = "/tmp/pointtpu_jax_cache"


def cache_dir() -> str:
    return os.environ.get("POINTTPU_CACHE_DIR", DEFAULT_DIR)


def enable_persistent_cache(min_compile_time_secs: int = 5) -> str:
    """Point JAX's persistent compilation cache at a reboot-surviving
    directory.  Call before the first jit/compile.  Returns the dir.

    Best-effort: older jax versions without the config knobs, or a
    read-only home, must never break a measurement run.
    """
    import jax

    path = cache_dir()
    try:
        os.makedirs(path, exist_ok=True)
        # One-time migration: adopt any still-live legacy /tmp entries
        # (hard-link, fall back to copy) so a warm cache is not lost.
        if os.path.isdir(LEGACY_DIR) and LEGACY_DIR != path:
            for name in os.listdir(LEGACY_DIR):
                dst = os.path.join(path, name)
                if os.path.exists(dst):
                    continue
                src = os.path.join(LEGACY_DIR, name)
                try:
                    os.link(src, dst)
                except OSError:
                    import shutil

                    shutil.copy2(src, dst)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            min_compile_time_secs)
    except Exception:
        pass
    return path
