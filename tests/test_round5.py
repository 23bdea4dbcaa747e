"""Round-5 session-4 additions: reboot-surviving persistent compile cache."""

import os

from adversarial_learning_on_pointclouds_tpu.utils import compile_cache


def test_cache_dir_env_override(monkeypatch, tmp_path):
    monkeypatch.setenv("POINTTPU_CACHE_DIR", str(tmp_path / "cc"))
    assert compile_cache.cache_dir() == str(tmp_path / "cc")
    monkeypatch.delenv("POINTTPU_CACHE_DIR")
    # Default must NOT live on the reboot-wiped tmpfs.
    assert not compile_cache.cache_dir().startswith("/tmp/")
    assert compile_cache.cache_dir().startswith(os.path.expanduser("~"))


def test_enable_creates_dir_and_migrates_legacy(monkeypatch, tmp_path):
    legacy = tmp_path / "legacy"
    legacy.mkdir()
    (legacy / "entry_a").write_bytes(b"cached-executable")
    target = tmp_path / "cc"
    monkeypatch.setenv("POINTTPU_CACHE_DIR", str(target))
    monkeypatch.setattr(compile_cache, "LEGACY_DIR", str(legacy))
    out = compile_cache.enable_persistent_cache()
    assert out == str(target)
    assert (target / "entry_a").read_bytes() == b"cached-executable"
    # Re-running with an already-present entry must not fail.
    assert compile_cache.enable_persistent_cache() == str(target)

    import jax

    assert jax.config.jax_compilation_cache_dir == str(target)
