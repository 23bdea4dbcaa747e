"""Pin the driver contract: ``entry()`` is jittable single-chip and
``dryrun_multichip`` runs one sharded G+D step on an emulated mesh."""

import os
import subprocess
import sys

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8, 1024, 50)
    # log-probabilities: rows normalize.
    import jax.numpy as jnp
    s = jnp.exp(out).sum(-1)
    assert float(jnp.max(jnp.abs(s - 1.0))) < 1e-3


def test_dryrun_multichip_subprocess():
    """Run in a subprocess (dryrun must force the CPU backend before any
    device use, which this test session has already performed)."""
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "4"],
        capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "dryrun_multichip(4): OK" in r.stdout
