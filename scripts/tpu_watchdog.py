#!/usr/bin/env python
"""TPU-tunnel watchdog: probe the backend, then run a chip agenda with
the host core to itself.

The tunneled single-chip backend in this environment wedges for
minutes-to-hours and recovers on its own lease expiry (observed every
round since round 2; longest >7 h). A wedged backend HANGS clients
rather than erroring, so detection must be a SUBPROCESS probe with a
hard timeout — the same pattern ``bench.py --backend_wait_s`` uses
(reference: the round-3 driver bench died at backend init because it
probed in-process).

This tool formalizes the session pattern that previously lived in
throwaway ``/tmp`` shell scripts (CLAUDE.md "chip-FIRST since
session 3"):

1. probe every ``--interval`` seconds until the backend answers;
2. SIGSTOP the CPU job process groups listed in ``--cpu_groups`` (one
   pgid per line; missing/dead pgids are skipped) so the chip agenda
   gets the whole host core — host-side concurrency during compiles has
   produced real SIGABRT/SEGV crashes on this 1-core host;
3. run each agenda command in order (shell strings, each under
   ``--cmd_timeout``), logging rc + wall per stage;
4. SIGCONT the groups (always — also on agenda failure or Ctrl-C).

Stages keep going after a failure by default (a failed perf probe must
not eat the banked-bench window); ``--stop_on_fail`` restores strict
ordering.

Typical use (detached, survives the session):

    setsid nohup /opt/venv/bin/python scripts/tpu_watchdog.py \
        --cpu_groups /tmp/cpu_groups --log /tmp/chip_queue.log \
        --agenda 'python bench.py --verbose > /tmp/bench.log 2>&1' \
                 'python scripts/record_tpucheck.py --json TPUCHECK.json' &
"""

from __future__ import annotations

import argparse
import os
import signal
import subprocess
import sys
import time

_PROBE = ("import jax, jax.numpy as jnp; jax.devices(); "
          "assert float(jnp.sum(jnp.ones((128, 128)))) == 16384.0")


def probe_backend(timeout_s: float = 120.0, runner=subprocess.run) -> bool:
    """One subprocess probe; True iff the backend executed a program."""
    try:
        r = runner([sys.executable, "-c", _PROBE], timeout=timeout_s,
                   capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def read_pgids(path: str | None) -> list[int]:
    """Parse a pgid-per-line file; blank lines/comments/garbage skipped."""
    if not path or not os.path.exists(path):
        return []
    out = []
    for ln in open(path):
        ln = ln.split("#", 1)[0].strip()
        if ln:
            try:
                out.append(int(ln))
            except ValueError:
                pass
    return out


def _signal_groups(pgids: list[int], sig: int, log) -> None:
    for g in pgids:
        try:
            os.killpg(g, sig)
            log(f"  sent {signal.Signals(sig).name} to pgid {g}")
        except ProcessLookupError:
            pass  # job already finished — fine
        except PermissionError as e:  # pragma: no cover - environment
            log(f"  killpg({g}) failed: {e}")


def _run_stage(cmd: str, cmd_timeout: float, log) -> int:
    """One shell stage in its OWN session: a timeout kills the whole
    process group, not just the ``/bin/sh`` wrapper — otherwise the
    actual chip job survives as an orphan still holding the device
    while the watchdog moves on (and SIGCONTs the CPU jobs into the
    exact host-concurrency crash this tool exists to prevent)."""
    proc = subprocess.Popen(cmd, shell=True, start_new_session=True)
    try:
        return proc.wait(timeout=cmd_timeout)
    except subprocess.TimeoutExpired:
        log(f"  stage TIMED OUT after {cmd_timeout:.0f}s — killing its "
            f"process group")
        try:
            os.killpg(proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        proc.wait()
        return -1


def run_agenda(cmds: list[str], cmd_timeout: float, stop_on_fail: bool,
               log, probe=probe_backend, probe_wait_s: float = 1800.0,
               probe_interval: float = 240.0) -> int:
    """Run shell commands in order; returns count of failed stages.

    After ANY failed stage the next stage waits for a fresh backend
    probe (up to ``probe_wait_s``): a timed-out stage was killed
    mid-step, which can wedge the tunnel (CLAUDE.md), and a stage that
    died on its own may have found it wedged already — either way,
    burning the next stage's whole timeout against a wedged device
    wastes the chip window. A healthy backend answers the extra probe
    in seconds."""
    failed = 0
    reprobe = False
    for i, cmd in enumerate(cmds, 1):
        if reprobe:
            log(f"  re-probing backend before stage {i} (previous stage "
                f"failed)")
            deadline = time.monotonic() + probe_wait_s
            while not probe():
                if time.monotonic() >= deadline:
                    log("  backend did not recover — aborting agenda")
                    return failed + (len(cmds) - i + 1)
                time.sleep(probe_interval)
            reprobe = False
        t0 = time.monotonic()
        log(f"=== stage {i}/{len(cmds)}: {cmd}")
        rc = _run_stage(cmd, cmd_timeout, log)
        reprobe = rc != 0
        log(f"  stage {i} rc={rc} wall={time.monotonic() - t0:.0f}s")
        if rc != 0:
            failed += 1
            if stop_on_fail:
                log("  --stop_on_fail: aborting agenda")
                break
    return failed


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--agenda", nargs="+", required=True,
                   help="shell commands to run, in order, once the "
                        "backend answers")
    p.add_argument("--interval", type=float, default=240.0,
                   help="seconds between probes while wedged")
    p.add_argument("--probe_timeout", type=float, default=120.0)
    p.add_argument("--max_probes", type=int, default=200,
                   help="give up after this many failed probes")
    p.add_argument("--cmd_timeout", type=float, default=21600.0,
                   help="per-stage timeout (seconds)")
    p.add_argument("--cpu_groups", type=str, default=None,
                   help="file with one pgid per line to SIGSTOP during "
                        "the chip window (SIGCONT on exit, always)")
    p.add_argument("--busy_lock", type=str, default=None,
                   help="lockfile touched while the agenda runs (other "
                        "tools can test it before queueing chip work)")
    p.add_argument("--stop_on_fail", action="store_true")
    p.add_argument("--log", type=str, default=None,
                   help="append log here (default stdout)")
    a = p.parse_args()

    logf = open(a.log, "a", buffering=1) if a.log else sys.stdout

    def log(msg: str) -> None:
        print(f"[{time.strftime('%F %T')}] {msg}", file=logf, flush=True)

    log(f"watchdog start pid={os.getpid()} agenda={len(a.agenda)} stages")
    for i in range(1, a.max_probes + 1):
        if probe_backend(a.probe_timeout):
            log(f"backend OK (probe {i})")
            break
        log(f"probe {i}: wedged")
        if i == a.max_probes:
            log("max probes reached — giving up")
            return 1
        time.sleep(a.interval)

    pgids = read_pgids(a.cpu_groups)
    if pgids:
        log(f"freezing {len(pgids)} CPU job group(s) for the chip window")
        _signal_groups(pgids, signal.SIGSTOP, log)
    if a.busy_lock:
        open(a.busy_lock, "w").close()
    try:
        failed = run_agenda(a.agenda, a.cmd_timeout, a.stop_on_fail, log,
                            probe=lambda: probe_backend(a.probe_timeout),
                            probe_interval=a.interval)
    finally:
        if a.busy_lock and os.path.exists(a.busy_lock):
            os.unlink(a.busy_lock)
        if pgids:
            _signal_groups(pgids, signal.SIGCONT, log)
            log("CPU job groups resumed")
    log(f"watchdog done — {failed} failed stage(s)")
    return 2 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
