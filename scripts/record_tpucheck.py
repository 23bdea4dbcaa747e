#!/usr/bin/env python
"""Run the compiled-kernel TPU suite and record the result as a round
artifact (VERDICT round 2, next #6: the on-chip parity results were not
in the round artifacts — emit a ``TPUCHECK_r{N}.json``).

Runs ``pytest tests -m tpu`` as a subprocess on the real chip, parses
the summary line, and writes ``{passed, failed, skipped, duration_s,
returncode}`` to the given JSON path (default ``TPUCHECK_r03.json`` at
the repo root).
"""

import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--json", type=str,
                   default=os.path.join(ROOT, "TPUCHECK_r03.json"))
    p.add_argument("--timeout", type=int, default=3600)
    a = p.parse_args()

    t0 = time.perf_counter()
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests", "-m", "tpu", "-q"],
            cwd=ROOT, capture_output=True, text=True, timeout=a.timeout)
    except subprocess.TimeoutExpired as e:
        # A wedged tunnel hangs every TPU op for up to hours; the
        # artifact must RECORD the attempt instead of vanishing in a
        # stack trace (the whole point of this recorder).
        dt = time.perf_counter() - t0
        out = {"suite": "pytest tests -m tpu (compiled-kernel parity on "
                        "the real chip)",
               "passed": 0, "failed": 0, "skipped": 0, "deselected": 0,
               "error": 0, "duration_s": round(dt, 1),
               "returncode": "timeout",
               "summary": f"timed out after {a.timeout}s "
                          "(wedged tunnel?)",
               "stdout_tail": (e.stdout or b"")[-2000:].decode(
                   "utf-8", "replace") if isinstance(e.stdout, bytes)
               else (e.stdout or "")[-2000:]}
        with open(a.json, "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps(out))
        sys.exit(2)
    dt = time.perf_counter() - t0
    tail = (proc.stdout.strip().splitlines() or [""])[-1]

    counts = {k: 0 for k in ("passed", "failed", "skipped", "deselected",
                             "error")}
    for n, kind in re.findall(r"(\d+) (\w+)", tail):
        if kind in counts:
            counts[kind] = int(n)
    out = {"suite": "pytest tests -m tpu (compiled-kernel parity on the "
                    "real chip)",
           **counts, "duration_s": round(dt, 1),
           "returncode": proc.returncode, "summary": tail}
    with open(a.json, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    if proc.returncode != 0:
        print(proc.stdout[-3000:], file=sys.stderr)
    sys.exit(proc.returncode)


if __name__ == "__main__":
    main()
