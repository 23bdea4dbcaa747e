#!/usr/bin/env python
"""Re-render the paired-delta tables from ABLATION_*.json artifacts.

Every ablation sweep (`ablation_adversarial_gain.py`) writes a JSON
artifact with per-run results; this digest reproduces the BASELINE.md
tables from those artifacts (so recorded numbers are auditable), and
can merge several artifacts that share a protocol (e.g. the main sweep
plus a `--semi_start` variant) into one table keyed by an extra label.

    ablation_digest.py ABLATION_r03_cluster.json
    ablation_digest.py main=A.json ss150=B.json   # labeled merge
"""

import json
import sys

import numpy as np


def _cells(runs, modes, ratio):
    cell = {}
    for mode in modes:
        vals = [r["best_miou"] for r in runs
                if r["ratio"] == ratio and r["mode"] == mode]
        if vals:
            cell[mode] = vals
    return cell


def _paired(a, b):
    d = [x - y for x, y in zip(a, b)]
    se = float(np.std(d) / max(len(d) - 1, 1) ** 0.5)
    return (float(np.mean(d)), se, sum(x > 0 for x in d), len(d))


def digest(label, path):
    with open(path) as f:
        art = json.load(f)
    runs = art["runs"]
    for r in runs:  # hand-rolled early artifacts lack the ratio key
        r.setdefault("ratio", None)
    print(f"\n### {label or path}")
    cfg = art.get("config")
    if cfg is None:  # early artifact schema: free-text protocol only
        print(f"protocol: {art.get('protocol', '(unrecorded)')}")
        cfg = {"ratios": sorted({r["ratio"] for r in runs},
                                key=lambda v: (v is None, v))}
        modes = list(dict.fromkeys(r["mode"] for r in runs))
    else:
        modes = [m for m in cfg.get("modes", ["sup", "adv"])
                 if any(r["mode"] == m for r in runs)]
        fixture = ("cluster_parts" if cfg.get("cluster_parts")
                   else f"boundary_jitter={cfg['boundary_jitter']:g}"
                   if cfg.get("boundary_jitter") else "axis-quantized")
        g = cfg.get
        print(f"fixture: {fixture}; {g('num_shapes')}x"
              f"{g('num_points')}, batch {g('batchSize')}, "
              f"{g('nepoch')} epochs, {g('seeds')} seeds; "
              f"semi_start={g('semi_start')}, "
              f"lambda_semi={g('lambda_semi')}, "
              f"threshold={g('threshold')}"
              + (f", st_threshold={g('st_threshold')}"
                 if g("st_threshold") is not None else ""))
    head = " | ".join(f"{m} mIoU" for m in modes)
    print(f"\n| ratio | {head} | paired deltas (mean ± SE, +seeds) |")
    print("|---" * (len(modes) + 2) + "|")
    for ratio in cfg["ratios"]:
        c = _cells(runs, modes, ratio)
        cols = " | ".join(
            f"{np.mean(c[m]):.4f} ± {np.std(c[m]):.4f}" for m in modes)
        base = modes[0]
        ds = "; ".join(
            f"{m}−{base}: {_paired(c[m], c[base])[0]:+.4f} ± "
            f"{_paired(c[m], c[base])[1]:.4f} "
            f"({_paired(c[m], c[base])[2]}/{_paired(c[m], c[base])[3]}+)"
            for m in modes[1:] if len(c[m]) == len(c[base]))
        print(f"| {ratio} | {cols} | {ds} |")


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    for arg in sys.argv[1:]:
        label, _, path = arg.rpartition("=")
        digest(label, path or arg)


if __name__ == "__main__":
    main()
