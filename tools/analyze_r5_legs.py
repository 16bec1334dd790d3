#!/usr/bin/env python
"""Harvest the round-5 chip-queue legs into one summary JSON.

    PYTHONPATH=/root/repo python tools/analyze_r5_legs.py
"""

import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__))))
from mlearn_table import pooled_maes  # noqa: E402


def epoch_stats(log_path):
    """(median epoch seconds, median edges/s) from a training log."""
    if not os.path.exists(log_path):
        return None
    times, rates = [], []
    for line in open(log_path, errors="replace"):
        m = re.search(r"time ([0-9.]+)s edges/s ([0-9.e+]+)", line)
        if m:
            times.append(float(m.group(1)))
            rates.append(float(m.group(2)))
    if not times:
        return None
    return {"median_epoch_s": float(np.median(times)),
            "median_edges_per_s": float(np.median(rates)),
            "n_epochs_seen": len(times)}


def main():
    out = {}
    # `all` gw20 leg
    p = "runs/mlearn_r5_gw20/all/Test_results.json"
    if os.path.exists(p):
        out["all_gw20"] = {**pooled_maes(p),
                           **(epoch_stats("runs/mlearn_r5_gw20.log")
                              or {})}
    # Si radius A/B
    for leg in ("Si_radius_full", "Si_radius_lg35"):
        p = f"runs/r5/{leg}/Test_results.json"
        if os.path.exists(p):
            out[leg] = {**pooled_maes(p),
                        **(epoch_stats(f"runs/r5/log_{leg}.txt") or {})}
    # bench largecell legs
    for name in ("base", "lg40", "lg35"):
        p = f"runs/r5/bench_largecell_{name}.json"
        if os.path.exists(p):
            for line in open(p, errors="replace"):
                line = line.strip()
                if line.startswith("{"):
                    try:
                        out[f"bench_largecell_{name}"] = json.loads(line)
                    except json.JSONDecodeError:
                        pass
    print(json.dumps(out, indent=1))
    with open("docs/mlearn_r5/r5_legs_summary.json", "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
