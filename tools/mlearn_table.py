#!/usr/bin/env python
"""Build the mlearn campaign summary from committed Test_results.json.

Recomputes the pooled energy/force MAEs (the exact metric of
scripts/train_mlearn.py) from docs/mlearn_r4/<El>/Test_results.json so
the table survives the gitignored runs/ dir, and places each element
against the published Zuo et al. (2020) force-MAE tiers.

    python tools/mlearn_table.py [--dir docs/mlearn_r4]
"""

import argparse
import json
import os

import numpy as np

# Zuo et al., J. Phys. Chem. A 2020, Table 4 (force RMSE->MAE scale
# varies by paper section; these are the commonly cited force MAEs in
# eV/A used in round 3's comparison)
PUBLISHED_FORCE = {
    "Si": {"GAP": 0.12, "MTP": 0.09, "NNP": 0.11, "SNAP": 0.21},
    "Ge": {"GAP": 0.08, "MTP": 0.07, "NNP": 0.12, "SNAP": 0.11},
    "Li": {"GAP": 0.01, "MTP": 0.01, "NNP": 0.02, "SNAP": 0.04},
    "Mo": {"GAP": 0.09, "MTP": 0.09, "NNP": 0.20, "SNAP": 0.21},
    "Cu": {"GAP": 0.02, "MTP": 0.01, "NNP": 0.06, "SNAP": 0.08},
    "Ni": {"GAP": 0.04, "MTP": 0.03, "NNP": 0.07, "SNAP": 0.10},
}


def pooled_maes(path):
    with open(path) as f:
        rows = json.load(f)
    e_err, f_err = [], []
    for r in rows:
        t, p = np.asarray(r["target"]), np.asarray(r["predictions"])
        e_err.append(np.abs(t - p).ravel())
        if r.get("target_grad") is not None and \
                r.get("pred_grad") is not None:
            f_err.append(np.abs(np.asarray(r["target_grad"])
                                - np.asarray(r["pred_grad"])).ravel())
    out = {"n_test": len(rows)}
    if e_err:
        out["energy_mae"] = float(np.mean(np.concatenate(e_err)))
    if f_err:
        out["force_mae"] = float(np.mean(np.concatenate(f_err)))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dir", default="docs/mlearn_r4")
    args = p.parse_args()
    rows = []
    for el in ["Si", "Ge", "Mo", "Cu", "Ni", "Li", "all"]:
        path = os.path.join(args.dir, el, "Test_results.json")
        if not os.path.exists(path):
            continue
        m = pooled_maes(path)
        pub = PUBLISHED_FORCE.get(el, {})
        tier = ""
        if pub and "force_mae" in m:
            best = min(pub.values())
            tier = ("<= best published" if m["force_mae"] <= best
                    else "published tier"
                    if m["force_mae"] <= max(pub.values())
                    else "above published range")
        rows.append({"element": el, **m, "published_force": pub,
                     "placement": tier})
        print(json.dumps(rows[-1]))
    with open(os.path.join(args.dir, "summary.json"), "w") as f:
        json.dump(rows, f, indent=1)
    # markdown table for BENCH_NOTES
    print("\n| element | energy MAE (eV/atom) | force MAE (eV/A) | "
          "published force MAEs (GAP/MTP/NNP/SNAP) | placement |")
    print("|---|---|---|---|---|")
    for r in rows:
        pub = r["published_force"]
        pubs = "/".join(f"{pub[k]:.2f}" for k in
                        ("GAP", "MTP", "NNP", "SNAP")) if pub else "-"
        print(f"| {r['element']} | {r.get('energy_mae', float('nan')):.4f} "
              f"| {r.get('force_mae', float('nan')):.4f} | {pubs} "
              f"| {r['placement']} |")


if __name__ == "__main__":
    main()
