"""Training/FF plotting utilities (matplotlib, headless-safe).

Parity surface for reference `alignn/utils.py:24-47`
(`plot_learning_curve`) and `alignn/ff/ff.py:620-759`
(`plot_ff_training`: loss-history curves + energy/force parity
scatters).  All figures save to files (Agg backend) — no display needed.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def _history_column(history, key: str):
    """Support both history formats: list-of-rows (ours + the reference
    FF trainer) and dict-of-lists (older reference property trainer)."""
    if isinstance(history, dict):
        return history.get(key, history.get("loss", []))
    cols = {"loss": 0, "mae": 0, "loss1": 1, "loss2": 2, "loss3": 3,
            "loss4": 4, "loss5": 5, "energy": 1, "forces": 2}
    idx = cols.get(key, 0)
    return [row[idx] if isinstance(row, (list, tuple)) and len(row) > idx
            else (row if np.isscalar(row) else 0.0) for row in history]


def plot_learning_curve(results_dir: str, key: str = "loss",
                        plot_train: bool = False,
                        save: Optional[str] = "learning_curve.png"):
    """Validation (and optionally training) loss curves vs epoch.

    Reference `alignn/utils.py:24-47`; returns (train, val) histories.
    """
    with open(os.path.join(results_dir, "history_val.json")) as f:
        val = json.load(f)
    p = plt.plot(_history_column(val, key), label=os.path.basename(
        os.path.abspath(results_dir)))
    train = None
    if plot_train:
        with open(os.path.join(results_dir, "history_train.json")) as f:
            train = json.load(f)
        plt.plot(_history_column(train, key), alpha=0.5,
                 c=p[0].get_color())
    plt.xlabel("epochs")
    plt.ylabel(key)
    if save:
        plt.savefig(os.path.join(results_dir, save), dpi=120,
                    bbox_inches="tight")
        plt.close()
    return train, val


def _parity_panel(ax, results, target_key, pred_key, title, unit):
    xx, yy = [], []
    for rec in results:
        t = np.asarray(rec.get(target_key, []), dtype=np.float64).ravel()
        p = np.asarray(rec.get(pred_key, []), dtype=np.float64).ravel()
        n = min(t.size, p.size)
        xx.extend(t[:n].tolist())
        yy.extend(p[:n].tolist())
    xx, yy = np.asarray(xx), np.asarray(yy)
    ax.set_title(title)
    if xx.size:
        ax.plot(xx, yy, ".", ms=3)
        lo, hi = min(xx.min(), yy.min()), max(xx.max(), yy.max())
        ax.plot([lo, hi], [lo, hi], "k--", lw=0.8)
        mae = float(np.mean(np.abs(xx - yy)))
        ax.text(0.04, 0.92, f"MAE {mae:.4f} {unit}",
                transform=ax.transAxes, fontsize=9)
    ax.set_xlabel(f"target ({unit})")
    ax.set_ylabel(f"predicted ({unit})")
    return xx, yy


def plot_ff_training(out_dir: str, results: str = "Val_results.json",
                     save_prefix: str = ""):
    """Loss-history curves + energy/force parity scatters.

    Reference `alignn/ff/ff.py:620-759` (`plot_ff_training`): panel (a)
    energy / (b) force loss histories -> history.png; parity scatters
    from the per-sample results json -> parity.png.
    """
    hist_path = os.path.join(out_dir, "history_val.json")
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            hist = json.load(f)
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        axes[0].plot(_history_column(hist, "loss1"))
        axes[0].set_title("(a) Energy")
        axes[0].set_xlabel("Epochs")
        axes[0].set_ylabel("eV")
        axes[1].plot(_history_column(hist, "loss2"))
        axes[1].set_title("(b) Forces")
        axes[1].set_xlabel("Epochs")
        axes[1].set_ylabel("eV/A")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, save_prefix + "history.png"),
                    dpi=120)
        plt.close(fig)

    res_path = os.path.join(out_dir, results)
    if os.path.exists(res_path):
        with open(res_path) as f:
            data = json.load(f)
        fig, axes = plt.subplots(1, 2, figsize=(10, 4))
        _parity_panel(axes[0], data, "target", "predictions",
                      "Energy", "eV")
        _parity_panel(axes[1], data, "target_grad", "pred_grad",
                      "Forces", "eV/A")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, save_prefix + "parity.png"),
                    dpi=120)
        plt.close(fig)
