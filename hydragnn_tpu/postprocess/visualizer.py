"""Matplotlib result plots (ref: hydragnn/postprocess/visualizer.py:24-742).

Parity scatter plots, error histograms, and loss-history curves per head.
Writes PNGs under logs/<name>/ like the reference.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np


class Visualizer:
    def __init__(
        self,
        model_name: str,
        node_feature: Optional[list] = None,
        num_heads: int = 1,
        head_dims: Optional[Sequence[int]] = None,
        plot_dir: str = "./logs",
    ):
        self.model_name = model_name
        self.num_heads = num_heads
        self.head_dims = head_dims or [1] * num_heads
        self.outdir = os.path.join(plot_dir, model_name)
        os.makedirs(self.outdir, exist_ok=True)

    def _plt(self):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt

    def create_scatter_plot(
        self,
        true_values: Sequence[np.ndarray],
        predicted_values: Sequence[np.ndarray],
        output_names: Optional[Sequence[str]] = None,
    ) -> str:
        """Per-head parity plots (ref: visualizer.py create_scatter_plots)."""
        plt = self._plt()
        nh = len(true_values)
        fig, axs = plt.subplots(1, nh, figsize=(4 * nh, 4), squeeze=False)
        for ih in range(nh):
            t = np.asarray(true_values[ih]).ravel()
            p = np.asarray(predicted_values[ih]).ravel()
            ax = axs[0][ih]
            ax.scatter(t, p, s=4, alpha=0.5)
            lo, hi = min(t.min(), p.min()), max(t.max(), p.max())
            ax.plot([lo, hi], [lo, hi], "k--", lw=1)
            name = output_names[ih] if output_names else f"head {ih}"
            rmse = float(np.sqrt(np.mean((t - p) ** 2)))
            ax.set_title(f"{name} (rmse {rmse:.3g})")
            ax.set_xlabel("true")
            ax.set_ylabel("predicted")
        fig.tight_layout()
        fname = os.path.join(self.outdir, "parity.png")
        fig.savefig(fname, dpi=120)
        plt.close(fig)
        return fname

    def create_error_histograms(
        self, true_values, predicted_values, output_names=None
    ) -> str:
        plt = self._plt()
        nh = len(true_values)
        fig, axs = plt.subplots(1, nh, figsize=(4 * nh, 3), squeeze=False)
        for ih in range(nh):
            err = (
                np.asarray(predicted_values[ih]).ravel()
                - np.asarray(true_values[ih]).ravel()
            )
            axs[0][ih].hist(err, bins=40)
            name = output_names[ih] if output_names else f"head {ih}"
            axs[0][ih].set_title(f"{name} error")
        fig.tight_layout()
        fname = os.path.join(self.outdir, "error_hist.png")
        fig.savefig(fname, dpi=120)
        plt.close(fig)
        return fname

    def plot_history(self, history: Dict[str, list]) -> str:
        """Train/val loss curves (ref: visualizer.py plot_history)."""
        plt = self._plt()
        fig, ax = plt.subplots(figsize=(5, 4))
        ax.plot(history.get("train_loss", []), label="train")
        ax.plot(history.get("val_loss", []), label="val")
        ax.set_xlabel("epoch")
        ax.set_ylabel("loss")
        ax.set_yscale("log")
        ax.legend()
        fig.tight_layout()
        fname = os.path.join(self.outdir, "history.png")
        fig.savefig(fname, dpi=120)
        plt.close(fig)
        return fname
