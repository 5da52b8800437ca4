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

    def _grid(self, n_panels):
        import math

        nrow = int(math.floor(math.sqrt(n_panels)))
        ncol = int(math.ceil(n_panels / max(nrow, 1)))
        return max(nrow, 1), ncol

    def create_error_histogram_per_node(
        self,
        varname: str,
        true_values: np.ndarray,  # [n_samples, n_nodes]
        predicted_values: np.ndarray,
        node_feature: Optional[np.ndarray] = None,
        iepoch: Optional[int] = None,
    ) -> Optional[str]:
        """Per-node error histograms + SUM and per-node-mean panels
        (ref: visualizer.py:387-465 create_error_histogram_per_node)."""
        t = np.asarray(true_values)
        p = np.asarray(predicted_values)
        if t.ndim != 2 or t.shape[1] == 1:
            return None
        plt = self._plt()
        n_nodes = t.shape[1]
        nrow, ncol = self._grid(n_nodes + 2)
        fig, axs = plt.subplots(
            nrow, ncol, figsize=(ncol * 3.5, nrow * 3.2), squeeze=False
        )
        axs = axs.flatten()
        err = p - t
        for inode in range(n_nodes):
            h, edges = np.histogram(err[:, inode], bins=40, density=True)
            axs[inode].plot(0.5 * (edges[:-1] + edges[1:]), h, "ro")
            axs[inode].set_title(f"node:{inode}")
        h, edges = np.histogram(
            p.sum(1) - t.sum(1), bins=40, density=True
        )
        axs[n_nodes].plot(0.5 * (edges[:-1] + edges[1:]), h, "ro")
        axs[n_nodes].set_title("SUM")
        h, edges = np.histogram(
            p.sum(0) - t.sum(0), bins=40, density=True
        )
        axs[n_nodes + 1].plot(0.5 * (edges[:-1] + edges[1:]), h, "ro")
        axs[n_nodes + 1].set_title(f"SMP_Mean4sites:0-{n_nodes}")
        for ax in axs[n_nodes + 2:]:
            ax.axis("off")
        fig.tight_layout()
        suffix = f"_{iepoch:04d}" if iepoch is not None else ""
        fname = os.path.join(
            self.outdir, f"{varname}_error_hist1d{suffix}.png"
        )
        fig.savefig(fname, dpi=120)
        plt.close(fig)
        return fname

    def create_parity_plot_vector(
        self,
        varname: str,
        true_values: np.ndarray,  # [n_samples, n_nodes*3] or [N, 3]
        predicted_values: np.ndarray,
        iepoch: Optional[int] = None,
    ) -> str:
        """Vector parity, one panel per Cartesian component
        (ref: visualizer.py:467-517 create_parity_plot_vector)."""
        plt = self._plt()
        t = np.asarray(true_values).reshape(-1, 3)
        p = np.asarray(predicted_values).reshape(-1, 3)
        fig, axs = plt.subplots(1, 3, figsize=(12, 4), squeeze=False)
        for ic, comp in enumerate("xyz"):
            ax = axs[0][ic]
            ax.scatter(t[:, ic], p[:, ic], s=4, alpha=0.5)
            lo = min(t[:, ic].min(), p[:, ic].min())
            hi = max(t[:, ic].max(), p[:, ic].max())
            ax.plot([lo, hi], [lo, hi], "k--", lw=1)
            rmse = float(np.sqrt(np.mean((t[:, ic] - p[:, ic]) ** 2)))
            ax.set_title(f"{varname}_{comp} (rmse {rmse:.3g})")
            ax.set_xlabel("true")
            ax.set_ylabel("predicted")
        fig.tight_layout()
        suffix = f"_{iepoch:04d}" if iepoch is not None else ""
        fname = os.path.join(self.outdir, f"{varname}_vector{suffix}.png")
        fig.savefig(fname, dpi=120)
        plt.close(fig)
        return fname

    def create_parity_plot_per_node_vector(
        self,
        varname: str,
        true_values: np.ndarray,  # [n_samples, n_nodes*3]
        predicted_values: np.ndarray,
        node_feature: Optional[np.ndarray] = None,  # [n_samples, n_nodes]
        iepoch: Optional[int] = None,
    ) -> str:
        """Per-node vector parity grid: one panel per node, three markers
        for the xyz components, colored by the node feature, plus SUM and
        per-node-mean panels (ref: visualizer.py:519-612)."""
        plt = self._plt()
        t = np.asarray(true_values)
        p = np.asarray(predicted_values)
        n_samp = t.shape[0]
        tv = t.reshape(n_samp, -1, 3)
        pv = p.reshape(n_samp, -1, 3)
        n_nodes = tv.shape[1]
        markers = ["o", "s", "d"]
        nrow, ncol = self._grid(n_nodes + 2)
        fig, axs = plt.subplots(
            nrow, ncol, figsize=(ncol * 3, nrow * 3), squeeze=False
        )
        axs = axs.flatten()

        def panel(ax, tc, pc, c, title, s=6):
            for ic in range(3):
                ax.scatter(
                    tc[:, ic], pc[:, ic], s=s, c=c, marker=markers[ic],
                    alpha=0.7,
                )
            lo = min(tc.min(), pc.min())
            hi = max(tc.max(), pc.max())
            ax.plot([lo, hi], [lo, hi], "k--", lw=0.8)
            ax.set_title(title)

        for inode in range(n_nodes):
            c = (
                node_feature[:, inode]
                if node_feature is not None
                else None
            )
            panel(
                axs[inode], tv[:, inode], pv[:, inode], c, f"node:{inode}"
            )
        csum = node_feature.sum(1) if node_feature is not None else None
        panel(axs[n_nodes], tv.sum(1), pv.sum(1), csum, "SUM", s=40)
        cnode = node_feature.sum(0) if node_feature is not None else None
        panel(
            axs[n_nodes + 1], tv.sum(0), pv.sum(0), cnode,
            f"SMP_Mean4sites:0-{n_nodes}", s=40,
        )
        for ax in axs[n_nodes + 2:]:
            ax.axis("off")
        fig.tight_layout()
        suffix = f"_{iepoch:04d}" if iepoch is not None else ""
        fname = os.path.join(
            self.outdir, f"{varname}_per_node_vector{suffix}.png"
        )
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
