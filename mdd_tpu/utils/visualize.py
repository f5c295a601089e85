"""Activation / posterior visualizer.

Working replacement for the reference's broken visdom visualizer
(egs/attention_aug/steps/visualize.py:103-133, stale imports §2 A20):
renders input-feature heatmaps, intermediate CNN/RNN activations
(captured with flax's capture_intermediates), and framewise phone
posterior traces to PNG files with matplotlib's Agg backend.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Optional

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_heatmap(mat: np.ndarray, title: str, out_path: str) -> str:
    """(T, D) matrix -> heatmap PNG (features, activations)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(10, 4))
    im = ax.imshow(np.asarray(mat).T, aspect="auto", origin="lower",
                   interpolation="nearest", cmap="viridis")
    ax.set_xlabel("frame")
    ax.set_ylabel("dim")
    ax.set_title(title)
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def plot_posteriors(log_probs: np.ndarray, id2word: Dict[int, str],
                    out_path: str, top_k: int = 8,
                    title: str = "phone posteriors") -> str:
    """(T, C) log-probs -> line plot of the most active classes
    (reference visualize.py:121-133 framewise prob lines)."""
    plt = _plt()
    probs = np.exp(np.asarray(log_probs))
    top = np.argsort(probs.max(axis=0))[::-1][:top_k]
    fig, ax = plt.subplots(figsize=(10, 4))
    for c in top:
        ax.plot(probs[:, c], label=id2word.get(int(c), str(c)))
    ax.set_xlabel("frame")
    ax.set_ylabel("P(phone)")
    ax.set_title(title)
    ax.legend(ncol=4, fontsize=8)
    fig.tight_layout()
    fig.savefig(out_path, dpi=100)
    plt.close(fig)
    return out_path


def visualize_utterance(
    model,
    variables: Dict,
    feats: np.ndarray,          # (T, D) spliced features
    trans_ids: np.ndarray,      # (L,) canonical phone ids
    id2word: Dict[int, str],
    out_dir: str,
    prefix: str = "utt",
) -> List[str]:
    """Render input / conv / rnn / posterior plots for one utterance."""
    import jax.numpy as jnp

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = [plot_heatmap(feats, "input features",
                          str(out / f"{prefix}_input.png"))]

    xb = jnp.asarray(feats[None])
    trans = jnp.asarray(trans_ids[None])
    tl = jnp.asarray([len(trans_ids)])
    log_probs, inter = model.apply(
        variables, xb, trans, tl, train=False,
        capture_intermediates=True, mutable=["intermediates"])
    flat = _flatten_intermediates(inter["intermediates"])
    for name, act in flat.items():
        a = np.asarray(act)
        if a.ndim == 3 and a.shape[0] == 1:     # (1, T, D)
            paths.append(plot_heatmap(
                a[0], name,
                str(out / f"{prefix}_{name.replace('/', '_')}.png")))
    paths.append(plot_posteriors(
        np.asarray(log_probs)[:, 0, :], id2word,
        str(out / f"{prefix}_posteriors.png")))
    return paths


def _flatten_intermediates(tree, prefix: str = "", limit: int = 6) -> Dict:
    flat: Dict[str, np.ndarray] = {}

    def rec(node, pfx):
        if len(flat) >= limit:
            return
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{pfx}/{k}" if pfx else k)
        elif isinstance(node, tuple):
            for v in node:
                rec(v, pfx)
        else:
            if hasattr(node, "ndim") and node.ndim == 3:
                flat[pfx] = node

    rec(tree, prefix)
    return flat
