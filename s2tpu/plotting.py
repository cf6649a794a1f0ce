"""Visualization: RGB composites, label/prediction maps, confusion matrices.

Parity with reference src/plotting.py: percentile-stretched RGB from bands
(B04, B03, B02), ListedColormap from the label taxonomy colors, side-by-side
sentinel/mask(/pred) figures with a class legend, and the interactive
segment viewer CLI (n/b/<int>/q). Also hosts the confusion-matrix figure the
trainer logs (reference train_segmentation.py:222-240).
"""

from __future__ import annotations

import typing
from pathlib import Path

import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
from matplotlib.colors import ListedColormap, Normalize
from matplotlib.patches import Patch

from s2tpu.configs.data_config import LABEL_MAPS, LabelMap


def stretch_rgb(sentinel_chw: np.ndarray, bands: tuple[int, int, int] = (2, 1, 0)) -> np.ndarray:
    """(C, H, W) raw DN -> (H, W, 3) uint8, 2-98 percentile contrast stretch."""
    rgb = sentinel_chw[list(bands)].astype(np.float64)
    lo, hi = np.percentile(rgb, [2, 98])
    rgb = np.clip((rgb - lo) / max(hi - lo, 1e-9), 0, 1)
    return (rgb * 255).astype(np.uint8).transpose(1, 2, 0)


def load_sentinel_for_plotting(path: str | Path) -> tuple[np.ndarray, typing.Any]:
    from s2tpu.geo.tiff import read_geotiff

    data, geo = read_geotiff(path)
    return stretch_rgb(data), geo


def label_colormap(label_map: LabelMap | str) -> ListedColormap:
    if isinstance(label_map, str):
        label_map = LABEL_MAPS[label_map]
    return ListedColormap(list(label_map.colors))


def _legend(ax, label_map: LabelMap) -> None:
    handles = [Patch(color=c, label=n) for n, c in zip(label_map.class_names, label_map.colors)]
    ax.legend(handles=handles, loc="upper right", fontsize=7)


def plot_sentinel_and_mask(
    rgb: np.ndarray, mask: np.ndarray, label_map: LabelMap | str, pred: np.ndarray | None = None
):
    """Side-by-side RGB | labels (| prediction) figure."""
    if isinstance(label_map, str):
        label_map = LABEL_MAPS[label_map]
    n = 2 if pred is None else 3
    fig, axes = plt.subplots(1, n, figsize=(5 * n, 5))
    cmap = label_colormap(label_map)
    axes[0].imshow(rgb)
    axes[0].set_title("Sentinel-2 RGB")
    axes[1].imshow(mask, cmap=cmap, vmin=0, vmax=label_map.num_classes - 1, interpolation="nearest")
    axes[1].set_title("labels")
    _legend(axes[1], label_map)
    if pred is not None:
        axes[2].imshow(pred, cmap=cmap, vmin=0, vmax=label_map.num_classes - 1, interpolation="nearest")
        axes[2].set_title("prediction")
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    return fig


def confusion_matrix_figure(cm: np.ndarray, class_names: typing.Sequence[str]):
    """Annotated normalized confusion-matrix figure (wandb/file artifact)."""
    fig, ax = plt.subplots(figsize=(max(6, len(class_names)), max(5, len(class_names) * 0.9)))
    im = ax.matshow(cm, cmap="Blues", norm=Normalize(vmin=0, vmax=max(cm.max(), 1e-9)))
    fig.colorbar(im)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("True")
    ticks = np.arange(len(class_names))
    ax.set_xticks(ticks)
    ax.set_yticks(ticks)
    ax.set_xticklabels(class_names, rotation=45, fontsize=8)
    ax.set_yticklabels(class_names, fontsize=8)
    for (i, j), val in np.ndenumerate(cm):
        ax.text(j, i, f"{val:.2f}", ha="center", va="center", fontsize=7)
    fig.tight_layout()
    return fig


def interactive_viewer(aoi: str, label_map: str, data_dir: str | None = None) -> None:
    """Terminal viewer over segments: n(ext) / b(ack) / <index> / q(uit)."""
    from s2tpu.data.dataset import TiffSource
    from s2tpu.geo.tiff import read_geotiff

    src = TiffSource(aoi, label_map, data_dir=data_dir)
    idx = 0
    while True:
        data, _ = read_geotiff(src.sentinel_files[idx])
        sample = src[idx]
        fig = plot_sentinel_and_mask(stretch_rgb(data), sample.y, src.label_map)
        out = Path(f"/tmp/s2tpu_view_{idx}.png")
        fig.savefig(out)
        plt.close(fig)
        cmd = input(f"[{idx}/{len(src) - 1}] saved {out} — n/b/<int>/q: ").strip()
        if cmd == "q":
            return
        if cmd == "n":
            idx = min(idx + 1, len(src) - 1)
        elif cmd == "b":
            idx = max(idx - 1, 0)
        elif cmd.isdigit():
            idx = min(int(cmd), len(src) - 1)
