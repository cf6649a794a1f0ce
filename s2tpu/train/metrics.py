"""Segmentation metrics as confusion-matrix bincount ops (jit-friendly).

The reference accumulates torchmetrics objects per step and computes per
epoch (train_segmentation.py:53-67, 149-159). The TPU-native equivalent is a
single (K, K) confusion-matrix accumulator updated inside the jit'd step —
one fused bincount, no host sync — from which IoU / accuracy / F1 / the
normalized confusion matrix all derive in closed form at epoch end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix_update(
    preds: jax.Array,
    labels: jax.Array,
    num_classes: int,
    ignore_index: int | None = None,
    batch_mask: jax.Array | None = None,
) -> jax.Array:
    """(K, K) counts with rows = true class, cols = predicted class.

    For small K this is computed as onehot(labels)^T @ onehot(preds) — a
    single MXU matmul — instead of a scatter-add, which serializes badly on
    TPU. Counts are exact: 0/1 values accumulated in f32 stay integral far
    beyond any realistic pixel count per step.
    """
    preds = preds.reshape(preds.shape[0], -1)
    labels = labels.reshape(labels.shape[0], -1)
    valid = jnp.ones(labels.shape, jnp.float32)
    if ignore_index is not None:
        valid = valid * (labels != ignore_index)
    if batch_mask is not None:
        valid = valid * batch_mask[:, None]
    if num_classes <= 32:
        lab_oh = jax.nn.one_hot(labels.reshape(-1), num_classes, dtype=jnp.float32)
        pred_oh = jax.nn.one_hot(preds.reshape(-1), num_classes, dtype=jnp.float32)
        return jnp.einsum(
            "nk,nc->kc", lab_oh * valid.reshape(-1, 1), pred_oh,
            preferred_element_type=jnp.float32,
        )
    flat = labels * num_classes + preds
    counts = jnp.zeros(num_classes * num_classes, jnp.float32).at[flat.reshape(-1)].add(
        valid.reshape(-1)
    )
    return counts.reshape(num_classes, num_classes)


def compute_metrics(
    cm: jax.Array | np.ndarray,
    ignore_background: bool = False,
    exclude_index: int | None = None,
) -> dict:
    """Closed-form metrics from an accumulated confusion matrix.

    Returns mIoU (macro over classes with support, torchmetrics-Jaccard
    style), per-class IoU, micro accuracy, macro F1, and the row-normalized
    confusion matrix.

    Note on masked semantics: under ``masked_loss`` the trainer accumulates
    the CM with ignore_index=0, so ALL derived metrics exclude unlabeled
    pixels. The reference only masked its confusion matrix while IoU/acc/F1
    included the background class (train_segmentation.py:53-63) — a
    documented inconsistency there; here the metrics agree with the loss.

    ``exclude_index`` reproduces torchmetrics' ``ignore_index`` *averaging*
    semantics (the reference's JaccardIndex/F1, train_segmentation.py:53-63):
    the ignored class is dropped from the macro mean, but a prediction OF the
    ignored class on a valid pixel still counts as a false negative of the
    true class (its column stays in every other class's union). Without it, a
    model that emits even a handful of stray background predictions hands
    class 0 an IoU of ~0 and drags the macro mean — catastrophically for
    binary maps, where mIoU then saturates at 0.5 (found by the hard-fixture
    osm-impervious-binary anchor: acc 0.9999, mIoU 0.4999).
    """
    cm = np.asarray(cm, np.float64)
    if ignore_background:
        cm = cm[1:, 1:]
    tp = np.diag(cm)
    fp = cm.sum(0) - tp
    fn = cm.sum(1) - tp
    support = cm.sum(1)
    union = tp + fp + fn
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, tp / np.maximum(union, 1e-12), np.nan)
        f1 = np.where((2 * tp + fp + fn) > 0, 2 * tp / np.maximum(2 * tp + fp + fn, 1e-12), np.nan)
        cm_norm = cm / np.maximum(support[:, None], 1e-12)
    if exclude_index is not None and not ignore_background and 0 <= exclude_index < len(iou):
        iou[exclude_index] = np.nan
        f1[exclude_index] = np.nan
    present = ~np.isnan(iou)
    total = cm.sum()
    return {
        "iou": float(np.nanmean(iou)) if present.any() else 0.0,
        "per_class_iou": iou,
        "accuracy": float(tp.sum() / total) if total > 0 else 0.0,
        "f1": float(np.nanmean(f1)) if present.any() else 0.0,
        "confusion_matrix": cm_norm,
        "support": support,
    }


class MetricAccumulator:
    """Host-side epoch accumulator over device confusion matrices + loss."""

    def __init__(self, num_classes: int, ignore_index: int | None = None) -> None:
        self.num_classes = num_classes
        self.ignore_index = ignore_index
        self.reset()

    def reset(self) -> None:
        self.cm = np.zeros((self.num_classes, self.num_classes), np.float64)
        self.loss_sum = 0.0
        self.loss_count = 0

    def update(self, cm: jax.Array | np.ndarray, loss: float | None = None) -> None:
        self.cm += np.asarray(cm, np.float64)
        if loss is not None:
            self.loss_sum += float(loss)
            self.loss_count += 1

    def compute(self, ignore_background_in_cm: bool = False) -> dict:
        out = compute_metrics(
            self.cm,
            ignore_background=ignore_background_in_cm,
            exclude_index=self.ignore_index,
        )
        if self.loss_count:
            out["loss"] = self.loss_sum / self.loss_count
        return out
