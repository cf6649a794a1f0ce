"""Loss parity tests against PyTorch (the reference's semantics oracle)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from s2tpu.train import losses


@pytest.fixture(scope="module")
def data(rng):
    b, h, w, k = 3, 8, 8, 4
    logits = rng.normal(size=(b, h, w, k)).astype(np.float32)
    labels = rng.integers(0, k, size=(b, h, w)).astype(np.int32)
    return logits, labels


def _torch_ce(logits, labels, weight=None, ignore_index=-100, label_smoothing=0.0):
    # torch wants (B, K, H, W)
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    yt = torch.from_numpy(labels).long()
    w = torch.from_numpy(weight) if weight is not None else None
    return F.cross_entropy(
        lt, yt, weight=w, ignore_index=ignore_index, label_smoothing=label_smoothing
    ).item()


def test_ce_plain(data):
    logits, labels = data
    ours = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(ours), _torch_ce(logits, labels), rtol=1e-5)


def test_ce_ignore_index(data):
    logits, labels = data
    ours = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), ignore_index=0)
    np.testing.assert_allclose(float(ours), _torch_ce(logits, labels, ignore_index=0), rtol=1e-5)


def test_ce_weighted_masked(data):
    logits, labels = data
    w = np.array([0.0, 0.7, 0.5, 0.8], np.float32)
    ours = losses.cross_entropy(
        jnp.asarray(logits), jnp.asarray(labels), class_weights=jnp.asarray(w), ignore_index=0
    )
    np.testing.assert_allclose(
        float(ours), _torch_ce(logits, labels, weight=w, ignore_index=0), rtol=1e-5
    )


def test_ce_label_smoothing(data):
    logits, labels = data
    ours = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), label_smoothing=0.1)
    np.testing.assert_allclose(
        float(ours), _torch_ce(logits, labels, label_smoothing=0.1), rtol=1e-5
    )


def test_focal_matches_reference_formula(data):
    logits, labels = data
    alpha = np.array([1.0, 1.0, 1.0, 1.0], np.float32)
    gamma = 2.0
    # reference formula via torch (losses.py:77-89)
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    yt = torch.from_numpy(labels).long()
    ce = F.cross_entropy(lt, yt, ignore_index=0, reduction="none")
    pt = torch.exp(-ce)
    a = torch.from_numpy(alpha).gather(0, yt.view(-1)).view(*yt.shape)
    expected = (a * (1 - pt) ** gamma * ce).mean().item()
    ours = losses.focal_loss(
        jnp.asarray(logits), jnp.asarray(labels), alpha=jnp.asarray(alpha), gamma=gamma, ignore_index=0
    )
    np.testing.assert_allclose(float(ours), expected, rtol=1e-5)


def test_dice_matches_reference_formula(data):
    logits, labels = data
    eps = 1e-8
    lt = torch.from_numpy(logits).permute(0, 3, 1, 2)
    yt = torch.from_numpy(labels).long()
    probs = F.softmax(lt, dim=1)
    one_hot = F.one_hot(yt, num_classes=4).permute(0, 3, 1, 2).float()
    dims = (1, 2, 3)
    inter = (probs * one_hot).sum(dims)
    union = (probs + one_hot).sum(dims)
    expected = (1.0 - (2 * inter + eps) / (union + eps)).mean().item()
    ours = losses.dice_loss(jnp.asarray(logits), jnp.asarray(labels), eps=eps)
    np.testing.assert_allclose(float(ours), expected, rtol=1e-5)


def test_combined_loss_components(data):
    logits, labels = data
    fn = losses.make_loss_fn(
        "dice_focal", num_classes=4, masked_loss=True, dice_weight=0.3, focal_weight=0.7
    )
    out = fn(jnp.asarray(logits), jnp.asarray(labels))
    assert set(out.components) == {"dice", "focal"}
    np.testing.assert_allclose(
        float(out.total), float(out.components["dice"] + out.components["focal"]), rtol=1e-6
    )


def test_make_loss_fn_weight_rule():
    # w = 1 - p for real classes, masked class keeps raw value (losses.py:25-30)
    dist = [0.0, 0.5, 0.3, 0.2]
    fn = losses.make_loss_fn(
        "ce", num_classes=4, masked_loss=True, weighted_loss=True, class_distribution=dist
    )
    logits = jnp.zeros((1, 2, 2, 4))
    labels = jnp.full((1, 2, 2), 1, jnp.int32)
    # uniform logits -> ce = log(4) regardless of weights; just checks it runs masked
    np.testing.assert_allclose(float(fn(logits, labels).total), np.log(4), rtol=1e-5)


def test_batch_mask_excludes_padding(data):
    logits, labels = data
    mask = jnp.asarray([1.0, 1.0, 0.0])
    ours = losses.cross_entropy(jnp.asarray(logits), jnp.asarray(labels), batch_mask=mask)
    expected = _torch_ce(logits[:2], labels[:2])
    np.testing.assert_allclose(float(ours), expected, rtol=1e-5)


def test_mae_loss_masked_mean(rng):
    pred = rng.normal(size=(2, 10, 8)).astype(np.float32)
    target = rng.normal(size=(2, 10, 8)).astype(np.float32)
    mask = (rng.random((2, 10)) > 0.25).astype(np.float32)
    ours = losses.mae_reconstruction_loss(jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
    per_patch = ((pred - target) ** 2).mean(-1)
    expected = (per_patch * mask).sum() / mask.sum()
    np.testing.assert_allclose(float(ours), expected, rtol=1e-5)
    # norm_pix variant
    ours_n = losses.mae_reconstruction_loss(
        jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask), norm_pix=True
    )
    t = (target - target.mean(-1, keepdims=True)) / np.sqrt(target.var(-1, keepdims=True) + 1e-6)
    expected_n = (((pred - t) ** 2).mean(-1) * mask).sum() / mask.sum()
    np.testing.assert_allclose(float(ours_n), expected_n, rtol=1e-4)
