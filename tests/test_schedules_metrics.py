"""Scheduler-formula and confusion-matrix-metric tests."""

import math

import numpy as np

import jax.numpy as jnp

from s2tpu.train import metrics, schedules


def _reference_cosine(count, first, max_lr, min_lr, warmup, mult, gamma):
    """Direct transcription of the katsura-jp schedule semantics (oracle)."""
    if mult == 1.0:
        cycle = count // first
        step = count % first
        cur = first
    else:
        if count >= first:
            n = int(math.log(count / first * (mult - 1) + 1, mult))
            cycle = n
            step = count - int(first * (mult**n - 1) / (mult - 1))
            cur = first * mult**n
        else:
            cycle, step, cur = 0, count, first
    peak = max_lr * gamma**cycle
    if step < warmup:
        return (peak - min_lr) * step / warmup + min_lr
    return min_lr + (peak - min_lr) * (1 + math.cos(math.pi * (step - warmup) / (cur - warmup))) / 2


def test_cosine_warmup_restarts_no_mult():
    sched = schedules.cosine_annealing_warmup_restarts(
        first_cycle_steps=10, max_lr=1.0, min_lr=0.1, warmup_steps=3, cycle_mult=1.0, gamma=0.5
    )
    got = np.asarray(sched(jnp.arange(35)))  # vectorized: one compile
    expected = [_reference_cosine(t, 10, 1.0, 0.1, 3, 1.0, 0.5) for t in range(35)]
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_cosine_warmup_restarts_with_mult():
    sched = schedules.cosine_annealing_warmup_restarts(
        first_cycle_steps=8, max_lr=0.5, min_lr=0.01, warmup_steps=2, cycle_mult=2.0, gamma=0.8
    )
    got = np.asarray(sched(jnp.arange(1, 60)))
    expected = [_reference_cosine(t, 8, 0.5, 0.01, 2, 2.0, 0.8) for t in range(1, 60)]
    np.testing.assert_allclose(got, expected, rtol=1e-4)
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), 0.01, rtol=1e-5)  # warmup start


def test_step_decay():
    sched = schedules.step_decay(1.0, step_size=5, gamma=0.1)
    got = np.asarray([sched(t) for t in [0, 4, 5, 14]], np.float64)
    np.testing.assert_allclose(got, [1.0, 1.0, 0.1, 0.01], rtol=1e-12)


def test_build_schedule_none_is_constant():
    assert schedules.build_schedule(3e-4, None) == 3e-4


def test_confusion_matrix_update():
    preds = jnp.asarray([[0, 1, 2, 2]])
    labels = jnp.asarray([[0, 1, 1, 2]])
    cm = metrics.confusion_matrix_update(preds, labels, num_classes=3)
    expected = np.array([[1, 0, 0], [0, 1, 1], [0, 0, 1]], np.float32)
    np.testing.assert_array_equal(np.asarray(cm), expected)


def test_confusion_matrix_ignore_index():
    preds = jnp.asarray([[0, 1, 2, 2]])
    labels = jnp.asarray([[0, 1, 1, 2]])
    cm = metrics.confusion_matrix_update(preds, labels, num_classes=3, ignore_index=0)
    assert cm[0].sum() == 0  # background row dropped
    assert np.asarray(cm).sum() == 3


def test_confusion_matrix_batch_mask():
    preds = jnp.asarray([[0, 0], [1, 1]])
    labels = jnp.asarray([[0, 0], [1, 1]])
    cm = metrics.confusion_matrix_update(
        preds, labels, num_classes=2, batch_mask=jnp.asarray([1.0, 0.0])
    )
    assert np.asarray(cm).sum() == 2  # only first sample counted


def test_compute_metrics_perfect_prediction():
    cm = np.diag([10, 20, 30]).astype(np.float64)
    m = metrics.compute_metrics(cm)
    assert m["iou"] == 1.0 and m["accuracy"] == 1.0 and m["f1"] == 1.0
    np.testing.assert_array_equal(m["confusion_matrix"], np.eye(3))


def test_compute_metrics_known_values():
    # 2-class: TP0=3, FN0=1 (pred 1), TP1=2, FN1=2 (pred 0)
    cm = np.array([[3, 1], [2, 2]], np.float64)
    m = metrics.compute_metrics(cm)
    iou0 = 3 / (3 + 1 + 2)
    iou1 = 2 / (2 + 2 + 1)
    np.testing.assert_allclose(m["iou"], (iou0 + iou1) / 2)
    np.testing.assert_allclose(m["accuracy"], 5 / 8)
    np.testing.assert_allclose(m["confusion_matrix"][0], [0.75, 0.25])


def test_compute_metrics_absent_class_excluded():
    cm = np.array([[5, 0, 0], [0, 3, 0], [0, 0, 0]], np.float64)
    m = metrics.compute_metrics(cm)
    # class 2 has no support and no predictions -> excluded from macro mean
    np.testing.assert_allclose(m["iou"], 1.0)


def test_metric_accumulator():
    acc = metrics.MetricAccumulator(num_classes=2)
    acc.update(np.array([[2, 0], [0, 2]]), loss=1.0)
    acc.update(np.array([[1, 1], [0, 0]]), loss=3.0)
    out = acc.compute()
    assert out["loss"] == 2.0
    np.testing.assert_allclose(out["accuracy"], 5 / 6)
    acc.reset()
    assert acc.cm.sum() == 0


def test_compute_metrics_exclude_index_binary_stray_background():
    # The hard-fixture osm-impervious-binary anchor scenario: masked CM
    # (row 0 empty — labeled-0 pixels never counted), model predicts class 1
    # on 9999 valid pixels and class 0 on 1. torchmetrics ignore_index=0
    # semantics: class 0 is dropped from the macro mean, but the stray
    # background prediction still counts as a false negative of class 1.
    cm = np.array([[0, 0], [1, 9999]], np.float64)
    m = metrics.compute_metrics(cm)  # legacy: class-0 fp>0 -> IoU 0 averaged in
    np.testing.assert_allclose(m["iou"], (0.0 + 9999 / 10000) / 2)
    m = metrics.compute_metrics(cm, exclude_index=0)
    np.testing.assert_allclose(m["iou"], 9999 / 10000)  # fn kept, class 0 dropped
    np.testing.assert_allclose(m["f1"], 2 * 9999 / (2 * 9999 + 1))
    assert np.isnan(m["per_class_iou"][0])
    # accuracy is micro over valid pixels — the stray prediction stays wrong
    np.testing.assert_allclose(m["accuracy"], 9999 / 10000)


def test_metric_accumulator_ignore_index_excluded_from_macro():
    acc = metrics.MetricAccumulator(num_classes=2, ignore_index=0)
    acc.update(np.array([[0, 0], [2, 8]], np.float64))
    out = acc.compute()
    np.testing.assert_allclose(out["iou"], 8 / 10)
    # without ignore_index the class-0 zero-IoU halves the mean (legacy trap)
    legacy = metrics.MetricAccumulator(num_classes=2)
    legacy.update(np.array([[0, 0], [2, 8]], np.float64))
    np.testing.assert_allclose(legacy.compute()["iou"], (0.0 + 8 / 10) / 2)


def test_compute_metrics_ignore_background():
    cm = np.array([[100, 0, 0], [0, 3, 1], [0, 1, 3]], np.float64)
    m = metrics.compute_metrics(cm, ignore_background=True)
    assert m["confusion_matrix"].shape == (2, 2)
    np.testing.assert_allclose(m["accuracy"], 6 / 8)
