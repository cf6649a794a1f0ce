"""Post-training int8 quantization for TPU serving.

The reference serves inference in fp32/bf16 (experiments/inference_demo.py
has no quantization story); this is a TPU-native serving capability: the
v5e MXU runs int8×int8→int32 at ~2× the bf16 rate, and measured end-to-end
a ViT-B MLP with full activation requant is ~1.35× faster, a 3×3×256×256
conv ~1.47× (PERF_NOTES r3 int8 section).

Design — PTQ, symmetric, static:
  * **Weights**: per-output-channel symmetric int8 (`scale[o] = maxabs/127`
    over the kernel's input axes). Quantized once, host-side.
  * **Activations**: per-tensor symmetric int8 with STATIC scales from a
    calibration pass (max-abs of each layer's input over calibration
    batches) — no dynamic range computation in the serving program, so the
    quantize step is one fused mul+round+clip+cast.
  * **Coverage**: every `nn.Dense` / `nn.Conv` call (the UNet's 1×1
    expand/project/SE channel-dots and decoder convs; the ViT's qkv/proj/
    MLP/patch/pred projections). Depthwise + stem convs (raw
    ``lax.conv_general_dilated`` in the model code) and normalization /
    attention stay bf16 — they are bandwidth-bound and scale-sensitive.
  * **Mechanism**: `flax.linen.intercept_methods` — quantization is a pure
    execution strategy layered over the UNCHANGED model code and checkpoint
    (same trick as pipeline parallelism: no model rewrite, no conversion).

Accuracy is validated in tests/test_quantize.py (quantized logits vs float
on both model families) and should always be spot-checked on a converged
checkpoint via `cli/infer.py --int8` + eval.
"""

from __future__ import annotations

import typing
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

QUANT_MODULE_TYPES = (nn.Dense, nn.Conv)


def _path_str(module: nn.Module) -> str:
    return "/".join(module.path)


# ---------------------------------------------------------------------------
# calibration
# ---------------------------------------------------------------------------
def scales_from_maxabs(maxabs: dict[str, float]) -> dict[str, float]:
    """Per-layer symmetric activation scale: maxabs/127 (0-input layers are
    dropped — quantizing an all-zero input is meaningless). The single source
    of the scale convention for every calibration path."""
    return {p: v / 127.0 for p, v in maxabs.items() if v > 0.0}


def collect_forward_maxabs(forward: typing.Callable[[], typing.Any]) -> dict[str, jax.Array]:
    """Run ``forward()`` once under a recording interceptor and return
    {layer_path: max|input|} as traced scalars.

    Interception happens at TRACE time, so this whole function can sit under
    ``jax.jit`` — one compiled program per calibration batch shape instead of
    op-by-op eager dispatch (which costs minutes through a remote-TPU relay).
    ``forward`` is any callable that applies the model (e.g. a bound
    ``model.apply`` or a trainer's predict function).
    """
    vals: dict[str, jax.Array] = {}

    def interceptor(next_fn, args_, kwargs_, context):
        m = context.module
        if isinstance(m, QUANT_MODULE_TYPES) and context.method_name == "__call__" and args_:
            x = args_[0]
            if isinstance(x, (jax.Array, np.ndarray)):
                v = jnp.max(jnp.abs(jnp.asarray(x).astype(jnp.float32)))
                p = _path_str(m)
                vals[p] = jnp.maximum(vals[p], v) if p in vals else v
        return next_fn(*args_, **kwargs_)

    with nn.intercept_methods(interceptor):
        forward()
    return vals


def collect_input_maxabs(model: nn.Module, variables: dict, *args, **kwargs) -> dict[str, jax.Array]:
    """`collect_forward_maxabs` over a plain ``model.apply`` forward."""
    return collect_forward_maxabs(lambda: model.apply(variables, *args, **kwargs))


class ActivationRecorder:
    """Records per-layer input max-abs during eager forward passes.

    Use OUTSIDE jit (values are fetched per call):

        rec = ActivationRecorder()
        with rec.recording():
            for batch in calib_batches:
                model.apply(variables, batch, train=False)
        scales = rec.scales()
    """

    def __init__(self) -> None:
        self.maxabs: dict[str, float] = {}

    def _interceptor(self, next_fn, args, kwargs, context):
        m = context.module
        if isinstance(m, QUANT_MODULE_TYPES) and context.method_name == "__call__" and args:
            x = args[0]
            if isinstance(x, (jax.Array, np.ndarray)):
                v = float(jnp.max(jnp.abs(jnp.asarray(x).astype(jnp.float32))))
                p = _path_str(m)
                self.maxabs[p] = max(self.maxabs.get(p, 0.0), v)
        return next_fn(*args, **kwargs)

    def recording(self):
        return nn.intercept_methods(self._interceptor)

    def scales(self) -> dict[str, float]:
        return scales_from_maxabs(self.maxabs)


# ---------------------------------------------------------------------------
# weight quantization
# ---------------------------------------------------------------------------
def _subtree(params: dict, path: str) -> dict | None:
    node: typing.Any = params
    for key in path.split("/") if path else ():
        if not isinstance(node, dict) or key not in node:
            return None
        node = node[key]
    return node if isinstance(node, dict) else None


def quantize_weights(
    params: dict, act_scales: dict[str, float]
) -> dict[str, dict[str, jax.Array | float | None]]:
    """Build the int8 serving state for every calibrated layer.

    Returns {path: {w_int8, w_scale (per-out-channel f32), x_scale (float),
    bias (f32 or None)}} — a plain pytree that passes through jit.
    Layers whose params are missing (e.g. a packed-model alias) are skipped.
    """
    qstate: dict[str, dict] = {}
    for path, x_scale in act_scales.items():
        leaf = _subtree(params, path)
        if leaf is None or "kernel" not in leaf:
            continue
        kernel = np.asarray(leaf["kernel"], np.float32)
        reduce_axes = tuple(range(kernel.ndim - 1))  # Dense (I,O) / Conv (H,W,I,O)
        w_absmax = np.abs(kernel).max(axis=reduce_axes)
        w_scale = np.where(w_absmax > 0, w_absmax / 127.0, 1.0).astype(np.float32)
        w_int8 = np.clip(np.round(kernel / w_scale), -127, 127).astype(np.int8)
        bias = leaf.get("bias")
        qstate[path] = {
            "w_int8": jnp.asarray(w_int8),
            "w_scale": jnp.asarray(w_scale),
            "x_scale": float(x_scale),
            "bias": jnp.asarray(np.asarray(bias, np.float32)) if bias is not None else None,
        }
    return qstate


# ---------------------------------------------------------------------------
# quantized execution
# ---------------------------------------------------------------------------
def _quantize_input(x: jax.Array, scale: float) -> jax.Array:
    return jnp.clip(jnp.round(x.astype(jnp.float32) * (1.0 / scale)), -127, 127).astype(jnp.int8)


def _dense_int8(x: jax.Array, q: dict, out_dtype) -> jax.Array:
    xq = _quantize_input(x, q["x_scale"])
    acc = jax.lax.dot_general(
        xq, q["w_int8"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (q["w_scale"] * q["x_scale"])
    if q["bias"] is not None:
        y = y + q["bias"]
    return y.astype(out_dtype)


def _norm_padding(padding, k_shape) -> typing.Any:
    if isinstance(padding, str):
        return padding
    if isinstance(padding, int):
        return [(padding, padding)] * (len(k_shape) - 2)
    return [(p, p) if isinstance(p, int) else tuple(p) for p in padding]


def _conv_int8(x: jax.Array, q: dict, module: nn.Conv, out_dtype) -> jax.Array:
    assert x.ndim == 4, "int8 conv path supports NHWC inputs"
    k = q["w_int8"]
    def _pair(v):
        if v is None:
            return None
        return (v, v) if isinstance(v, int) else tuple(v)

    strides = _pair(module.strides) or (1, 1)
    xq = _quantize_input(x, q["x_scale"])
    acc = jax.lax.conv_general_dilated(
        xq, k, strides, _norm_padding(module.padding, k.shape),
        lhs_dilation=_pair(module.input_dilation),
        rhs_dilation=_pair(module.kernel_dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=module.feature_group_count,
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (q["w_scale"] * q["x_scale"])
    if q["bias"] is not None:
        y = y + q["bias"]
    return y.astype(out_dtype)


def make_quant_interceptor(qstate: dict[str, dict]):
    """Interceptor replacing calibrated Dense/Conv calls with int8 compute.

    Pure jax ops — safe under jit; uncalibrated layers run unchanged."""

    def interceptor(next_fn, args, kwargs, context):
        m = context.module
        if context.method_name != "__call__" or not isinstance(m, QUANT_MODULE_TYPES):
            return next_fn(*args, **kwargs)
        q = qstate.get(_path_str(m))
        if q is None:
            return next_fn(*args, **kwargs)
        x = args[0]
        out_dtype = m.dtype or x.dtype
        if isinstance(m, nn.Dense):
            return _dense_int8(x, q, out_dtype)
        if x.ndim != 4 or (m.input_dilation not in (None, 1, (1, 1))):
            return next_fn(*args, **kwargs)  # transposed/unsupported conv: float
        return _conv_int8(x, q, m, out_dtype)

    return interceptor


def quantized_apply(model: nn.Module, variables: dict, qstate: dict, *args, **kwargs):
    """Drop-in ``model.apply`` with calibrated layers running int8."""
    with nn.intercept_methods(make_quant_interceptor(qstate)):
        return model.apply(variables, *args, **kwargs)


# ---------------------------------------------------------------------------
# end-to-end helpers
# ---------------------------------------------------------------------------
def calibrate_model(
    model: nn.Module,
    variables: dict,
    batches: typing.Iterable,
    apply_kwargs: dict | None = None,
) -> dict[str, float]:
    """Run calibration forwards (eager) and return activation scales."""
    rec = ActivationRecorder()
    kw = apply_kwargs or {}
    with rec.recording():
        for x in batches:
            model.apply(variables, x, **kw)
    return rec.scales()


def quantize_segmentation_trainer(trainer, n_batches: int = 2):
    """Calibrate + quantize a SegmentationTrainer's model for serving.

    Returns (predict_fn, bundle) matching the ``tiled_predict_many`` contract
    (the state argument is an opaque pytree): ``predict_fn(bundle, tiles)``
    maps raw-DN NHWC tiles to logits with every calibrated Dense/Conv in
    int8. Both calibration and serving route through ``trainer._predict``
    (the float serving path) under interception, so the preprocessing and
    numerics conventions have exactly one definition.

    The bundle carries the trainer state (optimizer moments stripped —
    serving never reads them, and a multi-chip mesh would otherwise
    replicate ~2x params of dead weight) AND the int8 qstate. Quantized
    weights and activation scales are therefore RUNTIME ARGUMENTS of the
    serving program, not compile-time constants: one compiled program (or
    one serialized AOT artifact, ``cli/infer.py --int8 --aot-cache``) serves
    any checkpoint/calibration of the same model — the artifact fingerprint
    covers the qstate's tree structure and shapes via the normal dynamic-arg
    signature (tests/test_quantize.py::test_int8_weights_are_runtime_args).
    """
    state = trainer.state.replace(opt_state=())

    collect = jax.jit(
        lambda st, imgs: collect_forward_maxabs(lambda: trainer._predict(st, imgs))
    )
    maxabs: dict[str, float] = {}
    seen = 0
    for batch in trainer.dm.train_batches(epoch=0):
        for p, v in collect(state, jnp.asarray(batch.images)).items():
            maxabs[p] = max(maxabs.get(p, 0.0), float(v))
        seen += 1
        if seen >= n_batches:
            break
    if seen == 0:
        # Dataset smaller than one training batch (e.g. a serving box with a
        # handful of segments): calibrate on center crops of the segments.
        crop = trainer.config.datamodule.random_crop_size
        xs = []
        for i in range(len(trainer.dm.source)):
            img = np.asarray(trainer.dm.source[i].x)  # (H, W, C) or (T, H, W, C)
            h, w = img.shape[-3], img.shape[-2]
            assert h >= crop and w >= crop, (
                f"calibration segment {i} is {h}x{w}, smaller than the model "
                f"crop {crop} — provide a training batch or larger segments"
            )
            h0, w0 = (h - crop) // 2, (w - crop) // 2
            xs.append(img[..., h0 : h0 + crop, w0 : w0 + crop, :])
        for p, v in collect(state, jnp.asarray(np.stack(xs))).items():
            maxabs[p] = max(maxabs.get(p, 0.0), float(v))
        seen = 1
    assert seen > 0, "no calibration batches available"
    qstate = quantize_weights(trainer.state.params, scales_from_maxabs(maxabs))
    bundle = {"state": state, "qstate": qstate}

    @jax.jit
    def predict_fn(bundle, images):
        with nn.intercept_methods(make_quant_interceptor(bundle["qstate"])):
            return trainer._predict(bundle["state"], images)

    return predict_fn, bundle
