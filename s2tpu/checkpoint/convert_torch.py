"""PyTorch -> Flax weight conversion (the checkpoint-compatibility layer).

Parity target: reference utils.py:62-96 (``load_prithvi`` checkpoint surgery:
drop pos embeds, optionally drop the decoder, load the rest, regenerate
sincos) and the ImageNet EfficientNet ckpt ingestion
(efficientnet_unet.py:416-431, lukemelas naming).

Layout conventions converted here:
  * torch Linear weight (out, in)            -> Dense kernel (in, out)      [transpose]
  * torch Conv2d weight (O, I, kh, kw)       -> Conv kernel (kh, kw, I, O)  [HWIO]
  * torch depthwise Conv2d (C, 1, k, k)      -> (k, k, 1, C)
  * torch Conv3d patch-embed (D, C, t, p, q) -> Dense kernel (t*p*q*C, D)
    matching s2tpu patchify's (tub, p, q, c) channel-fastest feature order
  * BatchNorm weight/bias/running_mean/var   -> scale/bias + batch_stats

Position embeddings are NOT converted: the Flax model holds them as fixed
sincos constants regenerated for the runtime ``num_frames`` — exactly the
reference's pop-and-reinitialize behavior.
"""

from __future__ import annotations

import typing
from pathlib import Path

import numpy as np

from s2tpu.configs.paths import PRE_TRAINED_WEIGHTS_DIR

PRITHVI_WEIGHTS_PATH = PRE_TRAINED_WEIGHTS_DIR / "Prithvi_100M.pt"


def _to_numpy(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)


def _linear(sd: dict, prefix: str) -> dict:
    return {"kernel": _to_numpy(sd[f"{prefix}.weight"]).T, "bias": _to_numpy(sd[f"{prefix}.bias"])}


def _layernorm(sd: dict, prefix: str) -> dict:
    return {"scale": _to_numpy(sd[f"{prefix}.weight"]), "bias": _to_numpy(sd[f"{prefix}.bias"])}


def _block(sd: dict, prefix: str) -> dict:
    """timm ViT Block -> s2tpu Block params."""
    return {
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "attn": {
            "qkv": _linear(sd, f"{prefix}.attn.qkv"),
            "proj": _linear(sd, f"{prefix}.attn.proj"),
        },
        "mlp_fc1": _linear(sd, f"{prefix}.mlp.fc1"),
        "mlp_fc2": _linear(sd, f"{prefix}.mlp.fc2"),
    }


def _count_blocks(sd: dict, prefix: str) -> int:
    idxs = {int(k.split(".")[1]) for k in sd if k.startswith(f"{prefix}.")}
    return max(idxs) + 1 if idxs else 0


def convert_prithvi_state_dict(
    state_dict: dict,
    depth: int | None = None,
    decoder_depth: int | None = None,
    include_decoder: bool = True,
) -> dict:
    """Prithvi_100M.pt state dict -> s2tpu PrithviMAE params pytree.

    Encoder/decoder depths default to what the checkpoint actually contains.
    """
    sd = state_dict
    depth = depth if depth is not None else _count_blocks(sd, "blocks")
    decoder_depth = (
        decoder_depth if decoder_depth is not None else _count_blocks(sd, "decoder_blocks")
    )
    w = _to_numpy(sd["patch_embed.proj.weight"])  # (D, C, t, p, q)
    d_out = w.shape[0]
    # (D, C, t, p, q) -> (t, p, q, C, D) -> (t*p*q*C, D): patchify feature order
    kernel = w.transpose(2, 3, 4, 1, 0).reshape(-1, d_out)
    params: dict[str, typing.Any] = {
        "cls_token": _to_numpy(sd["cls_token"]),
        "patch_proj": {"kernel": kernel, "bias": _to_numpy(sd["patch_embed.proj.bias"])},
        "encoder_norm": _layernorm(sd, "norm"),
    }
    for i in range(depth):
        params[f"block_{i}"] = _block(sd, f"blocks.{i}")
    if include_decoder and "decoder_embed.weight" in sd:
        params["decoder_embed"] = _linear(sd, "decoder_embed")
        params["mask_token"] = _to_numpy(sd["mask_token"])
        params["decoder_norm"] = _layernorm(sd, "decoder_norm")
        params["decoder_pred"] = _linear(sd, "decoder_pred")
        for i in range(decoder_depth):
            params[f"decoder_block_{i}"] = _block(sd, f"decoder_blocks.{i}")
    return params


def _merge_into(template: dict, converted: dict, path: str = "") -> dict:
    """Overlay converted leaves onto a params template (shape-checked)."""
    out = {}
    for key, tval in template.items():
        if key in converted:
            cval = converted[key]
            if isinstance(tval, dict):
                out[key] = _merge_into(tval, cval, f"{path}/{key}")
            else:
                assert tuple(np.shape(cval)) == tuple(np.shape(tval)), (
                    f"shape mismatch at {path}/{key}: ckpt {np.shape(cval)} vs model {np.shape(tval)}"
                )
                out[key] = np.asarray(cval, dtype=np.asarray(tval).dtype)
        else:
            out[key] = tval
    return out


def load_prithvi_weights(
    params_template: dict,
    num_frames: int = 1,
    path: str | Path | None = None,
    include_decoder: bool = True,
) -> dict:
    """Load Prithvi_100M.pt into a params template (missing file -> raises)."""
    import torch

    path = Path(path) if path is not None else PRITHVI_WEIGHTS_PATH
    if not path.exists():
        raise FileNotFoundError(str(path))
    sd = torch.load(path, map_location="cpu", weights_only=True)
    converted = convert_prithvi_state_dict(sd, include_decoder=include_decoder)
    return _merge_into(params_template, converted)


# ---------------------------------------------------------------------------
# EfficientNet (lukemelas ImageNet checkpoints)
# ---------------------------------------------------------------------------
def _conv_hwio(sd: dict, key: str) -> np.ndarray:
    return _to_numpy(sd[key]).transpose(2, 3, 1, 0)  # (O,I,kh,kw) -> (kh,kw,I,O)


def _conv1x1_to_dense(sd: dict, key: str) -> np.ndarray:
    """torch 1x1 Conv2d (O, I, 1, 1) -> Dense kernel (I, O): s2tpu models
    express 1x1 convs as channel dots (efficientnet_unet.py MBConv)."""
    w = _to_numpy(sd[key])
    return w[:, :, 0, 0].T


def _bn(sd: dict, prefix: str) -> tuple[dict, dict]:
    return (
        {"scale": _to_numpy(sd[f"{prefix}.weight"]), "bias": _to_numpy(sd[f"{prefix}.bias"])},
        {"mean": _to_numpy(sd[f"{prefix}.running_mean"]), "var": _to_numpy(sd[f"{prefix}.running_var"])},
    )


def convert_efficientnet_state_dict(
    state_dict: dict, num_blocks: int, skip_stem: bool = True
) -> tuple[dict, dict]:
    """lukemelas EfficientNet-pytorch state dict -> (params, batch_stats)
    for s2tpu EfficientNetEncoder.

    ``skip_stem`` leaves the stem conv at random init when the channel count
    differs (ImageNet ckpts are RGB; Sentinel-2 input is 6-band) — the same
    net effect as the reference's strict=False load. The fc head is always
    skipped (class-count mismatch).
    """
    sd = state_dict
    params: dict[str, typing.Any] = {}
    stats: dict[str, typing.Any] = {}
    if not skip_stem:
        params["stem_conv"] = {"kernel": _conv_hwio(sd, "_conv_stem.weight")}
    bn_p, bn_s = _bn(sd, "_bn0")
    params["stem_bn"], stats["stem_bn"] = bn_p, bn_s
    for i in range(num_blocks):
        p: dict[str, typing.Any] = {}
        s: dict[str, typing.Any] = {}
        pre = f"_blocks.{i}"
        if f"{pre}._expand_conv.weight" in sd:
            p["expand_conv"] = {"kernel": _conv1x1_to_dense(sd, f"{pre}._expand_conv.weight")}
            p["expand_bn"], s["expand_bn"] = _bn(sd, f"{pre}._bn0")
        p["depthwise_conv"] = {"kernel": _conv_hwio(sd, f"{pre}._depthwise_conv.weight")}
        p["depthwise_bn"], s["depthwise_bn"] = _bn(sd, f"{pre}._bn1")
        if f"{pre}._se_reduce.weight" in sd:
            p["se_reduce"] = {
                "kernel": _conv1x1_to_dense(sd, f"{pre}._se_reduce.weight"),
                "bias": _to_numpy(sd[f"{pre}._se_reduce.bias"]),
            }
            p["se_expand"] = {
                "kernel": _conv1x1_to_dense(sd, f"{pre}._se_expand.weight"),
                "bias": _to_numpy(sd[f"{pre}._se_expand.bias"]),
            }
        p["project_conv"] = {"kernel": _conv1x1_to_dense(sd, f"{pre}._project_conv.weight")}
        p["project_bn"], s["project_bn"] = _bn(sd, f"{pre}._bn2")
        params[f"block_{i}"] = p
        stats[f"block_{i}"] = s
    params["head_conv"] = {"kernel": _conv1x1_to_dense(sd, "_conv_head.weight")}
    params["head_bn"], stats["head_bn"] = _bn(sd, "_bn1")
    return params, stats


def _convtrans_hwio(sd: dict, prefix: str) -> dict:
    """torch ConvTranspose2d (I, O, kh, kw) -> flax ConvTranspose kernel
    (kh, kw, I, O) with both spatial dims flipped (torch's transposed conv is
    the gradient of conv — lax.conv_transpose correlates, so the kernel must
    be mirrored; verified exact at k=2 s=2)."""
    w = _to_numpy(sd[f"{prefix}.weight"]).transpose(2, 3, 0, 1)
    return {
        "kernel": np.ascontiguousarray(w[::-1, ::-1]),
        "bias": _to_numpy(sd[f"{prefix}.bias"]),
    }


def _conv_with_bias(sd: dict, prefix: str) -> dict:
    return {"kernel": _conv_hwio(sd, f"{prefix}.weight"), "bias": _to_numpy(sd[f"{prefix}.bias"])}


def convert_reference_unet_state_dict(state_dict: dict) -> tuple[dict, dict]:
    """Reference ``EfficientnetUnet.state_dict()`` -> (params, batch_stats)
    for s2tpu EfficientNetUNet — the full-model checkpoint-compatibility path
    (encoder + decoder + classifier; reference efficientnet_unet.py:106-165).

    Lightning checkpoints prefix every key with ``net.`` (SegmentationModule
    stores the model as self.net); strip it before calling, or pass the raw
    module state dict.

    Reference naming: encoder.stem.{0 conv,1 bn}; per block, ``stem`` holds
    [expand conv, bn, act, depthwise conv, bn] (or just [depthwise, bn] when
    expand_ratio==1), ``squeeze_excitation.{1,3}`` the SE convs,
    ``final_layer.{0,1}`` project conv+bn; encoder.conv_head.{0,1};
    up_convs.{i} / double_convs.{i}.{0,1,3,4}; input_up_conv /
    input_double_conv.{0,1,3,4}; out_conv1x1.
    """
    sd = {k[4:] if k.startswith("net.") else k: v for k, v in state_dict.items()}
    n_blocks = 1 + max(int(k.split(".")[2]) for k in sd if k.startswith("encoder.blocks."))
    enc_p: dict[str, typing.Any] = {
        "stem_conv": {"kernel": _conv_hwio(sd, "encoder.stem.0.weight")},
    }
    enc_s: dict[str, typing.Any] = {}
    enc_p["stem_bn"], enc_s["stem_bn"] = _bn(sd, "encoder.stem.1")
    for i in range(n_blocks):
        pre = f"encoder.blocks.{i}"
        p: dict[str, typing.Any] = {}
        s: dict[str, typing.Any] = {}
        if f"{pre}.stem.3.weight" in sd:  # expand_ratio != 1
            p["expand_conv"] = {"kernel": _conv1x1_to_dense(sd, f"{pre}.stem.0.weight")}
            p["expand_bn"], s["expand_bn"] = _bn(sd, f"{pre}.stem.1")
            p["depthwise_conv"] = {"kernel": _conv_hwio(sd, f"{pre}.stem.3.weight")}
            p["depthwise_bn"], s["depthwise_bn"] = _bn(sd, f"{pre}.stem.4")
        else:
            p["depthwise_conv"] = {"kernel": _conv_hwio(sd, f"{pre}.stem.0.weight")}
            p["depthwise_bn"], s["depthwise_bn"] = _bn(sd, f"{pre}.stem.1")
        if f"{pre}.squeeze_excitation.1.weight" in sd:
            p["se_reduce"] = {
                "kernel": _conv1x1_to_dense(sd, f"{pre}.squeeze_excitation.1.weight"),
                "bias": _to_numpy(sd[f"{pre}.squeeze_excitation.1.bias"]),
            }
            p["se_expand"] = {
                "kernel": _conv1x1_to_dense(sd, f"{pre}.squeeze_excitation.3.weight"),
                "bias": _to_numpy(sd[f"{pre}.squeeze_excitation.3.bias"]),
            }
        p["project_conv"] = {"kernel": _conv1x1_to_dense(sd, f"{pre}.final_layer.0.weight")}
        p["project_bn"], s["project_bn"] = _bn(sd, f"{pre}.final_layer.1")
        enc_p[f"block_{i}"], enc_s[f"block_{i}"] = p, s
    enc_p["head_conv"] = {"kernel": _conv1x1_to_dense(sd, "encoder.conv_head.0.weight")}
    enc_p["head_bn"], enc_s["head_bn"] = _bn(sd, "encoder.conv_head.1")

    params: dict[str, typing.Any] = {"encoder": enc_p}
    stats: dict[str, typing.Any] = {"encoder": enc_s}

    def double_conv(prefix: str) -> tuple[dict, dict]:
        p = {
            "conv0": _conv_with_bias(sd, f"{prefix}.0"),
            "conv1": _conv_with_bias(sd, f"{prefix}.3"),
        }
        s = {}
        p["bn0"], s["bn0"] = _bn(sd, f"{prefix}.1")
        p["bn1"], s["bn1"] = _bn(sd, f"{prefix}.4")
        return p, s

    n_up = 1 + max(int(k.split(".")[1]) for k in sd if k.startswith("up_convs."))
    for i in range(n_up):
        params[f"up_conv{i}"] = _convtrans_hwio(sd, f"up_convs.{i}")
        params[f"double_conv{i}"], stats[f"double_conv{i}"] = double_conv(f"double_convs.{i}")
    if "input_up_conv.weight" in sd:
        params["input_up_conv"] = _convtrans_hwio(sd, "input_up_conv")
        params["input_double_conv"], stats["input_double_conv"] = double_conv("input_double_conv")
    params["classifier"] = {
        "kernel": _conv1x1_to_dense(sd, "out_conv1x1.weight"),
        "bias": _to_numpy(sd["out_conv1x1.bias"]),
    }
    return params, stats


def load_reference_unet_weights(
    params_template: dict, batch_stats_template: dict, path: str | Path
) -> tuple[dict, dict]:
    """Load a reference EfficientnetUnet checkpoint (raw state dict or a
    Lightning .ckpt with net.-prefixed keys) into s2tpu UNet templates."""
    import torch

    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(str(path))
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("state_dict", ckpt)
    params, stats = convert_reference_unet_state_dict(sd)
    return (
        _merge_into(params_template, params),
        _merge_into(batch_stats_template, stats),
    )


def convert_reference_prithvi_seg_state_dict(state_dict: dict) -> tuple[dict, dict]:
    """Reference ``PrithviSegmentationNet.state_dict()`` -> (params, batch_stats)
    for s2tpu PrithviSegmentationNet — the finetuned-checkpoint compatibility
    path (reference prithvi_segmentation.py:23-162).

    Lightning checkpoints prefix keys with ``net.`` (stripped here). Mapping:
      * ``backbone.*``  -> the MAE encoder via convert_prithvi_state_dict
        (pos embeds skipped: both sides regenerate sincos for the runtime
        num_frames — reference utils.py:84-93);
      * ``neck.feature_pyramid_net.{0,3,4,7}`` ConvTranspose2d k2s2 ->
        up0..up3 (spatially-flipped HWIO); ``{1,5}.ln`` Norm2d -> ln0/ln1;
      * ``head.net.{3i,3i+1}`` conv3x3+BN2d pairs -> conv{i}/bn{i};
        ``head.net.{3n+1}`` final 1x1 -> classifier.
    """
    sd = {k[4:] if k.startswith("net.") else k: v for k, v in state_dict.items()}
    backbone_sd = {k[len("backbone."):]: v for k, v in sd.items() if k.startswith("backbone.")}
    params: dict[str, typing.Any] = {
        "backbone": convert_prithvi_state_dict(backbone_sd, include_decoder=False)
    }
    neck = {}
    for ours, theirs in (("up0", 0), ("up1", 3), ("up2", 4), ("up3", 7)):
        neck[ours] = _convtrans_hwio(sd, f"neck.feature_pyramid_net.{theirs}")
    for ours, theirs in (("ln0", 1), ("ln1", 5)):
        neck[ours] = _layernorm(sd, f"neck.feature_pyramid_net.{theirs}.ln")
    params["neck"] = neck

    n_convs = sum(1 for k in sd if k.startswith("head.net.") and k.endswith(".running_mean"))
    head: dict[str, typing.Any] = {}
    head_stats: dict[str, typing.Any] = {}
    for i in range(n_convs):
        head[f"conv{i}"] = _conv_with_bias(sd, f"head.net.{3 * i}")
        head[f"bn{i}"], head_stats[f"bn{i}"] = _bn(sd, f"head.net.{3 * i + 1}")
    head["classifier"] = _conv_with_bias(sd, f"head.net.{3 * n_convs + 1}")
    params["head"] = head
    return params, {"head": head_stats}


def load_reference_prithvi_seg_weights(
    params_template: dict, batch_stats_template: dict, path: str | Path
) -> tuple[dict, dict]:
    """Load a reference PrithviSegmentationNet checkpoint (raw state dict or
    Lightning .ckpt with net.-prefixed keys) into s2tpu seg-net templates."""
    import torch

    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(str(path))
    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    sd = ckpt.get("state_dict", ckpt)
    params, stats = convert_reference_prithvi_seg_state_dict(sd)
    return (
        _merge_into(params_template, params),
        _merge_into(batch_stats_template, stats),
    )


def load_efficientnet_weights(
    params_template: dict,
    batch_stats_template: dict,
    path: str | Path,
    encoder_key: str = "encoder",
) -> tuple[dict, dict]:
    """Load a lukemelas .pth into UNet params/batch_stats templates."""
    import torch

    path = Path(path)
    if not path.exists():
        raise FileNotFoundError(str(path))
    sd = torch.load(path, map_location="cpu", weights_only=True)
    n_blocks = len({k.split(".")[1] for k in sd if k.startswith("_blocks.")})
    conv_params, conv_stats = convert_efficientnet_state_dict(sd, n_blocks)
    params = dict(params_template)
    params[encoder_key] = _merge_into(params_template[encoder_key], conv_params)
    stats = dict(batch_stats_template)
    stats[encoder_key] = _merge_into(batch_stats_template[encoder_key], conv_stats)
    return params, stats


# ---------------------------------------------------------------------------
# Flax -> PyTorch export (reverse migration)
# ---------------------------------------------------------------------------
# The exact inverses of the ingestion mappings above: a model trained in
# s2tpu exports to a state dict the reference's torch modules load with
# strict=True (EfficientnetUnet, efficientnet_unet.py:106-165) or in the
# published Prithvi_100M.pt layout (prithvi.py / utils.py:62-96), so TPU
# training composes with an existing torch serving stack. Pure transposes —
# round-trips are bit-exact (tests/test_reference_parity.py).


def _np32(x) -> np.ndarray:
    """Leaf -> float32 numpy (bf16-stored params export as f32)."""
    a = np.asarray(x)
    return a.astype(np.float32) if a.dtype != np.float32 else a


def _inv_conv_hwio(kernel) -> np.ndarray:
    return _np32(kernel).transpose(3, 2, 0, 1)  # (kh,kw,I,O) -> (O,I,kh,kw)


def _inv_dense_to_conv1x1(kernel) -> np.ndarray:
    return np.ascontiguousarray(_np32(kernel).T)[:, :, None, None]  # (I,O) -> (O,I,1,1)


def _inv_convtrans(p: dict, out: dict, prefix: str) -> None:
    k = _np32(p["kernel"])[::-1, ::-1]  # un-mirror (see _convtrans_hwio)
    out[f"{prefix}.weight"] = np.ascontiguousarray(k.transpose(2, 3, 0, 1))  # -> (I,O,kh,kw)
    out[f"{prefix}.bias"] = _np32(p["bias"])


def _inv_bn(p: dict, s: dict, out: dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = _np32(p["scale"])
    out[f"{prefix}.bias"] = _np32(p["bias"])
    out[f"{prefix}.running_mean"] = _np32(s["mean"])
    out[f"{prefix}.running_var"] = _np32(s["var"])
    out[f"{prefix}.num_batches_tracked"] = np.zeros((), np.int64)


def _inv_conv_with_bias(p: dict, out: dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = _inv_conv_hwio(p["kernel"])
    out[f"{prefix}.bias"] = _np32(p["bias"])


def _inv_linear(p: dict, out: dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = np.ascontiguousarray(_np32(p["kernel"]).T)
    out[f"{prefix}.bias"] = _np32(p["bias"])


def _inv_layernorm(p: dict, out: dict, prefix: str) -> None:
    out[f"{prefix}.weight"] = _np32(p["scale"])
    out[f"{prefix}.bias"] = _np32(p["bias"])


def export_reference_unet_state_dict(params: dict, batch_stats: dict) -> dict:
    """s2tpu EfficientNetUNet (params, batch_stats) -> reference
    ``EfficientnetUnet.state_dict()`` naming, numpy values.

    Exact inverse of convert_reference_unet_state_dict. The encoder's unused
    ImageNet fc head has no s2tpu counterpart, so the reference loads the
    export with ``strict=False`` (missing keys are exactly ``encoder.fc.*`` —
    the same convention its own ImageNet ingestion uses,
    efficientnet_unet.py:416-431).
    """
    enc_p, enc_s = params["encoder"], batch_stats["encoder"]
    out: dict[str, np.ndarray] = {"encoder.stem.0.weight": _inv_conv_hwio(enc_p["stem_conv"]["kernel"])}
    _inv_bn(enc_p["stem_bn"], enc_s["stem_bn"], out, "encoder.stem.1")
    n_blocks = sum(1 for k in enc_p if k.startswith("block_"))
    for i in range(n_blocks):
        p, s, pre = enc_p[f"block_{i}"], enc_s[f"block_{i}"], f"encoder.blocks.{i}"
        if "expand_conv" in p:
            out[f"{pre}.stem.0.weight"] = _inv_dense_to_conv1x1(p["expand_conv"]["kernel"])
            _inv_bn(p["expand_bn"], s["expand_bn"], out, f"{pre}.stem.1")
            out[f"{pre}.stem.3.weight"] = _inv_conv_hwio(p["depthwise_conv"]["kernel"])
            _inv_bn(p["depthwise_bn"], s["depthwise_bn"], out, f"{pre}.stem.4")
        else:
            out[f"{pre}.stem.0.weight"] = _inv_conv_hwio(p["depthwise_conv"]["kernel"])
            _inv_bn(p["depthwise_bn"], s["depthwise_bn"], out, f"{pre}.stem.1")
        if "se_reduce" in p:
            for ours, theirs in (("se_reduce", 1), ("se_expand", 3)):
                out[f"{pre}.squeeze_excitation.{theirs}.weight"] = _inv_dense_to_conv1x1(
                    p[ours]["kernel"]
                )
                out[f"{pre}.squeeze_excitation.{theirs}.bias"] = _np32(p[ours]["bias"])
        out[f"{pre}.final_layer.0.weight"] = _inv_dense_to_conv1x1(p["project_conv"]["kernel"])
        _inv_bn(p["project_bn"], s["project_bn"], out, f"{pre}.final_layer.1")
    out["encoder.conv_head.0.weight"] = _inv_dense_to_conv1x1(enc_p["head_conv"]["kernel"])
    _inv_bn(enc_p["head_bn"], enc_s["head_bn"], out, "encoder.conv_head.1")

    n_up = sum(1 for k in params if k.startswith("up_conv"))
    for i in range(n_up):
        _inv_convtrans(params[f"up_conv{i}"], out, f"up_convs.{i}")
        p, s = params[f"double_conv{i}"], batch_stats[f"double_conv{i}"]
        _inv_conv_with_bias(p["conv0"], out, f"double_convs.{i}.0")
        _inv_bn(p["bn0"], s["bn0"], out, f"double_convs.{i}.1")
        _inv_conv_with_bias(p["conv1"], out, f"double_convs.{i}.3")
        _inv_bn(p["bn1"], s["bn1"], out, f"double_convs.{i}.4")
    if "input_up_conv" in params:
        _inv_convtrans(params["input_up_conv"], out, "input_up_conv")
        p, s = params["input_double_conv"], batch_stats["input_double_conv"]
        _inv_conv_with_bias(p["conv0"], out, "input_double_conv.0")
        _inv_bn(p["bn0"], s["bn0"], out, "input_double_conv.1")
        _inv_conv_with_bias(p["conv1"], out, "input_double_conv.3")
        _inv_bn(p["bn1"], s["bn1"], out, "input_double_conv.4")
    out["out_conv1x1.weight"] = _inv_dense_to_conv1x1(params["classifier"]["kernel"])
    out["out_conv1x1.bias"] = _np32(params["classifier"]["bias"])
    return out


def _inv_block(p: dict, out: dict, prefix: str) -> None:
    _inv_layernorm(p["norm1"], out, f"{prefix}.norm1")
    _inv_layernorm(p["norm2"], out, f"{prefix}.norm2")
    _inv_linear(p["attn"]["qkv"], out, f"{prefix}.attn.qkv")
    _inv_linear(p["attn"]["proj"], out, f"{prefix}.attn.proj")
    _inv_linear(p["mlp_fc1"], out, f"{prefix}.mlp.fc1")
    _inv_linear(p["mlp_fc2"], out, f"{prefix}.mlp.fc2")


def _export_prithvi_encoder(params: dict, cfg, out: dict, prefix: str = "") -> None:
    """Encoder-side inverse (cls/patch-embed/pos/norm/blocks) shared by the
    MAE and segmentation-net exports; ``prefix`` is '' or 'backbone.'."""
    from s2tpu.models.prithvi_mae import sincos_3d

    out[f"{prefix}cls_token"] = _np32(params["cls_token"])
    k = _np32(params["patch_proj"]["kernel"])  # (t*p*q*C, D)
    d_out = k.shape[1]
    w = k.reshape(cfg.tubelet_size, cfg.patch_size, cfg.patch_size, cfg.in_chans, d_out)
    out[f"{prefix}patch_embed.proj.weight"] = np.ascontiguousarray(w.transpose(4, 3, 0, 1, 2))
    out[f"{prefix}patch_embed.proj.bias"] = _np32(params["patch_proj"]["bias"])
    out[f"{prefix}pos_embed"] = sincos_3d(cfg.embed_dim, cfg.grid_size, cls_token=True)[
        None
    ].astype(np.float32)
    _inv_layernorm(params["encoder_norm"], out, f"{prefix}norm")
    for i in range(sum(1 for key in params if key.startswith("block_"))):
        _inv_block(params[f"block_{i}"], out, f"{prefix}blocks.{i}")


def export_prithvi_state_dict(params: dict, config) -> dict:
    """s2tpu PrithviMAE params -> the published ``Prithvi_100M.pt`` layout
    (numpy values), so an s2tpu MAE pretraining run feeds the reference's
    ``load_prithvi`` surgery (utils.py:62-96) or any torch HLS stack.

    Exact inverse of convert_prithvi_state_dict; the fixed sincos position
    embeddings (s2tpu stores them as constants, not params) are regenerated
    into ``pos_embed`` / ``decoder_pos_embed`` exactly as the published
    checkpoint carries them.

    ``config`` is the PrithviConfig the params were trained under (supplies
    tubelet/patch/in_chans for the Conv3d patch-embed reshape and the grid
    for the sincos tables).
    """
    from s2tpu.models.prithvi_mae import sincos_3d

    cfg = config
    out: dict[str, np.ndarray] = {}
    _export_prithvi_encoder(params, cfg, out, prefix="")
    if "decoder_embed" in params:
        _inv_linear(params["decoder_embed"], out, "decoder_embed")
        out["mask_token"] = _np32(params["mask_token"])
        out["decoder_pos_embed"] = sincos_3d(
            cfg.decoder_embed_dim, cfg.grid_size, cls_token=True
        )[None].astype(np.float32)
        _inv_layernorm(params["decoder_norm"], out, "decoder_norm")
        _inv_linear(params["decoder_pred"], out, "decoder_pred")
        for i in range(sum(1 for key in params if key.startswith("decoder_block_"))):
            _inv_block(params[f"decoder_block_{i}"], out, f"decoder_blocks.{i}")
    return out


def export_reference_prithvi_seg_state_dict(
    params: dict, batch_stats: dict, backbone_config
) -> dict:
    """s2tpu PrithviSegmentationNet (params, batch_stats) -> reference
    ``PrithviSegmentationNet.state_dict()`` naming (numpy values), the exact
    inverse of convert_reference_prithvi_seg_state_dict.

    The reference builds its backbone via ``load_prithvi`` (no_decoder=True,
    utils.py:62-96), so the target state dict is encoder-only with the
    surgery-regenerated ``backbone.pos_embed`` — regenerated here from the
    same sincos tables (``backbone_config`` is the s2tpu PrithviConfig:
    grid/tubelet/patch/in_chans).
    """
    out: dict[str, np.ndarray] = {}
    _export_prithvi_encoder(params["backbone"], backbone_config, out, prefix="backbone.")
    for ours, theirs in (("up0", 0), ("up1", 3), ("up2", 4), ("up3", 7)):
        _inv_convtrans(params["neck"][ours], out, f"neck.feature_pyramid_net.{theirs}")
    for ours, theirs in (("ln0", 1), ("ln1", 5)):
        _inv_layernorm(params["neck"][ours], out, f"neck.feature_pyramid_net.{theirs}.ln")
    head, head_stats = params["head"], batch_stats["head"]
    n_convs = sum(1 for k in head if k.startswith("conv"))
    for i in range(n_convs):
        _inv_conv_with_bias(head[f"conv{i}"], out, f"head.net.{3 * i}")
        _inv_bn(head[f"bn{i}"], head_stats[f"bn{i}"], out, f"head.net.{3 * i + 1}")
    _inv_conv_with_bias(head["classifier"], out, f"head.net.{3 * n_convs + 1}")
    return out
