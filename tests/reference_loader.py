"""Import the reference PyTorch models from /root/reference for parity tests.

The reference is the behavioral oracle: these tests instantiate its torch
modules in-process (read-only import — nothing is copied into this repo),
push their state dicts through s2tpu.checkpoint.convert_torch, and assert
end-to-end numerical parity of the Flax models (BASELINE.md "bit-for-bit
class maps" north star, checked at argmax level).

The reference needs two shims in this image:
  * ``timm`` is not installed — a minimal torch implementation of the public
    ViT ``Block`` API (norm1 -> attn(qkv, proj) -> norm2 -> mlp(fc1, fc2))
    with timm's parameter naming is installed into sys.modules. This is our
    own code implementing the well-known published architecture; parameter
    names are the checkpoint contract Prithvi_100M.pt uses.
  * the reference imports itself both as ``src.*`` and as top-level modules
    — a namespace alias is registered for both.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")


def _install_timm_shim() -> None:
    if "timm" in sys.modules:
        return
    import torch
    from torch import nn

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    class _Attention(nn.Module):
        def __init__(self, dim: int, num_heads: int, qkv_bias: bool) -> None:
            super().__init__()
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.scale = self.head_dim**-0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.proj = nn.Linear(dim, dim)

        def forward(self, x: "torch.Tensor") -> "torch.Tensor":
            b, l, d = x.shape
            qkv = self.qkv(x).reshape(b, l, 3, self.num_heads, self.head_dim)
            q, k, v = qkv.permute(2, 0, 3, 1, 4)  # (3, B, H, L, hd)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = attn.softmax(dim=-1)
            out = (attn @ v).transpose(1, 2).reshape(b, l, d)
            return self.proj(out)

    class _Mlp(nn.Module):
        def __init__(self, dim: int, hidden: int) -> None:
            super().__init__()
            self.fc1 = nn.Linear(dim, hidden)
            self.act = nn.GELU()
            self.fc2 = nn.Linear(hidden, dim)

        def forward(self, x: "torch.Tensor") -> "torch.Tensor":
            return self.fc2(self.act(self.fc1(x)))

    class Block(nn.Module):
        """Pre-norm transformer block with timm's parameter naming."""

        def __init__(
            self,
            dim: int,
            num_heads: int,
            mlp_ratio: float = 4.0,
            qkv_bias: bool = False,
            norm_layer=nn.LayerNorm,
            **_: object,
        ) -> None:
            super().__init__()
            self.norm1 = norm_layer(dim)
            self.attn = _Attention(dim, num_heads, qkv_bias)
            self.norm2 = norm_layer(dim)
            self.mlp = _Mlp(dim, int(dim * mlp_ratio))

        def forward(self, x: "torch.Tensor") -> "torch.Tensor":
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    vit = types.ModuleType("timm.models.vision_transformer")
    layers.to_2tuple = to_2tuple
    vit.Block = Block
    timm.models = models
    models.layers = layers
    models.vision_transformer = vit
    sys.modules.update(
        {
            "timm": timm,
            "timm.models": models,
            "timm.models.layers": layers,
            "timm.models.vision_transformer": vit,
        }
    )


def _install_src_alias() -> None:
    if "src" in sys.modules:
        return
    src_pkg = types.ModuleType("src")
    src_pkg.__path__ = [str(REFERENCE_ROOT / "src")]
    sys.modules["src"] = src_pkg


def load_reference_modules() -> dict:
    """Returns {name: module} for the reference model modules."""
    _install_timm_shim()
    _install_src_alias()
    ref_src = str(REFERENCE_ROOT / "src")
    if ref_src not in sys.path:
        sys.path.insert(0, ref_src)
    import importlib

    return {
        "efficientnet_unet": importlib.import_module("modules.efficientnet_unet"),
        "prithvi": importlib.import_module("modules.prithvi"),
        "prithvi_segmentation": importlib.import_module("modules.prithvi_segmentation"),
    }
