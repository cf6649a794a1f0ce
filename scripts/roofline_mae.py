"""Analytic v5e roofline for the Prithvi-100M MAE pretrain step.

Config: ViT-B encoder (12x768) over L_keep=49+cls=50 tokens (mask 0.75 of
196 patches), 8x512 decoder over all 197 tokens, bs=64, 224² crops, bf16
(reference workload: train_mae_prithvi.py:206-242 at the published
prithvi_config.yaml dims). Walks every matmul in the step and lower-bounds
train time by max(MXU, HBM) under two regimes:

  ideal  — no padding: flops = 2·M·K·N, three passes (fwd, dgrad, wgrad;
           attention matmuls likewise pay 1 fwd + 2 bwd sides).
  padded — MXU tile reality: every matmul dim rounds up to 128 (the v5e
           systolic array tile). This is what makes the masked encoder
           expensive per FLOP: L=50 rows pad 2.56x, and per-head attention
           matmuls (50x64x50 / 197x32x197) pad 4-13x.

Elementwise (LN/GELU/residual/loss) and optimizer traffic are counted as
HBM passes. No fusion losses, no copies, no scheduling gaps — true lower
bounds. Peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PEAK_FLOPS = 197e12
PEAK_BW = 819e9
BYTES = 2  # bf16

B = 64
PATCHES = 196  # 14x14, T=1
MASK = 0.75
L_ENC = int(PATCHES * (1 - MASK)) + 1  # 49 kept + cls = 50
L_DEC = PATCHES + 1  # 197
D, DEPTH, HEADS = 768, 12, 12
DD, DDEPTH, DHEADS = 512, 8, 16
MLP = 4
PATCH_DIM = 16 * 16 * 6  # 1536


def pad(n: int, tile: int = 128) -> int:
    return -(-n // tile) * tile


def matmul(m: int, k: int, n: int, passes: int = 3, batch: int = 1):
    """(flops, flops_padded, bytes, bytes_padded) for a (possibly batched)
    dense matmul over `passes` compute passes (fwd + dgrad + wgrad = 3;
    attention score/AV matmuls also have 3 sides: fwd + two input grads)."""
    f1 = 2 * batch * m * k * n
    fp1 = 2 * batch * pad(m) * pad(k) * pad(n)
    # per pass: read x (M,K) + w (K,N), write y (M,N) (dgrad/wgrad read/write
    # the same three tensors in different roles)
    x, w_, y = batch * m * k * BYTES, batch * k * n * BYTES, batch * m * n * BYTES
    by = (x + w_ + y) * passes
    return f1 * passes, fp1 * passes, by, by


def elementwise(numel: int, passes: float):
    t = numel * BYTES * passes
    return 0.0, 0.0, t, t


def main() -> None:
    rows = []

    def add(name, group, costs):
        rows.append((name, group, *costs))

    # patch embed: (B*196, 1536) x (1536, 768)
    add("patch_proj", "embed", matmul(B * PATCHES, PATCH_DIM, D))
    # encoder blocks at L=50
    for what, m, k, n, batch in (
        ("qkv", B * L_ENC, D, 3 * D, 1),
        ("attn qk^T", L_ENC, D // HEADS, L_ENC, B * HEADS),
        ("attn av", L_ENC, L_ENC, D // HEADS, B * HEADS),
        ("proj", B * L_ENC, D, D, 1),
        ("mlp fc1", B * L_ENC, D, MLP * D, 1),
        ("mlp fc2", B * L_ENC, MLP * D, D, 1),
    ):
        f, fp, by, byp = matmul(m, k, n, batch=batch)
        add(f"enc {what} x{DEPTH}", "encoder", (f * DEPTH, fp * DEPTH, by * DEPTH, byp * DEPTH))
    # LN x2, residual x2, gelu, softmax: ~10 fwd+bwd passes over (B, L, D)
    add("enc elementwise", "encoder", elementwise(B * L_ENC * D, 10 * DEPTH))

    add("decoder_embed", "embed", matmul(B * L_ENC, D, DD))
    for what, m, k, n, batch in (
        ("qkv", B * L_DEC, DD, 3 * DD, 1),
        ("attn qk^T", L_DEC, DD // DHEADS, L_DEC, B * DHEADS),
        ("attn av", L_DEC, L_DEC, DD // DHEADS, B * DHEADS),
        ("proj", B * L_DEC, DD, DD, 1),
        ("mlp fc1", B * L_DEC, DD, MLP * DD, 1),
        ("mlp fc2", B * L_DEC, MLP * DD, DD, 1),
    ):
        f, fp, by, byp = matmul(m, k, n, batch=batch)
        add(f"dec {what} x{DDEPTH}", "decoder", (f * DDEPTH, fp * DDEPTH, by * DDEPTH, byp * DDEPTH))
    add("dec elementwise", "decoder", elementwise(B * L_DEC * DD, 10 * DDEPTH))

    add("decoder_pred", "embed", matmul(B * L_DEC, DD, PATCH_DIM))
    # loss: read pred + target + mask, few passes
    add("mae loss", "other", elementwise(B * PATCHES * PATCH_DIM, 4))
    # normalize + patchify input: int16 read + bf16 write
    add("input/augment", "other", elementwise(B * 224 * 224 * 6, 3))
    # Adam over ~112M f32 params: read g,m,v,p write m,v,p = 7 passes x 4B
    n_params = 112e6
    add("adam update", "other", (0, 0, 7 * n_params * 4, 7 * n_params * 4))
    # weights traffic is inside matmul(); masking gather/scatter:
    add("mask shuffle/unshuffle", "other", elementwise(B * PATCHES * DD, 4))

    groups = {}
    tot_i = tot_p = 0.0
    for name, group, f, fp, by, byp in rows:
        t_i = max(f / PEAK_FLOPS, by / PEAK_BW)
        t_p = max(fp / PEAK_FLOPS, byp / PEAK_BW)
        tot_i += t_i
        tot_p += t_p
        g = groups.setdefault(group, [0.0, 0.0])
        g[0] += t_i
        g[1] += t_p
    print(f"{'component':>12} {'ideal ms':>9} {'padded ms':>10}")
    for g, (ti, tp) in groups.items():
        print(f"{g:>12} {ti*1e3:9.2f} {tp*1e3:10.2f}")
    print(f"{'TOTAL':>12} {tot_i*1e3:9.2f} {tot_p*1e3:10.2f}")
    print(f"\nimg/s bounds: ideal {B/tot_i:.0f}, padded-tile {B/tot_p:.0f}")
    flops_total = sum(r[2] for r in rows)
    print(f"model train flops/step: {flops_total/1e12:.2f} TF "
          f"(MFU at padded bound: {flops_total/tot_p/PEAK_FLOPS:.3f})")

    print("\nper-row padded detail (top 10 by padded time):")
    det = sorted(rows, key=lambda r: -max(r[3] / PEAK_FLOPS, r[5] / PEAK_BW))[:10]
    for name, group, f, fp, by, byp in det:
        t_p = max(fp / PEAK_FLOPS, byp / PEAK_BW)
        bound = "mxu" if fp / PEAK_FLOPS > byp / PEAK_BW else "hbm"
        print(f"  {name:>28} {t_p*1e3:7.3f} ms ({bound})")


if __name__ == "__main__":
    main()
