"""Analytic v5e roofline for the B5-UNet train step (bs=32, 224², bf16).

Walks the actual model structure (build_block_specs — the same tables the
model is built from) and lower-bounds each layer's train-step time by
max(MXU time, HBM time) under two layout regimes:

  ideal   — no padding anywhere: bytes = real bytes, MXU fully utilized.
  padded  — channels-last reality: the last dim pads to 128 lanes for both
            memory tiles and MXU output columns (what XLA does today).

Per layer the train step pays ~3 compute passes (fwd, data-grad,
filter-grad) and the associated activation traffic; BN adds one
read-modify-write plus two reduction reads in backward. These are lower
bounds — no fusion inefficiency, no copies, no scheduling gaps.

Peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM (v5e datasheet numbers).
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from s2tpu.models.efficientnet_unet import SCALING, build_block_specs, round_filters

PEAK_FLOPS = 197e12
PEAK_BW = 819e9
import os
B = int(os.environ.get("ROOFLINE_BATCH", "32"))  # per-image bounds are batch-linear; see PERF_NOTES r5
IN_RES = 224
BYTES = 2  # bf16 activations


def pad128(c: int) -> int:
    return ((c + 127) // 128) * 128


def conv_cost(res: int, cin: int, cout: int, k: int, stride: int = 1, groups: int = 1):
    """Returns (flops, flops_padded, bytes, bytes_padded) for fwd+bwd."""
    out_res = res // stride
    # 3 matmul passes (fwd, dgrad, wgrad), each ~same FLOPs
    flops1 = 2 * B * out_res * out_res * (k * k * cin // groups) * cout
    flops = 3 * flops1
    # padded MXU: output columns pad to 128 (fwd/dgrad); wgrad output is the
    # kernel (small) — approximate all three with the worse of cout/cin pads
    if groups == 1:
        eff_f = pad128(cout) / cout
        eff_b = pad128(cin) / cin
        flops_p = flops1 * eff_f + flops1 * eff_b + flops1 * max(eff_f, eff_b)
    else:
        flops_p = flops  # depthwise is bandwidth-bound; MXU padding not binding
    x_bytes = B * res * res * cin * BYTES
    y_bytes = B * out_res * out_res * cout * BYTES
    w_bytes = (k * k * cin // groups) * cout * BYTES
    # fwd: read x, write y. dgrad: read dy, write dx. wgrad: read x, dy.
    bytes_ = 2 * x_bytes + 2 * y_bytes + (x_bytes + y_bytes) + 3 * w_bytes
    pad_x = pad128(cin) / cin
    pad_y = pad128(cout) / cout
    bytes_p = (2 * x_bytes + x_bytes) * pad_x + (2 * y_bytes + y_bytes) * pad_y + 3 * w_bytes
    return flops, flops_p, bytes_, bytes_p


def bn_act_cost(res: int, c: int):
    """BN + activation train cost: fwd RMW pass + bwd (read x, dy; write dx;
    two reductions read x·dy). ~5 passes over the tensor."""
    t = B * res * res * c * BYTES
    bytes_ = 5 * t
    return 0.0, 0.0, bytes_, bytes_ * pad128(c) / c


def main() -> None:
    w, d, _, _ = SCALING["b5"]
    specs = build_block_specs(w, d)
    rows = []

    def add(name, res, costs):
        rows.append((name, res, *costs))

    stem_out = round_filters(32, w)
    add("stem conv", 224, conv_cost(224, 6, stem_out, 3, stride=2))
    add("stem bn+act", 112, bn_act_cost(112, stem_out))

    res = 112
    for i, s in enumerate(specs):
        mid = s.in_filters * s.expand_ratio
        if s.expand_ratio != 1:
            add(f"b{i} expand", res, conv_cost(res, s.in_filters, mid, 1))
            add(f"b{i} expand bn+act", res, bn_act_cost(res, mid))
        out_res = res // s.stride
        add(f"b{i} dw k{s.kernel_size}", res, conv_cost(res, mid, mid, s.kernel_size, s.stride, groups=mid))
        add(f"b{i} dw bn+act", out_res, bn_act_cost(out_res, mid))
        # SE is tiny (1x1 on pooled vector) — skip
        add(f"b{i} project", out_res, conv_cost(out_res, mid, s.out_filters, 1))
        add(f"b{i} project bn", out_res, bn_act_cost(out_res, s.out_filters))
        res = out_res

    head = round_filters(1280, w)
    add("head conv", 7, conv_cost(7, specs[-1].out_filters, head, 1))
    add("head bn+act", 7, bn_act_cost(7, head))

    # decoder: skip widths for b5 (from skip_filters logic)
    skips = []
    r, red = 112, 2
    widths = []
    for i, s in enumerate(specs):
        if s.stride == 2:
            red *= 2
        if (s.stride == 2 or i == 0) and red < 32:
            widths.append(s.out_filters)
    skips = list(reversed(widths))  # deepest first
    y_in, resd = head, 7
    for i, feats in enumerate([512, 256, 128, 64]):
        add(f"up_conv{i}", resd, conv_cost(resd, y_in, feats, 2))  # convT ~ same cost
        resd *= 2
        cat = feats + skips[i]
        add(f"double_conv{i} a", resd, conv_cost(resd, cat, feats, 3))
        add(f"double_conv{i} a bn+act", resd, bn_act_cost(resd, feats))
        add(f"double_conv{i} b", resd, conv_cost(resd, feats, feats, 3))
        add(f"double_conv{i} b bn+act", resd, bn_act_cost(resd, feats))
        y_in = feats

    # packed input stage: operates at 112² with 4C channels (no lane waste,
    # 4x structural FLOPs in the 3x3 convs)
    f, fp, by, byp = conv_cost(112, 64, 128, 1)  # up as per-phase dense
    add("input up (packed dense)", 112, (f, fp, by, byp))
    for name, cin, cout in (("input dc a (packed)", 152, 128), ("input dc b (packed)", 128, 128)):
        add(name, 112, conv_cost(112, cin, cout, 3))
    add("input dc bn+act x2 (packed)", 112, tuple(2 * v for v in bn_act_cost(112, 128)))
    add("classifier (packed dense)", 112, conv_cost(112, 128, 16, 1))

    # optimizer: params ~30M f32: read p,m,v,g; write p,m,v  (7 x 4B)
    n_params = 30e6
    add("adam update", 0, (0, 0, 7 * n_params * 4, 7 * n_params * 4))
    # input normalize: int16 read + bf16 write
    add("normalize", 224, (0, 0, B * 224 * 224 * 6 * 4, B * 224 * 224 * 6 * (2 + 2 * 128 / 6) / 2))

    tot_ideal = tot_pad = 0.0
    tier = {}
    for name, res, f, fp, by, byp in rows:
        t_ideal = max(f / PEAK_FLOPS, by / PEAK_BW)
        t_pad = max(fp / PEAK_FLOPS, byp / PEAK_BW)
        tot_ideal += t_ideal
        tot_pad += t_pad
        tier.setdefault(res, [0.0, 0.0])
        tier[res][0] += t_ideal
        tier[res][1] += t_pad
    print(f"{'resolution tier':>16} {'ideal ms':>9} {'padded ms':>10}")
    for res in sorted(tier, reverse=True):
        print(f"{res:>16} {tier[res][0]*1e3:9.2f} {tier[res][1]*1e3:10.2f}")
    print(f"{'TOTAL':>16} {tot_ideal*1e3:9.2f} {tot_pad*1e3:10.2f}")
    print(f"\nimg/s bounds: ideal {B/tot_ideal:.0f}, padded-layout {B/tot_pad:.0f}")
    print("measured: 62.4 ms/step = 513 img/s (82% of the padded-layout bound)")


if __name__ == "__main__":
    main()
