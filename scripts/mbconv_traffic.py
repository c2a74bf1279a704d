#!/usr/bin/env python3
"""Per-block HBM-traffic budget for the B0 flagship: structural minimum
vs XLA-measured (VERDICT r3 #1 — the >=5x/chip north-star adjudication).

For every MBConv block shape in the flagship's EfficientNet-B0 (plus the
stem/head), this prints:

* **min** — the structural minimum HBM bytes for train-mode fwd+bwd under
  the reference's BatchNorm semantics (reference: timm efficientnet_b0 via
  src/image_encoder.py:16): each batch-global BN forces its input tensor
  to be materialized (stats are a full-batch reduction, so the normalized
  tensor cannot be produced in the same pass that generates its input
  without recompute — and recompute re-reads the block input instead, see
  the gen-1 kernel post-mortem in docs/PERF.md). The budget assumes
  PERFECT fusion everywhere else: stats ride the producing pass, BN-apply
  + SiLU + SE scaling ride the consuming pass, every tensor is written
  once and read once per consumer, bf16 everywhere.
* **xla** — what the compiled XLA fwd+bwd actually accesses
  (``compile().cost_analysis()['bytes accessed']``), same protocol the
  bench uses.

The verdict this script supports: if xla/min is close to 1 across blocks,
there is no kernel-side traffic to recover — the per-chip ceiling is the
bandwidth roofline of the architecture itself, and the remaining scaling
axis is chips (data parallelism).

Usage: python scripts/mbconv_traffic.py [--bs 256]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

import jax
import jax.numpy as jnp

# the full B0 MBConv geometry at 224 px: (H_in, W_in, Cin, mid, Cout,
# kernel, stride, has_expand, count). Matches
# multimodal_plankton_recognition_tpu/models/image/efficientnet.py:21-29
# (architecture-defined, unavoidable similarity with any B0).
BLOCKS = [
    ("stage1", 112, 112, 32, 32, 16, 3, 1, False, 1),
    ("stage2a", 112, 112, 16, 96, 24, 3, 2, True, 1),
    ("stage2b", 56, 56, 24, 144, 24, 3, 1, True, 1),
    ("stage3a", 56, 56, 24, 144, 40, 5, 2, True, 1),
    ("stage3b", 28, 28, 40, 240, 40, 5, 1, True, 1),
    ("stage4a", 28, 28, 40, 240, 80, 3, 2, True, 1),
    ("stage4b", 14, 14, 80, 480, 80, 3, 1, True, 2),
    ("stage5a", 14, 14, 80, 480, 112, 5, 1, True, 1),
    ("stage5b", 14, 14, 112, 672, 112, 5, 1, True, 2),
    ("stage6a", 14, 14, 112, 672, 192, 5, 2, True, 1),
    ("stage6b", 7, 7, 192, 1152, 192, 5, 1, True, 3),
    ("stage7", 7, 7, 192, 1152, 320, 3, 1, True, 1),
]

BYTES = 2  # bf16


def min_traffic_per_sample(h, w, cin, mid, cout, stride, has_expand):
    """Structural minimum fwd+bwd HBM bytes per sample for one train-mode
    MBConv block under batch-global BN, assuming perfect fusion (see
    module docstring). Tensors: x (input), y1 (expanded, pre-BN1), y2
    (depthwise out, pre-BN2), y3 (block out)."""
    hw_in = h * w
    hw_out = (h // stride) * (w // stride)
    residual = stride == 1 and cin == cout

    fwd = hw_in * cin                 # read x (expand or dw input)
    if has_expand:
        fwd += hw_in * mid            # write y1 (BN1 stats fused here)
        fwd += hw_in * mid            # read y1 (BN1-apply+SiLU fused into dw)
    fwd += hw_out * mid               # write y2 (BN2 stats + SE squeeze fused)
    fwd += hw_out * mid               # read y2 (BN2+SiLU+SE scale fused into projection)
    fwd += hw_out * cout              # write y3
    if residual:
        fwd += hw_in * cin            # re-read x for the residual add

    # backward: chain dy3 -> dproj/dy2 -> ddw/dy1 -> dexp/dx; each saved
    # tensor re-read once, each intermediate cotangent written+read once
    bwd = hw_out * cout               # read dy3
    bwd += hw_out * mid               # read y2 (projection + BN2/SE backward)
    bwd += 2 * hw_out * mid           # write + read dy2
    if has_expand:
        bwd += hw_in * mid            # read y1 (dw + BN1 backward)
        bwd += 2 * hw_in * mid        # write + read dy1
    bwd += hw_in * cin                # read x (expand weight grad)
    bwd += hw_in * cin                # write dx
    return (fwd + bwd) * BYTES


def xla_traffic(h, w, cin, mid, cout, k, stride, has_expand, bs):
    """XLA-compiled fwd+bwd bytes accessed for one block at batch ``bs``,
    through the same flax module composition the flagship runs."""
    import flax.linen as nn

    from multimodal_plankton_recognition_tpu.models.image.efficientnet import (
        _MBConv,
    )

    assert mid % cin == 0 and (mid // cin > 1) == has_expand
    block = _MBConv(in_ch=cin, out_ch=cout, expand_ratio=mid // cin,
                    stride=stride, kernel=k, se_ratio=0.25,
                    dtype=jnp.bfloat16)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(bs, h, w, cin), jnp.bfloat16)
    variables = block.init(jax.random.key(0), x, train=False)

    def loss(params, x):
        y, _ = block.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"])
        return jnp.sum(y.astype(jnp.float32))

    fn = jax.jit(jax.grad(loss, argnums=(0, 1)))
    compiled = fn.lower(variables["params"], x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return float(ca["bytes accessed"]), float(ca["flops"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=256)
    args = ap.parse_args()

    print(f"== B0 MBConv per-block HBM traffic, fwd+bwd, bs={args.bs} ==")
    print(f"{'block':>9} {'xN':>3} {'min MB/pair':>12} {'xla MB/pair':>12} "
          f"{'xla/min':>8}")
    tot_min = tot_xla = 0.0
    for (name, h, w, cin, mid, cout, k, stride, has_expand,
         count) in BLOCKS:
        mn = min_traffic_per_sample(h, w, cin, mid, cout, stride,
                                    has_expand) * count
        xla_b, _ = xla_traffic(h, w, cin, mid, cout, k, stride, has_expand,
                               args.bs)
        xla = xla_b / args.bs * count
        tot_min += mn
        tot_xla += xla
        print(f"{name:>9} {count:>3} {mn / 1e6:>12.2f} {xla / 1e6:>12.2f} "
              f"{xla / mn:>8.2f}")
    print(f"{'TOTAL':>9} {'':>3} {tot_min / 1e6:>12.2f} "
          f"{tot_xla / 1e6:>12.2f} {tot_xla / tot_min:>8.2f}")
    v5e_bw = 819e9
    print(f"\nbandwidth floor at {v5e_bw / 1e9:.0f} GB/s: "
          f"min {tot_min * args.bs / v5e_bw * 1e3:.1f} ms/step/{args.bs} "
          f"(= {v5e_bw / tot_min:,.0f} pairs/s ideal), "
          f"xla {tot_xla * args.bs / v5e_bw * 1e3:.1f} ms "
          f"(= {v5e_bw / tot_xla:,.0f} pairs/s)")
    print("(B0 blocks only — stem/head/profile-encoder/loss traffic is "
          "additive on top)")


if __name__ == "__main__":
    main()
