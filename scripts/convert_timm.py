#!/usr/bin/env python3
"""Convert timm/torch pretrained weights to the Flax npz format.

The reference hard-codes ImageNet initialization via timm (reference:
src/image_encoder.py:16-17); this produces the npz that makes
``pretrained: true, pretrained_path: <out.npz>`` in a model card restore
the full backbone here.

Usage:
    python scripts/convert_timm.py -a efficientnet_b0 \
        -i efficientnet_b0.safetensors -o b0_imagenet.npz [--in-chans 1]

    python scripts/convert_timm.py --selftest [-a ARCH]

Input: a ``.safetensors`` file (e.g. downloaded from the timm hub) or a
``torch.save`` checkpoint holding the backbone state_dict.

``--selftest`` (run it wherever timm IS installed — this environment has
none, so the offline direction pins live in tests/test_convert_timm.py):
for each architecture, creates the timm model, converts its state_dict,
loads it into the from-scratch Flax backbone, and asserts full forward
parity on a shared random input — the end-to-end proof that the converted
layout is numerically right, not just shape-complete.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

from multimodal_plankton_recognition_tpu.models.convert_timm import (
    ARCH_SPECS, convert_state_dict, convert_to_npz,
)


def _unflatten(flat):
    tree = {}
    for k, v in flat.items():
        parts = k.split("/")
        d = tree
        for part in parts[:-1]:
            d = d.setdefault(part, {})
        d[parts[-1]] = v
    return tree


def selftest(archs) -> int:
    try:
        import timm
        import torch
    except ImportError as e:
        print(f"selftest: {e} — run this where timm is installed "
              f"(offline direction pins: tests/test_convert_timm.py)")
        return 2
    import jax
    from multimodal_plankton_recognition_tpu.models.image.registry import (
        create_backbone,
    )

    failures = 0
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
    for arch in archs:
        with torch.no_grad():
            m = timm.create_model(arch, pretrained=False, num_classes=0,
                                  in_chans=3).eval()
            ref = m(torch.from_numpy(
                x.transpose(0, 3, 1, 2))).numpy()
        sd = {k: v.numpy() for k, v in m.state_dict().items()}
        params, stats, missing = convert_state_dict(arch, sd, in_chans=3)
        if missing:
            print(f"FAIL {arch}: {len(missing)} unmapped keys "
                  f"{missing[:4]}")
            failures += 1
            continue
        enc = create_backbone(arch, in_chans=3)
        variables = {"params": _unflatten(params)}
        if stats:
            variables["batch_stats"] = _unflatten(stats)
        out = np.asarray(jax.jit(
            lambda v, x: enc.apply(v, x, train=False))(variables, x))
        err = float(np.max(np.abs(out - ref)))
        scale = float(np.max(np.abs(ref))) or 1.0
        ok = err / scale < 5e-3
        print(f"{'PASS' if ok else 'FAIL'} {arch}: max|Δ| {err:.3e} "
              f"(rel {err / scale:.2e}) over {out.shape}")
        failures += 0 if ok else 1
    return 1 if failures else 0


def from_hub(arch: str, output: str, in_chans: int, prefix: str) -> int:
    """One-command pretrained-weight production on a timm-enabled host:
    download the ImageNet weights through timm, verify the converted Flax
    backbone's forward parity against the timm model at 3 channels, then
    write the in_chans-adapted npz. (This environment has no timm and no
    egress — the offline conversion direction is pinned by
    tests/test_convert_timm.py and tests/golden/convert_fixture.npz.)"""
    try:
        import timm
        import torch
    except ImportError as e:
        print(f"--from-hub: {e} — run this where timm is installed, e.g.\n"
              f"  pip install timm && python scripts/convert_timm.py "
              f"--from-hub -a {arch} -o {output}")
        return 2
    import jax
    from multimodal_plankton_recognition_tpu.models.image.registry import (
        create_backbone,
    )

    with torch.no_grad():
        m = timm.create_model(arch, pretrained=True, num_classes=0,
                              in_chans=3).eval()
        rng = np.random.default_rng(0)
        x = rng.standard_normal((2, 224, 224, 3)).astype(np.float32)
        ref = m(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    sd = {k: v.numpy() for k, v in m.state_dict().items()}
    params, stats, missing = convert_state_dict(arch, sd, in_chans=3)
    if missing:
        print(f"FAIL: {len(missing)} unmapped keys {missing[:4]}")
        return 1
    enc = create_backbone(arch, in_chans=3)
    variables = {"params": _unflatten(params)}
    if stats:
        variables["batch_stats"] = _unflatten(stats)
    out = np.asarray(jax.jit(
        lambda v, x: enc.apply(v, x, train=False))(variables, x))
    err = float(np.max(np.abs(out - ref)))
    scale = float(np.max(np.abs(ref))) or 1.0
    if err / scale >= 5e-3:
        print(f"FAIL: forward parity {err:.3e} (rel {err / scale:.2e})")
        return 1
    print(f"parity OK: max|Δ| {err:.3e} (rel {err / scale:.2e})")
    # write the requested-channel adaptation (stem kernels summed the timm
    # way inside convert_state_dict)
    import tempfile

    import torch as _torch
    with tempfile.NamedTemporaryFile(suffix=".pth") as tmp:
        _torch.save(m.state_dict(), tmp.name)
        counts = convert_to_npz(arch, tmp.name, output,
                                in_chans=in_chans, prefix=prefix)
    print(f"wrote {output}: {counts['params']} params + "
          f"{counts['batch_stats']} batch_stats arrays (in_chans="
          f"{in_chans})")
    return 0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-a", "--arch", choices=sorted(ARCH_SPECS),
                   help="Backbone architecture (timm model name).")
    p.add_argument("-i", "--input",
                   help="Path to .safetensors or torch .pth/.bin weights.")
    p.add_argument("-o", "--output", help="Output .npz path.")
    p.add_argument("--in-chans", type=int, default=1,
                   help="Model input channels (stem kernels adapted the "
                        "timm way; default 1 = grayscale).")
    p.add_argument("--prefix", default="image_encoder/backbone",
                   help="Flax path prefix of the backbone inside the model "
                        "(default matches MultiModel and ImageModel).")
    p.add_argument("--selftest", action="store_true",
                   help="Forward-parity check of every arch spec against "
                        "timm itself (requires timm; see module docstring).")
    p.add_argument("--from-hub", action="store_true",
                   help="One-command recipe on a timm-enabled host: create "
                        "the pretrained timm model for -a (downloading the "
                        "ImageNet weights), convert its state_dict, verify "
                        "forward parity against timm, write -o.")
    args = p.parse_args()
    if args.selftest:
        sys.exit(selftest([args.arch] if args.arch
                          else sorted(ARCH_SPECS)))
    if args.from_hub:
        if not (args.arch and args.output):
            p.error("--from-hub needs -a and -o")
        sys.exit(from_hub(args.arch, args.output, args.in_chans,
                          args.prefix))
    if not (args.arch and args.input and args.output):
        p.error("-a, -i and -o are required unless --selftest/--from-hub")
    counts = convert_to_npz(args.arch, args.input, args.output,
                            in_chans=args.in_chans, prefix=args.prefix)
    print(f"wrote {args.output}: {counts['params']} params + "
          f"{counts['batch_stats']} batch_stats arrays")


if __name__ == "__main__":
    main()
