#!/usr/bin/env python3
"""Convert timm/torch pretrained weights to the Flax npz format.

The reference hard-codes ImageNet initialization via timm (reference:
src/image_encoder.py:16-17); this produces the npz that makes
``pretrained: true, pretrained_path: <out.npz>`` in a model card restore
the full backbone here.

Usage:
    python scripts/convert_timm.py -a efficientnet_b0 \
        -i efficientnet_b0.safetensors -o b0_imagenet.npz [--in-chans 1]

Input: a ``.safetensors`` file (e.g. downloaded from the timm hub) or a
``torch.save`` checkpoint holding the backbone state_dict.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from multimodal_plankton_recognition_tpu.models.convert_timm import (
    ARCH_SPECS, convert_to_npz,
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("-a", "--arch", required=True, choices=sorted(ARCH_SPECS),
                   help="Backbone architecture (timm model name).")
    p.add_argument("-i", "--input", required=True,
                   help="Path to .safetensors or torch .pth/.bin weights.")
    p.add_argument("-o", "--output", required=True, help="Output .npz path.")
    p.add_argument("--in-chans", type=int, default=1,
                   help="Model input channels (stem kernels adapted the "
                        "timm way; default 1 = grayscale).")
    p.add_argument("--prefix", default="image_encoder/backbone",
                   help="Flax path prefix of the backbone inside the model "
                        "(default matches MultiModel and ImageModel).")
    args = p.parse_args()
    counts = convert_to_npz(args.arch, args.input, args.output,
                            in_chans=args.in_chans, prefix=args.prefix)
    print(f"wrote {args.output}: {counts['params']} params + "
          f"{counts['batch_stats']} batch_stats arrays")


if __name__ == "__main__":
    main()
