#!/usr/bin/env python
"""Export a trained checkpoint to a portable serving artifact.

TPU-native deployment path with no reference counterpart (the reference
re-loads Lightning checkpoints into the full training stack to predict,
experiments.ipynb cell 4): ``jax.export`` lowers the jitted inference
function — weights baked in — to serialized StableHLO that a bare JAX
runtime executes on any platform it was lowered for.

  python scripts/export_model.py -c logs/<run>/checkpoints -o artifact/
  python scripts/export_model.py -c ... -o ... --platforms tpu --batch-size 256

Smoke-load it back:

  python scripts/export_model.py --load artifact/
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-c", "--checkpoint", help="checkpoint directory")
    p.add_argument("-o", "--output", help="artifact output directory")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="comma-separated lowering platforms (default cpu,tpu)")
    p.add_argument("--batch-size", type=int, default=None,
                   help="pin the batch dimension (default: symbolic — one "
                        "artifact serves any batch size)")
    p.add_argument("--keep-fused", action="store_true",
                   help="keep Pallas-kernel card flags (artifact then only "
                        "runs on the same TPU/Mosaic runtime version)")
    p.add_argument("--gallery", metavar="EMB_PKL",
                   help="embeddings pickle (scripts/encode.py output): bake "
                        "its fused gallery into the artifact and export the "
                        "end-to-end retrieval classifier (pair in -> "
                        "weighted-kNN class out) instead of the raw encoder")
    p.add_argument("--name", help="model name inside the gallery pickle")
    p.add_argument("--fold", type=int, help="fold inside the gallery pickle")
    p.add_argument("-k", type=int, default=9,
                   help="neighbors per modality for --gallery (default 9, "
                        "the reference's best k)")
    p.add_argument("--load", metavar="DIR",
                   help="load an artifact and print its metadata instead of "
                        "exporting")
    args = p.parse_args()

    from multimodal_plankton_recognition_tpu.retrieval import export as ex

    if args.load:
        m = ex.load_artifact(args.load)
        import json
        print(json.dumps(m.meta, indent=2))
        return
    if not args.checkpoint or not args.output:
        p.error("-c/--checkpoint and -o/--output are required for export")
    platforms = [s.strip() for s in args.platforms.split(",") if s.strip()]
    if args.gallery:
        out = ex.export_retrieval_checkpoint(
            args.checkpoint, args.gallery, args.output, name=args.name,
            fold=args.fold, k=args.k, platforms=platforms,
            batch_size=args.batch_size, keep_fused=args.keep_fused)
    else:
        out = ex.export_checkpoint(
            args.checkpoint, args.output, platforms=platforms,
            batch_size=args.batch_size, keep_fused=args.keep_fused)
    print(f"Exported serving artifact -> {out}")


if __name__ == "__main__":
    main()
