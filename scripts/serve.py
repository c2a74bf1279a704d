#!/usr/bin/env python
"""Batch inference with a serving artifact (scripts/export_model.py output).

Loads a serialized StableHLO artifact and runs it over an annotations CSV
through the standard eval input pipeline — the deployment-side complement
of the export CLI (no checkpoint, card, or training stack needed beyond
the data transforms):

  # retrieval-classifier artifact -> per-sample class predictions
  python scripts/serve.py -a artifact/ -d data/fold1/test.csv -o pred.csv

  # encoder artifact -> embeddings pickle (flat layout, like encode.py)
  python scripts/serve.py -a artifact/ -d data/fold1/test.csv -o emb.pkl

Output format follows the artifact kind: ``retrieval`` and classifier
kinds write a CSV with columns ``image, profile, true, pred`` (+ a
printed accuracy when true labels are present); ``multi`` writes the
encode-CLI pickle layout ``{name: {fold: {image, profile, label,
classes}}}``.
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _batches(dataset, collate, batch_size):
    buf = []
    for i in range(len(dataset)):
        buf.append(dataset[i])
        if len(buf) == batch_size:
            yield collate(buf)
            buf = []
    if buf:
        yield collate(buf)


def main() -> None:
    import numpy as np

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-a", "--artifact", required=True,
                   help="serving artifact directory")
    p.add_argument("-d", "--data", required=True,
                   help="annotations/split CSV to classify or embed")
    p.add_argument("-o", "--output", required=True,
                   help="predictions CSV (classifier kinds) or embeddings "
                        "pickle (multi)")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--name", default="serve",
                   help="model name key for the embeddings pickle layout")
    p.add_argument("--fold", type=int, default=1)
    args = p.parse_args()

    from multimodal_plankton_recognition_tpu.config import ModelCard
    from multimodal_plankton_recognition_tpu.data import (
        MultiSet, ImageTransformTest, ProfileTransformTest, tokenize,
    )
    from multimodal_plankton_recognition_tpu.data.pipeline import (
        multi_collate_fn,
    )
    from multimodal_plankton_recognition_tpu.data.transforms import (
        ImageTransforms, ProfileTransform,
    )
    from multimodal_plankton_recognition_tpu.retrieval.export import (
        load_artifact,
    )

    serving = load_artifact(args.artifact)
    kind = serving.meta["kind"]
    card = ModelCard.from_dict(serving.meta["card"])
    ts = card.target_size
    enc_kind = (card.profile_encoder_args or {}).get("kind", "cnn")
    # transforms per artifact kind, mirroring the training-side pipelines
    # (retrieval/encode.py _encode_csv and predict_classifier)
    if kind in ("multi", "retrieval"):
        image_tf, profile_tf = (ImageTransformTest(ts),
                                ProfileTransformTest(ts))
        pad_to = ts + 1 if enc_kind == "transformer" else ts
        tok_len = ts
    else:  # supervised classifiers use the raw canonicalizing transforms
        max_len = card.max_len or 256
        image_tf = ImageTransforms(target_size=ts)
        profile_tf = ProfileTransform(max_len=max_len if kind == "profile"
                                      else None)
        if kind == "profile":
            pad_to = max_len + 1 if enc_kind == "transformer" else max_len
        else:  # profiles unused by the image artifact: auto-pad, no cap
            pad_to = None
        tok_len = max_len
    dataset = MultiSet(args.data, image_tf, profile_tf)
    collate = multi_collate_fn(tokenize.get_tokenizer(enc_kind, tok_len,
                                                      pad_to=pad_to))
    wanted = set(serving.meta["input_spec"])

    outs = []
    for batch in _batches(dataset, collate, args.batch_size):
        outs.append(serving.call(
            {k: v for k, v in batch.items() if k in wanted}))

    table = dataset.table
    if kind in ("retrieval", "image", "profile"):
        if kind == "retrieval":
            ids = np.concatenate([o["class_id"] for o in outs])
        else:
            ids = np.concatenate([o["logits"] for o in outs]).argmax(axis=1)
        pred = serving.classes[ids]
        true = table["class"].to_numpy()
        out = table[["image", "profile"]].copy()
        out["true"] = true
        out["pred"] = pred
        out.to_csv(args.output, index=False)
        known = np.isin(true, serving.classes)
        if known.any():
            acc = float((pred[known] == true[known]).mean())
            print(f"accuracy {acc:.4f} over {int(known.sum())} labeled "
                  f"samples ({len(true) - int(known.sum())} with labels "
                  f"outside the artifact's classes)")
        print(f"Predictions -> {args.output}")
    elif kind == "multi":
        import pickle

        entry = {
            "image": np.concatenate([o["image_emb"] for o in outs])
            .astype(np.float32),
            "profile": np.concatenate([o["profile_emb"] for o in outs])
            .astype(np.float32),
            "label": table["class"].to_numpy(),
            "classes": serving.classes,
        }
        with open(args.output, "wb") as f:
            pickle.dump({args.name: {args.fold: entry}}, f)
        print(f"Embeddings ({entry['image'].shape[0]} pairs) -> "
              f"{args.output}")
    else:
        raise SystemExit(f"Unknown artifact kind {kind!r}")


if __name__ == "__main__":
    main()
