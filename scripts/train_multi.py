#!/usr/bin/env python3
"""Contrastive cross-modal pretraining CLI.

Same interface as the reference (reference: scripts/train_multi.py:22-25):
    python scripts/train_multi.py -d DATASET_DIR -m MODELCARD.yaml
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from multimodal_plankton_recognition_tpu.train.drivers import train_multi


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--dataset",
                        help="Location to dataset tables.", required=True)
    parser.add_argument("-m", "--modelcard",
                        help="Path to model card (yaml file).", required=True)
    parser.add_argument("-l", "--logdir", default="logs",
                        help="TensorBoard/checkpoint output directory.")
    parser.add_argument("--resume", default=None,
                        help="Checkpoint dir to resume from (params + "
                             "optimizer state + step).")
    parser.add_argument("--profile", action="store_true",
                        help="Capture a jax.profiler trace of the first "
                             "epoch into the run's logdir.")
    parser.add_argument("--max-epochs", type=int, default=None,
                        help="Override the card's max_epochs.")
    args = parser.parse_args()

    print(f"Training from model card {args.modelcard}")
    result = train_multi(args.dataset, args.modelcard, args.logdir,
                         max_epochs=args.max_epochs,
                         resume=args.resume, profile=args.profile)
    print(f"Logs and checkpoints in {result['logdir']}; "
          f"best epoch {result['best_step']}")


if __name__ == "__main__":
    main()
