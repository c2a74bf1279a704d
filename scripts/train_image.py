#!/usr/bin/env python3
"""Supervised image-classifier CLI (reference: scripts/train_image.py)."""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from multimodal_plankton_recognition_tpu.train.drivers import train_image


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-d", "--dataset",
                        help="Location to dataset tables.", required=True)
    parser.add_argument("-m", "--modelcard",
                        help="Path to model card (yaml file).", required=True)
    parser.add_argument("-l", "--logdir", default="logs")
    parser.add_argument("--resume", default=None,
                        help="Checkpoint dir to resume from (params + "
                             "optimizer state + step).")
    parser.add_argument("--profile", action="store_true",
                        help="Capture a jax.profiler trace of the first "
                             "epoch into the run's logdir.")
    parser.add_argument("--max-epochs", type=int, default=None)
    args = parser.parse_args()

    result = train_image(args.dataset, args.modelcard, args.logdir,
                         max_epochs=args.max_epochs,
                         resume=args.resume, profile=args.profile)
    print(f"Test accuracy: {result['test_acc']:.4f}; "
          f"logs in {result['logdir']}")


if __name__ == "__main__":
    main()
