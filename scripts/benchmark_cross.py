#!/usr/bin/env python3
"""Cross-modal 8-setup retrieval benchmark, in-pool sampling
(reference: scripts/benchmark_cross.py; same CLI and result-pickle schema)."""

import argparse
import pickle
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from multimodal_plankton_recognition_tpu.retrieval.benchmark import run_suite

N = (2, 4, 8, 12, 16)
K = (1, 3, 5, 7, 9)
TH = 20
REPEATS = 10


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-e", "--embeddings",
                        help="Location to pickled embeddings.")
    parser.add_argument("-o", "--output", help="Path to pickled result data")
    parser.add_argument("--repeats", type=int, default=REPEATS)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--threshold", type=int, default=TH)
    parser.add_argument("--sharded", action="store_true",
                        help="Row-shard galleries over the device mesh "
                             "(exact k-NN set; distance-tie ordering may "
                             "differ from the single-device kernel; "
                             "pod-scale gallery memory)")
    args = parser.parse_args()

    with open(args.embeddings, "rb") as buf:
        embeddings = pickle.load(buf)

    results = run_suite(embeddings, mode="cross", N=N, K=K,
                        repeats=args.repeats, th=args.threshold, seed=args.seed, sharded=args.sharded,
                        progress=True)
    with open(args.output, "wb") as buf:
        pickle.dump(results, buf)


if __name__ == "__main__":
    main()
