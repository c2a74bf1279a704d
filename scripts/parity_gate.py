#!/usr/bin/env python3
"""Run / calibrate the quantitative synthetic-parity gate.

``python scripts/parity_gate.py`` runs each frozen protocol once (data
seed 7) and prints the accuracies next to the committed bands.

``python scripts/parity_gate.py --calibrate`` runs every protocol (or
--protocols NAME...) over the calibration data seeds and writes
tests/golden/parity_bands.json with bands = [min - spread, max + spread]
per setup (spread = max - min, floored at 0.05), clamped to [0, 1].
Re-run after any deliberate protocol change; existing protocols' bands are
preserved unless re-calibrated.
"""

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

# same platform setup as tests/conftest.py — the bands are asserted on the
# CPU test platform, so they must be calibrated there too (incl. threefry:
# rbg streams are not version-stable, see conftest)
os.environ.setdefault("PLANKTON_PRNG", "threefry")
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calibrate", action="store_true")
    ap.add_argument("--seeds", type=int, nargs="*",
                    default=[7, 8, 9, 10, 11])
    ap.add_argument("--protocols", nargs="*", default=None)
    args = ap.parse_args()

    from test_parity_gate import (GOLDEN, PROTOCOL_CARDS,
                                  run_parity_protocol)

    protocols = args.protocols or sorted(PROTOCOL_CARDS)

    if not args.calibrate:
        golden = json.loads(GOLDEN.read_text()) if GOLDEN.exists() else {}
        for protocol in protocols:
            with tempfile.TemporaryDirectory() as tmp:
                acc = run_parity_protocol(Path(tmp), protocol)
            print(f"{protocol}: {json.dumps(acc, indent=2)}")
            bands = golden.get("protocols", {}).get(protocol, {}).get("bands")
            for k, (lo, hi) in (bands or {}).items():
                ok = lo <= acc[k] <= hi
                print(f"{'OK ' if ok else 'FAIL'} {k}: {acc[k]:.4f} "
                      f"in [{lo}, {hi}]")
        return

    golden = json.loads(GOLDEN.read_text()) if GOLDEN.exists() else {}
    golden.setdefault("protocols", {})
    golden.pop("protocol", None)   # legacy single-protocol layout
    golden.pop("seeds", None)
    golden.pop("runs", None)
    golden.pop("bands", None)
    for protocol in protocols:
        runs = []
        for seed in args.seeds:
            with tempfile.TemporaryDirectory() as tmp:
                acc = run_parity_protocol(Path(tmp), protocol,
                                          data_seed=seed)
            print(f"{protocol} seed {seed}: {json.dumps(acc)}", flush=True)
            runs.append(acc)

        bands = {}
        for key in runs[0]:
            vals = [r[key] for r in runs]
            lo, hi = min(vals), max(vals)
            spread = max(hi - lo, 0.05)
            if key == "final_train_loss":
                bands[key] = [0.0, round(hi + 2 * spread, 4)]
            else:
                bands[key] = [round(max(0.0, lo - spread), 4),
                              round(min(1.0, hi + spread), 4)]
        golden["protocols"][protocol] = {
            "seeds": args.seeds, "runs": runs, "bands": bands}
        GOLDEN.parent.mkdir(exist_ok=True)
        GOLDEN.write_text(json.dumps(golden, indent=2))
        print(f"wrote {GOLDEN} ({protocol})")


if __name__ == "__main__":
    main()
