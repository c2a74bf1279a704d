"""Quantitative synthetic-parity gate (VERDICT r1 #4, r2 #4).

Freezes a synthetic corpus + training protocol and asserts the resulting
retrieval accuracies stay inside committed bands
(tests/golden/parity_bands.json), so a regression in the training math —
loss formulas, optimizer semantics, transform pipeline, encode path — fails
the suite instead of passing silently.

Three protocols cover the model families that define BASELINE.md parity
(reference: experiments.ipynb cell 12 model rows):

* ``resnet_cnn_clip`` — the original round-1 gate (ResNet18 + CNN + CLIP);
* ``b0_cnn_clip`` — the EffNet-B0 + CNN + CLIP flagship family;
* ``vit_transformer_siglip`` — the ViT + ProfileTransformer + SigLIP family
  with ``fused_attention: true`` as the flagship cards ship it (on the CPU
  test platform this exercises the FusedSelfAttention module's packed
  projections + einsum path; kernel-vs-fallback equality has its own tests).

The bands encode the reference's qualitative cross-modal pattern at
synthetic scale: same-modal retrieval high, cross-modal transfer low
(reference: experiments.ipynb cell 22 saved outputs; BASELINE.md cross-modal
matrix). Calibrated with scripts/parity_gate.py over 5 data seeds per
protocol (bands widened by the observed spread).
"""

import json
from pathlib import Path

import numpy as np
import pytest
import yaml

GOLDEN = Path(__file__).parent / "golden" / "parity_bands.json"

_BASE_OPTIM = {"lr": 1e-2, "momentum": 0.9, "weight_decay": 1e-4,
               "nesterov": True}

#: everything about each protocol is pinned; changing any of this requires
#: re-calibrating the golden bands (scripts/parity_gate.py --calibrate)
PROTOCOL_CARDS = {
    "resnet_cnn_clip": {
        "bs": 8,
        "dim_embedding": 32,
        "target_size": 32,
        "buckets": 2,
        "num_workers": 2,
        "patience": 99,
        "save_top_k": 1,
        "seed": 0,
        "image_encoder_args": {"name": "resnet18", "metadata": True},
        "profile_encoder_args": {"kind": "cnn", "dim_in": 6,
                                 "blocks": [1, 1, 1, 1], "base_channels": 8},
        "coordination_args": {"method": "clip"},
        "optim_args": _BASE_OPTIM,
        "trainer_args": {"precision": "32", "min_epochs": 15,
                         "max_epochs": 15},
    },
    "b0_cnn_clip": {
        "bs": 8,
        "dim_embedding": 32,
        "target_size": 32,
        "buckets": 2,
        "num_workers": 2,
        "patience": 99,
        "save_top_k": 1,
        "seed": 0,
        "image_encoder_args": {"name": "efficientnet_b0", "metadata": True},
        "profile_encoder_args": {"kind": "cnn", "dim_in": 6,
                                 "blocks": [1, 1, 1, 1], "base_channels": 8},
        "coordination_args": {"method": "clip"},
        "optim_args": _BASE_OPTIM,
        "trainer_args": {"precision": "32", "min_epochs": 10,
                         "max_epochs": 10},
    },
    "b0_cnn_siglip": {
        # the second reference flagship loss on the B0 family
        # (reference: experiments.ipynb cell-12 row 2, train_multi.sh)
        "bs": 8,
        "dim_embedding": 32,
        "target_size": 32,
        "buckets": 2,
        "num_workers": 2,
        "patience": 99,
        "save_top_k": 1,
        "seed": 0,
        "image_encoder_args": {"name": "efficientnet_b0", "metadata": True},
        "profile_encoder_args": {"kind": "cnn", "dim_in": 6,
                                 "blocks": [1, 1, 1, 1], "base_channels": 8},
        "coordination_args": {"method": "siglip"},
        "optim_args": _BASE_OPTIM,
        "trainer_args": {"precision": "32", "min_epochs": 10,
                         "max_epochs": 10},
    },
    "resnet_lstm_clip": {
        # the LSTM profile family end-to-end (reference:
        # src/profile_encoder.py:71-108; previously the least-exercised
        # encoder — VERDICT r3 #5)
        "bs": 8,
        "dim_embedding": 32,
        "target_size": 32,
        "buckets": 2,
        "num_workers": 2,
        "patience": 99,
        "save_top_k": 1,
        "seed": 0,
        "image_encoder_args": {"name": "resnet18", "metadata": True},
        "profile_encoder_args": {"kind": "lstm", "dim_in": 6,
                                 "dim_hidden": 32, "num_layers": 1},
        "coordination_args": {"method": "clip"},
        "optim_args": _BASE_OPTIM,
        "trainer_args": {"precision": "32", "min_epochs": 15,
                         "max_epochs": 15},
    },
    "vit_transformer_siglip": {
        "bs": 8,
        "dim_embedding": 32,
        "target_size": 32,
        "buckets": 2,
        "num_workers": 2,
        "patience": 99,
        "save_top_k": 1,
        "seed": 0,
        # scaled-down ViT-T: same module path, 32-px position table
        "image_encoder_args": {"name": "vit_tiny_patch16_224",
                               "metadata": True, "fused_attention": True,
                               "backbone_kwargs": {"img_size": 32,
                                                   "depth": 2,
                                                   "embed_dim": 32,
                                                   "num_heads": 4}},
        "profile_encoder_args": {"kind": "transformer", "dim_in": 6,
                                 "dim_hidden": 32, "num_head": 4,
                                 "num_layers": 2, "dim_feedforward": 64,
                                 "target_size": 32,
                                 "fused_attention": True},
        "coordination_args": {"method": "siglip"},
        "optim_args": _BASE_OPTIM,
        "trainer_args": {"precision": "32", "min_epochs": 15,
                         "max_epochs": 15},
    },
}
DATA_KW = dict(n_classes=5, n_per_class=24, seed=7)
GALLERY_N = 8
KNN_K = 3
REPEATS = 3
SETUPS = ("I - I", "P - P", "I - P", "I+P - P")


def run_parity_protocol(workdir: Path, protocol: str = "resnet_cnn_clip",
                        data_seed: int = 7) -> dict:
    """Train -> encode -> cross-folds retrieval; returns mean accuracy per
    setup. Deterministic given ``data_seed`` (model/train seed is pinned)."""
    from multimodal_plankton_recognition_tpu.data.synthetic import (
        make_synthetic_dataset,
    )
    from multimodal_plankton_recognition_tpu.retrieval import encode_split
    from multimodal_plankton_recognition_tpu.retrieval.benchmark import (
        run_suite,
    )
    from multimodal_plankton_recognition_tpu.train.drivers import train_multi

    kw = dict(DATA_KW, seed=data_seed)
    split = make_synthetic_dataset(workdir / "data", **kw)
    card_path = workdir / "card.yaml"
    card_path.write_text(yaml.safe_dump(PROTOCOL_CARDS[protocol]))
    result = train_multi(split, card_path, logdir=workdir / "logs")

    entry = encode_split(f"{result['logdir']}/checkpoints", split,
                         batch_size=8, num_workers=1)
    results = run_suite({"gate": {1: entry}}, mode="cross_folds",
                        N=(GALLERY_N,), K=(KNN_K,), repeats=REPEATS, th=1,
                        seed=0)
    runs = results["gate"][1][GALLERY_N]
    acc = {}
    for setup in SETUPS:
        vals = [float(np.mean(np.asarray(r["pred"][KNN_K][setup]) ==
                              np.asarray(r["true"])))
                for r in runs.values()]
        acc[setup] = float(np.mean(vals))
    acc["final_train_loss"] = float(result["history"][-1]["train_loss"])
    acc["first_train_loss"] = float(result["history"][0]["train_loss"])
    return acc


@pytest.mark.slow
@pytest.mark.parametrize("protocol", sorted(PROTOCOL_CARDS))
def test_parity_bands(tmp_path, protocol):
    golden = json.loads(GOLDEN.read_text())
    if protocol not in golden.get("protocols", {}):
        pytest.skip(f"no calibrated bands for {protocol} yet "
                    f"(run scripts/parity_gate.py --calibrate)")
    bands = golden["protocols"][protocol]["bands"]
    acc = run_parity_protocol(tmp_path, protocol)
    errors = []
    for key, (lo, hi) in bands.items():
        v = acc[key]
        if not (lo <= v <= hi):
            errors.append(f"{key}: {v:.4f} outside [{lo}, {hi}]")
    assert not errors, (
        f"parity gate violated for {protocol} "
        "(training-math regression?):\n  "
        + "\n  ".join(errors) + f"\n  full result: {acc}")
    # the reference's qualitative cross-modal pattern (experiments.ipynb
    # cell 22: same-modal retrieval >> cross-modal transfer) must hold at
    # synthetic scale in every protocol — P-P is the strong same-modal
    # setup on this corpus (observed gap >= 0.09 over all calibration runs)
    assert acc["P - P"] > acc["I - P"] + 0.05, (
        f"cross-modal pattern violated for {protocol}: "
        f"P-P {acc['P - P']:.4f} !>> I-P {acc['I - P']:.4f}")


@pytest.mark.slow
def test_rbg_default_path_smoke(tmp_path):
    """Band-free smoke gate for the SHIPPED default PRNG path (VERDICT r4
    #7): the drivers/bench default to rbg (use_fast_prng) while every
    banded protocol pins threefry (rbg streams are not version-stable —
    CLAUDE.md), so without this test no end-to-end gate ever runs the
    configuration users actually get. Runs the resnet_cnn_clip protocol in
    a subprocess with PLANKTON_PRNG=rbg (subprocess so the process-global
    jax_default_prng_impl switch cannot leak into the threefry-pinned
    suite) and asserts only the version-stable qualitative pattern:
    training converges and same-modal retrieval beats cross-modal transfer
    (reference: experiments.ipynb cell 22 pattern)."""
    import os
    import subprocess
    import sys

    repo = Path(__file__).resolve().parents[1]
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import json, pathlib, sys\n"
        f"sys.path.insert(0, {str(repo)!r})\n"
        f"sys.path.insert(0, {str(repo / 'tests')!r})\n"
        "from test_parity_gate import run_parity_protocol\n"
        f"acc = run_parity_protocol(pathlib.Path({str(tmp_path)!r}),"
        " 'resnet_cnn_clip')\n"
        "print('ACC=' + json.dumps(acc))\n"
    )
    env = dict(os.environ, PLANKTON_PRNG="rbg")
    env.pop("XLA_FLAGS", None)  # single CPU device is enough (and faster)
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("ACC=")]
    assert line, proc.stdout[-2000:]
    acc = json.loads(line[0][4:])
    assert acc["final_train_loss"] < acc["first_train_loss"], acc
    assert np.isfinite(acc["final_train_loss"]), acc
    assert acc["P - P"] > acc["I - P"] + 0.05, (
        f"cross-modal pattern violated under rbg: {acc}")
