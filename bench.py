#!/usr/bin/env python3
"""Headline throughput benchmark: contrastive pretraining pairs/sec/chip.

Measures the flagship configuration from the reference's best model
(EfficientNet-B0 image encoder + CNN_2 profile encoder + CLIP loss,
224x224x1 images, 224x6 profiles — model_cards/example_multi.yaml anchors;
BASELINE.md), full train step (forward + backward + SGD), bfloat16 compute,
synthetic on-device data so the number isolates the compute path.

The reference's optimizer step is batch 64 with 4x gradient accumulation and
4 buckets (model_cards/example_multi.yaml:4,43 + train_multi collate), i.e.
256 pairs and 16 independent 16-pair contrastive groups per update. We run
that effective step directly (batch 256, buckets 16) — identical gradient
math, one dispatch — which is also the TPU-correct formulation (batch 64
leaves the chip dispatch-latency-bound: 7.1k pairs/s vs 34.9k at 256).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput (BASELINE.md "Throughput:
not published"). ``A100_BASELINE_PAIRS_PER_SEC`` is our estimate for the
reference PyTorch stack on one A100 80GB with AMP 16-mixed at batch 64
(EfficientNet-B0 fwd+bwd dominates; public MLPerf/timm train benchmarks put
B0 at ~1.5-2.5k img/s on A100 with channels-last AMP; the Lightning +
unfused-profile-CNN + bucketed-loss stack lands mid-range), so
vs_baseline = measured / 2000.
"""

import json
import time

import numpy as np

A100_BASELINE_PAIRS_PER_SEC = 2000.0

BATCH = 256
IMG = 224
PLEN = 224
WARMUP = 5
ITERS = 30


def main() -> None:
    import jax
    import jax.numpy as jnp

    from multimodal_plankton_recognition_tpu.config import OptimConfig
    from multimodal_plankton_recognition_tpu.models import MultiModel
    from multimodal_plankton_recognition_tpu.train import (
        make_optimizer, create_train_state, make_multi_steps,
    )

    model = MultiModel(
        dim_embed=512,
        image_encoder_args={"name": "efficientnet_b0", "in_chans": 1,
                            "metadata": True},
        profile_encoder_args={"kind": "cnn", "dim_in": 6,
                              "blocks": (2, 2, 2, 2), "base_channels": 32},
        coordination_args={"method": "clip"},
        dtype=jnp.bfloat16,
    )

    rs = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(rs.randn(BATCH, IMG, IMG, 1), jnp.float32),
        "image_shape": jnp.asarray(rs.randint(50, 400, (BATCH, 2)), jnp.int32),
        "profile": jnp.asarray(rs.randn(BATCH, PLEN, 6), jnp.float32),
        "profile_len": jnp.asarray(rs.randint(20, 2000, (BATCH, 1)), jnp.int32),
    }

    tx = make_optimizer(OptimConfig(lr=5e-3, momentum=0.9,
                                    weight_decay=1e-3, nesterov=True))
    state = create_train_state(model, jax.random.key(0), batch, tx,
                               init_kwargs={"buckets": 16})
    train_step, _ = make_multi_steps(model, tx, buckets=16)
    rng = jax.random.key(1)

    for _ in range(WARMUP):
        state, loss = train_step(state, batch, rng)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, loss = train_step(state, batch, rng)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "pretrain_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
