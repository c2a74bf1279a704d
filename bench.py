#!/usr/bin/env python3
"""Headline throughput benchmark: contrastive pretraining pairs/sec/chip.

Measures the flagship configuration from the reference's best model
(EfficientNet-B0 image encoder + CNN_2 profile encoder + CLIP loss,
224x224x1 images, 224x6 profiles — model_cards/example_multi.yaml anchors;
BASELINE.md), full train step (forward + backward + SGD), bfloat16 compute,
synthetic on-device data so the number isolates the compute path.

The reference's optimizer step is batch 64 with 4x gradient accumulation and
4 buckets (model_cards/example_multi.yaml:4,43 + train_multi collate), i.e.
256 pairs / 16 independent 16-pair contrastive groups per update; we run
that effective step directly (batch 256, buckets 16) as one dispatch.

Measurement protocol: K training steps inside ONE jitted ``lax.scan``
dispatch, then the per-step losses are fetched to the host (np.asarray) —
per-dispatch host timing through this environment's remote-TPU tunnel is
unreliable (its block_until_ready resolves before device completion), and a
forced device->host value fetch cannot be faked. Minimum of 3 repetitions.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no throughput (BASELINE.md "Throughput:
not published"). ``A100_BASELINE_PAIRS_PER_SEC`` is our estimate for the
reference PyTorch stack on one A100 80GB with AMP 16-mixed at batch 64
(EfficientNet-B0 fwd+bwd dominates; public timm/MLPerf train benchmarks put
B0 around 1.5-2.5k img/s on A100 with channels-last AMP; the Lightning +
unfused-profile-CNN + bucketed-loss stack lands mid-range), so
vs_baseline = measured / 2000.
"""

import json
import time

import numpy as np

A100_BASELINE_PAIRS_PER_SEC = 2000.0

BATCH = 256
BUCKETS = 16
IMG = 224
PLEN = 224
K = 30      # train steps per dispatch
REPS = 3


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
        coordination_args={"method": "clip", "fused": True},
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
                               init_kwargs={"buckets": BUCKETS})
    train_step, _ = make_multi_steps(model, tx, buckets=BUCKETS)
    inner = train_step.__wrapped__  # unjitted step for the scan body

    @jax.jit
    def run_k(state, batch, rng):
        def body(s, i):
            s2, loss = inner(s, batch, jax.random.fold_in(rng, i))
            return s2, loss
        return jax.lax.scan(body, state, jnp.arange(K))

    rng = jax.random.key(1)
    state, losses = run_k(state, batch, rng)     # compile + warm
    np.asarray(losses)

    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        state, losses = run_k(state, batch, rng)
        np.asarray(losses)                        # forced host fetch
        times.append(time.perf_counter() - t0)
    dt = min(times)

    pairs_per_sec = BATCH * K / dt
    print(json.dumps({
        "metric": "pretrain_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / A100_BASELINE_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
