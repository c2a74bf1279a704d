"""Execute the Mosaic-lowered Pallas kernels INSIDE a real-TPU shard_map step.

Closes the last untested lowering combination the multi cards ship
(VERDICT r4 next #3): dryrun check 9 proves the kernel *body* inside the
shard_map step in interpret mode on the virtual CPU mesh; this script runs
the actual Mosaic lowering under a 1-device TPU `jax.sharding.Mesh` —
the lane-mask attention kernel (fused_attention: true) AND the fused
contrastive CLIP kernel (coordination fused: true) in the SAME shard_map
train step, at the flagship card's real dims (ViT-T/16 @224 + 2-layer
ProfileTransformer @224, dim_embed 512 —
model_cards/multi/vit_t_16_transformer_2_512_clip.yaml).

Oracle: the plain-jit GSPMD step with `PLANKTON_FUSED_DISABLE=1`
(einsum attention + plain clip loss — ops/kernels.py escape hatch), same
params / batch / PRNG, dropout 0 so both paths compute the same math.
Asserts train-loss and eval-loss parity, plus loss decrease over a few
kernel-path optimizer steps.

Run:  python scripts/mosaic_mesh_check.py        (needs the real TPU)
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def _model():
    from multimodal_plankton_recognition_tpu.models import MultiModel

    # flagship ViT card dims; dropout 0 so kernel/einsum paths are
    # bit-comparable (the kernel derives dropout masks from its own PRNG)
    return MultiModel(
        dim_embed=512,
        image_encoder_args={"name": "vit_tiny_patch16_224", "in_chans": 1,
                            "metadata": True, "dropout": 0.0,
                            "fused_attention": True},
        profile_encoder_args={"kind": "transformer", "dim_in": 6,
                              "dim_hidden": 128, "num_layers": 2,
                              "num_head": 4, "target_size": 224,
                              "dim_feedforward": 1024, "dropout": 0.0,
                              "metadata": True, "fused_attention": True},
        coordination_args={"method": "clip", "fused": True},
        dtype=jnp.bfloat16,
    )


def _batch(bs=32, seed=0):
    rs = np.random.RandomState(seed)
    length = 225  # target_size + CLS row (tokenize contract)
    return {
        "image": jnp.asarray(rs.randn(bs, 224, 224, 1), jnp.float32),
        "image_shape": jnp.asarray(rs.randint(50, 400, (bs, 2)), jnp.int32),
        "profile": jnp.asarray(rs.randn(bs, length, 6), jnp.float32),
        "profile_len": jnp.asarray(rs.randint(20, 2000, (bs, 1)), jnp.int32),
        "time": jnp.asarray(np.tile(np.arange(length, dtype=np.int32),
                                    (bs, 1))),
        "padding_mask": jnp.zeros((bs, length), jnp.bool_),
    }


def main():
    from multimodal_plankton_recognition_tpu import enable_compilation_cache
    from multimodal_plankton_recognition_tpu.config import OptimConfig
    from multimodal_plankton_recognition_tpu.parallel import (
        create_mesh, shard_batch,
    )
    from multimodal_plankton_recognition_tpu.parallel.mesh import (
        replicate_state,
    )
    from multimodal_plankton_recognition_tpu.train import (
        make_optimizer, create_train_state, make_multi_steps,
        make_multi_steps_shard_map,
    )

    assert jax.default_backend() == "tpu", (
        f"needs the real TPU, got {jax.default_backend()}")
    enable_compilation_cache()
    mesh = create_mesh(n_data=1, n_model=1, devices=jax.devices()[:1])
    print(f"mesh: {mesh}", flush=True)

    model = _model()
    tx = make_optimizer(OptimConfig(lr=5e-3, momentum=0.9,
                                    weight_decay=1e-3, nesterov=True))
    buckets = 4
    batch = shard_batch(_batch(bs=32), mesh)

    def fresh_state():
        s = create_train_state(model, jax.random.key(0), batch, tx,
                               init_kwargs={"buckets": buckets})
        return replicate_state(s, mesh)

    # --- kernel path: Mosaic attention + fused CLIP inside shard_map -------
    assert os.environ.get("PLANKTON_FUSED_DISABLE") != "1"
    k_train, k_eval = make_multi_steps_shard_map(model, tx, mesh,
                                                 buckets=buckets)
    kstate = fresh_state()
    k_ev0 = float(jax.block_until_ready(k_eval(kstate, batch))["loss"])
    kstate, kl = k_train(kstate, batch, jax.random.key(1))
    jax.block_until_ready((kstate, kl))
    kl = float(kl)
    losses = [kl]
    for i in range(2, 5):
        kstate, l = k_train(kstate, batch, jax.random.key(i))
        jax.block_until_ready((kstate, l))
        losses.append(float(l))
    print(f"shard_map Mosaic-kernel path: eval0 {k_ev0:.4f}, "
          f"train losses {['%.4f' % l for l in losses]}", flush=True)
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0], "loss did not decrease on kernel path"

    # --- oracle: plain-jit GSPMD step, kernels force-disabled --------------
    os.environ["PLANKTON_FUSED_DISABLE"] = "1"
    try:
        e_train, e_eval = make_multi_steps(model, tx, buckets=buckets)
        estate = fresh_state()
        e_ev0 = float(jax.block_until_ready(e_eval(estate, batch))["loss"])
        estate, el = e_train(estate, batch, jax.random.key(1))
        jax.block_until_ready((estate, el))
        el = float(el)
    finally:
        os.environ.pop("PLANKTON_FUSED_DISABLE", None)
    print(f"plain-jit einsum oracle:      eval0 {e_ev0:.4f}, "
          f"train loss {el:.4f}", flush=True)

    tol = 5e-2 * max(1.0, abs(el))  # bf16 compute, f32 loss accumulate
    assert abs(kl - el) < tol, (kl, el)
    assert abs(k_ev0 - e_ev0) < tol, (k_ev0, e_ev0)
    print(f"PARITY OK: train |{kl:.4f} - {el:.4f}| = {abs(kl - el):.4f} "
          f"< {tol:.4f}; eval |{k_ev0:.4f} - {e_ev0:.4f}| = "
          f"{abs(k_ev0 - e_ev0):.4f}", flush=True)


if __name__ == "__main__":
    main()
