"""Canonical flagship model + synthetic-batch builders.

The two headline configurations every perf tool measures (bench.py,
scripts/perf_probe.py, scripts/xprof.py) — kept in ONE place so the
benchmark contract (shapes, encoder args, loss) cannot drift between
tools (reference anchors: model_cards/example_multi.yaml and the
experiments.ipynb cell-12 model families; BASELINE.md).
"""

from __future__ import annotations

import numpy as np


def flagship_b0(dim_embed: int = 512, remat: bool = False):
    """EfficientNet-B0 + CNN_2 + fused CLIP — the reference's best model.
    ``remat`` rematerializes MBConv blocks (jax.checkpoint) to trade idle
    MXU FLOPs for the dominant HBM traffic (docs/PERF.md roofline)."""
    import jax.numpy as jnp
    from .multi import MultiModel

    return MultiModel(
        dim_embed=dim_embed,
        image_encoder_args={"name": "efficientnet_b0", "in_chans": 1,
                            "metadata": True, "remat": remat},
        profile_encoder_args={"kind": "cnn", "dim_in": 6,
                              "blocks": (2, 2, 2, 2), "base_channels": 32},
        coordination_args={"method": "clip", "fused": True},
        dtype=jnp.bfloat16,
    )


def flagship_vit(dim_embed: int = 512, fused_attention: bool = True,
                 fused_ffn: bool = False, target_size: int = 224):
    """ViT-T/16 + ProfileTransformer + fused CLIP — the second headline
    family; fused attention on by default (the measured win,
    docs/PERF.md)."""
    import jax.numpy as jnp
    from .multi import MultiModel

    return MultiModel(
        dim_embed=dim_embed,
        image_encoder_args={"name": "vit_tiny_patch16_224", "in_chans": 1,
                            "metadata": True,
                            "fused_attention": fused_attention,
                            "fused_ffn": fused_ffn},
        profile_encoder_args={"kind": "transformer", "dim_in": 6,
                              "dim_hidden": 192, "num_layers": 2,
                              "num_head": 8, "target_size": target_size,
                              "fused_attention": fused_attention,
                              "fused_ffn": fused_ffn},
        coordination_args={"method": "clip", "fused": True},
        dtype=jnp.bfloat16,
    )


def encode_scan(model, k: int):
    """Jitted K-iteration eval-mode ``MultiModel.encode`` scan — the
    serving-path measurement body shared by bench.py and
    scripts/perf_probe.py (one definition so the measurement contract
    cannot drift between tools). The carry perturbs the inputs so XLA
    cannot hoist a loop-invariant body (repo measurement rule), and the
    summed embedding means are returned for a forced host fetch."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_k(variables, batch):
        def body(c, _):
            b = dict(batch, image=batch["image"] + c)
            emb = model.apply(variables, method="encode", train=False, **b)
            probe = (jnp.mean(emb["image_emb"].astype(jnp.float32))
                     + jnp.mean(emb["profile_emb"].astype(jnp.float32)))
            return probe * 1e-6, probe
        return jax.lax.scan(body, jnp.float32(0), jnp.arange(k))

    return run_k


def synthetic_batch_b0(bs: int, img: int = 224, plen: int = 224,
                       seed: int = 0, img_dtype=None):
    import jax.numpy as jnp

    rs = np.random.RandomState(seed)
    return {
        "image": jnp.asarray(rs.randn(bs, img, img, 1),
                             img_dtype or jnp.float32),
        "image_shape": jnp.asarray(rs.randint(50, 400, (bs, 2)), jnp.int32),
        "profile": jnp.asarray(rs.randn(bs, plen, 6), jnp.float32),
        "profile_len": jnp.asarray(rs.randint(20, 2000, (bs, 1)),
                                   jnp.int32),
    }


def synthetic_batch_vit(bs: int, img: int = 224, target_size: int = 224,
                        seed: int = 0):
    """Transformer tokenize contract: CLS row prepended (target_size + 1
    tokens), time ids, padding mask."""
    import jax.numpy as jnp

    rs = np.random.RandomState(seed)
    length = target_size + 1
    return {
        "image": jnp.asarray(rs.randn(bs, img, img, 1), jnp.float32),
        "image_shape": jnp.asarray(rs.randint(50, 400, (bs, 2)), jnp.int32),
        "profile": jnp.asarray(rs.randn(bs, length, 6), jnp.float32),
        "profile_len": jnp.asarray(rs.randint(20, 2000, (bs, 1)),
                                   jnp.int32),
        "time": jnp.asarray(np.tile(np.arange(length, dtype=np.int32),
                                    (bs, 1))),
        "padding_mask": jnp.zeros((bs, length), jnp.bool_),
    }
