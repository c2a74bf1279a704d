"""Shape/dtype tests for all encoders and task models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_plankton_recognition_tpu.models.image.registry import (
    IMAGE_BACKBONES, create_backbone,
)
from multimodal_plankton_recognition_tpu.models.image.encoder import ImageEncoder
from multimodal_plankton_recognition_tpu.models.profile import (
    ProfileTransformer, ProfileLSTM, ProfileCNN, create_profile_encoder,
)
from multimodal_plankton_recognition_tpu.models import (
    MultiModel, ImageClassifier, ProfileClassifier,
)

EXPECTED_FEATURES = {
    "vit_tiny_patch16_224": 192,
    "vit_small_patch16_224": 384,
    "vit_small_patch32_224": 384,
    "resnet18": 512,
    "resnet50": 2048,
    "efficientnet_b0": 1280,
    "efficientnet_b1": 1280,
    "densenet121": 1024,
    "densenet169": 1664,
}


@pytest.mark.parametrize("name", sorted(EXPECTED_FEATURES))
def test_backbone_shapes(name):
    model = create_backbone(name, in_chans=1)
    assert model.num_features == EXPECTED_FEATURES[name]
    x = jnp.zeros((2, 64, 64, 1)) if not name.startswith("vit") \
        else jnp.zeros((2, 224, 224, 1))
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False,
                      mutable=["batch_stats"] if "batch_stats" in variables else [])
    feats = out[0] if isinstance(out, tuple) else out
    assert feats.shape == (2, EXPECTED_FEATURES[name])


def test_image_encoder_metadata():
    enc = ImageEncoder(name="resnet18", metadata=True)
    assert enc.dim_out == 514
    x = jnp.zeros((2, 64, 64, 1))
    shape = jnp.array([[100, 80], [60, 90]], dtype=jnp.int32)
    variables = enc.init(jax.random.key(0), x, image_shape=shape, train=False)
    out, _ = enc.apply(variables, x, image_shape=shape, train=False,
                       mutable=["batch_stats"])
    assert out.shape == (2, 514)
    # metadata dims are (h, w) / input_res
    np.testing.assert_allclose(np.asarray(out[:, -2:]),
                               np.asarray(shape) / 64, rtol=1e-6)


def test_profile_transformer():
    enc = ProfileTransformer(dim_in=6, dim_hidden=32, target_size=16,
                             num_head=2, num_layers=2, dim_feedforward=64)
    assert enc.dim_out == 33
    tokens = enc.tokenize([np.random.randn(10, 6).astype(np.float32),
                           np.random.randn(16, 6).astype(np.float32)])
    batch = {k: jnp.asarray(v) for k, v in tokens.items()}
    plen = jnp.array([[10], [16]], dtype=jnp.int32)
    variables = enc.init(jax.random.key(0), profile_len=plen, **batch)
    out = enc.apply(variables, profile_len=plen, **batch)
    assert out.shape == (2, 33)
    assert np.isfinite(np.asarray(out)).all()


def test_profile_transformer_padding_invariance():
    """Padding tokens must not change the CLS output (attention masking)."""
    enc = ProfileTransformer(dim_in=6, dim_hidden=32, target_size=32,
                             num_head=2, num_layers=2, dim_feedforward=64,
                             dropout=0.0, metadata=False)
    p = np.random.RandomState(0).randn(10, 6).astype(np.float32)
    short = enc.tokenize([p], pad_to=11)
    long = enc.tokenize([p], pad_to=33)
    variables = enc.init(jax.random.key(0),
                         **{k: jnp.asarray(v) for k, v in short.items()})
    o1 = enc.apply(variables, **{k: jnp.asarray(v) for k, v in short.items()})
    o2 = enc.apply(variables, **{k: jnp.asarray(v) for k, v in long.items()})
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=1e-5, rtol=1e-4)


def test_profile_lstm():
    enc = ProfileLSTM(dim_in=6, dim_hidden=32, num_layers=2)
    assert enc.dim_out == 33
    tokens = enc.tokenize([np.random.randn(10, 6).astype(np.float32),
                           np.random.randn(7, 6).astype(np.float32)])
    batch = {k: jnp.asarray(v) for k, v in tokens.items()}
    plen = jnp.array([[10], [7]], dtype=jnp.int32)
    variables = enc.init(jax.random.key(0), profile_len=plen, **batch)
    out = enc.apply(variables, profile_len=plen, **batch)
    assert out.shape == (2, 33)


def test_profile_lstm_padding_invariance():
    """Hidden state is taken at last_idx, so trailing padding is inert."""
    enc = ProfileLSTM(dim_in=6, dim_hidden=16, num_layers=1, dropout=0.0,
                      metadata=False)
    p = np.random.RandomState(0).randn(9, 6).astype(np.float32)
    t1 = enc.tokenize([p], pad_to=9)
    t2 = enc.tokenize([p], pad_to=24)
    variables = enc.init(jax.random.key(0),
                         **{k: jnp.asarray(v) for k, v in t1.items()})
    o1 = enc.apply(variables, **{k: jnp.asarray(v) for k, v in t1.items()})
    o2 = enc.apply(variables, **{k: jnp.asarray(v) for k, v in t2.items()})
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                               atol=1e-5, rtol=1e-4)


def test_profile_cnn():
    enc = ProfileCNN(dim_in=6, blocks=(2, 2, 2, 2), base_channels=16)
    assert enc.dim_out == 129
    tokens = enc.tokenize([np.random.randn(64, 6).astype(np.float32)] * 3)
    profile = jnp.asarray(tokens["profile"])
    plen = jnp.full((3, 1), 64, dtype=jnp.int32)
    variables = enc.init(jax.random.key(0), profile, profile_len=plen)
    out, _ = enc.apply(variables, profile, profile_len=plen, train=True,
                       mutable=["batch_stats"],
                       rngs={"dropout": jax.random.key(1)})
    assert out.shape == (3, 129)


def test_create_profile_encoder_dispatch():
    assert isinstance(create_profile_encoder(
        {"dim_in": 6, "num_head": 2, "dim_hidden": 8, "target_size": 8}),
        ProfileTransformer)
    assert isinstance(create_profile_encoder(
        {"dim_in": 6, "blocks": [1, 1, 1, 1]}), ProfileCNN)
    assert isinstance(create_profile_encoder(
        {"dim_in": 6, "dim_hidden": 8, "num_layers": 1}), ProfileLSTM)


def _tiny_multi_batch(B=4, L=16):
    rs = np.random.RandomState(0)
    return {
        "image": jnp.asarray(rs.randn(B, 64, 64, 1), jnp.float32),
        "image_shape": jnp.asarray(rs.randint(50, 200, (B, 2)), jnp.int32),
        "profile": jnp.asarray(rs.randn(B, L, 6), jnp.float32),
        "profile_len": jnp.asarray(rs.randint(10, 100, (B, 1)), jnp.int32),
    }


def test_multimodel_encode_and_loss():
    model = MultiModel(
        dim_embed=32,
        image_encoder_args={"name": "resnet18", "metadata": True},
        profile_encoder_args={"kind": "cnn", "dim_in": 6,
                              "blocks": (1, 1, 1, 1), "base_channels": 8},
        coordination_args={"method": "clip"},
    )
    batch = _tiny_multi_batch()
    variables = model.init(jax.random.key(0), buckets=2, **batch)
    emb = model.apply(variables, method="encode", **batch)
    assert emb["image_emb"].shape == (4, 32)
    assert emb["profile_emb"].shape == (4, 32)
    loss, _ = model.apply(variables, method="loss", buckets=2, train=True,
                          mutable=["batch_stats"],
                          rngs={"dropout": jax.random.key(1)}, **batch)
    assert np.isfinite(float(loss))
    # safe_forward: single-modality encode skips the other
    emb = model.apply(variables, method="encode",
                      profile=batch["profile"],
                      profile_len=batch["profile_len"])
    assert emb["image_emb"] is None and emb["profile_emb"].shape == (4, 32)


def test_classifiers():
    img = ImageClassifier(n_classes=5,
                          image_encoder_args={"name": "resnet18"})
    batch = _tiny_multi_batch()
    v = img.init(jax.random.key(0), batch["image"],
                 image_shape=batch["image_shape"])
    logits = img.apply(v, batch["image"], image_shape=batch["image_shape"])
    assert logits.shape == (4, 5)

    prof = ProfileClassifier(n_classes=5,
                             profile_encoder_args={"kind": "lstm",
                                                   "dim_in": 6,
                                                   "dim_hidden": 16,
                                                   "num_layers": 1})
    tokens = {"profile": batch["profile"],
              "last_idx": jnp.array([15, 15, 15, 15], jnp.int32)}
    v = prof.init(jax.random.key(0), profile_len=batch["profile_len"], **tokens)
    logits = prof.apply(v, profile_len=batch["profile_len"], **tokens)
    assert logits.shape == (4, 5)


def test_profile_cnn_groupnorm():
    """norm='group' variant: no batch_stats collection, same output shape."""
    enc = ProfileCNN(dim_in=6, blocks=(1, 1, 1, 1), base_channels=16,
                     norm="group")
    tokens = enc.tokenize([np.random.randn(64, 6).astype(np.float32)] * 2)
    profile = jnp.asarray(tokens["profile"])
    plen = jnp.full((2, 1), 64, dtype=jnp.int32)
    variables = enc.init(jax.random.key(0), profile, profile_len=plen)
    assert "batch_stats" not in variables
    out = enc.apply(variables, profile, profile_len=plen)
    assert out.shape == (2, 129)


def test_efficientnet_remat_parity():
    """remat=True (per-block jax.checkpoint) declares the identical param
    tree, the identical eval forward, and EXACTLY equal f32 train-mode
    gradients on a single block (full-model f32 grads verified exact during
    the round-3 perf study, docs/PERF.md; measured 22% slower on the v5e,
    so the flag is a memory lever, default off)."""
    import flax.linen as nn
    from multimodal_plankton_recognition_tpu.models.image.efficientnet import (
        EfficientNet, _MBConv,
    )

    x = jnp.asarray(np.random.RandomState(0).randn(2, 24, 24, 1),
                    jnp.float32)
    base = EfficientNet(in_chans=1)
    rem = EfficientNet(in_chans=1, remat=True)
    v = base.init(jax.random.key(0), x, train=False)
    vr = rem.init(jax.random.key(0), x, train=False)
    assert jax.tree.structure(v) == jax.tree.structure(vr)
    o1 = base.apply(v, x, train=False)
    o2 = rem.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    xb = jnp.asarray(np.random.RandomState(1).randn(4, 12, 12, 16),
                     jnp.float32)
    blk = _MBConv(16, 16, 6, 1, 3, 0.25, jnp.float32)
    rblk = nn.remat(_MBConv, static_argnums=(2,))(
        16, 16, 6, 1, 3, 0.25, jnp.float32)
    bv = blk.init(jax.random.key(0), xb, train=False)

    def loss(m, params):
        out, _ = m.apply({"params": params,
                          "batch_stats": bv["batch_stats"]},
                         xb, True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g1 = jax.grad(lambda p: loss(blk, p))(bv["params"])
    g2 = jax.grad(lambda p: loss(rblk, p))(bv["params"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_efficientnet_conv_saves_remat_parity():
    """remat="conv_saves" (policy remat: save only the raw conv outputs,
    recompute the elementwise BN/SiLU/SE chains in backward) declares the
    identical param tree, identical eval forward, and f32 train-mode
    gradients equal to the unremat model. The policy is the round-4 HBM
    lever: the unremat HLO materializes both the pre-BN conv output AND the
    post-activation tensor per conv (2.1x the structural traffic minimum,
    scripts/mbconv_traffic.py)."""
    import flax.linen as nn
    from multimodal_plankton_recognition_tpu.models.image.efficientnet import (
        EfficientNet, _MBConv,
    )

    x = jnp.asarray(np.random.RandomState(0).randn(2, 24, 24, 1),
                    jnp.float32)
    base = EfficientNet(in_chans=1)
    rem = EfficientNet(in_chans=1, remat="conv_saves")
    v = base.init(jax.random.key(0), x, train=False)
    vr = rem.init(jax.random.key(0), x, train=False)
    assert jax.tree.structure(v) == jax.tree.structure(vr)
    o1 = base.apply(v, x, train=False)
    o2 = rem.apply(v, x, train=False)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))

    xb = jnp.asarray(np.random.RandomState(1).randn(4, 12, 12, 16),
                     jnp.float32)
    blk = _MBConv(16, 16, 6, 1, 3, 0.25, jnp.float32)
    rblk = nn.remat(
        _MBConv, static_argnums=(2,),
        policy=jax.checkpoint_policies.save_only_these_names(
            "mbconv_conv"))(16, 16, 6, 1, 3, 0.25, jnp.float32)
    bv = blk.init(jax.random.key(0), xb, train=False)

    def loss(m, params):
        out, _ = m.apply({"params": params,
                          "batch_stats": bv["batch_stats"]},
                         xb, True, mutable=["batch_stats"])
        return jnp.mean(out ** 2)

    g1 = jax.grad(lambda p: loss(blk, p))(bv["params"])
    g2 = jax.grad(lambda p: loss(rblk, p))(bv["params"])
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)
